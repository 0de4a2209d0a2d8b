"""As-of (time-travel) join — a core training-pipeline operator Spark lacks
natively (DuckDB spells it ASOF JOIN; pandas spells it merge_asof).

For each left row, attach the closest right row with the same key at or
before the left time (``direction="backward"``, the default) or at or after
it (``"forward"``), optionally bounded by a ``tolerance``.

Scalable formulation — union + window, NOT a per-group pandas merge:
tag both sides, union them, sort within each key by (time, side, tiebreak)
and carry the nearest right payload across with ``last/first(...,
ignoreNulls)``. One hash shuffle on the key, linear state, no range
explosion — survives 100 TB where a naive theta-join (left.t >= right.t)
would cross-join within keys. Ties (right.time == left.time) match, and
among equal right times the greatest tiebreak value wins — explicit,
deterministic, unlike engine-arbitrary ASOF tie handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    right_tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join. Returns all left columns + ``right_payload`` columns
    (NULL where no right row qualifies).

    ``direction``: "backward" matches the most recent right row with
    ``right_time <= left_time``; "forward" matches the earliest right row
    with ``right_time >= left_time``. ``tolerance_seconds`` (optional)
    rejects matches farther than that from the left time — the matched
    payload becomes NULL, like merge_asof's ``tolerance``.

    The right payload travels as ONE struct and is carried with a single
    ``last/first(struct, ignoreNulls)`` — the matched row is atomic, so a
    NULL in one payload column can never stitch values from different right
    rows (merge_asof / ASOF JOIN whole-row semantics). The tiebreak orders
    in its native type; casting to long would NULL out string ids and make
    tie resolution nondeterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    tiebreak = right_tiebreak or right_payload[0]

    r_payload_t = right.select(
        F.struct(
            *[F.col(c) for c in right_payload],
            F.col(right_time).alias("__matched_t"),
        ).alias("__r")
    ).schema["__r"].dataType

    l_tagged = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__rtb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_payload_t).alias("__r"),
    )
    r_tagged = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(tiebreak).alias("__rtb"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        F.struct(
            *[F.col(c) for c in right_payload],
            F.col(right_time).alias("__matched_t"),
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left rows at equal time (<= semantics);
        # among right rows with equal time the greatest tiebreak lands last
        # inside the trailing frame => wins the last()
        w = (
            Window.partitionBy("__key")
            .orderBy(
                F.col("__t"), F.col("__is_left"), F.col("__rtb").asc_nulls_last()
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last(F.col("__r"), ignorenulls=True).over(w)
    else:
        # left rows sort before right rows at equal time (>= semantics);
        # among right rows with equal time the greatest tiebreak lands
        # first inside the leading frame => wins the first()
        w = (
            Window.partitionBy("__key")
            .orderBy(
                F.col("__t"),
                F.col("__is_left").desc(),
                F.col("__rtb").desc_nulls_last(),
            )
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first(F.col("__r"), ignorenulls=True).over(w)

    carried = unioned.select("__is_left", "__l", "__t", carry.alias("__rv"))
    if tolerance_seconds is not None:
        gap_us = F.abs(
            F.unix_micros(F.col("__rv.__matched_t")) - F.unix_micros(F.col("__t"))
        )
        carried = carried.withColumn(
            "__rv",
            F.when(gap_us <= int(tolerance_seconds * 1_000_000), F.col("__rv")),
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__rv.{c}").alias(c) for c in right_payload
    ]
    return carried.filter(F.col("__is_left") == 1).select(*out_cols)
