"""As-of (time-travel) join — a core training-pipeline operator Spark lacks
natively (DuckDB spells it ASOF JOIN; pandas spells it merge_asof).

For each left row, attach the most recent right row with the same key whose
time is <= the left row's time (backward direction).

Scalable formulation — union + window, NOT a per-group pandas merge:
tag both sides, union them, sort within each key by (time, side, tiebreak)
and carry the latest right payload forward with ``last_value(...,
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
) -> DataFrame:
    """Backward as-of join. Returns all left columns + ``right_payload``
    columns (NULL where no right row precedes the left row).

    The right payload travels as ONE struct and is carried with a single
    ``last(struct, ignoreNulls)`` — the matched row is atomic, so a NULL in
    one payload column can never stitch values from different right rows
    (merge_asof / ASOF JOIN whole-row semantics). The tiebreak orders in its
    native type; casting to long would NULL out string ids and make tie
    resolution nondeterministic.
    """
    tiebreak = right_tiebreak or right_payload[0]

    r_payload_t = right.select(
        F.struct(*[F.col(c) for c in right_payload]).alias("__r")
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
        F.struct(*[F.col(c) for c in right_payload]).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort before left rows at equal time (<= semantics); among
    # right rows with equal time the greatest tiebreak lands last => wins
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t"), F.col("__is_left"), F.col("__rtb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left",
        "__l",
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__rv"),
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__rv.{c}").alias(c) for c in right_payload
    ]
    return carried.filter(F.col("__is_left") == 1).select(*out_cols)
