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
    columns (NULL where no right row precedes the left row)."""
    tiebreak = right_tiebreak or right_payload[0]

    l_tagged = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__rtb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    r_tagged = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(tiebreak).cast("long").alias("__rtb"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
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
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in right_payload
        ],
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__rv_{c}").alias(c) for c in right_payload
    ]
    return carried.filter(F.col("__is_left") == 1).select(*out_cols)
