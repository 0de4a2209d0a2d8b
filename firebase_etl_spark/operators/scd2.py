"""Slowly-changing-dimension (type 2) history builder.

The reference's sink side overwrites rows in place (UPDATE-by-id upsert —
reference load phase; see sinks/merge.py for that K5 parity path). SCD2 is
the warehouse-grade alternative a Spark pipeline feeds the same change
stream into: instead of losing history on every update, each key keeps one
row per attribute REGIME with a [valid_from, valid_to) validity interval
and an is_current flag. This operator derives that history from an event
stream in one pass.

Scale design: everything is keyed on the dimension key — the change-point
detection (lag over (key, ts)), the regime numbering (running sum over the
same window), and the regime collapse (group-by whose key starts with the
dimension key). Two shuffles total, both partial-aggregable, no corpus-wide
window, no skew beyond key frequency.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse a change stream into SCD2 validity intervals.

    Consecutive rows (per key, ordered by ``ts_col`` then tiebreaks) with
    identical ``attr_cols`` merge into one regime; each regime row carries
    valid_from (first ts), valid_to (next regime's valid_from; null for
    the open regime), is_current, the regime's source-row count, and a
    per-key version number. Null-safe attribute comparison: a null
    attribute equals itself, so null->null is NOT a change.
    """
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)
    marked = df.withColumn(
        "__chg", (~F.lag(attrs).over(w).eqNullSafe(attrs)).cast("long")
    ).withColumn("__ver", F.sum("__chg").over(w))
    hist = marked.groupBy(key_col, "__ver", *attr_cols).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    w2 = Window.partitionBy(key_col).orderBy("__ver")
    return hist.select(
        F.col(key_col),
        F.col("__ver").alias("version"),
        *attr_cols,
        F.col("valid_from"),
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        F.col("n_rows"),
    )
