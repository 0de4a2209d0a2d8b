"""Time-series gap fill — densify a keyed hourly series onto its full hour
spine and forward-fill values across the gaps (the regularization step
before any rolling-window / anomaly / forecasting consumer; extension
beyond the reference, whose analytics assume dense input).

Scale shape: the spine is generated per key from that key's own min/max
hour — one small keyed aggregate, then ``explode(sequence(...))`` on the
aggregate's output (one row per key, so the explode fans out to
spine-length rows WITHOUT touching the fact table). The fill join is keyed
on (key, hour) — one shuffle — and the LOCF pass is a per-key window
(``last(value, ignorenulls=True)`` over rows unbounded-preceding), which
re-uses the same hash partitioning, so AQE coalesces it onto the join
exchange. Per-key state is one row; skewed keys cost only their own spine
length. At 100 TB the number of distinct keys is the parallelism unit —
series analytics partition by key, never by time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_hourly(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense hourly series per key: (key, hour, n_events, avg_value,
    is_gap, value_locf). Missing hours get n_events=0, avg_value NULL, and
    value_locf carried forward from the last observed hour (NULL before
    the first observation — leading gaps cannot be back-filled)."""
    hourly = df.groupBy(
        F.col(key_col), F.date_trunc("hour", F.col(ts_col)).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg(value_col).alias("avg_value"),
    )
    spine = (
        hourly.groupBy(key_col)
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            key_col,
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    dense = spine.join(hourly, [key_col, "hour"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        key_col,
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_value",
        F.col("n_events").isNull().alias("is_gap"),
        F.last("avg_value", ignorenulls=True).over(w).alias("value_locf"),
    )
