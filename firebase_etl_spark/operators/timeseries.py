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


def km_curve(durations: DataFrame) -> DataFrame:
    """Kaplan-Meier survival estimate over right-censored durations —
    the time-to-event analysis behind churn, conversion-latency and
    content-half-life dashboards (Kaplan & Meier 1958). Input: one row
    per subject with ``dur`` (integer elapsed units, >= 0) and
    ``is_event`` (true = the event happened at dur; false = observation
    censored at dur). Output: one row per unit on the dense 0..max(dur)
    spine — (t, n_at_risk, n_events, n_censored, survival).

    Determinism + scale shape (the reasons this isn't the textbook
    cumulative product):
    - S(t) = PROD over v<=t of (n_v - d_v)/n_v is evaluated in LOG
      space: each factor becomes ln(n_v - d_v) - ln(n_v) over the
      PORTABLE libm-free ln (functions/portable_math.py), rounded ONCE
      to a 1e-6 BIGINT; the cumulative sum is an associative integer
      aggregate and S(t) returns through the portable exp2 — the whole
      curve is bit-identical across engines and partitionings, with no
      float ever accumulated. d_v = 0 weeks contribute ln(n)-ln(n) = 0
      exactly (no special case); n_v = d_v pins survival to exactly 0
      from that t on (the flag rides the same bounded join).
    - at-risk counts and the cumulative log both come from BOUNDED
      self-joins over the unit spine (max(dur) rows — weeks/days of
      observation, never subjects), so there is no global-order window
      and nothing scales with the subject count but the first
      aggregate."""
    from firebase_etl_spark.functions.portable_math import (
        LN2_LIT,
        fixed_e6_expr,
        with_exp2,
        with_ln,
    )

    per_t = durations.groupBy(F.col("dur").alias("t")).agg(
        F.sum(F.col("is_event").cast("long")).alias("d"),
        F.sum((~F.col("is_event")).cast("long")).alias("c"),
    )
    mx = F.broadcast(
        per_t.agg(
            F.max("t").alias("tmax"), F.sum(F.col("d") + F.col("c")).alias("n")
        )
    )
    spine = mx.select(
        F.col("n").alias("n_total"),
        F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"),
    )
    dense = spine.join(per_t, "t", "left").select(
        "t",
        "n_total",
        F.coalesce("d", F.lit(0)).alias("d"),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    dense = dense.localCheckpoint(eager=True)  # spine-sized, 3 consumers
    prior = (
        dense.alias("w")
        .join(
            F.broadcast(dense.alias("v")),  # spine-sized: BNLJ, never
            F.col("v.t") < F.col("w.t"),    # an un-broadcast cartesian
            "left",
        )
        .groupBy(F.col("w.t").alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("v.d") + F.col("v.c")), F.lit(0)
            ).alias("gone")
        )
    )
    risk = dense.join(prior, "t").select(
        "t",
        "d",
        "c",
        (F.col("n_total") - F.col("gone")).alias("n"),
    )
    risk = with_ln(risk, "(n - d)", "__lnnd")
    risk = with_ln(risk, "n", "__lnn")
    terms = risk.select(
        "t",
        "d",
        "c",
        "n",
        F.expr(
            "CASE WHEN n > d THEN "
            + fixed_e6_expr("__lnnd - __lnn")
            + " ELSE 0 END"
        ).alias("term_e6"),
        ((F.col("n") > 0) & (F.col("n") == F.col("d")))
        .cast("int")
        .alias("dies"),
    )
    terms = terms.localCheckpoint(eager=True)  # spine-sized, self-joined
    cum = (
        terms.alias("w")
        .join(
            F.broadcast(terms.alias("v")), F.col("v.t") <= F.col("w.t")
        )
        .groupBy(
            F.col("w.t").alias("t"),
            F.col("w.n").alias("n_at_risk"),
            F.col("w.d").alias("n_events"),
            F.col("w.c").alias("n_censored"),
        )
        .agg(
            F.sum(F.col("v.term_e6")).alias("__lns_e6"),
            F.max(F.col("v.dies")).alias("__dead"),
        )
    )
    cum = with_exp2(
        cum,
        f"(CAST(__lns_e6 AS DOUBLE) / 1000000.0) / {LN2_LIT}",
        "__surv",
    )
    return cum.select(
        "t",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.when(F.col("__dead") == 1, F.lit(0.0))
        .otherwise(F.round(F.col("__surv"), 6))
        .alias("survival"),
    ).orderBy("t")
