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


def logrank_test(durations: DataFrame) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966) over right-censored
    durations — "do these two cohorts convert/churn at different
    rates?", the hypothesis test READ-OUT for a pair of Kaplan-Meier
    curves and the standard A/B analysis when the outcome is a
    time-to-event. Input: (dur, is_event, grp) with exactly two grp
    values; output one row: (grp_a, grp_b, n_a, n_b, events_a,
    events_b, observed_minus_expected, chi2) with chi2 ~ chi-square(1)
    under the null (same hazard).

    Determinism + scale shape (the km_curve conventions): per-time O-E
    and variance terms are pure rational functions of exact integer
    counts evaluated by IEEE basic ops only (no transcendentals at
    all), each rounded ONCE to a 1e-6 BIGINT and integer-summed over
    the bounded time spine; at-risk counts come from a broadcast
    bounded spine self-join. d_j = 0 times contribute exact zero; the
    variance term guards n_j > 1. Nothing windows over subjects."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    grps = [
        r["grp"]
        for r in durations.select("grp").distinct().orderBy("grp").collect()
    ]
    if len(grps) != 2:
        raise ValueError("logrank_test needs exactly two grp values")
    g0, g1 = grps
    is0 = F.col("grp") == F.lit(g0)
    pt = durations.groupBy(F.col("dur").alias("t")).agg(
        F.sum((F.col("is_event") & is0).cast("long")).alias("d0"),
        F.sum((~F.col("is_event") & is0).cast("long")).alias("c0"),
        F.sum((F.col("is_event") & ~is0).cast("long")).alias("d1"),
        F.sum((~F.col("is_event") & ~is0).cast("long")).alias("c1"),
    )
    mx = F.broadcast(
        pt.agg(
            F.max("t").alias("tmax"),
            F.sum(F.col("d0") + F.col("c0")).alias("t0"),
            F.sum(F.col("d1") + F.col("c1")).alias("t1"),
        )
    )
    spine = mx.select(
        "t0",
        "t1",
        F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"),
    )
    dense = (
        spine.join(pt, "t", "left")
        .select(
            "t",
            "t0",
            "t1",
            F.coalesce("d0", F.lit(0)).alias("d0"),
            F.coalesce("c0", F.lit(0)).alias("c0"),
            F.coalesce("d1", F.lit(0)).alias("d1"),
            F.coalesce("c1", F.lit(0)).alias("c1"),
        )
        .localCheckpoint(eager=True)
    )
    prior = (
        dense.alias("w")
        .join(F.broadcast(dense.alias("v")), F.col("v.t") < F.col("w.t"), "left")
        .groupBy(F.col("w.t").alias("t"))
        .agg(
            F.coalesce(F.sum(F.col("v.d0") + F.col("v.c0")), F.lit(0)).alias(
                "gone0"
            ),
            F.coalesce(F.sum(F.col("v.d1") + F.col("v.c1")), F.lit(0)).alias(
                "gone1"
            ),
        )
    )
    risk = dense.join(prior, "t").select(
        "t",
        "d0",
        "d1",
        (F.col("t0") - F.col("gone0")).alias("n0"),
        (F.col("t1") - F.col("gone1")).alias("n1"),
        (F.col("d0") + F.col("d1")).alias("d"),
        (F.col("t0") - F.col("gone0") + F.col("t1") - F.col("gone1")).alias(
            "n"
        ),
    )
    oe = fixed_e6_expr("CAST(d0 AS DOUBLE) - (CAST(d AS DOUBLE) * n0 / n)")
    vv = fixed_e6_expr(
        "((CAST(d AS DOUBLE) * n0 / n) * (CAST(n1 AS DOUBLE) / n))"
        " * ((CAST(n AS DOUBLE) - d) / (CAST(n AS DOUBLE) - 1))"
    )
    terms = risk.select(
        F.expr(f"CASE WHEN d > 0 AND n > 0 THEN {oe} ELSE 0 END").alias(
            "oe_e6"
        ),
        F.expr(f"CASE WHEN d > 0 AND n > 1 THEN {vv} ELSE 0 END").alias(
            "v_e6"
        ),
        "d0",
        "d1",
    )
    s = terms.agg(
        F.sum("oe_e6").alias("oe_e6"),
        F.sum("v_e6").alias("v_e6"),
        F.sum("d0").alias("events_a"),
        F.sum("d1").alias("events_b"),
    ).crossJoin(mx.select("t0", "t1"))
    return s.select(
        F.lit(str(g0)).alias("grp_a"),
        F.lit(str(g1)).alias("grp_b"),
        F.col("t0").alias("n_a"),
        F.col("t1").alias("n_b"),
        "events_a",
        "events_b",
        F.round(F.col("oe_e6").cast("double") / 1000000.0, 4).alias(
            "observed_minus_expected"
        ),
        F.when(
            F.col("v_e6") > 0,
            F.round(
                (
                    (F.col("oe_e6").cast("double") / 1000000.0)
                    * (F.col("oe_e6").cast("double") / 1000000.0)
                )
                / (F.col("v_e6").cast("double") / 1000000.0),
                4,
            ),
        ).alias("chi2"),
    )


def changepoint_scan(
    df: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """Single most-likely LEVEL-SHIFT changepoint in the daily event
    count series — the exhaustive binary-segmentation scan (the first
    split of Scott & Knott 1974 / CUSUM-equivalent ranking): every day
    boundary t is scored by the between-segment gain
    G(t) = n1·n2/T · (mean_before − mean_after)², and the argmax is the
    changepoint a monitoring pipeline alerts on (drift/anomaly
    operators flag points; this finds the REGIME boundary).

    Determinism: with s1/n1 the prefix sum/count, d = s1·n2 − s2·n1
    makes G = d²/(n1·n2·T), emitted as the BIGINT ``gain_stat``
    (ranking spec: highest gain_stat, ties to the earliest day —
    mirrored exactly in the oracle); segment means are e2 fixed-point
    integer divisions. Overflow contract (ADVICE r7: the old
    "|d| < 2^31 for daily sums up to 2^26" bound ignored that d scales
    with total-events × spine-length): |d| ≤ s_tot·t_tot, so d² is
    computed on the EXACT integer path only while |d| < 2^31; above
    that the same value comes from IEEE doubles — cast, multiply,
    divide, floor are each bit-deterministic given identical integer
    inputs, so both engines still agree bit-for-bit (and within one
    dataset the two branches mix freely: each candidate's value is the
    same mathematical G to <1 either way). The emitted statistic
    itself needs gain < 2^63, i.e. s_tot² < 2^63·t_tot — an inherent
    bound on the SCORE's magnitude, not an implementation cap (at
    ~3·10⁹ events/day × 1000 days, re-bucket the spine coarser).

    Scale shape: ONE corpus aggregate to daily rows, then everything
    runs on the bounded day spine — prefix sums via a broadcast BNLJ
    self-join (the km_curve pattern; never a global-order window), and
    a TakeOrdered(1) argmax."""
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # day-spine-sized, 3 consumers
    )
    tot = F.broadcast(
        daily.agg(
            F.sum("n").alias("s_tot"), F.count(F.lit(1)).alias("t_tot")
        )
    )
    pre = (
        daily.alias("w")
        .join(
            F.broadcast(daily.alias("v")),
            F.col("v.day") <= F.col("w.day"),
        )
        .groupBy(F.col("w.day").alias("day"))
        .agg(F.sum("v.n").alias("s1"), F.count(F.lit(1)).alias("n1"))
    )
    cand = (
        pre.crossJoin(tot)
        .filter(F.col("n1") < F.col("t_tot"))
        .select(
            "day",
            "n1",
            (F.col("t_tot") - F.col("n1")).alias("n2"),
            "s1",
            (F.col("s_tot") - F.col("s1")).alias("s2"),
            F.col("t_tot"),
        )
        .withColumn(
            "d", F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1")
        )
        .withColumn(
            "gain_stat",
            F.expr(
                "CASE WHEN abs(d) < 2147483648"
                " THEN (d * d) DIV (n1 * n2 * t_tot)"
                " ELSE CAST(floor((CAST(d AS DOUBLE) * CAST(d AS DOUBLE))"
                " / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
                " * CAST(t_tot AS DOUBLE))) AS BIGINT) END"
            ),
        )
    )
    return (
        cand.orderBy(F.desc("gain_stat"), "day")
        .limit(1)
        .select(
            F.col("day").alias("split_day"),
            F.col("n1").alias("n_days_before"),
            F.col("n2").alias("n_days_after"),
            F.expr("(s1 * 100) DIV n1").alias("mean_before_e2"),
            F.expr("(s2 * 100) DIV n2").alias("mean_after_e2"),
            "gain_stat",
        )
    )


def dow_profile(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Day-of-week seasonality profile of the daily event-count series
    — the decomposition a monitoring pipeline subtracts BEFORE calling
    something an anomaly (a quiet Sunday is not an incident). One row
    per weekday: day count, totals, the e2 fixed-point weekday mean,
    and integer residual diagnostics against that mean (sum of
    absolute e2 residuals, the largest positive/negative residual, and
    how many days run above their weekday mean).

    Determinism + scale shape: weekday from pure epoch-day arithmetic
    ((days since 1970-01-01 + 4) % 7, Monday=0 — engine dayofweek()
    conventions disagree, this never does); ONE corpus aggregate to
    daily rows, then every statistic is an integer aggregate over the
    bounded day spine (two passes over spine-sized data: means, then
    residuals). No floats anywhere."""
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "dow",
            # 1970-01-01 was a Thursday; +3 lands Monday on 0
            (
                (F.datediff(F.col("day"), F.lit("1970-01-01")) + 3) % 7
            ).cast("long"),
        )
        .localCheckpoint(eager=True)  # day-spine-sized, 2 consumers
    )
    means = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("total_events"),
    )
    means = means.withColumn(
        "mean_per_day_e2",
        F.expr("(total_events * 100) DIV n_days"),
    )
    resid = (
        daily.join(F.broadcast(means), "dow")
        .withColumn(
            "r_e2", F.col("n") * 100 - F.col("mean_per_day_e2")
        )
        .groupBy("dow")
        .agg(
            F.sum(F.abs(F.col("r_e2"))).alias("sum_abs_resid_e2"),
            F.max("r_e2").alias("max_resid_e2"),
            F.min("r_e2").alias("min_resid_e2"),
            F.sum((F.col("r_e2") > 0).cast("long")).alias(
                "n_days_above_mean"
            ),
        )
    )
    return (
        means.join(resid, "dow")
        .select(
            "dow",
            "n_days",
            "total_events",
            "mean_per_day_e2",
            "sum_abs_resid_e2",
            "max_resid_e2",
            "min_resid_e2",
            "n_days_above_mean",
        )
        .orderBy("dow")
    )


def theil_sen_trend(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Theil-Sen robust trend of the GLOBAL daily event-count series
    (Theil 1950 / Sen 1968): the median of all pairwise day-to-day
    slopes, breakdown point 29.3%. The all-integer single-series
    variant beside events_trend_slopes' per-type form (which publishes
    an interpolated 6dp-double median): here BOTH published statistics
    are integer lower-medians, and the intercept ships too — the
    estimate half of the pair whose significance half is
    mann_kendall_test.

    Determinism: each pairwise slope quantizes ONCE to e6 through the
    shared sign-split division (slopes can be negative), then the
    published statistic is the LOWER MEDIAN (k = (cnt+1) div 2 -th
    smallest, a pure integer selection — never the two-middle average,
    which would re-divide). The intercept is the lower median of
    n_i*1e6 - slope_med_e6*day_i over days, same rules.

    Scale shape: ONE corpus aggregate to daily rows; the pair join and
    both median selections run on the bounded day spine (a T-day
    window is T(T-1)/2 pairs — calendar-bounded, never corpus-bounded;
    3 years is ~600k pairs). Medians select via distinct-value prefix
    counts over broadcast BNLJ self-joins + TakeOrdered(1) — no
    global-order window anywhere (scale-lint enforced). Returns one
    row: (n_days, n_pairs, slope_med_e6 per day, intercept_med_e6 at
    epoch day 0)."""
    from firebase_etl_spark.functions.portable_math import sdiv_scaled_sql

    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "di",
            F.datediff(F.col("day"), F.lit("1970-01-01")).cast("long"),
        )
        .localCheckpoint(eager=True)  # day-spine-sized, 3 consumers
    )
    pairs = (
        daily.alias("a")
        .join(F.broadcast(daily.alias("b")), F.col("a.di") < F.col("b.di"))
        .select(
            F.expr(
                sdiv_scaled_sql("b.n - a.n", "b.di - a.di",
                                1_000_000, "DIV")
            ).cast("long").alias("slope_e6")
        )
    )

    def lower_median(vals: DataFrame, col: str) -> DataFrame:
        """Lower median (k = (cnt+1) div 2 -th smallest) WITHOUT a
        global-order window: distinct-value counts, strictly-<=
        prefix counts via the broadcast BNLJ self-join (the house
        bounded-spine pattern; scale-lint enforced), then the smallest
        value whose prefix reaches k — a TakeOrdered(1) pull. Returns
        one row: (med, cnt)."""
        h = vals.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        h = h.localCheckpoint(eager=True)  # spine-sized, 2 consumers
        tot = F.broadcast(h.agg(F.sum("c").alias("cnt")))
        cum = (
            h.alias("w")
            .join(F.broadcast(h.alias("v")),
                  F.col(f"v.{col}") <= F.col(f"w.{col}"))
            .groupBy(F.col(f"w.{col}").alias("val"))
            .agg(F.sum("v.c").alias("c_le"))
        )
        return (
            cum.crossJoin(tot)
            .filter(F.col("c_le") >= F.expr("(cnt + 1) DIV 2"))
            .orderBy("val")
            .limit(1)
            .select(F.col("val").alias("med"), "cnt")
        )

    med = lower_median(pairs, "slope_e6").select(
        F.col("med").alias("slope_med_e6"), F.col("cnt").alias("n_pairs")
    )
    resid = daily.crossJoin(F.broadcast(med)).select(
        "slope_med_e6",
        "n_pairs",
        (F.col("n") * 1_000_000 - F.col("slope_med_e6") * F.col("di"))
        .alias("b_e6"),
    )
    bmed = lower_median(
        resid.select("b_e6"), "b_e6"
    ).select(
        F.col("med").alias("intercept_med_e6"),
        F.col("cnt").alias("n_days"),
    )
    one = med.crossJoin(F.broadcast(bmed))
    return one.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("slope_med_e6").cast("long").alias("slope_med_e6"),
        F.col("intercept_med_e6").cast("long").alias("intercept_med_e6"),
    )


def ewma_forecast_backtest(
    df: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """EWMA one-step-ahead forecast backtest over the daily event
    counts (alpha = 1/4, the classic operational smoother): state
    s_t = (n_t*1e6 + 3*s_{t-1}) div 4 in pure integer fixed point,
    forecast for day t+1 is s_t, scored against the next OBSERVED day
    and against the naive carry-forward baseline — the skill ratio
    that tells a capacity planner whether smoothing beats "same as
    yesterday" before anyone trusts the forecast.

    Determinism: the recursion is integer-only (positive operands, so
    truncating div == flooring //) and runs over OBSERVED days in day
    order (gap days are not imputed; both engines see the identical
    spine). The Spark side evaluates the recurrence driver-locally on
    the collected day spine — bounded by the CALENDAR (3 years =
    ~1100 rows), never the corpus, the markov_attribution cutover
    pattern — while the corpus-sized work (one aggregate to daily
    rows) stays distributed; the oracle replays the identical
    recursion as a recursive CTE.

    Returns one row: (n_days, ewma_abs_err_e6, naive_abs_err_e6,
    skill_e6 = ewma err * 1e6 div naive err — < 1e6 means the
    smoother wins, forecast_next_e6 = the current state)."""
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day")
    )
    rows = daily.collect()
    spark = df.sparkSession
    schema = (
        "n_days long, ewma_abs_err_e6 long, naive_abs_err_e6 long,"
        " skill_e6 long, forecast_next_e6 long"
    )
    if not rows:
        return spark.createDataFrame([], schema)
    ns = [int(r["n"]) for r in rows]
    s = ns[0] * 1_000_000
    err_ewma = 0
    err_naive = 0
    for i in range(1, len(ns)):
        err_ewma += abs(ns[i] * 1_000_000 - s)
        err_naive += abs(ns[i] - ns[i - 1]) * 1_000_000
        s = (ns[i] * 1_000_000 + 3 * s) // 4
    skill = (
        (err_ewma * 1_000_000) // err_naive if err_naive > 0 else None
    )
    return spark.createDataFrame(
        [(len(ns), err_ewma, err_naive, skill, s)], schema
    )


def mann_kendall_test(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Mann-Kendall monotonic-trend test over the daily event counts
    (Mann 1945 / Kendall 1975) — the SIGNIFICANCE companion to
    theil_sen_trend's magnitude: S = sum over day pairs of
    sign(n_j - n_i), tie-corrected variance
    var = [T(T-1)(2T+5) - sum_g t_g(t_g-1)(2t_g+5)] / 18, and the
    continuity-corrected z = (S -/+ 1)/sqrt(var). |z| > 1.96 is the
    planner's "this series really trends" gate.

    Determinism: S, the tie table and 18*var are EXACT int64 (T-day
    spine: |S| <= T(T-1)/2; 18var < 2T^3 — a decade-long spine is
    ~5e10, comfortable); z quantizes ONCE to e6 through
    sqrt(var) — IEEE-754 requires sqrt be correctly rounded, so the
    double chain CAST->sqrt->divide->fixed_e6 is bit-identical on
    both engines (the same basic-ops argument as portable_math).

    Scale shape: one corpus aggregate to daily rows; the pair
    comparison and tie census run on the calendar-bounded spine.
    Returns one row: (n_days, s_stat, var18 = 18*var exact,
    z_e6)."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # day-spine-sized, 3 consumers
    )
    s_stat = (
        daily.alias("a")
        .join(F.broadcast(daily.alias("b")), F.col("a.day") < F.col("b.day"))
        .agg(
            F.sum(
                F.signum(
                    (F.col("b.n") - F.col("a.n")).cast("double")
                ).cast("long")
            ).cast("long").alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("tg"))
        .agg(
            F.sum(
                F.col("tg") * (F.col("tg") - 1)
                * (2 * F.col("tg") + 5)
            ).cast("long").alias("tie_term"),
            F.sum("tg").cast("long").alias("t_days"),
        )
    )
    return (
        s_stat.crossJoin(F.broadcast(ties))
        .select(
            F.col("t_days").alias("n_days"),
            "s_stat",
            F.expr(
                "t_days * (t_days - 1) * (2 * t_days + 5) - tie_term"
            ).cast("long").alias("var18"),
            F.expr(
                "CASE WHEN t_days * (t_days - 1) * (2 * t_days + 5)"
                " - tie_term = 0 THEN CAST(NULL AS BIGINT) ELSE "
                + fixed_e6_expr(
                    "(CAST(s_stat AS DOUBLE)"
                    " - CAST(CASE WHEN s_stat > 0 THEN 1"
                    "        WHEN s_stat < 0 THEN -1 ELSE 0 END"
                    "   AS DOUBLE))"
                    " / sqrt(CAST(t_days * (t_days - 1)"
                    " * (2 * t_days + 5) - tie_term AS DOUBLE)"
                    " / CAST(18 AS DOUBLE))"
                )
                + " END"
            ).cast("long").alias("z_e6"),
        )
    )


def ks_drift_report(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift test per group —
    early-half vs late-half value distributions, the CDF-distance
    complement to events_psi_drift (PSI reads binned likelihood
    ratios; KS reads the single worst CDF gap, catches location
    shifts PSI's decile bins can smear, and needs no binning at
    all).

    Exact integer formulation over the DISTINCT-VALUE histogram (the
    binary_auc_report trick — codomain-sized, never corpus-sized):
    per distinct value, cumulative per-half counts c1, c2 by ONE
    two-phase grouped prefix sum over sorted values (both running
    sums share the range shuffle; a Window.partitionBy(g) would put
    each group's whole value spine on one of k tasks — the low-k
    class the scale lint flags); D's numerator = max|c1*n2 - c2*n1|
    (exact while n1*n2 < 2^63 — ~3e9 rows per half), ks_e6 its
    sign-split e6 quotient. The alpha=0.05 two-sample threshold
    1.3581015... * sqrt((n1+n2)/(n1*n2)) is one shared literal *
    sqrt * divide chain — correctly rounded IEEE on both engines.
    Returns per group: (group, n_early, n_late, ks_e6, ks_at_value,
    crit_e6, drifted)."""
    from firebase_etl_spark.functions.portable_math import (
        dlit,
        fixed_e6_expr,
        sdiv_scaled_sql,
    )
    from firebase_etl_spark.operators.stats import with_grouped_prefix_sum

    base = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    ).filter(
        F.col("g").isNotNull()
        & F.col("v").isNotNull()
        & F.col("us").isNotNull()
    )
    # midpoint truncation note (ADVICE r10): Spark DIV truncates
    # toward zero, the oracle's // floors — identical ONLY while
    # mn + mx >= 0, i.e. timestamps at/after the 1970 epoch (every
    # fixture; pre-1970 feeds must sign-split this midpoint)
    span = F.broadcast(
        base.agg(
            F.expr(
                "(CAST(min(us) AS BIGINT) + CAST(max(us) AS BIGINT))"
                " DIV 2"
            ).alias("tmid")
        )
    )
    halves = base.crossJoin(span).select(
        "g", "v",
        (F.col("us") <= F.col("tmid")).cast("int").alias("early"),
    )
    hist = halves.groupBy("g", "v").agg(
        F.sum("early").cast("long").alias("d1"),
        F.sum(1 - F.col("early")).cast("long").alias("d2"),
    ).localCheckpoint(eager=True)  # distinct-value-sized; 3 consumers
    # per-group (n1, n2) ride the helper's broadcast offset map
    # (total_out) — no separate totals aggregate + join
    cum = (
        with_grouped_prefix_sum(
            hist, "g", ["v"], ["d1", "d2"], ["c1", "c2"],
            total_out=["n1", "n2"],
            materialize_input=False,  # hist is already checkpointed
        )
        .withColumn(
            "gap", F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
        )
    )
    mx = cum.groupBy("g").agg(F.max("gap").alias("dnum"))
    best = (
        cum.join(mx, "g")
        .filter(F.col("gap") == F.col("dnum"))
        .groupBy("g", "n1", "n2", "dnum")
        .agg(F.min("v").alias("ks_at_value"))
    )
    ks = sdiv_scaled_sql("dnum", "n1 * n2", 1000000, "DIV")
    crit = (
        f"{dlit(1.3581015157406195)} * sqrt("
        "(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"
        " / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))"
    )
    return best.select(
        F.col("g").alias(group_col),
        F.col("n1").alias("n_early"),
        F.col("n2").alias("n_late"),
        F.expr(
            f"CASE WHEN n1 > 0 AND n2 > 0 THEN {ks} END"
        ).alias("ks_e6"),
        F.round(F.col("ks_at_value"), 6).alias("ks_at_value"),
        F.expr(
            f"CASE WHEN n1 > 0 AND n2 > 0"
            f" THEN {fixed_e6_expr(crit)} END"
        ).alias("crit_e6"),
        F.expr(
            f"CASE WHEN n1 > 0 AND n2 > 0 THEN"
            f" ({ks}) >= {fixed_e6_expr(crit)} ELSE false END"
        ).alias("drifted"),
    ).orderBy(group_col)


def _tdiv4(x: int) -> int:
    """Sign-split truncating /4 — Python twin of both engines'
    truncating integer division on the Holt recursion's signed
    state."""
    return (abs(x) // 4) * (1 if x >= 0 else -1)


def holt_forecast_backtest(
    df: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """Holt double-exponential (level + trend) one-step backtest over
    the daily counts — the forecasting rung above
    ewma_forecast_backtest: EWMA lags any persistent trend by
    construction; Holt's second state soaks the trend up, and the
    published skill ratio vs the same naive carry-forward baseline
    says whether that second state EARNS anything on this series
    (alpha = beta = 1/4).

    Same cutover as EWMA: the corpus collapses to a calendar-bounded
    day spine in one aggregate; the recursion runs driver-locally in
    exact integers (e6 level/trend, sign-split truncating /4 — the
    trend state goes negative, so _tdiv4 == both engines' truncating
    division) and the oracle replays it as a recursive CTE. Init:
    l = n_1*1e6, b = (n_2 - n_1)*1e6 (needs >= 2 observed days;
    scoring starts at day 2 like EWMA's).

    Returns one row: (n_days, holt_abs_err_e6, naive_abs_err_e6,
    skill_e6, level_e6, trend_e6, forecast_next_e6)."""
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day")
    )
    rows = daily.collect()
    spark = df.sparkSession
    schema = (
        "n_days long, holt_abs_err_e6 long, naive_abs_err_e6 long,"
        " skill_e6 long, level_e6 long, trend_e6 long,"
        " forecast_next_e6 long"
    )
    ns = [int(r["n"]) for r in rows]
    if len(ns) < 2:
        return spark.createDataFrame([], schema)
    lvl = ns[0] * 1_000_000
    b = (ns[1] - ns[0]) * 1_000_000
    errh = errn = 0
    for i in range(1, len(ns)):
        f = lvl + b
        errh += abs(ns[i] * 1_000_000 - f)
        errn += abs(ns[i] - ns[i - 1]) * 1_000_000
        lp = lvl
        lvl = _tdiv4(ns[i] * 1_000_000 + 3 * f)
        b = _tdiv4((lvl - lp) + 3 * b)
    skill = (errh * 1_000_000) // errn if errn > 0 else None
    return spark.createDataFrame(
        [(len(ns), errh, errn, skill, lvl, b, lvl + b)], schema
    )


def next_event_accuracy(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Next-event prediction backtest — does the first-order Markov
    model actually PREDICT: train argmax-transition predictions on
    the early half of each user's stream, score top-1 accuracy on the
    late half, and publish the majority-class baseline beside it (a
    transition matrix that can't beat 'always predict the most common
    type' is a visualization, not a model). The eval companion to
    events_transition_matrix / events_markov_attribution.

    Split: a consecutive pair belongs to the half containing its
    LATER event (integer microsecond midpoint). Prediction ties break
    to the lexicographically smallest type; unseen test states fall
    back to the global majority. One lag window per user (the
    session_event_pairs shuffle), then everything is
    state-table-sized. Returns per observed test state: (from_state,
    predicted_to, n_test, n_correct, acc_e6, baseline_to,
    n_baseline_correct, baseline_acc_e6), ordered by from_state."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    base = df.filter(
        F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(id_col).alias("eid"),
    )
    w = Window.partitionBy("u").orderBy("us", "eid")
    pairs = (
        base.withColumn("nxt", F.lead("t").over(w))
        .withColumn("nxt_us", F.lead("us").over(w))
        .filter(F.col("nxt").isNotNull())
    )
    # midpoint truncation note (ADVICE r10): Spark DIV truncates
    # toward zero, the oracle's // floors — identical ONLY while
    # mn + mx >= 0, i.e. timestamps at/after the 1970 epoch (every
    # fixture; pre-1970 feeds must sign-split this midpoint)
    span = F.broadcast(
        base.agg(
            F.expr(
                "(CAST(min(us) AS BIGINT) + CAST(max(us) AS BIGINT))"
                " DIV 2"
            ).alias("tmid")
        )
    )
    pairs = pairs.crossJoin(span).withColumn(
        "is_train", F.col("nxt_us") <= F.col("tmid")
    )
    train = pairs.filter("is_train").groupBy("t", "nxt").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=True)  # state-table-sized; 2 consumers
    pw = Window.partitionBy("t").orderBy(F.desc("c"), "nxt")
    pred = (
        train.withColumn("r", F.row_number().over(pw))
        .filter(F.col("r") == 1)
        .select(F.col("t").alias("pt"), F.col("nxt").alias("predicted"))
    )
    maj = F.broadcast(
        train.groupBy("nxt").agg(F.sum("c").alias("c"))
        .orderBy(F.desc("c"), "nxt").limit(1)
        .select(F.col("nxt").alias("baseline_to"))
    )
    test = (
        pairs.filter(~F.col("is_train"))
        .join(F.broadcast(pred), F.col("t") == F.col("pt"), "left")
        .crossJoin(maj)
        .withColumn(
            "pfinal", F.coalesce("predicted", "baseline_to")
        )
    )
    acc = sdiv_scaled_sql("n_correct", "n_test", 1000000, "DIV")
    bacc = sdiv_scaled_sql("n_bcorrect", "n_test", 1000000, "DIV")
    return (
        test.groupBy("t")
        .agg(
            F.max("pfinal").alias("predicted_to"),
            F.max("baseline_to").alias("baseline_to"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum((F.col("nxt") == F.col("pfinal")).cast("long"))
            .cast("long").alias("n_correct"),
            F.sum((F.col("nxt") == F.col("baseline_to")).cast("long"))
            .cast("long").alias("n_bcorrect"),
        )
        .select(
            F.col("t").alias("from_state"),
            "predicted_to",
            "n_test", "n_correct",
            F.expr(acc).alias("acc_e6"),
            "baseline_to",
            F.col("n_bcorrect").alias("n_baseline_correct"),
            F.expr(bacc).alias("baseline_acc_e6"),
        )
        .orderBy("from_state")
    )


def dau_mau_stickiness(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """DAU/MAU stickiness per calendar month — the growth metric every
    product dashboard leads with ('how many of the month's users show
    up on a given day'): average daily-active count over the month's
    observed days divided by the month's distinct actives. WAU/MAU
    variants are the same shape; the month window is the standard
    published form.

    Exact distincts at both granularities (one aggregate each — at
    sketch-worthy scale swap the day/month count-distincts for the
    KMV operator, same join spine); the ratio quantizes once. Returns
    per month: (month, n_days_observed, total_dau, avg_dau_e2, mau,
    stickiness_e6), ordered by month."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    base = df.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.to_date(ts_col).alias("day"),
        F.date_format(ts_col, "yyyy-MM").alias("month"),
    )
    dau = base.groupBy("month", "day").agg(
        F.countDistinct("u").cast("long").alias("dau")
    )
    per_m = dau.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_observed"),
        F.sum("dau").cast("long").alias("total_dau"),
    )
    mau = base.groupBy("month").agg(
        F.countDistinct("u").cast("long").alias("mau")
    )
    avg_dau = sdiv_scaled_sql("total_dau", "n_days_observed", 100, "DIV")
    stick = sdiv_scaled_sql(
        "total_dau", "n_days_observed * mau", 1000000, "DIV"
    )
    return (
        per_m.join(mau, "month")
        .select(
            "month", "n_days_observed", "total_dau",
            F.expr(avg_dau).alias("avg_dau_e2"),
            "mau",
            F.expr(
                f"CASE WHEN mau > 0 THEN {stick} END"
            ).alias("stickiness_e6"),
        )
        .orderBy("month")
    )


def cusum_alarms(
    df: DataFrame,
    ts_col: str = "ts",
    baseline_days: int = 7,
    k_div: int = 20,
    h_div: int = 2,
) -> DataFrame:
    """Page's CUSUM drift alarm over the daily event counts (Page 1954
    — the sequential complement to the retrospective changepoint scan:
    changepoint_scan asks WHERE a completed series split, CUSUM is the
    monitor you run forward to catch the drift as it happens). Two
    one-sided cumulative sums against the baseline mean mu0 of the
    first ``baseline_days`` days:

        s_pos_d = max(0, s_pos_{d-1} + (x_d - mu0 - k))
        s_neg_d = max(0, s_neg_{d-1} + (mu0 - x_d - k))

    with allowance k = mu0 DIV ``k_div`` and threshold
    h = mu0 DIV ``h_div`` — configured rationals (the Fellegi-Sunter
    m-probability convention: parameters are stated conventions, the
    data supplies mu0), all arithmetic exact integers.

    Same cutover as EWMA/Holt: one corpus aggregate to the
    calendar-bounded day spine, recursion driver-local, recursive-CTE
    oracle. Returns one row per scored day (after the baseline
    window): (day, n_events, mu0, s_pos, s_neg, alarm_up, alarm_down),
    ordered by day."""
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day")
    )
    rows = daily.collect()
    spark = df.sparkSession
    schema = (
        "day date, n_events long, mu0 long, s_pos long, s_neg long,"
        " alarm_up boolean, alarm_down boolean"
    )
    if len(rows) <= baseline_days:
        return spark.createDataFrame([], schema)
    ns = [int(r["n"]) for r in rows]
    mu0 = sum(ns[:baseline_days]) // baseline_days
    k = mu0 // k_div
    h = mu0 // h_div
    out = []
    s_pos = s_neg = 0
    for r, x in zip(rows[baseline_days:], ns[baseline_days:]):
        s_pos = max(0, s_pos + (x - mu0 - k))
        s_neg = max(0, s_neg + (mu0 - x - k))
        out.append(
            (r["day"], x, mu0, s_pos, s_neg, s_pos > h, s_neg > h)
        )
    return spark.createDataFrame(out, schema)


def pearson_e6_sql() -> str:
    """Pearson correlation at e6 as ONE shared SQL expression over
    exact integer moment columns (np, sx, sy, sxy, sxx, syy) —
    identical text on both engines. The moments stay exact int64
    (callers state their magnitude gates); the classic
    (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) combination
    runs in doubles over them and quantizes ONCE. NULL when either
    marginal variance degenerates."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    num = (
        "(CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    vx = (
        "(CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    vy = (
        "(CAST(np AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    return (
        f"CASE WHEN {vx} <= 0 OR {vy} <= 0 THEN CAST(NULL AS BIGINT)"
        f" ELSE {fixed_e6_expr(f'{num} / sqrt({vx} * {vy})')} END"
    )


def acf_report(
    df: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation of the daily event-count series at lags
    1..max_lag — the seasonality/persistence read every forecasting
    and anomaly threshold implicitly assumes away (a strong lag-7
    spike means weekly cadence; slow decay means bursts violate the
    iid alarms): per lag, the Pearson correlation between the series
    and its lag-shifted self over CALENDAR-JOINED day pairs (missing
    days simply produce no pair — no imputation, stated).

    Scale shape: one corpus scan -> per-day counts (map-side
    combinable, calendar-bounded spine, checkpointed once), each day
    row fans out to max_lag (day, lag) probes, and the pair join is
    an equi-join on the shifted date — hash join on a bounded table,
    never a window. Integer moments exact while daily counts stay
    < ~3e9 (products < 2^63 over a 10-year spine — stated bound);
    only pearson_e6_sql leaves the integers. Returns per lag:
    (lag, n_pairs, r_e6), ordered by lag."""
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .localCheckpoint(eager=True)  # calendar-bounded spine
    )
    probes = daily.select(
        "d",
        F.col("x").alias("xa"),
        F.explode(
            F.sequence(F.lit(1), F.lit(max_lag))
        ).alias("lag"),
    ).withColumn("d2", F.date_add(F.col("d"), F.col("lag")))
    pairs = probes.join(
        daily.select(F.col("d").alias("d2"), F.col("x").alias("xb")),
        "d2",
    )
    z = pearson_e6_sql()
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("np"),
            F.sum("xa").cast("long").alias("sx"),
            F.sum("xb").cast("long").alias("sy"),
            F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sxy"),
            F.sum(F.col("xa") * F.col("xa")).cast("long").alias("sxx"),
            F.sum(F.col("xb") * F.col("xb")).cast("long").alias("syy"),
        )
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.col("np").alias("n_pairs"),
            F.expr(z).cast("long").alias("r_e6"),
        )
        .orderBy("lag")
    )


def _ols_num_vx() -> tuple[str, str]:
    num = (
        "(CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    vx = (
        "(CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return num, vx


def ols_slope_e6_sql() -> str:
    """OLS slope at e6 over the exact integer moment columns
    (np, sx, sy, sxy, sxx) — the regression companion to
    pearson_e6_sql, same shared-text convention: the moments stay
    exact int64, the (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2) combination runs
    in doubles and quantizes ONCE. NULL when x is constant."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    num, vx = _ols_num_vx()
    return (
        f"CASE WHEN {vx} <= 0 THEN CAST(NULL AS BIGINT)"
        f" ELSE {fixed_e6_expr(f'{num} / {vx}')} END"
    )


def ols_intercept_e6_sql() -> str:
    """OLS intercept at e6 over the same moment columns:
    (Sy - slope*Sx)/n in doubles, quantized once; NULL when x is
    constant."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    num, vx = _ols_num_vx()
    inner = (
        f"(CAST(sy AS DOUBLE) - ({num} / {vx}) * CAST(sx AS DOUBLE))"
        " / CAST(np AS DOUBLE)"
    )
    return (
        f"CASE WHEN {vx} <= 0 THEN CAST(NULL AS BIGINT)"
        f" ELSE {fixed_e6_expr(inner)} END"
    )
