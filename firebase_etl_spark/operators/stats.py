"""Statistics surface (SURVEY §2.5 A1-A10).

The reference computes its stats with one SQL query per metric over separate
connections (postgres_loader.py:426-472) and boolean ``.sum()``s
(firebase_service.py:189-192). The engine computes all scalar metrics in ONE
aggregation pass (single scan, map-side partial aggs) and returns grouped
distributions as DataFrames.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def user_stats(df: DataFrame) -> dict:
    """Scalar metrics in one pass: total, hasEmail sum, provider conditional
    counts, recent-30d count (A1, A4, A6)."""
    exprs = [F.count(F.lit(1)).alias("total_users")]
    if "email" in df.columns:
        exprs.append(F.count(F.col("email")).alias("users_with_email"))
    if "provider" in df.columns:
        exprs.append(F.count_if(F.col("provider") == "CREDENTIALS").alias("credentials_users"))
        exprs.append(F.count_if(F.col("provider") == "google.com").alias("google_users"))
    if "createdAt" in df.columns:
        exprs.append(
            F.count_if(
                F.col("createdAt") >= F.current_timestamp() - F.expr("INTERVAL 30 DAYS")
            ).alias("recent_users_30d")
        )
    row = df.agg(*exprs).collect()[0]
    return row.asDict()


def distribution(df: DataFrame, key: str) -> DataFrame:
    """GROUP BY key COUNT(*) (A2/A3: provider / emailVerified distributions)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).orderBy(F.desc("n"), key)


def duplicate_groups(df: DataFrame, key: str) -> DataFrame:
    """Values of ``key`` occurring more than once (A5: HAVING COUNT(*)>1)."""
    return (
        df.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def null_counts(df: DataFrame, columns: tuple[str, ...]) -> DataFrame:
    """Per-column null counts in one pass (A8)."""
    return df.agg(
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls") for c in columns]
    )


def describe(df: DataFrame) -> DataFrame:
    """Summary statistics (A9 — df.describe())."""
    return df.summary()


def with_observed_counts(df: DataFrame, name: str, conditions: dict):
    """A10 side-channel metrics without a second scan: attach ``observe``
    metrics (count-if per named condition) that materialize when the plan
    executes — the distributed replacement for the reference's Python
    success/fail counters (user_transformer.py:40-43; collected via
    ``spark.sparkContext`` listener or ``Observation``)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("total")] + [
        F.count_if(cond).alias(metric) for metric, cond in conditions.items()
    ]
    return df.observe(obs, *metrics), obs


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``) — the rebalancing step
    of a training-data pipeline (e.g. downsample over-represented languages
    or event types). One scan, no shuffle: each row draws against its
    stratum's fraction. Deterministic for a fixed seed and partitioning;
    exact-count-per-stratum sampling would need a window (sort by random,
    row_number <= n) at one shuffle — this is the cheap path."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
) -> DataFrame:
    """Deterministic per-stratum *universe* sampling: keep a row iff the
    60-bit prefix of md5(key) falls below fraction * 2^60.

    Same one-scan/no-shuffle cost as ``stratified_sample``, but the
    selection is CONTENT-addressed instead of RNG-addressed: identical
    across engines, partitionings, retries, and runs — which is what an
    auditable training-data pipeline needs (and what makes a cross-engine
    oracle possible; any engine with md5 replays it). Sampling the same
    key universe across tables also keeps joins closed under sampling.
    Quota is fraction ± binomial noise; for EXACT quotas use the
    rank-window pattern (documents_mixture_sample) at one shuffle.

    Thresholds are computed as INTEGER literals driver-side so both sides
    of a comparison avoid engine-specific double->int cast semantics
    (Spark truncates, DuckDB rounds)."""
    u = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    thresh = F.coalesce(
        *[
            F.when(F.col(strata_col) == k, F.lit(int(v * (1 << 60))))
            for k, v in fractions.items()
        ],
        F.lit(0),
    )
    return df.filter(u < thresh)


def source_drift_report(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    n_bins: int = 20,
) -> DataFrame:
    """Distribution-drift screen across corpus slices (the
    snapshot/ingest QA step of a training pipeline): total-variation
    distance between each group's ``value_col`` histogram and the whole
    corpus's, over ``n_bins`` equal-width bins. Returns (group, n_docs,
    tv_distance, max_bin_gap) — tv_distance in [0, 1], 0 = identical
    shape; a source whose length profile suddenly shifts (truncation,
    boilerplate injection, encoding breakage) stands out without any
    reference snapshot to diff against.

    Each group is compared to the CORPUS, not pairwise — linear in the
    number of groups, so a million-source web crawl costs the same two
    aggregates as twenty sources.

    DETERMINISM: per-bin |p - q| terms are rounded ONCE to 1e-6-unit
    BIGINTs and integer-summed per group (the fixed-point house
    pattern); bin edges are one exact-integer min/max divided once, so
    bin assignment is the identical IEEE floor on every engine.

    Scale shape: one (group, bin) aggregate [the only corpus-wide
    shuffle], densified against a literal bin spine per group (missing
    bins count as 0 — skipping them understates drift), corpus bin
    totals via a bin-keyed window over the group histogram (linear
    chain, no join-back), then a group-keyed rollup.

    NULL ``value_col`` rows are excluded UP FRONT (ADVICE r5 #1: they
    previously inflated the corpus count(*) normalizer while silently
    falling off the 0..n_bins-1 bin spine, biasing tv_distance for
    every group whenever NULLs exist; both oracles mirror the
    filter)."""
    from firebase_etl_spark.functions.portable_math import (
        round_nudged,
    )

    df = df.filter(F.col(value_col).isNotNull())
    scal = df.agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if not scal["n"]:
        return df.sparkSession.createDataFrame(
            [],
            f"{group_col} string, n_docs bigint, tv_distance double,"
            " max_bin_gap double",
        )
    # float() handles integer and double value columns alike; for
    # integer columns the conversion is exact, so bin edges match an
    # all-integer oracle bit-for-bit
    lo = float(scal["lo"])
    width = (float(scal["hi"]) - lo) / float(n_bins)
    n_total = int(scal["n"])
    if width > 0:
        bin_expr = F.least(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
            F.lit(n_bins - 1),
        ).cast("int")
    else:
        bin_expr = F.lit(0)  # degenerate: every value identical
    hist = (
        df.select(F.col(group_col).alias("grp"), bin_expr.alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # dense (group x bin) spine: a group missing a bin still contributes
    # |0 - q_bin| to its distance
    spine = (
        hist.select("grp")
        .distinct()
        .select(
            "grp", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
        )
    )
    dense = spine.join(hist, ["grp", "bin"], "left").select(
        "grp", "bin", F.coalesce("c", F.lit(0)).alias("c")
    )
    dense = dense.withColumn(
        "corpus_bin", F.sum("c").over(Window.partitionBy("bin"))
    ).withColumn("n_grp", F.sum("c").over(Window.partitionBy("grp")))
    gap_e6 = F.round(
        F.abs(
            F.col("c") / F.col("n_grp")
            - F.col("corpus_bin") / F.lit(n_total)
        )
        * 1000000.0,
        0,
    ).cast("long")
    return (
        dense.select("grp", "n_grp", gap_e6.alias("gap_e6"))
        .groupBy("grp", "n_grp")
        .agg(
            round_nudged(
                F.sum("gap_e6") / F.lit(2000000.0), 6
            ).alias("tv_distance"),
            (F.max("gap_e6") / F.lit(1000000.0)).alias("max_bin_gap"),
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("n_grp").alias("n_docs"),
            "tv_distance",
            "max_bin_gap",
        )
        .orderBy(group_col)
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    salt: str = "ws1",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis
    2006): keep the k rows with the largest priority u^(1/w), u a
    CONTENT-addressed uniform — the quality-weighted mixture draw of a
    training pipeline (sample documents proportional to a quality or
    length weight), with the same auditability contract as
    ``stratified_sample_hash``: identical across engines,
    partitionings, retries and runs, and replayable by any engine with
    md5.

    u is the 60-bit md5 prefix of (salt || key) mapped to (0, 1]; the
    emitted priority is the equivalent log-key ln(u)/w (monotone in
    u^(1/w) for w > 0, but spread over a numeric range that survives
    rounding — u^(1/w) itself collapses onto 1 - epsilon for large
    weights), computed as (ln(num) - ln(2^60)) / w over the PORTABLE
    libm-free ln (functions/portable_math.py) so both engines round the
    bit-identical double — JVM Math.log vs DuckDB ln can differ by one
    ulp on the same rational, the flake class that cost the DSIR query
    two driver rounds. Rounded to 9dp before the rank; ties break to
    the lower key. Rows with NULL or non-positive weight are excluded
    (they have zero inclusion probability).

    One scan, no shuffle, global top-k via orderBy+limit
    (TakeOrderedAndProject — no global-order window). Changing ``salt``
    redraws the sample; fixing it freezes the draw forever."""
    from firebase_etl_spark.functions.portable_math import with_ln

    w = F.col(weight_col).cast("double")
    num = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(1)
    )
    out = df.filter(w > 0).withColumn("__ws_num", num)
    out = with_ln(out, "__ws_num", "__ws_lnnum")
    out = with_ln(out, str(1 << 60), "__ws_lnden")
    pr = F.round(
        (F.col("__ws_lnnum") - F.col("__ws_lnden")) / w, 9
    )
    return (
        out.withColumn("priority", pr)
        .drop("__ws_num", "__ws_lnnum", "__ws_lnden")
        .orderBy(F.col("priority").desc(), F.col(key_col))
        .limit(k)
    )


def grouped_split(
    df: DataFrame,
    group_col: str,
    salt: str = "gs1",
    pct_train: int = 70,
    pct_val: int = 85,
) -> DataFrame:
    """GROUP-leakage-safe train/val/test assignment: the split is a
    function of the GROUP key (source/site/author), so every document
    of a group lands in the same split — the guard against same-site
    near-duplicates straddling train and test, which content-addressed
    splitting (documents_split_assignment) cannot give by itself (two
    near-identical pages hash to different splits). The standard
    GroupShuffleSplit semantic, content-addressed like every sampler
    here: md5(salt || group) against integer thresholds, identical
    across engines/partitionings/runs. ``pct_val`` is the CUMULATIVE
    train+val percentage. One scan, no shuffle, no RNG state."""
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(group_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    split = (
        F.when(u < F.lit((1 << 60) * pct_train // 100), "train")
        .when(u < F.lit((1 << 60) * pct_val // 100), "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


def decay_engagement_scores(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    half_life_days: float = 7.0,
    k: int = 50,
) -> DataFrame:
    """Recency-weighted engagement: each event contributes
    2^(-age / half_life) and the per-key sum ranks who is active NOW —
    the exponential-decay score behind churn/engagement dashboards and
    freshness-weighted sampling (an old burst and a steady trickle count
    very differently at the same raw event count).

    Determinism: the anchor is the table's own max timestamp (data-
    derived — never wall-clock), ages are exact BIGINT microsecond
    differences, 2^(-age/half_life) is the PORTABLE libm-free exp2
    (functions/portable_math.py — libm ``pow`` may differ by one ulp
    between the JVM and DuckDB, the DSIR flake class), and each
    contribution is rounded ONCE to a 1e-6-unit BIGINT (+1e-9 nudge)
    so the per-key reduction is an associative integer sum. Top-k
    leaves by (exact integer score desc, key) as TakeOrderedAndProject
    — no global window. One scan + one keyed shuffle; the anchor row
    broadcasts."""
    from firebase_etl_spark.functions.portable_math import with_exp2

    us = F.unix_micros(F.col(ts_col))
    anchor = F.broadcast(
        df.filter(F.col(key_col).isNotNull()).agg(F.max(us).alias("__a"))
    )
    hl_us = float(half_life_days) * 86400.0 * 1e6
    base = (
        df.filter(F.col(key_col).isNotNull())
        .crossJoin(anchor)
        .select(
            F.col(key_col),
            F.col(ts_col),
            ((F.col("__a") - us) / F.lit(hl_us)).alias("__age"),
        )
    )
    base = with_exp2(base, "(- __age)", "__decay")
    contrib = F.round(
        F.col("__decay") * 1000000.0 + 1e-9, 0
    ).cast("long")
    scored = (
        base.select(F.col(key_col), F.col(ts_col), contrib.alias("c_e6"))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("last_seen"),
            F.sum("c_e6").alias("score_e6"),
        )
    )
    return (
        scored.orderBy(F.desc("score_e6"), key_col)
        .limit(k)
        .select(
            key_col,
            "n_events",
            "last_seen",
            F.round(F.col("score_e6").cast("double") / 1000000.0, 6).alias(
                "decay_score"
            ),
        )
    )


def negative_samples(
    df: DataFrame,
    anchor_filter,
    id_col: str,
    label_col: str,
    k: int = 5,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for each
    anchor row, ``k`` candidates with a DIFFERENT label, drawn by ranking
    md5(salt:anchor:candidate) — content-addressed like the split/sample
    operators, so the drawn pairs are identical across engines, runs and
    partitionings with no RNG state, and re-salting gives a fresh
    independent draw (epoch re-sampling). NULL-labeled candidates are
    excluded against every anchor (null-safe inequality).

    Shape: anchors are a bounded sample (broadcast); candidates stream
    once past them; per-anchor rank window (non-empty partition spec).
    Returns (anchor_id, anchor_label, neg_id, neg_label, rank)."""
    anchors = df.filter(anchor_filter).select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
    )
    cands = df.select(
        F.col(id_col).alias("neg_id"), F.col(label_col).alias("neg_label")
    )
    pairs = cands.crossJoin(F.broadcast(anchors)).filter(
        (F.col("neg_id") != F.col("anchor_id"))
        & F.col("neg_label").isNotNull()
        & ~F.col("neg_label").eqNullSafe(F.col("anchor_label"))
    )
    key = F.md5(
        F.concat_ws(
            ":",
            F.lit(salt),
            F.col("anchor_id").cast("string"),
            F.col("neg_id").cast("string"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(key, "neg_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "anchor_label", "neg_id", "neg_label", "rank")
        .orderBy("anchor_id", "rank")
    )


def mutual_information(
    df: DataFrame, col_a: str, col_b: str, label: str | None = None
) -> DataFrame:
    """Mutual information I(A;B) in nats between two categorical
    columns — the information-theoretic complement to cramers_v: V
    answers "how far from independent", MI answers "how many nats of A
    do you learn from B", the quantity feature selectors rank by.
    One row: (pair, n_rows, ka, kb, mi_nats, mi_ratio) with mi_ratio =
    MI / ln(min(ka, kb)) in [0, 1] (NULL when either column is
    constant — the bound is 0 nats and the ratio undefined).

    Exactness: I = (1/n) * sum over OBSERVED cells of
    o * (ln o + ln n - ln r - ln c) — every argument is an exact
    integer count, all four logs are the PORTABLE libm-free ln
    (functions/portable_math.py), each cell's term is rounded ONCE to
    a 1e-6 BIGINT and integer-summed. Zero cells contribute 0·ln 0 = 0
    and are simply absent (no grid completion needed, unlike the
    chi-square). Same scale shape as cramers_v: one corpus pass into a
    KB-sized contingency table, materialized once for its consumers."""
    from firebase_etl_spark.functions.portable_math import (
        fixed_e6_expr,
        with_ln,
    )

    pair = label or f"{col_a} x {col_b}"
    base = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
    cells = (
        base.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)
    )
    # the margin tables each feed TWO consumers (the totals row and the
    # grid join) - un-materialized, each consumer re-runs the margin
    # shuffle over cells (the modularity/DBSCAN two-consumer-tail
    # pattern, VERDICT r9 #4); both are k-row tiny
    ra = cells.groupBy("a").agg(F.sum("o").alias("r")).localCheckpoint(
        eager=True
    )
    cb = cells.groupBy("b").agg(F.sum("o").alias("c")).localCheckpoint(
        eager=True
    )
    # n == sum of row margins, so one agg over ra yields (n, ka) — one
    # fewer 1-row aggregate exchange than a separate cells.agg
    tot = F.broadcast(
        ra.agg(
            F.sum("r").alias("n"), F.count(F.lit(1)).alias("ka")
        ).crossJoin(F.broadcast(cb.agg(F.count(F.lit(1)).alias("kb"))))
    )
    grid = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(tot)
    )
    grid = with_ln(grid, "o", "__lno")
    grid = with_ln(grid, "r", "__lnr")
    grid = with_ln(grid, "c", "__lnc")
    grid = with_ln(grid, "n", "__lnn")
    term = F.expr(
        fixed_e6_expr("o * ((__lno + __lnn) - (__lnr + __lnc))")
    )
    s = grid.select(
        term.alias("t"), "n", "ka", "kb"
    ).groupBy("n", "ka", "kb").agg(F.sum("t").alias("mi_e6"))
    s = with_ln(s, "least(ka, kb)", "__lnk")
    mi = F.col("mi_e6").cast("double") / 1000000.0 / F.col("n")
    return s.select(
        F.lit(pair).alias("pair"),
        F.col("n").alias("n_rows"),
        "ka",
        "kb",
        F.round(mi, 6).alias("mi_nats"),
        F.when(
            F.least("ka", "kb") > 1, F.round(mi / F.col("__lnk"), 6)
        ).alias("mi_ratio"),
    )


def cramers_v(
    df: DataFrame, col_a: str, col_b: str, label: str | None = None
) -> DataFrame:
    """Cramer's V association between two categorical columns — the
    profiling answer to 'are these columns redundant / correlated'
    that Pearson can't give for categories. One row: (pair, n, dof,
    chi2, cramers_v).

    Exactness: every contingency quantity is an integer (cell o, row
    total r, column total c, grand total n), so each cell's chi-square
    term (o*n - r*c)^2 / (n*r*c) is one fixed-order double expression
    over exact integers, rounded once to a 1e-6 BIGINT and integer-
    summed — deterministic across engines and partitionings. The grid
    is completed with zero-observed cells (they contribute e = r*c/n)
    by a broadcast cross of the two tiny margin tables. Integer
    products o*n and r*c cap the method at ~3e9 rows per audit (past
    that, pre-aggregate or sample — documented headroom, the pagerank
    convention)."""
    pair = label or f"{col_a} x {col_b}"
    base = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
    # the contingency table is KB-sized (k_a x k_b cells) but feeds
    # FOUR consumers (row margins, column margins, totals, the grid
    # join) — materialize it once so the fact-table scan+groupBy runs
    # once, not ~5x (VERDICT r5 measured 50 exchanges on the audit
    # query without this)
    cells = (
        base.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)
    )
    # the margin tables each feed TWO consumers (the totals row and the
    # grid join) - un-materialized, each consumer re-runs the margin
    # shuffle over cells (the modularity/DBSCAN two-consumer-tail
    # pattern, VERDICT r9 #4); both are k-row tiny
    ra = cells.groupBy("a").agg(F.sum("o").alias("r")).localCheckpoint(
        eager=True
    )
    cb = cells.groupBy("b").agg(F.sum("o").alias("c")).localCheckpoint(
        eager=True
    )
    # n == sum of row margins, so one agg over ra yields (n, ka) — one
    # fewer 1-row aggregate exchange than a separate cells.agg
    tot = F.broadcast(
        ra.agg(
            F.sum("r").alias("n"), F.count(F.lit(1)).alias("ka")
        ).crossJoin(F.broadcast(cb.agg(F.count(F.lit(1)).alias("kb"))))
    )
    grid = (
        ra.crossJoin(F.broadcast(cb))
        .join(cells, ["a", "b"], "left")
        .select("a", "b", "r", "c", F.coalesce("o", F.lit(0)).alias("o"))
        .crossJoin(tot)
    )
    d = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    denom = (F.col("n") * F.col("r")).cast("double") * F.col("c")
    term_e6 = F.round(d * d / denom * 1000000.0 + 1e-9, 0).cast("long")
    s = grid.select(
        term_e6.alias("t"), "n", "ka", "kb"
    ).groupBy("n", "ka", "kb").agg(F.sum("t").alias("chi2_e6"))
    chi2 = F.col("chi2_e6").cast("double") / 1000000.0
    mindim = F.least(F.col("ka"), F.col("kb")) - 1
    return s.select(
        F.lit(pair).alias("pair"),
        F.col("n").alias("n_rows"),
        ((F.col("ka") - 1) * (F.col("kb") - 1)).alias("dof"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(chi2 / (F.col("n").cast("double") * mindim)), 6
        ).alias("cramers_v"),
    )


def psi_drift_report(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    ts_col: str = "ts",
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index — THE production ML-monitoring drift
    metric (credit-scoring lineage; complements source_drift_report's
    total-variation distance with the likelihood-weighted one): split
    each group's rows at the midpoint of the table's time range,
    decile-bucket the LATE half against cut points fitted on the EARLY
    (reference) half, and report
    PSI = Σ_bins (q_i − p_i)·ln(q_i / p_i) with the classic
    stable (< 0.1) / moderate / major (> 0.25) reading.

    Determinism: bucket shares are add-half smoothed exact integer
    ratios — (2c+1)/(2n+2·bins) — so empty bins are finite and every
    ln argument is an INTEGER evaluated through the portable libm-free
    ln; each bin's term rounds ONCE to a 1e-6 BIGINT and PSI is the
    associative integer sum (the chi-square/MI convention). Cut points
    are round(percentile, 6) doubles (the gini convention — DuckDB's
    quantile_cont interpolates identically); the time split is integer
    microsecond arithmetic.

    Scale shape: one pass to per-(group, half, bucket) counts against
    broadcast per-group cut points; everything after runs on the
    groups×bins grid. Groups with NO reference rows are absent (no
    fitted cuts — flag those with a presence join upstream)."""
    from firebase_etl_spark.functions.portable_math import (
        fixed_e6_expr,
        with_ln,
    )

    base = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    span = F.broadcast(
        base.agg(F.min("us").alias("mn"), F.max("us").alias("mx"))
    )
    # midpoint truncation note (ADVICE r10): Spark DIV truncates
    # toward zero, the oracle's // floors — identical ONLY while
    # mn + mx >= 0, i.e. timestamps at/after the 1970 epoch (every
    # fixture; pre-1970 feeds must sign-split this midpoint)
    halves = base.crossJoin(span).select(
        "g", "v", F.expr("us <= (mn + mx) DIV 2").alias("is_ref")
    )
    # ONE (group, value, half) histogram pass feeds BOTH the reference
    # percentile fit and the bucket counts (r11): the raw form shuffled
    # every early-half ROW into the exact-percentile aggregate and then
    # re-scanned the corpus to bucket-count — but ``percentile`` takes a
    # frequency argument (its buffer is a value->count map either way,
    # so (v, c) pairs yield the bit-identical interpolation), and the
    # bucket counts are plain sums of c. The value codomain is bounded
    # (quantized fixture values; at 100 TB the histogram saturates at
    # groups x codomain x 2 cells while rows keep growing), so every
    # post-histogram step is cell-sized.
    hh = (
        halves.groupBy("g", "v", "is_ref")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # codomain-sized; 2 consumers
    )
    pcts = [round((i + 1) / n_bins, 2) for i in range(n_bins - 1)]
    cuts = (
        hh.filter("is_ref")
        .groupBy("g")
        .agg(
            F.expr(
                "transform(percentile(v, array("
                + ",".join(str(p) for p in pcts)
                + "), c), x -> round(x, 6))"
            ).alias("cuts")
        )
    )
    binned = (
        hh.join(F.broadcast(cuts), "g")
        .select(
            "g",
            "is_ref",
            "c",
            (F.lit(1) + F.expr("size(filter(cuts, x -> x < v))"))
            .cast("int")
            .alias("bkt"),
        )
        .groupBy("g", "bkt")
        .agg(
            F.sum(F.when(F.col("is_ref"), F.col("c")).otherwise(0))
            .cast("long").alias("cp"),
            F.sum(F.when(~F.col("is_ref"), F.col("c")).otherwise(0))
            .cast("long").alias("cq"),
        )
        .localCheckpoint(eager=True)  # groups x bins, 2 consumers
    )
    spine = cuts.select(
        "g", F.explode(F.sequence(F.lit(1), F.lit(n_bins))).alias("bkt")
    )
    tot = binned.groupBy("g").agg(
        F.sum("cp").alias("np"), F.sum("cq").alias("nq")
    )
    grid = (
        spine.join(binned, ["g", "bkt"], "left")
        .select(
            "g",
            "bkt",
            F.coalesce("cp", F.lit(0)).alias("cp"),
            F.coalesce("cq", F.lit(0)).alias("cq"),
        )
        .join(F.broadcast(tot), "g")
    )
    grid = with_ln(grid, "(2 * cq + 1)", "__lncq")
    grid = with_ln(grid, f"(2 * nq + {2 * n_bins})", "__lnnq")
    grid = with_ln(grid, "(2 * cp + 1)", "__lncp")
    grid = with_ln(grid, f"(2 * np + {2 * n_bins})", "__lnnp")
    term = (
        f"(CAST(2 * cq + 1 AS DOUBLE) / CAST(2 * nq + {2 * n_bins} AS DOUBLE)"
        f" - CAST(2 * cp + 1 AS DOUBLE) / CAST(2 * np + {2 * n_bins} AS DOUBLE))"
        " * ((__lncq - __lnnq) - (__lncp - __lnnp))"
    )
    per_bin = grid.select(
        "g", "np", "nq", F.expr(fixed_e6_expr(term)).alias("t_e6")
    )
    return (
        per_bin.groupBy("g")
        .agg(
            F.max("np").alias("n_ref"),
            F.max("nq").alias("n_cur"),
            F.sum("t_e6").alias("psi_e6"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_ref",
            "n_cur",
            "psi_e6",
            F.expr(
                "CASE WHEN psi_e6 >= 250000 THEN 'major'"
                " WHEN psi_e6 >= 100000 THEN 'moderate'"
                " ELSE 'stable' END"
            ).alias("drift_level"),
        )
        .orderBy(group_col)
    )


def shapley_attribution(
    df: DataFrame,
    channels: list[str],
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """EXACT Shapley-value conversion attribution (the coalition-game
    credit split of Shapley 1953, applied to marketing journeys e.g.
    Zhao et al. 2018, arXiv:1804.05327) — the principled complement to
    the last-touch heuristic already in the suite: each channel's
    credit is its average marginal contribution across every coalition
    ordering.

    Formulation: a user converts at their FIRST ``conversion_type``
    event; their journey is the SET of listed channels touched strictly
    before it (empty-journey conversions carry no channel evidence and
    are excluded — reported via n_attributable vs the caller's own
    totals). The characteristic function v(S) = conversions whose
    journey ⊆ S. With n = len(channels) the subset lattice has 2^n
    rows — channels are a handful, so after ONE corpus pass to
    journey-set counts the whole game solves relationally on <= 2^n
    rows: subsets are INTEGER BITMASKS (membership = (s div 2^j) % 2,
    containment = (m | s) = s), Shapley weights ride the common
    denominator n! as exact integer literals, and
    phi_i · n! = Σ_{S∌i} w(|S|) · (v(S∪{i}) − v(S)) is a pure integer
    sum — cross-engine exact, no float anywhere.

    Output per channel: phi_fact (the integer phi·n!), phi_e6 (phi in
    1e-6 conversions via integer division), and v_full =
    v(all channels) = total attributable conversions (Σ phi = v_full
    exactly — the efficiency axiom doubles as a checksum)."""
    import math as _m

    n = len(channels)
    base = df.filter(
        F.col(user_col).isNotNull() & F.col(type_col).isNotNull()
    )
    conv = (
        base.filter(F.col(type_col) == conversion_type)
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(F.col(ts_col)).alias("conv_ts"))
    )
    touched = (
        base.filter(F.col(type_col).isin(channels))
        .select(
            F.col(user_col).alias("u"),
            F.col(type_col).alias("ch"),
            F.col(ts_col).alias("ts"),
        )
        .join(conv, "u")
        .filter(F.col("ts") < F.col("conv_ts"))
    )
    # journey bitmask per converted user: bit j = touched channels[j]
    mask_expr = " + ".join(
        f"(CASE WHEN max(CASE WHEN ch = '{c}' THEN 1 ELSE 0 END) = 1"
        f" THEN {1 << j} ELSE 0 END)"
        for j, c in enumerate(channels)
    )
    journeys = (
        touched.groupBy("u")
        .agg(F.expr(mask_expr).alias("m"))
        .filter(F.col("m") > 0)
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("n_conv"))
        .localCheckpoint(eager=True)  # <= 2^n - 1 rows
    )
    spark = df.sparkSession
    subsets = spark.range(1 << n).select(F.col("id").cast("int").alias("s"))
    v = (
        subsets.join(
            F.broadcast(journeys), F.expr("(m | s) = s"), "left"
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).alias("v"))
        .localCheckpoint(eager=True)  # 2^n rows
    )
    w_case = " ".join(
        f"WHEN bit_count(s) = {p}"
        f" THEN {_m.factorial(p) * _m.factorial(n - 1 - p)}"
        for p in range(n)
    )
    rows = []
    for j, c in enumerate(channels):
        bit = 1 << j
        wo = v.filter(f"(s DIV {bit}) % 2 = 0").select(
            F.col("s"), F.col("v").alias("v0")
        )
        wi = v.select((F.col("s") - bit).alias("s"), F.col("v").alias("v1"))
        phi = (
            wo.join(wi, "s")
            .select(
                F.expr(f"(CASE {w_case} END) * (v1 - v0)").alias("t")
            )
            .agg(F.coalesce(F.sum("t"), F.lit(0)).alias("phi_fact"))
            .select(F.lit(c).alias("channel"), "phi_fact")
        )
        rows.append(phi)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    v_full = F.broadcast(
        v.filter(F.col("s") == (1 << n) - 1).select(
            F.col("v").alias("v_full")
        )
    )
    fact = _m.factorial(n)
    return (
        out.crossJoin(v_full)
        .select(
            "channel",
            "phi_fact",
            F.expr(f"(phi_fact * 1000000) DIV {fact}").alias("phi_e6"),
            "v_full",
        )
        .orderBy("channel")
    )


def markov_attribution(
    df: DataFrame,
    channels: list[str],
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    iters: int = 40,
) -> DataFrame:
    """First-order MARKOV removal-effect attribution (Anderl et al.
    2014) — the third classic next to last-touch and Shapley: model
    journeys as a start → channels → {conv, null} chain, and credit
    each channel by how much the conversion probability DROPS when
    that channel absorbs to null (removal effect), normalized into
    shares.

    Journey convention mirrors shapley_attribution: a user converts at
    their FIRST ``conversion_type`` event; channel touches strictly
    before it (ordered by (ts, id_col) — the id tiebreak makes
    same-timestamp journeys deterministic); non-converters contribute
    their full channel sequence ending in null; converters with zero
    touches contribute start → conv.

    Determinism + scale shape: the CORPUS work is one per-user ordered
    window (lag) + one (from, to) count aggregate — linear, keyed by
    user. The chain itself is (channels + 1)² counts, so the
    absorption solve is DRIVER-LOCAL (the graph-op cutover convention;
    pulling ~36 integers, not data): ``iters`` fixed-point Jacobi
    sweeps v_i ← p_conv_i + (Σ_j p_ij · v_j) // 1e9 over e9-unit
    integer probabilities p_ij = (c_ij · 1e9) // r_i — every op is
    integer multiply/floor-divide on non-negative values, so the
    unrolled-CTE DuckDB twin reproduces it bit-for-bit. Overflow
    contract: exact while per-state out-transitions < ~9.2e9 (the
    p·SCALE premultiply) and len(channels) <= 8 (the Σ p·v sum) —
    beyond that, downscale the counts by a common factor first.

    Output per channel: (channel, n_from, p_conv_full_e9,
    p_conv_removed_e9, removal_effect_e6, attribution_e6) — integers
    only; removal_effect = 1 − p_removed/p_full in 1e-6 units."""
    SCALE = 1_000_000_000
    base = df.filter(
        F.col(user_col).isNotNull() & F.col(type_col).isNotNull()
    )
    conv = (
        base.filter(F.col(type_col) == conversion_type)
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(F.col(ts_col)).alias("conv_ts"))
    )
    ev = (
        base.filter(F.col(type_col).isin(channels))
        .select(
            F.col(user_col).alias("u"),
            F.col(type_col).alias("ch"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("eid"),
        )
        .join(conv, "u", "left")
        .filter(
            F.col("conv_ts").isNull() | (F.col("ts") < F.col("conv_ts"))
        )
    )
    w = Window.partitionBy("u").orderBy("ts", "eid")
    seq = ev.withColumn("prev", F.lag("ch", 1, "start").over(w))
    pairs = seq.select(F.col("prev").alias("f"), F.col("ch").alias("t"))
    wd = Window.partitionBy("u").orderBy(F.desc("ts"), F.desc("eid"))
    term = (
        seq.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select(
            F.col("ch").alias("f"),
            F.when(F.col("conv_ts").isNotNull(), F.lit("conv"))
            .otherwise(F.lit("null"))
            .alias("t"),
        )
    )
    untouched = (
        conv.join(ev.select("u").distinct(), "u", "left_anti")
        .select(F.lit("start").alias("f"), F.lit("conv").alias("t"))
    )
    trans = (
        pairs.unionByName(term)
        .unionByName(untouched)
        .groupBy("f", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # ---- driver-local absorption solve over the tiny chain ----
    rows = [(r["f"], r["t"], int(r["cnt"])) for r in trans.collect()]
    rtot: dict[str, int] = {}
    for f, _, c in rows:
        rtot[f] = rtot.get(f, 0) + c
    # e9 transition probabilities, floor-divided exactly like the oracle
    p = {(f, t): (c * SCALE) // rtot[f] for f, t, c in rows}
    transient = ["start"] + list(channels)

    def solve(removed: str | None) -> dict[str, int]:
        v = {s: 0 for s in transient if s != removed}
        for _ in range(iters):
            nv = {}
            for i in v:
                acc = sum(p.get((i, j), 0) * v[j] for j in v)
                nv[i] = p.get((i, "conv"), 0) + acc // SCALE
            v = nv
        return v

    full = solve(None)
    p_full = full.get("start", 0)
    out_rows = []
    effects = {}
    for c in channels:
        p_rm = solve(c).get("start", 0)
        diff = p_full - p_rm if p_full > p_rm else 0
        effects[c] = (diff * 1_000_000) // p_full if p_full > 0 else 0
        out_rows.append((c, rtot.get(c, 0), p_full, p_rm))
    tot_eff = sum(effects.values())
    final = [
        (
            c,
            nf,
            pf,
            prm,
            effects[c],
            (effects[c] * 1_000_000) // tot_eff if tot_eff > 0 else 0,
        )
        for (c, nf, pf, prm) in out_rows
    ]
    spark = df.sparkSession
    return spark.createDataFrame(
        sorted(final),
        "channel string, n_from long, p_conv_full_e9 long,"
        " p_conv_removed_e9 long, removal_effect_e6 long,"
        " attribution_e6 long",
    ).orderBy("channel")


def binary_auc_report(
    df: DataFrame,
    score,
    label,
) -> DataFrame:
    """Exact tie-aware ROC AUC (Mann-Whitney U) of an INTEGER score
    against a binary label — the standard read-out for any cheap
    classifier a pipeline gates on (quality filters, langid, dedup
    confidence) before trusting it corpus-wide. AUC = P(score_pos >
    score_neg) + P(=)/2, computed exactly from rank sums with tied
    blocks at their average rank.

    All-integer: scores group into a distinct-score histogram
    (bounded by the score's codomain, NOT the corpus — a permyriad
    score has <= 10001 rows), twice-average-rank of a tied block is
    the integer 2*cum_before + n + 1, twice the U statistic is
    u2 = sum(n_pos_g * r2) - n_pos*(n_pos+1), and
    auc_e6 = u2*1e6 DIV (2*n_pos*n_neg) (u2 >= 0 always, so
    truncating DIV == flooring //). Exact while n_pos*n_neg <=
    ~4.6e12 (u2*1e6 must fit int64); past ~3e6 balanced rows report
    u2 raw and divide at higher precision downstream — the histogram
    side stays fixed-size at any corpus scale.

    Scale shape: one scan -> groupBy(score) map-side-combinable
    histogram; strictly-smaller prefix counts over the bounded
    histogram via the two-phase with_prefix_sum (linear in distinct
    scores — replaced the O(codomain^2) broadcast-BNLJ theta self-join
    per VERDICT r9 #2; exact integers, so bit-identical). Returns one
    row: (n_pos, n_neg, n_scored, u2, auc_e6); auc_e6 is NULL when a
    class is empty (AUC undefined)."""
    base = df.select(
        score.cast("long").alias("s"),
        label.cast("int").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    g = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("npos"),
    )
    g2 = (
        with_prefix_sum(g, [F.col("s")], "n", out="cum_incl")
        .select(
            "s", "n", "npos",
            (F.col("cum_incl") - F.col("n")).cast("long")
            .alias("cum_before"),
        )
    )
    return g2.agg(
        F.sum("npos").cast("long").alias("n_pos"),
        (F.sum("n") - F.sum("npos")).cast("long").alias("n_neg"),
        F.sum("n").cast("long").alias("n_scored"),
        F.sum(
            F.col("npos")
            * (F.lit(2) * F.col("cum_before") + F.col("n") + F.lit(1))
        ).cast("long").alias("s2"),
    ).select(
        "n_pos",
        "n_neg",
        "n_scored",
        F.expr("s2 - n_pos * (n_pos + 1)").cast("long").alias("u2"),
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(NULL AS BIGINT)"
            " ELSE ((s2 - n_pos * (n_pos + 1)) * 1000000)"
            " DIV (2 * n_pos * n_neg) END"
        ).cast("long").alias("auc_e6"),
    )


def cuped_report(
    df: DataFrame,
    arm_col: str = "arm",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """CUPED variance-reduced A/B read-out (Deng, Xu, Kohavi & Walker,
    WSDM 2013): adjust the experiment outcome Y by the pre-period
    covariate X — theta = cov(X,Y)/var(X) pooled, Y_adj = Y - theta*
    (X - mean X) — shrinking the arm-difference variance by the
    squared correlation rho^2. The standard trick that makes a two-
    week experiment readable in days when users' pre-period activity
    predicts their outcome.

    Input: one row per unit with an integer covariate ``x_col``,
    integer outcome ``y_col`` and 0/1 ``arm_col``. ALL moments are
    exact int64 sums (n, Sx, Sy, Sxx, Sxy, Syy, per-arm n/Sx/Sy —
    exact while n*Sxy < 2^63, ~1e7 balanced units at count-valued
    metrics; past that pre-aggregate per stratum); the published
    ratios quantize each rational ONCE through the shared sign-split
    e6 division, and every downstream combination is integer ops both
    engines replay bit-identically.

    Scale shape: one map-side-combinable aggregate over units (the
    per-unit table is itself one groupBy upstream), then single-row
    arithmetic. Returns one row: (n_ctrl, n_treat, mean_y_ctrl_e6,
    mean_y_treat_e6, delta_raw_e6, theta_e6, delta_cuped_e6, rho2_e6);
    theta/rho2/delta_cuped are NULL when var(X) = 0 (no covariate
    information), rho2 additionally when var(Y) = 0."""
    from firebase_etl_spark.functions.portable_math import sdiv_scaled_sql

    a = F.col(arm_col).cast("long")
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(x * y).cast("long").alias("sxy"),
        F.sum(y * y).cast("long").alias("syy"),
        F.sum(F.when(a == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(a == 0, x).otherwise(0)).cast("long").alias("sx0"),
        F.sum(F.when(a == 0, y).otherwise(0)).cast("long").alias("sy0"),
        F.sum(F.when(a == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(a == 1, x).otherwise(0)).cast("long").alias("sx1"),
        F.sum(F.when(a == 1, y).otherwise(0)).cast("long").alias("sy1"),
    )
    nn = "CAST(n AS BIGINT) * sxy - sx * sy"
    dd = "CAST(n AS BIGINT) * sxx - sx * sx"
    dy = "CAST(n AS BIGINT) * syy - sy * sy"
    d = agg.select(
        "*",
        F.expr(sdiv_scaled_sql("sy0", "n0", 1_000_000, "DIV"))
        .cast("long").alias("mean_y_ctrl_e6"),
        F.expr(sdiv_scaled_sql("sy1", "n1", 1_000_000, "DIV"))
        .cast("long").alias("mean_y_treat_e6"),
        F.expr(
            sdiv_scaled_sql("sy1 * n0 - sy0 * n1", "n1 * n0",
                            1_000_000, "DIV")
        ).cast("long").alias("delta_raw_e6"),
        F.expr(
            sdiv_scaled_sql("sx1 * n0 - sx0 * n1", "n1 * n0",
                            1_000_000, "DIV")
        ).cast("long").alias("delta_x_e6"),
        F.expr(
            f"CASE WHEN ({dd}) = 0 THEN CAST(NULL AS BIGINT) ELSE "
            + sdiv_scaled_sql(nn, dd, 1_000_000, "DIV")
            + " END"
        ).cast("long").alias("theta_e6"),
    )
    return d.select(
        F.col("n0").alias("n_ctrl"),
        F.col("n1").alias("n_treat"),
        "mean_y_ctrl_e6",
        "mean_y_treat_e6",
        "delta_raw_e6",
        "theta_e6",
        F.expr(
            "CASE WHEN theta_e6 IS NULL THEN CAST(NULL AS BIGINT)"
            " ELSE delta_raw_e6 - ("
            + sdiv_scaled_sql("theta_e6 * delta_x_e6", "1000000",
                              1, "DIV")
            + ") END"
        ).cast("long").alias("delta_cuped_e6"),
        F.expr(
            f"CASE WHEN ({dd}) = 0 OR ({dy}) = 0"
            " THEN CAST(NULL AS BIGINT) ELSE "
            + sdiv_scaled_sql(
                f"({sdiv_scaled_sql(nn, dd, 1000, 'DIV')})"
                f" * ({sdiv_scaled_sql(nn, dy, 1000, 'DIV')})",
                "1000000", 1_000_000, "DIV",
            )
            + " END"
        ).cast("long").alias("rho2_e6"),
    )


def classification_agreement_report(
    df: DataFrame,
    truth_col: str,
    pred_col: str,
) -> DataFrame:
    """Classifier-agreement metrics from a (truth, prediction) pair:
    per-class precision/recall/F1 plus the global accuracy, MACRO-F1
    and Cohen's kappa — the chance-corrected agreement that exposes a
    majority-class predictor the raw accuracy hides. The metric layer
    a labeling pipeline publishes next to its confusion matrix
    (doc_langid_confusion shows the cells; this scores them).

    All-integer: counts from ONE corpus groupBy(truth, pred); every
    published ratio quantizes once through the shared sign-split e6
    division. kappa = (n*sum_tp - sum_rt_ct) / (n^2 - sum_rt_ct) in
    exact int64 (n <= ~3e9 rows; past that pre-scale the confusion
    counts). Per-class ratios are NULL when their denominator is 0
    (class never seen on that side).

    Scale shape: the corpus collapses to the confusion table first
    (map-side combinable); everything after runs on class-count-sized
    rows. Returns one row per class (union of observed truth/pred
    labels), globals repeated on every row so the driver hash pins
    them: (label, n_true, n_pred, tp, precision_e6, recall_e6, f1_e6,
    accuracy_e6, macro_f1_e6, kappa_e6)."""
    from firebase_etl_spark.functions.portable_math import sdiv_scaled_sql

    conf = (
        df.select(
            F.col(truth_col).cast("string").alias("t"),
            F.col(pred_col).cast("string").alias("p"),
        )
        .filter(F.col("t").isNotNull() & F.col("p").isNotNull())
        .groupBy("t", "p")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # class-pair-sized; every marginal below re-references it, and
        # without an eager cut each one re-runs the corpus pass
        # (PLAN_AUDIT measured documents x9 before this)
        .localCheckpoint(eager=True)
    )
    rt = conf.groupBy(F.col("t").alias("label")).agg(
        F.sum("c").cast("long").alias("n_true")
    )
    ct = conf.groupBy(F.col("p").alias("label")).agg(
        F.sum("c").cast("long").alias("n_pred")
    )
    tp = conf.filter(F.col("t") == F.col("p")).select(
        F.col("t").alias("label"), F.col("c").alias("tp")
    )
    cls = (
        rt.join(ct, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    glob = cls.agg(
        F.sum("n_true").cast("long").alias("n"),
        F.sum("tp").cast("long").alias("sum_tp"),
        F.sum(F.col("n_true") * F.col("n_pred")).cast("long").alias(
            "sum_rt_ct"
        ),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
    )
    per = cls.select(
        "*",
        F.expr(
            "CASE WHEN n_pred = 0 THEN CAST(NULL AS BIGINT) ELSE "
            + sdiv_scaled_sql("tp", "n_pred", 1_000_000, "DIV")
            + " END"
        ).cast("long").alias("precision_e6"),
        F.expr(
            "CASE WHEN n_true = 0 THEN CAST(NULL AS BIGINT) ELSE "
            + sdiv_scaled_sql("tp", "n_true", 1_000_000, "DIV")
            + " END"
        ).cast("long").alias("recall_e6"),
        F.expr(
            "CASE WHEN n_true + n_pred = 0 THEN CAST(NULL AS BIGINT)"
            " ELSE "
            + sdiv_scaled_sql("2 * tp", "n_true + n_pred",
                              1_000_000, "DIV")
            + " END"
        ).cast("long").alias("f1_e6"),
    )
    gl2 = per.agg(
        F.sum("f1_e6").cast("long").alias("sum_f1"),
        # macro-F1 averages over classes whose F1 is DEFINED
        F.count("f1_e6").cast("long").alias("n_f1"),
    ).crossJoin(F.broadcast(glob)).select(
        F.expr(sdiv_scaled_sql("sum_tp", "n", 1_000_000, "DIV"))
        .cast("long").alias("accuracy_e6"),
        F.expr("sum_f1 DIV n_f1").cast("long").alias("macro_f1_e6"),
        F.expr(
            "CASE WHEN n * n - sum_rt_ct = 0 THEN CAST(NULL AS BIGINT)"
            " ELSE "
            + sdiv_scaled_sql("n * sum_tp - sum_rt_ct",
                              "n * n - sum_rt_ct", 1_000_000, "DIV")
            + " END"
        ).cast("long").alias("kappa_e6"),
    )
    return (
        per.crossJoin(F.broadcast(gl2))
        .select(
            "label", "n_true", "n_pred", "tp", "precision_e6",
            "recall_e6", "f1_e6", "accuracy_e6", "macro_f1_e6",
            "kappa_e6",
        )
        .orderBy("label")
    )


def dataset_fingerprint(
    df: DataFrame,
    columns: list[str],
) -> DataFrame:
    """Content-addressed dataset fingerprint — the reproducibility /
    cache-invalidation primitive of a snapshot pipeline: one 60-bit
    content hash per ROW (md5 over the sentineled, unit-separator-
    joined column serialization), combined ORDER-INDEPENDENTLY by XOR
    so the fingerprint is invariant to partitioning, shuffle order and
    retry — any one changed/added/dropped row flips it. Per-column XOR
    hashes and null counts localize WHICH column drifted (the
    column-level merkle leaves); documents_snapshot_diff says which
    rows — this says, in O(1) storage, whether and where to look.

    Portable by construction: the md5-prefix integer is the house
    conv(substr(md5, 1, 15)) idiom; the serialization casts every
    column to string, replaces NULL with an explicit sentinel and
    joins on the ASCII unit separator (concat_ws SKIPS nulls — two
    adjacent nullable columns would alias without both); XOR is
    associative/commutative, so engine, plan and order never matter.

    Scale shape: one scan, one map-side-combinable xor/count
    aggregate; output is column-count-sized. Returns one row per
    column: (col_name, n_nulls, col_xor) with (n_rows, dataset_xor)
    repeated."""
    sent = "\x00NULL\x00"
    usep = "\x1f"

    def s(c):
        return F.coalesce(F.col(c).cast("string"), F.lit(sent))

    def h(col):
        return F.conv(
            F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10
        ).cast("long")

    row_h = h(F.concat_ws(usep, *[s(c) for c in columns]))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("bit_xor(__row_h)").alias("dataset_xor"),
    ]
    for c in columns:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"__nn_{c}")
        )
        aggs.append(F.expr(f"bit_xor(__ch_{c})").alias(f"__cx_{c}"))
    proj = df.select(
        *[F.col(c) for c in columns],
        row_h.alias("__row_h"),
        *[h(s(c)).alias(f"__ch_{c}") for c in columns],
    )
    wide = proj.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __nn_{c}, __cx_{c}" for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack})"
            " AS (col_name, n_nulls, col_xor)"
        ),
        "n_rows",
        "dataset_xor",
    ).orderBy("col_name")


#: cumulative Poisson(1) CDF thresholds scaled to 2^52 — computed ONCE
#: here at import and baked into BOTH engines' SQL as integer literals
#: (zero runtime float math; the md5 hash is uniform in [0, 2^52)).
#: A replicate's weight for a row = #thresholds <= hash, i.e. the
#: inverse-CDF Poisson(1) draw; capped at 9 where the tail mass is
#: ~1.1e-7 of 2^52.
_POISSON1_THRESH_E52: list[int] = []
_acc = 0.0
for _k in range(9):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POISSON1_THRESH_E52.append(min(int(_acc * (1 << 52)), 1 << 52))
del _acc, _k


def boot_mix_constants(reps: int) -> list[tuple[int, int, int]]:
    """Per-replicate multiply-shift mixer constants (a1, a2, c) —
    derived at call time from md5 of the replicate id alone (pure
    import-style computation, no runtime randomness), baked into BOTH
    engines' SQL as integer literals. Replicate ``b``'s uniform draw
    for a row is ``(h1*a1 + h2*a2 + c) mod 2^52`` where (h1, h2) are
    the two 26-bit halves of ONE md5 draw per row — the
    Dietzfelbinger-style universal-hash scrambling that lets the
    bootstrap hash each row once instead of once per replicate (the
    64-md5-per-row plan was ~2/3 of the query's wall time)."""
    import hashlib

    out = []
    for b in range(reps):
        d = hashlib.md5(f"bootmix|{b}".encode()).hexdigest()
        a1 = (int(d[0:7], 16) % (1 << 26)) | 1
        a2 = (int(d[7:14], 16) % (1 << 26)) | 1
        c = int(d[14:27], 16) % (1 << 52)
        out.append((a1, a2, c))
    return out


def boot_weight_sql(a1: int, a2: int, c: int) -> str:
    """The Poisson(1) inverse-CDF weight of one replicate as a SQL
    expression over columns ``h1``/``h2`` — textually identical on
    Spark and DuckDB (integer multiply-add, %, nested CASE). The
    replicate id is already baked into (a1, a2, c) by
    boot_mix_constants, so it is not a parameter here.

    The weight (#thresholds <= u, 0..9) is emitted as a BINARY
    decision tree over the sorted thresholds — ~4 comparisons per row
    instead of the old 9-compare-and-add chain (r11: measured
    4.26s -> 3.77s on the 64-replicate aggregate at sf0.1, sums
    bit-identical by construction — same count, different lookup)."""
    u = f"((h1 * {a1} + h2 * {a2} + {c}) % {1 << 52})"
    thr = _POISSON1_THRESH_E52

    def node(lo: int, hi: int) -> str:
        # decide the weight among lo..hi given thresholds lo..hi-1
        if lo >= hi:
            return str(lo)
        mid = (lo + hi) // 2
        return (
            f"(CASE WHEN {u} >= {thr[mid]}"
            f" THEN {node(mid + 1, hi)} ELSE {node(lo, mid)} END)"
        )

    return node(0, len(thr))


def poisson_bootstrap_ci(
    df: DataFrame,
    value_cents: str,
    key_col: str,
    reps: int = 64,
) -> DataFrame:
    """Poisson-bootstrap 95% CI for a mean — THE distributed bootstrap
    (each row draws an independent Poisson(1) multiplicity per
    replicate, so no replicate ever needs a global resample; Chamandy
    et al. 2012, "Estimating Uncertainty for Massive Data Streams",
    describe exactly this shape at Google scale). ONE corpus pass: the
    row hashes once, every replicate's weighted sum/count is its own
    pair of map-side-combinable aggregate columns (no 64× row
    fan-out — the exploded form spent ~2/3 of its wall on 64 md5+conv
    per row), and the resulting single wide row unpivots to the
    reps-sized replicate table.

    DETERMINISM: each row draws ONE md5 uniform in [0, 2^52) from its
    key, split into 26-bit halves (h1, h2); replicate ``b`` scrambles
    them through the baked multiply-mod mixer (boot_mix_constants) and
    reads the inverse-CDF Poisson(1) weight against the module-level
    integer thresholds (_POISSON1_THRESH_E52) — identical literals in
    the oracle. Replicate means are truncating integer cent divisions;
    the CI is the 2nd / 63rd order statistic of the (default) 64
    replicate means (the nearest-rank 2.5% / 97.5% percentile for
    B=64), ties broken by replicate id.

    Returns ONE row: (n_rows, point_mean_cents, n_replicates,
    ci_lo_cents, ci_hi_cents, ci_width_cents, boot_min_cents,
    boot_max_cents)."""
    base = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.expr(value_cents).alias("v"),
    ).filter(F.col("v").isNotNull())
    hh = base.select(
        "v",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("boot|"), F.col("k"))), 1, 13),
            16,
            10,
        ).cast("long").alias("u0"),
    ).select(
        "v",
        F.expr(f"u0 DIV {1 << 26}").alias("h1"),
        F.expr(f"u0 % {1 << 26}").alias("h2"),
    )
    # NOTE (r11): pre-projecting the 64 weight columns and aggregating
    # over the attributes was tried and measured 26% SLOWER in-session
    # A/B (6.35s -> 8.01s at sf0.1): whole-stage codegen already
    # subexpression-eliminates the duplicated CASE chains inside the
    # aggregate, and the explicit projection only added a 64-column row
    # materialization. Keeping the inlined form deliberately.
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("v").cast("long").alias("tot"),
    ]
    for b, (a1, a2, c) in enumerate(boot_mix_constants(reps)):
        w = boot_weight_sql(a1, a2, c)
        aggs.append(
            F.sum(F.expr(f"CAST({w} AS BIGINT) * v")).alias(f"s_{b}")
        )
        aggs.append(F.sum(F.expr(w)).cast("long").alias(f"n_{b}"))
    wide = hh.agg(*aggs).localCheckpoint(eager=True)  # ONE row
    stack = ", ".join(
        f"{b}, s_{b}, n_{b}" for b in range(reps)
    )
    means = wide.select(
        F.expr(f"stack({reps}, {stack}) AS (b, s, n)")
    ).select(
        "b",
        F.when(F.col("n") > 0, F.expr("s DIV n"))
        .otherwise(F.lit(0))
        .alias("m"),
    )
    lo_rank = max(1, (25 * reps) // 1000 + 1)
    hi_rank = min(reps, (975 * reps) // 1000 + 1)
    means = means.localCheckpoint(eager=True)  # reps rows; self-joined
    ranked = (
        means.alias("a")
        .join(
            F.broadcast(means.alias("p")),
            (F.col("p.m") < F.col("a.m"))
            | ((F.col("p.m") == F.col("a.m"))
               & (F.col("p.b") <= F.col("a.b"))),
        )
        .groupBy(F.col("a.m").alias("m"), F.col("a.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("r"))
    )
    ci = ranked.agg(
        F.max(F.when(F.col("r") == lo_rank, F.col("m"))).alias("lo"),
        F.max(F.when(F.col("r") == hi_rank, F.col("m"))).alias("hi"),
        F.min("m").alias("bmin"),
        F.max("m").alias("bmax"),
    )
    point = wide.select(
        "n_rows",
        F.when(F.col("n_rows") > 0, F.expr("tot DIV n_rows"))
        .otherwise(F.lit(0))
        .alias("point_mean_cents"),
    )
    return point.crossJoin(ci).select(
        "n_rows",
        "point_mean_cents",
        F.lit(reps).cast("long").alias("n_replicates"),
        F.col("lo").alias("ci_lo_cents"),
        F.col("hi").alias("ci_hi_cents"),
        (F.col("hi") - F.col("lo")).alias("ci_width_cents"),
        F.col("bmin").alias("boot_min_cents"),
        F.col("bmax").alias("boot_max_cents"),
    )


#: two-sided BH step-up critical values Phi^-1(1 - 0.025 * i / 5) for
#: m = 5 simultaneous tests at FDR alpha = 0.05, e6 fixed point —
#: standard-normal quantiles as shared integer literals (the
#: doc_retrieval_eval hardcoded-log2 convention: no runtime inverse
#: CDF on either engine). Index = BH rank i (1 = largest |z|).
BH_CRIT_E6_M5: tuple[int, ...] = (
    2575829,  # Phi^-1(0.995)  = 2.5758293035489004
    2326348,  # Phi^-1(0.990)  = 2.3263478740408408
    2170090,  # Phi^-1(0.985)  = 2.1700903775845606
    2053749,  # Phi^-1(0.980)  = 2.0537489106318225
    1959964,  # Phi^-1(0.975)  = 1.9599639845400545
)


def welch_z_sql() -> str:
    """Welch two-sample z statistic as ONE shared SQL expression string
    over exact integer moment columns (na, sa, ssa, nb, sb, ssb) —
    evaluated verbatim by Spark and DuckDB so every double op is the
    identical correctly-rounded IEEE tree (the changepoint big-branch
    convention). NULL when either arm has < 2 rows or both variances
    are zero."""
    ma = "(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))"
    mb = "(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))"
    va = (
        f"((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * {ma})"
        " / CAST(na - 1 AS DOUBLE))"
    )
    vb = (
        f"((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * {mb})"
        " / CAST(nb - 1 AS DOUBLE))"
    )
    se2 = f"({va} / CAST(na AS DOUBLE) + {vb} / CAST(nb AS DOUBLE))"
    return (
        f"CASE WHEN na > 1 AND nb > 1 AND {se2} > 0.0"
        f" THEN ({ma} - {mb}) / sqrt({se2}) END"
    )


def ab_fdr_screen(
    df: DataFrame,
    group_col: str,
    arm_col: str,
    value_c_expr: str,
    crit_e6: tuple[int, ...] = BH_CRIT_E6_M5,
) -> DataFrame:
    """Benjamini-Hochberg FDR screen over per-group A/B mean
    differences — the multiple-comparisons gate a metrics platform
    runs when ONE experiment moves MANY metrics (m simultaneous Welch
    tests; controlling per-test alpha would fire ~alpha*m false alarms
    per experiment; BH 1995 bounds the FALSE DISCOVERY RATE instead).

    Exact integer moments per (group, arm) — one map-side-combinable
    aggregate, m-row everything after (sums of squared centi-units
    stay in int64 to ~2.9e9 rows at value <= 560). The z statistic is
    the shared welch_z_sql() double tree quantized ONCE at e6; BH is
    pure integer/rank logic: rank groups by |z| descending, compare
    against the hardcoded rank-indexed critical values, reject every
    rank up to the LARGEST rank that clears its threshold (step-up).

    Returns one row per group: (group, n_a, n_b, mean_a_e6, mean_b_e6,
    z_e6, bh_rank, crit_e6, rejected), ordered by bh_rank."""
    from firebase_etl_spark.functions.portable_math import (
        fixed_e6_expr,
        sdiv_scaled_sql,
    )

    arm = F.col(arm_col)
    v = F.expr(value_c_expr)
    m = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(
            F.sum(F.when(arm == 0, 1).otherwise(0)).cast("long")
            .alias("na"),
            F.coalesce(
                F.sum(F.when(arm == 0, v)), F.lit(0)
            ).cast("long").alias("sa"),
            F.coalesce(
                F.sum(F.when(arm == 0, v * v)), F.lit(0)
            ).cast("long").alias("ssa"),
            F.sum(F.when(arm == 1, 1).otherwise(0)).cast("long")
            .alias("nb"),
            F.coalesce(
                F.sum(F.when(arm == 1, v)), F.lit(0)
            ).cast("long").alias("sb"),
            F.coalesce(
                F.sum(F.when(arm == 1, v * v)), F.lit(0)
            ).cast("long").alias("ssb"),
        )
    )
    z = m.withColumn(
        "z_e6",
        F.expr(
            f"CASE WHEN ({welch_z_sql()}) IS NOT NULL"
            f" THEN {fixed_e6_expr(welch_z_sql())} END"
        ),
    )
    crit_case = " ".join(
        f"WHEN bh_rank = {i + 1} THEN CAST({c} AS BIGINT)"
        for i, c in enumerate(crit_e6)
    )
    z = z.localCheckpoint(eager=True)  # m metric rows; self-joined
    az = F.abs(F.coalesce(F.col("a.z_e6"), F.lit(0)))
    pz = F.abs(F.coalesce(F.col("p.z_e6"), F.lit(0)))
    rank_tbl = (
        z.alias("a")
        .join(
            F.broadcast(z.alias("p")),
            (pz > az)
            | ((pz == az) & (F.col("p.g") < F.col("a.g"))),
            "left",
        )
        .groupBy(F.col("a.g").alias("g"))
        .agg(
            (F.count(F.col("p.g")) + F.lit(1)).alias("bh_rank")
        )
    )
    ranked = (
        z.join(rank_tbl, "g")
        .withColumn("crit_e6", F.expr(f"CASE {crit_case} END"))
        .withColumn(
            "sig_raw",
            (F.col("z_e6").isNotNull())
            & (F.col("crit_e6").isNotNull())
            & (F.abs(F.col("z_e6")) >= F.col("crit_e6")),
        )
    )
    kmax = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("sig_raw"), F.col("bh_rank"))), F.lit(0)
        ).alias("k")
    )
    mean_a = sdiv_scaled_sql("sa * 10000", "na", 1, "DIV")
    mean_b = sdiv_scaled_sql("sb * 10000", "nb", 1, "DIV")
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select(
            F.col("g").alias("group_key"),
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.expr(f"CASE WHEN na > 0 THEN {mean_a} END")
            .alias("mean_a_e6"),
            F.expr(f"CASE WHEN nb > 0 THEN {mean_b} END")
            .alias("mean_b_e6"),
            "z_e6",
            "bh_rank",
            "crit_e6",
            (F.col("bh_rank") <= F.col("k")).alias("rejected"),
        )
        .orderBy("bh_rank")
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_c_expr: str,
    key_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Winsorized + trimmed means per group — the robust-aggregation
    pair every metrics pipeline needs once heavy tails appear (a
    single whale order moves the raw mean; clamping at exact
    percentile cuts bounds its influence, trimming removes it).

    Exact nearest-rank percentiles: rows rank by (value, key) inside
    each group via the two-phase grouped rank (with_grouped_rank —
    a Window.partitionBy(group) row_number would sort each group's
    ENTIRE slice on one task, capping parallelism at #groups at any
    data size; VERDICT r10 #2), the cut VALUES are read at ranks
    ceil(p*n/100) via one conditional aggregate, and every row clamps
    against its group's cuts. All integer: cent values, truncating
    sign-split mean divisions quantized once. ``group_col`` must be a
    string column (the grouped-rank offset map's key type).

    Returns per group: (group, n_rows, mean_cents,
    winsorized_mean_cents, trimmed_mean_cents, lo_cut_cents,
    hi_cut_cents), ordered by group."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    base = df.select(
        F.col(group_col).alias("g"),
        F.expr(value_c_expr).alias("v"),
        F.col(key_col).alias("k"),
    ).filter(F.col("v").isNotNull())
    # ONE grouped two-phase rank (range shuffle + partitioned window —
    # #shuffle-partitions tasks, not #groups), persisted: the cut-value
    # reads and the clamp pass both consume `ranked` — without the
    # persist each consumer re-runs the broadcast offset join (the
    # checkpoint inside the helper already pins the expensive rank
    # itself). Per-group n rides the helper's offset map (total_out) —
    # the separate count aggregate this used to run is gone. cuts are
    # group-count-sized → checkpointed + broadcast.
    ranked = with_grouped_rank(
        base, "g", ["v", "k"], "r", total_out="n",
        materialize_input=False,  # input is a projected parquet scan
    ).persist()
    ranked2 = ranked.withColumn(
        "r_lo",
        F.greatest(
            F.expr(f"({lo_pct} * n + 99) DIV 100"), F.lit(1)
        ),
    ).withColumn("r_hi", F.expr(f"({hi_pct} * n + 99) DIV 100"))
    cuts = (
        ranked2.groupBy("g")
        .agg(
            F.max(F.when(F.col("r") == F.col("r_lo"), F.col("v")))
            .alias("lo_cut"),
            F.max(F.when(F.col("r") == F.col("r_hi"), F.col("v")))
            .alias("hi_cut"),
        )
        .localCheckpoint(eager=True)  # group-count-sized
    )
    j = ranked2.join(F.broadcast(cuts), "g").withColumn(
        "vw",
        F.greatest(F.least(F.col("v"), F.col("hi_cut")), F.col("lo_cut")),
    )
    mean = sdiv_scaled_sql("sv", "n", 1, "DIV")
    meanw = sdiv_scaled_sql("svw", "n", 1, "DIV")
    meant = sdiv_scaled_sql("svt", "nt", 1, "DIV")
    out = (
        j.groupBy("g")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum("v").cast("long").alias("sv"),
            F.sum("vw").cast("long").alias("svw"),
            F.sum(
                F.when(
                    (F.col("r") >= F.col("r_lo"))
                    & (F.col("r") <= F.col("r_hi")),
                    F.col("v"),
                )
            ).cast("long").alias("svt"),
            F.sum(
                F.when(
                    (F.col("r") >= F.col("r_lo"))
                    & (F.col("r") <= F.col("r_hi")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("nt"),
            F.max("lo_cut").cast("long").alias("lo_cut_cents"),
            F.max("hi_cut").cast("long").alias("hi_cut_cents"),
        )
        .select(
            F.col("g").alias(group_col),
            F.col("n").alias("n_rows"),
            F.expr(mean).alias("mean_cents"),
            F.expr(meanw).alias("winsorized_mean_cents"),
            F.expr(f"CASE WHEN nt > 0 THEN {meant} END")
            .alias("trimmed_mean_cents"),
            "lo_cut_cents", "hi_cut_cents",
        )
        .orderBy(group_col)
    )
    try:
        return out.localCheckpoint(eager=True)  # group-count-sized
    finally:
        ranked.unpersist()


def conformal_interval_report(
    df: DataFrame,
    group_col: str,
    value_c_expr: str,
    key_col: str,
    alpha_pct: int = 10,
) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al.; the
    distribution-free coverage guarantee ML eval pipelines attach to
    ANY point predictor): key-hash three-way split, per-group median
    predictor fit on TRAIN, nonconformity quantile ceil((n+1)(1-alpha))
    read on CALIB, coverage audited on TEST — if exchangeability
    holds, test coverage >= 1 - alpha by construction, and publishing
    the audit column IS the point of the operator.

    All order statistics are exact nearest-rank reads over (value,
    key) two-phase grouped ranks (with_grouped_rank — never a
    one-task-per-group window); everything else is integer cents and
    one sign-split e6 share. ``group_col`` must be a string column.
    Returns per group: (group, n_train, n_calib, n_test, pred_cents,
    q_resid_cents, n_covered, coverage_e6)."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    base = df.select(
        F.col(group_col).alias("g"),
        F.expr(value_c_expr).alias("v"),
        F.col(key_col).cast("long").alias("k"),
    ).filter(F.col("v").isNotNull())
    # ONE projected corpus pass, persisted: the train/calib/test splits
    # each re-scanned orders before (orders×4, VERDICT r8 #3); tr/qs
    # stay group-count-sized broadcasts and the output is group-sized.
    base = base.withColumn("part", (F.col("k") % 3).cast("int")).persist()
    train = base.filter(F.col("part") == 0)
    calib = base.filter(F.col("part") == 1)
    test = base.filter(F.col("part") == 2)

    # both order-statistic reads rank via the two-phase grouped rank
    # (with_grouped_rank) — a Window.partitionBy(g) row_number/count
    # would put each group's whole slice on ONE task (VERDICT r10 #2);
    # per-group n rides the helper's broadcast offset map (total_out),
    # replacing the max-rank aggregate each read used to run
    tr_ranked = with_grouped_rank(
        train, "g", ["v", "k"], "r", total_out="n",
        materialize_input=False,  # train is a filter of the persisted base
    )
    tr = (
        tr_ranked
        .groupBy("g")
        .agg(
            F.max("n").cast("long").alias("n_train"),
            F.max(
                F.when(
                    F.col("r") == F.expr("(n + 1) DIV 2"), F.col("v")
                )
            ).cast("long").alias("pred"),
        )
        .localCheckpoint(eager=True)  # group-count-sized; 2 consumers
    )
    ca = calib.join(F.broadcast(tr), "g").withColumn(
        "resid", F.abs(F.col("v") - F.col("pred"))
    )
    q_rank = f"least((({100 - alpha_pct}) * (n + 1) + 99) DIV 100, n)"
    ca_ranked = with_grouped_rank(
        ca, "g", ["resid", "k"], "r", total_out="n",
        # calib is a filter of the persisted base + a broadcast join on
        # the checkpointed tr — cheap to re-derive for the sampling job
        materialize_input=False,
    )
    qs = (
        ca_ranked
        .groupBy("g")
        .agg(
            F.max("n").cast("long").alias("n_calib"),
            F.max(
                F.when(F.col("r") == F.expr(q_rank), F.col("resid"))
            ).cast("long").alias("q_resid"),
        )
    )
    cov = sdiv_scaled_sql("n_cov", "n_test", 1000000, "DIV")
    out = (
        test.join(F.broadcast(tr), "g")
        .join(F.broadcast(qs), "g")
        .groupBy("g")
        .agg(
            F.max("n_train").alias("n_train"),
            F.max("n_calib").alias("n_calib"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.max("pred").alias("pred_cents"),
            F.max("q_resid").alias("q_resid_cents"),
            F.sum(
                F.when(
                    F.abs(F.col("v") - F.col("pred"))
                    <= F.col("q_resid"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_cov"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_train", "n_calib", "n_test",
            "pred_cents", "q_resid_cents",
            F.col("n_cov").alias("n_covered"),
            F.expr(f"CASE WHEN n_test > 0 THEN {cov} END")
            .alias("coverage_e6"),
        )
        .orderBy(group_col)
    )
    try:
        return out.localCheckpoint(eager=True)  # group-count-sized
    finally:
        base.unpersist()


def gains_table(
    scored: DataFrame,
    score_col: str,
    outcome_c_col: str,
    key_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table — the targeting-model eval that
    answers 'if I act on the top k% by score, what share of the
    outcome do I capture?' (the tabular sibling of the AUC pair:
    binary_auc_report ranks PAIRS, this reads the CAPTURE CURVE at
    decile granularity, the form campaign planning consumes).

    Rank by (score desc, key) — deterministic, no ntile (engines
    disagree on ntile remainder placement; the explicit
    ((rank-1)*B) DIV n bucket does not). The global sort runs over
    the UNIT table (a dimension, orders of magnitude below fact
    scale); everything after is B rows. Integer: cents; e6 shares
    use a magnitude-gated 2^20 shift past 2^43 totals (relative
    error <= 2^-23, below e6 resolution), so no cent-sum overflows
    at any corpus size. lift_e6 multiplies
    the already-quantized cumulative share — one extra e6 rounding,
    by design, to keep the product in int64.

    Returns per bucket: (bucket, n_units, outcome_cents,
    cum_outcome_cents, cum_outcome_share_e6, cum_unit_share_e6,
    lift_e6)."""
    base = scored.select(
        F.col(score_col).alias("sc"),
        F.col(outcome_c_col).alias("y"),
        F.col(key_col).alias("k"),
    )
    # scale-safe exact global rank (two-phase; an empty-PARTITION-BY
    # window would run on one partition and the lint rejects it)
    ranked = with_global_rank(base, [F.desc("sc"), F.asc("k")], "r")
    n_tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("tot"),
    )
    b = (
        ranked.crossJoin(F.broadcast(n_tot))
        .withColumn(
            "bucket", F.expr(f"((r - 1) * {n_buckets}) DIV n")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum("y").cast("long").alias("outcome_cents"),
            F.max("n").alias("n"),
            F.max("tot").alias("tot"),
        )
    )
    b = b.localCheckpoint(eager=True)  # n_buckets rows; self-joined
    cum = (
        b.alias("a")
        .join(
            F.broadcast(b.alias("p")),
            F.col("p.bucket") <= F.col("a.bucket"),
        )
        .groupBy(
            F.col("a.bucket").alias("bucket"),
            F.col("a.n_units").alias("n_units"),
            F.col("a.outcome_cents").alias("outcome_cents"),
            F.col("a.n").alias("n"),
            F.col("a.tot").alias("tot"),
        )
        .agg(
            F.sum("p.outcome_cents").alias("cum_y"),
            F.sum("p.n_units").alias("cum_n"),
        )
    )

    # e6 shares of possibly-huge nonnegative totals: (num*1e6) needs
    # num < 2^43; past that, shift BOTH sides by 2^20 (relative error
    # <= 2^-23, below e6 resolution; branch chosen by an integer
    # compare both engines evaluate identically). The x10 scale probe
    # caught the unshifted version overflowing at ~$220B of cents.
    def bigshare(num, den, fd="DIV"):
        return (
            f"CASE WHEN ({den}) < 8796093022208"
            f" THEN (({num}) * 1000000) {fd} ({den})"
            f" ELSE ((({num}) {fd} 1048576) * 1000000)"
            f" {fd} (({den}) {fd} 1048576) END"
        )

    share = bigshare("cum_y", "tot")
    cshare = bigshare("cum_n", "n")
    lift = (
        "CASE WHEN n < 8796093022208"
        " THEN (cum_share_e6 * n) DIV cum_n"
        " ELSE (cum_share_e6 * (n DIV 1048576))"
        " DIV (cum_n DIV 1048576) END"
    )
    return (
        cum.withColumn(
            "cum_share_e6",
            F.expr(f"CASE WHEN tot > 0 THEN {share} END"),
        )
        .select(
            "bucket", "n_units", "outcome_cents",
            F.col("cum_y").alias("cum_outcome_cents"),
            F.col("cum_share_e6").alias("cum_outcome_share_e6"),
            F.expr(f"CASE WHEN n > 0 THEN {cshare} END")
            .alias("cum_unit_share_e6"),
            F.expr(
                f"CASE WHEN cum_n > 0 AND cum_share_e6 IS NOT NULL"
                f" THEN {lift} END"
            ).alias("lift_e6"),
        )
        .orderBy("bucket")
    )


def calibration_report(
    df: DataFrame,
    p_e6_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Probability-calibration audit — reliability bins + Brier score
    + expected calibration error, the standard read on whether a
    scorer's probabilities MEAN anything before anyone thresholds
    them (the calibration complement to the discrimination-side AUC
    pair: a scorer can rank perfectly and still claim 90% where 60%
    happens).

    Input: p_e6_col = predicted probability in e6 fixed point
    [0, 1e6]; label_col = 0/1. One map-side-combinable aggregate to
    `n_bins` fixed-width bins. Integer throughout: per-row squared
    Brier terms pre-divide by 1e6 (a <= 1e-6 deterministic floor on
    both engines) so the corpus sum stays in int64 to ~9e12 rows;
    conf/acc/ECE are sign-split e6 divisions of exact sums. Returns
    one row per non-empty bin: (bin, n_rows, conf_e6, acc_e6, gap_e6)
    with the corpus-level (brier_e6, ece_e6, n_total) replicated on
    every row."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    base = df.select(
        F.expr(p_e6_col).cast("long").alias("p"),
        F.expr(label_col).cast("long").alias("y"),
    ).filter(F.col("p").isNotNull() & F.col("y").isNotNull())
    binned = base.withColumn(
        "bin",
        F.least(
            F.expr(f"(p * {n_bins}) DIV 1000000"),
            F.lit(n_bins - 1),
        ).cast("int"),
    ).withColumn(
        "sq_e6",
        F.expr("((p - y * 1000000) * (p - y * 1000000)) DIV 1000000"),
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("p").cast("long").alias("sp"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("sq_e6").cast("long").alias("ssq"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("ssq").cast("long").alias("ssqt"),
        F.sum(F.abs(F.col("sy") * 1000000 - F.col("sp")))
        .cast("long").alias("gap_sum"),
    )
    conf = sdiv_scaled_sql("sp", "n", 1, "DIV")
    acc = sdiv_scaled_sql("sy * 1000000", "n", 1, "DIV")
    brier = sdiv_scaled_sql("ssqt", "nt", 1, "DIV")
    ece = sdiv_scaled_sql("gap_sum", "nt", 1, "DIV")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n").alias("n_rows"),
            F.expr(conf).alias("conf_e6"),
            F.expr(acc).alias("acc_e6"),
            (F.expr(acc) - F.expr(conf)).alias("gap_e6"),
            F.expr(brier).alias("brier_e6"),
            F.expr(ece).alias("ece_e6"),
            F.col("nt").alias("n_total"),
        )
        .orderBy("bin")
    )


#: two-sided O'Brien-Fleming z boundaries for K = 4 equally spaced
#: looks at overall alpha = 0.05 (Jennison & Turnbull Ch.2 values),
#: e6 literals on both engines — the spec, not a runtime computation.
OBF_CRIT_E6_K4: tuple[int, ...] = (4048591, 2862786, 2337455, 2024407)


def group_sequential_monitor(
    df: DataFrame,
    arm_col: str,
    value_c_expr: str,
    ts_us_expr: str,
    crit_e6: tuple[int, ...] = OBF_CRIT_E6_K4,
) -> DataFrame:
    """Group-sequential A/B monitoring with O'Brien-Fleming spending —
    the interim-analysis discipline that lets an experimenter PEEK at
    K scheduled looks without inflating false positives (naive
    peeking at alpha=0.05 four times fires ~11% under the null; OBF's
    early looks demand near-4-sigma, spending almost nothing until
    the final look reads at ~2.02).

    Looks are the K equal time slices of the observed span (integer
    microsecond cutoffs); each look's z is the shared welch_z_sql()
    tree over CUMULATIVE exact integer moments (one corpus aggregate
    to K slice rows, then K-row window sums — the corpus is touched
    once regardless of K). Returns one row per look: (look,
    cutoff_us, n_a, n_b, z_e6, obf_crit_e6, crossed) plus
    first_crossed_look (0 = never) replicated on every row."""
    from firebase_etl_spark.functions.portable_math import (
        fixed_e6_expr,
    )

    k_looks = len(crit_e6)
    base = df.select(
        F.col(arm_col).alias("arm"),
        F.expr(value_c_expr).alias("v"),
        F.expr(ts_us_expr).cast("long").alias("us"),
    ).filter(F.col("v").isNotNull() & F.col("us").isNotNull())
    span = F.broadcast(
        base.agg(
            F.min("us").alias("mn"), F.max("us").alias("mx")
        )
    )
    look_case = " ".join(
        f"WHEN us <= mn + ((mx - mn) * {k + 1}) DIV {k_looks}"
        f" THEN {k + 1}"
        for k in range(k_looks)
    )
    sliced = base.crossJoin(span).withColumn(
        "look", F.expr(f"CASE {look_case} ELSE {k_looks} END")
    )
    per = sliced.groupBy("look").agg(
        F.max(
            F.expr(f"mn + ((mx - mn) * look) DIV {k_looks}")
        ).alias("cutoff_us"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long")
        .alias("ia"),
        F.coalesce(F.sum(F.when(F.col("arm") == 0, F.col("v"))), F.lit(0))
        .cast("long").alias("xa"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 0, F.col("v") * F.col("v"))),
            F.lit(0),
        ).cast("long").alias("qa"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long")
        .alias("ib"),
        F.coalesce(F.sum(F.when(F.col("arm") == 1, F.col("v"))), F.lit(0))
        .cast("long").alias("xb"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 1, F.col("v") * F.col("v"))),
            F.lit(0),
        ).cast("long").alias("qb"),
    ).localCheckpoint(eager=True)  # K rows; 3 consumer chains below
    cum = (
        per.alias("a")
        .join(
            F.broadcast(per.alias("p")),
            F.col("p.look") <= F.col("a.look"),
        )
        .groupBy(
            F.col("a.look").alias("look"),
            F.col("a.cutoff_us").alias("cutoff_us"),
        )
        .agg(
            F.sum("p.ia").alias("na"),
            F.sum("p.xa").alias("sa"),
            F.sum("p.qa").alias("ssa"),
            F.sum("p.ib").alias("nb"),
            F.sum("p.xb").alias("sb"),
            F.sum("p.qb").alias("ssb"),
        )
        .withColumn(
            "z_e6",
            F.expr(
                f"CASE WHEN ({welch_z_sql()}) IS NOT NULL"
                f" THEN {fixed_e6_expr(welch_z_sql())} END"
            ),
        )
    )
    crit_case = " ".join(
        f"WHEN look = {k + 1} THEN CAST({c} AS BIGINT)"
        for k, c in enumerate(crit_e6)
    )
    flagged = cum.withColumn(
        "obf_crit_e6", F.expr(f"CASE {crit_case} END")
    ).withColumn(
        "crossed",
        F.col("z_e6").isNotNull()
        & (F.abs(F.col("z_e6")) >= F.col("obf_crit_e6")),
    )
    first = flagged.agg(
        F.coalesce(
            F.min(F.when(F.col("crossed"), F.col("look"))), F.lit(0)
        ).cast("long").alias("first_crossed_look")
    )
    return (
        flagged.crossJoin(F.broadcast(first))
        .select(
            F.col("look").cast("long").alias("look"),
            "cutoff_us",
            F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
            "z_e6", "obf_crit_e6", "crossed", "first_crossed_look",
        )
        .orderBy("look")
    )


def group_jackknife(
    df: DataFrame,
    group_col: str,
    value_c_expr: str,
) -> DataFrame:
    """Leave-one-group-out jackknife sensitivity — 'which segment is
    carrying the metric': recompute the global mean with each group
    deleted and report the displacement. The robustness audit that
    catches a headline KPI secretly owned by one nation / one source
    / one cohort (the group-level cousin of the winsorized screen's
    row-level tail story, and of embedding_knn_shapley's per-POINT
    valuation).

    One aggregate to G group rows + one broadcast total — the corpus
    is touched once; influence is pure integer algebra on exact cent
    sums (each leave-out mean quantized once by truncating division,
    then differenced). Returns per group: (group, n_rows,
    sum_cents, mean_cents, mean_without_cents, influence_cents,
    overall_mean_cents), ordered by |influence| desc then group."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    base = df.select(
        F.col(group_col).alias("g"),
        F.expr(value_c_expr).alias("v"),
    ).filter(F.col("v").isNotNull() & F.col("g").isNotNull())
    per = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("s").cast("long").alias("st"),
    )
    m_all = sdiv_scaled_sql("st", "nt", 1, "DIV")
    m_wo = sdiv_scaled_sql("st - s", "nt - n", 1, "DIV")
    m_g = sdiv_scaled_sql("s", "n", 1, "DIV")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("g").alias(group_col),
            F.col("n").alias("n_rows"),
            F.col("s").alias("sum_cents"),
            F.expr(m_g).alias("mean_cents"),
            F.expr(
                f"CASE WHEN nt - n > 0 THEN {m_wo} END"
            ).alias("mean_without_cents"),
            F.expr(
                f"CASE WHEN nt - n > 0"
                f" THEN ({m_wo}) - ({m_all}) END"
            ).alias("influence_cents"),
            F.expr(m_all).alias("overall_mean_cents"),
        )
        .orderBy(
            F.desc(F.abs(F.coalesce(F.col("influence_cents"), F.lit(0)))),
            group_col,
        )
    )


#: estimator widths for partition_advisor (in-memory-ish bytes):
#: fixed-width types by dtype, strings as length + 4-byte header
_ADVISOR_WIDTHS = {
    "bigint": 8, "double": 8, "timestamp": 8, "date": 4,
    "int": 4, "smallint": 2, "boolean": 1, "float": 4,
}


def partition_advisor(
    df: DataFrame,
    key_col: str,
    target_partition_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """ANALYZE-style partition/bucketing advisor — the design-for-
    scale numbers a pipeline owner reads before sizing
    spark.sql.shuffle.partitions or a bucket count for a table: how
    many bytes is this really, how many ~128 MB partitions does that
    imply, and is the join key skewed enough to need salting.

    Row width derives from the DataFrame schema (fixed widths by
    dtype, strings as exact length + 4); total bytes / distinct keys
    / max key frequency come from TWO aggregates (one over rows, one
    over the key's count-per-key table — both map-side combinable).
    skew_ratio_e6 = max_freq * n_distinct / n_rows (1e6 = perfectly
    uniform; the salting threshold rule of thumb is ~4-10e6). All
    integer outputs. Returns ONE row: (n_rows, est_total_bytes,
    avg_row_bytes, n_distinct_keys, max_key_freq, skew_ratio_e6,
    recommended_partitions, rows_per_partition)."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    width_terms = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t == "string":
            width_terms.append(
                f"(coalesce(length({f.name}), 0) + 4)"
            )
        else:
            width_terms.append(str(_ADVISOR_WIDTHS.get(t, 8)))
    row_bytes = " + ".join(width_terms)
    rows = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.expr(row_bytes)).cast("long").alias("est_total_bytes"),
    )
    keys = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_keys"),
            F.max("c").cast("long").alias("max_key_freq"),
        )
    )
    skew = sdiv_scaled_sql(
        "max_key_freq * n_distinct_keys", "n_rows", 1000000, "DIV"
    )
    parts = (
        f"greatest((est_total_bytes + {target_partition_bytes - 1})"
        f" DIV {target_partition_bytes}, 1)"
    )
    return (
        rows.crossJoin(F.broadcast(keys))
        .select(
            "n_rows", "est_total_bytes",
            F.expr("CASE WHEN n_rows > 0 THEN"
                   " est_total_bytes DIV n_rows END")
            .alias("avg_row_bytes"),
            "n_distinct_keys", "max_key_freq",
            F.expr(f"CASE WHEN n_rows > 0 THEN {skew} END")
            .alias("skew_ratio_e6"),
            F.expr(parts).alias("recommended_partitions"),
            F.expr(
                f"CASE WHEN n_rows > 0"
                f" THEN n_rows DIV ({parts}) END"
            ).alias("rows_per_partition"),
        )
    )


def mix_shift_decomposition(
    df: DataFrame,
    group_col: str,
    qty_col: str,
    rev_c_col: str,
    period_col: str,
    top: int = 15,
) -> DataFrame:
    """Price/volume/mix decomposition of a revenue change between two
    periods — the finance-analytics identity ('revenue fell 3%: was
    it prices, quantities, or what we sold?'): per segment,
    dR = (p1-p0)*q0  [price]  +  p0*(q1-q0)  [volume]
       + (p1-p0)*(q1-q0)      [mix/cross].

    Input rows carry (group, qty BIGINT, revenue cents BIGINT,
    period 0/1). One aggregate to (group, period) cells; unit prices
    quantize ONCE at e4 cents (sign-split; the only rationals in the
    identity), every effect after is exact integer algebra, and the
    reconciliation residual — delta_cents*1e4 minus the three effects
    — is PUBLISHED per row, so the quantization error is visible
    instead of silent. Segments missing from either period carry NULL
    effects (their delta still reports). Returns the `top` segments
    by |delta_cents| desc, group asc: (group, q0, q1, rev0_cents,
    rev1_cents, delta_cents, price_effect_e4, volume_effect_e4,
    mix_effect_e4, residual_e4)."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    cells = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(qty_col).alias("q"),
            F.col(rev_c_col).alias("r"),
            F.col(period_col).alias("p"),
        )
        .groupBy("g")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("p") == 0, F.col("q"))), F.lit(0)
            ).cast("long").alias("q0"),
            F.coalesce(
                F.sum(F.when(F.col("p") == 1, F.col("q"))), F.lit(0)
            ).cast("long").alias("q1"),
            F.coalesce(
                F.sum(F.when(F.col("p") == 0, F.col("r"))), F.lit(0)
            ).cast("long").alias("r0"),
            F.coalesce(
                F.sum(F.when(F.col("p") == 1, F.col("r"))), F.lit(0)
            ).cast("long").alias("r1"),
        )
    )
    p0 = sdiv_scaled_sql("r0", "q0", 10000, "DIV")
    p1 = sdiv_scaled_sql("r1", "q1", 10000, "DIV")
    both = "q0 > 0 AND q1 > 0"
    priced = (
        cells.withColumn(
            "p0_e4", F.expr(f"CASE WHEN q0 > 0 THEN {p0} END")
        )
        .withColumn(
            "p1_e4", F.expr(f"CASE WHEN q1 > 0 THEN {p1} END")
        )
        .withColumn("delta_cents", F.col("r1") - F.col("r0"))
        .withColumn(
            "price_effect_e4",
            F.expr(f"CASE WHEN {both}"
                   " THEN (p1_e4 - p0_e4) * q0 END"),
        )
        .withColumn(
            "volume_effect_e4",
            F.expr(f"CASE WHEN {both}"
                   " THEN p0_e4 * (q1 - q0) END"),
        )
        .withColumn(
            "mix_effect_e4",
            F.expr(f"CASE WHEN {both}"
                   " THEN (p1_e4 - p0_e4) * (q1 - q0) END"),
        )
        .withColumn(
            "residual_e4",
            F.expr(
                f"CASE WHEN {both} THEN delta_cents * 10000"
                " - (price_effect_e4 + volume_effect_e4"
                " + mix_effect_e4) END"
            ),
        )
    )
    return (
        priced.select(
            F.col("g").alias(group_col),
            "q0", "q1",
            F.col("r0").alias("rev0_cents"),
            F.col("r1").alias("rev1_cents"),
            "delta_cents", "price_effect_e4", "volume_effect_e4",
            "mix_effect_e4", "residual_e4",
        )
        .orderBy(F.desc(F.abs("delta_cents")), group_col)
        .limit(top)
    )


def eb_shrinkage_report(
    counts: DataFrame,
    group_col: str = "g",
    n_col: str = "n",
    k_col: str = "k",
) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-group rates —
    the 'don't trust a 3-customer segment's 100% rate' estimator: fit
    Beta(alpha, beta) to the observed group rates by method of
    moments, then pull every group toward the prior mean with weight
    (alpha+beta)/(n+alpha+beta) — small groups shrink hard, big
    groups keep their data (Robbins 1956; the Wilson interval bounds
    ONE group's uncertainty, this BORROWS STRENGTH across groups).

    Integer protocol: each group rate quantizes ONCE (r_e6 =
    k*1e6 div n); the prior moments mu/var and the MoM alpha/beta
    each quantize once from exact integer sums; the posterior rate is
    one final sign-split division of int64 products (exact while
    (n*1000 + prior)*1e6 < 2^63 per group — the e3 prior scale and
    the 1e9 ratio cap keep that true to ~9e9 members). Degenerate
    prior (zero variance across groups or overdispersed MoM) falls
    back to raw rates with NULL alpha/beta — published, not hidden.
    Returns per group: (group, n_units, k_hits, raw_rate_e6,
    shrunk_rate_e6, prior_weight_e6, alpha_e3, beta_e3), ordered by
    group."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    per = counts.select(
        F.col(group_col).alias("g"),
        F.col(n_col).cast("long").alias("n"),
        F.col(k_col).cast("long").alias("k"),
    ).filter(F.col("n") > 0)
    r_e6 = sdiv_scaled_sql("k", "n", 1000000, "DIV")
    rated = per.withColumn("r_e6", F.expr(r_e6))
    mom = rated.agg(
        F.count(F.lit(1)).cast("long").alias("gn"),
        F.sum("r_e6").cast("long").alias("sr"),
        F.sum(F.col("r_e6") * F.col("r_e6")).cast("long").alias("srr"),
    ).select(
        "gn",
        F.expr("sr DIV gn").alias("mu_e6"),
        F.expr(
            "CASE WHEN gn > 1 THEN"
            " (srr - (sr DIV gn) * sr) DIV (gn - 1) END"
        ).alias("var_e12"),
    ).select(
        "gn", "mu_e6", "var_e12",
        # mu(1-mu)/var, dimensionless; capped at 1e9 (a prior worth a
        # billion-sample equivalent IS full shrinkage — and the cap
        # keeps every downstream product inside int64)
        F.expr(
            "CASE WHEN var_e12 > 0 THEN least("
            " (mu_e6 * (1000000 - mu_e6)) DIV var_e12,"
            " 1000000000) END"
        ).alias("ratio"),
    ).select(
        "gn", "mu_e6", "var_e12", "ratio",
        F.expr(
            "CASE WHEN ratio IS NOT NULL AND ratio > 1 THEN"
            " (mu_e6 * (ratio - 1)) DIV 1000 END"
        ).alias("alpha_e3"),
        F.expr(
            "CASE WHEN ratio IS NOT NULL AND ratio > 1 THEN"
            " ((1000000 - mu_e6) * (ratio - 1)) DIV 1000 END"
        ).alias("beta_e3"),
    )
    shrunk = sdiv_scaled_sql(
        "k * 1000 + alpha_e3", "n * 1000 + alpha_e3 + beta_e3",
        1000000, "DIV",
    )
    wprior = sdiv_scaled_sql(
        "alpha_e3 + beta_e3", "n * 1000 + alpha_e3 + beta_e3",
        1000000, "DIV",
    )
    return (
        rated.crossJoin(F.broadcast(mom))
        .select(
            F.col("g").alias(group_col),
            F.col("n").alias("n_units"),
            F.col("k").alias("k_hits"),
            F.col("r_e6").alias("raw_rate_e6"),
            F.expr(
                f"CASE WHEN alpha_e3 IS NOT NULL THEN {shrunk}"
                f" ELSE r_e6 END"
            ).alias("shrunk_rate_e6"),
            F.expr(
                f"CASE WHEN alpha_e3 IS NOT NULL THEN {wprior}"
                f" ELSE 0 END"
            ).alias("prior_weight_e6"),
            "alpha_e3", "beta_e3",
        )
        .orderBy(group_col)
    )


def fd_audit(
    df: DataFrame,
    pairs: list[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency audit — does X determine Y in this data:
    for each candidate FD X -> Y, count determinant values carrying
    MORE than one distinct dependent (the violations that break
    'join on X and trust Y', dimension conformity, and SCD
    assumptions). The profiling complement to
    referential_integrity_audit (that one checks keys EXIST; this
    checks they MEAN one thing).

    One groupBy per candidate (each map-side combinable over (X, Y)
    distinct pairs); all integer. Returns per candidate:
    (determinant, dependent, n_keys, n_violating_keys, max_variants,
    holds)."""
    spark = df.sparkSession
    outs = []
    for x, y in pairs:
        per = (
            df.select(F.col(x).alias("xx"), F.col(y).alias("yy"))
            .filter(F.col("xx").isNotNull())
            .distinct()
            .groupBy("xx")
            .agg(F.count(F.lit(1)).alias("nv"))
        )
        outs.append(
            per.agg(
                F.lit(x).alias("determinant"),
                F.lit(y).alias("dependent"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum((F.col("nv") > 1).cast("long")).cast("long")
                .alias("n_violating_keys"),
                F.max("nv").cast("long").alias("max_variants"),
            ).withColumn(
                "holds", F.col("n_violating_keys") == 0
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("determinant", "dependent")


#: (z_{alpha/2} + z_{beta})^2 at alpha=0.05 two-sided, power=80%,
#: squared EXACTLY from the e6 literals (1959964 + 841621)^2 — one
#: shared integer constant, no runtime normal quantiles.
_POWER_C_E12 = (1959964 + 841621) ** 2


def power_analysis_report(
    counts: DataFrame,
    group_col: str = "g",
    n_col: str = "n",
    k_col: str = "k",
    mde_rel_e6: int = 100000,
) -> DataFrame:
    """A/B sample-size calculator per metric — the experiment-DESIGN
    side of the stats family (the FDR screen and OBF monitor read
    results; this says whether the experiment was big enough to run
    at all): for each group's baseline rate p, the classic
    two-proportion approximation n/arm = 2*pbar*(1-pbar)*(z_a+z_b)^2
    / delta^2 at the configured relative MDE, alpha=0.05, 80% power.

    Integer protocol: p quantizes once at e6; delta and pbar are
    integer algebra on it; the z-sum constant is squared exactly from
    its e6 literals at import; the n formula evaluates as two
    truncating divisions with a 1e3 guard scale (products bounded by
    ~5e14 — int64-safe at any corpus size since everything after the
    first aggregate is rate-valued). Returns per group: (group,
    n_baseline, k_hits, p_e6, delta_e6, n_required_per_arm,
    powered_now)."""
    per = counts.select(
        F.col(group_col).alias("g"),
        F.col(n_col).cast("long").alias("n"),
        F.col(k_col).cast("long").alias("k"),
    ).filter(F.col("n") > 0)
    p = "((k * 1000000) DIV n)"
    rated = per.withColumn("p_e6", F.expr(p)).filter(
        (F.col("p_e6") > 0) & (F.col("p_e6") < 1000000)
    )
    d = f"((p_e6 * {mde_rel_e6}) DIV 1000000)"
    sized = (
        rated.withColumn("delta_e6", F.expr(d))
        .filter(F.col("delta_e6") > 0)
        .withColumn(
            "pbar_e6",
            F.expr(f"p_e6 + ((p_e6 * {mde_rel_e6}) DIV 2000000)"),
        )
        .withColumn(
            # capped at 1e6 so t1 * C stays in int64: the cap reads
            # as n_required ~ 7.8e9/arm — any test needing more is
            # simply "not powerable", which powered_now reports
            "t1",
            F.expr(
                "least((2 * pbar_e6 * (1000000 - pbar_e6) * 1000)"
                " DIV (delta_e6 * delta_e6), 1000000)"
            ),
        )
        .withColumn(
            "n_required_per_arm",
            F.expr(f"(t1 * {_POWER_C_E12}) DIV 1000000000000000"),
        )
    )
    return sized.select(
        F.col("g").alias(group_col),
        F.col("n").alias("n_baseline"),
        F.col("k").alias("k_hits"),
        "p_e6", "delta_e6", "n_required_per_arm",
        (F.col("n") >= F.col("n_required_per_arm")).alias(
            "powered_now"
        ),
    ).orderBy(group_col)


def quantile_normalization_map(
    df: DataFrame,
    group_col: str,
    value_c_expr: str,
    key_col: str,
    n_q: int = 10,
) -> DataFrame:
    """Quantile-normalization mapping table — the batch-effect
    corrector (classic in bioinformatics, same job for heterogeneous
    telemetry feeds): align every group's value distribution onto the
    POOLED distribution by rank, published as a per-(group, decile)
    lookup of source quantile -> pooled quantile -> additive
    adjustment. Downstream applies it with one broadcast join; this
    operator IS the fit.

    Exact nearest-rank quantiles on both levels (rank ceil(q*n),
    (value, key) tie order) from two window sorts — the same price
    any exact percentile pays; everything else is integer cents.
    Returns (group, q_idx, src_q_cents, pooled_q_cents,
    adjust_cents), ordered by (group, q_idx)."""
    base = df.select(
        F.col(group_col).alias("g"),
        F.expr(value_c_expr).alias("v"),
        F.col(key_col).alias("k"),
    ).filter(F.col("v").isNotNull() & F.col("g").isNotNull())

    # ONE pass per level: each ranked row computes which decile
    # targets its rank hits (possibly several in tiny groups) and
    # explodes them — no per-decile rescans, no self-joins
    hit = (
        f"filter(transform(sequence(1, {n_q}), i -> CASE WHEN"
        f" r = greatest((i * n + {n_q - 1}) DIV {n_q}, 1)"
        f" THEN i END), x -> x IS NOT NULL)"
    )

    # BOTH levels (per-group AND pooled) rank through ONE two-phase
    # helper call (VERDICT r11 #5 job-floor fusion): the pooled level
    # is just one more "group" — a tagged union ('g:<g>' rows next to
    # one 'p:' copy of every row) ranks per tag in a single range
    # shuffle + a single offset collect, where the two separate helper
    # calls paid the eager sampling/materialize/collect jobs twice.
    # Per-tag ranks are identical to the split form: each tag is its
    # own group, the (v, k) order is unchanged, and total_out="n"
    # yields the per-group n for 'g:' tags and the grand total for
    # 'p:'. The original (typed) g value rides as payload; 'p:' rows
    # carry NULL there and never read it.
    tagged = base.select(
        F.concat(F.lit("g:"), F.col("g").cast("string")).alias("gt"),
        "g", "v", "k",
    ).unionAll(
        base.select(
            F.lit("p:").alias("gt"),
            F.lit(None).cast(base.schema["g"].dataType).alias("g"),
            "v", "k",
        )
    )
    ranked = with_grouped_rank(
        tagged, "gt", ["v", "k"], "r", total_out="n",
        materialize_input=False,  # input is a cheap tagged projection
    )
    hits = ranked.select(
        "gt", "g", F.col("v").alias("qv"),
        F.explode(F.expr(hit)).alias("q_idx"),
    )
    src = hits.filter(F.col("gt") != "p:").select("g", "qv", "q_idx")
    pooled = hits.filter(F.col("gt") == "p:").select(
        "q_idx", F.col("qv").alias("pooled_q_cents")
    )
    return (
        src.join(F.broadcast(pooled), "q_idx")
        .select(
            F.col("g").alias(group_col),
            F.col("q_idx").cast("long").alias("q_idx"),
            F.col("qv").alias("src_q_cents"),
            "pooled_q_cents",
            (F.col("pooled_q_cents") - F.col("qv")).alias(
                "adjust_cents"
            ),
        )
        .orderBy(group_col, "q_idx")
    )


def isotonic_calibration_report(
    df: DataFrame,
    p_e6_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Isotonic recalibration of a binned scorer — the FIX paired
    with calibration_report's audit: fit the best monotone
    bin->probability map (weighted isotonic regression of observed
    accuracy on score bins) and publish it beside the raw
    reliabilities with before/after calibration error. This is what
    turns a well-RANKING but mis-CALIBRATED scorer into usable
    probabilities without refitting the model.

    The fit uses the exact minimax identity fitted_i = max_{j<=i}
    min_{k>=i} mean(y over bins j..k) instead of sequential
    pool-adjacent-violators: over B bins that is a B^3/6-row grid of
    integer prefix-sum differences — corpus work is ONE aggregate to
    B rows, the lattice is engine-trivial, and there is no recursion
    to mirror. Interval means are single IEEE divisions of exact
    integers (deterministic on both engines; max/min only COMPARE
    doubles, never accumulate), quantized once at e6. Returns one row
    per non-empty bin: (bin, n_rows, conf_e6, acc_e6, iso_acc_e6)
    with weighted (ece_raw_e6, ece_iso_e6) replicated."""
    from firebase_etl_spark.functions.portable_math import (
        fixed_e6_expr,
        sdiv_scaled_sql,
    )

    base = df.select(
        F.expr(p_e6_col).cast("long").alias("p"),
        F.expr(label_col).cast("long").alias("y"),
    ).filter(F.col("p").isNotNull() & F.col("y").isNotNull())
    per = (
        base.withColumn(
            "bin",
            F.least(
                F.expr(f"(p * {n_bins}) DIV 1000000"),
                F.lit(n_bins - 1),
            ).cast("int"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("p").cast("long").alias("sp"),
            F.sum("y").cast("long").alias("sy"),
        )
        # B rows, consumed by four chains below: checkpoint so the
        # corpus aggregate runs ONCE (plan audit flagged x8 re-inline)
        .localCheckpoint(eager=True)
    )
    pre = (
        per.alias("a")
        .join(
            F.broadcast(per.alias("p")),
            F.col("p.bin") <= F.col("a.bin"),
        )
        .groupBy(
            F.col("a.bin").alias("bin"),
            F.col("a.n").alias("n"),
            F.col("a.sp").alias("sp"),
            F.col("a.sy").alias("sy"),
        )
        .agg(
            F.sum("p.sy").alias("cy"),
            F.sum("p.n").alias("cn"),
        )
        # B rows, consumed TWICE (lo and hi) — materialize or the
        # prefix self-join re-inlines into both (VERDICT r9 #4 glance)
        .localCheckpoint(eager=True)
    )
    lo = pre.select(
        F.col("bin").alias("jb"),
        (F.col("cy") - F.col("sy")).alias("cy0"),
        (F.col("cn") - F.col("n")).alias("cn0"),
    )
    hi = pre.select(
        F.col("bin").alias("kb"), F.col("cy").alias("cy1"),
        F.col("cn").alias("cn1"),
    )
    ivals = (
        lo.crossJoin(F.broadcast(hi))
        .filter(F.col("jb") <= F.col("kb"))
    ).select(
        "jb", "kb",
        F.expr(
            "CAST(cy1 - cy0 AS DOUBLE) / CAST(cn1 - cn0 AS DOUBLE)"
        ).alias("mean"),
    )
    bins = per.select(F.col("bin").alias("ib"))
    inner = (
        bins.join(
            F.broadcast(ivals),
            (F.col("jb") <= F.col("ib")) & (F.col("kb") >= F.col("ib")),
        )
        .groupBy("ib", "jb")
        .agg(F.min("mean").alias("mn"))
    )
    fitted = inner.groupBy("ib").agg(
        F.expr(fixed_e6_expr("max(mn)")).alias("iso_acc_e6")
    )
    conf = sdiv_scaled_sql("sp", "n", 1, "DIV")
    acc = sdiv_scaled_sql("sy * 1000000", "n", 1, "DIV")
    rows = (
        per.join(fitted, per.bin == fitted.ib)
        .withColumn("conf_e6", F.expr(conf))
        .withColumn("acc_e6", F.expr(acc))
        # B rows, consumed TWICE (the weighted-ECE aggregate and the
        # final select) — the two-consumer tail that re-inlined the
        # whole B^3 minimax lattice into both consumers
        .localCheckpoint(eager=True)
    )
    tot = rows.agg(
        F.sum("n").alias("nt"),
        F.sum(F.abs(F.col("sy") * 1000000 - F.col("sp")))
        .alias("raw_gap"),
        F.sum(
            F.abs(
                F.col("sy") * 1000000 - F.col("iso_acc_e6") * F.col("n")
            )
        ).alias("iso_gap"),
    )
    e_raw = sdiv_scaled_sql("raw_gap", "nt", 1, "DIV")
    e_iso = sdiv_scaled_sql("iso_gap", "nt", 1, "DIV")
    return (
        rows.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n").alias("n_rows"),
            "conf_e6", "acc_e6", "iso_acc_e6",
            F.expr(e_raw).alias("ece_raw_e6"),
            F.expr(e_iso).alias("ece_iso_e6"),
        )
        .orderBy("bin")
    )


def _shuffle_partitions(spark) -> int:
    """Planned parallelism for the two-phase rank/prefix helpers.
    ``spark.sql.shuffle.partitions`` is not guaranteed numeric on every
    deployment (some AQE vendors accept 'auto'); fall back to the
    cluster's default parallelism instead of throwing at plan time."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        return int(spark.sparkContext.defaultParallelism)


def with_global_rank(
    df, order_cols, out: str = "r", total_out: str | None = None
) -> DataFrame:
    """Scale-safe EXACT global row numbering — the two-phase shape a
    distributed engine uses instead of an empty-PARTITION-BY window
    (which executes on ONE partition and is banned by the scale
    lint): repartitionByRange on the order, per-partition row_number
    (a PARTITIONED window), then add per-partition offsets collected
    as #partitions rows. The sampled range boundaries are
    plan-nondeterministic, but the produced rank depends only on the
    total order, so the OUTPUT is deterministic; the frame is
    localCheckpointed once so the offset counts and the ranked rows
    come from the same materialized partitioning.

    ``order_cols`` are Column expressions forming a TOTAL order (pass
    a unique tiebreaker). Cost: one range shuffle + one linear
    materialization — what a global sort pays anyway.

    ``total_out`` additionally attaches the TOTAL row count as a
    constant column — FREE (the offset loop already accumulates it),
    where a caller's separate count aggregate would re-scan the
    input.

    Job shape (r12): the ranked frame is ``persist``-ed and the offset
    collect is the job that MATERIALIZES it — one job where the old
    eager localCheckpoint + separate collect paid two (§2.4 job-floor
    fusion; these helpers run eagerly inside ~10 bench queries). The
    pinned partitioning the checkpoint provided is preserved: the
    offsets and every consumer read the SAME cached partitions, and a
    (cluster-only) cache-loss recompute is deterministic — the range
    partitioner object holds its sampled boundaries, and ``order_cols``
    form a total order, so re-derived ``__pid``/``__lr`` are identical."""
    spark = df.sparkSession
    n = _shuffle_partitions(spark)
    d = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lr",
            F.row_number().over(
                Window.partitionBy("__pid").orderBy(*order_cols)
            ),
        )
        .persist()
    )
    cnts = sorted(
        (int(r["__pid"]), int(r["c"]))
        for r in d.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    )
    offs, acc = [], 0
    for pid, c in cnts:
        offs.append((pid, acc))
        acc += c
    if total_out is None:
        om = F.broadcast(
            spark.createDataFrame(offs, "__pid int, __off long")
        )
    else:
        om = F.broadcast(
            spark.createDataFrame(
                [(pid, off, acc) for pid, off in offs],
                f"__pid int, __off long, {total_out} long",
            )
        )
    return (
        d.join(om, "__pid")
        .withColumn(out, F.col("__off") + F.col("__lr"))
        .drop("__pid", "__lr", "__off")
    )


def with_prefix_sum(
    df, order_cols, value_col: str, out: str = "cum",
    total_out: str | None = None, materialize_input: bool = True,
) -> DataFrame:
    """Scale-safe EXACT inclusive running sum of ``value_col`` in the
    total order given by ``order_cols`` — the two-phase sibling of
    with_global_rank, and the replacement for the O(rows^2) broadcast-
    BNLJ theta self-join (``v.s < w.s``) that prefix counts used to
    run as: on a ~10k-distinct-value histogram that join evaluates
    ~10^8 predicates for a result a linear pass produces.

    Shape: repartitionByRange on the order, per-partition running sum
    (a PARTITIONED window — the empty-PARTITION-BY form is banned by
    the scale lint), then add per-partition totals collected as
    #partitions rows and broadcast back. The sampled range boundaries
    are plan-nondeterministic but the output depends only on the
    total order. Exact int64 throughout — bit-identical to the theta-
    join form by construction.

    ``order_cols`` must form a TOTAL order (distinct histogram keys
    qualify). Cost: one range shuffle over a bounded table + one
    #partitions-row collect. The input materializes ONCE up front:
    repartitionByRange runs a separate range-boundary sampling job
    over its child, which would otherwise re-execute the upstream
    corpus scan + aggregate a second time.

    NOTE: unlike a pure plan transform, this helper runs Spark jobs
    EAGERLY at DataFrame-construction time (the input materialization
    + the bounded offset collect, which also materializes the summed
    frame's cache — see with_global_rank's job-shape note).

    ``materialize_input=False`` skips the input localCheckpoint for
    callers whose input is already materialized (checkpointed /
    persisted) or is a cheap deterministic scan: the range-boundary
    sampling job and the shuffle then each re-read that input, which
    costs less than a full eager materialization job when the input is
    a sliver or already pinned."""
    spark = df.sparkSession
    n = _shuffle_partitions(spark)
    if materialize_input:
        df = df.localCheckpoint(eager=True)
    d = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__ls",
            F.sum(value_col).over(
                Window.partitionBy("__pid")
                .orderBy(*order_cols)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("long"),
        )
        .persist()
    )
    sums = sorted(
        (int(r["__pid"]), int(r["c"]))
        for r in d.groupBy("__pid").agg(
            F.sum(value_col).cast("long").alias("c")
        ).collect()
    )
    offs, acc = [], 0
    for pid, c in sums:
        offs.append((pid, acc))
        acc += c
    # total_out: the grand total is the offset accumulator's final
    # value — attaching it as a constant column is free, where a
    # caller's separate total aggregate would cost another job
    if total_out is None:
        om = F.broadcast(
            spark.createDataFrame(offs, "__pid int, __off long")
        )
    else:
        om = F.broadcast(
            spark.createDataFrame(
                [(pid, off, acc) for pid, off in offs],
                f"__pid int, __off long, {total_out} long",
            )
        )
    return (
        d.join(om, "__pid")
        .withColumn(out, (F.col("__off") + F.col("__ls")).cast("long"))
        .drop("__pid", "__ls", "__off")
    )


#: chi-square 95th percentile at 1 dof, e6 — the SRM alarm threshold as
#: a shared integer literal (the BH_CRIT/NDCG hardcoded-quantile
#: convention: no runtime inverse CDF on either engine)
SRM_CHI2_CRIT_E6 = 3_841_459


def srm_check(
    df: DataFrame,
    group_col: str,
    unit_col: str,
) -> DataFrame:
    """Sample-ratio-mismatch health check per experiment group — the
    FIRST gate any A/B read-out must pass (Fabijan et al. 2019,
    "Diagnosing Sample Ratio Mismatch"): if the 50/50 unit split the
    deterministic arm hash promises is violated, every downstream
    metric comparison is invalid regardless of its p-value. The chi
    square statistic for an even two-arm split reduces to
    (n0 - n1)^2 / (n0 + n1) — exact integers end to end, compared at
    e6 against the hardcoded 95% critical value.

    Unit = DISTINCT unit_col (assignment is per user, so event-count
    imbalance must not masquerade as assignment imbalance); arm =
    unit % 2, the same derivation the CUPED/FDR/variant queries use.

    Scale shape: one distinct projection + one aggregate per group.
    Returns per group: (group_key, n_arm0, n_arm1, n_units, chi2_e6,
    srm_detected), ordered by group_key."""
    d = (
        df.filter(
            F.col(group_col).isNotNull() & F.col(unit_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("g"),
            F.col(unit_col).cast("long").alias("u"),
        )
        .distinct()
    )
    agg = d.groupBy("g").agg(
        F.sum((F.col("u") % 2 == 0).cast("long")).alias("n_arm0"),
        F.sum((F.col("u") % 2 == 1).cast("long")).alias("n_arm1"),
    )
    return (
        agg.select(
            F.col("g").alias("group_key"),
            "n_arm0",
            "n_arm1",
            (F.col("n_arm0") + F.col("n_arm1")).alias("n_units"),
            F.expr(
                "CASE WHEN n_arm0 + n_arm1 > 0 THEN"
                " ((n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000000)"
                " DIV (n_arm0 + n_arm1) ELSE 0 END"
            ).alias("chi2_e6"),
        )
        .withColumn(
            "srm_detected",
            F.col("chi2_e6") > F.lit(SRM_CHI2_CRIT_E6),
        )
        .orderBy("group_key")
    )


def simpson_audit(
    df: DataFrame,
    stratum_col: str,
    arm_expr: str,
    value_c_expr: str,
) -> DataFrame:
    """Simpson's-paradox audit (Simpson 1951; the aggregation trap
    every metrics review eventually steps into): does the sign of the
    A-vs-B mean difference REVERSE when the comparison is stratified?
    The overall pooled comparison and every per-stratum comparison are
    published side by side with an explicit ``reversed`` flag.

    Sign arithmetic is EXACT and overflow-free: compare the truncating
    quotients first (sum DIV n), and only on a quotient tie compare the
    cross-multiplied REMAINDERS (r < n, so r_a * n_b < n_a * n_b — in
    int64 to ~3e9 rows per stratum, vs the naive sum*n cross-product
    that the ×10 probe fixture already overflows). No float division
    anywhere near the comparison; display means are truncating cent
    divisions.

    Scale shape: ONE map-side-combinable aggregate per stratum + a
    broadcast of the k-row totals. Returns per stratum: (stratum, n_a,
    n_b, mean_a_cents, mean_b_cents, sign_stratum, sign_overall,
    reversed), ordered by stratum."""
    base = df.select(
        F.col(stratum_col).alias("s"),
        F.expr(arm_expr).cast("int").alias("arm"),
        F.expr(value_c_expr).cast("long").alias("v"),
    ).filter(
        F.col("s").isNotNull()
        & F.col("arm").isNotNull()
        & F.col("v").isNotNull()
    )
    per = base.groupBy("s").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long").alias("n_a"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 1, F.col("v"))), F.lit(0)
        ).cast("long").alias("sum_a"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long").alias("n_b"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 0, F.col("v"))), F.lit(0)
        ).cast("long").alias("sum_b"),
    ).localCheckpoint(eager=True)  # stratum-count-sized
    tot = per.agg(
        F.sum("n_a").cast("long").alias("tn_a"),
        F.sum("sum_a").cast("long").alias("ts_a"),
        F.sum("n_b").cast("long").alias("tn_b"),
        F.sum("sum_b").cast("long").alias("ts_b"),
    )
    sign = (
        "CASE WHEN ({sa} DIV {na}) > ({sb} DIV {nb}) THEN 1"
        " WHEN ({sa} DIV {na}) < ({sb} DIV {nb}) THEN -1"
        " WHEN ({sa} % {na}) * {nb} > ({sb} % {nb}) * {na} THEN 1"
        " WHEN ({sa} % {na}) * {nb} < ({sb} % {nb}) * {na} THEN -1"
        " ELSE 0 END"
    )
    s_str = sign.format(sa="sum_a", nb="n_b", sb="sum_b", na="n_a")
    s_tot = sign.format(sa="ts_a", nb="tn_b", sb="ts_b", na="tn_a")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("s").alias("stratum"),
            "n_a",
            "n_b",
            F.expr("CASE WHEN n_a > 0 THEN sum_a DIV n_a END")
            .alias("mean_a_cents"),
            F.expr("CASE WHEN n_b > 0 THEN sum_b DIV n_b END")
            .alias("mean_b_cents"),
            F.expr(
                f"CASE WHEN n_a > 0 AND n_b > 0 THEN {s_str} END"
            ).cast("int").alias("sign_stratum"),
            F.expr(s_tot).cast("int").alias("sign_overall"),
            F.expr(
                f"CASE WHEN n_a > 0 AND n_b > 0"
                f" THEN ({s_str}) * ({s_tot}) < 0 ELSE FALSE END"
            ).alias("reversed"),
        )
        .orderBy("stratum")
    )


def cmh_test(
    df: DataFrame,
    stratum_col: str,
    arm_expr: str,
    outcome_expr: str,
) -> DataFrame:
    """Cochran-Mantel-Haenszel test of a binary arm/outcome association
    POOLED ACROSS STRATA (Mantel & Haenszel 1959) — the inferential
    companion to simpson_audit: the audit shows WHERE the signs sit,
    CMH says whether the common association survives stratification at
    all (each stratum contributes its own 2x2 table; confounding
    through the stratum is conditioned away).

        CMH = (sum_i (a_i - E_i))^2 / sum_i V_i,
        E_i = n1_i m1_i / n_i,
        V_i = n1_i n0_i m1_i m0_i / (n_i^2 (n_i - 1))

    (no continuity correction — stated convention, mirrored exactly).
    E and V evaluate through IDENTICAL IEEE double trees on both
    engines (exact integer inputs) and quantize ONCE at e3; the
    statistic is then pure integer arithmetic — cmh_e6 =
    1000 * (sum d_e3)^2 DIV (sum v_e3), compared against the hardcoded
    95% chi-square(1) critical value. Bound: |sum d_e3| < 3e9 keeps
    the square in int64 (fixture sums are ~1e7; a 100 TB deployment
    shifts to e0 quantization, same tree).

    Scale shape: ONE aggregate per stratum; everything after is
    k-row. Returns per stratum: (stratum, n, n_arm1, n_out1, a_count,
    e_e3, v_e3, d_e3) with the pooled (cmh_e6, significant) repeated
    per row (the kcenter convention), ordered by stratum."""
    base = df.select(
        F.col(stratum_col).alias("s"),
        F.expr(arm_expr).cast("int").alias("arm"),
        F.expr(outcome_expr).cast("int").alias("out"),
    ).filter(
        F.col("s").isNotNull()
        & F.col("arm").isNotNull()
        & F.col("out").isNotNull()
    )
    per = base.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("arm").cast("long").alias("n1"),
        F.sum("out").cast("long").alias("m1"),
        F.sum(F.col("arm") * F.col("out")).cast("long").alias("a"),
    )
    # strata with n <= 1 carry zero information (V undefined) and are
    # excluded from BOTH the sums and the report — stated, not silent
    per = per.filter(F.col("n") > 1).localCheckpoint(eager=True)
    e_e3 = (
        "CAST(round((CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE)"
        " / CAST(n AS DOUBLE)) * 1000.0 + 1e-9, 0) AS BIGINT)"
    )
    v_e3 = (
        "CAST(round((CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)"
        " * CAST(m1 AS DOUBLE) * CAST(n - m1 AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        " * CAST(n - 1 AS DOUBLE))) * 1000.0 + 1e-9, 0) AS BIGINT)"
    )
    scored = per.select(
        F.col("s").alias("stratum"),
        "n",
        F.col("n1").alias("n_arm1"),
        F.col("m1").alias("n_out1"),
        F.col("a").alias("a_count"),
        F.expr(e_e3).alias("e_e3"),
        F.expr(v_e3).alias("v_e3"),
        (F.col("a") * 1000 - F.expr(e_e3)).alias("d_e3"),
    ).localCheckpoint(eager=True)  # stratum-count-sized
    cmh = (
        "CASE WHEN sum_v <= 0 THEN 0"
        " WHEN abs(sum_d) < 3000000"
        " THEN (1000 * sum_d * sum_d) DIV sum_v"
        " ELSE ((sum_d DIV 1000) * (sum_d DIV 1000) DIV sum_v)"
        " * 1000000000"
        " + (((sum_d DIV 1000) * (sum_d DIV 1000) % sum_v)"
        " * 1000000000) DIV sum_v END"
    )
    tot = scored.agg(
        F.sum("d_e3").cast("long").alias("sum_d"),
        F.sum("v_e3").cast("long").alias("sum_v"),
    ).select(F.expr(cmh).cast("long").alias("cmh_e6"))
    return (
        scored.crossJoin(F.broadcast(tot))
        .withColumn(
            "significant", F.col("cmh_e6") > F.lit(SRM_CHI2_CRIT_E6)
        )
        .orderBy("stratum")
    )


#: chi-square 95th percentiles at 1..9 dof, e6 — Kruskal-Wallis crit
#: values as shared integer literals (textbook table; the BH_CRIT /
#: SRM convention: no runtime inverse CDF on either engine)
KW_CHI2_CRIT_E6: dict[int, int] = {
    1: 3_841_459, 2: 5_991_465, 3: 7_814_728, 4: 9_487_729,
    5: 11_070_498, 6: 12_591_587, 7: 14_067_140, 8: 15_507_313,
    9: 16_918_978,
}


def kruskal_wallis_report(
    df: DataFrame,
    group_col: str,
    score,
) -> DataFrame:
    """Exact tie-corrected Kruskal-Wallis rank test (Kruskal & Wallis
    1952) of an INTEGER score across k groups — the k-group extension
    of binary_auc_report's Mann-Whitney rank algebra, and the
    nonparametric complement to the Welch-z family: does ANY group's
    score distribution sit apart, with no normality assumption.

        H   = 3 * sum_g (R2_g - n_g (N+1))^2 / n_g / (N (N+1))
        H_c = H / C,  C = 1 - sum_s (t_s^3 - t_s) / (N^3 - N)

    where R2_g is TWICE the tied-midrank sum (an exact integer:
    tied block of size t at cumulative offset c contributes
    c_{g,s} * (2c + t + 1)).

    All-integer with magnitude gates (the gains-table convention,
    each mirrored verbatim in the oracle): the per-group square drops
    to a 2^10-shifted form past |q| = 3e9; the tie ratio drops to a
    2^20-shifted form past N^3 - N = 9e9; every division that could
    overflow uses the overflow-free (a DIV m)*b + ((a%m)*b) DIV m
    split. Exact-int64 domain N <~ 1.7e6 rows — the binding term is
    H_e6's remainder product (sw % (nn*(nn+1))) * 3e6, which can
    approach nn^2 * 3e6 and exceeds 2^63 once N > ~1.75e6, slightly
    before N^3 itself overflows; past that the gated branches bound
    relative error below the e6 resolution but the remainder multiply
    would need the same 2^k-shift gate before trusting larger N.

    Scale shape: one scan -> (group, score) histogram; prefix counts
    over the bounded score histogram via the two-phase
    with_prefix_sum (linear in distinct scores — replaced the
    O(codomain^2) broadcast-BNLJ theta self-join per VERDICT r9 #2;
    exact integers, so bit-identical). Returns one row per group:
    (group_key, n_rows, r2_sum, q) with the pooled (n_total, n_groups,
    h_e6, tie_t, c_e9, hc_e6, significant) repeated per row, ordered
    by group_key. significant compares hc_e6 against the hardcoded
    95% chi-square(k-1) literal (k <= 10)."""
    base = df.select(
        F.col(group_col).alias("g"),
        score.cast("long").alias("s"),
    ).filter(F.col("g").isNotNull() & F.col("s").isNotNull())
    ghist = base.groupBy("g", "s").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=True)  # k x codomain sized; 2 consumers
    # the value histogram derives from ghist, so the corpus is
    # scanned ONCE (it used to be a second base aggregate)
    hist = ghist.groupBy("s").agg(
        F.sum("c").cast("long").alias("t")
    )  # score-codomain-sized
    cums = (
        with_prefix_sum(hist, [F.col("s")], "t", out="cum_incl")
        .select(
            "s", "t",
            (F.col("cum_incl") - F.col("t")).cast("long")
            .alias("cum_before"),
        )
        .localCheckpoint(eager=True)  # codomain-sized; 2 consumers
    )
    per_g = (
        ghist.join(F.broadcast(cums), "s")
        .groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n_g"),
            F.sum(
                F.col("c")
                * (F.lit(2) * F.col("cum_before") + F.col("t") + F.lit(1))
            ).cast("long").alias("r2"),
        )
        .localCheckpoint(eager=True)  # k rows
    )
    tot = per_g.agg(
        F.sum("n_g").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
    ).crossJoin(
        cums.agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).cast("long").alias("tie_t")
        )
    ).localCheckpoint(eager=True)  # 1 row
    # per-group w = q^2 / n_g, gated at |q| = 3e9 (2^10 shift past it)
    w_expr = (
        "CASE WHEN abs(q) < 3000000000"
        " THEN (q * q) DIV n_g"
        " ELSE ((q DIV 1024) * (q DIV 1024) DIV n_g) * 1048576"
        " + (((q DIV 1024) * (q DIV 1024) % n_g) * 1048576) DIV n_g"
        " END"
    )
    scored = per_g.crossJoin(F.broadcast(tot)).select(
        F.col("g").alias("group_key"),
        F.col("n_g").alias("n_rows"),
        F.col("r2").alias("r2_sum"),
        (F.col("r2") - F.col("n_g") * (F.col("nn") + 1)).alias("q"),
        "n_g", "nn", "k", "tie_t",
    ).withColumn("w", F.expr(w_expr))
    sums = scored.groupBy("nn", "k", "tie_t").agg(
        F.sum("w").cast("long").alias("sw")
    )
    # H_e6 = 3e6 * SW / (N (N+1)) via the overflow-free split
    h_e6 = (
        "(sw DIV (nn * (nn + 1))) * 3000000"
        " + ((sw % (nn * (nn + 1))) * 3000000) DIV (nn * (nn + 1))"
    )
    # C_e9 = 1e9 - 1e9 * T / (N^3 - N): exact while T * 1e9 fits int64
    # (T < 9e9); past that BOTH sides shift by 2^20 (T >= 9e9 makes the
    # shifted T >= 8.5e3, so the shift's relative error stays ~2^-20 —
    # gate on T, not on N^3: gating on the denominator zeroed small-T
    # corrections, caught by the sf0.01 smoke)
    c_e9 = (
        "CASE WHEN nn * nn * nn - nn <= 0 THEN 1000000000"
        " WHEN tie_t < 9000000000"
        " THEN 1000000000 - (tie_t * 1000000000)"
        " DIV (nn * nn * nn - nn)"
        " ELSE 1000000000 - ((tie_t DIV 1048576) * 1000000000)"
        " DIV ((nn * nn * nn - nn) DIV 1048576) END"
    )
    # Hc_e6 = 1e9 * H_e6 / C_e9 via the split (degenerate all-tied
    # corpora have C = 0: report NULL, the statistic is undefined)
    hc_e6 = (
        "CASE WHEN c_e9 <= 0 THEN CAST(NULL AS BIGINT)"
        " ELSE (h_e6 DIV c_e9) * 1000000000"
        " + ((h_e6 % c_e9) * 1000000000) DIV c_e9 END"
    )
    crit_case = "CASE " + " ".join(
        f"WHEN k - 1 = {d} THEN {c}"
        for d, c in sorted(KW_CHI2_CRIT_E6.items())
    ) + " ELSE NULL END"
    pooled = (
        sums.withColumn("h_e6", F.expr(h_e6).cast("long"))
        .withColumn("c_e9", F.expr(c_e9).cast("long"))
        .withColumn("hc_e6", F.expr(hc_e6).cast("long"))
        .withColumn(
            "significant",
            F.expr(f"hc_e6 > ({crit_case})"),
        )
        .select(
            F.col("nn").alias("n_total"),
            F.col("k").alias("n_groups"),
            "tie_t", "h_e6", "c_e9", "hc_e6", "significant",
        )
    )
    return (
        scored.select("group_key", "n_rows", "r2_sum", "q")
        .crossJoin(F.broadcast(pooled))
        .orderBy("group_key")
    )


def spearman_rho_sql() -> str:
    """Spearman rho as ONE shared SQL expression over exact integer
    rank-moment columns (n, sx, sy, sxx, syy, sxy) — evaluated
    verbatim by Spark and DuckDB so every double op is the identical
    correctly-rounded IEEE tree (the welch_z_sql convention).
    NULL (as BIGINT e6) when either axis is constant."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    nd = "CAST(n AS DOUBLE)"
    num = (
        f"({nd} * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    dx = (
        f"({nd} * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    dy = (
        f"({nd} * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    return (
        f"CASE WHEN ({dx}) <= 0 OR ({dy}) <= 0 THEN CAST(NULL AS BIGINT)"
        f" ELSE {fixed_e6_expr(f'{num} / sqrt(({dx}) * ({dy}))')} END"
    )


def kendall_tau_sql() -> str:
    """Kendall tau-b as ONE shared SQL expression over exact integer
    columns (conc, disc, n, n1d, n2d — tie margins DOUBLED) —
    identical text on both engines (the welch_z_sql convention)."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    num = (
        "(CAST(2 AS DOUBLE)"
        " * (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE)))"
    )
    d1 = (
        "(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)"
        " - CAST(n1d AS DOUBLE))"
    )
    d2 = (
        "(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)"
        " - CAST(n2d AS DOUBLE))"
    )
    return (
        f"CASE WHEN ({d1}) <= 0 OR ({d2}) <= 0 THEN CAST(NULL AS BIGINT)"
        f" ELSE {fixed_e6_expr(f'{num} / sqrt(({d1}) * ({d2}))')} END"
    )


def wilcoxon_z_sql() -> str:
    """Wilcoxon signed-rank normal-approximation z (e6 BIGINT) as ONE
    shared SQL expression over exact integer columns (n, w2p, tie_t) —
    identical text on both engines (the welch_z_sql convention)."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    num = (
        "(CAST(w2p AS DOUBLE) - CAST(n AS DOUBLE)"
        " * CAST(n + 1 AS DOUBLE) / CAST(2 AS DOUBLE))"
    )
    var = (
        "((CAST(2 AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)"
        " * CAST(2 * n + 1 AS DOUBLE) - CAST(tie_t AS DOUBLE))"
        " / CAST(12 AS DOUBLE))"
    )
    return (
        f"CASE WHEN n < 2 OR ({var}) <= 0 THEN CAST(NULL AS BIGINT)"
        f" ELSE {fixed_e6_expr(f'{num} / sqrt({var})')} END"
    )


def dispersion_z_sql() -> str:
    """One-sided dispersion-test z (e6 BIGINT) as ONE shared SQL
    expression over (d_e6, n) — identical text on both engines."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    return (
        "CASE WHEN d_e6 IS NULL THEN CAST(NULL AS BIGINT) ELSE "
        + fixed_e6_expr(
            "(CAST(d_e6 - 1000000 AS DOUBLE) / CAST(1000000 AS DOUBLE))"
            " * sqrt(CAST(n - 1 AS DOUBLE) / CAST(2 AS DOUBLE))"
        )
        + " END"
    )


def spearman_corr_report(df: DataFrame, x, y) -> DataFrame:
    """Exact tie-aware Spearman rank correlation between two INTEGER
    columns — the monotone-association read-out Pearson can't give on
    heavy-tailed pipeline metrics (rho is Pearson on AVERAGE ranks, so
    it is outlier-immune and scale-free). Completes the rank-algebra
    family: binary AUC (2 groups), Kruskal-Wallis (k groups), Spearman
    (two continuous axes).

    All-integer rank construction: per axis, the distinct-value
    histogram's strictly-smaller prefix counts come from the two-phase
    with_prefix_sum (linear, never O(codomain^2)); a tied block of
    size t at cumulative offset c has twice-average-rank
    r2 = 2c + t + 1, an exact integer. The joint (x, y) histogram
    joins both rank tables and the five rank moments (S_x, S_y, S_xx,
    S_yy, S_xy over the 2x ranks) are exact int64 sums while
    4*N^3 < 2^63 — N <~ 1.3e6 rows; past that pre-bucket the axis or
    add the KW 2^k-shift gate. rho = (n*S_xy - S_x*S_y) /
    sqrt((n*S_xx - S_x^2)(n*S_yy - S_y^2)) leaves the integers through
    ONE shared double expression (products up to ~4N^4 need doubles;
    every op is correctly-rounded IEEE on identical trees), quantized
    once at e6. NULL when either axis is constant.

    Scale shape: one scan -> per-axis histograms (map-side
    combinable) + joint histogram; rank joins are hash joins on the
    distinct-value tables (codomain- or corpus-distinct-sized, NOT
    broadcast — an axis can have millions of distincts). Returns one
    row: (n_rows, sum_rxy2, rho_e6)."""
    base = df.select(
        x.cast("long").alias("x"), y.cast("long").alias("y")
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    # ONE corpus scan: the joint histogram (distinct-pair bounded)
    # materializes once and both axis histograms derive from it
    joint = base.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=True)
    hx = joint.groupBy("x").agg(F.sum("c").cast("long").alias("t"))
    rx = with_prefix_sum(hx, [F.col("x")], "t", out="ci").select(
        "x",
        (F.lit(2) * F.col("ci") - F.col("t") + 1).cast("long").alias("rx2"),
    )
    hy = joint.groupBy("y").agg(F.sum("c").cast("long").alias("t"))
    ry = with_prefix_sum(hy, [F.col("y")], "t", out="ci").select(
        "y",
        (F.lit(2) * F.col("ci") - F.col("t") + 1).cast("long").alias("ry2"),
    )
    j = joint.join(rx, "x").join(ry, "y")
    m = j.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("rx2")).cast("long").alias("sx"),
        F.sum(F.col("c") * F.col("ry2")).cast("long").alias("sy"),
        F.sum(F.col("c") * F.col("rx2") * F.col("rx2"))
        .cast("long").alias("sxx"),
        F.sum(F.col("c") * F.col("ry2") * F.col("ry2"))
        .cast("long").alias("syy"),
        F.sum(F.col("c") * F.col("rx2") * F.col("ry2"))
        .cast("long").alias("sxy"),
    )
    return m.select(
        F.col("n").alias("n_rows"),
        F.col("sxy").alias("sum_rxy2"),
        F.expr(spearman_rho_sql()).cast("long").alias("rho_e6"),
    )


def kendall_tau_report(df: DataFrame, x, y) -> DataFrame:
    """Exact Kendall tau-b between two BOUNDED-CODOMAIN integer columns
    — the concordance companion to Spearman, computed WITHOUT pair
    enumeration: over the joint (x, y) contingency histogram (|X|*|Y|
    cells — bounded by the codomains, NOT the corpus), each cell's
    concordant/discordant mass is its count times the total count in
    cells strictly smaller/greater on y among strictly-smaller x. The
    cell-lattice pass is one broadcast theta self-join over the
    bounded table (the TRUE bounded-spine case — unlike a distinct-
    value histogram, the cell count here cannot grow past
    |X codomain| * |Y codomain| at any corpus size), so exact tau on
    billions of rows costs one corpus scan plus lattice work.

    All-integer: C, D, the tie margins n1 = sum_x t_x(t_x-1) and
    n2 (kept DOUBLED to avoid /2), and n0 = n(n-1) are exact int64
    while n < ~3e9 and C <= n^2 < 2^63 (n <~ 3e9 balanced). tau_b =
    2(C - D) / sqrt((n0 - n1)(n0 - n2)) leaves the integers through
    one shared double expression, quantized once at e6; NULL when
    either axis is constant. Returns one row: (n_rows, concordant,
    discordant, tau_b_e6)."""
    base = df.select(
        x.cast("long").alias("x"), y.cast("long").alias("y")
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    cells = (
        base.groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # codomain-bounded; 4 consumers
    )
    # enforce the bounded-codomain precondition at the join site, not
    # just in prose: a caller passing a near-unique axis would make the
    # broadcast + O(cells^2) lattice explode. The count is a cheap scan
    # of the already-checkpointed cell table.
    n_cells = cells.count()
    if n_cells > 100_000:
        raise ValueError(
            f"kendall_tau_report: {n_cells} joint cells exceed the "
            "bounded-codomain limit (100k); bucket or discretize the "
            "axes first — the O(cells^2) lattice join is only safe on "
            "small codomains"
        )
    # one bounded BNLJ: for each cell, concordant mass = counts at
    # (x' < x, y' < y), discordant = (x' < x, y' > y)
    lat = (
        cells.alias("w")
        .join(
            F.broadcast(cells.alias("v")),
            F.col("v.x") < F.col("w.x"),
            "left",
        )
        .groupBy(F.col("w.x").alias("x"), F.col("w.y").alias("y"),
                 F.col("w.c").alias("c"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("v.y") < F.col("w.y"), F.col("v.c"))
                ), F.lit(0)
            ).cast("long").alias("pc"),
            F.coalesce(
                F.sum(
                    F.when(F.col("v.y") > F.col("w.y"), F.col("v.c"))
                ), F.lit(0)
            ).cast("long").alias("pd"),
        )
    )
    cd = lat.agg(
        F.sum(F.col("c") * F.col("pc")).cast("long").alias("conc"),
        F.sum(F.col("c") * F.col("pd")).cast("long").alias("disc"),
    )
    tx = cells.groupBy("x").agg(F.sum("c").cast("long").alias("t"))
    ty = cells.groupBy("y").agg(F.sum("c").cast("long").alias("t"))
    # n == sum of x-margins, so one agg over tx yields (n, n1d) — one
    # fewer 1-row aggregate exchange (the cramers_v totals pattern)
    margins = tx.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("t") * (F.col("t") - 1)).cast("long").alias("n1d"),
    ).crossJoin(F.broadcast(ty.agg(
        F.sum(F.col("t") * (F.col("t") - 1)).cast("long").alias("n2d")
    )))
    return cd.crossJoin(F.broadcast(margins)).select(
        F.col("n").alias("n_rows"),
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.expr(kendall_tau_sql()).cast("long").alias("tau_b_e6"),
    )


def wilcoxon_signed_rank_report(df: DataFrame, d_col) -> DataFrame:
    """Exact tie-aware Wilcoxon signed-rank test over INTEGER paired
    differences — the paired complement to the Mann-Whitney/KW rank
    family: did the per-unit metric SHIFT between two paired
    conditions (early vs late half, before vs after a change), with no
    normality assumption. Zero differences drop (the classic Wilcoxon
    convention); |d| ranks with tied blocks at average rank.

    All-integer: the |d| histogram's prefix counts come from the
    two-phase with_prefix_sum; twice-average-rank r2 = 2c + t + 1 is
    exact; W2+/W2- (twice the signed rank sums) and the tie term
    T = sum(t^3 - t) are exact int64 while 4n^3 < 2^63 (n <~ 1.3e6
    nonzero pairs — past that the variance term needs the KW shift
    gate). The normal approximation z = (W2+ - n(n+1)/2) /
    sqrt((2n(n+1)(2n+1) - T) / 12) is one shared double expression
    over exact integers, quantized once at e6; significance compares
    |z_e6| against the hardcoded two-sided 5% literal 1959964.
    Returns one row: (n_nonzero, w2_plus, w2_minus, tie_t, z_e6,
    significant)."""
    base = df.select(d_col.cast("long").alias("d")).filter(
        F.col("d").isNotNull() & (F.col("d") != 0)
    )
    h = base.groupBy(F.abs(F.col("d")).alias("a")).agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum((F.col("d") > 0).cast("long")).cast("long").alias("tp"),
    )
    r = with_prefix_sum(h, [F.col("a")], "t", out="ci").select(
        "a", "t", "tp",
        (F.lit(2) * F.col("ci") - F.col("t") + 1).cast("long").alias("r2"),
    )
    agg = r.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("tp") * F.col("r2")).cast("long").alias("w2p"),
        F.sum((F.col("t") - F.col("tp")) * F.col("r2"))
        .cast("long").alias("w2m"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long").alias("tie_t"),
    )
    z = wilcoxon_z_sql()
    return agg.select(
        F.col("n").alias("n_nonzero"),
        F.col("w2p").alias("w2_plus"),
        F.col("w2m").alias("w2_minus"),
        "tie_t",
        F.expr(z).cast("long").alias("z_e6"),
        F.expr(
            f"CASE WHEN ({z}) IS NULL THEN NULL"
            f" ELSE abs(({z})) > 1959964 END"
        ).alias("significant"),
    )


def brown_forsythe_report(
    df: DataFrame, group_col: str, score
) -> DataFrame:
    """Brown-Forsythe robust variance-equality test (Brown & Forsythe
    1974 — Levene's test on deviations from the MEDIAN) of an INTEGER
    score across k groups: does any group's SPREAD sit apart — the
    scale complement to Kruskal-Wallis's location test, and the
    honest precondition check before pooling variances anywhere.

    Determinism: per-group 2*median is an exact integer on both
    engines (for integer data, interpolated percentile(0.5) is a
    half-integer whose every IEEE op is exact, so 2x casts exactly);
    deviations z = |2v - 2m| are exact integers, and the per-group
    moments (n_g, Sz_g, Szz_g) are exact int64 sums (z <= 2*|score|
    range; Szz needs n_g * (2 range)^2 < 2^63). The between/within
    sums of squares use the EXACT integer floor(Sz_g^2/n_g) although
    the square exceeds int64 — the quotient-remainder identity
    sz^2/n = (sz DIV n)*sz + ((sz % n)*sz)/n keeps every intermediate
    under 2^63 while n_g * Sz_g < 2^63 (no doubles, no rounding; the
    <= 1-unit floor slack per group is clamped at SSB >= 0), then
    F = [(N-k) SSB] / [(k-1) SSW] runs through the
    overflow-free split with the KW 2^20-shift gate. Significance uses
    the large-df2 equivalence F(k-1, N-k) -> chi2(k-1)/(k-1) against
    the shared KW_CHI2_CRIT_E6 literals (documented approximation;
    exact enough for N in the thousands). Returns one row per group:
    (group_key, n_rows, med2, z_sum, zz_sum) with pooled
    (n_total, n_groups, f_e6, significant) replicated."""
    base = df.select(
        F.col(group_col).alias("g"), score.cast("long").alias("v")
    ).filter(F.col("g").isNotNull() & F.col("v").isNotNull())
    med = (
        base.groupBy("g")
        .agg(
            F.expr("CAST(2 * percentile(v, 0.5) AS BIGINT)").alias("m2")
        )
        .localCheckpoint(eager=True)  # k rows; joined back + output
    )
    z = base.join(F.broadcast(med), "g").select(
        "g", "m2", F.abs(F.lit(2) * F.col("v") - F.col("m2")).alias("z")
    )
    per_g = (
        z.groupBy("g", "m2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("z").cast("long").alias("sz"),
            F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
        )
        # EXACT integer floor(Sz_g^2 / n_g) although Sz_g^2 exceeds
        # int64: with a = sz DIV n_g, r = sz % n_g the identity
        # sz^2/n = a*sz + r*sz/n keeps every intermediate < 2^63 while
        # n_g * sz < 2^63 (documented bound; no doubles, no rounding)
        .withColumn(
            "q",
            F.expr(
                "(sz DIV n_g) * sz + ((sz % n_g) * sz) DIV n_g"
            ).cast("long"),
        )
        .localCheckpoint(eager=True)  # k rows; 2 consumers
    )
    tot = per_g.agg(
        F.sum("n_g").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("sz").cast("long").alias("szt"),
        F.sum("szz").cast("long").alias("szzt"),
        F.sum("q").cast("long").alias("qt"),
    ).select(
        "nn", "k",
        # SSB = sum_g q_g - floor(SZ^2/N) (same exact split), clamped
        # at 0 because the per-group floors can undershoot the pooled
        # one by a few units when SSB is ~0; SSW = SZZ - sum_g q_g
        F.expr(
            "GREATEST(qt - ((szt DIV nn) * szt"
            " + ((szt % nn) * szt) DIV nn), 0)"
        ).cast("long").alias("ssb"),
        F.expr("szzt - qt").cast("long").alias("ssw"),
    )
    crit_case = "CASE " + " ".join(
        f"WHEN k - 1 = {d} THEN {c}"
        for d, c in sorted(KW_CHI2_CRIT_E6.items())
    ) + " ELSE NULL END"
    # ratio_e6 = 1e6 * SSB / SSW via the overflow-free split, gated at
    # SSW >= 9e12 by the KW 2^20 shift; F_e6 = ratio_e6 * (N-k) DIV (k-1)
    ratio = (
        "CASE WHEN ssw < 9000000000000"
        " THEN (ssb DIV ssw) * 1000000 + ((ssb % ssw) * 1000000) DIV ssw"
        " ELSE ((ssb DIV 1048576) * 1000000) DIV (ssw DIV 1048576) END"
    )
    pooled = tot.select(
        F.col("nn").alias("n_total"),
        F.col("k").alias("n_groups"),
        F.col("k"),
        F.expr(
            f"CASE WHEN ssw <= 0 OR k < 2 THEN CAST(NULL AS BIGINT)"
            f" ELSE (({ratio}) * (nn - k)) DIV (k - 1) END"
        ).cast("long").alias("f_e6"),
    ).select(
        "n_total", "n_groups", "f_e6",
        F.expr(
            f"CASE WHEN f_e6 IS NULL THEN NULL"
            f" ELSE f_e6 * (k - 1) > ({crit_case}) END"
        ).alias("significant"),
    )
    return (
        per_g.select(
            F.col("g").alias("group_key"),
            F.col("n_g").alias("n_rows"),
            "m2", F.col("sz").alias("z_sum"), F.col("szz").alias("zz_sum"),
        )
        .crossJoin(F.broadcast(pooled))
        .orderBy("group_key")
    )


def dispersion_index_report(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Index-of-dispersion (variance-to-mean ratio) of per-hour event
    counts per group — the overdispersion gate for anything that
    models arrivals as Poisson (anomaly thresholds, rate CIs,
    power calculations): D = s^2 / mean is 1 under Poisson; D >> 1
    (bursty users, bot storms) silently invalidates every
    Poisson-based alarm downstream.

    All-integer: per (group, hour) counts c are exact; n = observed
    hours, S = sum c, SS = sum c^2 are exact int64. d_e6 = 1e6 *
    (n*SS - S^2) / (S*(n-1)) runs through the overflow-free split
    gated at (n*SS - S^2) >= 9e12 by the 2^10 shift (n*SS grows with
    burst height squared). The one-sided normal test z = (D - 1) *
    sqrt((n-1)/2) is one shared double expression over d_e6,
    quantized once at e6; overdispersed compares z_e6 against the
    hardcoded one-sided 5% literal 1644854. Hours with zero events are
    NOT in the spine (gap-free fixtures; for sparse groups gap-fill
    upstream — documented). Returns one row per group:
    (group_key, n_hours, n_events, d_e6, z_e6, overdispersed)."""
    base = df.select(
        F.col(group_col).alias("g"),
        F.date_trunc("hour", F.col(ts_col)).alias("h"),
    ).filter(F.col("g").isNotNull() & F.col(ts_col).isNotNull())
    hourly = base.groupBy("g", "h").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_g = hourly.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    dnum = "(n * ss - s * s)"
    dden = "(s * (n - 1))"
    d_e6 = (
        f"CASE WHEN n < 2 OR s <= 0 THEN CAST(NULL AS BIGINT)"
        f" WHEN {dnum} < 9000000000000"
        f" THEN ({dnum} * 1000000) DIV {dden}"
        f" ELSE (({dnum} DIV 1024) * 1000000) DIV ({dden} DIV 1024) END"
    )
    z = dispersion_z_sql()
    return (
        per_g.withColumn("d_e6", F.expr(d_e6).cast("long"))
        .withColumn("z_e6", F.expr(z).cast("long"))
        .select(
            F.col("g").alias("group_key"),
            F.col("n").alias("n_hours"),
            F.col("s").alias("n_events"),
            "d_e6", "z_e6",
            F.expr(
                "CASE WHEN z_e6 IS NULL THEN NULL"
                " ELSE z_e6 > 1644854 END"
            ).alias("overdispersed"),
        )
        .orderBy("group_key")
    )


def mcnemar_report(df: DataFrame, before_col, after_col) -> DataFrame:
    """McNemar paired-binary test (McNemar 1947) over per-unit 0/1
    outcomes in two paired conditions — the PAIRED complement to the
    SRM/chi-square family: did units FLIP (did users who didn't
    purchase early start purchasing late), which only the discordant
    cells b = (1,0) and c = (0,1) can answer; concordant cells carry
    no information and a two-sample test on the margins silently
    wastes the pairing.

    All-integer: the 2x2 paired table counts are exact; chi2_e6 =
    (b-c)^2 * 1e6 DIV (b+c) (no continuity correction — stated; the
    numerator is a square so truncating DIV == flooring //), NULL
    when b + c = 0 (no discordant pairs — the test is undefined).
    Exact while (b-c)^2 * 1e6 < 2^63 (|b-c| <~ 3e6 discordant gap —
    past that shift both by 2^10, the KW gate). significant compares
    against the shared chi-square(1) literal SRM_CHI2_CRIT_E6.
    Returns one row: (n_units, n_both, n_neither, n_before_only,
    n_after_only, chi2_e6, significant)."""
    base = df.select(
        before_col.cast("int").alias("x"), after_col.cast("int").alias("y")
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(((F.col("x") == 1) & (F.col("y") == 1)).cast("long"))
        .cast("long").alias("n_both"),
        F.sum(((F.col("x") == 0) & (F.col("y") == 0)).cast("long"))
        .cast("long").alias("n_neither"),
        F.sum(((F.col("x") == 1) & (F.col("y") == 0)).cast("long"))
        .cast("long").alias("b"),
        F.sum(((F.col("x") == 0) & (F.col("y") == 1)).cast("long"))
        .cast("long").alias("c"),
    )
    chi2 = (
        "CASE WHEN b + c = 0 THEN CAST(NULL AS BIGINT)"
        " ELSE ((b - c) * (b - c) * 1000000) DIV (b + c) END"
    )
    return agg.select(
        "n_units", "n_both", "n_neither",
        F.col("b").alias("n_before_only"),
        F.col("c").alias("n_after_only"),
        F.expr(chi2).cast("long").alias("chi2_e6"),
        F.expr(
            f"CASE WHEN b + c = 0 THEN NULL"
            f" ELSE ({chi2}) > {SRM_CHI2_CRIT_E6} END"
        ).alias("significant"),
    )


def runs_z_sql() -> str:
    """Wald-Wolfowitz runs-test z (e6 BIGINT) as ONE shared SQL
    expression over exact integer columns (r, n1, n0) — identical text
    on both engines (the welch_z_sql convention). NULL when either
    sign class is empty or the variance degenerates."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    nd = "(CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE))"
    p = "(CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))"
    mu = f"(CAST(1 AS DOUBLE) + {p} / {nd})"
    var = f"({p} * ({p} - {nd}) / ({nd} * {nd} * ({nd} - CAST(1 AS DOUBLE))))"
    return (
        f"CASE WHEN n1 = 0 OR n0 = 0 OR n1 + n0 < 3 OR ({var}) <= 0"
        f" THEN CAST(NULL AS BIGINT)"
        f" ELSE {fixed_e6_expr(f'(CAST(r AS DOUBLE) - {mu}) / sqrt({var})')}"
        f" END"
    )


def runs_test_report(
    df: DataFrame,
    group_col: str,
    score,
    order_cols: list,
) -> DataFrame:
    """Wald-Wolfowitz runs test of sequence randomness per group: is
    the above/below-median pattern of an ordered metric stream random,
    or does it cluster (trends, regime switches, autocorrelated
    bursts — the nonparametric 'is this series iid' gate that should
    run before any test that assumes exchangeability). Values are
    dichotomized against the per-group median (2*median exact for
    integer data — the brown_forsythe trick); exact ties at the
    median DROP (the classic convention, stated).

    DISTRIBUTED two-phase runs counting (never one partition per
    group): repartitionByRange on (group, order) makes each partition
    a contiguous slice of each group's timeline; per (group,
    partition-id) segment a PARTITIONED window counts internal runs
    and records the first/last sign, then the segment table (at most
    #groups x #partitions rows — bounded) stitches boundaries with a
    per-group ordered window over segment ids: R = sum of segment
    runs minus one per same-sign seam. All counts exact int64; the
    normal z = (R - mu)/sqrt(V) is one shared double expression
    (runs_z_sql) quantized once at e6 vs the two-sided 5% literal.
    ``order_cols`` is REQUIRED and must define the sequence: a runs
    test is meaningless without a total order, and an empty list would
    both break the segment window's ORDER BY and make the
    first/last-sign struct reads pick extreme SIGNS instead of
    sequence endpoints. The order must be UNIQUE within each group
    (pass a tiebreaker column).

    Returns one row per group: (group_key, n_obs, n_pos, n_neg,
    n_runs, z_e6, significant)."""
    spark = df.sparkSession
    if not order_cols:
        raise ValueError(
            "runs_test_report requires order_cols: a non-empty, "
            "within-group-unique total order over the sequence"
        )
    base = df.select(
        F.col(group_col).alias("g"),
        score.cast("long").alias("v"),
        *[c.alias(f"__o{i}") for i, c in enumerate(order_cols)],
    ).filter(F.col("g").isNotNull() & F.col("v").isNotNull())
    ocols = [f"__o{i}" for i in range(len(order_cols))]
    med = (
        base.groupBy("g")
        .agg(F.expr("CAST(2 * percentile(v, 0.5) AS BIGINT)").alias("m2"))
        .localCheckpoint(eager=True)  # k rows
    )
    signed = (
        base.join(F.broadcast(med), "g")
        .filter(F.lit(2) * F.col("v") != F.col("m2"))
        .select(
            "g", *ocols,
            (F.lit(2) * F.col("v") > F.col("m2")).cast("int").alias("x"),
        )
    )
    n = _shuffle_partitions(spark)
    d = (
        signed.repartitionByRange(n, F.col("g"), *[F.col(c) for c in ocols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wseg = Window.partitionBy("g", "__pid").orderBy(*ocols)
    seg = (
        d.withColumn(
            "chg",
            F.when(
                F.lag("x").over(wseg).isNull()
                | (F.lag("x").over(wseg) != F.col("x")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .groupBy("g", "__pid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seg"),
            F.sum("x").cast("long").alias("n1_seg"),
            F.sum("chg").cast("long").alias("r_seg"),
            F.min(F.struct(*ocols, "x")).getField("x").alias("first_x"),
            F.max(F.struct(*ocols, "x")).getField("x").alias("last_x"),
        )
        .localCheckpoint(eager=True)  # <= k * #partitions rows; bounded
    )
    wg = Window.partitionBy("g").orderBy("__pid")
    stitched = seg.withColumn(
        "seam",
        F.when(
            F.lag("last_x").over(wg).isNotNull()
            & (F.lag("last_x").over(wg) == F.col("first_x")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    per_g = stitched.groupBy("g").agg(
        F.sum("n_seg").cast("long").alias("n_obs"),
        F.sum("n1_seg").cast("long").alias("n1"),
        (F.sum("n_seg") - F.sum("n1_seg")).cast("long").alias("n0"),
        (F.sum("r_seg") - F.sum("seam")).cast("long").alias("r"),
    )
    z = runs_z_sql()
    return per_g.select(
        F.col("g").alias("group_key"),
        "n_obs",
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        F.col("r").alias("n_runs"),
        F.expr(z).cast("long").alias("z_e6"),
        F.expr(
            f"CASE WHEN ({z}) IS NULL THEN NULL"
            f" ELSE abs(({z})) > 1959964 END"
        ).alias("significant"),
    ).orderBy("group_key")


def with_grouped_prefix_sum(
    df, group_col: str, order_cols, value_col, out="cum", total_out=None,
    materialize_input: bool = True,
) -> DataFrame:
    """PER-GROUP scale-safe EXACT inclusive running sum of
    ``value_col`` in the total order given by ``order_cols`` within
    each ``group_col`` value — the grouped sibling of with_prefix_sum,
    for the shape where a Window.partitionBy(group) would put an
    UNBOUNDED spine (one task sorting ~N rows per group) on k tasks:
    repartitionByRange on (group, order) keeps each group's order
    contiguous across ascending partition ids, a PARTITIONED window
    sums within (group, partition-id) segments, and the per-(group,
    segment) totals — at most k * #partitions rows — collect to the
    driver where per-group running offsets are computed and broadcast
    back. Exact int64; ``group_col`` must be a string column.

    ``value_col``/``out`` may be parallel LISTS to compute several
    running sums in ONE range shuffle + ONE partitioned window (the
    ks_drift early/late pair) instead of paying the shuffle per
    column.

    ``total_out`` (str, or list parallel to ``out``; None entries skip)
    additionally attaches each group's GRAND total of the matching
    value column as a constant column — FREE: the driver's offset loop
    already accumulates the per-group totals, so they ride the same
    broadcast offset map instead of costing callers a separate
    aggregate job (the per-group n = max-rank pattern).

    NOTE: like with_prefix_sum, construction is EAGER (the input
    materialization + the bounded offset collect run as Spark jobs
    before this function returns; the collect job also materializes
    the summed frame's cache — one job where the old eager
    localCheckpoint + separate collect paid two). See with_prefix_sum
    for the ``materialize_input=False`` contract."""
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    outs = [out] if isinstance(out, str) else list(out)
    if len(vcols) != len(outs):
        raise ValueError("value_col and out lists must be parallel")
    touts = (
        [total_out] if isinstance(total_out, str) or total_out is None
        else list(total_out)
    )
    if len(touts) == 1 and len(outs) > 1:
        touts = touts + [None] * (len(outs) - 1)
    if len(touts) != len(outs):
        raise ValueError("total_out must be None, a str, or parallel to out")
    spark = df.sparkSession
    n = _shuffle_partitions(spark)
    if materialize_input:
        df = df.localCheckpoint(eager=True)
    wspec = (
        Window.partitionBy(group_col, "__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = df.repartitionByRange(n, F.col(group_col), *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    for v, o in zip(vcols, outs):
        # same window spec for every column -> ONE WindowExec
        d = d.withColumn(f"__ls_{o}", F.sum(v).over(wspec).cast("long"))
    d = d.persist()
    sums = sorted(
        (
            (str(r[group_col]), int(r["__pid"]),
             tuple(int(r[f"__c_{o}"]) for o in outs))
            for r in d.groupBy(group_col, "__pid").agg(
                *[
                    F.sum(v).cast("long").alias(f"__c_{o}")
                    for v, o in zip(vcols, outs)
                ]
            ).collect()
        ),
    )
    offs, acc = [], {}
    for g, pid, cs in sums:
        prev = acc.get(g, (0,) * len(outs))
        offs.append((g, pid, *prev))
        acc[g] = tuple(p + c for p, c in zip(prev, cs))
    tcols = [t for t in touts if t is not None]
    if tcols:
        offs = [
            (*row, *(
                acc[row[0]][i]
                for i, t in enumerate(touts) if t is not None
            ))
            for row in offs
        ]
    off_schema = (
        f"{group_col} string, __pid int, "
        + ", ".join(f"__off_{o} long" for o in outs)
        + "".join(f", {t} long" for t in tcols)
    )
    om = F.broadcast(spark.createDataFrame(offs, off_schema))
    d = d.join(om, [group_col, "__pid"])
    for o in outs:
        d = d.withColumn(
            o, (F.col(f"__off_{o}") + F.col(f"__ls_{o}")).cast("long")
        )
    return d.drop(
        "__pid", *[f"__ls_{o}" for o in outs], *[f"__off_{o}" for o in outs]
    )


def with_grouped_rank(
    df, group_col: str, order_cols, out: str = "r", total_out=None,
    materialize_input: bool = True,
) -> DataFrame:
    """PER-GROUP scale-safe EXACT row numbering in the total order
    given by ``order_cols`` within each ``group_col`` value — the rank
    sibling of with_grouped_prefix_sum (the inclusive prefix count of
    ones IS the row number), and the replacement for
    ``row_number().over(Window.partitionBy(low_k_col).orderBy(...))``,
    which sorts each group's ENTIRE slice on one task: a 5-value
    priority/lang column caps the sort at 5 tasks at any data size
    (VERDICT r10 #2 — the class the scale lint could not see).

    Same cost shape as the prefix-sum helper: one range shuffle on
    (group, order), a (group, partition-id)-PARTITIONED window, and a
    k x #partitions-row offset collect broadcast back. ``order_cols``
    must form a TOTAL order within each group (pass a unique
    tiebreaker); ``group_col`` must be a string column. Output rank is
    int64 (vs row_number's int32) — callers compare, not emit, it.
    ``total_out`` names a free per-group row-count column (see
    with_grouped_prefix_sum — the count of ones IS the group size).
    EAGER like its siblings (checkpoints + offset collect run now)."""
    return with_grouped_prefix_sum(
        df.withColumn("__one", F.lit(1)), group_col, order_cols, "__one",
        out, total_out=total_out, materialize_input=materialize_input,
    ).drop("__one")


def jt_z_sql() -> str:
    """Jonckheere-Terpstra tie-corrected normal z (e6 BIGINT) as ONE
    shared SQL expression over exact integer columns (jt2, n, s2, u1,
    v1, u2, v2, u3, v3) — identical text on both engines. The doubled
    statistic JT2 (ties count 1, strict orderings 2) has
    E[JT2] = (N^2 - sum n_g^2)/2 exactly (per cross-group pair the
    2*P(<) + P(=) expectation is 1 under exchangeability, ties or
    not); Var[JT2] = 4*Var[JT] with the standard three-term tie
    correction (Lehmann 1975; the clinfun::jonckheere.test form).
    Cross-moment products exceed int64, so every term runs in doubles
    over the exact integer inputs."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    nd = "CAST(n AS DOUBLE)"
    e2 = f"(({nd} * {nd} - CAST(s2 AS DOUBLE)) / CAST(2 AS DOUBLE))"
    t1 = (
        f"(({nd} * ({nd} - 1) * (2 * {nd} + 5)"
        " - CAST(u1 AS DOUBLE) - CAST(v1 AS DOUBLE))"
        " / CAST(72 AS DOUBLE))"
    )
    t2 = (
        "(CAST(u2 AS DOUBLE) * CAST(v2 AS DOUBLE)"
        f" / (CAST(36 AS DOUBLE) * {nd} * ({nd} - 1) * ({nd} - 2)))"
    )
    t3 = (
        "(CAST(u3 AS DOUBLE) * CAST(v3 AS DOUBLE)"
        f" / (CAST(8 AS DOUBLE) * {nd} * ({nd} - 1)))"
    )
    var2 = f"(CAST(4 AS DOUBLE) * ({t1} + {t2} + {t3}))"
    return (
        f"CASE WHEN n < 3 OR ({var2}) <= 0 THEN CAST(NULL AS BIGINT)"
        f" ELSE {fixed_e6_expr(f'(CAST(jt2 AS DOUBLE) - {e2}) / sqrt({var2})')}"
        f" END"
    )


def jonckheere_trend_report(
    df: DataFrame, group_col: str, score
) -> DataFrame:
    """Jonckheere-Terpstra trend test (Terpstra 1952; Jonckheere 1954)
    of an INTEGER score against an ORDERED factor — the k-group rank
    test with the alternative that Kruskal-Wallis throws away: do the
    distributions shift MONOTONICALLY with the factor's order (dose,
    priority tier, quality band). JT = sum over ordered group pairs
    i < j of the Mann-Whitney count #(x_i < x_j), ties half; kept
    DOUBLED (jt2, exact integer).

    Engine shape (no pair enumeration, no per-pair passes): one
    (group, score) histogram; per-group strictly-smaller prefix
    counts on the UNION support spine — |spine| x k rows, built by
    one cross of the distinct-score spine with the k-row group table
    and the grouped TWO-PHASE prefix sum (with_grouped_prefix_sum —
    never one sort task per group; the spine is unbounded for
    near-unique score axes); then each histogram cell
    (g_j, s, t_j) joins the spine row (g_i, s) for every EARLIER
    group (g_i < g_j, lexicographic = the factor's encoded order)
    and contributes t_j * (2*cum_i(<s) + t_i). Exact int64 while
    2*N^2 < 2^63 (N <~ 2e9). The tie-corrected normal z is one
    shared double expression (jt_z_sql) over the exact group/tie
    moment sums; two-sided 5% literal. Returns one row: (n_total,
    n_groups, jt2, z_e6, significant).

    NOTE: ``group_col`` values must encode the intended order
    lexicographically (the caller picks an ordered factor like
    '1-URGENT' < '2-HIGH'); the honest read on an exchangeable
    fixture is NOT-significant."""
    base = df.select(
        F.col(group_col).cast("string").alias("g"),
        score.cast("long").alias("s"),
    ).filter(F.col("g").isNotNull() & F.col("s").isNotNull())
    hist = (
        base.groupBy("g", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .localCheckpoint(eager=True)  # group x codomain sized; 4 consumers
    )
    # groups stays LAZY: it broadcasts into the grid crossJoin and the
    # distinct re-derives from the checkpointed hist in each consumer —
    # cheaper than its old eager checkpoint job (group-count rows)
    groups = hist.select("g").distinct()
    spine = hist.select("s").distinct()
    grid = (
        spine.crossJoin(F.broadcast(groups))
        .join(hist, ["g", "s"], "left")
        .select("g", "s", F.coalesce("t", F.lit(0)).alias("t"))
    )
    # per-group strictly-smaller prefix via the grouped two-phase
    # helper: the spine is DISTINCT SCORES (unbounded for near-unique
    # axes), so a Window.partitionBy(g) would sort ~|spine| rows in
    # ONE task per group — the constant-parallelism shape the scale
    # lint cannot see (the partition spec is non-empty)
    cum = with_grouped_prefix_sum(
        grid, "g", [F.col("s")], "t", out="ci",
        materialize_input=False,  # grid derives from the checkpointed hist
    ).select(
        "g", "s", "t",
        (F.col("ci") - F.col("t")).cast("long").alias("cb"),
    )
    contrib = (
        hist.alias("j")
        .join(
            cum.alias("i"),
            (F.col("i.s") == F.col("j.s"))
            & (F.col("i.g") < F.col("j.g")),
        )
        .agg(
            F.sum(
                F.col("j.t")
                * (F.lit(2) * F.col("i.cb") + F.col("i.t"))
            ).cast("long").alias("jt2")
        )
    )
    per_g = hist.groupBy("g").agg(F.sum("t").cast("long").alias("ng"))
    gm = per_g.agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("ng") * F.col("ng")).cast("long").alias("s2"),
        F.sum(
            F.col("ng") * (F.col("ng") - 1) * (2 * F.col("ng") + 5)
        ).cast("long").alias("u1"),
        F.sum(
            F.col("ng") * (F.col("ng") - 1) * (F.col("ng") - 2)
        ).cast("long").alias("u2"),
        F.sum(F.col("ng") * (F.col("ng") - 1)).cast("long").alias("u3"),
    )
    ties = hist.groupBy("s").agg(
        F.sum("t").cast("long").alias("ts")
    ).agg(
        F.sum(
            F.col("ts") * (F.col("ts") - 1) * (2 * F.col("ts") + 5)
        ).cast("long").alias("v1"),
        F.sum(
            F.col("ts") * (F.col("ts") - 1) * (F.col("ts") - 2)
        ).cast("long").alias("v2"),
        F.sum(F.col("ts") * (F.col("ts") - 1)).cast("long").alias("v3"),
    )
    z = jt_z_sql()
    return (
        contrib.crossJoin(F.broadcast(gm))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_total"),
            F.col("k").alias("n_groups"),
            F.coalesce(F.col("jt2"), F.lit(0)).alias("jt2"),
            F.expr(z).cast("long").alias("z_e6"),
            F.expr(
                f"CASE WHEN ({z}) IS NULL THEN NULL"
                f" ELSE abs(({z})) > 1959964 END"
            ).alias("significant"),
        )
    )


def mk_z_sql() -> str:
    """Mann-Kendall continuity-corrected normal z (e6 BIGINT) as ONE
    shared SQL expression over exact integer columns (s_stat, var18)
    — identical text on both engines. VAR18 = 18 * Var[S] carries the
    standard tie correction n(n-1)(2n+5) - sum t(t-1)(2t+5) (Mann
    1945; Kendall 1975); the continuity correction subtracts sign(S)
    before the divide. NULL when the variance degenerates (all values
    tied), 0 at S = 0."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    zc = "(CAST(s_stat AS DOUBLE) - CAST(sign(s_stat) AS DOUBLE))"
    sd = "sqrt(CAST(var18 AS DOUBLE) / CAST(18 AS DOUBLE))"
    return (
        "CASE WHEN var18 <= 0 THEN CAST(NULL AS BIGINT)"
        " WHEN s_stat = 0 THEN CAST(0 AS BIGINT)"
        f" ELSE {fixed_e6_expr(f'{zc} / ({sd})')} END"
    )


def mann_kendall_report(
    series: DataFrame, t_col: str, x_col: str
) -> DataFrame:
    """Mann-Kendall monotonic-trend test over a CALENDAR-BOUNDED
    period series — the nonparametric 'is this KPI drifting' gate
    (Mann 1945): S = sum over period pairs of sign(x_later -
    x_earlier), tie-corrected variance, continuity-corrected z. The
    rank-algebra sibling of Kendall tau with TIME as the second axis
    — which is what makes the pair join safe: the spine is the
    period table (days/months between min and max date — bounded by
    the calendar at ANY corpus size, ~2.4k days for this fixture's
    7-year span), so the broadcast sign join evaluates a CONSTANT
    ~n^2/2 comparisons, never corpus-scale (the TRUE bounded-spine
    case, same convention as kendall_tau_report's cell lattice).

    All-integer: S and VAR18 = n(n-1)(2n+5) - sum t(t-1)(2t+5) are
    exact int64 (safe to n ~ 2e6 periods); only the final z leaves
    the integers through mk_z_sql, quantized once at e6 and read
    against the two-sided 5% literal. ``series`` must already be the
    per-period aggregate with integer period index ``t_col`` and
    integer value ``x_col``. Returns one row: (n_periods, s_stat,
    var18, z_e6, significant)."""
    base = (
        series.select(
            F.col(t_col).cast("long").alias("t"),
            F.col(x_col).cast("long").alias("x"),
        )
        .filter(F.col("t").isNotNull() & F.col("x").isNotNull())
        .localCheckpoint(eager=True)  # calendar-bounded spine
    )
    s_tab = (
        base.alias("a")
        .join(F.broadcast(base.alias("b")), F.col("a.t") < F.col("b.t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("b.x") > F.col("a.x"), 1)
                    .when(F.col("b.x") < F.col("a.x"), -1)
                    .otherwise(0)
                ),
                F.lit(0),
            ).cast("long").alias("s")
        )
    )
    nrow = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        base.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
                ),
                F.lit(0),
            ).cast("long").alias("tie_term")
        )
    )
    z = mk_z_sql()
    return (
        s_tab.crossJoin(F.broadcast(nrow))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_periods"),
            F.col("s").alias("s_stat"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_term")
            ).cast("long").alias("var18"),
        )
        .select(
            "n_periods",
            "s_stat",
            "var18",
            F.expr(z).cast("long").alias("z_e6"),
            F.expr(
                f"CASE WHEN ({z}) IS NULL THEN NULL"
                f" ELSE abs(({z})) > 1959964 END"
            ).alias("significant"),
        )
    )


def theil_sen_report(
    series: DataFrame, t_col: str, x_col: str
) -> DataFrame:
    """Theil-Sen slope estimate over a CALENDAR-BOUNDED period series
    — the robust trend MAGNITUDE beside mann_kendall_report's trend
    EXISTENCE (Theil 1950; Sen 1968): the median of all pairwise
    slopes, immune to ~29% outlier contamination where OLS breaks at
    one. Same bounded-spine convention as Mann-Kendall: the pair
    table is periods^2/2 — a calendar constant, never corpus-scale.

    Exact: each pair's slope quantizes ONCE as the sign-split e6
    integer ratio (x_j - x_i) * 1e6 DIV (t_j - t_i) (exact while
    |dx| < 9.2e12 — the callers feed unit-scaled values and state
    the gate); the median is the LOWER median, the value at rank
    ceil(m/2) in (slope, t_i, t_j) order — an exact order statistic
    via the two-phase global rank, no interpolation to diverge
    between engines. Returns one row: (n_periods, n_pairs,
    median_slope_e6)."""
    from firebase_etl_spark.functions.portable_math import sdiv_scaled_sql

    base = (
        series.select(
            F.col(t_col).cast("long").alias("t"),
            F.col(x_col).cast("long").alias("x"),
        )
        .filter(F.col("t").isNotNull() & F.col("x").isNotNull())
        .localCheckpoint(eager=True)  # calendar-bounded spine
    )
    slope = sdiv_scaled_sql("xb - xa", "tb - ta", 1_000_000, "DIV")
    pairs = (
        base.alias("a")
        .join(F.broadcast(base.alias("b")), F.col("a.t") < F.col("b.t"))
        .select(
            F.col("a.t").alias("ta"),
            F.col("b.t").alias("tb"),
            F.col("a.x").alias("xa"),
            F.col("b.x").alias("xb"),
        )
        .select(
            "ta",
            "tb",
            F.expr(slope).cast("long").alias("slope_e6"),
        )
    )
    # the pair count rides the helper's broadcast offset map
    # (total_out) — no separate count aggregate + broadcast exchange
    ranked = with_global_rank(
        pairs, [F.asc("slope_e6"), F.asc("ta"), F.asc("tb")], "r",
        total_out="m",
    )
    med = (
        ranked
        .filter(F.col("r") == F.expr("(m + 1) DIV 2"))
        .select(
            F.col("m").alias("n_pairs"),
            F.col("slope_e6").alias("median_slope_e6"),
        )
    )
    n = base.agg(F.count(F.lit(1)).cast("long").alias("n_periods"))
    return n.crossJoin(F.broadcast(med)).select(
        "n_periods", "n_pairs", "median_slope_e6"
    )


def gini_report(df: DataFrame, value_col: str, key_col: str) -> DataFrame:
    """Gini concentration coefficient over per-unit non-negative
    integer values — the inequality summary every revenue/exposure
    concentration review reads (Gini 1912), computed EXACTLY from the
    rank formulation G = (2 * sum r*x_r) / (n * sum x) - (n+1)/n over
    values sorted ascending: ranks come from the two-phase global
    rank (never a single-partition window), and tied values make the
    statistic independent of the key tiebreak (swapping equal values
    across adjacent ranks leaves sum r*x unchanged), so the output is
    deterministic.

    All integer: with S = sum x, S1 = sum r*x, the numerator
    2*S1 - (n+1)*S is >= 0 and <= n*S, and gini_e6 applies
    big_e6_div_sql against den = n*S — EXACT while n*S < 9.2e15
    (the callers unit-scale values and state the gate; at true
    100 TB revenue scale the production plan shifts to k-unit
    granularity, which changes G by < 1e-6 per unit step). Returns
    one row: (n_units, total_value, gini_e6)."""
    from firebase_etl_spark.functions.portable_math import big_e6_div_sql

    base = df.select(
        F.col(value_col).cast("long").alias("v"),
        F.col(key_col).alias("k"),
    ).filter(F.col("v").isNotNull() & (F.col("v") >= 0))
    ranked = with_global_rank(base, [F.asc("v"), F.asc("k")], "r")
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("r") * F.col("v")).cast("long").alias("s1"),
    )
    g = big_e6_div_sql("2 * s1 - (n + 1) * s", "n * s", "DIV")
    return agg.select(
        F.col("n").alias("n_units"),
        F.col("s").alias("total_value"),
        F.expr(
            f"CASE WHEN n > 0 AND s > 0 THEN {g}"
            " ELSE CAST(NULL AS BIGINT) END"
        ).cast("long").alias("gini_e6"),
    )


def friedman_report(
    cells: DataFrame, block_col: str, treat_col: str, x_col: str
) -> DataFrame:
    """Friedman rank test over complete blocks — the nonparametric
    repeated-measures ANOVA (Friedman 1937): do k treatments keep the
    same within-block rank distribution, judged across n blocks?
    Input is the (block, treatment, value) CELL table (one row per
    pair); blocks missing any treatment drop (complete-blocks
    requirement, stated).

    DOUBLED midranks keep ties integer (the kendall/JT convention):
    within a block, r2 = 1 + 2*#{smaller} + #{tied incl. self}, so
    r2 = 2 * midrank exactly. With R2_j = sum of r2 over blocks for
    treatment j and A4 = sum of r2^2 over all cells, the
    tie-corrected statistic (Conover 1999 form) reduces to the pure
    integer ratio chi2 = (k-1) * N4 / D4 with
    N4 = sum_j (R2_j - n*(k+1))^2 and D4 = A4 - n*k*(k+1)^2 — one e6
    quantize at the end, read against the shared chi-square 95%
    table at k-1 dof. The within-block rank join is k^2 per block —
    treatment-codomain bounded, never data-sized; blocks are the
    calendar spine. Returns one row: (n_blocks, k_treatments,
    chi2_e6, crit_e6, significant)."""
    from firebase_etl_spark.functions.portable_math import (
        chi2_crit_95_e6_sql,
    )

    base = cells.select(
        F.col(block_col).alias("b"),
        F.col(treat_col).alias("j"),
        F.col(x_col).cast("long").alias("x"),
    ).filter(
        F.col("b").isNotNull() & F.col("j").isNotNull()
        & F.col("x").isNotNull()
    )
    ktab = base.agg(F.count_distinct("j").cast("long").alias("k"))
    complete = (
        base.groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("nj"))
        .crossJoin(F.broadcast(ktab))
        .filter(F.col("nj") == F.col("k"))
        .select("b")
    )
    kept = base.join(complete, "b").localCheckpoint(
        eager=True
    )  # blocks x k cells; consumed by the rank join twice
    r2 = (
        kept.alias("w")
        .join(kept.alias("v"), F.col("w.b") == F.col("v.b"))
        .groupBy(
            F.col("w.b").alias("b"), F.col("w.j").alias("j")
        )
        .agg(
            F.sum(
                F.when(F.col("v.x") < F.col("w.x"), 2)
                .when(F.col("v.x") == F.col("w.x"), 1)
                .otherwise(0)
            ).cast("long").alias("r2")
        )
        .withColumn("r2", F.col("r2") + 1)
    )
    per_j = r2.groupBy("j").agg(
        F.sum("r2").cast("long").alias("rr"),
        F.sum(F.col("r2") * F.col("r2")).cast("long").alias("rr2"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    tot = per_j.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("rr2").cast("long").alias("a4"),
        F.sum(
            # N4 needs n and k inside the sum; defer via raw moments:
            # sum_j R2_j^2 and sum_j R2_j (= n*k*(k+1) identity)
            F.col("rr") * F.col("rr")
        ).cast("long").alias("srr2"),
        F.sum("rr").cast("long").alias("srr"),
    )
    # N4 = sum_j R2_j^2 - 2*n*(k+1)*sum_j R2_j + k*n^2*(k+1)^2
    return tot.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        F.expr(
            "srr2 - 2 * n * (k + 1) * srr + k * n * n * (k + 1) * (k + 1)"
        ).cast("long").alias("n4"),
        F.expr("a4 - n * k * (k + 1) * (k + 1)").cast("long").alias("d4"),
    ).select(
        "n_blocks",
        "k_treatments",
        # n4 is a sum of squares (>= 0), so no sign split is needed
        F.expr(
            "CASE WHEN d4 > 0 THEN"
            " (n4 * ((k_treatments - 1) * 1000000)) DIV d4"
            " ELSE CAST(NULL AS BIGINT) END"
        ).cast("long").alias("chi2_e6"),
        F.expr(
            chi2_crit_95_e6_sql("k_treatments - 1")
        ).cast("long").alias("crit_e6"),
    ).select(
        "n_blocks",
        "k_treatments",
        "chi2_e6",
        "crit_e6",
        F.expr(
            "CASE WHEN chi2_e6 IS NULL OR crit_e6 IS NULL THEN NULL"
            " ELSE chi2_e6 > crit_e6 END"
        ).alias("significant"),
    )


def agreement_kappa_report(df: DataFrame, a_col, b_col) -> DataFrame:
    """Cohen's kappa between two categorical labelings — the
    chance-corrected agreement score every labeling/classifier audit
    reads beside raw accuracy (Cohen 1960): kappa = (po - pe) /
    (1 - pe) with pe the agreement expected from the two marginal
    label distributions alone. The companion to a confusion-matrix
    query: same bounded grid, one scalar that says whether the
    agreement beats chance.

    Scale shape: one corpus scan -> (a, b) cell counts (map-side
    combinable, codomain-bounded — the kendall cell-count guard
    applies), margins from the cell table, one broadcast join on the
    label. All integer: with n items, d = sum of diagonal cells and
    spe = sum_l rowmargin_l * colmargin_l, kappa_e6 is the sign-split
    big_e6_div of (d*n - spe) against (n*n - spe) — EXACT while
    n < ~9.6e7 items (den < 9.2e15; past that, audit a sample — the
    statistic is an audit, not a pipeline transform). Returns one
    row: (n_items, n_agree, po_e6, pe_e6, kappa_e6)."""
    from firebase_etl_spark.functions.portable_math import big_e6_div_sql

    base = df.select(
        F.col(a_col).cast("string").alias("a") if isinstance(a_col, str)
        else a_col.cast("string").alias("a"),
        F.col(b_col).cast("string").alias("b") if isinstance(b_col, str)
        else b_col.cast("string").alias("b"),
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    cells = (
        base.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # codomain-bounded; 4 consumers
    )
    n_cells = cells.count()
    if n_cells > 100_000:
        raise ValueError(
            f"agreement_kappa_report: {n_cells} label cells exceed the "
            "bounded-codomain limit (100k); kappa is for categorical "
            "labelings, not near-unique keys"
        )
    rm = cells.groupBy("a").agg(F.sum("c").cast("long").alias("rm"))
    cm = cells.groupBy("b").agg(F.sum("c").cast("long").alias("cm"))
    spe = (
        rm.join(cm, rm.a == cm.b)
        .agg(
            F.coalesce(F.sum(F.col("rm") * F.col("cm")), F.lit(0))
            .cast("long").alias("spe")
        )
    )
    tot = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("a") == F.col("b"), F.col("c"))), F.lit(0)
        ).cast("long").alias("d"),
    )
    pos = big_e6_div_sql("d * n - spe", "n * n - spe", "DIV")
    neg = big_e6_div_sql("spe - d * n", "n * n - spe", "DIV")
    pe = big_e6_div_sql("spe", "n * n", "DIV")
    return tot.crossJoin(F.broadcast(spe)).select(
        F.col("n").alias("n_items"),
        F.col("d").alias("n_agree"),
        F.expr(
            "CASE WHEN n > 0 THEN (d * 1000000) DIV n"
            " ELSE CAST(NULL AS BIGINT) END"
        ).cast("long").alias("po_e6"),
        F.expr(
            f"CASE WHEN n > 0 THEN {pe}"
            " ELSE CAST(NULL AS BIGINT) END"
        ).cast("long").alias("pe_e6"),
        F.expr(
            "CASE WHEN n * n - spe <= 0 THEN CAST(NULL AS BIGINT)"
            f" WHEN d * n >= spe THEN {pos}"
            f" ELSE -({neg}) END"
        ).cast("long").alias("kappa_e6"),
    )


#: Benford first-digit probabilities log10(1 + 1/d), d = 1..9, at e6 —
#: shared literals (they sum to exactly 1e6), never runtime log10
BENFORD_P_E6 = (301030, 176091, 124939, 96910, 79181, 66947, 57992,
                51153, 45757)

#: chi-square 95% critical at 8 dof (9 digit bins - 1), e6
BENFORD_CHI2_CRIT_E6 = 15_507_313


def benford_chi2_sql() -> str:
    """Benford goodness-of-fit chi-square as ONE shared SQL expression
    over exact integer columns (n, c1..c9): sum_d (o_d*1e6 - n*p_d)^2
    / (n * p_d * 1e6), each difference exact in int64 (safe to n ~
    9e12 values) and squared in doubles, quantized once at e6."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    terms = []
    for d, p in enumerate(BENFORD_P_E6, start=1):
        diff = f"CAST(c{d} * 1000000 - n * {p} AS DOUBLE)"
        terms.append(f"({diff} * {diff} / (CAST(n AS DOUBLE) * {p} * 1000000.0))")
    return fixed_e6_expr(" + ".join(terms))


def benford_mad_e6_sql(floordiv: str = "DIV") -> str:
    """Benford mean-absolute-deviation (e6) over (n, c1..c9) — the
    scale-free companion the chi-square's n-sensitivity needs: the
    mean |observed share - Benford share| across the 9 digits, all
    integer (truncating per-digit share, the quantize-once rule; all
    operands non-negative, so Spark ``DIV`` and DuckDB ``//``
    agree)."""
    terms = [
        f"abs((c{d} * 1000000) {floordiv} n - {p})"
        for d, p in enumerate(BENFORD_P_E6, start=1)
    ]
    return f"((({') + ('.join(terms)})) {floordiv} 9)"


def benford_report(
    df: DataFrame, group_col: str, value_c_expr: str
) -> DataFrame:
    """Benford first-significant-digit audit per group — the
    fabricated/synthetic-data smell test (Newcomb 1881; Benford 1938;
    standard in forensic accounting): naturally-occurring multiscale
    positive amounts put digit d first with probability log10(1+1/d);
    flat or templated generators don't. Published per group: the 9
    digit counts, the chi-square against the shared e6 Benford
    literals, and the scale-free MAD.

    The first digit comes from the value's DECIMAL STRING head — no
    runtime log10 on either engine, and substring-of-cast is
    identical text in Spark and DuckDB. Counts are one map-side
    combinable aggregate (9 conditional sums per group); only the
    chi-square leaves the integers (benford_chi2_sql), quantized
    once. Zero and negative values drop (no first significant
    digit), stated. Returns per group: (group_key, n_values, c1..c9,
    chi2_e6, mad_e6, benford_ok)."""
    base = df.select(
        F.col(group_col).alias("g"),
        F.expr(value_c_expr).cast("long").alias("v"),
    ).filter(F.col("g").isNotNull() & (F.col("v") > 0))
    dig = F.substring(F.col("v").cast("string"), 1, 1)
    agg = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum((dig == str(d)).cast("long")).cast("long").alias(f"c{d}")
            for d in range(1, 10)
        ],
    )
    chi = benford_chi2_sql()
    mad = benford_mad_e6_sql()
    return (
        agg.select(
            F.col("g").alias("group_key"),
            F.col("n").alias("n_values"),
            *[F.col(f"c{d}") for d in range(1, 10)],
            F.expr(chi).cast("long").alias("chi2_e6"),
            F.expr(mad).cast("long").alias("mad_e6"),
        )
        .withColumn(
            "benford_ok",
            F.col("chi2_e6") <= F.lit(BENFORD_CHI2_CRIT_E6),
        )
        .orderBy("group_key")
    )
