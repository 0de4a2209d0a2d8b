"""Bigram language-model scoring — the perplexity-filter stage of a
training-data pipeline (the CCNet/KenLM curation step, re-expressed
relationally; extension beyond the reference).

A corpus-trained add-k bigram model assigns every document an average
log2-probability per bigram; implausible token streams (mojibake,
boilerplate loops, shuffled text) score far below fluent ones and get
screened out. The whole thing — training AND scoring — is three
aggregates and two joins over one token explode:

    bigrams   = (doc, w1, w2) rows              [slice+zip, no window]
    c12       = count per (w1, w2)              [train: bigram counts]
    c1        = count per w1 (as a context)     [train: context counts]
    V         = distinct next-token vocabulary  [smoothing denominator]
    score_doc = avg over doc bigrams of log2((c12 + k) / (c1 + k·V))

Scale shape: training counts shuffle on token keys (map-side
combinable); scoring joins the doc bigrams back on those keys. The count
tables are vocabulary-sized, orders of magnitude smaller than the
corpus, so both scoring joins broadcast (checked against a row-count
threshold like every other size-based join decision in this package); a
web-scale vocabulary falls back to shuffle joins on the same plan. Every
step is deterministic relational logic — a DuckDB oracle replays
training and scoring exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from firebase_etl_spark.functions.portable_math import (
    LN2_LIT,
    fixed_e6_expr,
    pmi_expr,
    with_exp2,
    with_ln,
)
from firebase_etl_spark.operators.text import tokenize

#: broadcast the count tables while they stay vocabulary-sized
BROADCAST_MAX_ROWS = 3_000_000


def doc_bigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, w2) — one row per consecutive token pair. Built by zipping
    the token array with itself shifted one (slice + arrays_zip), so no
    per-token explode-then-window pass is needed."""
    toks = df.select(F.col(id_col), tokenize(text_col).alias("__toks")).filter(
        F.size("__toks") >= 2
    )
    shifted = toks.select(
        F.col(id_col),
        F.slice("__toks", 1, F.size("__toks") - 1).alias("w1"),
        F.slice("__toks", 2, F.size("__toks") - 1).alias("w2"),
    )
    return shifted.select(
        F.col(id_col), F.explode(F.arrays_zip("w1", "w2")).alias("bg")
    ).select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def bigram_lm_scores(
    df: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc (id, n_bigrams, avg_lg2_e6, avg_log2_prob) under the
    corpus-trained add-k bigram model. Higher = more predictable under
    corpus statistics; the junk tail is the low end. Docs with <2
    tokens are absent (no bigram evidence).

    DETERMINISM: when 2k is an integer (the default k=0.5), the add-k
    probability rewrites to the integer ratio (2·c12 + 2k)/(2·c1 + 2k·V)
    and log2(prob) = (ln(num) - ln(den)) / ln 2 over the PORTABLE
    libm-free ln (functions/portable_math.py). Each bigram contribution
    is rounded ONCE to a 1e-6-unit BIGINT and per-doc scores are
    associative integer sums — bit-identical across partitionings AND
    engines (the raw avg(log2(...)) it replaces was a float sum whose
    order Spark does not pin). ``avg_lg2_e6`` is the exact per-doc
    fixed-point mean; ``avg_log2_prob`` its display double. Non-integer
    2k falls back to the libm log2 float path (no driver query uses
    it)."""
    bg = doc_bigrams(df, text_col, id_col).persist()
    try:
        # training: counts over the SAME corpus being scored (standard for
        # curation — the model defines "typical for this corpus")
        c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
        vocab = bg.select(F.count_distinct("w2").alias("v"))

        # Evaluate the portable-ln chains at CELL granularity (distinct
        # (w1, w2) — vocabulary-pair bounded) instead of per bigram
        # INSTANCE: the ln arguments depend only on (c12, c1, v), and
        # instances repeat each cell ~10x, so the two most expensive
        # expressions in the plan run on the small table (the ql_topk
        # hoist). Same integer args -> same chains -> bit-identical
        # per-instance lg2_e6 after the join.
        cell = c12.join(c1, "w1").crossJoin(F.broadcast(vocab))
        if float(2 * k).is_integer():
            kk = int(2 * k)
            cell = with_ln(cell, f"(2 * c12 + {kk})", "__lnnum")
            cell = with_ln(cell, f"(2 * c1 + {kk} * v)", "__lnden")
            lg2_e6 = F.expr(
                fixed_e6_expr(f"(__lnnum - __lnden) / {LN2_LIT}")
            )
        else:  # pragma: no cover - float fallback, unused by queries
            prob = (F.col("c12") + F.lit(k)) / (
                F.col("c1") + F.lit(k) * F.col("v")
            )
            lg2_e6 = (
                F.round(F.log2(prob) * 1000000.0 + 1e-9, 0).cast("long")
            )
        cell = cell.select("w1", "w2", lg2_e6.alias("__lg2_e6"))
        if c12.count() <= BROADCAST_MAX_ROWS:
            cell = F.broadcast(cell)
        out = (
            bg.join(cell, ["w1", "w2"])
            .select(F.col(id_col), "__lg2_e6")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                F.sum("__lg2_e6").alias("__s"),
            )
            .select(
                id_col,
                "n_bigrams",
                F.expr(
                    "CAST(round(CAST(__s AS DOUBLE) / n_bigrams"
                    " + 1e-9, 0) AS BIGINT)"
                ).alias("avg_lg2_e6"),
            )
            .withColumn(
                "avg_log2_prob", F.col("avg_lg2_e6") / F.lit(1000000.0)
            )
        )
        out = out.localCheckpoint(eager=True)
    finally:
        bg.unpersist()
    return out


def pmi_collocations(
    df: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information — the
    phrase-detection step of a training pipeline (Mikolov et al. 2013
    use the same counts-ratio score to merge "new york"-style phrases
    before word2vec training):

        pmi(a, b) = ln( (c12/B) / ((ca/T) * (cb/T)) )

    with c12 the bigram count, ca/cb unigram counts, B/T the corpus
    bigram/token totals. Rare pairs are dropped FIRST (``min_count``),
    both to kill PMI's low-frequency pathology and to shrink the bigram
    table before any join. Returns (w1, w2, c12, pmi), the top-k rows
    by (6dp pmi desc, w1, w2) — no rank column, so the global top-k
    stays a TakeOrderedAndProject with no global-order window.

    DETERMINISM: pmi decomposes to ln(c12) + 2·ln(T) - ln(B) - ln(ca)
    - ln(cb) — five single-INTEGER-argument PORTABLE libm-free lns
    (functions/portable_math.py; single integers, never products, so no
    BIGINT overflow at any corpus size) combined in ONE fixed-order
    expression per surviving bigram row. No float is ever aggregated,
    and both engines quantize the identical double at 6dp.

    Scale shape: one token explode feeds the unigram aggregate, one
    slice+zip explode feeds the bigram aggregate (both map-side
    combinable token-keyed shuffles); the unigram table is
    vocabulary-sized and broadcasts below the usual row threshold
    (shuffle-join fallback above it); the min_count filter runs before
    the joins; the global top-k is a TakeOrderedAndProject, never a
    full sort."""
    toks = df.select(
        F.col(id_col), tokenize(text_col).alias("__toks")
    ).persist()
    try:
        uni = (
            toks.select(F.explode("__toks").alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("cu"))
        ).persist()
        try:
            big = (
                toks.select(
                    F.slice("__toks", 1, F.size("__toks") - 1).alias("a1"),
                    F.slice("__toks", 2, F.size("__toks") - 1).alias("a2"),
                )
                .filter(F.size("__toks") >= 2)
                .select(F.explode(F.arrays_zip("a1", "a2")).alias("bg"))
                .select(
                    F.col("bg.a1").alias("w1"), F.col("bg.a2").alias("w2")
                )
                .groupBy("w1", "w2")
                .agg(F.count(F.lit(1)).alias("c12"))
                .filter(F.col("c12") >= min_count)
            )
            tot = toks.agg(
                F.sum(F.size("__toks")).alias("t"),
                F.sum(
                    F.when(
                        F.size("__toks") >= 2, F.size("__toks") - 1
                    ).otherwise(0)
                ).alias("b"),
            ).collect()[0]
            t_tot = int(tot["t"] or 0)
            b_tot = int(tot["b"] or 0)

            # one count() sizes the broadcast decision AND materializes
            # the cached vocabulary table both scoring joins reuse
            n_vocab = uni.count()
            ua = uni.select(F.col("w").alias("w1"), F.col("cu").alias("ca"))
            ub = uni.select(F.col("w").alias("w2"), F.col("cu").alias("cb"))
            if n_vocab <= BROADCAST_MAX_ROWS:
                ua, ub = F.broadcast(ua), F.broadcast(ub)
            sc = big.join(ua, "w1").join(ub, "w2")
            sc = with_ln(sc, "c12", "__lnc12")
            sc = with_ln(sc, "ca", "__lnca")
            sc = with_ln(sc, "cb", "__lncb")
            sc = with_ln(sc, str(t_tot), "__lnt")
            sc = with_ln(sc, str(b_tot), "__lnb")
            scored = sc.select(
                "w1",
                "w2",
                "c12",
                F.expr(pmi_expr()).alias("pmi"),
            )
            # the top-k result is <= k rows: checkpoint through the
            # TakeOrdered so the caches can be released (lm.py pattern)
            out = scored.orderBy(F.desc("pmi"), "w1", "w2").limit(k)
            out = out.localCheckpoint(eager=True)
        finally:
            uni.unpersist()
    finally:
        toks.unpersist()
    return out


def vocab_growth_report(
    df: DataFrame,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps-law vocabulary-growth audit: the corpus is cut into
    ``n_buckets`` equal-width id ranges (corpus prefixes under the
    ingest ordering) and each bucket reports its document/token volume
    and how many NEVER-SEEN-BEFORE terms it contributes, plus running
    totals — the V(n) vs n curve whose flattening (or failure to
    flatten) is the standard crawl-health signal: a vocabulary that
    keeps growing linearly means encoding breakage or spam, one that
    flattens too fast means a stalled crawl frontier.

    Scale shape: one token explode; term first-appearance is a
    vocabulary-sized min-aggregate (map-side combinable); everything
    after operates on ``n_buckets`` rows, including the running totals
    (a bounded b2 <= b1 self-join — no global-order window). A dense
    bucket spine keeps empty prefixes present. All-integer output."""
    # the tokenized corpus feeds the bounds agg plus THREE bucket
    # aggregates, and the n_buckets-row `per` table is referenced three
    # more times by the running-total self-join — without persist +
    # eager checkpoint Catalyst inlines every reference and the corpus
    # is scanned ~10x (measured: 10 FileScans, 0 ReusedExchange); with
    # them it is scanned once and `cum` operates on 10 cached rows
    base = df.select(
        F.col(id_col).alias("did"), tokenize(text_col).alias("__toks")
    ).persist()
    try:
        bounds = F.broadcast(
            base.agg(
                F.min("did").alias("lo"),
                (F.max("did") - F.min("did") + 1).alias("width"),
            )
        )
        bucket = F.floor(
            (F.col("did") - F.col("lo")) * n_buckets / F.col("width")
        ).cast("int")
        docs = base.crossJoin(bounds).select(bucket.alias("b"), "__toks")
        toks = docs.select("b", F.explode("__toks").alias("term"))
        bdoc = docs.groupBy("b").agg(
            F.count(F.lit(1)).alias("n_docs"),
        )
        btok = toks.groupBy("b").agg(F.count(F.lit(1)).alias("n_tokens"))
        new_terms = (
            toks.groupBy("term")
            .agg(F.min("b").alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("new_terms"))
        )
        spine = (
            df.sparkSession.range(n_buckets)
            .select(F.col("id").cast("int").alias("bucket"))
        )
        per = (
            spine.join(
                bdoc.withColumnRenamed("b", "bucket"), "bucket", "left"
            )
            .join(btok.withColumnRenamed("b", "bucket"), "bucket", "left")
            .join(
                new_terms.withColumnRenamed("b", "bucket"), "bucket", "left"
            )
            .select(
                "bucket",
                F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
                F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                F.coalesce("new_terms", F.lit(0)).alias("new_terms"),
            )
            .localCheckpoint(eager=True)  # n_buckets rows
        )
    finally:
        base.unpersist()
    cum = (
        per.alias("x")
        .join(per.alias("y"), F.col("y.bucket") <= F.col("x.bucket"))
        .groupBy(F.col("x.bucket").alias("bucket"))
        .agg(
            F.sum("y.n_tokens").alias("cum_tokens"),
            F.sum("y.new_terms").alias("cum_vocab"),
        )
    )
    return (
        per.join(cum, "bucket")
        .select(
            "bucket", "n_docs", "n_tokens", "new_terms",
            "cum_tokens", "cum_vocab",
        )
        .orderBy("bucket")
    )


def unseen_mass_report(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Simple Good-Turing headline numbers: the probability mass an LM
    should reserve for tokens it has never seen, estimated from the
    frequency-of-frequencies (P_unseen = N1/N, Good 1953). One row:
    (n_tokens, vocab_size, n_singletons, n_doubletons, p_unseen,
    singleton_frac). A high singleton fraction is the practical 'this
    corpus slice is mostly noise/OOV' screen. Integer aggregates; the
    two ratios each leave the integers by one rounded division."""
    tf = (
        df.select(F.explode(tokenize(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tf.agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum((F.col("c") == 1).cast("long")).alias("n_singletons"),
        F.sum((F.col("c") == 2).cast("long")).alias("n_doubletons"),
        F.round(
            F.sum((F.col("c") == 1).cast("long")) / F.sum("c"), 6
        ).alias("p_unseen"),
        F.round(
            F.sum((F.col("c") == 1).cast("long")) / F.count(F.lit(1)), 4
        ).alias("singleton_frac"),
    )


def zipf_slope_report(
    df: DataFrame, top_n: int = 100, text_col: str = "text"
) -> DataFrame:
    """Zipf rank-frequency audit: the least-squares slope of
    log(frequency) vs log(rank) over the ``top_n`` most frequent terms —
    natural text sits near -1; a flat slope means templated/boilerplate
    vocabulary, a cliff means spam flooding a few tokens. Completes the
    vocabulary-health triptych with Heaps growth (vocab_growth_report)
    and Good-Turing unseen mass (unseen_mass_report).

    One row: (n_tokens, vocab_size, n_top_terms, zipf_slope,
    zipf_intercept, zipf_r2).

    Scale + determinism shape: ONE corpus explode into a vocabulary-sized
    term-frequency aggregate (persisted so the totals row and the top-N
    cut don't rescan the corpus; both results are tiny and eagerly
    checkpointed). Ranks come from a bounded top_n x top_n self-join
    (count of (freq, term)-lexicographically-greater rows — ties break on
    the term string, so ranks are engine-invariant; no global-order
    window, which the scale lint would rightly flag). The regression
    sums are FIXED-POINT: each log is the PORTABLE libm-free ln of an
    integer (functions/portable_math.py — bit-identical across engines)
    rounded once to a 1e-6-unit BIGINT
    (the DSIR/chisq pattern, +1e-9 nudge against representation ties)
    and all five sums are associative integer aggregates; slope,
    intercept and r2 leave the integers in ONE fixed-order double
    expression on the single aggregate row, mirrored verbatim in the
    DuckDB oracle. Integer xy products stay under 2^63 for any corpus
    (log(freq) <= log(2^63) => |x*y| < 2.1e15 per term; summed over
    top_n=100 => ~2e17)."""
    tf = (
        df.select(F.explode(tokenize(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .persist()
    )
    try:
        totals = tf.agg(
            F.sum("freq").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab_size"),
        ).localCheckpoint(eager=True)  # 1 row
        top = (
            tf.orderBy(F.desc("freq"), F.asc("term"))
            .limit(top_n)
            .localCheckpoint(eager=True)  # top_n rows
        )
    finally:
        tf.unpersist()
    ranked = (
        top.alias("a")
        .join(
            top.alias("b"),
            (F.col("b.freq") > F.col("a.freq"))
            | (
                (F.col("b.freq") == F.col("a.freq"))
                & (F.col("b.term") <= F.col("a.term"))
            ),
        )
        .groupBy(F.col("a.term").alias("term"), F.col("a.freq").alias("freq"))
        .agg(F.count(F.lit(1)).alias("rank"))
    )
    # PORTABLE libm-free lns (functions/portable_math.py): rank and
    # freq are integers, so both engines quantize the identical double
    lr = with_ln(with_ln(ranked, "rank", "__lnr"), "freq", "__lnf")
    pts = lr.select(
        F.expr(fixed_e6_expr("__lnr")).alias("x"),
        F.expr(fixed_e6_expr("__lnf")).alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    return totals.crossJoin(F.broadcast(sums)).select(
        "n_tokens",
        "vocab_size",
        F.col("n").alias("n_top_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n / 1000000.0, 6).alias(
            "zipf_intercept"
        ),
        F.round(cov * cov / (varx * vary), 6).alias("zipf_r2"),
    )


def doremi_mixture_weights(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing_e6: int = 300_000,
) -> DataFrame:
    """One DoReMi-style domain-reweighting step (after Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining", arXiv:2305.10429, public) with the bigram LM standing
    in for the proxy model: domains whose text is HARDER than the
    corpus average under the corpus-trained add-1/2 bigram model (=
    excess loss) get upweighted multiplicatively, then the exponentiated
    weights renormalize and smooth toward the baseline share — the
    published update α ∝ baseline·exp(η·excess), (1-c)·α + c·baseline,
    with η = 1 and c = ``smoothing_e6``/1e6.

    Relational shape: per-doc LM scores (bigram_lm_scores — two corpus
    passes: train, score) aggregate to ONE domain-sized table; every
    step after runs on those few rows. Loss per domain is the exact
    integer ratio of fixed-point sums; exp(excess) goes through the
    PORTABLE libm-free exp2 (the same IEEE tree on both engines);
    weights renormalize by integer division. Output integers only:
    (domain, n_docs, total_bigrams, loss_e6, excess_e6, baseline_e6,
    doremi_weight_e6) — cross-engine exact, no round(double) surface."""
    scores = bigram_lm_scores(df, k=0.5, text_col=text_col, id_col=id_col)
    per = (
        df.select(F.col(id_col), F.col(domain_col).alias("domain"))
        .join(scores, id_col)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("total_bigrams"),
            # exact integer total log2: the per-doc fixed-point mean
            # re-scaled by its own bigram count (defined spec; keeps
            # every downstream quantity an integer ratio)
            F.sum(F.col("avg_lg2_e6") * F.col("n_bigrams")).alias(
                "tot_lg2"
            ),
        )
        .localCheckpoint(eager=True)  # domain-sized
    )
    tot = F.broadcast(
        per.agg(
            F.sum("n_docs").alias("n_total"),
            F.sum("tot_lg2").alias("tot_all"),
            F.sum("total_bigrams").alias("nb_all"),
        )
    )
    base = (
        per.crossJoin(tot)
        # losses are negated log2 sums: numerators non-negative, so
        # Spark's truncating DIV and DuckDB's flooring // agree
        .withColumn("loss_e6", F.expr("(-tot_lg2) DIV total_bigrams"))
        .withColumn("ref_loss_e6", F.expr("(-tot_all) DIV nb_all"))
        # DOCUMENTED CLAMP (not silent): excess caps at 15.5 units so
        # w_fx = baseline_e6 * e^excess stays <= ~5.4e12 and the
        # renormalizing product w_fx * 1e6 stays inside int64 on BOTH
        # engines (Spark would wrap silently where DuckDB raises — a
        # cross-engine divergence). An e^15.5 ~ 5.4e6x upweight is far
        # past mixture saturation; the clamp binds only on adversarial
        # corpora and is visible in the emitted excess_e6 column.
        .withColumn(
            "excess_e6",
            F.expr(
                "least(CAST(15500000 AS BIGINT),"
                " greatest(CAST(0 AS BIGINT), loss_e6 - ref_loss_e6))"
            ),
        )
        .withColumn(
            "baseline_e6", F.expr("(n_docs * 1000000) DIV n_total")
        )
    )
    base = with_exp2(
        base,
        f"(CAST(excess_e6 AS DOUBLE) / 1000000.0) / {LN2_LIT}",
        "__mult",
    )
    w = base.withColumn(
        "w_fx",
        F.expr(
            "CAST(round(CAST(baseline_e6 AS DOUBLE) * __mult + 1e-9, 0)"
            " AS BIGINT)"
        ),
    )
    t2 = F.broadcast(w.agg(F.sum("w_fx").alias("sum_w")))
    c = int(smoothing_e6)
    return (
        w.crossJoin(t2)
        .select(
            "domain",
            "n_docs",
            "total_bigrams",
            "loss_e6",
            "excess_e6",
            "baseline_e6",
            F.expr(
                f"({1_000_000 - c} * ((w_fx * 1000000) DIV sum_w)"
                f" + {c} * baseline_e6) DIV 1000000"
            ).alias("doremi_weight_e6"),
        )
        .orderBy("domain")
    )


def kneser_ney_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc bigram scores under KNESER-NEY smoothing (Kneser & Ney
    1995; the interpolated form of Chen & Goodman 1998) — the canonical
    n-gram smoothing next to bigram_lm_scores' add-k: probability mass
    discounted from observed bigrams is redistributed by CONTINUATION
    counts (how many contexts a word follows), which is what makes KN
    the default in every serious n-gram toolkit.

    With discount d = 1/2 the interpolated probability for an OBSERVED
    bigram (training corpus == scored corpus, so every scored bigram is
    observed) is the exact integer ratio

        p = (c12 - 1/2)/c1 + (N1+(w1·)/(2·c1)) · (N1+(·w2)/T)
          = ((2·c12 − 1)·2·T + 2·N1+(w1·)·N1+(·w2)) / (4·c1·T)

    so log2 p = (ln num − ln den)/ln 2 over TWO integer-argument
    portable lns — the engine-exact fixed-point pipeline of
    bigram_lm_scores, no new float surface. Integer range: num stays
    under 2^62 while c12·T < 2^60 — far beyond this report's scale; a
    web-scale run hashes features first (documented bound, not a
    silent cap).

    Same scale shape as add-k: one bigram explode, vocabulary-sized
    count tables (c1 + distinct-successor counts per w1, continuation
    counts per w2, scalar T) broadcast below the threshold."""
    bg = doc_bigrams(df, text_col, id_col).persist()
    try:
        c12 = (
            bg.groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("c12"))
            .localCheckpoint(eager=True)  # feeds c1/n1/nc/T AND the join
        )
        c1n1 = c12.groupBy("w1").agg(
            F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1w1")
        )
        nc = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("ncw2"))
        tt = c12.agg(F.count(F.lit(1)).alias("t"))
        small = c12.count() <= BROADCAST_MAX_ROWS
        if small:
            c1n1, nc = F.broadcast(c1n1), F.broadcast(nc)
        # Cell-granularity ln chains (see bigram_lm_scores): both ln
        # arguments depend only on the (w1, w2) cell's counts, so the
        # expensive chains run on the vocabulary-pair table and ONE
        # join attaches the finished lg2_e6 to the instances —
        # bit-identical per-instance values, ~10x fewer chain
        # evaluations.
        cell = (
            c12.join(c1n1, "w1").join(nc, "w2").crossJoin(F.broadcast(tt))
        )
        cell = with_ln(
            cell,
            "((2 * c12 - 1) * 2 * t + 2 * n1w1 * ncw2)",
            "__lnnum",
        )
        cell = with_ln(cell, "(4 * c1 * t)", "__lnden")
        lg2_e6 = F.expr(fixed_e6_expr(f"(__lnnum - __lnden) / {LN2_LIT}"))
        cell = cell.select("w1", "w2", lg2_e6.alias("__lg2_e6"))
        if small:
            cell = F.broadcast(cell)
        out = (
            bg.join(cell, ["w1", "w2"])
            .select(F.col(id_col), "__lg2_e6")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                F.sum("__lg2_e6").alias("__s"),
            )
            .select(
                id_col,
                "n_bigrams",
                F.expr(
                    "CAST(round(CAST(__s AS DOUBLE) / n_bigrams"
                    " + 1e-9, 0) AS BIGINT)"
                ).alias("avg_lg2_e6"),
            )
        )
        out = out.localCheckpoint(eager=True)
    finally:
        bg.unpersist()
    return out


#: the shared per-type JSD contribution (nats): p*ln(p/m) + q*ln(q/m)
#: with p = a/ta, q = b/tb, m = (p+q)/2 reduces to all-INTEGER ln args
#: — ln(2*a*tb) - ln(a*tb + b*ta) for the P side (symmetrically for Q)
#: — so the only doubles are the two weight ratios and the portable-ln
#: outputs, multiplied in ONE shared tree on both engines.
_JSD_ARG_A = "CASE WHEN a > 0 THEN 2 * a * tb ELSE 1 END"
_JSD_ARG_B = "CASE WHEN b > 0 THEN 2 * b * ta ELSE 1 END"
_JSD_ARG_D = "a * tb + b * ta"


def _jsd_term_sql() -> str:
    from firebase_etl_spark.functions.portable_math import dlit

    half, zero = dlit(0.5), dlit(0.0)
    pa = "(CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))"
    pb = "(CAST(b AS DOUBLE) / CAST(tb AS DOUBLE))"
    return (
        f"(CASE WHEN a > 0 THEN {pa} * (__lna - __lnd) ELSE {zero} END"
        f" + CASE WHEN b > 0 THEN {pb} * (__lnb - __lnd)"
        f" ELSE {zero} END) * {half}"
    )


def js_divergence_report(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-group unigram
    distributions — the bounded, symmetric corpus-drift distance
    (0 = identical token mix, ln 2 = disjoint) that mixture curation
    uses to quantify how far two slices' vocabularies sit apart; the
    distribution-level complement to events_psi_drift's per-metric
    screen and doc_source_drift's TV distance.

    Scale shape: one tokenize + (group, token) count, then each
    vocabulary row joins the g(g-1)/2 group-pair spine via a broadcast
    non-equi join (a type appears in at most g-1 pairs — vocabulary-
    sized work, never corpus-sized). All ln arguments are INTEGERS
    (see _JSD_ARG_*; exact while tokens_a * tokens_b < 2^62 — ~2e9
    tokens per group; past that run on the curation sample), each
    per-type term quantizes once at e6 and the pair JSD is an integer
    sum. Returns (lang_a, lang_b, n_tokens_a, n_tokens_b, n_types_a,
    n_types_b, n_types_shared, jsd_e6) per pair."""
    toks = (
        df.filter(
            F.col(group_col).isNotNull() & F.col(text_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("g"),
            F.explode(tokenize(text_col)).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    tf = toks.groupBy("g", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = tf.groupBy("g").agg(F.sum("c").cast("long").alias("t"))
    a_t = tot.select(
        F.col("g").alias("ga"), F.col("t").alias("ta")
    )
    b_t = tot.select(
        F.col("g").alias("gb"), F.col("t").alias("tb")
    )
    pr = F.broadcast(
        a_t.crossJoin(b_t).filter(F.col("ga") < F.col("gb"))
    )
    grid = (
        tf.join(
            pr,
            (F.col("g") == F.col("ga")) | (F.col("g") == F.col("gb")),
        )
        .groupBy("ga", "gb", "ta", "tb", "w")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("g") == F.col("ga"), F.col("c"))),
                F.lit(0),
            ).cast("long").alias("a"),
            F.coalesce(
                F.sum(F.when(F.col("g") == F.col("gb"), F.col("c"))),
                F.lit(0),
            ).cast("long").alias("b"),
        )
        .withColumn("arga", F.expr(_JSD_ARG_A))
        .withColumn("argb", F.expr(_JSD_ARG_B))
        .withColumn("argd", F.expr(_JSD_ARG_D))
    )
    grid = with_ln(grid, "arga", "__lna")
    grid = with_ln(grid, "argb", "__lnb")
    grid = with_ln(grid, "argd", "__lnd")
    per = grid.withColumn("t_e6", F.expr(fixed_e6_expr(_jsd_term_sql())))
    return (
        per.groupBy("ga", "gb")
        .agg(
            F.max("ta").alias("n_tokens_a"),
            F.max("tb").alias("n_tokens_b"),
            F.sum(F.when(F.col("a") > 0, 1).otherwise(0))
            .cast("long").alias("n_types_a"),
            F.sum(F.when(F.col("b") > 0, 1).otherwise(0))
            .cast("long").alias("n_types_b"),
            F.sum(
                F.when((F.col("a") > 0) & (F.col("b") > 0), 1)
                .otherwise(0)
            ).cast("long").alias("n_types_shared"),
            F.sum("t_e6").cast("long").alias("jsd_e6"),
        )
        .select(
            F.col("ga").alias("lang_a"),
            F.col("gb").alias("lang_b"),
            "n_tokens_a", "n_tokens_b",
            "n_types_a", "n_types_b", "n_types_shared",
            "jsd_e6",
        )
        .orderBy("lang_a", "lang_b")
    )


def chao1_richness_report(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Chao1 vocabulary-richness estimate per group (Chao 1984): how
    many distinct tokens does this slice REALLY have, counting the
    ones sampling hasn't surfaced yet — chao1 = D + f1^2/(2 f2) from
    the observed vocabulary D and the singleton/doubleton counts
    (bias-corrected D + f1(f1-1)/2 when f2 = 0). The coverage
    companion to unseen_mass_report's Good-Turing P_unseen: that says
    how much probability mass is unseen, this says how many TYPES —
    the number that tells you whether scaling a source 10x will keep
    yielding new vocabulary or just repeat itself.

    All-integer: (group, token) counts are exact; D, f1, f2, n are
    exact int64; the Chao1 correction quantizes once at e2 via
    truncating division (f1^2 * 100 must fit int64 — exact for
    f1 < ~3e8 singleton types; past that drop the e2 scale or shift). hapax_ratio_e6 = f1*1e6 DIV D. Scale shape:
    one explode -> map-side-combinable (group, token) counts -> one
    group-sized aggregate. Returns one row per group: (group_key,
    n_tokens, vocab_size, f1, f2, chao1_e2, hapax_ratio_e6)."""
    tf = (
        df.filter(
            F.col(group_col).isNotNull() & F.col(text_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("g"),
            F.explode(tokenize(text_col)).alias("term"),
        )
        .groupBy("g", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        tf.groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
            F.sum((F.col("c") == 2).cast("long")).cast("long").alias("f2"),
        )
        .select(
            F.col("g").alias("group_key"),
            "n_tokens", "vocab_size", "f1", "f2",
            F.expr(
                "CASE WHEN f2 > 0"
                " THEN vocab_size * 100 + (f1 * f1 * 100) DIV (2 * f2)"
                " ELSE vocab_size * 100 + (f1 * (f1 - 1) * 100) DIV 2"
                " END"
            ).cast("long").alias("chao1_e2"),
            F.expr(
                "CASE WHEN vocab_size > 0"
                " THEN (f1 * 1000000) DIV vocab_size"
                " ELSE CAST(NULL AS BIGINT) END"
            ).cast("long").alias("hapax_ratio_e6"),
        )
        .orderBy("group_key")
    )


def conditional_entropy_report(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Bigram conditional entropy H(next | current) in nats per group
    — the ENTROPY RATE of the token stream (first-order Markov
    approximation): how predictable is this source token-to-token.
    Low H(B|A) with normal unigram entropy is templated/boilerplate
    text; the sequence-level complement to documents_ngram_diversity's
    type counts and doc_entropy_report's marginal entropy.

        H(B|A) = (1/T) * sum_ab c_ab * (ln c_a - ln c_ab)

    over within-document bigrams, where c_a is the count of a as a
    bigram FIRST token (the row margin of the bigram table, so the
    distribution conditions on exactly the transitions scored). Both
    logs are the portable ln over exact integer counts; each bigram
    row's term quantizes ONCE at e6 (it is >= 0 since c_a >= c_ab) and
    integer-sums; the final division by T is a truncating integer op
    mirrored verbatim. Scale shape: one corpus explode -> (group, a,
    b) counts (map-side combinable), margins by one more groupBy, the
    grid join is hash-partitioned on (group, a) — vocabulary-pair
    sized, never corpus-sized. Returns one row per group: (group_key,
    n_bigrams, n_distinct_bigrams, cond_entropy_e6)."""
    from pyspark.sql import functions as F

    from firebase_etl_spark.functions.portable_math import (
        fixed_e6_expr,
        with_ln,
    )

    # the bigram pass is the SHARED doc_bigrams corpus pass (the same
    # slice + arrays_zip pipeline bigram_lm_scores / kn_lm train on),
    # keyed here by the GROUP column instead of a doc id — one bigram
    # implementation to audit, not a per-operator re-derivation
    filtered = df.filter(
        F.col(group_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(group_col).alias("g"), F.col(text_col).alias("__t"))
    pairs = doc_bigrams(filtered, "__t", "g").select(
        "g", F.col("w1").alias("a"), F.col("w2").alias("b")
    )
    cab = (
        pairs.groupBy("g", "a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # vocabulary-pair sized; 3 consumers
    )
    ca = cab.groupBy("g", "a").agg(F.sum("c").cast("long").alias("cf"))
    tot = cab.groupBy("g").agg(
        F.sum("c").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    )
    grid = cab.join(ca, ["g", "a"])
    grid = with_ln(grid, "cf", "__lna")
    grid = with_ln(grid, "c", "__lnab")
    per_g = (
        grid.select(
            "g",
            F.expr(
                fixed_e6_expr("c * (__lna - __lnab)")
            ).alias("term_e6"),
        )
        .groupBy("g")
        .agg(F.sum("term_e6").cast("long").alias("s_e6"))
    )
    return (
        per_g.join(tot, "g")
        .select(
            F.col("g").alias("group_key"),
            F.col("t").alias("n_bigrams"),
            F.col("nd").alias("n_distinct_bigrams"),
            F.expr(
                "CASE WHEN t > 0 THEN s_e6 DIV t"
                " ELSE CAST(NULL AS BIGINT) END"
            ).cast("long").alias("cond_entropy_e6"),
        )
        .orderBy("group_key")
    )


def simpson_diversity_report(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Simpson diversity of the token distribution per group — the
    collision-probability complement to the entropy/Chao1 richness
    family (Simpson 1949): lambda = sum c_i(c_i-1) / (T(T-1)) is the
    exact probability two tokens drawn without replacement are the
    SAME type (dominance), 1 - lambda the Gini-Simpson diversity, and
    1/lambda the effective vocabulary size under squared weighting —
    the q=2 Hill number beside the entropy report's q=1. A corpus
    whose inverse-Simpson collapses while its raw vocabulary holds is
    dominated by a few boilerplate tokens — a different failure than
    low richness.

    All integer: per-term counts from ONE corpus explode (map-side
    combinable), then per group T = sum c, S2 = sum c(c-1) — both
    exact; lambda quantizes once via the remainder-stepped
    big_e6_div (EXACT while T < ~9.6e7 tokens per group; beyond
    that, per-shard Simpson merges exactly by summing T and S2 —
    the production plan). Returns per group: (group_key, n_tokens,
    vocab_size, simpson_e6, gini_simpson_e6, inv_simpson_e2),
    ordered by group_key."""
    from firebase_etl_spark.functions.portable_math import big_e6_div_sql

    base = df.filter(
        F.col(group_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(group_col).alias("g"), tokenize(text_col).alias("tk"))
    cnt = (
        base.select("g", F.explode("tk").alias("t"))
        .groupBy("g", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = cnt.groupBy("g").agg(
        F.sum("c").cast("long").alias("t_tok"),
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("s2"),
    )
    lam = big_e6_div_sql("s2", "t_tok * (t_tok - 1)", "DIV")
    return (
        agg.select(
            F.col("g").alias("group_key"),
            F.col("t_tok").alias("n_tokens"),
            F.col("v").alias("vocab_size"),
            F.expr(
                f"CASE WHEN t_tok >= 2 THEN {lam}"
                " ELSE CAST(NULL AS BIGINT) END"
            ).cast("long").alias("simpson_e6"),
            F.expr(
                f"CASE WHEN t_tok >= 2 THEN 1000000 - ({lam})"
                " ELSE CAST(NULL AS BIGINT) END"
            ).cast("long").alias("gini_simpson_e6"),
            F.expr(
                "CASE WHEN t_tok < 2 OR s2 = 0"
                " THEN CAST(NULL AS BIGINT)"
                " ELSE (t_tok * (t_tok - 1) * 100) DIV s2 END"
            ).cast("long").alias("inv_simpson_e2"),
        )
        .orderBy("group_key")
    )
