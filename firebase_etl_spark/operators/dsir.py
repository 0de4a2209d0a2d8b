"""DSIR-style importance weights for data selection — score every source
document by how target-like its token distribution is (the importance-
resampling curation step of an LLM data pipeline; extension beyond the
reference, after Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", public arXiv:2302.03169).

The published recipe fits two bag-of-(hashed-)n-gram unigram models — one
on the target distribution (Wikipedia/books), one on the raw source — and
weights each raw document by its log likelihood ratio; resampling by
those weights shifts the corpus toward the target. Re-expressed
relationally, the whole thing is two count aggregates and one scoring
join over a single token explode:

    toks      = (doc, w [, in_target]) rows       [one explode]
    c_src     = count per w over ALL docs         [source unigram LM]
    c_tgt     = count per w over target docs      [target unigram LM]
    log-ratio = ln((c_tgt+1)/(T+V)) - ln((c_src+1)/(S+V))   [add-1]
    weight    = sum over doc tokens of log-ratio  [per-doc log weight]

DETERMINISM: the per-doc reduction is a FIXED-POINT integer sum. Each
vocabulary row's log-ratio is scaled by 1e6, nudged +1e-9 and rounded to
a BIGINT once, and per-doc weights are integer sums of those BIGINTs —
integer addition is associative, so the result is bit-identical across
partitionings, schedulers, and engines (the segment_priority_chisq
pattern; a raw double sum here flaked on a 6-dp rounding boundary in
round 4's driver snapshot). The float ``log_weight`` column is derived
from the integer by one division, never the other way around.

CROSS-ENGINE DETERMINISM: the logarithms themselves use the portable
libm-free ``ln`` (functions/portable_math.py) — JVM ``Math.log`` and
DuckDB's ``ln`` are each correctly rounded only for the BASIC IEEE ops,
and may differ by one ulp on the same rational, which the 1e-6 rounding
turned into a ±1 BIGINT flip in the round-4/5 driver snapshots. The
log-ratio is decomposed as ln(c_tgt+1) - ln(T+V) - ln(c_src+1) + ln(S+V)
(four integer-argument lns), each evaluated by the shared generated
expression chain, so both engines produce the same 64-bit double before
the single rounding.

Scale shape: identical to the bigram trainer in lm.py — count tables are
vocabulary-sized (orders of magnitude smaller than the corpus) so the
scoring join broadcasts below a row threshold and falls back to a
token-keyed shuffle join above it; per-doc reduction is one map-side-
combinable integer sum. The returned plan is LAZY: only the vocab-sized
ratio table is materialized (localCheckpoint) at build time; the corpus
explode re-runs inside the caller's single action — two corpus passes
total (train, score), exactly the DSIR-at-scale I/O shape, and the
upstream plan stays visible to plan audits. At web scale the feature key
is a 10k-bucket hash of the n-gram (the paper's formulation) — raw
unigrams kept here so the DuckDB oracle replays training and scoring
exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from firebase_etl_spark.functions.portable_math import lr_e6_expr, with_ln
from firebase_etl_spark.operators.text import tokenize

#: broadcast the unigram count tables while they stay vocabulary-sized
BROADCAST_MAX_ROWS = 3_000_000


def _with_ratio(counts: DataFrame, denom_t: int, denom_s: int) -> DataFrame:
    """Append the fixed-point log-ratio column ``lr_e6`` to a
    (w, c_src, c_tgt) count table via the four portable lns — the ONE
    expression tree both dsir entry points (and the DuckDB oracles)
    share, so the model is bit-identical wherever it is rebuilt."""
    rt = with_ln(counts, "(c_tgt + 1)", "__lnct")
    rt = with_ln(rt, "(c_src + 1)", "__lncs")
    rt = with_ln(rt, str(denom_t), "__lndt")
    rt = with_ln(rt, str(denom_s), "__lnds")
    return rt.withColumn(
        "lr_e6",
        F.expr(lr_e6_expr("__lnct", "__lndt", "__lncs", "__lnds")),
    ).drop("__lnct", "__lncs", "__lndt", "__lnds")


def dsir_vocab_ratios(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The vocabulary-sized DSIR model table itself:
    (w, c_src, c_tgt, lr_e6). This is the diagnostic surface for the
    driver gate — grouping it by an md5 bucket of ``w`` yields a pure
    integer fingerprint of (tokenizer output × portable-ln model) with
    no per-document scoring in the way, so a cross-engine divergence
    localizes to the model-build stage. One corpus pass (counts are
    checkpointed before the scalar-totals action so the explode is not
    re-run for the ratio plan)."""
    toks = df.select(
        F.col(id_col),
        F.explode(tokenize(text_col)).alias("w"),
        F.coalesce(target.cast("boolean"), F.lit(False)).alias("__tgt"),
    )
    counts = (
        toks.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("c_src"),
            F.sum(F.col("__tgt").cast("long")).alias("c_tgt"),
        )
        .localCheckpoint(eager=True)
    )
    tot = counts.agg(
        F.sum("c_src").alias("s_tot"),
        F.sum("c_tgt").alias("t_tot"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    denom_t = int(tot["t_tot"] or 0) + int(tot["v"])
    denom_s = int(tot["s_tot"] or 0) + int(tot["v"])
    return _with_ratio(counts, denom_t, denom_s)


def dsir_log_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc (id, n_tokens, log_weight_e6, log_weight): the add-1-
    smoothed unigram log likelihood ratio of ``target`` rows vs the full
    corpus, summed over the document's tokens. ``log_weight_e6`` is the
    exact fixed-point BIGINT (1e-6 units; sum of per-vocabulary-row
    rounded contributions — associative, partition-order-deterministic);
    ``log_weight`` is the display double ``log_weight_e6 / 1e6``.
    Positive = more target-like than the corpus average; resample
    ∝ exp(weight) to shift the mixture toward the target. ``target`` is
    any boolean Column over ``df``'s rows (e.g. a quality flag or
    language id); NULL target values count as not-in-target on both
    engines."""

    def toks_plan() -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(tokenize(text_col)).alias("w"),
            F.coalesce(target.cast("boolean"), F.lit(False)).alias("__tgt"),
        )

    toks = toks_plan().persist()
    try:
        counts = toks.groupBy("w").agg(
            F.count(F.lit(1)).alias("c_src"),
            F.sum(F.col("__tgt").cast("long")).alias("c_tgt"),
        )
        # ONE aggregation job yields the exact-integer totals AND the
        # vocabulary size for the broadcast decision (a separate
        # counts.count() would re-run the token aggregate just for the
        # hint); the scalars re-enter the plan as literals
        tot = counts.agg(
            F.sum("c_src").alias("s_tot"),
            F.sum("c_tgt").alias("t_tot"),
            F.count(F.lit(1)).alias("v"),
        ).collect()[0]
        # sums are NULL on an empty corpus (counts has no rows); the
        # ratio plan is empty then too, so the degenerate ln(0) chains
        # below fold to finite garbage that never reaches a row
        denom_t = int(tot["t_tot"] or 0) + int(tot["v"])
        denom_s = int(tot["s_tot"] or 0) + int(tot["v"])
        # four portable (libm-free) lns: two per-row integer args, two
        # scalar literals Catalyst constant-folds with the same IEEE
        # ops DuckDB applies to its (t_tot + v)/(s_tot + v) columns
        ratio = _with_ratio(counts, denom_t, denom_s).select("w", "lr_e6")
        # materialize ONLY the vocab-sized model (computed from the
        # still-cached toks); the returned per-doc plan stays lazy so the
        # caller's action — not this builder — pays the scoring pass
        ratio = ratio.localCheckpoint(eager=True)
        if int(tot["v"]) <= BROADCAST_MAX_ROWS:
            ratio = F.broadcast(ratio)
    finally:
        toks.unpersist()
    return (
        toks_plan()
        .join(ratio, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr_e6").alias("log_weight_e6"),
        )
        .withColumn("log_weight", F.col("log_weight_e6") / F.lit(1000000.0))
    )
