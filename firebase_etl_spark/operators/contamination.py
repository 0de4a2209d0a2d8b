"""Benchmark decontamination — flag training documents that share word
n-grams with a held-out evaluation/benchmark set (the pre-training hygiene
step every LLM data pipeline runs before a corpus snapshot ships; extension
beyond the reference, which stops at exact-key dedup).

Semantics (the published recipe, e.g. GPT-3 appendix C / PaLM §6):
tokenize both sides, take each document's DISTINCT word n-grams, and count
per training document how many distinct n-grams also occur anywhere in the
benchmark set. A document with ``overlap >= threshold`` is contaminated.

Scale shape: benchmark sets are tiny next to the corpus (thousands of
probes vs billions of docs), so the probe n-gram set is deduped and
BROADCAST — the corpus side is one explode of per-doc distinct grams
(``array_distinct`` caps the explode at doc length, no corpus-wide
distinct) followed by a map-side hash-join and ONE shuffle keyed by doc_id
for the overlap count. Nothing quadratic, nothing driver-side.

At 100 TB you would key the join on ``xxhash64(gram)`` instead of the
string (fixed-width join keys, no long-string exchange); kept as strings
here so the DuckDB oracle replays the exact same values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from firebase_etl_spark.operators.text import word_shingles


def ngram_overlap(
    corpus: DataFrame,
    probes: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document distinct n-gram overlap with the probe set.

    Returns (id_col, overlap) for documents with overlap >= 1; docs with
    zero overlap are absent (join them back with a left join + coalesce 0,
    as decontamination_report does)."""
    probe_grams = (
        probes.select(F.explode(word_shingles(text_col, n)).alias("gram"))
        .distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram")
    )
    return (
        doc_grams.join(F.broadcast(probe_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("overlap"))
    )


def decontamination_report(
    corpus: DataFrame,
    probes: DataFrame,
    n: int = 8,
    threshold: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-``group_col`` contamination audit: how many documents would be
    dropped at ``overlap >= threshold``, the worst single-document overlap,
    and the contamination rate. One broadcast join + two keyed aggregates."""
    ov = ngram_overlap(corpus, probes, n, text_col, id_col)
    flagged = corpus.join(ov, id_col, "left").select(
        F.col(group_col),
        F.coalesce(F.col("overlap"), F.lit(0)).alias("overlap"),
    )
    return (
        flagged.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("overlap") >= threshold).cast("long")
            ).alias("n_contaminated"),
            F.max("overlap").alias("max_overlap"),
            F.sum("overlap").alias("total_overlap"),
            F.round(
                F.avg((F.col("overlap") >= threshold).cast("double")), 6
            ).alias("contamination_rate"),
        )
        .orderBy(group_col)
    )
