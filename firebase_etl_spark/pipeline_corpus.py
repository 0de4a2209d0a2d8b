"""End-to-end curated-corpus materialization — the "L" of the corpus ETL:
run the curation pipeline (quality gate -> exact dedup -> near-dup
keep-one; the same stages the oracle-checked `documents_training_corpus`
report query audits) and WRITE the surviving corpus as
language-partitioned parquet with a manifest.

Output layout (the layout a downstream tokenizer/packing job consumes):

    <out_dir>/corpus/lang=<lang>/part-*.parquet   (zstd, partitioned)
    <out_dir>/manifest.json                        (per-lang doc/token
                                                    counts + content id)

The manifest's per-language rows come from ONE aggregate over the
survivors (computed before the write from the same persisted stage, so
write and manifest cannot disagree), and `content_md5` fingerprints the
ordered survivor id set — a cheap integrity check a resumed or repeated
run can compare against. Partitioning by language keeps per-language
consumers (mixture sampling, per-lang tokenizers) pruning at the
directory level instead of scanning the corpus.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from firebase_etl_spark.plans.queries_ext import (
    curated_exact_kept,
    curated_survivors,
)


def curate_and_write(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict:
    """Materialize the curated corpus under ``out_dir``; returns the
    manifest dict (also written to ``out_dir``/manifest.json)."""
    exact_kept = curated_exact_kept(spark, sf_dir)
    try:
        survivors = curated_survivors(exact_kept).localCheckpoint(eager=True)
    finally:
        exact_kept.unpersist()

    per_lang = (
        survivors.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list("doc_id")))
            ).alias("content_md5"),
        )
        .orderBy("lang")
        .collect()
    )

    corpus_path = os.path.join(out_dir, "corpus")
    (
        survivors.select("doc_id", "text", "lang", "source", "n_tokens", "quality")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(corpus_path)
    )

    manifest = {
        "source_sf_dir": sf_dir,
        "corpus_path": corpus_path,
        "languages": [
            {
                "lang": r["lang"],
                "n_docs": r["n_docs"],
                "total_tokens": r["total_tokens"],
                "content_md5": r["content_md5"],
            }
            for r in per_lang
        ],
        "n_docs": sum(r["n_docs"] for r in per_lang),
        "total_tokens": sum(r["total_tokens"] for r in per_lang),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
