"""A/B evidence for bm25_topk's plan choices (operators/retrieval.py):
the shipped plan (broadcast SEMI join on probe terms BEFORE the corpus
exchange + window-df linear chain) vs the naive formulation (full-corpus
tf aggregate reused by three consumers, df via groupBy + join-back).

The naive shape is what a straightforward translation writes — and it
looks fine in a plan review until you notice ReusedExchange never fires
(column pruning differentiates the exchanges), so the corpus tokenize
and shuffle run once per consumer.

Usage: python tools/bm25_pruning_bench.py [sf_dir] [n_probes ...]
Prints min-of-3 wall times per variant at each probe count.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from firebase_etl_spark.operators.retrieval import bm25_topk  # noqa: E402
from firebase_etl_spark.operators.text import tokenize  # noqa: E402
from firebase_etl_spark.session import get_spark  # noqa: E402
from firebase_etl_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PROBES = [int(x) for x in sys.argv[2:]] or [5, 64]


def bm25_topk_naive(
    df: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """The pre-rewrite shape: full-corpus tf feeding probe terms, df, and
    postings as three consumers; df joined back. Numerically identical
    output — only the plan differs."""
    k1, b = 1.2, 0.75
    base = df.select(F.col("doc_id"), tokenize("text").alias("toks"))
    toks = base.select(
        "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
    )
    tf = toks.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("toks")).alias("tdl")
    ).collect()[0]
    n_docs = int(tot["n"])
    avgdl = F.lit(int(tot["tdl"] or 0) / n_docs)
    qt = (
        tf.filter(F.col("doc_id").isin(query_ids))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dfq = df_.join(F.broadcast(qt.select("term").distinct()), "term")
    idf = F.log(
        1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfc = (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(qt), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(dfq), "term")
        .select(
            "query_id",
            "doc_id",
            F.round(idf * tfc * 1000000.0 + 1e-9, 0)
            .cast("long")
            .alias("c_e6"),
        )
    )
    pair = scored.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"), F.sum("c_e6").alias("score_e6")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_e6"), "doc_id")
    return (
        pair.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "n_terms",
            (F.col("score_e6") / 1000000.0).alias("score"),
            "rank",
        )
    )


def main() -> None:
    spark = get_spark(app_name="bm25-pruning-bench")
    d = load_table(spark, "documents", SF_DIR).persist()
    n_docs = d.count()
    print(f"corpus: {n_docs} docs at {SF_DIR}")
    for n_probes in PROBES:
        ids = list(range(n_probes))
        # equality first: same rows from both plans
        a = sorted(map(tuple, bm25_topk(d, ids, k=10).collect()))
        bq = sorted(map(tuple, bm25_topk_naive(d, ids, k=10).collect()))
        assert a == bq, f"variants diverge at {n_probes} probes"
        times = {}
        for name, fn in (("pruned", bm25_topk), ("naive", bm25_topk_naive)):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                fn(d, ids, k=10).count()
                best = min(best, time.time() - t0)
            times[name] = best
        ratio = times["pruned"] / times["naive"]
        print(
            f"probes={n_probes:4d}  pruned={times['pruned']:.2f}s  "
            f"naive={times['naive']:.2f}s  ratio={ratio:.2f}"
        )
    d.unpersist()


if __name__ == "__main__":
    main()
