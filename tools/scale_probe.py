"""Scale spot-check ABOVE the gate SF (VERDICT r5 #7): replicate the
sf0.1 tables 10x into a scratch dir ("sf1-ish": 10x the orders/events/
documents over the SAME part/customer catalog — the realistic growth
axis) and time the heaviest batch queries at both scales, printing the
wall-time ratio per query. A query scaling far above ~10x for 10x data
has a super-linear plan and gets a written explanation in the round
notes.

Replication semantics (why these, explicitly):
- lineitem/orders: keys offset per replica (new orders), PART and
  CUSTOMER keys unchanged — the co-purchase graph gets 10x baskets over
  a fixed catalog, so degrees grow ~10x (the hard direction for the
  graph queries; new-parts-per-replica would just shard the graph).
- documents: new doc_ids, text gains one per-replica trailing token —
  replicas are DISTINCT documents but mutual near-duplicates (clusters
  of ~10), which stresses the near-dup pipelines the way a real crawl
  with mirrored pages does.
- embeddings: new vec_ids, vectors copied (ANN cost depends on corpus
  size, not vector values; exact ties break on id).

The CAPPED section re-times the near-dup trio with the banded-subset
mode on (max_bucket_docs — VERDICT r6 #6): pair emission inside each
shingle bucket is bounded by the cap, so the 13-45x output-bound growth
of the uncapped runs must collapse toward linear; the exact truncation
counts are printed next to the ratios (the no-silent-caps rule).

Usage: python tools/scale_probe.py [n_copies] [--capped-only]
(default 10 copies; --capped-only skips the uncapped HEAVY sweep and
reuses an existing tmp_sfbig build when present).
Writes nothing outside /root/repo/tmp_sfbig (gitignored).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from firebase_etl_spark.session import get_spark  # noqa: E402
from firebase_etl_spark.sources.tables import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
DEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tmp_sfbig"
)

HEAVY = [
    "embedding_topk_ivf_trained",
    "embedding_kmeans_clusters",
    "documents_curation_v2",
    "doc_neardup_ensemble",
    "part_copurchase_triangles",
    "part_similar_items",
    "doc_containment_near_dups",
    "doc_prefix_filter_near_dups",
    "part_copurchase_kcore",
    "part_copurchase_assortativity",
]

#: tables the HEAVY set reads, with their replica transforms
ID_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    # r8: the F-S linkage probe reads customer; names are REBUILT from
    # the offset key (TPC-H convention) so replicas are distinct
    # records — identical names would be genuinely ambiguous matches
    # and blow the blocking stage up quadratically by construction
    "customer": ["c_custkey"],
}

#: dimension tables copied VERBATIM (not replicated): fact replicas
#: keep their original foreign keys, so a replicated dim would break
#: join semantics; these exist only so session-3 probe queries that
#: join part/nation resolve against tmp_sfbig
PASSTHRU = ["part", "nation", "region", "supplier"]


def build(spark, n_copies: int) -> None:
    shutil.rmtree(DEST, ignore_errors=True)
    os.makedirs(DEST, exist_ok=True)
    for table, id_cols in ID_COLS.items():
        df = load_table(spark, table, BASE)
        offs = {
            c: int(df.agg(F.max(c)).collect()[0][0] or 0) + 1
            for c in id_cols
        }
        parts = []
        for i in range(n_copies):
            rep = df
            for c, off in offs.items():
                rep = rep.withColumn(c, F.col(c) + F.lit(i * off))
            if table == "documents":
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" r{i}"))
                )
            if table == "customer":
                rep = rep.withColumn(
                    "c_name",
                    F.concat(
                        F.lit("Customer#"),
                        F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DEST}/{table}.parquet")
        print(f"built {table} x{n_copies}", flush=True)
    for table in PASSTHRU:
        load_table(spark, table, BASE).write.mode("overwrite").parquet(
            f"{DEST}/{table}.parquet"
        )
        print(f"copied {table} (dim, verbatim)", flush=True)


#: round-8 additions probed with --new-ops (same replica fixture; note
#: the fixture makes every document a member of a ~10-replica mutual
#: near-dup cluster, the adversarial direction for pair-enumerating ops)
NEW_OPS = [
    # round-11 additions (earlier rounds' probe tables are recorded in
    # ROUND{N}_NOTES; the list rotates to whatever the current session
    # shipped). Calendar-spine ops (Mann-Kendall, Theil-Sen, ACF,
    # Friedman) should be near-FLAT at 10x rows (same spine, denser
    # per-period aggregates); rank/concentration ops near-linear.
    "orders_mann_kendall",
    "orders_theil_sen_trend",
    "customer_revenue_gini_exact",
    "events_friedman_test",
    "doc_langid_kappa",
    "events_benford_audit",
    "nation_revenue_hhi",
    "events_autocorr_daily",
    "documents_simpson_diversity",
    "orders_qq_drift",
    # perf-fix regression probes: the r11 two-phase grouped-rank
    # migrations must still scale at/below linear (and now with real
    # parallelism instead of k tasks)
    "orders_winsorized_stats",
    "orders_conformal_intervals",
    "documents_mixture_sample",
    "documents_temperature_mixture",
    "events_key_skew_profile",
    "events_ks_drift",
    "events_quantile_normalization",
    "lineitem_percentiles_approx",
    "orders_jonckheere_trend",
    "documents_entropy_rate",
    # r11 late-batch additions
    "orders_dow_seasonality",
    "customer_abc_analysis",
    "lineitem_ols_slope",
    "customer_interpurchase_stats",
]


#: banded-subset cap used in the capped probe rows: the replica fixture
#: builds mutual-dup clusters of ~n_copies, so a cap below that forces
#: real truncation while healthy buckets pass through untouched
PROBE_CAP = 8


def capped_variants():
    from firebase_etl_spark.operators.dedup_approx import (
        containment_near_dups,
        prefix_filter_near_dups,
    )
    from firebase_etl_spark.plans import queries_ext as QX

    def contain(spark, sf, trunc):
        d = load_table(spark, "documents", sf)
        return containment_near_dups(
            d, 0.8, 3, max_bucket_docs=PROBE_CAP, truncation=trunc
        )

    def prefix(spark, sf, trunc):
        d = load_table(spark, "documents", sf)
        return prefix_filter_near_dups(
            d, 0.5, 3, max_bucket_docs=PROBE_CAP, truncation=trunc
        )

    def curation(spark, sf, trunc):
        out = QX.documents_curation_v2(
            spark, sf, max_bucket_docs=PROBE_CAP
        )
        return out

    return [
        ("doc_containment_near_dups[cap]", contain),
        ("doc_prefix_filter_near_dups[cap]", prefix),
        ("documents_curation_v2[cap]", curation),
    ]


def run_capped(spark, n_copies: int) -> None:
    print(
        f"\nCAPPED (max_bucket_docs={PROBE_CAP}):"
        f" per-bucket pair emission bounded, truncation reported"
    )
    print(f"| query | sf0.1 s (trunc) | x{n_copies} s (trunc) | ratio |")
    print("|---|---|---|---|")
    for name, fn in capped_variants():
        def timed(sf):
            trunc: dict = {}
            t0 = time.perf_counter()
            rows = fn(spark, sf, trunc).collect()
            wall = time.perf_counter() - t0
            if rows and "trunc_postings_dropped" in rows[0].asDict():
                # curation surfaces the count as a report column
                trunc["postings_dropped"] = rows[0][
                    "trunc_postings_dropped"
                ]
            return wall, len(rows), trunc

        fn(spark, "/root/testdata/sf0.01", {}).collect()  # codegen warm
        small, n_small, t_small = timed(BASE)
        big, n_big, t_big = timed(DEST)
        print(
            f"| {name} | {small:.2f}"
            f" (drop {t_small.get('postings_dropped', 0)},"
            f" rows {n_small}) | {big:.2f}"
            f" (drop {t_big.get('postings_dropped', 0)},"
            f" rows {n_big}) | {big / small:.2f}x |",
            flush=True,
        )
        spark.catalog.clearCache()


def run_list(spark, names, n_copies: int) -> None:
    qs = entrymod.queries()
    print(f"| query | sf0.1 s | x{n_copies} s | ratio |")
    print("|---|---|---|---|")
    for name in names:
        fn = qs[name]
        fn(spark, "/root/testdata/sf0.01").collect()  # codegen warm
        t0 = time.perf_counter()
        fn(spark, BASE).collect()
        small = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, DEST).collect()
        big = time.perf_counter() - t0
        print(
            f"| {name} | {small:.2f} | {big:.2f} |"
            f" {big / small:.2f}x |",
            flush=True,
        )
        spark.catalog.clearCache()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_copies = int(args[0]) if args else 10
    capped_only = "--capped-only" in sys.argv
    new_ops = "--new-ops" in sys.argv
    spark = get_spark(app_name="scale_probe")
    reuse = (capped_only or new_ops) and os.path.exists(
        f"{DEST}/documents.parquet"
    )
    if not reuse:
        build(spark, n_copies)
    if new_ops:
        run_list(spark, NEW_OPS, n_copies)
        spark.stop()
        return
    if not capped_only:
        run_list(spark, HEAVY, n_copies)
    run_capped(spark, n_copies)
    spark.stop()


if __name__ == "__main__":
    main()
