"""A/B: broadcast-string-join decontamination vs the Bloom-bitmap path
at growing probe-set sizes (sf0.1 documents; min-of-3 after warmup;
output equality asserted before timing). The Bloom path's pitch is
probe sets too large to broadcast as strings — this measures where the
crossover actually sits on the gate corpus.

Usage: python tools/bloom_decontam_bench.py [sf_dir]
"""

from __future__ import annotations

import gc
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from firebase_etl_spark.operators.contamination import (  # noqa: E402
    bloom_decontamination_report,
    decontamination_report,
)
from firebase_etl_spark.session import get_spark  # noqa: E402
from firebase_etl_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark(app_name="bloom_ab")
    d = load_table(spark, "documents", SF_DIR)
    print(f"corpus: {d.count()} docs @ {SF_DIR}")
    for mod in (97, 11, 3):
        probes = d.filter(F.col("doc_id") % mod == 0)
        corpus = d.filter(F.col("doc_id") % mod != 0)
        exact = decontamination_report(corpus, probes, n=3, threshold=1)
        bloom = bloom_decontamination_report(
            corpus, probes, n=3, threshold=1, fpp=0.01
        )
        a = sorted(map(tuple, exact.collect()))
        b = sorted(map(tuple, bloom.collect()))
        assert a == b, f"outputs diverge at mod={mod}"
        times = {}
        for name, fn in (("exact", exact), ("bloom", bloom)):
            best = None
            for _ in range(3):
                spark.catalog.clearCache()
                gc.collect()
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                fn.collect()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            times[name] = round(best, 3)
        n_probe_grams = (
            probes.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(split(lower(trim(text)),"
                        " '\\\\s+')) - 2), i -> i)"
                    )
                )
            ).count()
        )
        print(
            f"probe 1/{mod}: ~{n_probe_grams} probe gram slots | "
            f"exact {times['exact']}s vs bloom {times['bloom']}s "
            f"({round(times['bloom'] / times['exact'], 2)}x)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
