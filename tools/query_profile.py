"""Per-query phase profile: construction (eager materializations) vs
final collect, with Spark job counts for each phase (guide §1).

Usage: python tools/query_profile.py <query> [<query> ...] [--sf <dir>] [--n 3]

For each query, runs n passes and prints min construction / collect
seconds and the job counts per phase — the direct read-out of the
per-query eager-job floor the rank-helper/checkpoint work targets.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from firebase_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = 3
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i : i + 2]
    names = args
    spark = get_spark(app_name="query_profile")
    qs = entrymod.queries()
    tracker = spark.sparkContext.statusTracker()

    def jobs():
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    # warmup at the tiny SF
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass
    for name in names:
        best = None
        for _ in range(n):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            j0 = jobs()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            j1 = jobs()
            rows = df.collect()
            t2 = time.perf_counter()
            j2 = jobs()
            rec = (t2 - t0, t1 - t0, t2 - t1, j1 - j0, j2 - j1, len(rows))
            if best is None or rec[0] < best[0]:
                best = rec
        tot, tc, tl, jc, jl, nr = best
        print(
            f"{name}: total={tot:6.3f}s  construct={tc:6.3f}s ({jc} jobs)"
            f"  collect={tl:6.3f}s ({jl} jobs)  rows={nr}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
