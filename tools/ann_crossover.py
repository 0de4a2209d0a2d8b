"""Probe-heavy ANN crossover measurement (round-5 verdict item #4).

The per-variant docstrings in operators/similarity.py argue the ANN
variants pay off only when the probe count amortizes their index cost
(RP: projection costs out_dim dots/row vs brute force's p dots/row, so
it pays when p > out_dim; IVF: the assignment pass is probe-independent
and each probe then scans ~n_probe/M of the corpus). The default gate
queries use 5 probes — far below every crossover — so at sf0.1 every
ANN variant benches at or above brute force. This tool measures the
claim instead of leaving it as flop arithmetic: brute vs RP vs IVF at
increasing probe counts on the sf0.1 corpus.

Usage::

    python tools/ann_crossover.py            # sf0.1, probes 5/128/512
    SPARK_GRAFT_SF_DIR=... python tools/ann_crossover.py

Prints one JSON line per (variant, n_probes) cell plus a final summary
line; paste the table into the round notes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from firebase_etl_spark.operators import similarity as SIM  # noqa: E402
from firebase_etl_spark.session import get_spark  # noqa: E402
from firebase_etl_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"
PROBE_COUNTS = (5, 128, 512)
PASSES = 3  # min-of-N vs the host's I/O stall lottery

RP_PLANES = SIM.rp_planes(out_dim=32, in_dim=64, seed=13)


def variants(e, ids):
    return {
        "brute": lambda: SIM.cosine_topk(e, ids, k=10),
        "rp": lambda: SIM.rp_topk(e, ids, RP_PLANES, k=10, oversample=8),
        "ivf": lambda: SIM.ivf_topk(e, ids, k=10, n_probe=4),
    }


def main() -> None:
    import gc

    spark = get_spark(app_name="ann-crossover")
    e = load_table(spark, "embeddings", SF_DIR).persist()
    n_corpus = e.count()  # also materializes the persist

    # JVM/codegen warmup on the tiny SF
    ew = load_table(spark, "embeddings", WARMUP_DIR)
    for fn in variants(ew, [0, 1, 2, 3]).values():
        fn().collect()

    results: dict[str, dict[int, float]] = {}
    for p in PROBE_COUNTS:
        ids = list(range(p))
        for name, fn in variants(e, ids).items():
            best = None
            for _ in range(PASSES):
                spark.catalog.clearCache()
                e.persist()
                e.count()
                gc.collect()
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                fn().collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[p] = round(best, 3)
            print(
                json.dumps(
                    {"variant": name, "n_probes": p, "sec": round(best, 3)}
                ),
                flush=True,
            )
    summary = {
        "sf_dir": SF_DIR,
        "n_corpus": n_corpus,
        "k": 10,
        "passes": PASSES,
        "results": results,
        "crossover": {
            v: [
                p
                for p in PROBE_COUNTS
                if results[v][p] < results["brute"][p]
            ]
            for v in results
            if v != "brute"
        },
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
