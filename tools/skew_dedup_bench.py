"""Hot-key skew bench for the flagship dedup (round-5 verdict item #6).

SURVEY §7.3 names the realistic 100 TB failure for keep-latest-per-key:
ONE key (a default/placeholder email) holding a huge share of rows. The
single-window plan shuffles every row of that key into one task's sort;
the two-phase twin (max-struct partial agg + semi-join) map-side-combines
the hot key down to one row per input partition. This tool measures both
on a deliberately skewed fixture so the crossover is evidence, not
argument.

Fixture: events at $SPARK_GRAFT_SF_DIR amplified x20 (2M rows at sf0.1),
with ~30% of rows assigned one hot key and the rest spread over ~50k
keys. Deterministic (event_id arithmetic, no rand()).

Usage::

    python tools/skew_dedup_bench.py
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from firebase_etl_spark.operators.dedup import (  # noqa: E402
    dedup_keep_latest,
    dedup_keep_latest_two_phase,
)
from firebase_etl_spark.session import get_spark  # noqa: E402
from firebase_etl_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = int(os.environ.get("SKEW_AMPLIFY", "20"))
PASSES = 3


def build_fixture(spark):
    e = load_table(spark, "events", SF_DIR).select("event_id", "ts", "user_id")
    amp = e.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(AMPLIFY - 1))).alias("rep")
    )
    # unique row id (tiebreaker) + 30% of rows on ONE hot key
    return amp.select(
        (F.col("event_id") * AMPLIFY + F.col("rep")).alias("uid"),
        "ts",
        F.when(F.col("event_id") % 10 < 3, F.lit("hot@example.com"))
        .otherwise(F.concat(F.lit("u"), (F.col("user_id") % 50000)))
        .alias("k"),
    )


def main() -> None:
    spark = get_spark(app_name="skew-dedup-bench")
    df = build_fixture(spark).persist()
    n = df.count()
    hot = df.filter(F.col("k") == "hot@example.com").count()

    plans = {
        "single_window": lambda: dedup_keep_latest(
            df, key="k", order_col="ts", tiebreaker="uid"
        ),
        "two_phase": lambda: dedup_keep_latest_two_phase(
            df, key="k", order_col="ts", tiebreaker="uid"
        ),
    }

    # equivalence first: same survivor count and identical hot-key winner
    counts = {name: fn().count() for name, fn in plans.items()}
    assert counts["single_window"] == counts["two_phase"], counts
    winners = {
        name: fn()
        .filter(F.col("k") == "hot@example.com")
        .select("uid")
        .collect()[0][0]
        for name, fn in plans.items()
    }
    assert winners["single_window"] == winners["two_phase"], winners

    results = {}
    for name, fn in plans.items():
        fn().count()  # codegen warmup for this exact plan
        best = None
        for _ in range(PASSES):
            gc.collect()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            fn().count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
        print(json.dumps({"plan": name, "sec": results[name]}), flush=True)

    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "rows": n,
                "hot_key_rows": hot,
                "hot_share": round(hot / n, 3),
                "n_survivors": counts["two_phase"],
                "results": results,
                "speedup_two_phase": round(
                    results["single_window"] / results["two_phase"], 2
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
