"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line with per-query wall times.

Each query executes as ``collect()`` (driver materialization included, like
the oracle gate). A warmup pass on sf0.001 triggers JVM/codegen warmup so
the timed numbers reflect steady-state execution, not JIT compilation.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from firebase_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"

#: Drift canaries: trivial, plan-identical queries whose only round-to-
#: round variation is HOST speed (this shared host drifts ~2x between
#: runs — README "Benchmark environment variance"). Reference values are
#: the committed round-4 BENCH_FULL.json times at sf0.1. The emitted
#: ``drift_factor`` = median(now/ref) over these; divide any cross-round
#: per-query ratio by it before judging an engine change.
CANARY_REF_SF01 = {
    "customers_without_orders": 0.2645,
    "global_top100_orders": 0.2004,
    "order_point_lookup": 0.1374,
}

#: IO-side drift canary (VERDICT r11 #2): the three CPU canaries above
#: are tiny-plan CPU-bound queries and demonstrably do NOT track the
#: host's IO-side window swings (r11: untouched queries inflated 40-65%
#: while drift_factor read 1.17). This canary is a full-width scan of
#: the largest input (lineitem, every column forced via the noop sink —
#: decompress + decode bound, no shuffle), timed OUTSIDE the query
#: timings three times across the run; the emitted ``drift_factor_io``
#: = median(now) / ref. Reference = the median of the per-run medians
#: across r12's four full-bench runs at 32 cores / sf0.1 (0.36-0.53 s,
#: CPU-drift 0.6-0.8 windows) — so a neutral window reads ~1.0 and the
#: factor becomes informative cross-window/round.
IO_CANARY_REF_SF01 = 0.44


def _io_canary_sec(spark) -> float:
    """One full-column scan of lineitem through the noop sink (guide
    §1.4: computes every column of every row, discards the result)."""
    t0 = time.perf_counter()
    (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .write.format("noop").mode("overwrite").save()
    )
    return time.perf_counter() - t0


def _release_session_state(spark) -> None:
    """Drain accumulated session state between measurement blocks.

    93 queries x 3 runs leave localCheckpoint RDDs (CC loops, banded
    joins), broadcasts, and shuffle metadata queued on the async
    ContextCleaner; the resulting GC pressure inflates even single-scan
    queries ~1.5-4x (measured: trivial queries drop 0.6s -> 0.15s right
    after a forced full GC). Python gc drops the py4j refs, the JVM gc
    drains the cleaner queue — both OUTSIDE any query timer."""
    spark.catalog.clearCache()
    gc.collect()
    spark._jvm.System.gc()


def main() -> None:
    spark = get_spark(app_name="bench")
    queries = entrymod.queries()
    # optional subset mode for in-session A/B (comma-separated names in
    # $SPARK_GRAFT_BENCH_ONLY): times only those queries and does NOT
    # touch BENCH_FULL.json, which stays the committed full-run record
    only = {
        s for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if s
    }
    if only:
        queries = {n: f for n, f in queries.items() if n in only}

    # warmup: JVM/codegen/Python-worker spinup on the tiny SF keeps BOTH
    # timed passes steady-state, so min-of-2 never reports a
    # compile-inflated number. The tiny-SF warmups are latency-bound
    # (planning + codegen, not data), so batch queries warm CONCURRENTLY
    # from a thread pool — Spark's scheduler interleaves jobs from
    # multiple submitter threads — cutting warmup wall several-fold;
    # streaming queries keep a sequential pass (named memory-sink queries
    # must not race).
    from concurrent.futures import ThreadPoolExecutor

    def _warm(item):
        name, fn = item
        try:
            fn(spark, WARMUP_DIR).collect()
        except Exception:
            pass

    batch_q = [(n, f) for n, f in queries.items() if not n.startswith("stream_")]
    stream_q = [(n, f) for n, f in queries.items() if n.startswith("stream_")]
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(_warm, batch_q))
    for item in stream_q:
        _warm(item)

    _release_session_state(spark)

    # two timed passes, report the per-query MIN: this host shows rare
    # multi-second I/O stalls that land on arbitrary queries (a 0.9s query
    # was observed at 62s once); min-of-passes measures the engine, not the
    # stall lottery, while staying honest per query.
    timings: dict[str, float] = {}
    io_canary: list[float] = [_io_canary_sec(spark)]
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    def _emit_compact() -> None:
        """The driver archives only a 2000-char stdout tail, and a full
        per-query line for 130 queries is ~3 KB — so BENCH_r0N.json ended
        up with a truncated, unparseable record (r1-r3). Final line =
        compact summary (total, median, top-30 slowest at ms precision)
        that always fits the tail; the complete per-query record goes to
        BENCH_FULL.json beside the repo."""
        vals = sorted(timings.values())
        med = vals[len(vals) // 2] if vals else 0.0
        top = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:30]
        )
        batch_total = round(
            sum(v for k, v in timings.items()
                if not k.startswith("stream_")), 4
        )
        stream_total = round(
            sum(v for k, v in timings.items()
                if k.startswith("stream_")), 4
        )
        # host-drift factor from the canary queries (sf0.1 refs only
        # apply at sf0.1; other SFs report null rather than a bogus one)
        drift = None
        drift_io = None
        if abs(float(sf) - 0.1) < 1e-9:
            ratios = sorted(
                timings[q] / ref
                for q, ref in CANARY_REF_SF01.items()
                if q in timings
            )
            if ratios:
                drift = round(ratios[len(ratios) // 2], 3)
            if io_canary:
                med_io = sorted(io_canary)[len(io_canary) // 2]
                drift_io = round(med_io / IO_CANARY_REF_SF01, 3)
        if not only:
            full = {
                "metric": "total_query_wall_time",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": dict(sorted(timings.items())),
                "sf": float(sf),
                "drift_factor": drift,
                # streaming twins are BOUNDED restart-per-drive runs:
                # each timed number includes the stream start +
                # state-store + no-data-flush microbatch floor (~1-10s)
                # that a long-running production stream pays ONCE, not
                # per window — they are timed once-warm (a full untimed
                # drive at the bench SF precedes the timed one) and
                # reported apart from the batch total so the floor
                # can't be read as marginal cost (VERDICT r5 #6)
                "batch_total_sec": batch_total,
                "stream_total_sec": stream_total,
                "drift_factor_io": drift_io,
                "io_canary_secs": [round(v, 3) for v in io_canary],
            }
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json"),
                "w",
                encoding="utf-8",
            ) as fh:
                json.dump(full, fh, indent=1, sort_keys=True)
        print(
            json.dumps(
                {
                    "metric": "total_query_wall_time",
                    "value": round(sum(timings.values()), 4),
                    "unit": "sec",
                    "sf": float(sf),
                    "n_queries": len(timings),
                    "median_sec": round(med, 4),
                    "batch_total_sec": batch_total,
                    "stream_total_sec": stream_total,
                    "drift_factor": drift,
                    "drift_factor_io": drift_io,
                    "io_canary_secs": [round(v, 3) for v in io_canary],
                    "queries": {k: round(v, 3) for k, v in top.items()},
                    "subset": bool(only) or None,
                    "full_record": None if only else "BENCH_FULL.json",
                }
            ),
            flush=True,
        )

    # streaming twins: the bounded drive restarts the stream per run, so
    # a second timed pass re-pays the start/state-store/no-data-flush
    # floor instead of measuring anything new (r5's BENCH had
    # stream_transition_matrix at 12.7s of which ~all was floor x2).
    # Instead: ONE untimed full drive at the bench SF (true warm-up:
    # checkpoint dirs, state-store code paths, sink tables), then ONE
    # timed drive — same total wall as two timed passes, honest number.
    for name, fn in queries.items():
        if not name.startswith("stream_"):
            continue
        try:
            fn(spark, SF_DIR).collect()
        except Exception:
            pass
        _release_session_state(spark)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        _release_session_state(spark)

    io_canary.append(_io_canary_sec(spark))
    for _ in range(2):
        for name, fn in queries.items():
            if name.startswith("stream_"):
                continue
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            dt = round(time.perf_counter() - t0, 4)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            # full release between EVERY query (outside the timers): the
            # checkpoint-heavy dedup/CC queries cluster together in dict
            # order, and their dropped RDDs/broadcasts inflate the next
            # query 2-4x until a full JVM gc drains the ContextCleaner
            # (measured on simhash_near_dups: 2.8s steady vs 4-14s when
            # sharing a gc-debt window). Costs ~wall only, not timings.
            _release_session_state(spark)
        # one complete record per finished pass: if an external timeout
        # kills the process mid-pass-2, the last stdout line is still a
        # valid COMPACT result (pass-1 timings) that fits the driver's
        # 2000-char tail — the full line only goes to BENCH_FULL.json,
        # never stdout, so the tail can't end in a truncated record
        io_canary.append(_io_canary_sec(spark))
        _release_session_state(spark)
        _emit_compact()
    spark.stop()


if __name__ == "__main__":
    main()
