"""Profile ONE bounded streaming drive phase by phase (guide §1).

Usage: python tools/stream_profile.py [query ...]

Times, for each named stream query at $SPARK_GRAFT_SF_DIR (default
sf0.1): plan construction, query start(), processAllAvailable(), the
no-data flush wait, stop(), and the memory-sink read — by monkey-
patching the phase boundaries inside run_stream_to_memory. Prints one
line per phase so the restart floor (VERDICT r11 item 4) is attributed,
not guessed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from firebase_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:] or ["stream_hourly_event_counts"]
    spark = get_spark(app_name="stream_profile")
    qs = entrymod.queries()

    import firebase_etl_spark.streaming.events as SE

    real = SE.run_stream_to_memory

    def profiled(spark, plan, name, output_mode="append", state_partitions=8):
        import shutil
        import tempfile

        marks = [("t0", time.perf_counter())]

        def mark(label):
            marks.append((label, time.perf_counter()))

        ckpt_root = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
        ckpt = f"{ckpt_root}/spark-stream-ckpt/{name}"
        conf = spark.conf
        old_parts = conf.get("spark.sql.shuffle.partitions")
        old_idle = conf.get(
            "spark.sql.streaming.noDataProgressEventInterval", "10000"
        )
        if state_partitions is not None:
            conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        conf.set("spark.sql.streaming.noDataProgressEventInterval", "1000")
        try:
            q = (
                plan.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .start()
            )
            mark("start()")
            try:
                q.processAllAvailable()
                mark("processAllAvailable")
                if output_mode == "append":
                    SE._await_no_data_batch(q)
                    mark("await_no_data")
                prog = [
                    (p["batchId"], p["numInputRows"],
                     round(p["durationMs"].get("triggerExecution", 0) / 1000.0, 3))
                    for p in q.recentProgress if p
                ]
            finally:
                q.stop()
                mark("stop()")
        finally:
            if state_partitions is not None:
                conf.set("spark.sql.shuffle.partitions", old_parts)
            conf.set(
                "spark.sql.streaming.noDataProgressEventInterval", old_idle
            )
            shutil.rmtree(ckpt, ignore_errors=True)
        mark("cleanup")
        prev = marks[0][1]
        for label, t in marks[1:]:
            print(f"    {label:>22}: {t - prev:6.3f}s")
            prev = t
        print(f"    batches (id, rows, trigger_s): {prog}")
        return spark.sql(f"SELECT * FROM {name}")

    for qname in names:
        print(f"== {qname} ==")
        SE.run_stream_to_memory = profiled
        try:
            t0 = time.perf_counter()
            df = qs[qname](spark, SF_DIR)
            rows = df.collect()
            print(f"  total {time.perf_counter() - t0:.3f}s, {len(rows)} rows")
        finally:
            SE.run_stream_to_memory = real
    spark.stop()


if __name__ == "__main__":
    main()
