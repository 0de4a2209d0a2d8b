"""Dump `explain('formatted')` for named queries into plans/<round>/.

Usage:
    python tools/explain_dump.py <suffix> <query> [<query> ...]
        [--sf <dir>] [--round r12]

Writes plans/<round>/<query>_<suffix>.txt for each query (suffix is
`before` / `after` per the optimization-round deliverable).

Queries that eagerly materialize internally (localCheckpoint) used to
show ONLY their final-stage plan — a 10-line `Scan ExistingRDD` stub
that hides every Exchange the optimization claims touch (VERDICT r11
item 7). This tool now intercepts ``DataFrame.localCheckpoint`` during
query construction and records each checkpointed stage's OWN formatted
plan, so the dump shows every pre-checkpoint stage followed by the
final plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from firebase_etl_spark.session import get_spark  # noqa: E402


def _fmt(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    round_dir = "r12"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--round" in args:
        i = args.index("--round")
        round_dir = args[i + 1]
        del args[i : i + 2]
    suffix, names = args[0], args[1:]
    dest_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        round_dir,
    )
    os.makedirs(dest_dir, exist_ok=True)
    spark = get_spark(app_name="explain_dump")
    qs = entrymod.queries()

    # patch the CONCRETE class (pyspark.sql.classic.DataFrame in Spark 4
    # overrides these; patching the abstract base never fires)
    DataFrame = type(spark.range(1))

    real_ckpt = DataFrame.localCheckpoint
    real_persist = DataFrame.persist
    stages: list[str] = []

    def _record(df, kind):
        # capture the stage's plan BEFORE the checkpoint replaces it
        # with a Scan ExistingRDD stub (or the cache hides it behind
        # an InMemoryTableScan)
        try:
            stages.append(f"[{kind}]\n" + _fmt(spark, df))
        except Exception as exc:  # plan printing must never break the query
            stages.append(f"<explain failed: {exc}>")

    def recording_ckpt(self, eager=True):
        _record(self, "localCheckpoint")
        return real_ckpt(self, eager=eager)

    def recording_persist(self, *a, **kw):
        _record(self, "persist")
        return real_persist(self, *a, **kw)

    for name in names:
        stages.clear()
        DataFrame.localCheckpoint = recording_ckpt
        DataFrame.persist = recording_persist
        try:
            df = qs[name](spark, sf_dir)
        finally:
            DataFrame.localCheckpoint = real_ckpt
            DataFrame.persist = real_persist
        final = _fmt(spark, df)
        path = os.path.join(dest_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir}\n")
            fh.write(
                f"# {len(stages)} materialized stage(s) + final plan\n\n"
            )
            for i, s in enumerate(stages, 1):
                fh.write(f"## stage {i}/{len(stages)}\n\n")
                fh.write(s)
                fh.write("\n")
            fh.write("## final plan\n\n")
            fh.write(final)
        print(f"wrote {path} ({len(stages)} ckpt stages)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
