"""Dump `explain('formatted')` for named queries into plans/r11/.

Usage:
    python tools/explain_dump.py <suffix> <query> [<query> ...] [--sf <dir>]

Writes plans/r11/<query>_<suffix>.txt for each query (suffix is
`before` / `after` per the optimization-round deliverable). Queries that
eagerly materialize internally (localCheckpoint) show their FINAL-stage
plan, same convention as tools/plan_audit.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from firebase_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    suffix, names = args[0], args[1:]
    dest_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
    )
    os.makedirs(dest_dir, exist_ok=True)
    spark = get_spark(app_name="explain_dump")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        s = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(dest_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir}\n\n")
            fh.write(s)
        print(f"wrote {path}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
