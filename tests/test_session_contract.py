"""Driver-session contract: queries must be correct on sessions WE did not
build — any session timezone, no legacy-nanos conf, no session.py defaults.

Pins the two load_table normalizations (sources/tables.py): the
PARQUET_TYPE_ILLEGAL runtime retry, and the session-tz-independent
timestamp_ntz -> UTC-instant rebuild via make_timestamp(..., 'UTC').
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb

from firebase_etl_spark.sources.tables import load_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _events_epoch_bounds(spark, sf_dir):
    from pyspark.sql import functions as F

    row = (
        load_table(spark, "events", sf_dir)
        .agg(
            F.unix_micros(F.min("ts")).alias("lo"),
            F.unix_micros(F.max("ts")).alias("hi"),
        )
        .collect()[0]
    )
    return row["lo"], row["hi"]


def _duckdb_epoch_bounds(sf_dir):
    con = duckdb.connect()
    lo, hi = con.sql(
        f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    con.close()
    return lo, hi


def test_ntz_path_session_timezone_independent(spark, sf_dir):
    """With nanosAsLong off, events.ts arrives as timestamp_ntz; the loader's
    rebuild must yield the same UTC instants for ANY session timezone, and
    they must equal both the bigint-path result and DuckDB's epoch_us."""
    want = _duckdb_epoch_bounds(sf_dir)
    old_legacy = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        assert _events_epoch_bounds(spark, sf_dir) == want  # bigint path
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert _events_epoch_bounds(spark, sf_dir) == want, tz
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", old_legacy)
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_virgin_session_runs_event_queries(sf_dir):
    """A conf-less SparkSession.builder.getOrCreate() on a non-UTC machine
    (the external driver's shape) must run events-backed queries and agree
    with DuckDB on timestamps. Subprocess: the in-process session already
    carries our confs."""
    script = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = SparkSession.builder.master("local[4]").getOrCreate()
import __spark_entry__ as E
qs = E.queries()
sf = sys.argv[2]
out = {"rows": {}}
for name in ("null_counts_events", "events_hourly_stats",
             "user_sessions", "events_asof_orders"):
    out["rows"][name] = qs[name](spark, sf).count()
from firebase_etl_spark.sources.tables import load_table
r = (load_table(spark, "events", sf)
     .agg(F.unix_micros(F.min("ts")).alias("lo"),
          F.unix_micros(F.max("ts")).alias("hi")).collect()[0])
out["lo"], out["hi"] = r["lo"], r["hi"]
print("RESULT:" + json.dumps(out))
"""
    env = dict(os.environ)
    env["TZ"] = "America/New_York"  # worst case: non-UTC driver machine
    proc = subprocess.run(
        [sys.executable, "-c", script, REPO, sf_dir],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")
    )
    got = json.loads(line[len("RESULT:") :])
    assert all(n > 0 for n in got["rows"].values()), got["rows"]
    assert (got["lo"], got["hi"]) == _duckdb_epoch_bounds(sf_dir)
