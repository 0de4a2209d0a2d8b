"""Loaders for the driver-provided synthetic parquet tables.

One parquet file per table under ``{sf_dir}/{name}.parquet`` (TESTDATA.md).
Parquet scans give Catalyst predicate pushdown + column pruning for free, so
these loaders deliberately do nothing but ``spark.read.parquet`` — every
filter/projection belongs in the query plan, not the loader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firebase_etl_spark.schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one synthetic table as a DataFrame (lazy parquet scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS, isAdjustedToUTC=false). How that
    arrives depends on the session the caller hands us:

    * sessions built with ``spark.sql.legacy.parquet.nanosAsLong`` (our own
      ``get_spark``) read it as a raw nanosecond ``bigint``;
    * plain Spark 4.1 sessions read it as ``timestamp_ntz`` truncated to
      microseconds (matching DuckDB's truncation);
    * older/conservative sessions refuse the scan with PARQUET_TYPE_ILLEGAL,
      in which case we set the legacy conf at runtime and retry.

    All flavors are normalized to a UTC-instant TimestampType at microsecond
    precision so downstream ``cast('long')`` epoch arithmetic and DuckDB
    oracle comparisons agree regardless of who built the session.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(sf_dir, f"{name}.parquet")
    # memoize the analyzed frame per (session, path): schema inference
    # reads the parquet footer on the driver EVERY call (~0.1 s), and a
    # query touching 5 tables pays ~0.5 s before the first job — pure
    # fixed overhead across a 120-query run. The cache lives ON the
    # session object, so it can never outlive its session or leak across
    # sessions (the testdata files are immutable for a session's life;
    # DataFrames are immutable plan handles, safe to share).
    cache = getattr(spark, "_graft_table_cache", None)
    if cache is None:
        cache = {}
        spark._graft_table_cache = cache
    if path in cache:
        return cache[path]
    try:
        df = spark.read.parquet(path)
    except Exception:
        # PARQUET_TYPE_ILLEGAL: this session can't map TIMESTAMP(NANOS);
        # the legacy conf is runtime-settable, so flip it and retry.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        kind = field.dataType.simpleString()
        if kind == "bigint":
            # integer division — `/` would go through double and lose
            # precision at 1e18 nanos
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif kind == "timestamp_ntz":
            # naive micros are UTC wall clock; pin them to UTC instants. Any
            # route through an NTZ->TIMESTAMP cast (incl. to_utc_timestamp)
            # applies spark.sql.session.timeZone first, and interval
            # arithmetic with a DAY component is DST-aware — both shift the
            # instant on non-UTC sessions. make_timestamp with an explicit
            # 'UTC' zone rebuilds the wall clock from tz-free field
            # extractions, so the result is session-timezone independent at
            # full microsecond precision (extract SECOND keeps the fraction).
            df = df.withColumn(
                "ts",
                F.expr(
                    "make_timestamp(year(ts), month(ts), day(ts), "
                    "hour(ts), minute(ts), extract(SECOND FROM ts), 'UTC')"
                ),
            )
    cache[path] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register every synthetic table as a temp view for ``spark.sql``."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
