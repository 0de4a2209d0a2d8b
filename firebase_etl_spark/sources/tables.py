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

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark reads as a raw
    nanosecond long (``spark.sql.legacy.parquet.nanosAsLong``); convert to a
    microsecond TimestampType exactly as DuckDB truncates it, so oracle
    comparisons agree.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # integer division — `/` would go through double and lose
            # precision at 1e18 nanos
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
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
