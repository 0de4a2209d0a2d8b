"""Managed-table sink with bucketing (K7 DDL + the co-located-join layout).

Bucketed tables pre-shuffle data by key at write time: two tables bucketed
the same way join WITHOUT an exchange — the write cost is paid once, every
downstream join on the bucket key is shuffle-free. This is the storage-side
answer for repeated 100 TB fact-fact joins where broadcast can't apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_table_if_not_exists(spark: SparkSession, name: str, ddl_columns: str) -> None:
    """Idempotent DDL (reference postgres_loader.py:643-678 K7) against the
    session catalog."""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} ({ddl_columns}) USING parquet")


def save_bucketed(
    df: DataFrame,
    name: str,
    bucket_key: str,
    num_buckets: int = 16,
    sort_key: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(name)


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)
