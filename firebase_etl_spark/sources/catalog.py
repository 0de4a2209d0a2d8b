"""Catalog/schema introspection (SURVEY.md §2.1 S11-S13) on the Spark side.

The reference queries information_schema / pg_database and probes with
LIMIT 0/1 (reference sql_extraction.py:107-166,306-313,497-503). Spark-side
equivalents are metadata operations — no data scan:
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firebase_etl_spark.schemas import TABLE_NAMES
from firebase_etl_spark.sources.tables import load_tables


def register_catalog(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register the synthetic tables as temp views (the engine's catalog)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def list_tables(spark: SparkSession, like: str | None = None) -> DataFrame:
    """Catalog listing with optional case-insensitive substring search
    (S12 — the reference's ILIKE '%user%' table hunt)."""
    tables = spark.createDataFrame(
        [(t.name, t.tableType or "TEMPORARY") for t in spark.catalog.listTables()],
        "table_name string, table_type string",
    )
    if like:
        tables = tables.filter(F.lower("table_name").contains(like.lower()))
    return tables


def table_columns(spark: SparkSession, table: str) -> DataFrame:
    """Column name/type/nullable — information_schema.columns equivalent
    (S11). Metadata only; no scan."""
    cols = [
        (c.name, c.dataType, bool(c.nullable)) for c in spark.catalog.listColumns(table)
    ]
    return spark.createDataFrame(cols, "column_name string, data_type string, nullable boolean")


def table_stats(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Row counts per synthetic table (the reference's per-table stats
    probes, S13) — one count job per table, parquet-footer fast."""
    rows = []
    for name, df in load_tables(spark, sf_dir).items():
        rows.append((name, df.count(), len(df.schema.fields)))
    return spark.createDataFrame(rows, "table_name string, n_rows long, n_columns int")
