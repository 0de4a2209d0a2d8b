"""JDBC source/introspection helpers (SURVEY.md §2.1 S8-S13).

The reference opens a psycopg2 connection per helper call and materializes
``SELECT *`` into pandas (reference sql_extraction.py:38-105). Spark-native:
``spark.read.jdbc`` with partitioned reads — predicate/column/limit pushdown
happen in the JDBC DSv2 source; a "cursor-paginated scan" becomes a
``partitionColumn`` range split executed in parallel.

No JDBC driver jar ships in this environment, so everything here builds the
reader config lazily; nothing connects at import or plan-build time. Tests
cover the option-construction logic only (tests/test_sources.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcConfig:
    url: str                      # jdbc:postgresql://host:port/db
    user: str = ""
    password: str = ""
    driver: str = "org.postgresql.Driver"
    fetchsize: int = 10_000
    batchsize: int = 10_000      # write path
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "fetchsize": str(self.fetchsize),
        }
        opts.update(self.extra)
        return opts


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Full-table scan (S8). With a numeric ``partition_column`` + bounds the
    read splits into ``num_partitions`` parallel range scans — the Spark
    answer to the reference's cursor pagination (S10,
    reference sql_extraction.py:205-250; datastore_service.py:122-161)."""
    reader = spark.read.format("jdbc").options(**cfg.options()).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def read_query(spark: SparkSession, cfg: JdbcConfig, query: str) -> DataFrame:
    """Arbitrary pushed-down SQL (S9, reference sql_extraction.py:84-105):
    the query executes in the database; Spark reads the result."""
    return spark.read.format("jdbc").options(**cfg.options()).option("query", query).load()


def table_schema(spark: SparkSession, cfg: JdbcConfig, table: str):
    """Schema introspection without a scan (S11 — the reference's LIMIT 0
    probe, sql_extraction.py:306-307): JDBC metadata resolves the schema at
    plan time; no rows move."""
    return read_table(spark, cfg, table).schema


def list_tables(spark: SparkSession, cfg: JdbcConfig, like: str | None = None) -> DataFrame:
    """Catalog listing with optional ILIKE filter (S12,
    reference sql_extraction.py:451-457,497-503)."""
    q = (
        "SELECT table_schema, table_name FROM information_schema.tables "
        "WHERE table_type = 'BASE TABLE'"
    )
    if like:
        q += f" AND table_name ILIKE '%{like}%'"
    return read_query(spark, cfg, q)


def execute_batch(connect, statements: list[str]) -> int:
    """Batch SQL executor (K8, reference sql_extraction.py:252-282): run a
    list of DDL/DML statements in ONE transaction — commit only after every
    statement succeeds, roll back on the first failure.

    Takes a zero-arg ``connect`` callable returning a DB-API connection
    (psycopg2, pg8000, ...) rather than going through Spark: statement
    batches are a control-plane concern (CREATE TABLE, GRANT, maintenance
    DML) — Spark's JDBC source moves DataFrames, it does not execute
    arbitrary statements. Returns the number of statements executed."""
    connection = connect()
    cursor = None
    try:
        cursor = connection.cursor()
        for statement in statements:
            cursor.execute(statement)
        connection.commit()
        return len(statements)
    except Exception:
        connection.rollback()
        raise
    finally:
        if cursor is not None:
            cursor.close()
        connection.close()
