"""File sinks (SURVEY.md §2.2 K1/K2 + the engine-native parquet default).

The reference writes one JSON backup (firebase_service.py:311-349) and one
CSV export (user_transformer.py:479-489) from driver memory. Spark-native
writes are partition-parallel; ``single_file=True`` coalesces for the
small-export parity case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """CSV export (K2). Array/map columns must be serialized first (CSV has
    no nested types) — use functions.arrays.pg_array_literal or to_json."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """The scale-default sink: columnar, splittable, predicate-pushdown on
    re-read. ``partition_by`` gives partition pruning to downstream readers."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — the second columnar interchange format (Hive/Trino
    ecosystems). Same predicate-pushdown and column-pruning behavior as
    parquet on re-read; kept API-symmetric with write_parquet so a
    pipeline flips formats with one argument."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
) -> None:
    """Idempotent incremental load: dynamic partition overwrite replaces
    ONLY the partitions present in ``df`` and leaves every other partition
    untouched — the reprocess-one-day pattern. Static overwrite (Spark's
    default) would drop the whole table first; the dynamic mode is scoped
    to this one write via the per-writer conf, not a session-wide flip."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .format(fmt)
        .save(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 128,
) -> int:
    """Small-files compaction — the operational fix for streaming/incremental
    sinks that accumulate thousands of tiny files (each file costs a task +
    a namenode/liststatus entry at read time). Sizes the rewrite from actual
    on-disk bytes, repartitions to ~target_file_mb outputs, writes to a
    staging dir and swaps. Returns the new file count.

    On object stores the swap step becomes a manifest/metadata commit
    (Delta/Iceberg rewriteDataFiles); the sizing logic is identical."""
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    staged = f"{path.rstrip('/')}.compacting"
    df.repartition(n).write.mode("overwrite").parquet(staged)
    shutil.rmtree(path)
    os.replace(staged, path)
    return sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )


def append_evolved(df: DataFrame, path: str) -> None:
    """Append a batch whose schema may have DRIFTED from what's already
    at ``path`` — the raw-stage reality the reference's messy inputs
    exhibit (alternate spellings appearing, new fields arriving,
    SURVEY.md §1.2): parquet appends are per-file self-describing, so
    new columns simply land in the new files and resolution happens at
    READ time (read_evolved). Column REMOVALS need no action either —
    old files keep them, new files omit them. Renames are a transform
    concern (functions.identity coalesce), not a storage one."""
    df.write.mode("append").parquet(path)


def read_evolved(spark, path: str) -> DataFrame:
    """Read a parquet directory written by multiple schema generations:
    ``mergeSchema`` unions every file footer's schema (by NAME), missing
    columns surface as NULLs — schema-on-read over an evolving landing
    zone without a migration rewrite. At 100 TB prefer declaring the
    CURRENT superset schema explicitly (spark.read.schema(...)) so the
    footer sweep doesn't touch every file; mergeSchema is the
    discovery/backfill path."""
    return spark.read.option("mergeSchema", "true").parquet(path)
