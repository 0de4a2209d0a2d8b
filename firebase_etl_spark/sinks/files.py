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
