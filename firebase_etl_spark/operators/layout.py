"""Data-layout operators — multi-dimensional clustering for write-time
data skipping (extension; the storage-layout knob a 100 TB table needs).

Parquet scans skip row groups whose min/max stats exclude the predicate.
A single-column sort gives perfect skipping on that column and none on
any other; interleaving the bits of several columns (a Z-order /
Morton curve) gives every interleaved column locality, so selective
predicates on ANY of them prune row groups. This is the same layout
trick Delta/Iceberg expose as OPTIMIZE ZORDER BY, expressed here as a
plain Column + a range-partitioned sorted write.

Scale shape: the per-column [min,max] normalization stats come from one
tiny aggregate (broadcast back as literals); the key itself is pure
bit arithmetic inside whole-stage codegen; the write is
repartitionByRange(zkey) + sortWithinPartitions — the standard
total-order write, no extra shuffle beyond it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, Column]:
    """Returns (df_with_stats, key_column): each column is affinely
    mapped to an integer in [0, 2^bits) using its corpus min/max (nulls
    map to 0 — they cluster first), then the bits are interleaved
    column-major: output bit (b * n_cols + j) = bit b of column j."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in cols],
    )
    d = df.crossJoin(F.broadcast(stats))
    max_code = (1 << bits) - 1
    codes = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = mx - mn
        scaled = F.when(
            span > 0,
            F.round((F.col(c).cast("double") - mn) / span * max_code, 0),
        ).otherwise(F.lit(0.0))
        codes.append(F.coalesce(scaled.cast("long"), F.lit(0)))
    key = None
    for b in range(bits):
        for j, code in enumerate(codes):
            term = F.shiftleft(
                F.shiftright(code, b).bitwiseAND(F.lit(1)),
                b * len(cols) + j,
            )
            key = term if key is None else key.bitwiseOR(term)
    return d, key


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``:
    range-partition by the key (balanced files along the curve), sort
    within partitions (tight row-group min/max on every interleaved
    column), drop the helper stats columns."""
    d, key = zorder_key(df, cols, bits)
    (
        d.withColumn("__zkey", key)
        .repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .select(df.columns)
        .write.mode("overwrite")
        .parquet(path)
    )
