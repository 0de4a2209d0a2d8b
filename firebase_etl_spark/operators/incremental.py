"""Incremental aggregate maintenance — refresh a standing aggregate from
a delta batch WITHOUT rescanning the base (the merge-on-read pattern every
warehouse rollup and streaming-batch unifier runs; the batch half of what
the streaming twins do with state stores).

The algebra: keep PARTIAL aggregates (count, integer-cent sum, min, max)
per group; partials merge associatively and commutatively, so
``merge(partials(base), partials(delta)) == partials(base ∪ delta)`` for
any split — one keyed aggregate over the (tiny) union of partial tables
instead of a full recompute. Derived figures (averages) leave the
partials at REPORT time only — deriving then merging is the classic
incremental-pipeline bug (an average of averages), which the pytest pins
against.

Money stays in fixed-point BIGINT cents (one round per row, integer sums
— associative and engine-invariant, the repo-wide pattern) so the merged
result is bit-identical to a from-scratch recompute, which is exactly
what the DuckDB oracle replays.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_aggs(
    df: DataFrame, keys: list, amount_col: str, ts_col: str
) -> DataFrame:
    """Mergeable per-group partials: (*keys, n, amount_cents, lo_ts,
    hi_ts). One keyed aggregate; amounts rounded once to BIGINT cents."""
    cents = F.round(F.col(amount_col) * 100.0, 0).cast("long")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("amount_cents"),
        F.min(ts_col).alias("lo_ts"),
        F.max(ts_col).alias("hi_ts"),
    )


def merge_partials(parts: list[DataFrame], keys: list) -> DataFrame:
    """Combine partial tables (base + any number of delta batches) into
    refreshed partials — sum/sum/min/max over the unioned partial rows,
    never touching the underlying facts."""
    u = reduce(lambda a, b: a.unionByName(b), parts)
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("amount_cents").alias("amount_cents"),
        F.min("lo_ts").alias("lo_ts"),
        F.max("hi_ts").alias("hi_ts"),
    )


def report(partials: DataFrame, keys: list) -> DataFrame:
    """Human units, derived AT REPORT TIME from exact partials: total and
    average in currency (2dp from integer cents), first/last timestamps."""
    return partials.select(
        *keys,
        F.col("n").alias("n_rows"),
        F.round(F.col("amount_cents") / 100.0, 2).alias("total_amount"),
        F.round(F.col("amount_cents") / F.col("n") / 100.0, 6).alias(
            "avg_amount"
        ),
        F.col("lo_ts").alias("first_ts"),
        F.col("hi_ts").alias("last_ts"),
    ).orderBy(*keys)
