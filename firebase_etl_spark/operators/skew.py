"""Skew mitigation utilities — hot keys are the classic 100 TB failure mode.

Three tools, complementing AQE's skew-join splitting (which covers
sort-merge joins but NOT windows or single-key aggregations):

- salted_aggregate: two-phase agg — partial agg on (key, salt), final agg
  on key. A key with 100M rows becomes ``salt_buckets`` partial groups that
  combine map-side, instead of one reducer receiving 100M rows.
- salted_join: replicate the small side per salt value so a skewed big-side
  key spreads over ``salt_buckets`` tasks (broadcast is better when the
  small side fits; salting is for when it doesn't).
- dedup_keep_latest_two_phase (operators/dedup.py) is the window-free dedup
  for hot keys — same family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed keys. ``aggs`` maps output column ->
    partial aggregate expression; supported finals: sum-of-sums and
    max-of-max / min-of-min are composed by the caller choosing re-combinable
    aggregates (sum, min, max, count via sum)."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )
    # recombine: counts/sums re-sum; min/max re-min/re-max. The partial
    # expression's class decides — callers pass F.sum/F.count/F.min/F.max.
    finals = []
    for name, expr in aggs.items():
        fn_name = expr._jc.toString() if hasattr(expr, "_jc") else ""
        src = F.col(f"__p_{name}")
        if "min(" in fn_name:
            finals.append(F.min(src).alias(name))
        elif "max(" in fn_name:
            finals.append(F.max(src).alias(name))
        else:  # count and sum both recombine by summing
            finals.append(F.sum(src).alias(name))
    return partial.groupBy(key).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Inner equi-join where ``big`` has skewed keys and ``small`` is too
    large to broadcast: salt the big side randomly, replicate the small side
    across every salt value, join on (key, salt). Each hot key spreads over
    ``salt_buckets`` reducers."""
    big_salted = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_salted.join(small_replicated, [key, "__salt"]).drop("__salt")
