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


# final-phase recombiners for decomposable partial aggregates: partial
# counts/sums re-sum, partial min/max re-min/re-max. Anything else (avg,
# stddev, percentiles, ...) is NOT closed under recombination and must be
# rewritten by the caller as a ratio/merge of decomposable partials.
_RECOMBINE = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[Column, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed keys. ``aggs`` maps output column ->
    ``(partial_expr, recombine)`` where ``recombine`` is one of ``"sum"``
    (for count/sum partials), ``"min"``, ``"max"``. The spec is explicit —
    no introspection of the Column — so a non-decomposable aggregate raises
    here instead of silently recombining wrong (e.g. avg summed as
    sum-of-avgs)."""
    finals = []
    for name, (expr, how) in aggs.items():
        if how not in _RECOMBINE:
            raise ValueError(
                f"salted_aggregate: aggregate {name!r} requests recombine "
                f"{how!r}; only {sorted(_RECOMBINE)} are decomposable. "
                "Rewrite avg/stddev/etc. as ratios of sum/count partials."
            )
        finals.append(_RECOMBINE[how](F.col(f"__p_{name}")).alias(name))
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )
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
