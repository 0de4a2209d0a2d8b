"""Focused pins for the round-12 optimization internals.

Each test pins an equivalence a round-12 rewrite relies on:
- the persist-fused two-phase helpers (offset collect doubles as the
  cache-materializing job) still emit exact ranks / prefix sums,
- skipping the input materialization (``materialize_input=False``)
  changes no output,
- the quantile-normalization tagged-union fusion (grouped + pooled
  levels through ONE helper call) equals the two-call form.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_grouped_rank_skip_input_materialization_identical(spark):
    from firebase_etl_spark.operators.stats import with_grouped_rank

    rows = [
        ("a", 5, 1), ("a", 3, 2), ("a", 9, 3), ("a", 3, 4),
        ("b", 7, 5), ("b", 1, 6), ("c", 2, 7),
    ]
    df = spark.createDataFrame(rows, "g string, v long, k long")
    base = with_grouped_rank(df, "g", ["v", "k"], "r", total_out="n")
    skip = with_grouped_rank(
        df, "g", ["v", "k"], "r", total_out="n", materialize_input=False
    )
    key = lambda r: (r["g"], r["v"], r["k"])  # noqa: E731
    assert sorted(map(tuple, base.collect()), key=lambda t: t[:3]) == sorted(
        map(tuple, skip.collect()), key=lambda t: t[:3]
    )
    # ranks are 1..n per group either way
    got = {key(r): (r["r"], r["n"]) for r in skip.collect()}
    assert got[("a", 3, 2)][0] == 1 and got[("a", 3, 4)][0] == 2
    assert got[("a", 9, 3)] == (4, 4)
    assert got[("b", 1, 6)] == (1, 2) and got[("c", 2, 7)] == (1, 1)


def test_prefix_sum_persist_fusion_exact(spark):
    from firebase_etl_spark.operators.stats import with_prefix_sum

    rows = [(v, v * 10) for v in (4, 1, 3, 2, 5)]
    df = spark.createDataFrame(rows, "s long, n long")
    got = {
        r["s"]: (r["cum"], r["tot"])
        for r in with_prefix_sum(
            df, [F.col("s")], "n", out="cum", total_out="tot"
        ).collect()
    }
    assert got == {
        1: (10, 150), 2: (30, 150), 3: (60, 150),
        4: (100, 150), 5: (150, 150),
    }


def test_quantile_norm_tagged_union_matches_two_call_form(spark):
    """The fused (grouped + pooled in ONE helper call) quantile map
    equals the split form: per-group nearest-rank quantiles from the
    grouped rank, pooled quantiles from a global rank over the same
    rows."""
    from firebase_etl_spark.operators.stats import (
        quantile_normalization_map,
        with_global_rank,
        with_grouped_rank,
    )

    rows = [
        ("a", 100, 1), ("a", 300, 2), ("a", 200, 3), ("a", 500, 4),
        ("a", 400, 5),
        ("b", 150, 6), ("b", 250, 7), ("b", 50, 8),
    ]
    df = spark.createDataFrame(rows, "g string, cents long, k long")
    got = quantile_normalization_map(
        df, "g", "cents", "k", n_q=4
    ).collect()

    # reference: the two-call form, inlined
    base = df.select("g", F.col("cents").alias("v"), "k")
    hit = (
        "filter(transform(sequence(1, 4), i -> CASE WHEN"
        " r = greatest((i * n + 3) DIV 4, 1)"
        " THEN i END), x -> x IS NOT NULL)"
    )
    src = (
        with_grouped_rank(base, "g", ["v", "k"], "r", total_out="n")
        .select("g", F.col("v").alias("qv"), F.explode(F.expr(hit)).alias("q_idx"))
    )
    pooled = (
        with_global_rank(base, [F.asc("v"), F.asc("k")], "r", total_out="n")
        .select(F.col("v").alias("pq"), F.explode(F.expr(hit)).alias("q_idx"))
    )
    ref = {
        (r["g"], r["q_idx"]): (r["qv"], r["pq"], r["pq"] - r["qv"])
        for r in src.join(pooled, "q_idx").collect()
    }
    assert len(got) == len(ref) == 8
    for r in got:
        assert ref[(r["g"], r["q_idx"])] == (
            r["src_q_cents"], r["pooled_q_cents"], r["adjust_cents"]
        ), r
