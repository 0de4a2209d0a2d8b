"""Focused pins for the round-11 optimization internals.

Each test pins an equivalence the optimization relies on:
- ``total_out`` on the two-phase rank/prefix helpers equals the
  separate aggregate it replaced,
- the binary-decision-tree bootstrap weight equals the threshold count
  it replaced,
- the dictionary-id verify arrays give the same intersect/union sizes
  as the string arrays they replaced.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_grouped_rank_total_out_matches_count(spark):
    from firebase_etl_spark.operators.stats import with_grouped_rank

    rows = [
        (g, v, i)
        for i, (g, v) in enumerate(
            (g, v) for g in ("a", "b", "c") for v in (5, 3, 9, 3, 7)
        )
    ]
    df = spark.createDataFrame(rows, "g string, v long, k long")
    got = with_grouped_rank(df, "g", ["v", "k"], "r", total_out="n")
    # the attached n equals the group's row count on every row
    bad = (
        got.groupBy("g")
        .agg(F.max("n").alias("n"), F.count(F.lit(1)).alias("c"),
             F.min("n").alias("n2"))
        .filter((F.col("n") != F.col("c")) | (F.col("n2") != F.col("c")))
        .count()
    )
    assert bad == 0
    # ranks are a permutation of 1..n within each group
    ranks = sorted(
        (r["g"], r["r"]) for r in got.select("g", "r").collect()
    )
    assert ranks == sorted((g, i) for g in ("a", "b", "c") for i in (1, 2, 3, 4, 5))


def test_grouped_prefix_sum_total_out_list_matches_totals(spark):
    from firebase_etl_spark.operators.stats import with_grouped_prefix_sum

    df = spark.createDataFrame(
        [("a", 1, 10, 1), ("a", 2, 20, 0), ("b", 1, 5, 2), ("b", 3, 7, 3)],
        "g string, v long, x long, y long",
    )
    got = with_grouped_prefix_sum(
        df, "g", ["v"], ["x", "y"], ["cx", "cy"], total_out=["tx", "ty"]
    )
    rows = {(r["g"], r["v"]): r for r in got.collect()}
    assert rows[("a", 2)]["cx"] == 30 and rows[("a", 2)]["tx"] == 30
    assert rows[("a", 1)]["tx"] == 30 and rows[("a", 1)]["ty"] == 1
    assert rows[("b", 3)]["cy"] == 5 and rows[("b", 3)]["ty"] == 5


def test_global_rank_and_prefix_total_out(spark):
    from firebase_etl_spark.operators.stats import (
        with_global_rank,
        with_prefix_sum,
    )

    df = spark.createDataFrame(
        [(3, 30), (1, 10), (2, 20)], "k long, v long"
    )
    gr = with_global_rank(df, [F.asc("k")], "r", total_out="n").collect()
    assert all(r["n"] == 3 for r in gr)
    ps = with_prefix_sum(df, [F.asc("k")], "v", "cum", total_out="t").collect()
    assert all(r["t"] == 60 for r in ps)
    assert {(r["k"], r["cum"]) for r in ps} == {(1, 10), (2, 30), (3, 60)}


def test_boot_weight_tree_counts_thresholds(spark):
    from firebase_etl_spark.operators.stats import (
        _POISSON1_THRESH_E52,
        boot_mix_constants,
        boot_weight_sql,
    )

    (a1, a2, c) = boot_mix_constants(1)[0]
    df = spark.range(0, 5000).select(
        (F.col("id") * 7919 % (1 << 26)).alias("h1"),
        (F.col("id") * 104729 % (1 << 26)).alias("h2"),
    )
    w = boot_weight_sql(a1, a2, c)
    u = f"((h1 * {a1} + h2 * {a2} + {c}) % {1 << 52})"
    linear = "(" + " + ".join(
        f"(CASE WHEN {u} >= {t} THEN 1 ELSE 0 END)"
        for t in _POISSON1_THRESH_E52
    ) + ")"
    bad = df.filter(F.expr(f"({w}) != ({linear})")).count()
    assert bad == 0


def test_dictionary_id_arrays_preserve_intersect_sizes(spark):
    # the invariance the dedup verify rewrite rests on: intersect and
    # union SIZES are unchanged under any bijective relabeling
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),
            (2, "bb cc dd ee"),
            (3, "aa bb cc dd"),
            (4, "zz yy xx ww"),
        ],
        "doc_id long, text string",
    )
    ex = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("s")
    )
    dfc = (
        ex.select("s").distinct()
        .withColumn("__sid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    sids = ex.join(dfc, "s").groupBy("doc_id").agg(
        F.collect_list("__sid").alias("ids")
    )
    strs = docs.select(
        "doc_id", F.split("text", " ").alias("sh")
    )
    a = strs.alias("a").crossJoin(strs.alias("b")).select(
        F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib"),
        F.size(F.array_intersect("a.sh", "b.sh")).alias("i"),
        F.size(F.array_union("a.sh", "b.sh")).alias("u"),
    )
    b = sids.alias("a").crossJoin(sids.alias("b")).select(
        F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib"),
        F.size(F.array_intersect("a.ids", "b.ids")).alias("i"),
        F.size(F.array_union("a.ids", "b.ids")).alias("u"),
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
