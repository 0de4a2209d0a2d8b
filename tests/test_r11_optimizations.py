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


def test_sig_from_shingle_table_matches_minhash_signatures(spark):
    """Signatures derived from the verify shingle table (the one
    tokenize+shingle pass in minhash_near_dups) equal the ones
    minhash_signatures builds from scratch."""
    from firebase_etl_spark.operators.dedup_approx import (
        _sig_udf,
        minhash_signatures,
    )
    from firebase_etl_spark.operators.text import (
        tokenize,
        word_shingles_of_tokens,
    )

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee"),
            (2, "aa bb cc dd ff"),
            (3, "zz yy"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    ref = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures(docs, 32, 2).collect()
    }
    sh = docs.select("doc_id", tokenize("text").alias("__t")).select(
        "doc_id", word_shingles_of_tokens(F.col("__t"), 2).alias("sh")
    )
    got = {
        r["doc_id"]: list(r["signature"])
        for r in sh.select(
            "doc_id",
            _sig_udf(32)(
                F.transform("sh", lambda s: F.xxhash64(s))
            ).alias("signature"),
        ).collect()
    }
    assert got == ref


def test_simhash_portable_dictionary_matches_inline_chain(spark):
    """The vocabulary-dictionary md5 hash (one chain per DISTINCT token)
    reproduces the per-instance-chain fingerprints bit-for-bit."""
    from firebase_etl_spark.operators.dedup_approx import simhash_portable

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown fox jumps"),
            (3, "lorem ipsum dolor"),
            (4, "the the the"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["simhash"] for r in simhash_portable(docs).collect()
    }
    # reference: the old inline shape — md5 chain per token instance
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        ).alias("__tok"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("__tok"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("__h"),
    )
    h = F.col("__h")
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"__b{i}")
            for i in range(60)
        ]
    )
    fp = None
    for i in range(60):
        term = F.when(F.col(f"__b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = term if fp is None else fp.bitwiseOR(term)
    ref = {
        r["doc_id"]: r["simhash"]
        for r in sums.select(
            "doc_id", fp.cast("long").alias("simhash")
        ).collect()
    }
    assert got == ref


def test_bm25_per_term_idf_matches_per_posting_window(spark):
    """BM25 scores from the term-level df table + per-posting c_e6 equal
    the old window-df + per-pair expression form."""
    from pyspark.sql import Window

    from firebase_etl_spark.functions.portable_math import with_ln
    from firebase_etl_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry apple"),
            (2, "banana cherry date"),
            (3, "apple apple banana"),
            (4, "cherry date elderberry fig"),
            (5, "apple fig"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_topk(docs, [1, 4], k=3).collect()
    }
    # reference: the old shape — df via term window, lns per posting,
    # c_e6 after the probe join
    from firebase_etl_spark.operators.text import tokenize

    k1, b = 1.2, 0.75
    base = docs.select("doc_id", tokenize("text").alias("toks"))
    toks = base.select(
        "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("toks")).alias("tdl")
    ).collect()[0]
    n_docs = int(tot["n"])
    avgdl = F.lit(int(tot["tdl"]) / n_docs)
    qt = (
        toks.filter(F.col("doc_id").isin([1, 4]))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    tf = (
        toks.join(F.broadcast(qt.select("term").distinct()), "term", "semi")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    )
    tf = with_ln(tf, str(2 * n_docs + 2), "__lnidfn")
    tf = with_ln(tf, "(2 * df + 1)", "__lnidfd")
    idf = F.col("__lnidfn") - F.col("__lnidfd")
    tfc = (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(qt), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(idf * tfc * 1000000.0 + 1e-9, 0)
            .cast("long")
            .alias("c_e6"),
        )
    )
    pair = scored.groupBy("query_id", "doc_id").agg(
        F.sum("c_e6").alias("score_e6")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_e6"), "doc_id"
    )
    ref = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in pair.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            "doc_id",
            (F.col("score_e6") / 1000000.0).alias("score"),
            "rank",
        )
        .collect()
    }
    assert got == ref
