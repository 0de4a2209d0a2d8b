"""Frequent co-occurring item-pair mining (market-basket analysis — the
pair level of A-Priori, Agrawal & Srikant 1994). Extension beyond the
reference (its pandas surface stops at single-column aggregation); in an
LLM-data context the same operator mines co-occurring sources/tags/spans
per document.

Scale shape:

- **One basket aggregate, then map-side pair generation** (r11): each
  basket's DISTINCT items collect into one ascending array
  (``collect_set`` — map-side combinable, and it subsumes the old
  separate ``.distinct()`` shuffle), and C(b, 2) ordered pairs per
  basket are emitted by an array-comprehension ``transform`` in the
  SAME stage that reads the aggregate — map-side combined into the
  pair counts. The old shape (distinct + item-count semi-join prune +
  per-basket self-join) paid two extra full-fact shuffles to trim a
  fan-out that the basket-size bound already caps; on TPC-H the
  a-priori prune was a measured no-op (~30 uses/part at every gate
  SF), and the pair-threshold filter subsumes it exactly (a pair with
  support >= s forces both items to support >= s, so no surviving row
  ever depended on the prune).
- **Pair generation is per-basket quadratic**: C(b, 2) struct rows per
  basket, materialized map-side only. TPC-H baskets hold <= 7 lines;
  for heavy-tailed corpora pass ``max_basket_size`` to drop degenerate
  mega-baskets (the standard market-basket guard, enforced BEFORE the
  array build via a count-distinct semi join so no mega-basket array
  is ever materialized) — a documented, opt-in truncation.
- **Counts are map-side combinable**; the final top-k is a global
  orderBy + limit (TakeOrderedAndProject, no global window).

DETERMINISM: every aggregate is an integer count; support and lift each
leave the integers by ONE fixed-order expression (round once), so no
double is ever summed — hash-stable across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from firebase_etl_spark.functions.portable_math import round_nudged


def _agg_parallelism(spark) -> int:
    """Task count for the CPU-bound basket/pair aggregates — the
    session's planned shuffle parallelism (cores-scaled locally,
    ops-tuned on a cluster), pinned via explicit repartition so AQE's
    bytes-based coalescing cannot serialize a compute-heavy stage."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        return int(spark.sparkContext.defaultParallelism)

#: all ordered pairs (p1 < p2) from the ascending `items` array — the
#: comprehension form of the old per-basket self-join (same C(b, 2)
#: rows, emitted map-side with no shuffle of the fact table)
_PAIR_EXPR = (
    "flatten(transform(items, (x, i) ->"
    " transform(slice(items, i + 2, size(items) - i - 1),"
    " y -> struct(x AS p1, y AS p2))))"
)


def _basket_item_arrays(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None = None,
) -> DataFrame:
    """(bk, items): each basket's DISTINCT items as an ascending array.
    ONE map-side-combinable aggregate replaces the old
    ``.distinct()`` + per-basket self-join prelude; ``collect_set``
    dedupes (basket, item) exactly like the distinct did, and
    ``array_sort`` makes i < j pair emission equal the old
    ``a.it < z.it`` join predicate.

    ``max_basket_size`` drops baskets with more DISTINCT items than the
    cap BEFORE the array build: the cap is enforced with a per-basket
    ``count_distinct`` (two-phase hash aggregate — one row per
    (basket, item), never an array buffer) + a semi join, so a single
    degenerate mega-basket (a default key, a null-ish id) can never
    materialize its full item array in one ``collect_set`` aggregation
    buffer. ``count_distinct(it) <= cap`` is exactly the old
    post-build ``size(items) <= cap`` predicate (collect_set dedupes
    the same pairs), so the surviving baskets — and their arrays — are
    identical."""
    src = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).filter(
        F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
    )
    if max_basket_size is not None:
        ok = (
            src.groupBy("bk")
            .agg(F.count_distinct("it").alias("__nd"))
            .filter(F.col("__nd") <= max_basket_size)
            .select("bk")
        )
        src = src.join(ok, "bk", "semi")
    # explicit keyed repartition, NOT a bare groupBy: the array build and
    # the C(b, 2) pair emission reading it are CPU-heavy PER BYTE (a few
    # MB of (bk, it) pairs fan out quadratically), so AQE's bytes-based
    # coalescing (coalescePartitions.parallelismFirst=false, session.py)
    # would fold the reduce stage to one task and serialize the hot loop
    # — measured 1.5-2x slower family-wide at sf0.1. A user-numbered
    # repartition is exempt from AQE coalescing, and the following
    # groupBy on the same key reuses the exchange (guide §2.4), so this
    # costs nothing: same single shuffle, pinned parallelism.
    n = _agg_parallelism(src.sparkSession)
    return (
        src.repartition(n, "bk")
        .groupBy("bk")
        .agg(F.array_sort(F.collect_set("it")).alias("items"))
    )


def _pair_counts(baskets: DataFrame, count_alias: str = "pc") -> DataFrame:
    """(p1, p2, count) over the basket arrays — map-side pair emission
    into a map-side-combinable count aggregate."""
    return (
        baskets.select(F.explode(F.expr(_PAIR_EXPR)).alias("pr"))
        .select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias(count_alias))
    )


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    top: int = 20,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Top ``top`` item pairs by co-occurrence count: (p1, p2,
    pair_count, support, lift), p1 < p2, pair_count >= min_support,
    ordered by (pair_count DESC, p1, p2). support = pair_count /
    n_baskets; lift = support / (support(p1) * support(p2)) — lift > 1
    means the items co-occur more than independence predicts."""
    b = _basket_item_arrays(
        df, basket_col, item_col, max_basket_size=max_basket_size
    )
    # the basket arrays feed the basket count, the item counts AND the
    # pair emission — persist, materialize the bounded top-k, release
    # (the ann_topk_lsh persist pattern)
    b = b.persist()
    try:
        n_b = b.select(F.count(F.lit(1)).alias("n_baskets"))
        item_cnt = (
            b.select(F.explode("items").alias("it"))
            .groupBy("it")
            .agg(F.count(F.lit(1)).alias("ic"))
        )
        freq = item_cnt.filter(F.col("ic") >= min_support)
        # no a-priori semi-join: a pair with support >= s forces both
        # items to support >= s, so the pair_count filter subsumes it
        # (and the lift joins against `freq` below stay inner-complete)
        pairs = _pair_counts(b, "pair_count").filter(
            F.col("pair_count") >= min_support
        )
        return (
            pairs.join(
                freq.select(F.col("it").alias("p1"), F.col("ic").alias("c1")),
                "p1",
            )
            .join(
                freq.select(F.col("it").alias("p2"), F.col("ic").alias("c2")),
                "p2",
            )
            .crossJoin(F.broadcast(n_b))
            .select(
                "p1",
                "p2",
                "pair_count",
                # nudged round: these integer ratios land EXACTLY on .5
                # rounding boundaries, where round(double) is engine-
                # version-dependent (portable_math.round_nudged)
                round_nudged(
                    F.col("pair_count") / F.col("n_baskets"), 4
                ).alias("support"),
                round_nudged(
                    (F.col("pair_count") * F.col("n_baskets"))
                    / (F.col("c1") * F.col("c2")),
                    4,
                ).alias("lift"),
            )
            .orderBy(F.col("pair_count").desc(), "p1", "p2")
            .limit(top)
            .localCheckpoint(eager=True)
        )
    finally:
        b.unpersist()


def cooccurrence_edges(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Undirected co-occurrence graph: one (p1, p2) row per item pair
    (p1 < p2) sharing at least ``min_pair_count`` baskets — the edge-set
    view of ``frequent_pairs`` for graph consumers (triangle census,
    connected components). One basket aggregate + map-side pair
    emission + one pair-count aggregate (module docstring); the pc
    threshold subsumes the old a-priori endpoint prune exactly."""
    return (
        _pair_counts(_basket_item_arrays(df, basket_col, item_col))
        .filter(F.col("pc") >= min_pair_count)
        .select("p1", "p2")
    )


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    k: int = 3,
) -> DataFrame:
    """Item-item collaborative-filtering similarity (Sarwar et al. 2001,
    the amazon.com 'customers who bought X' primitive): cosine over
    binary basket-membership vectors, which reduces to
    c_ij / sqrt(c_i * c_j) — all three counts integers from the same
    basket table, so the score is one fixed-order expression per
    SURVIVING pair and fully engine-exact at 6 dp. Top-k partners per
    item via a per-item rank window.

    Scale shape: identical to frequent_pairs — one basket-array
    aggregate + map-side pair emission (module docstring; the pc
    threshold subsumes the old a-priori endpoint prune); the
    symmetrized pair table (2 rows per pair) is output-sized;
    denominators are the full item basket-frequency counts. Returns
    (item, partner, n_co, cosine_sim, rank).

    The three shared subplans are MATERIALIZED once (the basket
    arrays: item counts + pair emission; item counts:
    vocabulary-sized, consumed 3x; the pair table: symmetrized 2x) —
    without this the fact table is scanned ~10x (plan-audit
    repeated-scans flag, the vocab-growth disease)."""
    from pyspark.sql import Window

    b = _basket_item_arrays(df, basket_col, item_col).localCheckpoint(
        eager=True
    )  # basket arrays feed the item counts AND the pair emission
    item_cnt = (
        b.select(F.explode("items").alias("it"))
        .groupBy("it")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    pairs = (
        _pair_counts(b)
        .filter(F.col("pc") >= min_pair_count)
        .localCheckpoint(eager=True)
    )
    sym = pairs.select(
        F.col("p1").alias("item"), F.col("p2").alias("partner"), "pc"
    ).union(
        pairs.select(
            F.col("p2").alias("item"), F.col("p1").alias("partner"), "pc"
        )
    )
    ca = item_cnt.select(F.col("it").alias("item"), F.col("c").alias("ci"))
    cb = item_cnt.select(
        F.col("it").alias("partner"), F.col("c").alias("cj")
    )
    j = (
        sym.join(ca, "item")
        .join(cb, "partner")
        .select(
            "item",
            "partner",
            F.col("pc").alias("n_co"),
            F.round(
                F.col("pc") / F.sqrt(F.col("ci") * F.col("cj")), 6
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cosine_sim").desc(), "partner"
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("item", "rank")
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    min_confidence_e6: int = 100_000,
    top: int = 30,
    support_ppm: int = 100,
) -> DataFrame:
    """Directed association rules over the frequent-pair lattice
    (Agrawal & Srikant 1994, restricted to 2-itemsets — the rule depth
    co-purchase recommenders actually deploy): every frequent pair
    {a, b} yields the rules a=>b and b=>a with
    confidence(a=>b) = P(b | a) = pair_count / count(a) and the shared
    symmetric lift = P(a,b) / (P(a) P(b)). ``frequent_pairs`` ranks the
    pairs; this is the DECISION layer — which direction of the
    co-occurrence is actually predictive (confidence is asymmetric:
    the niche accessory implies the popular base unit, rarely the
    reverse).

    All-integer: confidence and lift quantize at e6 via truncating
    division (Spark DIV == DuckDB // on positive operands), no doubles
    anywhere. Overflow bound: lift's numerator pair_count * n_baskets
    * 1e6 needs pair_count * n_baskets < 9.2e12 — a 100 TB basket
    corpus prunes by min support long before that (the modularity
    documented-bound convention).

    Scale shape: identical to frequent_pairs (one basket-array
    aggregate, map-side pair emission, map-side-combinable counts; the
    fractional pair threshold subsumes the old a-priori prune); the
    rule fan-out is 2 rows per surviving pair. The effective support threshold is
    GREATEST(min_support, n_baskets * support_ppm DIV 1e6) — a
    FRACTIONAL floor, because an absolute count is the scaling bug of
    a-priori at corpus scale: 10x the baskets at a fixed absolute
    threshold densifies the frequent-item set and the pair lattice
    grows superlinearly (the r9 x10 probe measured 3.46x on exactly
    that); as a basket fraction the lattice size is scale-invariant.
    The default 100 ppm floors to min_support below ~20k baskets, so
    small-SF fixtures are unchanged. Returns top rules by
    (confidence_e6 DESC, antecedent, consequent): (antecedent,
    consequent, pair_count, n_antecedent, n_consequent, n_baskets,
    confidence_e6, lift_e6)."""
    b = _basket_item_arrays(df, basket_col, item_col).persist()
    try:
        n_b = b.select(
            F.count(F.lit(1)).alias("n_baskets")
        ).localCheckpoint(eager=True)  # 1 row; threshold + lift consumer
        thr = F.broadcast(
            n_b.select(
                F.greatest(
                    F.lit(min_support).cast("long"),
                    F.expr(f"(n_baskets * {support_ppm}) DIV 1000000"),
                ).alias("thr")
            )
        )
        item_cnt = (
            b.select(F.explode("items").alias("it"))
            .groupBy("it")
            .agg(F.count(F.lit(1)).alias("ic"))
        )
        freq = (
            item_cnt.crossJoin(thr)
            .filter(F.col("ic") >= F.col("thr"))
            .drop("thr")
        )
        # the pair-count threshold subsumes the old a-priori semi-join
        # (pair support >= thr forces both item supports >= thr)
        pairs = (
            _pair_counts(b, "pair_count")
            .withColumn("pair_count", F.col("pair_count").cast("long"))
            .crossJoin(thr)
            .filter(F.col("pair_count") >= F.col("thr"))
            .drop("thr")
        )
        sided = (
            pairs.join(
                freq.select(F.col("it").alias("p1"), F.col("ic").alias("c1")),
                "p1",
            )
            .join(
                freq.select(F.col("it").alias("p2"), F.col("ic").alias("c2")),
                "p2",
            )
            .crossJoin(F.broadcast(n_b))
        )
        rules = sided.selectExpr(
            "p1 AS antecedent", "p2 AS consequent", "pair_count",
            "CAST(c1 AS BIGINT) AS n_antecedent",
            "CAST(c2 AS BIGINT) AS n_consequent",
            "CAST(n_baskets AS BIGINT) AS n_baskets",
        ).unionByName(
            sided.selectExpr(
                "p2 AS antecedent", "p1 AS consequent", "pair_count",
                "CAST(c2 AS BIGINT) AS n_antecedent",
                "CAST(c1 AS BIGINT) AS n_consequent",
                "CAST(n_baskets AS BIGINT) AS n_baskets",
            )
        )
        return (
            rules.withColumn(
                "confidence_e6",
                F.expr("(pair_count * 1000000) DIV n_antecedent"),
            )
            .withColumn(
                "lift_e6",
                F.expr(
                    "(pair_count * n_baskets * 1000000)"
                    " DIV (n_antecedent * n_consequent)"
                ),
            )
            .filter(F.col("confidence_e6") >= min_confidence_e6)
            .orderBy(
                F.desc("confidence_e6"), "antecedent", "consequent"
            )
            .limit(top)
            .localCheckpoint(eager=True)
        )
    finally:
        b.unpersist()
