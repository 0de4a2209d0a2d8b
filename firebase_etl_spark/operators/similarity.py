"""Similarity search over an embedding column (array<float>).

Two paths (SURVEY.md extension inventory):

- **Brute-force cosine top-k** against a small query set: exact, linear in
  corpus size, probe side broadcast. The oracle-checkable baseline, and at
  100 TB still the right plan for a handful of probes (one scan, no index).
- **Random-hyperplane LSH (sign-LSH) bucketed ANN**: hash every vector to a
  compact bit-bucket; candidates share a bucket (multi-probe across tables
  for recall); exact cosine re-rank inside buckets. Sub-linear candidate
  sets at scale; recall measured against brute force in tests.

Pairwise dot products run in double precision via zip_with/aggregate
(small probe sets); bulk vector math (LSH bucketing, all-pairs cosine)
runs as vectorized numpy over Arrow batches — higher-order Column
expressions evaluate interpreted and lose to BLAS at matrix shapes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from firebase_etl_spark.functions.portable_math import (
    round_nudged as _round_nudged,
)


def _to_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def dot_unrolled(a, b, dim: int) -> Column:
    """Dot product unrolled at plan-build time for a known dimension: a flat
    sum of element_at products — no intermediate array allocation per row
    (zip_with materializes one). Left-to-right addition matches sequential
    summation order, so results are bit-equal to ``dot``.

    Measured caveat: per-expression evaluation is faster, but the 2*dim-
    term tree costs real codegen COMPILE time in every stage it appears in
    — at the gate corpus (10^4-10^5 pairs) the compile overhead exceeds
    the interpreted savings (A/B: cosine_topk 1.8-2.3s unrolled vs
    1.3-1.6s aggregate at sf0.1), and a dim of 32+ referenced many times
    risks the 64KB method limit entirely (see random_projection, which
    uses an Arrow pandas_udf instead). Unrolling pays only when the pair
    count per compiled stage is large enough to amortize — measure before
    wiring it into a query."""
    expr = None
    for i in range(1, dim + 1):
        term = F.element_at(a, i) * F.element_at(b, i)
        expr = term if expr is None else expr + term
    return expr


def _dot_scores_udf(cents: list[list[float]]):
    """Arrow-batched scorer: vector -> array of k RAW dot products vs the
    captured k x dim centroid matrix. Accumulates column-by-column
    left-to-right — the SAME IEEE-754 op sequence as ``dot``
    (aggregate/zip_with) and DuckDB's ``list_inner_product`` — so each
    score is bit-identical to ``dot(v, cv)``; no norm division (callers
    feed unit vectors on both sides, the ivf_topk contract). NULL or
    dim-mismatched vectors score NULL, as the join-based form dropped
    them. The k x dim expression-tree alternative evaluates interpreted
    past codegen limits (see random_projection's caveat).

    Returned non-deterministic (guide §4.4's optimizer fence): the
    downstream inner join on the argmax cell infers isnotnull(cell),
    and the optimizer pushes that predicate — with the whole UDF
    expression inlined — through the projection into the parquet scan's
    DataFilters, where a Python UDF cannot be evaluated
    ([INTERNAL_ERROR] Cannot evaluate expression, seen flakily under
    the bench session). The fence keeps every consumer of the scores
    ABOVE the ArrowEvalPython node; the function is pure, so values are
    unaffected."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.array(cents, dtype=np.float64)  # k x dim
    in_dim = C.shape[1]

    @pandas_udf("array<double>")
    def _score(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        vals = [
            np.asarray(x, dtype=np.float64)
            if x is not None and len(x) == in_dim
            else None
            for x in v
        ]
        ok = [x for x in vals if x is not None]
        if not ok:
            return pd.Series([None] * len(vals), dtype=object)
        M = np.stack(ok)
        acc = np.zeros((len(M), C.shape[0]))
        for i in range(in_dim):  # column-by-column == sequential IEEE order
            acc += M[:, i, None] * C[None, :, i]
        rows = iter(acc)
        return pd.Series(
            [next(rows) if x is not None else None for x in vals],
            dtype=object,
        )

    return _score.asNondeterministic()


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def normalized(a) -> Column:
    """Unit-length copy: pre-normalize BELOW a pairwise join so each pair
    costs one dot product instead of three array aggregates (dot + 2 norms).
    Projection runs once per row; the join multiplies only the dot.

    The norm is LET-BOUND via a single-element outer ``transform`` so it
    evaluates once per ROW, not once per element: the naive
    ``transform(a, x -> x / norm(a))`` re-evaluates the O(dim) norm
    aggregate inside the per-element lambda — O(dim²) interpreted work
    per row (measured 6x slower on the 64-dim fixture). Bit-identical
    output: the very same x / n divisions in the same order."""
    return F.element_at(
        F.transform(
            F.array(norm(a)), lambda n: F.transform(a, lambda x: x / n)
        ),
        1,
    )


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine for each probe id. Probe side broadcast; ranking
    via window with (similarity desc, id asc) — fully deterministic given
    6-dp rounding. Returns (query_id, vec_id, cosine_sim, rank).

    Pass ``dim`` to unroll the pairwise dot (dot_unrolled — bit-equal
    results) when the pair count amortizes the larger codegen; at the gate
    corpus sizes the aggregate form measures FASTER (see dot_unrolled's
    caveat), so the shipped queries leave dim unset."""
    vecs = df.select(
        F.col(id_col), normalized(_to_double(F.col(vec_col))).alias("v")
    )
    probes = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("q")
    )
    pairs = vecs.crossJoin(F.broadcast(probes)).filter(
        F.col(id_col) != F.col("query_id")
    )
    pair_dot = (
        dot_unrolled(F.col("v"), F.col("q"), dim)
        if dim
        else dot(F.col("v"), F.col("q"))
    )
    sims = pairs.select(
        "query_id",
        F.col(id_col),
        F.round(pair_dot, 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def signlsh_buckets(
    df: DataFrame,
    tables: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table random-hyperplane LSH. Each table t gets a bucket id:
    bit i = sign(v · plane_i). Output is exploded to one row per (vector,
    table) with a composite (table, bucket) key — candidates for a probe are
    vectors sharing the key in ANY table (standard OR-amplification).
    The per-vector hashing is one BLAS matmul against all tables' planes in
    a vectorized pandas_udf: (batch × dim) @ (dim × total_planes), sign-bit
    pack, table index in the high bits. The same math as Column expressions
    (dot per plane via aggregate/zip_with) runs ~3× slower — Spark
    evaluates higher-order array functions interpreted, outside codegen —
    and this is exactly the sanctioned Arrow-batched escape hatch."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    n_tables, n_planes = len(tables), len(tables[0])
    planes = np.array(
        [plane for table in tables for plane in table], dtype=np.float64
    )  # (n_tables*n_planes, dim)
    weights = 1 << np.arange(n_planes - 1, -1, -1)  # MSB-first, as the bit loop
    offsets = np.arange(n_tables, dtype=np.int64) << 32

    @pandas_udf("array<long>")
    def all_buckets(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, n_tables*n_planes)
        packed = bits.reshape(len(m), n_tables, n_planes) @ weights + offsets
        return pd.Series(list(packed))

    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(all_buckets(F.col(vec_col))).alias("bucket"),
    )


def ann_topk_lsh(
    df: DataFrame,
    query_ids: list[int],
    tables: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: candidates share an LSH bucket with the probe in at least one
    table; exact cosine re-rank on the deduplicated candidate set. At scale
    the bucket equi-join replaces the O(n·q) full scan; recall tunes with
    (tables × planes-per-table)."""
    # persist the bucket projection: the probe branch and the candidate
    # branch would each re-evaluate the tables*planes dot-product tree
    bucketed = signlsh_buckets(df, tables, id_col, vec_col).persist()
    try:
        probes = bucketed.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col("bucket").alias("qb")
        )
        cand_ids = (
            bucketed.join(
                F.broadcast(probes),
                (F.col("bucket") == F.col("qb"))
                & (F.col(id_col) != F.col("query_id")),
            )
            .select("query_id", id_col)
            .distinct()
        )
        vecs = df.select(
            F.col(id_col), normalized(_to_double(F.col(vec_col))).alias("v")
        )
        qvecs = vecs.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col("v").alias("q")
        )
        sims = (
            cand_ids.join(vecs, id_col)
            .join(F.broadcast(qvecs), "query_id")
            .select(
                "query_id",
                F.col(id_col),
                F.round(dot(F.col("v"), F.col("q")), 6).alias("cosine_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine_sim").desc(), F.col(id_col)
        )
        out = (
            sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .localCheckpoint(eager=True)
        )
    finally:
        bucketed.unpersist()
    return out


def quantized_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via int8 scalar quantization + exact re-rank — the
    memory-bandwidth scale path: at 100 TB the quantized copy of the
    corpus is 4× smaller than float32 (dim bytes per vector), candidate
    scoring runs on integer dot products, and only the ``shortlist``
    survivors per probe ever touch the full-precision vectors.

    Scheme: per-dimension corpus [min,max] over the NORMALIZED vectors
    (one posexplode + groupBy(dim) — partial aggregation collapses each
    partition to <= dim rows before the shuffle, so the stats cost one
    narrow map-side pass), affine-quantize each component to int8
    (round((x-mn)*255/(mx-mn)) - 128; constant dims get scale 0), rank
    candidates by integer dot product, then exact cosine re-rank of the
    top-``shortlist`` per probe (ties broken by id — deterministic).
    The re-rank joins back to the float vectors by id, so the shortlist
    window shuffles only (query_id, id, qdot) rows.

    With ``shortlist`` sized for full recall (measured: int8 on 64-dim
    unit vectors ranks the true top-10 well inside the top-100), the
    output EQUALS brute-force cosine_topk — which is what makes it
    oracle-checkable; recall is also asserted directly in tests."""
    # persist the normalized projection: normalized() re-evaluates its norm
    # per array element (HOF lambdas don't hoist), and BOTH the range-stats
    # branch and the quantize branch consume it — uncached, the corpus
    # would pay that O(dim^2) projection twice
    vecs = df.select(
        F.col(id_col), normalized(_to_double(F.col(vec_col))).alias("v")
    ).persist()
    dims = vecs.select(F.posexplode("v").alias("i", "x"))
    rng = (
        dims.groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "mn"))),
                lambda s: s["mn"],
            ).alias("mns"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "mx"))),
                lambda s: s["mx"],
            ).alias("mxs"),
        )
        .select(
            "mns",
            F.zip_with(
                "mxs",
                "mns",
                lambda mx, mn: F.when(
                    mx > mn, F.lit(255.0) / (mx - mn)
                ).otherwise(F.lit(0.0)),
            ).alias("scls"),
        )
    )

    def quant(vc):
        return F.zip_with(
            F.zip_with(vc, F.col("mns"), lambda x, mn: x - mn),
            F.col("scls"),
            lambda dx, s: (F.round(dx * s, 0) - F.lit(128)).cast("tinyint"),
        )

    # persist the (normalized, quantized) projection: it feeds the corpus
    # branch, both probe branches, and the re-rank join — and both
    # normalized() and the per-dim range subtree sit in HOF lambdas that
    # would otherwise re-evaluate per element per branch
    qvecs = (
        vecs.crossJoin(F.broadcast(rng))
        .select(F.col(id_col), F.col("v"), quant(F.col("v")).alias("qv"))
        .persist()
    )
    try:
        qprobes = qvecs.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col("qv").alias("qq")
        )
        # int math on the int8 payloads: tinyint*tinyint would overflow ANSI
        qdot = F.aggregate(
            F.zip_with(
                "qv", "qq", lambda a, b: a.cast("int") * b.cast("int")
            ),
            F.lit(0),
            lambda acc, t: acc + t,
        )
        scored = (
            qvecs.select(id_col, "qv")
            .crossJoin(F.broadcast(qprobes))
            .filter(F.col(id_col) != F.col("query_id"))
            .select("query_id", id_col, qdot.alias("qdot"))
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("qdot").desc(), F.col(id_col)
        )
        short_ids = (
            scored.withColumn("crank", F.row_number().over(wq))
            .filter(F.col("crank") <= shortlist)
            .select("query_id", id_col)
        )
        fprobes = qvecs.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col("v").alias("q")
        )
        sims = (
            short_ids.join(qvecs.select(id_col, "v"), id_col)
            .join(F.broadcast(fprobes), "query_id")
            .select(
                "query_id",
                F.col(id_col),
                F.round(dot(F.col("v"), F.col("q")), 6).alias("cosine_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine_sim").desc(), F.col(id_col)
        )
        out = (
            sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .localCheckpoint(eager=True)
        )
    finally:
        qvecs.unpersist()
        vecs.unpersist()
    return out


def cosine_all_pairs_blas(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via numpy/BLAS over Arrow batches
    (mapInPandas): each partition's row-block multiplies against the full
    normalized corpus matrix broadcast to every worker. This is the
    vectorized-Pandas-UDF escape hatch for math Spark's expression engine
    runs interpreted — ~10× the zip_with/aggregate formulation.

    Applicability: the corpus matrix must fit in a broadcast (n_vectors ×
    dim × 8 bytes). For corpora beyond that, the sign-LSH path
    (ann_topk_lsh) or a block-matrix join replaces it."""
    import numpy as np
    import pandas as pd

    corpus = df.select(id_col, vec_col).toPandas()
    ids = corpus[id_col].to_numpy()
    mat = np.array(corpus[vec_col].tolist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sc = df.sparkSession.sparkContext
    b_ids, b_mat = sc.broadcast(ids), sc.broadcast(mat)

    def run(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            sub_ids = pdf[id_col].to_numpy()
            sub = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            sub /= np.linalg.norm(sub, axis=1, keepdims=True)
            sims = sub @ all_mat.T  # (block × corpus)
            rows_i, cols_j = np.where(sims >= threshold)
            id_a = sub_ids[rows_i]
            id_b = all_ids[cols_j]
            keep = id_a < id_b  # dedup unordered pairs + drop self-pairs
            yield pd.DataFrame(
                {
                    "id_a": id_a[keep],
                    "id_b": id_b[keep],
                    "cosine_sim": np.round(sims[rows_i, cols_j][keep], 6),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        run, "id_a long, id_b long, cosine_sim double"
    )


def cosine_all_pairs_grid(
    df: DataFrame,
    threshold: float,
    n_blocks: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_block_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold as a BLOCK-MATRIX (grid) join —
    the scale path: no driver-side corpus materialization, no full-corpus
    broadcast (contrast cosine_all_pairs_blas, the small-corpus baseline).

    Plan: (1) normalize each vector JVM-side, (2) pack vectors into
    ``n_blocks`` row blocks keyed by ``id % n_blocks`` (one collect_list
    per block — a map-side-combinable shuffle of the data once), (3) join
    the upper-triangular grid of block pairs (B*(B+1)/2 rows), (4) one
    BLAS matmul per block pair inside mapInPandas, emitting only pairs at
    or above the threshold. Every unordered vector pair lives in exactly
    one block pair, so no dedup shuffle is needed afterwards.

    Scale accounting at N vectors, B blocks: shuffled bytes ~ N*B (each
    block joins B others), peak task memory = 2 blocks = 2*N/B vectors.
    Choose B ~ sqrt(N*dim*8 / task_mem) so blocks fit the executor (the
    default n_blocks=None derives exactly that from a count+dim probe); the
    quadratic work is irreducible for EXACT all-pairs — for corpora where
    even the grid is too hot, the sign-LSH path (ann_topk_lsh /
    signlsh_buckets + exact re-rank) is the sub-quadratic approximation.

    Output: (id_a, id_b, cosine_sim) with id_a < id_b, 6-dp rounding —
    byte-identical to cosine_all_pairs_blas (pinned in tests).
    """
    import math

    import numpy as np

    if n_blocks is None:
        # size B from the corpus so blocks fill (not fragment) executor
        # memory: B = ceil(sqrt(corpus_bytes / target_block_bytes)) keeps a
        # block ~ target bytes while block-PAIR count B*(B+1)/2 stays the
        # minimum the memory budget allows — a fixed B oversizes small
        # corpora into pure scheduling overhead (36 near-empty tasks at
        # sf0.1) and undersizes huge ones into spills. One tiny count+dim
        # action up front; the dim read prunes to the array column only.
        n_vecs, dim = (
            df.agg(
                F.count(F.lit(1)), F.first(F.size(F.col(vec_col)), ignorenulls=True)
            ).collect()[0]
            or (0, 0)
        )
        corpus_bytes = (n_vecs or 0) * (dim or 0) * 8
        n_blocks = max(2, math.ceil(math.sqrt(corpus_bytes / target_block_bytes)))

    vecs = df.select(
        F.col(id_col).alias("id"), normalized(_to_double(F.col(vec_col))).alias("v")
    ).withColumn("b", F.pmod(F.col("id"), F.lit(n_blocks)).cast("int"))
    packed = vecs.groupBy("b").agg(F.collect_list(F.struct("id", "v")).alias("rows"))
    grid = (
        packed.select(F.col("b").alias("ab"), F.col("rows").alias("arows"))
        .join(
            packed.select(F.col("b").alias("bb"), F.col("rows").alias("brows")),
            F.col("ab") <= F.col("bb"),
        )
        # one block pair per task: the matmul is the unit of work
        .repartition(n_blocks * (n_blocks + 1) // 2, "ab", "bb")
    )

    def run(batches):
        for pdf in batches:
            for arows, brows, diag in zip(
                pdf["arows"], pdf["brows"], (pdf["ab"] == pdf["bb"])
            ):
                a_ids = np.fromiter((r["id"] for r in arows), dtype=np.int64)
                b_ids = np.fromiter((r["id"] for r in brows), dtype=np.int64)
                a_mat = np.array([r["v"] for r in arows], dtype=np.float64)
                b_mat = np.array([r["v"] for r in brows], dtype=np.float64)
                sims = a_mat @ b_mat.T
                ii, jj = np.where(sims >= threshold)
                u, v = a_ids[ii], b_ids[jj]
                if diag:
                    keep = u < v
                    u, v, s = u[keep], v[keep], sims[ii, jj][keep]
                else:
                    s = sims[ii, jj]
                    u, v = np.minimum(u, v), np.maximum(u, v)
                yield pd.DataFrame(
                    {"id_a": u, "id_b": v, "cosine_sim": np.round(s, 6)}
                )

    return grid.mapInPandas(run, "id_a long, id_b long, cosine_sim double")


def embedding_norms(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector L2 norm + dimension — sanity/statistics surface."""
    v = _to_double(F.col(vec_col))
    return df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).alias("dim"),
        F.round(norm(v), 6).alias("l2_norm"),
    )


def ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    seed_ids: list[int] | None = None,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-Flat ANN: coarse-quantize every vector to its nearest centroid
    cell, probe only the ``n_probe`` cells closest to each query, exact
    cosine re-rank inside the candidate set.

    Centroids are deterministic seed vectors (rows of the corpus chosen by
    id), not k-means iterates — which keeps the whole operator a pure
    dataflow (fully oracle-checkable) while exercising the real IVF shape:
    a tiny broadcast centroid table, a partition-parallel assignment pass
    (map-side only — the centroid join broadcasts, the argmin is a partial
    aggregate), and a cell-bucketed candidate join instead of a full scan.
    At scale the assignment pass writes once (partitionBy(cell)) and every
    query touches n_probe/M of the data. Swap the seed centroids for
    k-means output (operators/clustering.py:kmeans_fit — the oracle-
    checkable spherical Lloyd trainer) and nothing downstream changes.

    Cosines are rounded to 6dp BEFORE the argmin/rank so Spark and the
    DuckDB oracle pick identical winners; ties break on lower cell/vec id.
    Pass ``dim`` to unroll both hot dots (bit-identical) when the pair
    count amortizes the larger codegen — see dot_unrolled's caveat.

    ``centroids`` takes TRAINED cell centers (e.g. clustering.kmeans_fit
    output — must be unit-norm, since the assignment argmaxes the raw
    dot against unit vectors) and overrides ``seed_ids``; cells are then
    numbered 0..len-1. Everything downstream of the centroid table is
    identical, as the seed-centroid docstring promises.

    Assignment shape (r11): both paths carry ``v`` ON the assignment
    row into a broadcast probe join, so the old exact re-rank join —
    a full PAYLOAD shuffle of the corpus by id — is gone ("decide with
    small rows, move big rows once"); only the probe-bounded candidate
    set ever reaches an exchange. The TRAINED path goes further: its
    centroid matrix is k x dim driver state, so every vector scores
    against all k cells in ONE Arrow-batched plain-dot pass and
    argmaxes IN-ROW — zero corpus shuffles at all (the scorer
    accumulates column-by-column, the ``dot``/list_inner_product IEEE
    order, and first-max = lowest cell id, so every cosine and winner
    is bit-identical to the crossJoin form). The SEED path's centroids
    are a corpus filter, so it keeps the JVM crossJoin+argmax but
    max_by-carries the vector through that one narrow aggregate
    exchange (map-side combine collapses the k-way fan-out first).
    """
    def _dot(a, b):
        return dot_unrolled(a, b, dim) if dim else dot(a, b)

    seeds = seed_ids if seed_ids is not None else [i * 31 for i in range(16)]
    vecs = df.select(
        F.col(id_col), normalized(_to_double(F.col(vec_col))).alias("v")
    )
    if centroids is not None:
        # trained path: cells numbered 0..len-1 in list order; the
        # centroid matrix is already driver state, so assignment is the
        # in-row Arrow scorer (zero corpus shuffle)
        cents_list = [[float(x) for x in c] for c in centroids]
        if not cents_list:  # degenerate: empty result, same schema
            assign = (
                vecs.select(
                    F.col(id_col),
                    "v",
                    F.lit(None).cast("long").alias("cell"),
                ).limit(0)
            )
            cents_df = F.broadcast(
                df.sparkSession.createDataFrame(
                    [], "cell long, cv array<double>"
                )
            )
        else:
            scores = _dot_scores_udf(cents_list)(F.col("v"))
            base = vecs.select(F.col(id_col), "v", scores.alias("__sc"))
            rounded = F.transform(F.col("__sc"), lambda x: F.round(x, 6))
            # nearest cell per vector, in-row: first max = lowest cell
            # id (a plain projection over the UDF column — generators /
            # windows over UDF output cannot be evaluated, so the probe
            # side below uses the k-literal crossJoin form instead)
            assign = base.select(
                F.col(id_col),
                "v",
                (F.array_position(rounded, F.array_max(rounded)) - 1)
                .cast("long")
                .alias("cell"),
            )
            cents_df = F.broadcast(
                df.sparkSession.createDataFrame(
                    [(i, c) for i, c in enumerate(cents_list)],
                    "cell long, cv array<double>",
                )
            )
    else:
        # seed path: the centroid table is a corpus filter, not driver
        # state — assignment keeps the JVM crossJoin+argmax, but the
        # max_by struct CARRIES the vector through the one narrow
        # aggregate shuffle so the old re-rank join (a second, PAYLOAD
        # shuffle of the whole corpus by id) disappears; map-side
        # partial aggregation collapses the k-row fan-out to one row
        # per vector before the exchange. Ordering key (cos, -cell) is
        # unique per vector, so the carried v is deterministic.
        cents_df = F.broadcast(
            vecs.filter(F.col(id_col).isin(seeds)).select(
                F.col(id_col).alias("cell"), F.col("v").alias("cv")
            )
        )
        sims = vecs.crossJoin(cents_df).select(
            F.col(id_col),
            "v",
            "cell",
            F.round(_dot(F.col("v"), F.col("cv")), 6).alias("cos"),
        )
        assign = (
            sims.groupBy(id_col)
            .agg(
                F.max_by(
                    F.struct("cell", "v"),
                    F.struct(F.col("cos"), -F.col("cell")),
                ).alias("b")
            )
            .select(F.col(id_col), F.col("b.v").alias("v"), F.col("b.cell").alias("cell"))
        )
    # top-n_probe cells per query: the query side is bounded by the
    # literal id list, so the crossJoin+window shape costs |queries| x k
    # rows of pure-JVM dot — bit-identical to the trained path's Arrow
    # scorer (same sequential accumulation)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cell")
    )
    probes = (
        vecs.filter(F.col(id_col).isin(query_ids))
        .crossJoin(cents_df)
        .select(
            F.col(id_col).alias("query_id"),
            "cell",
            F.round(_dot(F.col("v"), F.col("cv")), 6).alias("cos"),
        )
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "cell")
    )
    cand = assign.join(F.broadcast(probes), "cell").select(
        "query_id", id_col, "v"
    )
    qvecs = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("q")
    )
    scored = cand.join(F.broadcast(qvecs), "query_id").select(
        "query_id",
        id_col,
        F.round(_dot(F.col("v"), F.col("q")), 6).alias("cosine_sim"),
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def random_projection(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize_first: bool = True,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: (id, rp) with rp the
    out_dim-dimensional image of each vector under a FIXED Gaussian plane
    matrix (literals in the plan, so the projection is reproducible across
    runs, partitions and engines). The planes carry the JL 1/sqrt(out_dim)
    scaling (applied in rp_planes), so projecting the UNIT-normalized
    vector (default) makes projected dot products an unbiased estimate of
    full-space cosine: E[<Pa, Pb>] = <a, b> when P has i.i.d. N(0, 1/out_dim)
    entries.

    Scale shape: one scan, one Arrow-batched vectorized projection per
    batch (an out_dim x in_dim expression tree blows the JVM's 64 KB
    codegen method limit and falls back to interpreted eval — measured
    ~8x slower than this pandas_udf at sf0.1), no shuffle — the projected
    table is out_dim/in_dim the size of the corpus and is what a 100 TB
    pipeline materializes as its coarse search index.

    Float parity contract: the accumulation below runs column-by-column
    left-to-right (multiply rounds once, add rounds once per step) — the
    SAME IEEE-754 op sequence as F.aggregate/zip_with and DuckDB's
    list_inner_product — so the projected values are bit-identical to the
    oracle replay. Do NOT replace the loop with BLAS matmul (pairwise
    summation) without re-deriving the oracle."""
    import numpy as np

    P = np.array(planes, dtype=np.float64)  # out_dim x in_dim
    nrm = bool(normalize_first)

    in_dim = P.shape[1]

    @F.pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        # NULL or wrong-width embeddings project to NULL (the Column-
        # expression formulation null-propagates the same way) instead of
        # crashing np.stack on a ragged batch
        vals = [
            np.asarray(x, dtype=np.float64)
            if x is not None and len(x) == in_dim
            else None
            for x in v
        ]
        ok = [x for x in vals if x is not None]
        if not ok:
            return pd.Series([None] * len(vals), dtype=object)
        M = np.stack(ok)
        if nrm:
            sq = np.zeros(len(M))
            for i in range(M.shape[1]):
                sq += M[:, i] * M[:, i]
            M = M / np.sqrt(sq)[:, None]
        acc = np.zeros((len(M), P.shape[0]))
        for i in range(P.shape[1]):
            acc += M[:, i, None] * P[None, :, i]
        rows = iter(acc)
        return pd.Series(
            [next(rows) if x is not None else None for x in vals],
            dtype=object,
        )

    return df.select(F.col(id_col), _proj(F.col(vec_col)).alias("rp"))


def rp_topk(
    df: DataFrame,
    query_ids: list[int],
    planes: list[list[float]],
    k: int = 10,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via random projection: shortlist k*oversample candidates per
    probe by PROJECTED cosine (out_dim/in_dim the scoring cost of brute
    force), then exact re-rank the shortlist in full space. Same
    shortlist-then-verify contract as ann_topk_lsh / quantized_topk;
    returns (query_id, vec_id, cosine_sim, rank).

    The shortlist pass carries only (id, rp) — the full vectors rejoin by
    id afterwards, so the candidate scan reads the small projected index,
    not the corpus. Recall is corpus-dependent and LOSSY on a packed-cosine
    corpus: with the seed-13 32x64 JL planes in plans/queries_ext.py and
    oversample=8, measured recall@10 vs brute force is 0.70 at sf0.001 and
    0.74 at sf0.01 (floor 0.5 pinned in tests/test_approx.py); tune
    out_dim/oversample per corpus at scale. Note the flop crossover: with
    p probes the projection costs out_dim dots/row vs brute force's p
    dots/row, so the scheme only pays when probes outnumber out_dim (or
    the projected index is materialized once and amortized)."""
    # the projected index is referenced by both the shortlist build and
    # the probe extraction — persist so the corpus projection runs once
    # (released in the finally below; a real deployment materializes it
    # as a table instead)
    proj = random_projection(df, planes, id_col, vec_col).persist()
    probes_p = proj.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("rp").alias("qp")
    )
    scored = (
        proj.crossJoin(F.broadcast(probes_p))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col),
            F.round(dot(F.col("rp"), F.col("qp")), 6).alias("proj_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("proj_sim").desc(), F.col(id_col)
    )
    shortlist = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k * oversample)
        .select("query_id", id_col)
    )
    vecs = df.select(
        F.col(id_col), normalized(_to_double(F.col(vec_col))).alias("v")
    )
    probes_v = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("q")
    )
    exact = (
        shortlist.join(vecs, id_col)
        .join(F.broadcast(probes_v), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.round(dot(F.col("v"), F.col("q")), 6).alias("cosine_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    try:
        # materialize the (k x probes)-sized result while proj is cached,
        # then release the cache — the ann_topk_lsh persist pattern
        return (
            exact.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .localCheckpoint(eager=True)
        )
    finally:
        proj.unpersist()


def rp_planes(
    out_dim: int = 16, in_dim: int = 64, seed: int = 13
) -> list[list[float]]:
    """Fixed-seed Gaussian projection matrix with the Johnson-Lindenstrauss
    1/sqrt(out_dim) scaling baked into the entries (i.i.d. N(0, 1/out_dim)),
    so projected dot products of unit vectors estimate cosine directly.
    Shared by the Spark plan and the DuckDB oracle replay (repr(float)
    round-trips exactly into both engines' double literals)."""
    import math
    import random

    rng = random.Random(seed)
    s = 1.0 / math.sqrt(out_dim)
    return [
        [rng.gauss(0, 1) * s for _ in range(in_dim)] for _ in range(out_dim)
    ]


def _topk_from_probes(
    vecs: DataFrame, probes: DataFrame, k: int, id_col: str
) -> DataFrame:
    """cosine_topk's core with a DataFrame probe side (for probe sets
    defined by a predicate rather than an id list): broadcast probes,
    one pairwise dot over pre-normalized vectors, per-probe rank window.
    ``vecs``/``probes`` carry (id, v) / (query_id, q) unit vectors."""
    pairs = vecs.crossJoin(F.broadcast(probes)).filter(
        F.col(id_col) != F.col("query_id")
    )
    sims = pairs.select(
        "query_id",
        F.col(id_col),
        F.round(dot(F.col("v"), F.col("q")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return sims.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def mutual_knn_pairs(
    df: DataFrame,
    probe_filter: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mutual-kNN pairs within a probe sample: (a, b) where each vector
    ranks inside the other's top-k — the reciprocal-neighbor criterion
    that near-dup and clustering pipelines use as a high-precision edge
    (one-directional kNN is asymmetric: a hub can be in everyone's top-k
    without reciprocating). Returns (id_a, id_b, rank_ab, rank_ba,
    cosine_sim) with id_a < id_b.

    The sample-and-audit shape: the probe slice is bounded (a QA sample,
    like the other screens), so the kNN graph is sample x sample with
    the sample broadcast — at 100 TB the same reciprocal test runs on
    LSH/IVF candidate pairs instead of an all-pairs base. The cosine is
    symmetric bit-for-bit (one sequential zip_with dot over identically
    ordered arrays), so both directions agree at 6 dp by construction."""
    sub = df.filter(probe_filter).select(
        F.col(id_col), normalized(_to_double(F.col(vec_col))).alias("v")
    )
    knn = _topk_from_probes(
        sub,
        sub.select(F.col(id_col).alias("query_id"), F.col("v").alias("q")),
        k,
        id_col,
    )
    n1 = knn.select(
        F.col("query_id").alias("id_a"),
        F.col(id_col).alias("id_b"),
        F.col("rank").alias("rank_ab"),
        "cosine_sim",
    )
    n2 = knn.select(
        F.col("query_id").alias("id_b"),
        F.col(id_col).alias("id_a"),
        F.col("rank").alias("rank_ba"),
    )
    return (
        n1.join(n2, ["id_a", "id_b"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "rank_ab", "rank_ba", "cosine_sim")
        .orderBy("id_a", "id_b")
    )


def knn_distance_report(
    df: DataFrame,
    probe_filter: Column,
    k: int = 10,
    isolation_threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """kth-NN-distance outlier screen: per probe, the cosine of its
    1st/mean/kth nearest neighbor over the FULL corpus — a vector whose
    kth neighbor is still far from it sits in empty space (mislabeled,
    corrupted, or out-of-domain embedding; the classic kNN-distance
    outlier score, Ramaswamy et al. 2000). Probes bounded + broadcast;
    one corpus pass. ``mean_topk_sim`` is a FIXED-POINT integer mean
    (each 6-dp cosine scaled to BIGINT once, integer-summed, divided
    back in one fixed-order expression) so the report is
    partition-order-deterministic."""
    vecs = df.select(
        F.col(id_col), normalized(_to_double(F.col(vec_col))).alias("v")
    )
    probes = df.filter(probe_filter).select(
        F.col(id_col).alias("query_id"),
        normalized(_to_double(F.col(vec_col))).alias("q"),
    )
    top = _topk_from_probes(vecs, probes, k, id_col)
    return (
        top.groupBy("query_id")
        .agg(
            F.max("cosine_sim").alias("top1_sim"),
            # nudged round: sum_e6/k re-rounded at the SAME 1e-6
            # precision lands exactly on .5 whenever sum_e6 % k != 0 —
            # engine-version-dependent round(double) semantics would
            # flip it (portable_math.round_nudged, tools/round_audit.py)
            _round_nudged(
                F.sum(
                    F.round(F.col("cosine_sim") * 1000000.0, 0).cast("long")
                ).cast("double")
                / F.count(F.lit(1))
                / 1000000.0,
                6,
            ).alias("mean_topk_sim"),
            F.min("cosine_sim").alias("kth_sim"),
        )
        .withColumn(
            "is_isolated", F.col("kth_sim") < F.lit(isolation_threshold)
        )
        .orderBy("kth_sim", "query_id")
    )


def anisotropy_report(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label embedding anisotropy WITHOUT a pairwise join: for unit
    vectors, sum-of-pairwise-dots == ||sum-vector||^2 - sum-of-norms, so
    the mean pairwise cosine (Ethayarajh 2019's anisotropy measure — how
    far the space is from isotropic; also the intra-class tightness
    signal per label) falls out of per-dimension SUMS: one explode, one
    (label, dim) aggregate, zero O(n^2) anywhere — the identity IS the
    scale path.

    Determinism: components of the (identically computed) unit vectors
    are rounded once to 1e-4-unit BIGINTs, making every downstream sum
    an associative integer sum; the 1e4 scale (not 1e6) keeps
    sum-of-squared-dim-sums inside int64 for corpora to ~200M unit
    vectors x 1k dims. The report is therefore the EXACT anisotropy of
    the quantized vectors (~4 correct digits of the unquantized value
    at these corpus sizes) and bit-identical across engines. Returns
    (label, n_vectors, mean_norm_sq, mean_pairwise_cos)."""
    v = df.filter(F.col(label_col).isNotNull()).select(
        F.col(label_col).alias("label"),
        normalized(_to_double(F.col(vec_col))).alias("u"),
    )
    ex = v.select(
        "label",
        F.posexplode("u").alias("dim", "x"),
    ).select(
        "label",
        "dim",
        F.round(F.col("x") * 10000.0, 0).cast("long").alias("c"),
    )
    n_l = v.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    dim_sums = ex.groupBy("label", "dim").agg(F.sum("c").alias("s"))
    ssq = dim_sums.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).alias("ssq")
    )
    q = ex.groupBy("label").agg(F.sum(F.col("c") * F.col("c")).alias("q"))
    n = F.col("n").cast("double")
    return (
        n_l.join(ssq, "label")
        .join(q, "label")
        .select(
            "label",
            F.col("n").alias("n_vectors"),
            F.round(F.col("q").cast("double") / 100000000.0 / n, 6).alias(
                "mean_norm_sq"
            ),
            F.when(
                F.col("n") > 1,
                F.round(
                    (F.col("ssq") - F.col("q")).cast("double")
                    / 100000000.0
                    / (n * (n - F.lit(1.0))),
                    6,
                ),
            ).alias("mean_pairwise_cos"),
        )
        .orderBy("label")
    )


def hashed_tf_sparse(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashed SPARSE document embeddings (Weinberger et al.
    2009, the HashingTF representation): each token hashes to one of
    ``dim`` buckets with a +-1 sign hash, and a document becomes the
    integer rows (id, bucket, s) with s = sum(sign * count) — the
    model-free text->vector bridge into the similarity stack.

    Representation choices, deliberately:
    - SPARSE (bucket rows, never a dense array): at web scale dim is
      2^18-2^20 and a dense array per doc is exactly the thing that
      stops fitting; every consumer below is a join on bucket.
    - INTEGER components: counts and signs are exact, so cosines derive
      from integer sums via IEEE sqrt/divide — cross-engine
      deterministic with zero fixed-point machinery (the DuckDB twin
      replays md5 bucket/sign hashes verbatim).
    - md5-based bucket and sign hashes (not xxhash64) keep the whole
      construction engine-portable, the house convention for
      oracle-checkable hashing.

    One explode + one (doc, token) count + one (doc, bucket) sum —
    two map-side-combinable shuffles, no UDF."""
    from firebase_etl_spark.operators.text import tokenize

    toks = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("w")
    )
    counts = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10)
        .cast("bigint") % dim
    ).alias("bucket")
    sign = (
        F.lit(1)
        - F.lit(2)
        * (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("sgn"), F.col("w"))), 1, 1
                ),
                16,
                10,
            ).cast("int")
            % 2
        )
    )
    return (
        counts.select(
            F.col(id_col), bucket, (sign * F.col("c")).alias("sc")
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("sc").alias("s"))
        .filter(F.col("s") != 0)
    )


def hashed_tf_topk(
    df: DataFrame,
    query_ids: list[int],
    dim: int = 64,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` cosine neighbors per probe over the hashed-TF sparse
    embeddings: (query_id, doc_id, cos_sim, rank). The dot product is a
    bucket-keyed join of the probes' rows (tiny, broadcast) against the
    corpus rows — work proportional to the probes' nonzero buckets, one
    corpus pass; norms are one aggregate. Cosine = exact-integer dot /
    (sqrt . sqrt) rounded once at 6dp; ties break to the lower doc id.
    NULL-text documents have no rows and drop out; an empty string
    still carries the single '' token of the house tokenizer (mirrored
    by the oracle's regexp_split_to_array).

    The sparse vector table is MATERIALIZED once (it feeds norms,
    probes and the dot join — without this the token explode re-runs
    4x); at corpus scale this is the 'build the index once' step every
    retrieval system performs anyway."""
    vecs = hashed_tf_sparse(df, dim, text_col, id_col).localCheckpoint(
        eager=True
    )
    norms = vecs.groupBy(id_col).agg(
        F.sum(F.col("s") * F.col("s")).alias("nn")
    )
    probes = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        "bucket",
        F.col("s").alias("qs"),
    )
    dots = (
        vecs.join(F.broadcast(probes), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("qs") * F.col("s")).alias("dot"))
    )
    qn = norms.select(
        F.col(id_col).alias("query_id"), F.col("nn").alias("qnn")
    )
    scored = (
        dots.join(norms, id_col)
        .join(F.broadcast(qn), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(
                F.col("dot")
                / (
                    F.sqrt(F.col("qnn").cast("double"))
                    * F.sqrt(F.col("nn").cast("double"))
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos_sim", "rank")
    )


def knn_shapley_report(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """EXACT per-training-point data valuation for a K-NN classifier —
    the closed-form KNN-Shapley of Jia et al. 2019 (VLDB,
    arXiv:1908.08619): with training points sorted by similarity to a
    test point, s_N = 1[y_N = y]/N and
    s_j = s_{j+1} + (1[y_j = y] − 1[y_{j+1} = y]) · min(K, j)/(K·j) —
    the Shapley value of every training point under the KNN utility,
    in O(N log N) per test point instead of 2^N. The pipeline read-out
    for "which training data helps/hurts", summarized per label class:
    (label, n_train, sum_value_e12, min_value_e12, max_value_e12,
    n_negative).

    Determinism: neighbor order is (round(cosine, 6) DESC, id) — the
    suite's ANN ranking convention, identical on both engines; the
    recursion is evaluated as a SUFFIX SUM of per-rank terms, each a
    sign × magnitude of non-negative integer divisions in 1e12 fixed
    point (diff ∈ {−1, 0, 1} multiplies a positively-divided
    magnitude, so Spark DIV == DuckDB // everywhere). Integers only.

    Scale shape: one corpus × broadcast-probes similarity pass, then
    per-test-point windows (rank, lead, suffix sum) partitioned by
    query — exact KNN-Shapley is inherently per-test linear (the
    paper's bound); parallelism is the probe count × range-partitioned
    window sort, and the probe set is a handful by design."""
    E12 = 1_000_000_000_000
    v = df.select(
        F.col(id_col),
        _to_double(F.col(vec_col)).alias("e"),
        F.col(label_col).alias("lbl"),
    )
    probes = v.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("e").alias("q"),
        F.col("lbl").alias("q_lbl"),
    )
    train = v.filter(~F.col(id_col).isin(query_ids))
    sims = train.crossJoin(F.broadcast(probes)).select(
        "query_id",
        F.col(id_col),
        F.col("lbl"),
        (F.col("lbl") == F.col("q_lbl")).cast("long").alias("m"),
        F.round(
            dot(F.col("e"), F.col("q"))
            / (F.sqrt(dot(F.col("e"), F.col("e")))
               * F.sqrt(dot(F.col("q"), F.col("q")))),
            6,
        ).alias("sim"),
    )
    wq = Window.partitionBy("query_id")
    w_rank = wq.orderBy(F.desc("sim"), id_col)
    w_all = wq.orderBy("__j").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        sims.withColumn("__j", F.row_number().over(w_rank))
        .withColumn("__n", F.count(F.lit(1)).over(wq))
        .withColumn("__m_next", F.lead("m").over(wq.orderBy("__j")))
        .withColumn("__m_last", F.last("m").over(w_all))
    )
    # term_j (j < N): (m_j - m_{j+1}) * min(K, j)*E12 // (K*j), as
    # sign * positive-magnitude so truncating DIV == flooring //
    term = (
        "CASE WHEN __m_next IS NULL THEN CAST(0 AS BIGINT)"
        f" ELSE (m - __m_next)"
        f" * ((least(CAST({k} AS BIGINT), __j) * {E12})"
        f" DIV ({k} * __j)) END"
    )
    w_suffix = wq.orderBy(F.desc("__j")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scored = (
        ranked.withColumn("__term", F.expr(term))
        .withColumn(
            "__s_e12",
            F.expr(f"(__m_last * {E12}) DIV __n")
            + F.sum("__term").over(w_suffix),
        )
    )
    per_point = scored.groupBy(F.col(id_col), "lbl").agg(
        F.sum("__s_e12").alias("value_e12")
    )
    return (
        per_point.groupBy(F.col("lbl").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum("value_e12").alias("sum_value_e12"),
            F.min("value_e12").alias("min_value_e12"),
            F.max("value_e12").alias("max_value_e12"),
            F.sum((F.col("value_e12") < 0).cast("long")).alias(
                "n_negative"
            ),
        )
        .orderBy("label")
    )


def pq_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = 4,
    ksub: int = 16,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011, TPAMI) — the
    100 TB-scale compression path: each vector is encoded as ``m``
    one-byte codes (nearest sub-codebook entry per dim/m-dim subspace)
    plus ``m`` e6-integer norm fractions, queries score candidates by
    ASYMMETRIC DISTANCE (a per-query m × ksub lookup table, no vector
    math per candidate), and the top ``n_candidates`` re-rank by exact
    cosine. Storage per vector drops from dim × 4 B to m × (1 + 8) B;
    the scan side of a query is pure integer multiply-adds.

    Variant note (honest accounting): codebooks here are
    CONTENT-ADDRESSED SAMPLES (the first ``ksub`` ids' sub-vectors,
    unit-normalized) rather than Lloyd-refined — the trainer loop is
    already exercised by the IVF-trained family; what PQ adds is the
    subspace decomposition + table-lookup scoring, and the norm is
    quantized SEPARATELY (x_m ≈ ||x_m|| · c_code), so
    cos(q, x) ≈ Σ_m w_m · dot(q̂_m, c_m) with w_m = ||x_m||/||x|| —
    both factors rounded once to e6 integers, making the whole
    approximate score an exact integer dot of two small tables.

    Determinism: sub-assignment reuses the k-means scorer (6dp rounded
    cosines, ties to the lower code id); the ADC sum is integer; the
    final re-rank is the suite's (round(cosine, 6) DESC, id) order.
    Scale shape: encoding is one scan; the query side touches the
    (m · ksub)-row table and the byte codes, never raw vectors, until
    the bounded re-rank."""
    from firebase_etl_spark.operators.clustering import (
        _cell_cols,
        _cosine_scores_udf,
    )

    E6 = 1_000_000.0
    v = df.select(
        F.col(id_col).alias("vid"), _to_double(F.col(vec_col)).alias("e")
    ).filter(dot(F.col("e"), F.col("e")) > 0)
    dim = len(v.orderBy("vid").limit(1).collect()[0]["e"])
    sd = dim // m

    def _seq_ss(xs):
        ss = 0.0
        for x in xs:  # sequential == list_inner_product order
            ss += x * x
        return ss

    def _seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    import math as _m

    seed_rows = v.orderBy("vid").limit(ksub).collect()
    cents: list[list[list[float]]] = []  # [m][cid] -> unit sub-vector
    for mi in range(m):
        subs = []
        for r in seed_rows:
            s = list(r["e"][mi * sd:(mi + 1) * sd])
            nrm = _m.sqrt(_seq_ss(s))
            subs.append([x / nrm for x in s] if nrm > 0 else s)
        cents.append(subs)

    # encode: per subspace, code = argmax rounded cosine (k-means
    # scorer), w_e6 = round(||x_m|| / ||x|| * 1e6) — JVM-side rounds
    full_norm = F.sqrt(dot(F.col("e"), F.col("e")))
    enc_cols = []
    for mi in range(m):
        sub = F.slice("e", mi * sd + 1, sd)
        raw = _cosine_scores_udf(cents[mi])(sub)
        cell, _ = _cell_cols(raw)
        w = F.round(
            F.sqrt(dot(sub, sub)) / full_norm * E6, 0
        ).cast("long")
        enc_cols.append(
            F.struct(
                F.lit(mi).alias("m"),
                cell.alias("cid"),
                w.alias("w_e6"),
            )
        )
    enc = v.select(
        "vid", F.explode(F.array(*enc_cols)).alias("p")
    ).select("vid", "p.m", "p.cid", "p.w_e6")

    # per-query ADC tables: doubles computed driver-side in the exact
    # sequential IEEE order of list_inner_product, rounded JVM-side
    probe_rows = v.filter(F.col("vid").isin(query_ids)).collect()
    trows = []
    for r in probe_rows:
        q = list(r["e"])
        qn = _m.sqrt(_seq_ss(q))
        for mi in range(m):
            qm = q[mi * sd:(mi + 1) * sd]
            for cid, c in enumerate(cents[mi]):
                trows.append(
                    (int(r["vid"]), mi, cid, _seq_dot(qm, c) / qn)
                )
    spark = df.sparkSession
    tables = spark.createDataFrame(
        trows, "query_id long, m int, cid int, t_raw double"
    ).withColumn("t_e6", F.round(F.col("t_raw") * E6, 0).cast("long"))

    appx = (
        enc.join(F.broadcast(tables), ["m", "cid"])
        .filter(F.col("vid") != F.col("query_id"))
        .groupBy("query_id", "vid")
        .agg(F.sum(F.col("w_e6") * F.col("t_e6")).alias("a_e12"))
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("a_e12"), "vid")
    cand = (
        appx.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= n_candidates)
        .select("query_id", "vid")
    )
    q_side = v.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"), F.col("e").alias("q")
    )
    scored = (
        cand.join(F.broadcast(q_side), "query_id")
        .join(v, "vid")
        .select(
            "query_id",
            F.col("vid").alias("vec_id"),
            F.round(
                dot(F.col("e"), F.col("q"))
                / (F.sqrt(dot(F.col("e"), F.col("e")))
                   * F.sqrt(dot(F.col("q"), F.col("q")))),
                6,
            ).alias("cosine_sim"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), "vec_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", "rank")
        .orderBy("query_id", "rank")
    )


def mmr_topk(
    df: DataFrame,
    query_id: int,
    k: int = 8,
    pool: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998) for one probe vector: greedily pick the candidate
    maximizing relevance-to-query MINUS max-similarity-to-already-
    picked (the lambda = 0.5 form, scaled by 2 so it stays integer).
    The deduplicated complement of cosine_topk: a RAG context builder
    or eval-set sampler wants the k most relevant NON-REDUNDANT
    passages, not k near-copies of the best hit.

    Scale shape: ONE distributed relevance scan (probe broadcast, the
    cosine_topk plan) feeds a TakeOrdered(pool) candidate pull; the
    pool^2 pairwise similarities are computed ENGINE-side on the
    pool x pool self-join (<= pool^2 rows) and only then collected, so
    every float op shares the oracle's expression tree and the driver
    holds two bounded integer tables (pool rows + pool^2 pairs) —
    constants independent of corpus size. The greedy itself is pure
    integer arithmetic replayed verbatim by the oracle's unrolled CTE
    rounds (ties: lower vec_id; first pick = argmax relevance).

    Returns (mmr_rank, vec_id, rel_e6, red_e6, mmr_e6) — all BIGINT
    fixed-point 1e-6; red_e6 is 0 for the first pick by convention.
    """
    if k < 1:
        raise ValueError(f"mmr_topk needs k >= 1, got {k}")
    if pool < k:
        raise ValueError(f"mmr_topk needs pool >= k, got {pool} < {k}")
    vecs = df.select(
        F.col(id_col).alias("vid"),
        normalized(_to_double(F.col(vec_col))).alias("v"),
    ).filter(dot(F.col("v"), F.col("v")) > 0)
    probe = vecs.filter(F.col("vid") == query_id).select(
        F.col("v").alias("q")
    )
    rel_e6 = (
        F.round(F.round(dot(F.col("v"), F.col("q")), 6) * 1_000_000.0, 0)
        .cast("long")
        .alias("rel_e6")
    )
    pool_df = (
        vecs.crossJoin(F.broadcast(probe))
        .filter(F.col("vid") != query_id)
        .select("vid", "v", rel_e6)
        .orderBy(F.desc("rel_e6"), "vid")
        .limit(pool)
        .persist()
    )
    try:
        cand = [(int(r["vid"]), int(r["rel_e6"]))
                for r in pool_df.select("vid", "rel_e6").collect()]
        a = pool_df.select(
            F.col("vid").alias("a"), F.col("v").alias("va")
        )
        b = pool_df.select(
            F.col("vid").alias("b"), F.col("v").alias("vb")
        )
        sim_e6 = (
            F.round(
                F.round(dot(F.col("va"), F.col("vb")), 6) * 1_000_000.0, 0
            )
            .cast("long")
            .alias("sim_e6")
        )
        pair_rows = (
            a.join(b, F.col("a") < F.col("b"))
            .select("a", "b", sim_e6)
            .collect()
        )
    finally:
        pool_df.unpersist()
    sims: dict[tuple[int, int], int] = {}
    for r in pair_rows:
        sims[(int(r["a"]), int(r["b"]))] = int(r["sim_e6"])

    def pair(x: int, y: int) -> int:
        return sims[(x, y) if x < y else (y, x)]

    picked: list[tuple[int, int, int, int]] = []  # vid, rel, red, mmr
    remaining = dict(cand)
    for rank in range(min(k, len(cand))):
        best = None
        for vid, rel in remaining.items():
            red = (
                max(pair(vid, p[0]) for p in picked) if picked else 0
            )
            mmr = rel - red
            key = (-mmr, vid)
            if best is None or key < best[0]:
                best = (key, vid, rel, red, mmr)
        picked.append((best[1], best[2], best[3], best[4]))
        del remaining[best[1]]
    spark = df.sparkSession
    rows = [
        (rank, vid, rel, red, mmr)
        for rank, (vid, rel, red, mmr) in enumerate(picked)
    ]
    return spark.createDataFrame(
        rows,
        "mmr_rank int, vec_id long, rel_e6 long, red_e6 long,"
        " mmr_e6 long",
    ).orderBy("mmr_rank")


def rp_distortion_audit(
    df: DataFrame,
    planes: list[list[float]],
    sample_cap: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit of the random-projection
    index (the certification you run BEFORE trusting rp_topk's
    shortlist corpus-wide — the doc_minhash_recall_audit of the dense
    side): on a content-addressed fixed-size sample of vectors,
    compare every pair's exact full-space cosine against its projected
    cosine and histogram the signed e6 error into 0.05-wide bands.
    JL says the projected inner product is an unbiased estimator with
    stddev ~1/sqrt(out_dim); the audit MEASURES where this corpus
    actually lands.

    Scale shape: the sample is a distributed top-k by md5 (never a
    global sort of the corpus); pair work is bounded at cap^2 at ANY
    corpus size (the doc_similarity_histogram convention), and the
    sampling is surfaced in the output row (n_vectors_total,
    n_vectors_sampled). Returns per band: (band, n_pairs,
    min_delta_e6, max_delta_e6, n_vectors_total, n_vectors_sampled),
    band = min(4, |delta_e6| / 50000), ordered by band."""
    from firebase_etl_spark.functions.portable_math import fixed_e6_expr

    keyed = df.select(
        F.col(id_col).alias("vid"), _to_double(F.col(vec_col)).alias("e")
    ).filter(F.col("e").isNotNull())
    tot = keyed.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors_total")
    )
    sample = (
        keyed.withColumn(
            "__h",
            F.md5(F.concat(F.lit("rpda|"), F.col("vid").cast("string"))),
        )
        .orderBy("__h", "vid")
        .limit(sample_cap)
        .select("vid", "e")
        .localCheckpoint(eager=True)  # cap rows
    )
    nv = sample.select("vid", normalized(F.col("e")).alias("nv"))
    rp = random_projection(
        sample, planes, id_col="vid", vec_col="e"
    ).select("vid", "rp")
    side = nv.join(rp, "vid")
    pairs = (
        side.select(
            F.col("vid").alias("id_a"),
            F.col("nv").alias("nv_a"),
            F.col("rp").alias("rp_a"),
        )
        .crossJoin(
            F.broadcast(
                side.select(
                    F.col("vid").alias("id_b"),
                    F.col("nv").alias("nv_b"),
                    F.col("rp").alias("rp_b"),
                )
            )
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    # fixed_e6_expr consumes named columns: attach the two dots first
    scored = (
        pairs.withColumn("__cos_o", dot(F.col("nv_a"), F.col("nv_b")))
        .withColumn("__cos_p", dot(F.col("rp_a"), F.col("rp_b")))
        .select(
            F.expr(fixed_e6_expr("__cos_o")).alias("cos_orig_e6"),
            F.expr(fixed_e6_expr("__cos_p")).alias("cos_rp_e6"),
        )
        .withColumn("delta_e6", F.col("cos_rp_e6") - F.col("cos_orig_e6"))
    )
    n_sampled = sample.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors_sampled")
    )
    return (
        scored.groupBy(
            F.expr("least(4, abs(delta_e6) DIV 50000)")
            .cast("int")
            .alias("band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("delta_e6").alias("min_delta_e6"),
            F.max("delta_e6").alias("max_delta_e6"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n_sampled))
        .orderBy("band")
    )
