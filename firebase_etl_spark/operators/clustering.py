"""Spherical k-means (Lloyd) over an embedding column — the trainer the
IVF index anticipates (similarity.py:ivf_topk: "Swap the seed centroids
for k-means output and nothing downstream changes"), and the clustering
step of SemDeDup-style semantic curation (Abbas et al. 2023).

Extension beyond the reference (its pandas surface has no vector ops);
the distributed shape per Lloyd iteration is:

- **assignment**: one Arrow-batched ``pandas_udf`` scoring each vector
  against the k x dim centroid matrix (a Column-expression formulation
  with k*dim literals evaluates interpreted and cost ~4.7 s/iteration
  at sf0.01 — measured before this rewrite; the same lesson as
  random_projection's 64 KB-codegen fallback). Zero shuffle; rounding
  and the argmax stay JVM-side.
- **update**: one map-side-combinable aggregate of cardinality k x dim
  (fixed-point per-dimension BIGINT sums), pulled to the driver exactly
  like IVF's bounded k x dim centroid pull.

Driver state is k x dim floats per iteration; the corpus is scanned
once per iteration (the parsed unit vectors are persisted across
iterations). Nothing here is quadratic and nothing collects O(n) to
the driver.

DETERMINISM (the repo's fixed-point convention — classify.py):
vectors are unit-normalized up front (zero-norm rows excluded — their
cosine is NULL and NULL-ordering differs across engines); per-dimension
centroid sums are BIGINTs of round(x * 1e6) over the unit components
(identical doubles on every engine, so the rounded integer is
engine-invariant and the sum associative); mean centroids renormalize
to unit length via one sequential sum-of-squares + one division per
component, mirrored in the DuckDB oracle's ``list_transform``;
cosines are rounded to 6dp JVM-side BEFORE the argmax, ties break to
the lower cell id (first-max position in-row == ``ORDER BY cos_r DESC,
cid`` in the oracle). Cells that capture no vectors (or whose mean
cancels to zero) carry the previous centroid forward.

Float parity contract (random_projection's): the UDF accumulates dot
products and squared norms column-by-column left-to-right — the same
IEEE-754 op sequence as F.aggregate/zip_with and DuckDB's
``list_inner_product`` — so the raw cosines are bit-identical to the
oracle replay. Do NOT replace the loops with BLAS matmul (pairwise
summation) without re-deriving the oracle.

Initialization is the k lowest-id vectors — deterministic and
oracle-expressible, the same reasoning as IVF's seed centroids.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from firebase_etl_spark.functions.portable_math import round_nudged

from firebase_etl_spark.operators.similarity import (
    _to_double,
    dot,
    normalized,
)

_SCALE = 1000000.0


def _cosine_scores_udf(cents: list[list[float]]):
    """Arrow-batched scorer: unit vector -> array of k RAW cosines vs the
    captured centroid matrix, accumulated in oracle-identical order."""
    import numpy as np

    C = np.array(cents, dtype=np.float64)  # k x dim
    # sequential sum-of-squares per centroid (matches list_inner_product)
    cnorm = []
    for c in cents:
        ss = 0.0
        for x in c:
            ss += x * x
        cnorm.append(math.sqrt(ss))
    cn = np.array(cnorm, dtype=np.float64)
    in_dim = C.shape[1]

    @F.pandas_udf("array<double>")
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
        sq = np.zeros(len(M))
        for i in range(in_dim):  # column-by-column == sequential IEEE order
            acc += M[:, i, None] * C[None, :, i]
            sq += M[:, i] * M[:, i]
        cos = acc / (np.sqrt(sq)[:, None] * cn[None, :])
        rows = iter(cos)
        return pd.Series(
            [next(rows) if x is not None else None for x in vals],
            dtype=object,
        )

    return _score


def _cell_cols(raw: Column) -> tuple[Column, Column]:
    """(cell, cos_e6) from the raw score array: 6dp rounding and the
    first-max argmax run JVM-side so round-half behavior matches F.round
    / DuckDB exactly (numpy rounds half-to-even — never let it round)."""
    scores = F.transform(raw, lambda x: F.round(x, 6))
    cell = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    cos_e6 = F.round(F.array_max(scores) * _SCALE, 0).cast("long")
    return cell, cos_e6


def _unit_vecs(
    df: DataFrame, id_col: str, vec_col: str, extra: list[Column] | None = None
) -> DataFrame:
    v = _to_double(F.col(vec_col))
    return df.filter(dot(v, v) > 0).select(
        F.col(id_col).alias("vid"),
        normalized(v).alias("v"),
        *(extra or []),
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Run ``n_iter`` Lloyd rounds; return the k unit-norm centroids
    (list of dim-length float lists, indexed by cell id)."""
    vecs = _unit_vecs(df, id_col, vec_col).persist()
    try:
        seed_rows = vecs.orderBy("vid").limit(k).collect()
        cents = [list(r["v"]) for r in seed_rows]
        if not cents:  # empty corpus: nothing to fit
            return []
        dim = len(cents[0])
        for _ in range(n_iter):
            raw = _cosine_scores_udf(cents)(F.col("v"))
            cell, _ = _cell_cols(raw)
            # one k-row wide aggregate per iteration (k x (dim+1)
            # columns, bounded driver pull — IVF's k x dim contract).
            # Per-dimension sums over v[i] replace the old
            # posexplode -> groupBy(cell, pos) form: same
            # round(x * SCALE) long addends per (cell, dim), so the
            # per-cell sums are bit-identical, without shuffling a
            # rows x dim exploded table every round. Out-of-range v[i]
            # on a dim-mismatched vector is NULL, but such vectors get
            # a NULL cell from the scoring UDF anyway (skipped below,
            # ADVICE r5 #2).
            sums = (
                vecs.select(cell.alias("cell"), "v")
                .groupBy("cell")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.sum(
                            F.round(F.col("v")[i] * _SCALE, 0).cast("long")
                        ).alias(f"s{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            nxt = list(cents)
            for r in sums:
                if r["cell"] is None:
                    continue
                n = int(r["n"])
                m = [int(r[f"s{i}"]) / (_SCALE * n) for i in range(dim)]
                ss = 0.0
                for x in m:  # sequential == list_inner_product(m, m)
                    ss += x * x
                if ss > 0:
                    nrm = math.sqrt(ss)
                    nxt[int(r["cell"])] = [x / nrm for x in m]
            cents = nxt
    finally:
        vecs.unpersist()
    return cents


def kmeans_label_report(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Fit k-means, then audit the final clustering against the label
    column: per cluster (cluster, n_vecs, avg_cos, majority_label,
    purity). avg_cos is the mean assigned cosine via fixed-point integer
    sums; majority_label is the modal label (ties to the lower label,
    NULL labels counted as -1); purity = modal count / cluster size (one
    fixed-order integer-ratio expression — no float is ever summed).

    The returned plan is LAZY over the source: the fitted centroids are
    closure state of one scoring UDF, so the driver's action replays one
    scan."""
    cents = kmeans_fit(df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    if not cents:
        # empty corpus: nothing to assign (and an empty centroid matrix
        # has no defined scorer shape)
        return df.sparkSession.createDataFrame(
            [],
            "cluster int, n_vecs bigint, avg_cos double, "
            "majority_label int, purity double",
        )
    base = _unit_vecs(
        df,
        id_col,
        vec_col,
        extra=[F.coalesce(F.col(label_col), F.lit(-1)).alias("lbl")],
    )
    raw = _cosine_scores_udf(cents)(F.col("v"))
    cell, cos_e6 = _cell_cols(raw)
    assigned = base.select(
        "vid", "lbl", cell.alias("cluster"), cos_e6.alias("cos_e6")
    )
    per_label = assigned.groupBy("cluster", "lbl").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("cos_e6").alias("cos_e6"),
    )
    return (
        per_label.groupBy("cluster")
        .agg(
            F.sum("cnt").alias("n_vecs"),
            # nudged round: integer-ratio outputs land EXACTLY on .5
            # rounding boundaries (10/64 = .15625), where round(double)
            # semantics differ across engine versions — see
            # portable_math.round_nudged / tools/round_audit.py
            round_nudged(
                F.sum("cos_e6") / (F.sum("cnt") * F.lit(_SCALE)), 4
            ).alias("avg_cos"),
            F.max_by(
                F.struct(F.col("lbl").alias("l"), F.col("cnt").alias("c")),
                F.struct(F.col("cnt"), -F.col("lbl")),
            ).alias("mj"),
        )
        .select(
            "cluster",
            "n_vecs",
            "avg_cos",
            F.col("mj.l").alias("majority_label"),
            round_nudged(
                F.col("mj.c") / F.col("n_vecs"), 4
            ).alias("purity"),
        )
        .orderBy("cluster")
    )


def kcenter_seeds(
    df: DataFrame,
    k: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy maximin k-center selection (Gonzalez 1985, the classic
    2-approximation) over cosine distance — the DIVERSITY-coverage
    complement to k-means' density clustering: each round adds the
    point FARTHEST from every seed picked so far. For a training-data
    pipeline this is coreset/probe selection: k documents or prompts
    that maximally span the embedding space (k-means centers collapse
    into dense modes; maximin guarantees every corpus point is within
    the reported radius of some seed).

    Returns one row per selected seed: (seed_rank, vec_id, sel_dist_e6
    — the maximin distance at selection, monotonically non-increasing;
    2_000_000 sentinel for the rank-0 seed which no prior seed covers)
    plus the final coverage audit on every row (cover_radius_e6 = the
    k-center objective max-min-distance, cover_mean_e6 = integer mean
    min-distance). All fixed-point 1e-6 integers: per-point distance is
    1e6 - round(max 6dp seed cosine * 1e6), so the row is cross-engine
    exact and the DuckDB oracle unrolls the identical greedy rounds.

    Scale shape: k-1 corpus passes (one Arrow-batched scoring pass per
    round against a broadcast <= k x dim seed matrix, then a
    TakeOrdered(1) argmax — never a global sort), one final coverage
    pass; driver state is k ids + k vectors. Initialization: lowest id
    (deterministic, oracle-expressible)."""
    if k < 1:
        raise ValueError(f"kcenter_seeds needs k >= 1, got {k}")
    vecs = _unit_vecs(df, id_col, vec_col).persist()
    try:
        first = vecs.orderBy("vid").limit(1).collect()
        if not first:
            return df.sparkSession.createDataFrame(
                [],
                "seed_rank int, vec_id long, sel_dist_e6 long,"
                " cover_radius_e6 long, cover_mean_e6 long",
            )
        seeds = [(int(first[0]["vid"]), list(first[0]["v"]), 2_000_000)]

        def dist_col():
            raw = _cosine_scores_udf([s[1] for s in seeds])(F.col("v"))
            scores = F.transform(raw, lambda x: F.round(x, 6))
            cos_e6 = F.round(F.array_max(scores) * _SCALE, 0).cast("long")
            return (F.lit(1_000_000) - cos_e6).alias("dist_e6")

        for _ in range(1, k):
            picked = [s[0] for s in seeds]
            nxt = (
                vecs.filter(~F.col("vid").isin(picked))
                .select("vid", "v", dist_col())
                .orderBy(F.desc("dist_e6"), "vid")
                .limit(1)
                .collect()
            )
            if not nxt:  # corpus smaller than k
                break
            seeds.append(
                (int(nxt[0]["vid"]), list(nxt[0]["v"]), int(nxt[0]["dist_e6"]))
            )
        cover = (
            vecs.select(dist_col())
            .agg(
                F.max("dist_e6").alias("radius"),
                F.sum("dist_e6").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        radius = int(cover["radius"])
        mean = int(cover["s"]) // int(cover["n"])
    finally:
        vecs.unpersist()
    rows = [
        (rank, vid, sel, radius, mean)
        for rank, (vid, _, sel) in enumerate(seeds)
    ]
    return df.sparkSession.createDataFrame(
        rows,
        "seed_rank int, vec_id long, sel_dist_e6 long,"
        " cover_radius_e6 long, cover_mean_e6 long",
    ).orderBy("seed_rank")


def dbscan_report(
    df: DataFrame,
    threshold: float = 0.4,
    min_pts: int = 3,
    top: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. 1996) over
    cosine similarity — the density complement to k-means (fixed k,
    convex cells) and k-center (coverage): clusters grow through CORE
    points (>= min_pts neighbors at cosine >= threshold, counting
    self), BORDER points attach to an adjacent core's cluster, the
    rest is NOISE. The curation read-out: how much of the embedding
    corpus sits in dense semantic clumps vs isolated tail.

    Determinism: the eps-graph comes from the exact grid join
    (cosine_all_pairs_grid); clusters are labeled by the MIN core
    vec_id (connected_components); a border adjacent to several
    clusters joins the lowest label — every choice integer-ordered.

    Scale shape: the pair graph is the irreducible cost and reuses
    the block-matrix join (no driver corpus materialization); the
    edge list is OUTPUT-sized and localCheckpointed once (degree
    census, core-core filter and border attach all read it — not the
    matmul); components via the adaptive CC operator. Returns the
    ``top`` largest clusters (ties: lower label) with corpus-level
    columns repeated per row: (cluster, n_core, n_border,
    n_clusters, n_clustered, n_noise, n_points)."""
    from firebase_etl_spark.operators.graph import connected_components
    from firebase_etl_spark.operators.similarity import (
        cosine_all_pairs_grid,
    )

    edges = (
        cosine_all_pairs_grid(
            df, threshold, id_col=id_col, vec_col=vec_col
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    pts = _unit_vecs(df, id_col, vec_col).select(
        F.col("vid").alias("node")
    )
    sym = edges.select(
        F.col("id_a").alias("node"), F.col("id_b").alias("nbr")
    ).union(
        edges.select(F.col("id_b").alias("node"), F.col("id_a").alias("nbr"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    core = deg.filter(F.col("d") + 1 >= min_pts).select("node")
    cc_edges = (
        edges.join(core.withColumnRenamed("node", "id_a"), "id_a",
                   "left_semi")
        .join(core.withColumnRenamed("node", "id_b"), "id_b",
              "left_semi")
    )
    comp = connected_components(cc_edges, "id_a", "id_b")
    # cores isolated among cores (no core neighbor) self-label
    core_lbl = core.join(comp, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("cluster")
    ).localCheckpoint(eager=True)
    border = (
        sym.join(core_lbl.withColumnRenamed("node", "nbr"), "nbr")
        .join(core_lbl.select("node"), "node", "left_anti")
        .groupBy("node")
        .agg(F.min("cluster").alias("cluster"))
    )
    members = core_lbl.select(
        "node", "cluster", F.lit(1).alias("is_core")
    ).union(border.select("node", "cluster", F.lit(0).alias("is_core")))
    per = members.groupBy("cluster").agg(
        F.sum("is_core").cast("long").alias("n_core"),
        F.sum(1 - F.col("is_core")).cast("long").alias("n_border"),
    ).localCheckpoint(eager=True)
    # cluster-count-sized, TWO consumers (corpus totals + final select):
    # without the cut both re-inline the border-attach join chain
    # (PLAN_AUDIT: 36 exchanges → expect roughly half)
    tot = F.broadcast(
        per.agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum(F.col("n_core") + F.col("n_border")).cast("long")
            .alias("n_clustered"),
        ).crossJoin(
            pts.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
        ).select(
            "n_clusters",
            F.coalesce("n_clustered", F.lit(0)).alias("n_clustered"),
            (F.col("n_points")
             - F.coalesce("n_clustered", F.lit(0))).alias("n_noise"),
            "n_points",
        )
    )
    return (
        per.crossJoin(tot)
        .select(
            "cluster", "n_core", "n_border", "n_clusters",
            "n_clustered", "n_noise", "n_points",
        )
        .orderBy(
            F.desc(F.col("n_core") + F.col("n_border")), "cluster"
        )
        .limit(top)
    )


def _tdiv(num: int, den: int) -> int:
    """Sign-split truncating integer division — the Python twin of
    portable_math.sdiv_scaled_sql's CASE (Spark DIV truncates, DuckDB
    // truncates on integers; Python // floors, so split the sign)."""
    if den == 0:
        return 0
    q = abs(num) // den
    return q if num >= 0 else -q


def pca_power_report(
    df: DataFrame,
    vec_col: str = "embedding",
    iters: int = 30,
) -> DataFrame:
    """Top principal component of the (quantized) unit-embedding
    covariance via integer power iteration — the spectral companion to
    anisotropy_report (which gives the MEAN cosine; this gives the
    dominant DIRECTION and its variance share, the classic
    'rogue dimension' / whitening diagnostic for embedding spaces,
    Mu & Viswanath 2018).

    Distributed shape (the 100 TB path): unit vectors are quantized to
    1e-4-unit BIGINTs (the anisotropy_report convention), then ONE
    mapInPandas pass accumulates the d x d integer Gram matrix
    per Arrow batch (numpy int64 matmul; per-batch magnitude
    <= batch_rows * 1e8, far inside int64) and emits d(d+1)/2 + d + 1
    partial rows — a map-side-combinable aggregate of O(d^2) rows, no
    shuffle of vector data, nothing O(n^2). The d^2-sized sums are
    pulled to the driver (bounded, like kmeans_fit's k x dim pull) and
    the power iteration runs in EXACT Python integers on the scatter
    matrix M = n*G - s s^T (n^2 x the covariance — scale-free for
    eigenvectors), so no overflow at any corpus size.

    DETERMINISM: every step after quantization is integer-exact.
    Each iteration renormalizes v to max|v_i| = 1e6 via sign-split
    truncating division (_tdiv == the oracle's CASE + //); 'iters' is
    FIXED (no convergence test — identical work on both engines). Sign
    convention: the largest-|loading| dimension (lowest index on ties)
    is made positive. Variance share = Rayleigh(M, v) / trace(M) in
    e6 fixed point, integer-truncated.

    Returns one row per dimension: (dim, loading_e6, var_share_e6,
    n_vectors), ordered by dim.
    """
    q = df.filter(F.col(vec_col).isNotNull()).select(
        F.transform(
            normalized(_to_double(F.col(vec_col))),
            lambda x: F.round(x * 10000.0, 0).cast("long"),
        ).alias("c")
    )

    def gram(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf["c"]), dtype="int64")
            g = mat.T @ mat
            s = mat.sum(axis=0)
            d = mat.shape[1]
            ii, jj = np.triu_indices(d)
            out = pd.DataFrame(
                {"i": ii, "j": jj, "v": g[ii, jj]}
            )
            dims = pd.DataFrame(
                {"i": range(d), "j": [-1] * d, "v": s}
            )
            cnt = pd.DataFrame({"i": [-1], "j": [-1], "v": [len(pdf)]})
            yield pd.concat([out, dims, cnt], ignore_index=True)

    parts = (
        q.mapInPandas(gram, "i int, j int, v long")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    s: dict[int, int] = {}
    g: dict[tuple[int, int], int] = {}
    n = 0
    for r in parts:
        if r["i"] == -1:
            n = int(r["v"])
        elif r["j"] == -1:
            s[int(r["i"])] = int(r["v"])
        else:
            g[(int(r["i"]), int(r["j"]))] = int(r["v"])
    d = len(s)
    spark = df.sparkSession
    if d == 0 or n == 0:
        return spark.createDataFrame(
            [], "dim int, loading_e6 long, var_share_e6 long,"
            " n_vectors long"
        )
    m = [[0] * d for _ in range(d)]
    for (i, j), val in g.items():
        mv = n * val - s[i] * s[j]
        m[i][j] = mv
        m[j][i] = mv
    v = [10**6] * d
    w = [0] * d
    for _ in range(iters):
        w = [sum(m[i][j] * v[j] for j in range(d)) for i in range(d)]
        vmax = max(abs(x) for x in w)
        v = [_tdiv(x * 10**6, vmax) for x in w] if vmax else [0] * d
    w = [sum(m[i][j] * v[j] for j in range(d)) for i in range(d)]
    num = sum(v[i] * w[i] for i in range(d))
    den = sum(x * x for x in v)
    trace = sum(m[i][i] for i in range(d))
    lam = _tdiv(num, den)
    share = _tdiv(lam * 10**6, trace) if trace > 0 else 0
    p = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[p] < 0:
        v = [-x for x in v]
    rows = [(i, v[i], share, n) for i in range(d)]
    return spark.createDataFrame(
        rows, "dim int, loading_e6 long, var_share_e6 long, n_vectors long"
    )
