"""Embedding-space label audits (extension beyond the reference — the
labeled-data QA step of a training pipeline: does the embedding geometry
agree with the labels? Nearest-class-mean is Rocchio classification /
the shrunken-centroid baseline; k-NN agreement is the standard
label-noise screen, e.g. Northcutt et al. 2021 "Confident Learning").

Scale shape: per-label centroids are (n_labels x dim) — collected to
the driver (bounded, like IVF's k x dim centroid pull) and re-entered
as broadcast literals; classification is then one embarrassingly
parallel scan with an in-row argmax, and the confusion rollup is one
(n_labels^2)-row aggregate.

DETERMINISM: per-dimension centroid sums are FIXED-POINT BIGINTs
(round(x * 1e6) per component — float32 inputs cast to double multiply
EXACTLY the same on every engine, so the rounded integer is identical
everywhere and the sum is associative). Centroid components leave the
integers by one double division, mirrored verbatim in the DuckDB
oracle. Cosines are rounded to 6dp before the argmax and averaged via
fixed-point integer sums — no double is ever summed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from firebase_etl_spark.operators.similarity import _to_double, dot, norm


def label_centroid_confusion(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-class-mean confusion matrix: (label, pred_label, n_vecs,
    avg_cos). Each vector is assigned to the class centroid with the
    highest 6dp-rounded cosine (ties to the lower label id); rows where
    label == pred_label are the diagonal. avg_cos is the mean assigned
    cosine, derived from an integer sum of the rounded values."""
    vecs = df.select(
        F.col(id_col),
        F.col(label_col).alias("label"),
        _to_double(F.col(vec_col)).alias("v"),
    ).filter(F.col("label").isNotNull())  # unlabeled rows train nothing
    # fixed-point per-dimension sums -> exact (n_labels x dim) centroid
    # table on the driver; one explode, one map-side-combinable agg
    cent_rows = (
        vecs.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.sum(F.round(F.col("x") * 1000000.0, 0).cast("long")).alias(
                "s_e6"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "s_e6", "n"))
            ).alias("psn")
        )
        .orderBy("label")
        .collect()
    )
    if not cent_rows:
        # empty corpus: no centroids to classify against — empty result
        # with the output schema (an empty F.array() literal types VOID
        # and would fail analysis inside the lambdas below)
        return df.sparkSession.createDataFrame(
            [],
            "label int, pred_label int, n_vecs bigint, avg_cos double",
        )
    labels = [int(r["label"]) for r in cent_rows]
    cents = [
        [
            int(p["s_e6"]) / (1000000.0 * int(p["n"]))
            for p in r["psn"]
        ]
        for r in cent_rows
    ]
    ctab = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
    ltab = F.array(*[F.lit(int(li)) for li in labels])

    # in-row argmax over the literal centroid table: cosine materialized
    # per (vector, centroid) via posexplode, winner by max_by with the
    # 6dp-rounded score and lower-label tiebreak
    scored = vecs.select(
        id_col,
        "label",
        F.posexplode(
            F.transform(
                ctab,
                lambda c: F.round(
                    dot(F.col("v"), c) / (norm(F.col("v")) * norm(c)), 6
                ),
            )
        ).alias("ci", "cos_r"),
    ).select(
        id_col,
        "label",
        F.get(ltab, F.col("ci")).alias("pred_label"),
        "cos_r",
    )
    best = scored.groupBy(id_col, "label").agg(
        F.max_by(
            F.struct("pred_label", "cos_r"),
            F.struct(F.col("cos_r"), -F.col("pred_label")),
        ).alias("w")
    )
    return (
        best.select(
            "label",
            F.col("w.pred_label").alias("pred_label"),
            F.round(F.col("w.cos_r") * 1000000.0, 0)
            .cast("long")
            .alias("cos_e6"),
        )
        .groupBy("label", "pred_label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum("cos_e6") / (F.count(F.lit(1)) * F.lit(1000000.0)), 4
            ).alias("avg_cos"),
        )
        .orderBy("label", "pred_label")
    )
