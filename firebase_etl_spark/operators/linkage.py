"""Fuzzy record linkage — blocked edit-distance matching of dirty records
against a clean dimension (extension beyond the reference; the reference's
exact-email dedup, user_transformer.py:236-320, is the degenerate
distance-0 case of this operator).

Pipeline shape (the standard scalable similarity-join recipe, same family
as the LSH banding joins in dedup_approx.py):

    block      explode positional q-grams of the corrupted key zone on
               both sides; equi-join on (gram, position band) generates
               candidate pairs — never an all-pairs product
    verify     exact bounded Levenshtein on the candidates only
               (``F.levenshtein(l, r, threshold)`` stops early above the
               bound — JVM-side, no UDF)
    elect      best match per probe by (distance, key) via one keyed
               window — deterministic

Recall: for a single character deletion in a zone of length m, at least
one of the zone's q-grams is untouched and shifts position by at most 1
(a deletion corrupts at most q consecutive grams), so blocking on
(gram, |Δpos| <= 1) is complete for distance-1 probes whenever m >= 2q-1.
Verification is exact, so precision is exact; the brute-force equality
test in tests/test_operators.py pins completeness.

Scale: candidates are bucket-local (gram equi-join); the gram explode is
q * zone_length rows per record — linear. A hot gram (low-entropy key
zones) expands quadratically inside its bucket only; the document-
frequency cut used by winnow_near_dups applies unchanged if a corpus
needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def positional_grams(
    df: DataFrame, col: str, key: str, q: int = 3
) -> DataFrame:
    """(key, gram, pos): all positional q-grams of ``col``. JVM-side:
    sequence + transform + explode, no UDF."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col) - (q - 1), F.lit(1))),
        lambda i: F.struct(
            F.col(col).substr(i, F.lit(q)).alias("gram"), i.alias("pos")
        ),
    )
    return df.select(
        F.col(key), F.explode(grams).alias("g")
    ).select(key, F.col("g.gram").alias("gram"), F.col("g.pos").alias("pos"))


def blocked_candidates(
    probes: DataFrame,
    targets: DataFrame,
    probe_key: str = "probe_id",
    probe_col: str = "probe_zone",
    target_key: str = "target_id",
    target_col: str = "target_zone",
    q: int = 3,
    pos_slack: int = 1,
) -> DataFrame:
    """Distinct (probe_key, target_key) pairs sharing at least one q-gram
    at positions within ``pos_slack`` — the blocking stage."""
    pg = positional_grams(probes, probe_col, probe_key, q).withColumnRenamed(
        "pos", "ppos"
    )
    tg = positional_grams(targets, target_col, target_key, q).withColumnRenamed(
        "pos", "tpos"
    )
    return (
        pg.join(tg, "gram")
        .filter(F.abs(F.col("ppos") - F.col("tpos")) <= pos_slack)
        .select(probe_key, target_key)
        .distinct()
    )


def fuzzy_link(
    probes: DataFrame,
    targets: DataFrame,
    *,
    probe_key: str = "probe_id",
    probe_name: str = "probe_name",
    target_key: str = "target_id",
    target_name: str = "target_name",
    zone_expr=None,
    max_distance: int = 1,
    q: int = 3,
) -> DataFrame:
    """Link each probe to its best target: gram-blocked candidates ->
    bounded Levenshtein verify -> (distance, target_key) election.
    ``zone_expr(col)`` extracts the blocking zone (default: whole string).
    Returns (probe_key, probe_name, target_id=matched, distance)."""
    zone = zone_expr or (lambda c: F.col(c))
    p = probes.select(
        probe_key, probe_name, zone(probe_name).alias("probe_zone")
    )
    t = targets.select(
        target_key, target_name, zone(target_name).alias("target_zone")
    )
    cand = blocked_candidates(
        p.select(probe_key, "probe_zone"),
        t.select(target_key, "target_zone"),
        probe_key=probe_key,
        target_key=target_key,
        q=q,
    )
    verified = (
        cand.join(p.select(probe_key, probe_name), probe_key)
        .join(t.select(target_key, target_name), target_key)
        .withColumn(
            "distance",
            F.levenshtein(F.col(probe_name), F.col(target_name), max_distance),
        )
        .filter(F.col("distance") >= 0)  # threshold form returns -1 above bound
    )
    w = Window.partitionBy(probe_key).orderBy("distance", target_key)
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(probe_key, probe_name, target_key, "distance")
    )
