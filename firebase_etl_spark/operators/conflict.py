"""Conflict resolution against a load target — anti-join + id regeneration.

Parity target: reference main.py:144-154 + postgres_loader.py:54-86: fetch
all existing target ids, per-row membership test, regenerate colliding ids by
rejection-sampling uuid4 prefixes (J2/J3).

Spark-first design: the O(n·m) membership loop becomes a left-anti /
left-semi join. The existing-id side is a single projected column (column
pruning pushes to the source scan); it is usually small enough to broadcast.
Regenerated ids can collide again, so the rewrite iterates to a fixpoint —
each iteration only reprocesses the (tiny) colliding remainder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from firebase_etl_spark.functions.identity import uuid20


def skip_conflicts(incoming: DataFrame, existing: DataFrame, key: str = "id") -> DataFrame:
    """Rows whose key does not already exist in the target (left anti)."""
    return incoming.join(F.broadcast(existing.select(key)), key, "left_anti")


def find_conflicts(incoming: DataFrame, existing: DataFrame, key: str = "id") -> DataFrame:
    """Rows whose key already exists in the target (left semi)."""
    return incoming.join(F.broadcast(existing.select(key)), key, "left_semi")


def resolve_id_conflicts(
    incoming: DataFrame,
    existing: DataFrame,
    key: str = "id",
    max_rounds: int = 5,
) -> DataFrame:
    """Rewrite colliding ids with fresh uuid20s until disjoint from both the
    target's ids and the non-colliding incoming rows.

    Each round: semi-join finds collisions, they get fresh ids, the loop
    re-checks. With 20-char uuid space re-collision is ~impossible, so this
    is 1 round in practice; ``max_rounds`` bounds the plan size. The
    existing-id projection is broadcast — no shuffle of the incoming side.
    """
    existing_ids = existing.select(key)
    clean = incoming.join(F.broadcast(existing_ids), key, "left_anti")
    colliding = incoming.join(F.broadcast(existing_ids), key, "left_semi")
    for _ in range(max_rounds):
        if colliding.isEmpty():
            break
        retried = colliding.withColumn(key, uuid20())
        still = retried.join(F.broadcast(existing_ids), key, "left_semi")
        clean = clean.unionByName(
            retried.join(F.broadcast(existing_ids), key, "left_anti")
        )
        colliding = still
    return clean


def cascade_purge_audit(
    roots: DataFrame,
    root_key: str,
    chain: list,
) -> DataFrame:
    """Right-to-be-forgotten impact analysis: given a deletion list of
    root keys, walk the foreign-key chain and report per table how many
    rows a cascading purge would remove — the dry-run every GDPR/CCPA
    deletion pipeline executes before issuing destructive deletes (the
    destructive half is the reference's delete-by-key sink,
    postgres_loader.py:405-424; this operator is its audit twin).

    ``chain`` is a list of (table_name, df, fk_col, pk_col) hops: rows of
    each hop matching the previous level's surviving keys are purged, and
    that hop's ``pk_col`` values become the next level's key set (pass
    pk_col=None for a leaf). Each hop is ONE left-semi join against the
    (typically tiny, broadcastable) purged-key set plus one count
    aggregate — keys flow down the chain, fact tables are never joined to
    each other. Returns one row per table: (table, n_rows, n_purged,
    purge_rate), deletion list first."""
    if not chain:
        raise ValueError("chain must be non-empty")
    # materialize the (tiny) deletion-key set at every hop: each level's
    # keys are consumed by the semi join AND the next hop's derivation,
    # and without truncation hop N re-plans every earlier hop's joins
    # (the plan-audit repeated-scans flag showed the root dim scanned 7x)
    keys = (
        roots.select(F.col(root_key).alias("__k"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = []
    level_keys = keys
    for name, df, fk_col, pk_col in chain:
        hit = df.join(
            F.broadcast(level_keys.withColumnRenamed("__k", fk_col)),
            fk_col,
            "left_semi",
        )
        stats = (
            df.agg(F.count(F.lit(1)).alias("n_rows"))
            .crossJoin(
                F.broadcast(hit.agg(F.count(F.lit(1)).alias("n_purged")))
            )
            .select(
                F.lit(name).alias("table"),
                "n_rows",
                "n_purged",
                F.round(F.col("n_purged") / F.col("n_rows"), 6).alias(
                    "purge_rate"
                ),
            )
        )
        out.append(stats)
        if pk_col is not None:
            level_keys = (
                hit.select(F.col(pk_col).alias("__k"))
                .distinct()
                .localCheckpoint(eager=True)
            )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.orderBy("table")
