"""Approximate / near-duplicate detection at corpus scale.

Four families, each idiomatic Spark (SURVEY.md extension inventory):

- **exact**: hash-groupBy on a normalized fingerprint (text.fingerprint).
- **n-gram Jaccard vs a query set**: exact token-set Jaccard against a small
  set of probe documents — linear in corpus size (broadcast the probes), the
  oracle-checkable baseline.
- **MinHash + LSH**: signature = per-seed min over shingle hashes (native
  xxhash64 — no Python); banding -> candidate buckets -> exact-Jaccard
  verify. All-pairs near-dup detection without the O(n²) cross join: cost is
  O(n · seeds) + bucket-local pairs. This is the 100 TB path.
- **SimHash**: 64-bit sign-aggregated token-hash fingerprint; hamming
  distance <= k on banded prefixes finds near-dups for cheap.

MinHash/SimHash outputs depend on the engine hash (xxhash64), so their
correctness checks are property tests (recall vs brute force on a small SF)
rather than value-equality oracles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from firebase_etl_spark.operators.text import (
    fingerprint,
    token_set,
    tokenize,
    word_shingles,
    word_shingles_of_tokens,
)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_summary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus summary: total docs, distinct normalized fingerprints,
    docs that are exact (normalized) duplicates of another doc."""
    fps = df.select(fingerprint(text_col).alias("fp"))
    per_fp = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    return per_fp.agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.coalesce(F.sum(F.when(F.col("n") > 1, F.col("n"))), F.lit(0)).alias(
            "n_dup_docs"
        ),
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one doc per normalized fingerprint (min id survives — explicit
    deterministic tiebreak)."""
    with_fp = df.withColumn("__fp", fingerprint(text_col))
    best = with_fp.groupBy("__fp").agg(F.min(id_col).alias("__keep"))
    return (
        with_fp.join(best, "__fp")
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__fp", "__keep")
    )


def incremental_exact_dedup(
    spark,
    batch: DataFrame,
    ledger_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-batch exact dedup — the shape a CONTINUOUS ingest pipeline
    needs: the corpus arrives in batches, and a doc must be dropped if any
    EARLIER batch already contained its normalized fingerprint. State is a
    parquet fingerprint ledger: (1) anti-join the batch against the ledger
    (drops previously-seen content), (2) within-batch exact dedup (min id
    survives), (3) append the survivors' fingerprints so the next batch
    sees them. Returns the surviving rows.

    Scale: the ledger is fingerprints only (one 32-byte column, zstd'd),
    not text; the anti-join shuffles on the fingerprint hash exactly like
    single-corpus exact dedup. The append is partition-parallel; on object
    stores the ledger becomes a Delta/Iceberg table so concurrent batches
    commit atomically — the plan shape is identical."""
    import os

    with_fp = batch.withColumn("__fp", fingerprint(text_col))
    if os.path.exists(ledger_path):
        seen = spark.read.parquet(ledger_path)
        fresh = with_fp.join(seen, with_fp["__fp"] == seen["fp"], "left_anti")
    else:
        fresh = with_fp
    best = fresh.groupBy("__fp").agg(F.min(id_col).alias("__keep"))
    survivors = (
        fresh.join(best, "__fp")
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__keep")
    )
    # materialize before the ledger write so the anti-join against the OLD
    # ledger isn't re-planned on top of the appended files
    survivors = survivors.localCheckpoint(eager=True)
    survivors.select(F.col("__fp").alias("fp")).write.mode("append").parquet(
        ledger_path
    )
    return survivors.drop("__fp")


# ---------------------------------------------------------------------------
# exact Jaccard vs query set (oracle-checkable)
# ---------------------------------------------------------------------------

def jaccard_vs_queries(
    df: DataFrame,
    query_ids: list[int],
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-set Jaccard of every doc against each probe doc; pairs above
    threshold. The probe side is tiny -> broadcast cross join; corpus side
    streams once. Returns (query_id, doc_id, jaccard)."""
    toks = df.select(F.col(id_col), token_set(text_col).alias("toks"))
    probes = toks.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("toks").alias("q_toks")
    )
    pairs = toks.crossJoin(F.broadcast(probes)).filter(F.col(id_col) != F.col("query_id"))
    jac = F.size(F.array_intersect("toks", "q_toks")) / F.size(
        F.array_union("toks", "q_toks")
    )
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("query_id", F.col(id_col), "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _sig_udf(num_hashes: int):
    """Vectorized MinHash mixer: sig[i] = min over base hashes of the
    affine mix a_i*h + b_i (uint64 wrap). Textbook construction: ONE
    base hash per shingle (JVM xxhash64), then num_hashes mixes in a
    pandas_udf — as Column expressions it would be num_hashes
    interpreted array folds (higher-order functions don't codegen), and
    ANSI mode forbids the wrapping multiply anyway (numpy uint64 wraps,
    which is exactly what hash mixing wants)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    rng = np.random.RandomState(0x5EED)
    a = rng.randint(1, 2**63 - 1, size=num_hashes).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, 2**63 - 1, size=num_hashes).astype(np.uint64)

    @pandas_udf("array<long>")
    def sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            hv = np.asarray(h, dtype=np.uint64)
            if hv.size == 0:
                out.append(np.full(num_hashes, np.iinfo(np.int64).max))
                continue
            mixed = a[:, None] * hv[None, :] + b[:, None]  # (seeds, shingles)
            out.append((mixed.min(axis=1) >> np.uint64(1)).astype(np.int64))
        return pd.Series(out)

    return sig


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    shingle_n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of
    xxhash64(shingle, seed_i). Pure Column expressions — the per-seed hash is
    xxhash64 of the shingle concatenated with the seed."""
    sig = _sig_udf(num_hashes)

    # two-projection tokenizer split (see word_shingles_of_tokens): the
    # shingle tree references the token array shingle_n+1 times
    staged = df.select(F.col(id_col), tokenize(text_col).alias("__t")).select(
        F.col(id_col),
        F.transform(
            word_shingles_of_tokens(F.col("__t"), shingle_n),
            lambda s: F.xxhash64(s),
        ).alias("__h"),
    )
    return staged.select(F.col(id_col), sig(F.col("__h")).alias("signature"))


def minhash_candidates(
    signatures: DataFrame,
    bands: int = 8,
    id_col: str = "doc_id",
    broadcast_build: bool = False,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands, hash each band,
    explode to (band_id, band_hash) keys, self-join within buckets.
    Shuffle is on band-hash keys — bucket-local pairs only, never O(n²).
    ``broadcast_build=True`` (set by callers that know the corpus is
    small) broadcasts the build side so a hot bucket's pair expansion is
    produced by every probe task instead of one shuffle-key straggler."""
    sig_len_col = F.size("signature")
    rows_per_band = (sig_len_col / bands).cast("int")
    banded = signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("signature", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    left = banded.alias("l")
    right = F.broadcast(banded.alias("r")) if broadcast_build else banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidates from LSH, verified with exact shingle-set Jaccard.
    Returns (id_a, id_b, jaccard >= threshold).

    The signature/shingle projections are persisted before the self-joins:
    the banded self-join and the two verify joins would otherwise recompute
    the (wide) hashing expression tree once per branch. At cluster scale the
    same applies — materialize signatures (persist or a table) and join the
    cheap side back.

    The signatures DERIVE from the persisted shingle table (one
    tokenize + shingle pass total): sig() consumes the xxhash64
    transform of exactly the arrays the verify side compares, the same
    expression minhash_signatures builds from scratch."""
    sh = (
        df.select(F.col(id_col), tokenize(text_col).alias("__t"))
        .select(
            F.col(id_col),
            word_shingles_of_tokens(F.col("__t"), shingle_n).alias("sh"),
        )
        .persist()
    )
    sigs = sh.select(
        F.col(id_col),
        _sig_udf(num_hashes)(
            F.transform("sh", lambda s: F.xxhash64(s))
        ).alias("signature"),
    ).persist()
    try:
        # count() materializes the persist and sizes the banded self-join:
        # bands x n_docs build rows at ~16 B broadcast comfortably up to
        # ~3M rows; beyond that the shuffle join + AQE skew split take over
        small = sigs.count() * bands <= 3_000_000
        cands = minhash_candidates(sigs, bands, id_col, broadcast_build=small)
        a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
        b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
        jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
            F.array_union("sh_a", "sh_b")
        )
        out = (
            cands.join(a, "id_a")
            .join(b, "id_b")
            .withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        # materialize while the inputs are cached, then release them
        out = out.localCheckpoint(eager=True)
    finally:
        sigs.unpersist()
        sh.unpersist()
    return out


def brute_force_near_dups(
    df: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """O(n²) exact near-dup ground truth — recall baseline for LSH tests.
    Only run at tiny SF."""
    sh = df.select(F.col(id_col), word_shingles(text_col, shingle_n).alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash: per token-hash bit, sum +1/-1 across tokens; the sign
    of each bit-sum forms the fingerprint.

    Relational formulation: explode distinct tokens, then 64 conditional
    sums in ONE hash aggregate (partial/map-side combinable, whole-stage
    codegen), then pack sign bits. 3.8x faster than the array-fold
    (aggregate/zip_with) version — higher-order array functions run
    interpreted — and the partial agg is also the shape that scales: the
    shuffle carries one 64-int row per (doc x partition), not token rows."""
    # materialize the token hash ONCE in a projection before the aggregate:
    # the 64 sum expressions below each reference it, and Spark does not
    # CSE across separate aggregate expressions — inlining xxhash64 there
    # recomputes it 64x per token row (measured ~1.4x whole-operator cost)
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        ).alias("__tok"),
    ).select(F.col(id_col), F.xxhash64("__tok").alias("__h"))
    h = F.col("__h")
    # shift amounts must be Python ints in Spark's shift functions, so the 64
    # bit positions are unrolled at plan-build time
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__b{i}")
            for i in range(64)
        ]
    )
    fp = None
    for i in range(64):
        # bit 63 is the sign bit: 1<<63 overflows signed long, use min-long
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        term = F.when(
            F.col(f"__b{i}") > 0, F.lit(bit_val).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp.bitwiseOR(term)
    return sums.select(F.col(id_col), fp.alias("simhash"))


def hamming_distance(col_a, col_b):
    """Population count of the XOR — Spark has bit_count natively."""
    return F.bit_count(col_a.bitwiseXOR(col_b))


def simhash_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash from an md5 token hash — CONTENT-identical in any
    engine with md5 (the cross-engine-auditable twin of ``simhash``, whose
    xxhash64 is engine-specific). 60 bits: the fingerprint is built from
    the first 15 hex chars of md5 so it stays in non-negative signed-long
    range in engines without unsigned 64-bit (and needs no sign-bit
    special case). Same relational shape as ``simhash``: one projection
    computing the hash, one map-side-combinable aggregate of 60 bit-sums,
    sign-bit packing.

    Unlike ``simhash``'s cheap JVM xxhash64, the md5 → hex → conv(16,10)
    chain dominates when run per token INSTANCE (measured 2.8 → 1.7 s
    for the sums pipeline at sf0.1), so it runs once per DISTINCT token
    and joins back — the same vocabulary-dictionary move as the minhash
    recall audit; identical hash values, identical bit-sums. Broadcast
    under the usual gate, shuffle-hash beyond it (a vocabulary too big
    to broadcast must not be sorted either)."""
    n_bits = 60
    inst = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        ).alias("__tok"),
    )
    dic = (
        inst.select("__tok")
        .distinct()
        .select(
            "__tok",
            F.conv(F.substring(F.md5("__tok"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("__h"),
        )
        .localCheckpoint(eager=True)
    )
    dic_j = (
        F.broadcast(dic)
        if dic.count() * 2 <= 3_000_000
        else dic.hint("shuffle_hash")
    )
    toks = inst.join(dic_j, "__tok").select(F.col(id_col), "__h")
    h = F.col("__h")
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__b{i}")
            for i in range(n_bits)
        ]
    )
    fp = None
    for i in range(n_bits):
        term = F.when(F.col(f"__b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = term if fp is None else fp.bitwiseOR(term)
    return sums.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 8,
    n_blocks: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Near-dups via SimHash with GUARANTEED recall: split the n-bit
    fingerprint into ``n_blocks`` >= max_hamming+1 bit-bands and join pairs
    sharing ANY band — by pigeonhole, hamming <= max_hamming pairs differ
    in at most max_hamming bands, so at least one band matches (the
    classic multi-index Hamming search). Exact hamming verify inside
    buckets. Shuffle stays bucket-local (band, band_bits) keys — never
    O(n²). ``portable=True`` fingerprints with the md5-based 60-bit
    ``simhash_portable`` (cross-engine deterministic => oracle-checkable);
    default is the faster xxhash64 64-bit ``simhash``."""
    n_bits = 60 if portable else 64
    blocks = n_blocks or (max_hamming + 1)
    widths = [
        n_bits // blocks + (1 if i < n_bits % blocks else 0) for i in range(blocks)
    ]
    fingerprint = simhash_portable if portable else simhash
    sh = fingerprint(df, text_col, id_col).persist()
    try:
        # count() doubles as the eager materialization of the persist; the
        # row count drives the join strategy below
        n_docs = sh.count()
        band_cols, off = [], 0
        for w in widths:
            band = F.shiftrightunsigned("simhash", off)
            if w < 64:  # w == 64 (single block) needs no mask; 2^64-1
                band = band.bitwiseAND(F.lit((1 << w) - 1))  # overflows long
            band_cols.append(band)
            off += w
        banded = sh.select(
            F.col(id_col),
            "simhash",
            F.posexplode(F.array(*band_cols)).alias("band", "band_bits"),
        )
        a = banded.select(
            F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"),
            "band", "band_bits",
        )
        b = banded.select(
            F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"),
            "band", "band_bits",
        )
        # join strategy: correlated corpora put thousands of docs in one
        # band bucket, and a shuffle join keys on (band, band_bits) — the
        # whole O(bucket^2) expansion of a mega-bucket lands in ONE task.
        # Broadcasting the build side keeps the probe side on its natural
        # even partitioning, so a hot bucket's output is produced by every
        # task that probes it instead of a single straggler. The banded
        # build is blocks x n_docs rows of 4 longs (~40 B) — broadcast it
        # while it fits comfortably (~50 MB), same size-based decision an
        # engine makes for dimension joins; beyond that fall back to the
        # shuffle join and let AQE's skew-join splitting handle stragglers.
        if n_docs * blocks <= 1_250_000:
            b = F.broadcast(b)
        # hamming verify BEFORE the dedup: it is computable bucket-locally
        # from the fingerprints already on the joined row, and filtering
        # first means the distinct's shuffle carries only surviving
        # (id_a, id_b, hamming) triples — not every candidate pair with two
        # 64-bit hashes attached. hamming is a function of the pair, so
        # distinct over the triple still dedups multi-band matches.
        out = (
            a.join(b, ["band", "band_bits"])
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", hamming_distance(F.col("h_a"), F.col("h_b")))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
            .distinct()  # a close pair matches in up to `blocks` bands
        )
        # materialize while the fingerprints are cached, then release
        out = out.localCheckpoint(eager=True)
    finally:
        sh.unpersist()
    return out


def _banded_sigs(
    signatures: DataFrame, bands: int, id_col: str
) -> DataFrame:
    """(id, band, band_hash) rows for an existing signature table —
    the banding half of minhash_candidates, reusable against a ledger."""
    sig_len_col = F.size("signature")
    rows_per_band = (sig_len_col / bands).cast("int")
    return signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("signature", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )


def incremental_minhash_dedup(
    spark,
    batch: DataFrame,
    ledger_path: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-batch NEAR-dup dedup — the continuous-ingest twin of
    ``incremental_exact_dedup``: a document is dropped when any EARLIER
    batch (or an earlier-id doc in this batch) contains a near-duplicate.

    State design is what makes this scale: the ledger stores ONLY MinHash
    signatures (num_hashes longs per doc — size-independent of the text,
    mergeable across batches), never text or shingle sets. Candidates
    come from LSH banding (batch self-join + batch-vs-ledger join, both
    bucket-local); verification uses the MinHash Jaccard ESTIMATE (the
    fraction of equal signature components, an unbiased estimator of the
    true Jaccard), because the ledger has no shingles to verify exactly —
    exactly the trade production near-dup ledgers make. Survivors append
    their signatures; on object stores the ledger becomes a Delta/Iceberg
    table with the same plan shape.

    Returns the surviving batch rows."""
    import os

    sigs = minhash_signatures(
        batch, num_hashes, shingle_n, text_col, id_col
    ).persist()
    try:
        est = (
            F.aggregate(
                F.zip_with(
                    "sig_a", "sig_b", lambda x, y: (x == y).cast("int")
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.lit(num_hashes)
        )
        new_banded = _banded_sigs(sigs, bands, id_col)
        sig_a = sigs.select(
            F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a")
        )
        sig_b = sigs.select(
            F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b")
        )
        # within-batch: earlier id survives; any verified pair drops id_b
        a = new_banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
        b = new_banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
        within = (
            a.join(b, ["band", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .join(sig_a, "id_a")
            .join(sig_b, "id_b")
            .filter(F.round(est, 6) >= threshold)
            .select(F.col("id_b").alias(id_col))
        )
        dropped = within
        if os.path.exists(ledger_path):
            old = spark.read.parquet(ledger_path)
            old_banded = _banded_sigs(old, bands, id_col).select(
                F.col(id_col).alias("id_a"), "band", "band_hash"
            )
            old_sigs = old.select(
                F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a")
            )
            cross = (
                old_banded.join(b, ["band", "band_hash"])
                .select("id_a", "id_b")
                .distinct()
                .join(old_sigs, "id_a")
                .join(sig_b, "id_b")
                .filter(F.round(est, 6) >= threshold)
                .select(F.col("id_b").alias(id_col))
            )
            dropped = dropped.unionByName(cross)
        survivors = batch.join(dropped.distinct(), id_col, "left_anti")
        keep_sigs = sigs.join(dropped.distinct(), id_col, "left_anti")
        # materialize before the ledger write so the anti-joins against the
        # OLD ledger aren't re-planned over the appended files
        survivors = survivors.localCheckpoint(eager=True)
        keep_sigs.localCheckpoint(eager=True).write.mode("append").parquet(
            ledger_path
        )
    finally:
        sigs.unpersist()
    return survivors


def _cap_bucket_postings(
    postings: DataFrame,
    key: str,
    order_col: str,
    max_bucket_docs: int,
    truncation: dict | None,
    op_name: str,
) -> DataFrame:
    """The banded-subset mode the x10 probe says 100 TB needs (VERDICT
    r6 #6): keep at most ``max_bucket_docs`` postings per bucket
    ``key`` (deterministic — the ``order_col``-lowest survive), so
    per-bucket pair emission is bounded by cap² instead of m². This is
    an EXPLICIT recall trade for pathological buckets (a cluster of m
    mutual near-dups emits O(m²) true pairs; no algorithm that
    enumerates verified pairs beats its own output size) — and it is
    never silent: the exact truncation counts are computed eagerly and
    written into ``truncation`` (or logged at WARNING if no dict was
    passed). Docs dropped from one bucket still pair through any OTHER
    shared bucket, so the loss is per-bucket, not per-doc.

    ONE pass over the postings lineage: the rank-tagged table persists
    across the truncation-stats action and the capped projection (which
    is eagerly materialized from it before the persist is released) —
    the expensive upstream (tokenize + shingle explode + prefix build)
    never runs twice."""
    w = Window.partitionBy(key).orderBy(order_col)
    tagged = postings.withColumn("__rn", F.row_number().over(w)).persist()
    try:
        row = tagged.filter(F.col("__rn") > max_bucket_docs).agg(
            F.coalesce(
                F.count_distinct(F.col(key)), F.lit(0)
            ).alias("buckets_truncated"),
            F.count(F.lit(1)).alias("postings_dropped"),
        ).collect()[0]
        stats = {
            "buckets_truncated": int(row["buckets_truncated"]),
            "postings_dropped": int(row["postings_dropped"]),
        }
        if truncation is not None:
            truncation.update(stats)
        elif stats["postings_dropped"]:
            import logging

            logging.getLogger(__name__).warning(
                "%s: max_bucket_docs=%d dropped %d postings across %d "
                "buckets (bounded-recall mode; pass truncation={} to "
                "collect these counts)",
                op_name,
                max_bucket_docs,
                stats["postings_dropped"],
                stats["buckets_truncated"],
            )
        capped = (
            tagged.filter(F.col("__rn") <= max_bucket_docs)
            .drop("__rn")
            .localCheckpoint(eager=True)  # cap-bounded: <= cap rows/bucket
        )
    finally:
        tagged.unpersist()
    return capped


def _ppjoin_verify(
    pref: DataFrame,
    threshold: float,
    id_col: str,
    max_bucket_docs: int | None,
    truncation: dict | None,
) -> DataFrame:
    """Candidate generation + exact verify over a prepared prefix table
    — the tail of :func:`prefix_filter_near_dups`, shared with the
    MinHash recall audit (which builds ``pref`` fused with its signature
    aggregate). ``pref`` must be the persisted
    (id_col, n, __sids, prefix) table that function builds; returns the
    (id_a, id_b, jaccard >= threshold) pairs, NOT checkpointed — the
    caller owns materialization and ``pref``'s lifecycle."""
    pex = pref.select(
        F.col(id_col), "n", F.posexplode("prefix.s").alias("pos", "s")
    )
    if max_bucket_docs is not None:
        pex = _cap_bucket_postings(
            pex,
            "s",
            id_col,
            max_bucket_docs,
            truncation,
            "prefix_filter_near_dups",
        )
    a_side = pex.select(
        F.col("s"),
        F.col(id_col).alias("id_a"),
        F.col("n").alias("n_a"),
        F.col("pos").alias("p_a"),
    )
    b_side = pex.select(
        F.col("s"),
        F.col(id_col).alias("id_b"),
        F.col("n").alias("n_b"),
        F.col("pos").alias("p_b"),
    )
    # positional filter (PPJoin proper): a pair meeting the Jaccard
    # threshold needs overlap o = ceil(t/(1+t) * (n_a + n_b)); a
    # collision at 0-based prefix positions (p_a, p_b) caps the
    # achievable overlap at 1 + min(n_a - p_a, n_b - p_b) - 1 items
    # already consumed... i.e. ubound = 1 + least(n_a - p_a - 1,
    # n_b - p_b - 1). Pairs whose EVERY collision fails the bound
    # can't qualify — filtering before the distinct prunes the
    # candidate table the verify join pays for.
    o_req = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("n_a") + F.col("n_b"))
    )
    ubound = F.lit(1) + F.least(
        F.col("n_a") - F.col("p_a") - 1, F.col("n_b") - F.col("p_b") - 1
    )
    cands = (
        a_side.join(b_side, "s")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") >= F.lit(threshold) * F.col("n_a"))
            & (F.col("n_a") >= F.lit(threshold) * F.col("n_b"))
            & (ubound >= o_req)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    a = pref.select(
        F.col(id_col).alias("id_a"), F.col("__sids").alias("sh_a")
    )
    b = pref.select(
        F.col(id_col).alias("id_b"), F.col("__sids").alias("sh_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def prefix_filter_near_dups(
    df: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_docs: int | None = None,
    truncation: dict | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    PPJoin/AllPairs family — Xiao et al. 2008, Bayardo et al. 2007):
    sub-quadratic like MinHash-LSH but with ZERO false negatives — the
    deterministic exact path when the dedup policy can't tolerate
    probabilistic recall. Returns (id_a, id_b, jaccard >= threshold),
    identical to brute force by construction (pinned in pytest, and it
    shares minhash's brute-force DuckDB oracle).

    Why it's sound: order every document's shingles by a global
    rarest-first total order; if |A ∩ B| / |A ∪ B| >= t, the two sets
    must collide inside their first (n - ceil(t*n) + 1) shingles under
    ANY shared total order — so candidates = docs sharing a PREFIX
    shingle, a fraction of docs sharing any shingle. A length filter
    (t*|A| <= |B| <= |A|/t) prunes further before verification.

    Scale shape: one shingle explode, one shingle-keyed df aggregate
    (vocabulary-sized — broadcast back under the usual threshold), one
    per-doc sort-aggregate, then a prefix-keyed self-join whose buckets
    hold the docs sharing a RARE shingle (rarest-first ordering is what
    bounds the hot buckets), and an exact verify on the candidate pairs
    only. The same shape as the LSH banding path with prefixes instead
    of bands.

    ``max_bucket_docs`` switches on the banded-subset mode for corpora
    whose true near-dup clusters are large (mirror crawls): per-prefix-
    bucket postings are capped (deterministic, id-lowest survive) so
    pair emission is bounded by cap² per bucket — an EXPLICIT recall
    trade whose exact truncation counts land in ``truncation`` (see
    :func:`_cap_bucket_postings`; never silent).

    ``shingles`` lets a caller that ALREADY built the (id, sh) shingle
    table (e.g. the MinHash recall audit, which tokenizes the same corpus
    for its signatures) pass it in, skipping a second tokenize + shingle
    pass; the caller owns its persistence lifecycle. Must be exactly the
    table this function would build: (id_col, sh=word shingles of
    tokenize(text), size > 0 rows only)."""
    caller_owns_sh = shingles is not None
    if caller_owns_sh:
        sh = shingles
    else:
        sh = (
            df.select(F.col(id_col), tokenize(text_col).alias("__t"))
            .select(
                F.col(id_col),
                word_shingles_of_tokens(F.col("__t"), shingle_n).alias("sh"),
            )
            .filter(F.size("sh") > 0)
            .persist()
        )
    try:
        ex = sh.select(
            F.col(id_col), F.size("sh").alias("n"), F.explode("sh").alias("s")
        )
        # __sid: a per-run dictionary id for each distinct shingle,
        # riding the dfs aggregate the pipeline already pays. The
        # verify join compares id ARRAYS instead of string arrays —
        # array_intersect/array_union SIZES are invariant under any
        # bijective relabeling, so jaccard is bit-identical while the
        # hash-set work drops from ~15-char strings to longs (measured
        # 5.81s -> 0.59s for the verify stage at sf0.1). The
        # checkpoint pins the nondeterministic ids so every consumer
        # sees ONE labeling (and it replaces the former eager
        # dfc.count() job — the broadcast-decision count now reads the
        # checkpoint).
        dfc = (
            ex.groupBy("s")
            .agg(F.count(F.lit(1)).alias("dfs"))
            .withColumn("__sid", F.monotonically_increasing_id())
            .localCheckpoint(eager=True)
        )
        if dfc.count() * 3 <= 3_000_000:  # struct rows ~3x a bare band key
            dfc = F.broadcast(dfc)
        # rarest-first order within each doc; the global order is the
        # (dfs, s) sort key itself — no global rank window needed
        pref = (
            ex.join(dfc, "s")
            .groupBy(id_col)
            .agg(
                F.first("n").alias("n"),
                F.array_sort(F.collect_list(F.struct("dfs", "s"))).alias(
                    "sorted"
                ),
                F.collect_list("__sid").alias("__sids"),
            )
            .select(
                F.col(id_col),
                "n",
                "__sids",
                F.slice(
                    "sorted",
                    1,
                    (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
                    .cast("int"),
                ).alias("prefix"),
            )
            # 3 consumers (prefix explode + both verify sides) — keep
            # the collect_list aggregate from re-running per consumer
            .persist()
        )
        out = _ppjoin_verify(
            pref, threshold, id_col, max_bucket_docs, truncation
        )
        out = out.localCheckpoint(eager=True)
    finally:
        try:
            pref.unpersist()
        except NameError:
            pass
        if not caller_owns_sh:
            sh.unpersist()
    return out


def containment_near_dups(
    df: DataFrame,
    threshold: float = 0.8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_docs: int | None = None,
    truncation: dict | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """EXACT asymmetric-containment join: pairs where |A ∩ B| / |A| >=
    ``threshold`` — document A substantially contained in B. Jaccard
    misses this mode entirely (a page quoted inside a much longer page
    has high containment but low Jaccard because the union is dominated
    by B), yet subsumed quotes and mirrored fragments are exactly what a
    corpus dedup wants to drop — keep B, drop A. Returns (id_a, id_b,
    n_a, n_b, containment) with A the contained side; identical to the
    brute-force definition by construction (pytest-pinned; the DuckDB
    oracle replays brute force).

    Prefix filtering adapts to containment with ONE asymmetry: the
    required overlap is o = ceil(t * |A|), so A's rarest-first prefix of
    length |A| - o + 1 must collide with B's FULL posting list (not B's
    prefix — B may be arbitrarily large). Candidates therefore come from
    an A-prefix x B-postings join; a collision at A-prefix position p_a
    caps achievable overlap at |A| - p_a, so pairs with every collision
    below o are pruned positionally before the distinct + verify joins
    (the PPJoin positional filter, containment form). The B side being
    full postings makes shingle-df selectivity matter even more than for
    the Jaccard join — same 3-gram choice as prefix_filter_near_dups.
    ``max_bucket_docs`` caps the B-side postings per shingle (the hot
    side) — the explicit bounded-recall mode for mirror-heavy corpora,
    with exact truncation accounting (:func:`_cap_bucket_postings`).

    ``shingles`` is the caller-owned pre-built (id_col, sh) table, same
    contract as :func:`prefix_filter_near_dups`: exactly the table this
    function would build (word shingles of tokenize(text), size > 0 rows
    only); the caller owns its persistence lifecycle."""
    caller_owns_sh = shingles is not None
    if caller_owns_sh:
        sh = shingles
    else:
        sh = (
            df.select(F.col(id_col), tokenize(text_col).alias("__t"))
            .select(
                F.col(id_col),
                word_shingles_of_tokens(F.col("__t"), shingle_n).alias("sh"),
            )
            .filter(F.size("sh") > 0)
            .persist()
        )
    try:
        ex = sh.select(
            F.col(id_col), F.size("sh").alias("n"), F.explode("sh").alias("s")
        )
        # __sid dictionary ids ride the dfs aggregate; the verify join
        # compares long-id arrays instead of string arrays (sizes are
        # invariant under the bijective relabeling — see
        # prefix_filter_near_dups, measured ~10x on the verify stage).
        # The checkpoint pins the nondeterministic ids across consumers
        # and absorbs the former eager broadcast-decision count.
        dfc = (
            ex.groupBy("s")
            .agg(F.count(F.lit(1)).alias("dfs"))
            .withColumn("__sid", F.monotonically_increasing_id())
            .localCheckpoint(eager=True)
        )
        if dfc.count() * 3 <= 3_000_000:
            dfc = F.broadcast(dfc)
        pref = (
            ex.join(dfc, "s")
            .groupBy(id_col)
            .agg(
                F.first("n").alias("n"),
                F.array_sort(F.collect_list(F.struct("dfs", "s"))).alias(
                    "sorted"
                ),
                F.collect_list("__sid").alias("__sids"),
            )
            .select(
                F.col(id_col),
                "n",
                "__sids",
                F.slice(
                    "sorted",
                    1,
                    (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
                    .cast("int"),
                ).alias("prefix"),
            )
            # consumers: A-prefix explode + both verify sides
            .persist()
        )
        a_side = pref.select(
            F.col(id_col).alias("id_a"),
            F.col("n").alias("n_a"),
            F.posexplode("prefix.s").alias("p_a", "s"),
        )
        b_side = ex.select(
            F.col("s"), F.col(id_col).alias("id_b"), F.col("n").alias("n_b")
        )
        if max_bucket_docs is not None:
            # the hot side of the A-prefix x B-postings join is the FULL
            # B posting list (A prefixes are rare by construction)
            b_side = _cap_bucket_postings(
                b_side,
                "s",
                "id_b",
                max_bucket_docs,
                truncation,
                "containment_near_dups",
            )
        o_req = F.ceil(F.lit(threshold) * F.col("n_a"))
        cands = (
            a_side.join(b_side, "s")
            .filter(
                (F.col("id_a") != F.col("id_b"))
                & (F.col("n_b") >= F.lit(threshold) * F.col("n_a"))
                & (F.col("n_a") - F.col("p_a") >= o_req)
            )
            .select("id_a", "id_b")
            .distinct()
        )
        a = pref.select(
            F.col(id_col).alias("id_a"), F.col("__sids").alias("sh_a")
        )
        b = pref.select(
            F.col(id_col).alias("id_b"), F.col("__sids").alias("sh_b")
        )
        cont = F.size(F.array_intersect("sh_a", "sh_b")) / F.size("sh_a")
        out = (
            cands.join(a, "id_a")
            .join(b, "id_b")
            .withColumn("containment", F.round(cont, 6))
            .filter(F.col("containment") >= threshold)
            .select(
                "id_a",
                "id_b",
                F.size("sh_a").alias("n_a"),
                F.size("sh_b").alias("n_b"),
                "containment",
            )
            .orderBy("id_a", "id_b")
        )
        out = out.localCheckpoint(eager=True)
    finally:
        try:
            pref.unpersist()
        except NameError:
            pass
        if not caller_owns_sh:
            sh.unpersist()
    return out


def minhash_portable_recall_audit(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MEASURED recall of a lossy MinHash-LSH banding against exact
    ground truth, per true-similarity decile — the audit you run on a
    sample BEFORE trusting a probabilistic dedup policy on the full
    corpus (at 100 TB the brute truth is unpayable corpus-wide, but a
    content-addressed sample audit like this one is how the banding
    parameters get certified). Deliberately NOT the full-recall banding
    the production near-dup operators use: with ``num_hashes=16,
    bands=4`` the textbook S-curve P(candidate | j) = 1-(1-j^r)^b is
    ~0.23 at j=0.5 and ~0.99 at j=0.9, so the report shows recall
    CLIMBING with similarity — the curve a policy owner reads to pick
    bands/rows.

    Output: one row per true-jaccard decile >= threshold —
    (sim_decile, n_true_pairs, n_lsh_found, n_missed, recall_e4).

    Determinism/oracle-ability: signatures are md5-based (sig_i = min
    over shingles of the 52-bit integer prefix of md5('mh{i}|' ||
    shingle)) and band keys are md5 of the comma-joined band rows —
    CONTENT-identical in any engine with md5 (the simhash_portable
    convention), unlike the production xxhash64 path. Truth comes from
    the lossless prefix-filter join (zero false negatives by
    construction). recall_e4 is an integer division of non-negative
    ints — no float in the hashed row.

    Scale shape: one shingle explode + num_hashes min-aggregates for
    signatures; banding self-join is bucket-local (the
    minhash_candidates shape); truth is the sub-quadratic prefix
    filter. Nothing is all-pairs."""
    sh = (
        df.select(F.col(id_col), tokenize(text_col).alias("__t"))
        .select(
            F.col(id_col),
            word_shingles_of_tokens(F.col("__t"), shingle_n).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .persist()
    )
    try:
        ex = sh.select(
            F.col(id_col), F.size("sh").alias("n"), F.explode("sh").alias("s")
        )
        # ONE shingle dictionary serves BOTH sides of the audit: the
        # per-shingle df counts + __sid labels the exact truth path
        # needs (prefix_filter_near_dups' dfc) AND the 16 md5 minhash
        # columns the lossy side needs. Hashing the DISTINCT shingles
        # instead of the instances removes ~90% of the hash work
        # (common shingles repeat ~10x: 260k instances / 27k distinct
        # at sf0.1; the md5 -> hex substring -> conv(16,10) chain was
        # ~0.26s per chain over the instances). The checkpoint pins
        # the nondeterministic __sid labeling, exactly as in
        # prefix_filter_near_dups.
        dic = (
            ex.groupBy("s")
            .agg(F.count(F.lit(1)).alias("dfs"))
            .withColumn("__sid", F.monotonically_increasing_id())
            .select(
                "s",
                "dfs",
                "__sid",
                *[
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"mh{i}|"), F.col("s"))),
                            1,
                            13,
                        ),
                        16,
                        10,
                    ).cast("long").alias(f"h{i}")
                    for i in range(num_hashes)
                ],
            )
            .localCheckpoint(eager=True)
        )
        # ONE instance join + ONE per-doc aggregate builds BOTH the
        # prefix-filter tables (n, rarest-first sorted structs, __sid
        # arrays) and the minhash signature (16 mins) — before the
        # fusion the audit paid the dictionary aggregate, the instance
        # join and the per-doc aggregate TWICE (once per side).
        # SHUFFLE_HASH hint: measured in-session 1.70s vs 5.39s inline
        # vs 2.95s broadcast for the hash join alone (the planner's
        # unhinted pick built the INSTANCE side as the broadcast hash
        # relation); it is also the scale-safe strategy — the
        # vocabulary is never broadcast or sorted.
        pref_plus = (
            ex.join(dic.hint("shuffle_hash"), "s")
            .groupBy(id_col)
            .agg(
                F.first("n").alias("n"),
                F.array_sort(F.collect_list(F.struct("dfs", "s"))).alias(
                    "sorted"
                ),
                F.collect_list("__sid").alias("__sids"),
                *[
                    F.min(f"h{i}").alias(f"m{i}")
                    for i in range(num_hashes)
                ],
            )
            .select(
                F.col(id_col),
                "n",
                "__sids",
                F.slice(
                    "sorted",
                    1,
                    (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
                    .cast("int"),
                ).alias("prefix"),
                *[f"m{i}" for i in range(num_hashes)],
            )
            # consumers: banding explode, prefix explode, both verify
            # sides
            .persist()
        )
        sigs = pref_plus
        rows = num_hashes // bands
        band_keys = [
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{b * rows + r}").cast("string")
                        for r in range(rows)
                    ],
                )
            )
            for b in range(bands)
        ]
        banded = sigs.select(
            F.col(id_col), F.posexplode(F.array(*band_keys)).alias("band", "bh")
        )
        l, r = banded.alias("l"), banded.alias("r")
        cands = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bh") == F.col("r.bh"))
                & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            )
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
            )
            .distinct()
        )
        # The exact truth (below) has ZERO false negatives, so the set of
        # LSH pairs passing the jaccard >= threshold verify is exactly
        # truth ∩ candidates — no need to re-verify candidates against
        # the shingle arrays (the old found-side join re-did tokenize +
        # array_intersect/union per candidate pair; the left join against
        # the distinct candidate set below is the same rows by identity).
        found = cands.select("id_a", "id_b", F.lit(1).alias("__found"))
        # truth over the SAME fused pref table (prefix/__sids columns)
        # — the dictionary aggregate, instance join and per-doc
        # aggregate prefix_filter_near_dups would re-run are already
        # paid above; dfs counts and __sid relabeling are identical by
        # construction, so the pairs are bit-identical.
        truth = _ppjoin_verify(
            pref_plus, threshold, id_col, None, None
        ).select("id_a", "id_b", "jaccard")
        report = (
            truth.join(found, ["id_a", "id_b"], "left")
            .groupBy(
                F.expr(
                    "CASE WHEN jaccard >= 1.0 THEN 10"
                    " ELSE CAST(floor(jaccard * 10) AS INT) END"
                ).alias("sim_decile")
            )
            .agg(
                F.count(F.lit(1)).alias("n_true_pairs"),
                F.coalesce(F.sum("__found"), F.lit(0))
                .cast("long")
                .alias("n_lsh_found"),
            )
            .select(
                "sim_decile",
                "n_true_pairs",
                "n_lsh_found",
                (F.col("n_true_pairs") - F.col("n_lsh_found")).alias(
                    "n_missed"
                ),
                F.expr(
                    "(n_lsh_found * 10000) DIV n_true_pairs"
                ).alias("recall_e4"),
            )
            .orderBy("sim_decile")
        )
        report = report.localCheckpoint(eager=True)
    finally:
        try:
            pref_plus.unpersist()
        except NameError:
            pass
        sh.unpersist()
    return report
