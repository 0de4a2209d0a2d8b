"""Distributed BPE tokenizer training — learning a byte-pair-encoding
merge table from corpus word frequencies (the tokenizer-construction step
of an LLM data pipeline; extension beyond the reference).

Classic BPE (Sennrich et al. 2016): start from characters (plus a
word-end marker), repeatedly merge the most frequent adjacent symbol
pair. The training state is the WORD-FREQUENCY table, not the corpus:
one row per distinct word with its count, symbols kept as a
space-separated string. Each merge round is

    pair counts   one slice+zip explode + keyed aggregate (weighted by
                  word count, map-side combinable)
    argmax pair   min(struct(-n, a, b)) -> a single-row collect (the
                  same k-constants driver pull as a k-means centroid)
    apply merge   literal string replace of ' a b ' -> ' ab ' on every
                  word row

Scale shape: the vocabulary table is orders of magnitude smaller than
the corpus (tens of millions of rows at web scale vs billions of docs),
so a loop of small aggregates over a persisted, periodically
checkpointed table is the right plan — identical in shape to the k-means
trainer in similarity.py. Nothing per-document happens after the initial
word count.

Merge-application semantics: replace() consumes its match, so a chain of
overlapping occurrences (only possible when left==right, e.g. 'a a a a')
needs one extra pass per chained merge. ``REPLACE_PASSES`` bounded
passes are applied — exact leftmost-nonoverlapping BPE for words with up
to 2*REPLACE_PASSES chained symbols, i.e. for any corpus whose words fit
that bound (asserted against a pure-Python reference trainer in tests).
Both the Spark plan and the DuckDB oracle apply the same pass count, so
the cross-engine comparison is exact by construction regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firebase_etl_spark.operators.text import tokenize

#: replace passes per merge round (exact for words up to ~2x this many
#: chained same-symbol merges; corpus words here are far shorter)
REPLACE_PASSES = 6
#: distinct-word count at or below which training runs on the collected
#: word-frequency table instead of a per-round Spark job loop. The state
#: is (seq, cnt) rows at ~100 bytes each — 64k words is a few MB, the
#: same order as a broadcast-join build side, and the merge loop over it
#: is milliseconds vs ~2 Spark jobs per round. Web-scale vocabularies
#: (tens of millions of distinct words) exceed it and take the
#: distributed loop. Same adaptive-threshold shape as graph.py's
#: union-find cutover.
LOCAL_VOCAB_THRESHOLD = 1 << 16
#: word-end marker symbol (standard BPE so 'low'/'lower' share prefixes
#: but not suffix-crossing merges)
END = "</w>"


def _word_freq(df: DataFrame, text_col: str, keep_word: bool = False) -> DataFrame:
    """(seq, cnt): distinct words as sentinel-spaced symbol strings."""
    w = df.select(F.explode(tokenize(text_col)).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    seq = F.concat(
        F.lit(" "),
        F.array_join(F.split("w", ""), " "),
        F.lit(f" {END} "),
    )
    cols = (["w"] if keep_word else []) + [seq.alias("seq"), "cnt"]
    return w.select(*cols)


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, n): adjacent-symbol pair counts weighted by word count."""
    arr = F.split(F.trim("seq"), " ")
    shifted = words.select(
        F.slice(arr, 1, F.size(arr) - 1).alias("w1"),
        F.slice(arr, 2, F.size(arr) - 1).alias("w2"),
        "cnt",
    )
    return (
        shifted.select(F.explode(F.arrays_zip("w1", "w2")).alias("p"), "cnt")
        .groupBy(F.col("p.w1").alias("a"), F.col("p.w2").alias("b"))
        .agg(F.sum("cnt").alias("n"))
    )


def _apply_merge_local(s: str, a: str, b: str) -> str:
    """The bounded replace chain on one seq string. ``str.replace`` is
    leftmost-nonoverlapping consume-the-match, the exact semantics of
    Spark's ``F.replace`` and DuckDB's ``replace`` — so local, distributed
    and oracle merge application agree byte-for-byte on any input."""
    pat, rep = f" {a} {b} ", f" {a}{b} "
    for _ in range(REPLACE_PASSES):
        s = s.replace(pat, rep)
    return s


def _train_local(
    rows: list[list], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Merge loop over collected (seq, cnt) rows — mutates ``rows`` in
    place so a caller can reuse the final sequences (bpe_vocab's encode).
    Pair argmax mirrors the distributed min(struct(-n, a, b))."""
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for row in rows:
            syms = row[0].split()
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + row[1]
        if not pc:
            break
        (a, b), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, n))
        for row in rows:
            row[0] = _apply_merge_local(row[0], a, b)
    return merges


def bpe_train(
    df: DataFrame,
    spark: SparkSession,
    n_merges: int = 10,
    text_col: str = "text",
    local_vocab_threshold: int = LOCAL_VOCAB_THRESHOLD,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns a DataFrame
    (merge_rank, left_sym, right_sym, pair_count) in learning order.
    Ties break lexicographically on (left, right) — deterministic.

    Adaptive: the word-frequency state is tiny relative to the corpus;
    at or below ``local_vocab_threshold`` distinct words it is collected
    once and the merge loop runs on the driver (identical replace
    semantics, see _apply_merge_local) instead of paying ~2 Spark jobs
    per merge round. Above it, the per-round distributed loop runs."""
    words = _word_freq(df, text_col).persist()
    try:
        n_words = words.count()  # materialize before looping
        if n_words <= local_vocab_threshold:
            rows = [[r["seq"], r["cnt"]] for r in words.collect()]
            return spark.createDataFrame(
                _train_local(rows, n_merges),
                "merge_rank int, left_sym string, right_sym string, "
                "pair_count long",
            )
        return _train_distributed(words, spark, n_merges)
    finally:
        words.unpersist()


def _train_distributed(
    words: DataFrame, spark: SparkSession, n_merges: int
) -> DataFrame:
    """Per-round distributed merge loop over an ALREADY-MATERIALIZED
    (seq, cnt) word-frequency table (extra columns tolerated, dropped).
    The caller owns ``words``' persistence; intermediates checkpointed
    here are released before returning."""
    cur = words.select("seq", "cnt")
    base = None  # the checkpointed intermediate this loop owns
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(n_merges):
            top = (
                _pair_counts(cur)
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("n")).alias("neg"),
                            F.col("a"),
                            F.col("b"),
                        )
                    ).alias("t")
                )
                .collect()[0]["t"]
            )
            if top is None:
                break
            a, b, n = top["a"], top["b"], -top["neg"]
            merges.append((rank, a, b, n))
            seq = F.col("seq")
            for _ in range(REPLACE_PASSES):
                seq = F.replace(
                    seq, F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
                )
            nxt = cur.select(seq.alias("seq"), "cnt")
            # cut the replace-expression lineage every few rounds: an
            # eager checkpoint is a whole extra job, and a stack of
            # 3 x REPLACE_PASSES nested replaces plans fine — per-round
            # checkpointing spent ~half the training wall on it
            if rank % 3 == 2:
                nxt = nxt.localCheckpoint(eager=True)
                if base is not None:
                    base.unpersist()
                base = nxt
            cur = nxt
    finally:
        if base is not None:
            base.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank int, left_sym string, right_sym string, pair_count long"
    )


def bpe_vocab(
    df: DataFrame,
    spark: SparkSession,
    n_merges: int = 10,
    text_col: str = "text",
    checkpoint_every: int = 4,
    local_vocab_threshold: int = LOCAL_VOCAB_THRESHOLD,
) -> DataFrame:
    """Train ``n_merges`` merges, then ENCODE the vocabulary with them:
    returns (w, cnt, n_tok) — each distinct corpus word with its
    occurrence count and its token count under the learned tokenizer
    (symbols remaining after all merges, ``</w>`` included).

    Tokenizer APPLICATION is the per-batch step of a pipeline (training
    happens once): only the word-frequency table is rewritten — documents
    then pick up token counts through a broadcast vocabulary join, so the
    per-document cost after training is one explode + one map-side join,
    never a per-document merge loop. Merge application itself is the same
    bounded-pass ``replace`` chain as training, batched
    ``checkpoint_every`` merges per projection to keep the expression
    tree (passes x merges nested replaces) shallow."""
    words_df = _word_freq(df, text_col, keep_word=True).persist()
    n_words = words_df.count()
    if n_words <= local_vocab_threshold:
        # one collect covers train AND encode: _train_local leaves the
        # rows holding their fully-merged sequences
        rows = [[r["seq"], r["cnt"], r["w"]] for r in words_df.collect()]
        words_df.unpersist()
        _train_local(rows, n_merges)
        return spark.createDataFrame(
            [(w, cnt, len(seq.split())) for seq, cnt, w in rows],
            "w string, cnt long, n_tok int",
        )
    # distributed path: train AND encode off the ONE materialized
    # word-frequency table (it used to be recomputed twice more — once by
    # bpe_train's own _word_freq, once by the encode scan). words_df stays
    # persisted because the returned encode plan reads it; the few-MB-per-
    # 64k-words cache is released by the session's next clearCache.
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in _train_distributed(words_df, spark, n_merges)
        .orderBy("merge_rank")
        .collect()
    ]
    words = words_df
    seq = F.col("seq")
    pending = 0
    for a, b in merges:
        for _ in range(REPLACE_PASSES):
            seq = F.replace(seq, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
        pending += 1
        if pending == checkpoint_every:
            words = words.select("w", seq.alias("seq"), "cnt")
            seq = F.col("seq")
            pending = 0
    words = words.select("w", seq.alias("seq"), "cnt")
    return words.select(
        "w",
        "cnt",
        F.size(F.split(F.trim("seq"), " ")).alias("n_tok"),
    )
