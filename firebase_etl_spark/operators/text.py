"""Text-analysis operators over a document corpus (extension beyond the
reference — SURVEY.md §7.2 step 9; first-class at training-data scale).

All hot-path transforms are native Column expressions (whole-stage codegen,
no Python). Each produces deterministic output so a DuckDB oracle can check
it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Tiny per-language marker-word sets for the n-gram/stopword language-ID
#: heuristic. Deterministic and SQL-expressible (argmax with fixed
#: priority-order tiebreak).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "y", "los", "de"),
    "zh": (),  # no latin markers; falls through to default
}

#: English stopwords for the quality score's stopword ratio.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization (lowercased). ``split`` on \\s+ matches
    DuckDB's regexp_split_to_array for parity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def distinct_token_ratio(col: Column | str) -> Column:
    """Lexical diversity: distinct tokens / tokens (repetition signal)."""
    toks = tokenize(col)
    return F.size(F.array_distinct(toks)) / F.size(toks)


def avg_token_length(col: Column | str) -> Column:
    toks = tokenize(col)
    return F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / F.size(toks)


def stopword_ratio(col: Column | str) -> Column:
    toks = tokenize(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits / F.size(toks)


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: favors diverse, mid-length
    tokens with a sane stopword rate. Deterministic; weights are fixed."""
    c = F.col(col) if isinstance(col, str) else col
    lex = distinct_token_ratio(c)
    stop = stopword_ratio(c)
    length_ok = F.when(
        (token_count(c) >= 20) & (token_count(c) <= 1000), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    stop_ok = F.lit(1.0) - F.abs(stop - F.lit(0.3))
    # + 1e-9 before rounding, mirrored in every oracle: the weighted sum of
    # small-denominator ratios lands EXACTLY on 6dp rounding halves (e.g.
    # k/640 for 64-token docs => ...X5), and the binary double for such a
    # value falls on a different side of the half depending on evaluation
    # order — so two engines computing the same formula round differently.
    # The nudge (far above ulp noise, far below the half step) puts both
    # engines deterministically above the half.
    return F.round(
        F.lit(0.4) * lex + F.lit(0.3) * length_ok + F.lit(0.3) * stop_ok
        + F.lit(1e-9),
        6,
    )


def language_id(col: Column | str, default: str = "en") -> Column:
    """Marker-word language ID: per-language hit counts over the token set,
    argmax with fixed priority tiebreak (en > fr > de > es)."""
    toks = F.array_distinct(tokenize(col))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
        if markers
    }
    best = F.greatest(*scores.values())
    expr = None
    for lang in ("en", "fr", "de", "es"):  # fixed tiebreak priority
        cond = (scores[lang] == best) & (best > 0)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise(default)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (lowercase, collapsed
    whitespace). The exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized.cast("binary"))


def token_set(col: Column | str) -> Column:
    """Sorted distinct token array — the n-gram/Jaccard comparison unit."""
    return F.array_sort(F.array_distinct(tokenize(col)))


def word_shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-TOKENIZED array
    column. Built as a zip_with chain of shifted copies: each zip_with
    evaluates its two input arrays ONCE and maps lambda-bound elements, so
    the whole thing is O(n x tokens). The transform-over-sequence
    formulation with slice(toks, i, n) in the lambda re-evaluates the
    tokenizer per position (outer-array references in HOF lambdas are
    re-evaluated per element — no hoisting, no CSE). zip_with pads the
    shorter (shifted) array with nulls and concat null-propagates, so
    partial trailing shingles drop out in the final filter.

    The toks expression is referenced n+1 times in this tree, so pass a
    plain attribute (materialize the tokenizer in its own projection
    below): CollapseProject keeps the split because the reference is
    multi-use and non-cheap, and the tokenizer then runs once per row
    instead of n+1 times (~40% off the explode pass at sf0.1)."""
    acc = toks
    for i in range(1, n):
        shifted = F.slice(toks, i + 1, F.greatest(F.size(toks) - i, F.lit(1)))
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.array_distinct(F.filter(acc, lambda x: x.isNotNull()))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """word_shingles_of_tokens over the whitespace tokenizer, as one
    expression. Prefer the two-projection form (tokenize().alias(...) then
    word_shingles_of_tokens) in hot scans — see that docstring."""
    return word_shingles_of_tokens(tokenize(col), n)


def text_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document feature table: token stats, quality, language, fingerprint."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.round(distinct_token_ratio(text_col), 6).alias("distinct_ratio"),
        F.round(avg_token_length(text_col), 6).alias("avg_token_len"),
        F.round(stopword_ratio(text_col), 6).alias("stop_ratio"),
        quality_score(text_col).alias("quality"),
        language_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fp"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Winnowing fingerprints (the rolling-hash fingerprint family): hash
    every POSITIONAL word k-gram, slide a window over the hash sequence,
    keep each window's minimum — the classic document-fingerprint scheme
    whose selected prints are stable under local edits (an edit only
    perturbs nearby windows). Returns (id, prints: array<bigint>); two docs
    sharing many prints share long stretches of text — the shared-print
    self-join over an exploded (print, doc) table is the corpus-scale
    near-dup path, same shape as MinHash banding.

    Relational formulation on purpose — and window-free: a nested array
    expression (transform over sequence with slice(toks, i, k) in the
    lambda) re-runs the tokenizer per gram and the gram transform per
    window — Spark higher-order lambdas neither hoist loop invariants nor
    get CSE, so that shape is O(tokens^2) interpreted work per document
    (measured 60x slower). lead()/rows-frame windows work but cost a
    token-row exchange plus two sorts. Here the shifted values every gram
    and every window need come from arrays_zip of end-clamped array
    slices (null padding marks where full grams/windows end, and both
    concat_ws and least() skip nulls — which also yields the short-doc
    partial-gram / single-window edge rules for free): explode the token
    zip to codegen gram-hash rows, re-assemble the per-doc hash sequence
    with a doc-local sorted collect, zip-slice THAT for the sliding min.
    One repartition of the doc rows up front means every aggregate runs
    partial+final with no shuffle and no sort."""
    n_parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    toks = df.select(
        F.col(id_col), tokenize(text_col).alias("__toks")
    ).repartition(int(n_parts), F.col(id_col))
    # row i of the zip carries (t_i, ..., t_{i+k-1}), nulls past the end
    shifts = [
        F.slice(
            "__toks", i + 1, F.greatest(F.size("__toks") - i, F.lit(0))
        ).alias(f"__s{i}")
        for i in range(k)
    ]
    z = toks.select(
        F.col(id_col),
        F.size("__toks").alias("__nt"),
        F.posexplode(F.arrays_zip(*shifts)).alias("pos", "z"),
    )
    # concat_ws skips nulls: a doc shorter than k yields its single
    # partial gram at pos 0, exactly the prior edge rule
    gram_str = F.concat_ws(" ", *[F.col(f"z.__s{i}") for i in range(k)])
    # gram hash: xxhash64 (fast scale path) or the md5 60-bit prefix
    # (``portable`` — content-identical in any engine with md5, which is
    # what makes a cross-engine oracle for the fingerprints possible)
    if portable:
        gh = F.conv(F.substring(F.md5(gram_str), 1, 15), 16, 10).cast("bigint")
    else:
        gh = F.xxhash64(gram_str)
    grams = z.filter(
        F.col(f"z.__s{k - 1}").isNotNull()  # full k-grams only ...
        | ((F.col("__nt") < k) & (F.col("pos") == 0))  # ... or the stub
    ).select(F.col(id_col), "pos", gh.alias("gh"))
    # per-doc hash sequence, in gram order, with no window: doc-local
    # sorted collect (partial+final aggregate, no exchange — the input is
    # already hash-partitioned by doc), then zip-slice for the sliding
    # min; least() skips the null padding, and the validity filter keeps
    # full windows plus the single short-doc window
    seq = grams.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("pos", "gh")))
        .getField("gh")
        .alias("hs")
    )
    wshifts = [
        F.slice(
            "hs", i + 1, F.greatest(F.size("hs") - i, F.lit(0))
        ).alias(f"__w{i}")
        for i in range(window)
    ]
    wz = seq.select(
        F.col(id_col),
        F.size("hs").alias("__ng"),
        F.posexplode(F.arrays_zip(*wshifts)).alias("pos", "w"),
    )
    wmin = F.least(*[F.col(f"w.__w{i}") for i in range(window)])
    prints = wz.filter(
        F.col(f"w.__w{window - 1}").isNotNull()
        | ((F.col("__ng") < window) & (F.col("pos") == 0))
    ).select(F.col(id_col), wmin.alias("__wmin"))
    return prints.groupBy(id_col).agg(
        F.array_sort(F.collect_set("__wmin")).alias("prints")
    )


def winnow_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 4,
    min_shared: int = 3,
    max_df: int = 1000,
    portable: bool = False,
) -> DataFrame:
    """Shared-fingerprint near-dup pairs (the MOSS scheme): pairs of docs
    sharing at least ``min_shared`` winnowing prints, with the shared-print
    count as the match strength.

    Scale design: prints with document frequency above ``max_df`` are
    dropped BEFORE the self-join — a print shared by m docs creates
    ~m²/2 candidate rows, so the df cut is what bounds bucket size and
    join skew at corpus scale (the same role stop-print/boilerplate
    removal plays in MOSS deployments; dropped prints are boilerplate by
    definition). Both shuffles are keyed on the print value then the doc
    pair — bucket-local, never all-pairs. ``portable=True`` uses the md5
    gram hash so a DuckDB oracle can replay the pair set exactly.
    """
    prints = winnow_fingerprints(df, text_col, id_col, k, window, portable)
    # persist the exploded prints: dfreq, the df-cut join, and both sides
    # of the self-join all branch from it, and each branch would otherwise
    # recompute the whole fingerprint pipeline (explode + window minima)
    e = prints.select(F.col(id_col), F.explode("prints").alias("p")).persist()
    try:
        # count() materializes the persist and sizes the join strategy:
        # (id, print) rows are 16 B, so up to ~3M rows (~50 MB) the df-cut
        # map and the self-join build side broadcast — same skew argument
        # as the simhash banded join (a hot print's pair expansion spreads
        # across probe tasks instead of one shuffle-key straggler).
        small = e.count() <= 3_000_000
        dfreq = e.groupBy("p").agg(F.count(F.lit(1)).alias("__df"))
        keep_freq = dfreq.filter(F.col("__df") <= max_df)
        kept = e.join(
            F.broadcast(keep_freq) if small else keep_freq, "p"
        ).select(F.col(id_col), "p")
        a = kept.select(F.col(id_col).alias("id_a"), "p")
        b = kept.select(F.col(id_col).alias("id_b"), "p")
        out = (
            a.join(F.broadcast(b) if small else b, "p")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared_prints"))
            .filter(F.col("n_shared_prints") >= min_shared)
        )
        out = out.localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return out


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 20,
) -> DataFrame:
    """Corpus-level segment dedup — the CCNet/RefinedWeb paragraph-dedup
    shape: split every document into segments, hash each normalized
    segment, keep only the globally-FIRST occurrence (min (doc_id, pos))
    of each distinct segment, and reassemble what survives. Returns a
    per-document report: (id, n_chunks, n_kept, n_chars_kept, kept_md5)
    where kept_md5 fingerprints the reassembled surviving text, so an
    oracle checks the exact kept CONTENT, not just counts.

    The segmenter here is fixed-width word windows (the synthetic corpus
    is single-line); on real corpora the split is newline paragraphs —
    one expression swap, the pipeline shape is identical.

    Scale design: explode tokens once and build segments with a
    (doc, chunk) group-by — never a per-segment re-tokenize (HOF lambdas
    re-evaluate outer-array references per element, an O(tokens^2) trap).
    First-occurrence election is a partial-aggregable min(struct) keyed
    on the segment text — the same content-keyed single shuffle as exact
    dedup — followed by a co-partitioned join back. No window over the
    whole corpus, no skew beyond segment frequency (boilerplate segments
    concentrate, but min() combines map-side)."""
    toks = df.select(
        F.col(id_col), F.posexplode(tokenize(text_col)).alias("pos", "tok")
    )
    segs = (
        toks.withColumn("chunk", (F.col("pos") / chunk_words).cast("int"))
        .groupBy(id_col, "chunk")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("seg")
        )
    )
    first = segs.groupBy("seg").agg(
        F.min(
            F.struct(F.col(id_col).alias("d"), F.col("chunk").alias("c"))
        ).alias("first")
    )
    kept = segs.join(first, "seg").where(
        (F.col(id_col) == F.col("first.d")) & (F.col("chunk") == F.col("first.c"))
    )
    kept_doc = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("kept_text"),
    )
    totals = segs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_chunks"))
    return totals.join(kept_doc, id_col, "left").select(
        F.col(id_col),
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.length(F.coalesce("kept_text", F.lit(""))).alias("n_chars_kept"),
        F.md5(F.coalesce("kept_text", F.lit(""))).alias("kept_md5"),
    )


#: GPT-2-style pre-tokenizer regex (Radford et al. 2019; the public
#: tiktoken/gpt2 pattern), simplified to a lookahead-free form so Spark's
#: Java regex and DuckDB's RE2 match identically: contraction suffixes,
#: space-prefixed letter runs, digit runs, punctuation runs, whitespace.
BPEISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpeish_tokens(col: Column | str) -> Column:
    """Pre-tokenizer segmentation for LLM token accounting: the pieces a
    BPE vocabulary would merge within. Whitespace-only matches drop (they
    glue to the following token in real BPE)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(BPEISH_PATTERN), F.lit(0))
    return F.filter(pieces, lambda t: F.trim(t) != F.lit(""))


def bpeish_token_count(col: Column | str) -> Column:
    """Approximate LLM token count — the budgeting statistic for training
    pipelines (tokens-per-doc distributions, corpus token totals)."""
    return F.size(bpeish_tokens(col))


def duplicate_window_report(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exhaustive duplicate-substring screen (after Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): hash EVERY positional k-token window — winnowing
    samples fingerprints, this counts all of them — and report, per
    document, how much of it is duplicated text:

        n_windows             total k-token windows
        n_dup_windows         windows whose content occurs >1 time
                              corpus-wide (the paper's ExactSubstr unit)
        n_cross_doc_windows   windows whose content appears in >=2 docs
                              (cross-document duplication specifically)
        dup_fraction          n_dup_windows / n_windows, 6dp

    The paper suffix-arrays 50-token windows; the parameterized k here
    defaults low for short synthetic docs. Window keys are full md5 hex
    of the window text — portable across engines for the oracle; a
    production corpus would swap in a 128-bit binary hash, same plan.

    Scale shape — a LINEAR chain, one corpus tokenize pass: the shifted-
    slice arrays_zip explode (the winnow_fingerprints trick — zip_with/
    slice instead of per-position lambdas, so the tokenizer runs once per
    row) feeds one (doc, gram) aggregate; corpus-wide occurrence totals
    come from a gram-keyed WINDOW over that aggregate (no join-back, no
    second pass); the per-doc rollup is one more keyed aggregate. Docs
    shorter than k keep a zero-window row via the final left join, which
    broadcasts nothing and joins doc-to-doc on the id."""
    toks = df.select(F.col(id_col), tokenize(text_col).alias("__toks"))
    shifts = [
        F.slice(
            "__toks", i + 1, F.greatest(F.size("__toks") - i, F.lit(0))
        ).alias(f"__s{i}")
        for i in range(k)
    ]
    z = toks.select(
        F.col(id_col), F.posexplode(F.arrays_zip(*shifts)).alias("pos", "z")
    )
    gram = F.md5(
        F.concat_ws(" ", *[F.col(f"z.__s{i}") for i in range(k)]).cast(
            "binary"
        )
    )
    # full windows only: the k-th shifted slice is null past the end
    per = (
        z.filter(F.col(f"z.__s{k - 1}").isNotNull())
        .select(F.col(id_col), gram.alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wg = Window.partitionBy("gram")
    per = per.select(
        F.col(id_col),
        "c",
        F.sum("c").over(wg).alias("tot"),
        F.count(F.lit(1)).over(wg).alias("nd"),
    )
    agg = per.groupBy(id_col).agg(
        F.sum("c").alias("n_windows"),
        F.sum(F.when(F.col("tot") > 1, F.col("c")).otherwise(0)).alias(
            "n_dup_windows"
        ),
        F.sum(F.when(F.col("nd") > 1, F.col("c")).otherwise(0)).alias(
            "n_cross_doc_windows"
        ),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("n_cross_doc_windows", F.lit(0)).alias(
                "n_cross_doc_windows"
            ),
            F.when(F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(F.col("n_dup_windows") / F.col("n_windows"), 6)
            )
            .alias("dup_fraction"),
        )
    )


def passage_chunks(
    df,
    chunk_tokens: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Sliding-window passage chunking — the retrieval-ingestion step
    (split every document into overlapping ``chunk_tokens``-token
    passages advancing by ``stride``): (id, chunk_idx, start_tok,
    n_toks, chunk_text). stride < chunk_tokens overlaps consecutive
    chunks (RAG convention); the final chunk is short rather than
    padded. Whitespace tokenization matches the corpus-wide _TOKS
    convention.

    Scale shape: one projection + one explode — no shuffle, no UDF; the
    chunk count per row is data-derived (1 + ceil(max(0, n-chunk)/
    stride)), so a document never emits an unbounded sequence. Column
    expressions only (split once per row; Catalyst collapses the
    n/toks references into one projection)."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.col("__n") - chunk_tokens, F.lit(0)) / float(stride)
    )
    chunked = base.select(
        id_col,
        "__toks",
        "__n",
        F.explode(
            F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    # clamp at 0: with stride > chunk_tokens (gapped chunking) the last
    # chunk's remaining-token count can go negative, and F.slice raises
    # on a negative length (ADVICE r5 #3)
    ntk = F.greatest(
        F.least(F.lit(chunk_tokens), F.col("__n") - start), F.lit(0)
    )
    return chunked.select(
        id_col,
        "chunk_idx",
        start.cast("long").alias("start_tok"),
        ntk.cast("long").alias("n_toks"),
        F.concat_ws(
            " ", F.slice(F.col("__toks"), start + 1, ntk)
        ).alias("chunk_text"),
    )


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 20,
    max_len: int = 4,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) — corpus-level
    candidate keyphrases scored degree/frequency, the unsupervised
    complement to doc_tfidf_top_terms (tf-idf ranks single TERMS by
    document discrimination; RAKE ranks stopword-delimited PHRASES by
    internal cohesion, no idf table needed).

    Pipeline (all DataFrame ops): positional postings -> stopword
    cuts (the shared STOPWORDS tuple) -> per-doc segment ids by a
    running stopword count (one window per doc — documents are short;
    the window never crosses docs) -> candidate phrases truncated to
    ``max_len`` tokens -> word degree (sum of host-phrase lengths)
    and frequency over candidate words -> word score e6 =
    degree*1e6 DIV freq -> phrase score = integer sum of its words'
    quantized scores. Identical phrases aggregate; ties rank
    (score desc, n desc, phrase). Vocabulary-sized joins; nothing
    quadratic. Returns (phrase, n_words, n_occurrences, score_e6)."""
    toks = (
        df.filter(
            F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
        )
        .select(
            F.col(id_col).alias("did"),
            F.posexplode(tokenize(text_col)).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
    )
    w = (
        Window.partitionBy("did")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = toks.withColumn(
        "is_stop", F.col("term").isin(*STOPWORDS).cast("int")
    ).withColumn("seg", F.sum("is_stop").over(w))
    cand = (
        seg.filter(F.col("is_stop") == 0)
        .groupBy("did", "seg")
        .agg(
            F.concat_ws(
                " ",
                F.slice(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("pos", "term"))
                        ),
                        lambda x: x["term"],
                    ),
                    1,
                    max_len,
                ),
            ).alias("phrase")
        )
        .filter(F.col("phrase") != "")
    )
    words = cand.select(
        "phrase",
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
        F.explode(F.split(F.col("phrase"), " ")).alias("wd"),
    )
    wscore = (
        words.groupBy("wd")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("degree"),
        )
        .withColumn(
            "ws_e6", F.expr("(degree * 1000000) DIV freq")
        )
    )
    # word scores came from ALL occurrences (standard RAKE); the
    # phrase score sums ONE instance's words, so explode each DISTINCT
    # phrase exactly once and keep the occurrence count beside it
    dph = cand.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    pw = dph.select(
        "phrase", "n_occurrences",
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
        F.explode(F.split(F.col("phrase"), " ")).alias("wd"),
    )
    return (
        pw.join(wscore, "wd")
        .groupBy("phrase", "plen", "n_occurrences")
        .agg(F.sum("ws_e6").cast("long").alias("score_e6"))
        .select(
            "phrase",
            F.col("plen").cast("long").alias("n_words"),
            "n_occurrences", "score_e6",
        )
        .orderBy(
            F.desc("score_e6"), F.desc("n_occurrences"), "phrase"
        )
        .limit(top)
    )
