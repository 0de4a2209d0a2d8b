"""Gopher/C4-style document quality filters (repetition + composition
rules) — the heuristic-filter stage of a training-data pipeline, extension
beyond the reference (SURVEY.md §7.2 step 9 family, next to text.py).

Thresholds follow the published Gopher rules (Rae et al. 2021, "Scaling
Language Models", Table A1): word-count and mean-word-length bounds,
symbol-to-word ratio, alphabetic-word fraction, stopword presence, and the
n-gram repetition fractions (top-n-gram character fraction for n=2..4,
duplicate-n-gram character fraction for n=5). Everything is deterministic
native Column expressions over one token explode — no Python in the hot
path — so a DuckDB oracle replays it exactly.

Scale shape: one explode of tokens, one (doc, n, gram) count aggregate
(map-side combinable), one (doc, n) window, one final per-doc aggregate —
all partitioned by doc id, so parallelism is corpus-wide and skew is
bounded by the longest document, not by any global key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from firebase_etl_spark.operators import text as TX

#: top-n-gram character-fraction ceilings (Gopher Table A1)
TOP_NGRAM_MAX_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
#: duplicate-n-gram character-fraction ceiling
DUP_NGRAM_MAX_FRAC = {5: 0.15}
WORD_COUNT_RANGE = (50, 100_000)
MEAN_WORD_LEN_RANGE = (3.0, 10.0)
MAX_SYMBOL_WORD_RATIO = 0.1
MIN_ALPHA_WORD_FRAC = 0.8
MIN_DISTINCT_STOPWORDS = 2


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document n-gram repetition fractions.

    Definitions (identical in the DuckDB oracle):

    - ``top{n}gram_char_frac``: chars covered by every occurrence of the
      single most frequent word n-gram (count ties resolved by taking the
      LARGEST char coverage among the tied grams — a tie-break computable
      from (count, length) alone, so it never needs the gram string), over
      the chars of the space-normalized text.
    - ``dup{n}gram_char_frac``: chars covered by all occurrences of grams
      appearing more than once, same denominator.

    Docs too short to have an n-gram get 0.0 for that n. Fractions are
    rounded to 6dp so cross-engine double aggregation stays hash-equal.

    Shape: window-free and shuffle-light. The shifted tokens every n-gram
    needs come from ONE arrays_zip of end-clamped array slices (zip pads
    the shorter tails with null, which marks where full n-grams end), so
    gram rows are built by two Generates with no token-level sort, no
    lead() window, and no 100k-token-row exchange — the only exchange is
    a repartition of the DOC rows before the explode, which lets both
    downstream aggregates run partial+final with no shuffle at all. The
    count aggregate keys on (doc, n, HASH(gram)): the tie-break above
    needs only (count, length), so the gram string never enters an
    aggregation key or buffer — keys are fixed-width longs and the
    near-unique-key hash aggregate (~1M distinct grams at sf0.1, the
    operator's dominant cost) runs on the fast UnsafeRow path. A 64-bit
    in-doc gram-hash collision (~1e-15 per doc at ~200 grams/doc) would
    perturb one count; the DuckDB oracle groups by the actual gram string
    and agrees exactly in its absence. Top-gram selection is a
    max(struct(cnt, chars)) conditional aggregate per n — map-side
    combinable, sort-free, one row per doc.
    """
    top_ns = sorted(TOP_NGRAM_MAX_FRAC)
    dup_ns = sorted(DUP_NGRAM_MAX_FRAC)
    all_ns = sorted({*top_ns, *dup_ns})
    max_n = max(all_ns)

    n_parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    toks = (
        df.select(F.col(id_col), TX.tokenize(text_col).alias("__toks"))
        .repartition(int(n_parts), F.col(id_col))
        .select(
            F.col(id_col),
            F.length(F.array_join("__toks", " ")).alias("__nchars"),
            "__toks",
        )
    )
    # one zip of max_n end-clamped slices: row i carries (t_i, ..., t_{i+4})
    # with nulls past the end of the document
    shifts = [
        F.slice(
            "__toks", i + 1, F.greatest(F.size("__toks") - i, F.lit(0))
        ).alias(f"__s{i}")
        for i in range(max_n)
    ]
    z = toks.select(
        F.col(id_col),
        "__nchars",
        F.explode(F.arrays_zip(*shifts)).alias("z"),
    )
    gram_structs = [
        F.when(
            F.col(f"z.__s{n - 1}").isNotNull(),  # full n-grams only
            F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ", *[F.col(f"z.__s{i}") for i in range(n)]
                ).alias("gram"),
            ),
        )
        for n in all_ns
    ]
    longf = (
        z.select(
            F.col(id_col),
            "__nchars",
            F.explode(F.array(*gram_structs)).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .select(
            F.col(id_col),
            "__nchars",
            F.col("g.n").alias("n"),
            F.xxhash64("g.gram").alias("gh"),
            F.length("g.gram").alias("glen"),
        )
    )
    counts = longf.groupBy(id_col, "__nchars", "n", "gh").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("glen").alias("glen")
    )
    # top gram per (doc, n) without a window: max over (cnt, chars) picks
    # the highest count, then the largest char coverage among count ties.
    # Conditional per-n aggregates collapse straight to one row per doc.
    chars = F.col("cnt") * F.col("glen")
    top_struct = F.struct(F.col("cnt"), chars.alias("chars"))
    per_n = counts.groupBy(id_col).agg(
        F.first("__nchars").alias("__nchars"),
        *[
            F.max(F.when(F.col("n") == n, top_struct))
            .getField("chars")
            .alias(f"__top{n}")
            for n in top_ns
        ],
        *[
            F.coalesce(
                F.sum(F.when((F.col("n") == n) & (F.col("cnt") > 1), chars)),
                F.lit(0),
            ).alias(f"__dup{n}")
            for n in dup_ns
        ],
    )
    return per_n.select(
        F.col(id_col),
        *[
            F.round(
                F.coalesce(F.col(f"__top{n}") / F.col("__nchars"), F.lit(0.0)), 6
            ).alias(f"top{n}gram_char_frac")
            for n in top_ns
        ],
        *[
            F.round(
                F.coalesce(F.col(f"__dup{n}") / F.col("__nchars"), F.lit(0.0)), 6
            ).alias(f"dup{n}gram_char_frac")
            for n in dup_ns
        ],
    )


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher rule booleans + pass_all.

    Word-level rules come straight off the token array (no shuffle); the
    repetition rules join the ``repetition_features`` aggregate back on the
    doc id. Docs with no n-grams (ultra-short) pass the repetition rules
    with 0.0 fractions — they fail the word-count rule instead.
    """
    toks = TX.tokenize(text_col)
    wc = F.size(toks)
    mwl = TX.avg_token_length(text_col)
    symbolish = F.size(
        F.filter(toks, lambda t: t.contains("#") | t.contains("..."))
    )
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / wc
    stop_distinct = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(s) for s in TX.STOPWORDS])
        )
    )
    base = df.select(
        F.col(id_col),
        wc.alias("word_count"),
        F.round(mwl, 6).alias("mean_word_len"),
        symbolish.alias("n_symbol_words"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_distinct.alias("n_distinct_stopwords"),
    )
    feats = repetition_features(df, text_col, id_col)
    j = base.join(feats, id_col, "left")
    frac_cols = {
        f"top{n}gram_char_frac": thr for n, thr in TOP_NGRAM_MAX_FRAC.items()
    } | {f"dup{n}gram_char_frac": thr for n, thr in DUP_NGRAM_MAX_FRAC.items()}
    for c in frac_cols:
        j = j.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    lo_wc, hi_wc = WORD_COUNT_RANGE
    lo_mwl, hi_mwl = MEAN_WORD_LEN_RANGE
    rules = {
        "ok_word_count": F.col("word_count").between(lo_wc, hi_wc),
        "ok_mean_word_len": F.col("mean_word_len").between(lo_mwl, hi_mwl),
        "ok_symbol_ratio": (
            F.col("n_symbol_words") / F.col("word_count")
        ) <= MAX_SYMBOL_WORD_RATIO,
        "ok_alpha_words": F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC,
        "ok_stopwords": F.col("n_distinct_stopwords") >= MIN_DISTINCT_STOPWORDS,
        **{
            f"ok_top{n}gram": F.col(f"top{n}gram_char_frac") <= thr
            for n, thr in TOP_NGRAM_MAX_FRAC.items()
        },
        **{
            f"ok_dup{n}gram": F.col(f"dup{n}gram_char_frac") <= thr
            for n, thr in DUP_NGRAM_MAX_FRAC.items()
        },
    }
    for name, cond in rules.items():
        j = j.withColumn(name, cond)
    pass_all = None
    for name in rules:
        pass_all = F.col(name) if pass_all is None else pass_all & F.col(name)
    return j.withColumn("pass_all", pass_all)


#: structural encoding-artifact patterns (codepoint escapes — the
#: \x{hex} syntax is shared by Java regex and DuckDB's RE2):
#: - U+FFFD replacement characters (decoder already gave up)
#: - C0/C1 control characters that never belong in text
#: - UTF-8-read-as-Latin-1 lead bytes (Ã/Â/â U+00C3/00C2/00E2)
#:   followed by a Latin-1 continuation — the classic mojibake shape
#:   ("Ã©" for é, "â€™" for ')
ENCODING_ARTIFACT_PATTERNS = {
    "replacement": r"\x{FFFD}",
    "control": r"[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}]",
    "mojibake": r"[\x{00C3}\x{00C2}\x{00E2}][\x{0080}-\x{00FF}]",
}


def encoding_artifact_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row encoding-artifact counts — the mojibake/corruption screen
    a crawl-ingest pipeline runs before any tokenizer sees the text
    (replacement chars mean the decode already failed; control bytes
    and UTF-8-as-Latin-1 digraphs mean it failed SILENTLY upstream).
    One codegen projection of three regexp_count columns, no Python;
    patterns use the \\x{hex} codepoint syntax both engines' regex
    dialects share, so the DuckDB twin is the same expression."""
    c = F.col(text_col)
    return df.select(
        "*",
        *(
            F.regexp_count(c, F.lit(rx)).cast("long").alias(f"n_{name}")
            for name, rx in ENCODING_ARTIFACT_PATTERNS.items()
        ),
    )


def readability_report(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Flesch reading-ease / Flesch-Kincaid grade screen per group —
    the classic curriculum / difficulty-mix signal a pretraining
    curator bins documents by (alongside the Gopher structural flags;
    this is the linguistic-complexity axis those rules don't cover).

    Counting is pure regex + integers, one codegen projection:
    words = whitespace tokens, sentences = runs of [.!?] (min 1),
    syllables ~= vowel-letter groups ([aeiouy]+ of the lowercased
    text — the standard cheap estimator; a hyphenation dictionary is
    a model artifact, not an operator concern). Per-doc scores are e3
    fixed-point with sign-split divisions (every ratio quantized
    exactly once); group means divide the e3 SUMS, so nothing ever
    re-rounds. Zero-word docs are excluded (their ratios are
    undefined). Returns per group: (group, n_docs, mean_flesch_e3,
    mean_grade_e3, n_easy, n_hard) where easy/hard use the standard
    60 / 30 reading-ease cuts."""
    from firebase_etl_spark.functions.portable_math import (
        sdiv_scaled_sql,
    )

    t = F.lower(F.trim(F.col(text_col)))
    base = (
        df.filter(
            F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("g"),
            F.size(F.split(t, r"\s+")).cast("long").alias("w"),
            F.greatest(
                F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)
            ).cast("long").alias("s"),
            F.regexp_count(t, F.lit("[aeiouy]+")).cast("long")
            .alias("y"),
        )
        .filter(F.col("w") > 0)
    )
    flesch = (
        f"206835 - ({sdiv_scaled_sql('1015 * w', 's', 1, 'DIV')})"
        f" - ({sdiv_scaled_sql('84600 * y', 'w', 1, 'DIV')})"
    )
    grade = (
        f"({sdiv_scaled_sql('390 * w', 's', 1, 'DIV')})"
        f" + ({sdiv_scaled_sql('11800 * y', 'w', 1, 'DIV')}) - 15590"
    )
    scored = base.select(
        "g",
        F.expr(flesch).alias("f_e3"),
        F.expr(grade).alias("gr_e3"),
    )
    mean_f = sdiv_scaled_sql("sf", "n", 1, "DIV")
    mean_g = sdiv_scaled_sql("sg", "n", 1, "DIV")
    return (
        scored.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("f_e3").cast("long").alias("sf"),
            F.sum("gr_e3").cast("long").alias("sg"),
            F.sum((F.col("f_e3") >= 60000).cast("long")).cast("long")
            .alias("n_easy"),
            F.sum((F.col("f_e3") < 30000).cast("long")).cast("long")
            .alias("n_hard"),
        )
        .select(
            F.col("g").alias(group_col),
            F.col("n").alias("n_docs"),
            F.expr(mean_f).alias("mean_flesch_e3"),
            F.expr(mean_g).alias("mean_grade_e3"),
            "n_easy", "n_hard",
        )
        .orderBy(group_col)
    )
