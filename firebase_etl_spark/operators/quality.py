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
      single most frequent word n-gram (ties broken by gram ascending),
      over the chars of the space-normalized text.
    - ``dup{n}gram_char_frac``: chars covered by all occurrences of grams
      appearing more than once, same denominator.

    Docs too short to have an n-gram get 0.0 for that n. Fractions are
    rounded to 6dp so cross-engine double aggregation stays hash-equal.

    Shape: one token explode + one doc-keyed window builds the gram rows
    (whole-stage codegen; HOF slice/array_join alternatives run
    interpreted and measured ~2x slower), then one (doc, n, gram) count
    aggregate. The top-gram selection is a min(struct(-cnt, gram, chars))
    aggregate — same "max count, ties by gram ascending" pick as a
    row_number window, but map-side combinable and sort-free — and the
    per-n values collapse to one row per doc with conditional aggregates,
    removing the window sort + one shuffle of the windowed formulation.
    """
    top_ns = sorted(TOP_NGRAM_MAX_FRAC)
    dup_ns = sorted(DUP_NGRAM_MAX_FRAC)
    all_ns = sorted({*top_ns, *dup_ns})
    max_n = max(all_ns)

    d = df.select(F.col(id_col), TX.tokenize(text_col).alias("__toks")).select(
        F.col(id_col),
        F.length(F.array_join("__toks", " ")).alias("__nchars"),
        F.posexplode("__toks").alias("pos", "tok"),
    )
    wo = Window.partitionBy(id_col).orderBy("pos")
    wall = Window.partitionBy(id_col)
    # window expressions can't live inside a generator: materialize the
    # shifted tokens as plain columns first, then explode gram structs
    shifted = d.select(
        F.col(id_col),
        "__nchars",
        "pos",
        "tok",
        F.count(F.lit(1)).over(wall).alias("__nt"),
        *[F.lead("tok", i).over(wo).alias(f"__l{i}") for i in range(1, max_n)],
    )
    gram_structs = [
        F.when(
            F.col("pos") <= F.col("__nt") - n,  # full n-grams only
            F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ",
                    F.col("tok"),
                    *[F.col(f"__l{i}") for i in range(1, n)],
                ).alias("gram"),
            ),
        )
        for n in all_ns
    ]
    longf = (
        shifted.select(
            F.col(id_col),
            "__nchars",
            F.explode(F.array(*gram_structs)).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .select(F.col(id_col), "__nchars", "g.n", "g.gram")
    )
    counts = longf.groupBy(id_col, "__nchars", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # top gram per (doc, n) without a window: min over (-cnt, gram) picks
    # the highest count with ties broken by gram ascending; chars rides
    # along in the struct. Conditional per-n aggregates collapse straight
    # to one row per doc.
    chars = F.col("cnt") * F.length("gram")
    top_struct = F.struct(
        (-F.col("cnt")).alias("neg_cnt"), F.col("gram"), chars.alias("chars")
    )
    per_n = counts.groupBy(id_col).agg(
        F.first("__nchars").alias("__nchars"),
        *[
            F.min(F.when(F.col("n") == n, top_struct))
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
