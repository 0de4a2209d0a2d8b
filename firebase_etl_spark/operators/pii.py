"""PII detection / redaction over text corpora — the scrub stage of a
training-data pipeline (extension beyond the reference, alongside the
quality/dedup operators; the reference's closest analog is display
masking, reference etl/transforms.py mask_name).

Everything is native Column regex (Java regex on the Spark side); the
patterns are chosen to mean the same thing in RE2 so a DuckDB oracle
replays detection counts and the scrubbed content byte-for-byte. No
Python in the hot path — at corpus scale this runs as one projection
inside whole-stage codegen, no shuffle at all.

The pattern set is deliberately the standard, auditable trio (emails,
IPv4, international-ish phone runs). Real deployments extend PATTERNS —
the pipeline shape (sequential regexp_replace + per-type regexp_count in
one pass) does not change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, regex, replacement) — order matters: earlier patterns are
#: scrubbed first, so e.g. an email's digits can't also match as a phone.
PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d()./ -]{7,}\d", "<PHONE>"),
]


def pii_counts(col: Column | str) -> list[Column]:
    """Per-type non-overlapping match counts on the ORIGINAL text."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(rx)).alias(f"n_{name}")
        for name, rx, _ in PATTERNS
    ]


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Adds per-type counts and a scrubbed text column. Counts are taken on
    the original text; replacements are applied sequentially in PATTERNS
    order (so replacement tokens can't be re-matched by later patterns)."""
    scrubbed = F.col(text_col)
    for _, rx, token in PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, rx, token)
    return df.select(
        "*",
        *pii_counts(text_col),
        scrubbed.alias(out_col),
    )


def k_anonymity_report(
    df: DataFrame,
    levels: list[tuple[str, list[Column]]],
    k: int = 10,
) -> DataFrame:
    """k-anonymity audit across a generalization ladder (Sweeney 2002):
    for each candidate quasi-identifier combination, how many equivalence
    classes fall below ``k`` members and how many rows those classes
    expose — the re-identification screen a dataset passes before its
    metadata ships (complements the content-side scrub_pii). Feeding a
    LADDER of levels (finest first) shows the generalization/utility
    tradeoff in one table: the level where risky_row_rate hits zero is
    the release granularity.

    One keyed aggregate per level over bounded group-stat rows; all
    quantities integers (the rate is one rounded division). Returns one
    row per level: (level, n_rows, n_groups, min_group_size,
    n_risky_groups, n_risky_rows, risky_row_rate)."""
    if not levels:
        raise ValueError("levels must be non-empty")
    outs = []
    for name, cols in levels:
        g = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
        risky_rows = F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
        outs.append(
            g.agg(
                F.sum("n").alias("n_rows"),
                F.count(F.lit(1)).alias("n_groups"),
                F.min("n").alias("min_group_size"),
                F.sum((F.col("n") < k).cast("long")).alias("n_risky_groups"),
                risky_rows.alias("n_risky_rows"),
                F.round(risky_rows / F.sum("n"), 6).alias("risky_row_rate"),
            ).select(
                F.lit(name).alias("level"),
                "n_rows",
                "n_groups",
                "min_group_size",
                "n_risky_groups",
                "n_risky_rows",
                "risky_row_rate",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("level")


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2006) — k-anonymity's
    complement: an equivalence class can be large (k-anonymous) yet
    expose everyone in it if they all share one SENSITIVE value
    (homogeneity attack). Per quasi-identifier class: size, distinct
    sensitive values, the dominant sensitive value's share, and the
    l-diversity verdict. One grouped aggregate over (quasi, sensitive)
    counts; max share is max(count) — an integer, no tie-break."""
    g = (
        df.filter(F.col(sensitive_col).isNotNull())
        .groupBy(*quasi_cols, F.col(sensitive_col).alias("__s"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        g.groupBy(*quasi_cols)
        .agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_sensitive_values"),
            F.max("c").alias("dominant_count"),
            F.round(F.max("c") / F.sum("c"), 6).alias("dominant_share"),
            (F.count(F.lit(1)) >= l).alias("l_diverse"),
        )
        .orderBy(*quasi_cols)
    )
