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
