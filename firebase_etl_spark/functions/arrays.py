"""Array-valued parsing/serialization.

- parse_interests   ⇔ reference user_transformer.py:150-177 (_parse_interests)
- pg_array_literal  ⇔ reference postgres_loader.py:334-354
  (_format_array_for_postgres) — sink-side only; the engine keeps
  ArrayType end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from firebase_etl_spark.functions.cleaning import clean_string


def parse_interests(col: Column | str) -> Column:
    """String -> cleaned array<string>.

    Comma-separated string -> split + trim; single token -> 1-element array;
    empty/null-token -> NULL. Also accepts an existing array column via
    ``parse_interests_array``.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = clean_string(c)
    arr = F.filter(
        F.transform(F.split(cleaned, ","), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return F.when(F.size(arr) > 0, arr)


def parse_interests_array(col: Column | str) -> Column:
    """Array input variant: clean elements, drop null/null-token entries,
    empty array -> NULL (reference user_transformer.py:155-163)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.filter(F.transform(c, clean_string), lambda x: x.isNotNull())
    return F.when(F.size(arr) > 0, arr)


def pg_array_literal(col: Column | str) -> Column:
    """array<string> -> PostgreSQL literal ``{'a','b'}`` with ``'`` -> ``''``
    escaping; empty/NULL -> NULL. Sink-side serializer only."""
    c = F.col(col) if isinstance(col, str) else col
    quoted = F.transform(
        c, lambda x: F.concat(F.lit("'"), F.replace(x, F.lit("'"), F.lit("''")), F.lit("'"))
    )
    body = F.array_join(quoted, ",")
    return F.when(
        c.isNotNull() & (F.size(c) > 0), F.concat(F.lit("{"), body, F.lit("}"))
    )
