"""String/null/bool canonicalization — pure Column -> Column transforms.

Parity targets (semantics only, Spark-first implementation):
- clean_string  ⇔ reference user_transformer.py:204-234 (_clean_string_field)
- to_bool       ⇔ reference user_transformer.py:331 / postgres_loader.py:226-229
- mask_email    ⇔ reference firebase_service.py:207-208
- with_default  ⇔ reference postgres_loader.py:238-239 (fillna defaults)

The reference's NaN/NaT canonicalization (_safe_isna / _clean_nan_values,
user_transformer.py:45-81) disappears: Spark has a single NULL. What remains
is the *string-token* null domain: '', 'nan', 'null', 'none', 'nat' (any
case, surrounding whitespace) must become NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Case-insensitive string tokens the reference treats as null
#: (user_transformer.py:104,231; postgres_loader.py:164,262).
NULL_TOKENS = ("", "nan", "null", "none", "nat")


def clean_string(col: Column | str) -> Column:
    """Trim; map null-token strings ('', 'nan', 'null', 'none', 'nat',
    case-insensitive) to NULL. Input that is already NULL stays NULL."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c.cast("string"))
    return F.when(F.lower(trimmed).isin(*NULL_TOKENS), F.lit(None).cast("string")).otherwise(
        trimmed
    )


def clean_string_from_array(col: Column | str) -> Column:
    """Array input variant: first non-null, non-null-token element
    (reference user_transformer.py:208-216 takes the first valid element)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.filter(F.transform(c, clean_string), lambda x: x.isNotNull())
    return F.element_at(cleaned, 1)


def to_bool(col: Column | str, default: bool = False) -> Column:
    """Truthy cast with a default for NULL. Accepts boolean columns and the
    string domain 'true'/'false'/'1'/'0' (case-insensitive)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(F.trim(c.cast("string")))
    parsed = (
        F.when(s.isin("true", "t", "1", "yes"), F.lit(True))
        .when(s.isin("false", "f", "0", "no"), F.lit(False))
        .otherwise(c.try_cast("boolean"))
    )
    return F.coalesce(parsed, F.lit(default))


def with_default(col: Column | str, default) -> Column:
    """NULL -> literal default (fillna equivalent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def mask_email(col: Column | str) -> Column:
    """Display redaction: first 3 chars + '***'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull(), F.concat(F.substring(c, 1, 3), F.lit("***")))
