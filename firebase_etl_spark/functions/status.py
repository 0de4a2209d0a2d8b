"""Status-enum normalization (EN/FR synonyms -> {ACTIVE, INACTIVE, BANNED}).

Parity target: reference user_transformer.py:179-202 (_normalize_status).
Unknown or NULL input defaults to ACTIVE. Implemented as an upper/trim plus
a literal when-chain — constant-folded by Catalyst, no lookup table shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Synonym map (reference user_transformer.py:190-200).
STATUS_SYNONYMS = {
    "ACTIVE": "ACTIVE",
    "ACTIF": "ACTIVE",
    "ENABLED": "ACTIVE",
    "INACTIVE": "INACTIVE",
    "INACTIF": "INACTIVE",
    "DISABLED": "INACTIVE",
    "BANNED": "BANNED",
    "BANNI": "BANNED",
    "BLOCKED": "BANNED",
}

DEFAULT_STATUS = "ACTIVE"


def normalize_status(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    up = F.upper(F.trim(c.cast("string")))
    out = F.lit(None).cast("string")
    # build when-chain grouped by target value
    expr = None
    for target in ("ACTIVE", "INACTIVE", "BANNED"):
        sources = [k for k, v in STATUS_SYNONYMS.items() if v == target]
        cond = up.isin(*sources)
        expr = F.when(cond, target) if expr is None else expr.when(cond, target)
    return expr.otherwise(DEFAULT_STATUS)
