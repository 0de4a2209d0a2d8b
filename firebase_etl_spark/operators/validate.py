"""Validation as a split-path plan: violations array -> valid / quarantine.

Parity targets:
- validate_required_fields (reference user_transformer.py:491-519) — V1
- per-row Pydantic validation with error channel
  (reference user_transformer.py:322-392) — V4/V5

Instead of row-at-a-time validation with a Python error list, the engine
computes a ``violations: array<string>`` column from native predicates and
splits the plan: ``valid`` (empty violations) vs ``quarantine`` (non-empty,
carrying the reasons). Both sides stay distributed DataFrames; counts come
from one pass each (or ``observe`` metrics on a write path). At 100 TB the
quarantine is written alongside the good output, never collected.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class ValidationResult:
    valid: DataFrame
    quarantine: DataFrame  # original columns + violations array<string>


def validation_rules(required_non_null: tuple[str, ...] = ("id", "email")) -> dict[str, Column]:
    """Named rule -> boolean Column that is True when VIOLATED."""
    rules: dict[str, Column] = {}
    for c in required_non_null:
        rules[f"{c}_null"] = F.col(c).isNull()
    return rules


def split_valid(df: DataFrame, rules: dict[str, Column]) -> ValidationResult:
    """Attach violations array, split into valid/quarantine."""
    viol = F.filter(
        F.array(
            *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in rules.items()]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("violations", viol)
    valid = tagged.filter(F.size("violations") == 0).drop("violations")
    quarantine = tagged.filter(F.size("violations") > 0)
    return ValidationResult(valid=valid, quarantine=quarantine)


def validate_users(df: DataFrame) -> ValidationResult:
    """Canonical user validation: id/email present & non-null, status in
    domain (reference UserModel constraints)."""
    rules = validation_rules(("id", "email"))
    if "status" in df.columns:
        rules["status_invalid"] = ~F.coalesce(
            F.col("status").isin("ACTIVE", "INACTIVE", "BANNED"), F.lit(False)
        )
    return split_valid(df, rules)


def required_columns_report(df: DataFrame, required: tuple[str, ...] = ("id", "email")) -> dict:
    """Schema-level check + per-column null counts in ONE aggregation pass
    (reference user_transformer.py:503-510, A8)."""
    missing = [c for c in required if c not in df.columns]
    present = [c for c in required if c in df.columns]
    counts = {}
    if present:
        row = df.agg(
            F.count(F.lit(1)).alias("__total"),
            *[F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in present],
        ).collect()[0]
        counts = {c: row[c] for c in present}
        total = row["__total"]
    else:
        total = df.count()
    return {
        "valid": not missing and all(v == 0 for v in counts.values()),
        "missing_columns": missing,
        "null_counts": counts,
        "total_rows": total,
    }
