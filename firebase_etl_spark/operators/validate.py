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


def table_contract_report(df: DataFrame, rules: list) -> DataFrame:
    """Declarative table-contract audit (the dbt-test / expectation-suite
    capability): evaluate a list of rules in ONE scan plus one tiny
    aggregate per uniqueness rule, returning one row per rule —
    (rule, column, n_rows, n_violations, violation_rate, passed).
    Generalizes the user-pipeline validation split (split_valid) from
    the fixed User schema to any table; violations are COUNTED here,
    not quarantined — contracts gate publication, the split gates rows.

    ``rules`` entries are tuples:
      ("not_null",  col, max_null_rate)        — null share <= cap
      ("in_set",    col, [allowed, ...])        — non-null values in set
      ("range",     col, lo, hi)                — non-null values in [lo, hi]
      ("unique",    col, None)                  — no duplicate non-null keys

    Row-level rules compile to conditional sums in a single aggregate
    (one scan regardless of rule count); each ``unique`` rule is one
    keyed aggregate counting rows in key groups of size > 1. All counts
    integer; the rate is one rounded division."""
    if not rules:
        raise ValueError("rules must be non-empty")
    row_exprs = []
    meta = []
    uniques = []
    n_rows = F.count(F.lit(1))
    for rule in rules:
        kind, col = rule[0], rule[1]
        if kind == "not_null":
            row_exprs.append(
                F.sum(F.col(col).isNull().cast("long")).alias(
                    f"__v{len(meta)}"
                )
            )
            meta.append((kind, col, float(rule[2])))
        elif kind == "in_set":
            row_exprs.append(
                F.sum(
                    (
                        F.col(col).isNotNull()
                        & ~F.col(col).isin(list(rule[2]))
                    ).cast("long")
                ).alias(f"__v{len(meta)}")
            )
            meta.append((kind, col, 0.0))
        elif kind == "range":
            lo, hi = rule[2], rule[3]
            row_exprs.append(
                F.sum(
                    (
                        F.col(col).isNotNull()
                        & ((F.col(col) < lo) | (F.col(col) > hi))
                    ).cast("long")
                ).alias(f"__v{len(meta)}")
            )
            meta.append((kind, col, 0.0))
        elif kind == "unique":
            uniques.append(col)
        else:  # pragma: no cover - caller error
            raise ValueError(f"unknown contract rule kind: {kind}")
    agg = df.agg(n_rows.alias("__n"), *row_exprs)
    outs = []
    for i, (kind, col, cap) in enumerate(meta):
        outs.append(
            agg.select(
                F.lit(f"{kind}:{col}").alias("rule"),
                F.lit(col).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v{i}").alias("n_violations"),
                F.round(F.col(f"__v{i}") / F.col("__n"), 6).alias(
                    "violation_rate"
                ),
                (F.col(f"__v{i}") / F.col("__n") <= cap).alias("passed"),
            )
        )
    for col in uniques:
        dup = (
            df.filter(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
                ).alias("__v")
            )
        )
        outs.append(
            agg.crossJoin(F.broadcast(dup)).select(
                F.lit(f"unique:{col}").alias("rule"),
                F.lit(col).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col("__v").alias("n_violations"),
                F.round(F.col("__v") / F.col("__n"), 6).alias(
                    "violation_rate"
                ),
                (F.col("__v") == 0).alias("passed"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("rule")
