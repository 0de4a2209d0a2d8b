"""Fault-tolerant load: the split-path rewrite of the reference's row-wise
insert loop (K3/K4, reference postgres_loader.py:293-326,524-605).

The reference inserts one row per transaction to isolate failures and
accumulates per-row errors in a Python list. Distributed rewrite: validate
FIRST (operators/validate), write the good side in bulk, quarantine the bad
side with reasons — no per-row transactions, no driver-side error list;
counts come from one action per side (or ``observe`` metrics on the write).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from firebase_etl_spark.operators.validate import ValidationResult, validate_users
from firebase_etl_spark.sinks.files import write_parquet


@dataclass
class LoadReport:
    total: int
    loaded: int
    quarantined: int

    @property
    def success_rate(self) -> float:
        return self.loaded / self.total if self.total else 1.0


def load_with_quarantine(
    df: DataFrame,
    good_path: str,
    quarantine_path: str,
    validate=validate_users,
) -> LoadReport:
    """Validate -> bulk-write valid rows -> quarantine the rest (with their
    ``violations`` reasons). Mirrors the reference's load report shape
    (postgres_loader.py:585-592) without its 1-row-per-transaction cost."""
    result: ValidationResult = validate(df)
    write_parquet(result.valid, good_path)
    write_parquet(result.quarantine, quarantine_path)
    loaded = result.valid.count()
    quarantined = result.quarantine.count()
    return LoadReport(total=loaded + quarantined, loaded=loaded, quarantined=quarantined)


def write_jdbc_append(df: DataFrame, url: str, table: str, properties: dict) -> None:
    """Bulk JDBC append (K3) — batched statements via the JDBC writer
    (``batchsize`` in properties), not per-row transactions. UPDATE/DELETE
    (K5/K6) are not native to the Spark JDBC sink; route through a staging
    table + MERGE executed on the target, or a Delta/Iceberg table."""
    df.write.mode("append").jdbc(url, table, properties=properties)
