from firebase_etl_spark.sinks.files import (
    write_csv,
    write_json,
    write_parquet,
)
from firebase_etl_spark.sinks.loader import LoadReport, load_with_quarantine

__all__ = [
    "write_csv",
    "write_json",
    "write_parquet",
    "LoadReport",
    "load_with_quarantine",
]
