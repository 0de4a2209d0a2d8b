"""firebase_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline (`abdelaMrah/firebase-etl`):
schema-on-read extraction, scalar cleaning/parsing transforms, validation
splits, keep-latest-per-key deduplication, conflict resolution, and the
statistics surface — plus the large-scale extensions (approximate
deduplication, similarity search, text analysis, streaming) that a
training-data pipeline needs at 100 TB.

Design stance (SURVEY.md §7.0): DataFrame/SQL API over explicit StructTypes,
all transforms as native Column expressions (zero row-at-a-time Python UDFs
in the hot path), lazy plans optimized by Catalyst/AQE, Pandas UDFs only
where built-ins genuinely cannot express the semantics.
"""

from firebase_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
