"""Google Cloud Datastore extraction, Spark-first (SURVEY.md §2.1 S5-S7).

The reference cursor-paginates entity pages of 1000 over RPC
(reference datastore_service.py:105-178), materializing each entity dict
with key->id derivation (142-150: key name, else key id, else synthetic
``auto_<n>``) and datetime->ISO strings (153-155).

Spark-native: Datastore's managed export writes entities to storage
(JSON-lines per kind here; the production format is LevelDB handled by a
connector). Reading the export is partition-parallel — pagination
disappears. Key materialization becomes a coalesce chain with
``monotonically_increasing_id`` for the synthetic fallback (unique across
partitions without coordination, matching the reference's intent, not its
literal ``auto_<n>`` counter which cannot exist distributed)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_datastore_export(
    spark: SparkSession,
    path: str,
    value_schema: T.StructType,
    key_name_field: str = "__key_name",
    key_id_field: str = "__key_id",
) -> DataFrame:
    """Read a JSONL entity export. Each line: entity properties plus
    optional ``__key_name`` / ``__key_id``. Output adds ``id``:
    key name -> key id -> synthetic ``auto_<n>``."""
    schema = T.StructType(
        list(value_schema.fields)
        + [
            T.StructField(key_name_field, T.StringType(), True),
            T.StructField(key_id_field, T.LongType(), True),
        ]
    )
    df = spark.read.schema(schema).json(path)
    synthetic = F.concat(F.lit("auto_"), F.monotonically_increasing_id().cast("string"))
    return (
        df.withColumn(
            "id",
            F.coalesce(
                F.col(key_name_field),
                F.col(key_id_field).cast("string"),
                synthetic,
            ),
        )
        .drop(key_name_field, key_id_field)
    )


def count_entities(df: DataFrame) -> int:
    """S6 keys-only count: Catalyst prunes to zero columns — the scan reads
    parquet/JSON footers only, the distributed twin of a keys-only query."""
    return df.count()


def sample_entity(df: DataFrame, n: int = 1) -> list:
    """S7 LIMIT-n probe."""
    return df.limit(n).collect()
