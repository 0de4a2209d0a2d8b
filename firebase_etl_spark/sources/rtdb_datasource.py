"""Custom Python DataSource (Spark 4 API) for RTDB JSON exports.

``sources/firebase.read_rtdb_export`` reads the map-of-objects export with
``spark.read.text(wholetext=True)`` — correct, but the document lands in
ONE task and the map-explode runs single-partition before the shuffle. This
DataSource exposes the same export as a real multi-partition scan:

- ``partitions()`` declares N splits with NO driver-side read: each split
  owns the keys whose crc32 lands in its bucket, so planning is O(1).
- ``read(split)`` parses the document executor-side and yields only its
  bucket's (key, raw-record-json) rows. A single JSON document is not
  byte-splittable, so every task re-reads the file — the win is that the
  expensive part (per-record ``from_json`` + downstream transforms) runs
  partition-parallel, and the API shape is identical to a genuinely
  splittable backend (an RTDB REST shard range, a GCS composite export),
  where ``read`` would fetch only its shard.

Usage::

    spark.dataSource.register(RtdbDataSource)
    df = (spark.read.format("rtdb")
          .option("path", "/data/users_export.json")
          .option("numPartitions", "8").load())
    # -> (key string, raw string); parse with from_json(raw, schema)

Schema is fixed at (key, raw) on purpose — record schemas vary per node, so
typed parsing stays a downstream ``from_json`` exactly like the two-stage
design in read_rtdb_export (corrupt non-object entries survive as raw text
for quarantine instead of failing the scan).
"""

from __future__ import annotations

import json
import zlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
)
from pyspark.sql.types import StringType, StructField, StructType

RTDB_SCAN_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("raw", StringType(), True),
    ]
)


class RtdbKeyBucket(InputPartition):
    def __init__(self, bucket: int, num_buckets: int, path: str):
        self.bucket = bucket
        self.num_buckets = num_buckets
        self.path = path


class RtdbReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rtdb source requires option 'path'")
        self.num_partitions = int(options.get("numpartitions", 8))
        self.key_filter: set[str] | None = None  # None = full scan

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Point/`IN` lookups on ``key`` prune to their hash buckets — the
        S2 point-lookup path served by the scan itself (an RTDB backend
        would turn this into a direct child-node GET). Everything else
        stays with Spark."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("key",):
                keys = {str(f.value)}
            elif isinstance(f, In) and f.attribute == ("key",):
                # pyspark 4.1's In dataclass stores the tuple in `value`
                keys = {str(v) for v in f.value}
            else:
                yield f
                continue
            # multiple consumed key filters conjoin => intersect, don't clobber
            self.key_filter = (
                keys if self.key_filter is None else self.key_filter & keys
            )

    def _bucket_of(self, key: str) -> int:
        return zlib.crc32(key.encode("utf-8")) % self.num_partitions

    def partitions(self) -> Sequence[InputPartition]:
        # no driver-side file read: buckets are defined by a key hash;
        # a pushed key filter keeps only the buckets that can match
        buckets = range(self.num_partitions)
        if self.key_filter is not None:
            buckets = sorted({self._bucket_of(k) for k in self.key_filter})
        return [
            RtdbKeyBucket(i, self.num_partitions, self.path) for i in buckets
        ]

    def read(self, partition: RtdbKeyBucket) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            root = json.load(fh)
        if not isinstance(root, dict):
            return
        for key, value in root.items():
            if self.key_filter is not None and key not in self.key_filter:
                continue
            h = zlib.crc32(key.encode("utf-8")) % partition.num_buckets
            if h != partition.bucket:
                continue
            # records stay raw JSON text (typed parse is downstream);
            # non-object corruption survives for quarantine semantics
            yield (key, json.dumps(value, ensure_ascii=False))


class RtdbDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rtdb"

    def schema(self) -> StructType:
        return RTDB_SCAN_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return RtdbReader({k.lower(): v for k, v in self.options.items()})
