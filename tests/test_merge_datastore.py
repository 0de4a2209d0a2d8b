"""Upsert/delete emulation (K5/K6) and the Datastore export source (S5-S7)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from firebase_etl_spark.sinks.merge import delete_keys, upsert, upsert_parquet
from firebase_etl_spark.sources.datastore import (
    count_entities,
    read_datastore_export,
    sample_entity,
)


def test_upsert_and_delete(spark):
    target = spark.createDataFrame(
        [("k1", "old1"), ("k2", "old2"), ("k3", "old3")], "id string, v string"
    )
    updates = spark.createDataFrame(
        [("k2", "NEW2"), ("k9", "NEW9")], "id string, v string"
    )
    merged = {r["id"]: r["v"] for r in upsert(target, updates, "id").collect()}
    assert merged == {"k1": "old1", "k2": "NEW2", "k3": "old3", "k9": "NEW9"}

    deletes = spark.createDataFrame([("k1",), ("k9",)], "id string")
    left = {r["id"] for r in delete_keys(target, deletes, "id").collect()}
    assert left == {"k2", "k3"}


def test_upsert_parquet_snapshot(spark, tmp_path):
    base = str(tmp_path / "t")
    spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int").write.parquet(base)
    updates = spark.createDataFrame([("b", 20), ("c", 30)], "id string, v int")
    out = upsert_parquet(spark, base, updates, "id", out_path=str(tmp_path / "t2"))
    assert {(r["id"], r["v"]) for r in out.collect()} == {("a", 1), ("b", 20), ("c", 30)}


def test_datastore_export_key_materialization(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("email", T.StringType(), True),
            T.StructField("name", T.StringType(), True),
        ]
    )
    lines = [
        {"email": "a@x.com", "name": "A", "__key_name": "userA"},
        {"email": "b@x.com", "name": "B", "__key_id": 12345},
        {"email": "c@x.com", "name": "C"},  # no key -> synthetic auto_<n>
    ]
    p = tmp_path / "export.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines))
    df = read_datastore_export(spark, str(p), schema)
    rows = {r["email"]: r["id"] for r in df.collect()}
    assert rows["a@x.com"] == "userA"
    assert rows["b@x.com"] == "12345"
    assert rows["c@x.com"].startswith("auto_")
    assert count_entities(df) == 3
    assert len(sample_entity(df, 2)) == 2
