"""Skew utilities (salted agg/join) and bucketed-table co-located joins."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from firebase_etl_spark.operators.skew import salted_aggregate, salted_join
from firebase_etl_spark.plans.inspect import physical_plan
from firebase_etl_spark.sinks.tables import save_bucketed, table_exists


def test_salted_aggregate_matches_plain(spark):
    # one hot key (80% of rows) + tail
    rows = [("hot", i % 7) for i in range(400)] + [(f"k{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, v int")
    plain = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in salted_aggregate(
            df,
            "k",
            {
                "n": (F.count(F.lit(1)), "sum"),
                "s": (F.sum("v"), "sum"),
                "mx": (F.max("v"), "max"),
            },
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_non_decomposable(spark):
    import pytest

    df = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(ValueError, match="decomposable"):
        salted_aggregate(df, "k", {"m": (F.avg("v"), "avg")})


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(300)] + [("cold", 1), ("miss", 2)], "k string, v int"
    )
    small = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, tag string")
    plain = sorted(
        (r["k"], r["v"], r["tag"]) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["tag"]) for r in salted_join(big, small, "k", 4).collect()
    )
    assert salted == plain


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    from firebase_etl_spark.sources.tables import load_table

    suffix = uuid.uuid4().hex[:8]
    t1, t2 = f"orders_b_{suffix}", f"cust_b_{suffix}"
    save_bucketed(
        load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_totalprice"),
        t1, "o_custkey", num_buckets=8,
    )
    save_bucketed(
        load_table(spark, "customer", sf_dir).select("c_custkey", "c_name"),
        t2, "c_custkey", num_buckets=8,
    )
    assert table_exists(spark, t1) and table_exists(spark, t2)

    a = spark.table(t1)
    b = spark.table(t2)
    # disable broadcast so the join would need a shuffle WITHOUT bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_custkey == b.c_custkey)
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        # bucketed layout: no shuffle exchange feeding the join
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")
