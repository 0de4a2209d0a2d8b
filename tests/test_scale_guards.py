"""Scale-safety lint: crafted anti-patterns must be flagged, and EVERY
driver query's physical plan must be free of them (the repo-wide
assertion that no query hides a cartesian join or a single-partition
global window)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from firebase_etl_spark.plans.guards import assert_scale_safe, scale_violations

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_flags_cartesian_product(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bad = a.crossJoin(b)
        assert any("CartesianProduct" in v for v in scale_violations(bad))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_flags_global_window(spark):
    bad = spark.range(10).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert any("empty PARTITION BY" in v for v in scale_violations(bad))


def test_passes_partitioned_window(spark):
    ok = spark.range(10).withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.col("id") % 2).orderBy("id"))
    )
    assert_scale_safe(ok)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_driver_queries_scale_safe(name, spark):
    """Every declared query compiles to a plan with no cartesian join and
    no global-order window. Building the DataFrame executes the queries'
    internal materialization steps (checkpoints, trainers, bounded
    streams) at sf0.001 — cheap, and exactly what the driver does."""
    df = entrymod.queries()[name](spark, SF_DIR)
    assert_scale_safe(df)
