"""Optimizer-behavior regression tests: pin the physical-plan properties the
engine relies on at scale (pushdown, pruning, broadcast, window-limit).
These fail if a code change silently de-optimizes a headline query."""

from __future__ import annotations

from pyspark.sql import functions as F

from firebase_etl_spark.plans import queries as Q
from firebase_etl_spark.plans.inspect import (
    has_pushed_filter,
    has_window_group_limit,
    physical_plan,
    scans_read_columns,
    uses_broadcast_join,
)
from firebase_etl_spark.sources.tables import load_table


def test_q1_filter_pushdown(spark, sf_dir):
    df = Q.q1_pricing_summary(spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate")


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    schemas = scans_read_columns(df)
    assert schemas and all(
        "l_extendedprice" not in s for s in schemas
    ), f"projection not pruned: {schemas}"


def test_dimension_joins_broadcast(spark, sf_dir):
    df = Q.revenue_by_region(spark, sf_dir)
    assert uses_broadcast_join(df)


def test_dedup_uses_window_group_limit(spark, sf_dir):
    df = Q.latest_order_per_customer(spark, sf_dir)
    assert has_window_group_limit(df)


def test_top100_avoids_global_sort(spark, sf_dir):
    df = Q.global_top100_orders(spark, sf_dir)
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_limit_zero_schema_probe_no_scan(spark, sf_dir):
    """S11 LIMIT-0 probe equivalent: schema resolution is plan-time only."""
    df = load_table(spark, "lineitem", sf_dir)
    assert len(df.schema.fields) == 11  # no job ran to get this
    assert df.limit(0).count() == 0
