"""Catalog introspection (S11-S13) and observe-metrics (A10) coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from firebase_etl_spark.operators.stats import (
    distribution,
    duplicate_groups,
    null_counts,
    user_stats,
    with_observed_counts,
)
from firebase_etl_spark.sources.catalog import (
    list_tables,
    register_catalog,
    table_columns,
    table_stats,
)


def test_catalog_listing_and_search(spark, sf_dir):
    register_catalog(spark, sf_dir)
    all_tables = {r["table_name"] for r in list_tables(spark).collect()}
    assert {"orders", "lineitem", "customer"} <= all_tables
    # the session-scoped catalog accumulates temp views from earlier
    # tests (e.g. a query fixture registering an orders-derived view),
    # so pin the like-filter's BEHAVIOR, not the exact result set:
    # "orders" must hit, every hit must match the pattern, and a
    # non-matching table must not leak in (order-independent — this
    # assert used to flake after test_scale_guards)
    hits = {r["table_name"] for r in list_tables(spark, like="ORD").collect()}
    assert "orders" in hits
    assert all("ord" in h.lower() for h in hits)
    assert "lineitem" not in hits


def test_table_columns_metadata(spark, sf_dir):
    register_catalog(spark, sf_dir)
    cols = {r["column_name"]: r["data_type"] for r in table_columns(spark, "orders").collect()}
    assert cols["o_orderkey"] == "bigint"
    assert cols["o_totalprice"] == "double"


def test_table_stats_counts(spark, sf_dir):
    stats = {r["table_name"]: r["n_rows"] for r in table_stats(spark, sf_dir).collect()}
    assert stats["region"] == 5
    assert stats["nation"] == 25


def test_observe_metrics_single_pass(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", None)], "k string, v int"
    )
    observed, obs = with_observed_counts(
        df, "m", {"v_null": F.col("v").isNull(), "v_big": F.col("v") > 1}
    )
    assert observed.count() == 3  # materialize
    got = obs.get
    assert (got["total"], got["v_null"], got["v_big"]) == (3, 1, 1)


def test_user_stats_and_distribution(spark):
    df = spark.createDataFrame(
        [
            ("a@x", "CREDENTIALS", True),
            ("b@x", "google.com", False),
            (None, "CREDENTIALS", False),
        ],
        "email string, provider string, emailVerified boolean",
    )
    s = user_stats(df)
    assert s["total_users"] == 3
    assert s["users_with_email"] == 2
    assert s["credentials_users"] == 2
    assert s["google_users"] == 1

    dist = {r["provider"]: r["n"] for r in distribution(df, "provider").collect()}
    assert dist == {"CREDENTIALS": 2, "google.com": 1}

    dups = duplicate_groups(
        spark.createDataFrame([("x",), ("x",), ("y",)], "k string"), "k"
    ).collect()
    assert [(r["k"], r["n"]) for r in dups] == [("x", 2)]

    nc = null_counts(df, ("email", "provider")).collect()[0]
    assert (nc["email_nulls"], nc["provider_nulls"]) == (1, 0)


def test_approx_count_distinct_error_bound(spark):
    """HLL++ at rsd=0.01 must land within 2% of the exact distinct count
    (tighter than the driver query's 5x-margin ``within_bound``); and the
    driver query itself — now self-verifying per the r4 verdict — must
    report the exact counts with every bound check TRUE."""
    import pyspark.sql.functions as F

    from firebase_etl_spark.plans.queries_ext import events_distinct_users_approx
    from firebase_etl_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    exact = {
        r["event_type"]: r["exact_users"]
        for r in load_table(spark, "events", sf)
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in load_table(spark, "events", sf)
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
        .collect()
    }
    for et, want in exact.items():
        err = abs(approx[et] - want) / max(1, want)
        assert err < 0.02, (et, err)
    rows = events_distinct_users_approx(spark, sf).collect()
    assert rows
    for r in rows:
        assert r["n_users_exact"] == exact[r["event_type"]]
        assert r["within_bound"] is True, r


def test_approx_percentile_error_bound(spark):
    """GK sketch at accuracy=1000 must land within 1% relative error of
    the exact (interpolated) percentile; and the self-verifying driver
    query must report discrete exact percentiles that bracket sanely
    with every bound check TRUE."""
    import pyspark.sql.functions as F

    from firebase_etl_spark.plans.queries_ext import lineitem_percentiles_approx
    from firebase_etl_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, "lineitem", sf)
    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["ap"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)"
            ).alias("ap")
        )
        .collect()
    }
    for flag, (e50, e90) in exact.items():
        for a, e in ((approx[flag][0], e50), (approx[flag][1], e90)):
            assert abs(a - e) / abs(e) < 0.01, (flag, a, e)
    rows = lineitem_percentiles_approx(spark, sf).collect()
    assert rows
    for r in rows:
        e50, e90 = exact[r["l_returnflag"]]
        # discrete exact sits within 1% of the interpolated exact here
        assert abs(r["p50_exact"] - e50) / e50 < 0.01
        assert abs(r["p90_exact"] - e90) / e90 < 0.01
        assert r["p50_exact"] <= r["p90_exact"]
        assert r["within_bound"] is True, r


def test_stratified_sample_proportions_and_determinism(spark):
    """Covers BOTH samplers: the md5-threshold universe sampler behind the
    driver query (content-deterministic), and the seeded-Bernoulli
    operator (seed-deterministic) at the same fractions."""
    import math

    import pyspark.sql.functions as F

    from firebase_etl_spark.operators.stats import stratified_sample
    from firebase_etl_spark.plans.queries_ext import events_stratified_sample
    from firebase_etl_spark.sources.tables import load_table

    rows1 = events_stratified_sample(spark, "/root/testdata/sf0.01").collect()
    rows2 = events_stratified_sample(spark, "/root/testdata/sf0.01").collect()
    assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]  # content-addressed
    fr = {"click": 0.1, "view": 0.05, "purchase": 1.0, "signup": 1.0, "error": 0.5}

    e = load_table(spark, "events", "/root/testdata/sf0.01")
    bern = dict(
        stratified_sample(e, "event_type", fr)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in rows1:
        want = fr[r["event_type"]]
        # tolerance: full strata are exact, others within 4 sigma
        for got in (
            r["n_sampled"] / r["n_total"],
            bern[r["event_type"]] / r["n_total"],
        ):
            if want == 1.0:
                assert got == 1.0
            else:
                sigma = math.sqrt(want * (1 - want) / r["n_total"])
                assert abs(got - want) < 4 * sigma, (r["event_type"], got, want)


def test_count_min_overestimates_never_undercount(spark):
    """CMS guarantee: estimate >= exact for every probe, equality when
    a value's counters see no collisions (forced by a wide sketch)."""
    from firebase_etl_spark.operators.heavy_hitters import (
        count_min_report,
    )

    rows = [(v,) for v in ["x"] * 50 + ["y"] * 30 + ["z"] * 20]
    df = spark.createDataFrame(rows, "token string")
    got = {
        r["value"]: r
        for r in count_min_report(
            df, "token", ["x", "y", "missing"], width=1024, depth=4
        ).collect()
    }
    assert got["x"]["n_exact"] == 50 and got["y"]["n_exact"] == 30
    assert got["missing"]["n_exact"] == 0
    for r in got.values():
        assert r["overestimate"] >= 0
        assert r["cms_estimate"] >= r["n_exact"]
    # 3 distinct values in 1024*4 counters: no collisions possible to
    # survive the min, so the estimates are exact
    assert all(r["overestimate"] == 0 for r in got.values())


def test_kmv_set_ops_small_sets_are_exact(spark):
    """Sets smaller than k degrade to exact counting by construction:
    every estimate equals the true distinct count, union and
    intersection included."""
    from firebase_etl_spark.operators.heavy_hitters import (
        kmv_set_ops_report,
    )

    rows = (
        [("A", i) for i in range(20)]            # users 0..19
        + [("B", i) for i in range(10, 40)]      # users 10..39
        + [("A", i) for i in range(5)]           # repeats don't count
    )
    df = spark.createDataFrame(rows, "g string, uid long")
    out = kmv_set_ops_report(df, "g", "uid", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["ga"], r["gb"]) == ("A", "B")
    assert r["est_users_a"] == 20 and r["est_users_b"] == 30
    assert r["est_union"] == 40
    assert r["est_intersection"] == 10 == r["exact_intersection"]


def test_kmv_set_ops_estimates_within_theory_bound(spark):
    """Above k the estimates are sketches: relative error of the
    bottom-k estimator is ~1/sqrt(k-2) per side; assert a generous
    4-sigma envelope on distinct/union and absolute slack on the
    intersection (its variance compounds both estimators)."""
    from firebase_etl_spark.operators.heavy_hitters import (
        kmv_set_ops_report,
    )

    na, nb, shared = 800, 600, 200
    rows = (
        [("A", i) for i in range(na)]
        + [("B", i) for i in range(na - shared, na - shared + nb)]
    )
    df = spark.createDataFrame(rows, "g string, uid long")
    r = kmv_set_ops_report(df, "g", "uid", k=64).collect()[0]
    tol = 4.0 / (62.0 ** 0.5)  # 4 sigma at k=64
    assert abs(r["est_users_a"] - na) <= tol * na
    assert abs(r["est_users_b"] - nb) <= tol * nb
    union = na + nb - shared
    assert abs(r["est_union"] - union) <= tol * union
    assert r["exact_intersection"] == shared
    # intersection: Jaccard-estimator slack (c/k resolution ~ union/k
    # per count step, plus the union estimator's own error)
    assert abs(r["est_intersection"] - shared) <= tol * union + union / 64


def test_count_min_probe_join_broadcasts_sketch_side(spark):
    """ADVICE r6: Spark ignores a broadcast hint on the PRESERVED side
    of a LEFT OUTER join, so hinting the probes fell back to a shuffle
    join. The depth*width sketch is the build side — the plan must show
    a broadcast join, not a SortMergeJoin."""
    from firebase_etl_spark.operators.heavy_hitters import (
        count_min_report,
    )

    df = spark.createDataFrame(
        [(v,) for v in ["x"] * 9 + ["y"] * 6], "token string"
    )
    out = count_min_report(df, "token", ["x", "y"], width=64, depth=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, plan
    assert "SortMergeJoin" not in plan, plan
