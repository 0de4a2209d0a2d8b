"""Bit-identity contract of the portable (libm-free) ln.

The whole point of functions/portable_math.py is that Spark and DuckDB
produce the SAME 64-bit double for ln of the same integer — JVM
``Math.log`` vs DuckDB ``ln`` may differ by one ulp, which flipped the
DSIR fixed-point BIGINT on the driver host in rounds 4 and 5. These
tests pin (a) exact cross-engine bit equality over a dense + adversarial
integer sample, (b) closeness to the true ln, and (c) the DSIR rounding
pipeline end-to-end on engineered near-boundary count tables.
"""

from __future__ import annotations

import math
import struct

import duckdb
import pytest

from pyspark.sql import functions as F

from firebase_etl_spark.functions.portable_math import (
    exp2_select_sql,
    ln_select_sql,
    ln_steps,
    lr_e6_expr,
    with_exp2,
    with_ln,
)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


# dense small range (where Zipf mass lives), near-power-of-two
# adversaries (range-reduction branch edges), and large magnitudes
CASES = (
    list(range(1, 600))
    + [2**k + d for k in range(9, 62, 4) for d in (-1, 0, 1)]
    + [10**k for k in range(1, 18)]
    + [3**k for k in range(1, 38)]
    + [(1 << 60) - 7, (1 << 60), 2**62, 2**62 + 1023]
)


def test_ln_bit_identical_across_engines(spark):
    df = spark.createDataFrame([(int(v),) for v in CASES], "k long")
    srows = {r["k"]: r["lnk"] for r in with_ln(df, "k", "lnk").collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({v})" for v in CASES)
        + ") AS t(k)"
    )
    q = ln_select_sql("SELECT k FROM t", [("k", "lnk")])
    drows = dict(con.execute(f"SELECT k, lnk FROM ({q})").fetchall())

    diffs = [
        v for v in CASES if _bits(srows[v]) != _bits(drows[v])
    ]
    assert diffs == [], f"cross-engine bit mismatch at {diffs[:5]}"


def test_ln_accuracy_vs_math_log(spark):
    df = spark.createDataFrame([(int(v),) for v in CASES], "k long")
    for r in with_ln(df, "k", "lnk").collect():
        true = math.log(r["k"])
        assert abs(r["lnk"] - true) <= 5e-14 * max(1.0, abs(true)), (
            r["k"],
            r["lnk"],
            true,
        )


def test_ln_steps_shared_strings():
    # the Spark plan and the oracle SQL must evaluate the SAME
    # expression tree: both consume ln_steps verbatim
    steps = ln_steps("(c + 1)", "lnc")
    assert steps[-1][0] == "lnc"
    joined = " ".join(e for _, e in steps)
    assert "ln(" not in joined and "log(" not in joined.lower()
    # every constant rides in as a parsed string literal, never a bare
    # decimal (which both parsers type as DECIMAL)
    assert "CAST('" in joined


def test_dsir_rounding_pipeline_cross_engine(spark):
    # engineered count table exercising the full lr_e6 pipeline: many
    # (c_tgt, c_src) combos against fixed denominators, compared as the
    # FINAL BIGINTs — the quantity the driver hashes
    combos = [
        (ct, cs)
        for ct in [0, 1, 2, 3, 5, 10, 99, 1000, 54321]
        for cs in [1, 2, 3, 7, 50, 999, 12345, 999983]
        if ct <= cs
    ]
    dt, ds = 1234577, 98765431
    df = spark.createDataFrame(
        [(i, ct, cs) for i, (ct, cs) in enumerate(combos)],
        "i long, c_tgt long, c_src long",
    )
    rt = with_ln(df, "(c_tgt + 1)", "__lnct")
    rt = with_ln(rt, "(c_src + 1)", "__lncs")
    rt = with_ln(rt, str(dt), "__lndt")
    rt = with_ln(rt, str(ds), "__lnds")
    expr = lr_e6_expr("__lnct", "__lndt", "__lncs", "__lnds")
    srows = {
        r["i"]: r["lr"]
        for r in rt.select("i", F.expr(expr).alias("lr")).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE c AS SELECT * FROM (VALUES "
        + ",".join(f"({i},{ct},{cs})" for i, (ct, cs) in enumerate(combos))
        + ") AS t(i, c_tgt, c_src)"
    )
    chain = ln_select_sql(
        "SELECT i, c_tgt, c_src FROM c",
        [
            ("(c_tgt + 1)", "__lnct"),
            ("(c_src + 1)", "__lncs"),
            (str(dt), "__lndt"),
            (str(ds), "__lnds"),
        ],
    )
    drows = dict(
        con.execute(f"SELECT i, {expr} AS lr FROM ({chain})").fetchall()
    )
    assert srows == drows


def test_partition_invariance(spark):
    # integer-argument ln is a pure projection: the result must not
    # depend on partitioning (trivially true, pinned anyway because the
    # r4/r5 flake history makes this operator's determinism load-bearing)
    vals = [(v,) for v in range(1, 2000)]
    a = {
        r["k"]: r["lnk"]
        for r in with_ln(
            spark.createDataFrame(vals, "k long").repartition(1), "k", "lnk"
        ).collect()
    }
    b = {
        r["k"]: r["lnk"]
        for r in with_ln(
            spark.createDataFrame(vals, "k long").repartition(17), "k", "lnk"
        ).collect()
    }
    assert all(_bits(a[k]) == _bits(b[k]) for k in a)


EXP2_CASES = (
    [0.0, 1.0, -1.0, 0.5, -0.5, 63.0, -63.9, -64.0, -70.0]
    + [k / 7.0 for k in range(-300, 301, 11)]
    + [-(d / 604800000000.0) for d in (0, 1, 999983, 86400000000,
                                       604800000000, 2**40 + 12345)]
)


def test_exp2_bit_identical_across_engines(spark):
    df = spark.createDataFrame([(float(v),) for v in EXP2_CASES],
                               "x double")
    srows = {
        round(r["x"], 12): r["y"]
        for r in with_exp2(df, "x", "y").collect()
    }
    con = duckdb.connect()
    # feed doubles, not bare literals — DuckDB types a 17-digit bare
    # literal DECIMAL(17,16), which is NOT the same value as the double
    # Spark holds (real oracles only ever feed DOUBLE columns here)
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"(CAST('{v!r}' AS DOUBLE))" for v in EXP2_CASES)
        + ") AS t(x)"
    )
    q = exp2_select_sql("SELECT x FROM t", [("x", "y")])
    drows = {
        round(k, 12): v
        for k, v in con.execute(f"SELECT x, y FROM ({q})").fetchall()
    }
    diffs = [
        v
        for v in EXP2_CASES
        if _bits(srows[round(v, 12)]) != _bits(drows[round(v, 12)])
    ]
    assert diffs == [], f"cross-engine bit mismatch at {diffs[:5]}"


def test_exp2_accuracy_and_underflow(spark):
    df = spark.createDataFrame([(float(v),) for v in EXP2_CASES],
                               "x double")
    for r in with_exp2(df, "x", "y").collect():
        if r["x"] <= -64.0:
            assert r["y"] == 0.0
        else:
            true = 2.0 ** r["x"]
            assert abs(r["y"] - true) <= 5e-14 * true, (r["x"], r["y"])


def test_exp2_overflow_side_is_loud(spark):
    """ADVICE r6: arg >= 64 is out of contract — it must surface as
    +Infinity (loud downstream), never a silent 0.0. Both engines."""
    cases = [64.0, 64.5, 100.0, 1e6]
    df = spark.createDataFrame([(v,) for v in cases], "x double")
    for r in with_exp2(df, "x", "y").collect():
        assert math.isinf(r["y"]) and r["y"] > 0, (r["x"], r["y"])
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"(CAST('{v!r}' AS DOUBLE))" for v in cases)
        + ") AS t(x)"
    )
    q = exp2_select_sql("SELECT x FROM t", [("x", "y")])
    for _, y in con.execute(f"SELECT x, y FROM ({q})").fetchall():
        assert math.isinf(y) and y > 0


def test_ln_rejects_nothing_but_documents_edge(spark):
    # degenerate arg 0 (empty-corpus constant fold) must not raise —
    # the consuming plan is empty so the value itself is unused
    df = spark.range(1).select(F.lit(0).alias("k"))
    out = with_ln(df, "k", "lnk").collect()
    assert len(out) == 1 and math.isfinite(out[0]["lnk"])


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
