"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at a small SF; compare row
count, sorted column names, and an order-insensitive value multiset.

Execution shape (r12): all ~315 comparisons are PRECOMPUTED once in a
module fixture — batch queries run CONCURRENTLY from a thread pool
(Spark's scheduler interleaves jobs from multiple submitter threads, so
the suite stops paying ~300 sequential job round-trips; guide §2.6),
each worker opening its own DuckDB connection. Streaming twins run
SEQUENTIALLY before the pool: a bounded drive temporarily rewrites
session confs (shuffle partitions, no-data interval) and names a memory
sink, so stream drives must never race other queries. The parametrized
test then just asserts its query's precomputed outcome — per-query
failure granularity is unchanged.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _duck(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    # every value becomes a string so mixed None/str/float tuples sort
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return str(round(v, 6))
    if isinstance(v, (list, tuple)):
        return str(tuple(_norm(x) for x in v))
    return str(v)


def _rowset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


ORACLES = entrymod.oracle_sql()


def _duck_side(name):
    """(duck_cols, duck_rows) or a captured error, per-thread connection."""
    try:
        con = _duck(SF_DIR)
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        finally:
            con.close()
        return (dcols, drows, None)
    except Exception as exc:  # surfaced by the query's own test below
        return (None, None, exc)


@pytest.fixture(scope="module")
def oracle_outcomes(driver_query_runs):
    """Spark side comes from the session-shared construction pass
    (conftest.driver_query_runs); only DuckDB runs here, concurrently."""
    from concurrent.futures import ThreadPoolExecutor

    names = sorted(ORACLES)
    with ThreadPoolExecutor(max_workers=8) as pool:
        duck = dict(zip(names, pool.map(_duck_side, names)))
    out = {}
    for n in names:
        _, scols, srows, serr = driver_query_runs[n]
        dcols, drows, derr = duck[n]
        out[n] = (scols, srows, dcols, drows, serr or derr)
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, oracle_outcomes):
    scols, srows, dcols, drows, err = oracle_outcomes[name]
    if err is not None:
        raise AssertionError(f"{name}: execution failed") from err

    assert sorted(scols) == sorted(dcols), f"{name}: columns differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _rowset(scols, srows) == _rowset(dcols, drows), f"{name}: values differ"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
