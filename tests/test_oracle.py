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


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _run_pair(name, spark):
    """(spark_cols, spark_rows, duck_cols, duck_rows) or a captured error."""
    try:
        sdf = QUERIES[name](spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        con = _duck(SF_DIR)
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        finally:
            con.close()
        return (scols, srows, dcols, drows, None)
    except Exception as exc:  # surfaced by the query's own test below
        return (None, None, None, None, exc)


@pytest.fixture(scope="module")
def oracle_outcomes(spark):
    from concurrent.futures import ThreadPoolExecutor

    names = sorted(ORACLES)
    stream = [n for n in names if n.startswith("stream_")]
    batch = [n for n in names if not n.startswith("stream_")]
    out = {}
    for n in stream:  # bounded drives rewrite session confs: never race
        out[n] = _run_pair(n, spark)
    with ThreadPoolExecutor(max_workers=8) as pool:
        out.update(
            zip(batch, pool.map(lambda n: _run_pair(n, spark), batch))
        )
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
