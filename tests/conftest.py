from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebase_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(
        app_name="tests",
        shuffle_partitions=8,
        # keep every tiny test stage at the session's full width: the
        # prod default floor (cores/4 = 2 here) serializes the suite's
        # CPU-heavy Python stages (dsir partition-invariance ran 10x
        # longer at floor 2); tests assert semantics, not partition
        # sizing, and the prod conf is exercised by the virgin-session
        # contract test
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.minPartitionNum": "8"
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def driver_query_runs(spark):
    """ONE construction+collect pass over every declared query at the
    test SF, shared by the oracle-match and scale-guard sweeps (each
    used to pay its own full pass — the two slowest fixtures in the
    suite). Batch queries run CONCURRENTLY from a thread pool (Spark
    interleaves jobs from submitter threads — the same shape bench.py's
    warmup uses); stream queries run sequentially first because a
    bounded drive temporarily rewrites session confs and must not race.

    Returns {name: (scale_violations, spark_columns, rows, error)}."""
    import sys as _sys
    from concurrent.futures import ThreadPoolExecutor

    _sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entrymod
    from firebase_etl_spark.plans.guards import scale_violations

    qs = entrymod.queries()

    def one(name):
        try:
            df = qs[name](spark, SF_DIR)
            violations = scale_violations(df)
            rows = [tuple(r) for r in df.collect()]
            return (violations, df.columns, rows, None)
        except Exception as exc:
            return (None, None, None, exc)

    names = sorted(qs)
    stream = [n for n in names if n.startswith("stream_")]
    batch = [n for n in names if not n.startswith("stream_")]
    out = {n: one(n) for n in stream}
    with ThreadPoolExecutor(max_workers=16) as pool:
        out.update(zip(batch, pool.map(one, batch)))
    return out
