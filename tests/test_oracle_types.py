"""Oracle output-type lint (VERDICT r7 #2).

The driver hashes TYPED values (Arrow): a DuckDB HUGEINT column (an
uncast ``sum()``) becomes decimal128 and hashes differently from
BIGINT even when every printed value is identical — the exact class
behind the r4-r7 ``documents_dsir_weights`` / ``user_conversion_survival``
reds, invisible to any string-based local compare. This test DESCRIBEs
every declared oracle against sf0.001 and fails on any final output
column outside the allowlist. Intermediates (CTEs) may be anything.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry  # noqa: E402
from tools.driver_sim import ALLOWED_ORACLE_TYPES  # noqa: E402

SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


_ORACLES = entry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_output_types_allowed(duck, name):
    desc = duck.execute(f"DESCRIBE {_ORACLES[name]}").fetchall()
    bad = [
        (cn, ct)
        for cn, ct, *_ in desc
        if ct not in ALLOWED_ORACLE_TYPES
    ]
    assert not bad, (
        f"{name}: forbidden oracle output types {bad} — uncast sums "
        f"(HUGEINT) hash as decimal128 on the driver; CAST to BIGINT"
    )


def test_every_query_has_oracle_or_is_documented():
    """All declared queries stay oracle-backed (r6 invariant)."""
    missing = set(entry.queries()) - set(_ORACLES)
    assert not missing, f"queries without oracles: {sorted(missing)}"
