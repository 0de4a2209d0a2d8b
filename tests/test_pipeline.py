"""End-to-end pipeline test on the messy raw_users fixture (FIXTURES.md §1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from firebase_etl_spark.pipeline import transform_users
from tests.fixtures import make_auth_users, make_raw_users


def test_pipeline_end_to_end(spark):
    raw = make_raw_users(spark, n=300)
    res = transform_users(raw)
    users = res.users.cache()

    rows = users.collect()
    assert len(rows) > 0

    # one survivor per email
    emails = [r["email"] for r in rows]
    assert len(emails) == len(set(emails))
    assert all(e is not None for e in emails)

    # typed/normalized columns
    for r in rows:
        assert r["status"] in ("ACTIVE", "INACTIVE", "BANNED")
        assert r["createdAt"] is not None and r["updatedAt"] is not None
        assert isinstance(r["emailVerified"], bool)
        if r["interests"] is not None:
            assert all(i and i.strip() == i for i in r["interests"])

    # keep-latest: for a duplicated email, survivor has the max createdAt
    dup = (
        users.groupBy("email").count().filter("count > 1").collect()
    )
    assert dup == []  # already deduped

    # quarantine only carries rows with violations
    quar = res.quarantine.collect()
    for r in quar:
        assert len(r["violations"]) > 0


def test_pipeline_with_auth_join(spark):
    raw = make_raw_users(spark, n=200)
    auth = make_auth_users(spark, n=200)
    res = transform_users(raw, auth=auth)
    rows = res.users.collect()
    assert len(rows) > 0
    providers = {r["provider"] for r in rows}
    assert providers <= {"CREDENTIALS", "google.com"}
    # google users without a db/auth email got placeholder emails
    placeholders = [r for r in rows if r["email"].endswith("@placeholder.com")]
    for r in placeholders:
        assert r["provider"] == "google.com"
