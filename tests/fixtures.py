"""Deterministic messy raw_users fixture per FIXTURES.md §1.

Built driver-side as a list of dicts (small, test-only) and loaded with the
explicit RAW_USER_SCHEMA — the messiness lives in string values, exactly the
input domain the reference parsers accept.
"""

from __future__ import annotations

import random

from firebase_etl_spark.schemas import AUTH_USER_SCHEMA, RAW_USER_SCHEMA

_STATUSES = [
    "ACTIVE", "actif", "ENABLED", "Inactive", "INACTIF", "disabled",
    "BANNED", "banni", "blocked", "garbage", None,
]
_DT_VARIANTS = [
    "1990-05-01", "1990-05-01 10:00:00", "1990-05-01T10:00:00",
    "1990-05-01T10:00:00.123456", "1990-05-01T10:00:00Z",
    "768132000", "768132000000", "NaT", "nan", None,
]
_NULLY = [None, "", "nan", "null", "None", "  "]


def make_raw_users(spark, n=300, seed=42, dup_frac=0.15):
    rng = random.Random(seed)
    rows = []
    n_dup_groups = max(1, int(n * dup_frac / 3))
    dup_emails = [f"dup{g}@example.com" for g in range(n_dup_groups)]
    for i in range(n):
        uid = f"uid{i:020d}"
        email = f"user{i}@example.com"
        r = rng.random()
        if r < 0.15:
            email = rng.choice(_NULLY)
        elif r < 0.35:
            email = rng.choice(dup_emails)
        created = f"2024-01-{(i % 28) + 1:02d} 12:{i % 60:02d}:00"
        if rng.random() < 0.08:
            created = rng.choice(["NaT", "nan", None, "768132000", "1705316400000"])
        alt = rng.random() < 0.1
        row = {
            "id": None if rng.random() < 0.03 else uid,
            "uid": uid,
            "email": email,
            "emailVerified": rng.choice(["true", "false", "True", "1", "0", None]),
            "name": None if rng.random() < 0.2 else f"User {i}",
            "displayName": f"Display {i}" if rng.random() < 0.3 else None,
            "password": None,
            "provider": rng.choice([None, "CREDENTIALS", "google.com"]),
            "phoneVerified": rng.choice(["true", "false", None]),
            "city": rng.choice(["Paris", "Lyon", "nan", "", None]),
            "status": rng.choice(_STATUSES),
            "interests": rng.choice(
                ["music, sports", "art", "", "nan", None, "a,b , c"]
            ),
            "following": None,
        }
        if alt:
            row["created_at"] = created
            row["updated_at"] = created
            row["birth_date"] = rng.choice(_DT_VARIANTS)
            row["profile_pic"] = f"http://pic/{i}"
            row["phone_number"] = f"+3360000{i:04d}"
            row["photoURL"] = f"http://photo/{i}"
            row["last_connexion"] = rng.choice(_DT_VARIANTS)
        else:
            row["createdAt"] = created
            row["updatedAt"] = created
            row["birthDate"] = rng.choice(_DT_VARIANTS)
            row["profilePic"] = f"http://pic/{i}"
            row["phoneNumber"] = f"+3360000{i:04d}"
            row["photo"] = f"http://photo/{i}"
            row["lastConnexion"] = rng.choice(_DT_VARIANTS)
        rows.append({f.name: row.get(f.name) for f in RAW_USER_SCHEMA.fields})
    return spark.createDataFrame(rows, RAW_USER_SCHEMA)


def make_auth_users(spark, n=300, seed=43, coverage=0.6):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if rng.random() > coverage:
            continue
        providers = rng.choice(
            [["password"], ["google.com"], ["password", "google.com"], ["facebook.com"]]
        )
        rows.append(
            {
                "uid": f"uid{i:020d}",
                "email": f"auth{i}@example.com" if rng.random() < 0.7 else None,
                "email_verified": rng.random() < 0.5,
                "provider_ids": providers,
            }
        )
    return spark.createDataFrame(rows, AUTH_USER_SCHEMA)
