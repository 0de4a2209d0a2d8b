"""End-to-end user ETL: the reference's main pipeline as ONE lazy plan.

Parity target: reference main.py:18-204 (extract -> validate -> transform ->
dedup -> conflict-resolve -> load -> stats), re-expressed as a declarative
DataFrame chain. Catalyst sees the whole plan per stage boundary: column
pruning reaches the source scan, the Auth join broadcasts, dedup is one
window shuffle, conflict resolution is an anti-join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from firebase_etl_spark.functions.cleaning import clean_string, to_bool
from firebase_etl_spark.functions.identity import (
    SPELLING_ALTERNATES,
    coalesce_spellings,
    placeholder_email,
    repair_id,
    resolve_provider_and_email,
)
from firebase_etl_spark.functions.arrays import parse_interests
from firebase_etl_spark.functions.status import normalize_status
from firebase_etl_spark.functions.timestamps import parse_datetime, parse_datetime_or_now
from firebase_etl_spark.operators.dedup import dedup_keep_latest
from firebase_etl_spark.operators.validate import ValidationResult, validate_users


@dataclass
class TransformResult:
    users: DataFrame          # canonical schema, deduplicated
    quarantine: DataFrame     # rows failing validation, with reasons


def transform_users(raw: DataFrame, auth: DataFrame | None = None) -> TransformResult:
    """Messy raw extract -> canonical typed users (reference
    user_transformer.transform_users_dataframe, user_transformer.py:394-441).

    Stages (all one lazy plan until the validation split):
      1. id repair (V2), provider/email resolution via broadcast Auth join (J1/P3)
      2. scalar cleaning + alternate-spelling coalesce (F2, F7)
      3. typed parsing: datetimes (F3/F8), interests (F5), status (F6), bools (F12)
      4. placeholder email for email-less google users (F9)
      5. dedup keep-latest-per-email (§2.10)
      6. validation split (V4)
    """
    df = raw
    if auth is not None:
        df = resolve_provider_and_email(df, auth)
    else:
        df = (
            df.withColumn(
                "provider",
                F.coalesce(clean_string(F.col("provider")), F.lit("CREDENTIALS")),
            )
            .withColumn("email", clean_string(F.col("email")))
            .withColumn("hasEmail", F.col("email").isNotNull())
        )

    df = df.withColumn("id", repair_id()).withColumn("uid", clean_string(F.col("uid")))

    # placeholder email for google users without one (F9); others with no
    # email stay NULL and fall to quarantine (reference user_transformer.py:350-359)
    df = df.withColumn(
        "email",
        F.when(
            F.col("email").isNull() & (F.col("provider") == "google.com"),
            placeholder_email(),
        ).otherwise(F.col("email")),
    )

    canonical = df.select(
        F.col("id"),
        F.col("email"),
        to_bool("emailVerified").alias("emailVerified"),
        clean_string(F.col("password")).alias("password"),
        F.col("uid"),
        F.col("provider"),
        coalesce_spellings(df, "profilePic").alias("profilePic"),
        coalesce_spellings(df, "phoneNumber").alias("phoneNumber"),
        to_bool("phoneVerified").alias("phoneVerified"),
        coalesce_spellings(df, "name").alias("name"),
        clean_string(F.col("city")).alias("city"),
        parse_datetime(coalesce_spellings(df, "birthdate")).alias("birthdate"),
        coalesce_spellings(df, "photo").alias("photo"),
        parse_datetime_or_now(coalesce_spellings(df, "createdAt")).alias("createdAt"),
        parse_datetime_or_now(coalesce_spellings(df, "updatedAt")).alias("updatedAt"),
        normalize_status(F.col("status")).alias("status"),
        parse_interests(F.col("interests")).alias("interests"),
        parse_datetime(coalesce_spellings(df, "lastConnexion")).alias("lastConnexion"),
        # adjacency map (test.py:16): JSON '{"uid": true}' -> map<string,boolean>
        F.from_json(F.col("following"), "map<string,boolean>").alias("following"),
    )

    result: ValidationResult = validate_users(canonical)
    deduped = dedup_keep_latest(
        result.valid, key="email", order_col="createdAt", tiebreaker="id", keep="last"
    )
    return TransformResult(users=deduped, quarantine=result.quarantine)
