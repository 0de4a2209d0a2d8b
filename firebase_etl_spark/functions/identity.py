"""Identity/derivation columns: alternate-spelling coalesce, id repair,
uuid generation, provider/email resolution.

Parity targets:
- coalesce_spellings        ⇔ reference user_transformer.py:335-346
- uuid20 / repair_id        ⇔ reference main.py:9-16,67-69; user_transformer.py:356
- placeholder_email         ⇔ reference user_transformer.py:350-352
- resolve_provider_and_email ⇔ reference firebase_service.py:54-108
  (the N+1 per-row Auth RPC becomes a broadcast left join + when-chain)

NOTE on F7 semantics: Python's ``x or y`` also skips '' (falsy); Spark's
``coalesce`` skips only NULL. The engine therefore requires clean_string to
run first (empty-string -> NULL) — pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from firebase_etl_spark.functions.cleaning import clean_string

#: canonical field -> alternate spellings, in coalesce order
#: (reference user_transformer.py:335-346).
SPELLING_ALTERNATES = {
    "name": ("name", "displayName"),
    "profilePic": ("profilePic", "profile_pic"),
    "phoneNumber": ("phoneNumber", "phone_number"),
    "birthdate": ("birthDate", "birth_date"),
    "photo": ("photo", "photoURL"),
    "createdAt": ("createdAt", "created_at"),
    "updatedAt": ("updatedAt", "updated_at"),
    "lastConnexion": ("lastConnexion", "last_connexion"),
}


def coalesce_spellings(df: DataFrame, field: str, clean: bool = True) -> Column:
    """First non-null among a field's alternate spellings (only the spellings
    actually present in ``df``). ``clean`` applies empty-string->NULL first so
    coalesce matches Python truthiness semantics."""
    names = [n for n in SPELLING_ALTERNATES.get(field, (field,)) if n in df.columns]
    if not names:
        return F.lit(None).cast("string")
    cols = [clean_string(F.col(n)) if clean else F.col(n) for n in names]
    return F.coalesce(*cols) if len(cols) > 1 else cols[0]


def uuid20() -> Column:
    """20-char random id (uuid4 prefix)."""
    return F.expr("substring(uuid(), 1, 20)")


def repair_id(id_col: Column | str = "id", uid_col: Column | str = "uid") -> Column:
    """Missing-id repair: id -> uid -> fresh uuid20 (reference main.py:67-69)."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    u = F.col(uid_col) if isinstance(uid_col, str) else uid_col
    return F.coalesce(clean_string(i), clean_string(u), uuid20())


def placeholder_email(uid_col: Column | str = "uid") -> Column:
    """Synthetic email for email-less google users
    (``google_user_<uid>@placeholder.com``)."""
    u = F.col(uid_col) if isinstance(uid_col, str) else uid_col
    return F.format_string(
        "google_user_%s@placeholder.com", F.coalesce(u, F.lit("unknown"))
    )


def resolve_provider_and_email(
    users: DataFrame,
    auth: DataFrame,
    uid_col: str = "uid",
    email_col: str = "email",
) -> DataFrame:
    """Provider/email resolution as a broadcast left-outer join (J1 + P3/P4).

    Three-way rule (reference firebase_service.py:62-106):
      1. user has an email in the source DB        -> provider CREDENTIALS
      2. else email found in Auth: google.com in provider_ids -> google.com,
         otherwise CREDENTIALS; email taken from Auth
      3. else (no email anywhere)                  -> google.com

    Adds ``provider``, resolved ``email``, ``hasEmail``, ``authSource``.
    The Auth snapshot is a small dimension -> broadcast; at 100 TB of users
    this stays a map-side join with no shuffle of the big side.
    """
    a = auth.select(
        F.col(uid_col).alias("__auth_uid"),
        F.col("email").alias("__auth_email"),
        F.col("provider_ids").alias("__auth_providers"),
    )
    joined = users.join(
        F.broadcast(a), users[uid_col] == a["__auth_uid"], "left"
    ).drop("__auth_uid")

    db_email = clean_string(F.col(email_col))
    auth_email = clean_string(F.col("__auth_email"))
    has_google = F.coalesce(
        F.exists(F.col("__auth_providers"), lambda p: p == "google.com"), F.lit(False)
    )

    resolved_email = F.coalesce(db_email, auth_email)
    provider = (
        F.when(db_email.isNotNull(), "CREDENTIALS")
        .when(auth_email.isNotNull() & has_google, "google.com")
        .when(auth_email.isNotNull(), "CREDENTIALS")
        .otherwise("google.com")
    )
    auth_source = (
        F.when(db_email.isNotNull(), "database")
        .when(auth_email.isNotNull(), "auth")
        .otherwise("none")
    )
    return (
        joined.withColumn("provider", provider)
        .withColumn(email_col, resolved_email)
        .withColumn("hasEmail", resolved_email.isNotNull())
        .withColumn("authSource", auth_source)
        .drop("__auth_email", "__auth_providers")
    )
