from firebase_etl_spark.functions.cleaning import (
    clean_string,
    mask_email,
    to_bool,
    with_default,
)
from firebase_etl_spark.functions.timestamps import parse_datetime, parse_datetime_or_now
from firebase_etl_spark.functions.arrays import parse_interests, pg_array_literal
from firebase_etl_spark.functions.status import normalize_status
from firebase_etl_spark.functions.identity import (
    coalesce_spellings,
    placeholder_email,
    repair_id,
    resolve_provider_and_email,
    uuid20,
)

__all__ = [
    "clean_string",
    "mask_email",
    "to_bool",
    "with_default",
    "parse_datetime",
    "parse_datetime_or_now",
    "parse_interests",
    "pg_array_literal",
    "normalize_status",
    "coalesce_spellings",
    "placeholder_email",
    "repair_id",
    "resolve_provider_and_email",
    "uuid20",
]
