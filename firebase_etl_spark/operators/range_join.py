"""Range (interval) join — bucketized so it scales.

Join left rows to right rows whose time lies within [t - before, t + after]
of the left time. A naive theta-join (l.t BETWEEN r.t - x AND r.t + y)
degenerates to a per-key cross join (Spark picks broadcast-nested-loop);
the scalable form buckets both sides by a granule of width >= the interval,
joins on (key, bucket) for the bucket and its neighbors, then applies the
exact range filter. Shuffle is a hash partition on (key, bucket); each row
lands in at most ceil(span/granule)+1 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    before_seconds: int,
    after_seconds: int,
    granule_seconds: int | None = None,
) -> DataFrame:
    """Inner range join: all (left, right) pairs with matching key and
    ``right_time`` in [left_time - before, left_time + after]. Returns all
    columns of both sides."""
    # microsecond precision: a whole-second cast would merge sub-second
    # boundary cases differently than timestamp-native engines (DuckDB
    # epoch_us); granule stays >= span so the bucket math is unchanged
    before_us = before_seconds * 1_000_000
    after_us = after_seconds * 1_000_000
    span_us = before_us + after_us
    granule_us = (granule_seconds or 0) * 1_000_000 or max(span_us, 1)

    l_epoch = F.unix_micros(F.col(left_time))
    r_epoch = F.unix_micros(F.col(right_time))

    # left row explodes into every bucket its interval touches
    l_bucketed = left.withColumn(
        "__lb",
        F.explode(
            F.sequence(
                F.floor((l_epoch - before_us) / granule_us).cast("long"),
                F.floor((l_epoch + after_us) / granule_us).cast("long"),
            )
        ),
    )
    r_bucketed = right.withColumn("__rb", F.floor(r_epoch / granule_us).cast("long"))

    joined = l_bucketed.join(
        r_bucketed,
        (F.col(left_on) == F.col(right_on)) & (F.col("__lb") == F.col("__rb")),
    ).drop("__lb", "__rb")
    return joined.filter(
        (r_epoch >= l_epoch - before_us) & (r_epoch <= l_epoch + after_us)
    )
