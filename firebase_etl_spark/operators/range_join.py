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
    span = before_seconds + after_seconds
    granule = granule_seconds or max(span, 1)

    l_epoch = F.col(left_time).cast("long")
    r_epoch = F.col(right_time).cast("long")

    # left row explodes into every bucket its interval touches
    l_bucketed = left.withColumn(
        "__lb",
        F.explode(
            F.sequence(
                F.floor((l_epoch - before_seconds) / granule).cast("long"),
                F.floor((l_epoch + after_seconds) / granule).cast("long"),
            )
        ),
    )
    r_bucketed = right.withColumn("__rb", F.floor(r_epoch / granule).cast("long"))

    joined = l_bucketed.join(
        r_bucketed,
        (F.col(left_on) == F.col(right_on)) & (F.col("__lb") == F.col("__rb")),
    ).drop("__lb", "__rb")
    return joined.filter(
        (r_epoch >= l_epoch - before_seconds) & (r_epoch <= l_epoch + after_seconds)
    )
