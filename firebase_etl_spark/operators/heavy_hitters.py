"""Misra-Gries heavy hitters — a hand-built mergeable sketch (Misra &
Gries 1982; mergeability per Agarwal et al. 2012, "Mergeable
Summaries"), complementing the built-in HLL++/KLL sketches used by the
approx-distinct and approx-percentile queries.

Per-partition summaries of at most ``k_counters`` (value, est) pairs are
computed in one Arrow-batched pass (mapInPandas — the loop is over
DISTINCT values per record batch via value_counts, never per row), then
merged by plain counter addition. The merged estimate obeys the
standard deterministic bound

    exact(v) - n/k  <=  est(v)  <=  exact(v)

(each partition's undercount is at most n_p/k and the undercounts sum),
which is what makes the operator DRIVER-VERIFIABLE despite the sketch
itself being partitioning-dependent: the emitted columns are the exact
top counts plus a ``within_bound`` boolean derived from the (varying)
estimate — the boolean is mathematically guaranteed TRUE, so the DuckDB
oracle replays the exact side and the literal, the same self-verifying
treatment as the HLL/KLL queries.

Scale shape: one corpus pass (mapInPandas), a k-sized-per-partition
merge aggregate, and the exact top-k aggregate it is checked against;
at 100 TB you would keep ONLY the sketch pass — the exact twin here is
the verification harness, not the production path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters_report(
    df: DataFrame,
    value_col: str,
    k_counters: int = 64,
    top: int = 5,
) -> DataFrame:
    """(value, n_exact, within_bound) for the ``top`` most frequent
    ``value_col`` values (ties to the lower value; rank is derivable
    from n_exact, and emitting it would cost a global-order window the
    scale lint rightly rejects); within_bound pins the merged
    Misra-Gries estimate inside [n_exact - n_total/k, n_exact]."""
    import pandas as pd

    src = df.select(F.col(value_col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    n_total = src.count()
    if not n_total:
        return df.sparkSession.createDataFrame(
            [], "value string, n_exact bigint, within_bound boolean"
        )

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            # distinct-values loop per Arrow batch, not per row
            for v, c in pdf["v"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
                if len(counters) > k_counters:
                    dec = min(counters.values())
                    counters = {
                        x: n - dec for x, n in counters.items() if n > dec
                    }
        yield pd.DataFrame(
            {"v": list(counters), "est": list(counters.values())}
        )

    sketch = src.mapInPandas(mg, "v string, est long").groupBy("v").agg(
        F.sum("est").alias("est")
    )
    exact = src.groupBy("v").agg(F.count(F.lit(1)).alias("n_exact"))
    topk = exact.orderBy(F.desc("n_exact"), "v").limit(top)
    bound = F.lit(int(n_total)) / F.lit(float(k_counters))
    return (
        topk.join(sketch, "v", "left")
        .select(
            F.col("v").alias("value"),
            "n_exact",
            (
                (F.coalesce("est", F.lit(0)) <= F.col("n_exact"))
                & (
                    F.coalesce("est", F.lit(0))
                    >= F.col("n_exact") - bound
                )
            ).alias("within_bound"),
        )
        .orderBy(F.desc("n_exact"), "value")
    )


def count_min_report(
    df: DataFrame,
    value_col: str,
    probe_values: list[str],
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch point queries (Cormode & Muthukrishnan 2005) —
    the frequency-estimation sketch completing the family next to HLL
    (distinct), KLL/GK (quantiles) and Misra-Gries (heavy hitters):
    ``depth`` hash rows of ``width`` counters, point estimate = min
    over rows, guaranteed est >= exact with E[overestimate] <= N/width
    per row. Returns per probe value: (value, n_exact, cms_estimate,
    overestimate) — overestimate >= 0 always, and the DuckDB oracle
    replays the ENTIRE sketch (md5 row hashes are engine-portable), so
    every column is hash-checked exactly, not bounded.

    Scale shape: the corpus collapses to the (distinct value, count)
    table FIRST (one map-side-combinable pass); the depth-way explode
    runs over that vocabulary-sized table, never the corpus; the sketch
    itself is (depth x width) counters — mergeable across batches by
    addition, the property that makes CMS the streaming-frequency
    workhorse. Probes join the counter table on (row, col), a
    broadcast-sized lookup."""
    src = df.select(F.col(value_col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    counts = src.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    rows = counts.select(
        "v",
        "c",
        F.explode(
            F.sequence(F.lit(0), F.lit(depth - 1))
        ).alias("r"),
    ).select(
        "c",
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cms"),
                            F.col("r").cast("string"),
                            F.lit("|"),
                            F.col("v"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % width
        ).alias("col"),
    )
    sketch = rows.groupBy("r", "col").agg(F.sum("c").alias("cnt"))
    probes = (
        df.sparkSession.createDataFrame(
            [(str(p),) for p in probe_values], "value string"
        )
        .select(
            "value",
            F.explode(
                F.sequence(F.lit(0), F.lit(depth - 1))
            ).alias("r"),
        )
        .select(
            "value",
            "r",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("cms"),
                                F.col("r").cast("string"),
                                F.lit("|"),
                                F.col("value"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % width
            ).alias("col"),
        )
    )
    # broadcast the SKETCH side: Spark cannot broadcast the preserved
    # (left) side of a LEFT OUTER join, so hinting the probes was a
    # silent shuffle-join fallback; the sketch is depth*width rows —
    # the actual broadcast-sized lookup table (ADVICE r6)
    est = (
        probes.join(F.broadcast(sketch), ["r", "col"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )
    exact = counts.filter(
        F.col("v").isin([str(p) for p in probe_values])
    ).select(F.col("v").alias("value"), F.col("c").alias("n_exact"))
    # exact is probe-sized (a filtered slice of the count table): also
    # a broadcast lookup, never a shuffle
    return (
        est.join(F.broadcast(exact), "value", "left")
        .select(
            "value",
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            "cms_estimate",
            (
                F.col("cms_estimate")
                - F.coalesce("n_exact", F.lit(0))
            ).alias("overestimate"),
        )
        .orderBy("value")
    )
