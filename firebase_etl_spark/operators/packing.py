"""Sequence packing — laying a token stream of documents into fixed-width
training sequences (context windows), the final assembly step of an LLM
data pipeline (extension beyond the reference).

The packing model is contiguous fill: documents in a deterministic global
order occupy consecutive token offsets; sequence i is the token interval
[i*ctx, (i+1)*ctx). A document whose interval crosses a boundary is split
across sequences (standard packed-pretraining with cross-doc attention
masking), so the interesting outputs are each doc's starting offset, its
first/last sequence, and whether it got split.

Scale shape — the reason this operator exists: the naive formulation is
``sum(n_toks) over (order by doc_id)``, a GLOBAL-order window, which
Spark executes on a single partition — the classic scale trap. Instead
the global prefix sum is two-phase, the same way MPP engines do it:

  1. range-partition by the order key (contiguous key ranges per
     partition) and cache, so the partitioning is frozen for both reads;
  2. one tiny job collects per-partition token totals (#partitions rows,
     same driver-sized pull as a broadcast-join decision);
  3. exclusive partition offsets broadcast back; each doc's global
     offset = partition offset + within-partition running sum (a window
     PARTITIONED BY the partition id — parallel, not global).

Everything downstream of the offsets is arithmetic, so a DuckDB oracle
replays the whole plan with the single-window formulation and must agree
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from firebase_etl_spark.operators.text import token_count


def packed_spans(
    df: DataFrame,
    ctx_len: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int = 32,
) -> DataFrame:
    """(id, n_toks, start_off, start_seq, end_seq, is_split) for every doc,
    packing in ascending ``id_col`` order. Offsets are 0-based token
    positions in the concatenated stream; seq = offset // ctx_len."""
    toks = df.select(F.col(id_col), token_count(text_col).alias("n_toks"))
    # freeze a contiguous-range partitioning: both the totals job and the
    # main job must see the SAME partition boundaries, so cache the
    # shuffled result before reading it twice
    t = (
        toks.repartitionByRange(n_parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        totals = sorted(
            t.groupBy("__pid").agg(F.sum("n_toks").alias("s")).collect(),
            key=lambda r: r["__pid"],
        )
        offsets, acc = [], 0
        for r in totals:
            offsets.append((r["__pid"], acc))
            acc += r["s"]
        # broadcast-join the exclusive offsets back rather than inlining a
        # create_map literal: a literal grows with the partition count and
        # bloats the plan at thousands of partitions, while the join stays
        # a constant-size broadcast of (#partitions) rows
        off_df = t.sparkSession.createDataFrame(
            offsets or [(0, 0)], "__pid int, __off long"
        )
        w = Window.partitionBy("__pid").orderBy(id_col)
        running = F.sum("n_toks").over(w)  # inclusive, within partition
        start = (F.col("__off") + running - F.col("n_toks")).alias("start_off")
        # integer DIV, not float division: token offsets are longs and must
        # stay exact past 2^53 at real corpus sizes
        out = t.join(F.broadcast(off_df), "__pid").select(
            F.col(id_col), "n_toks", start
        ).select(
            F.col(id_col),
            "n_toks",
            "start_off",
            F.expr(f"start_off DIV {ctx_len}").alias("start_seq"),
            F.expr(f"(start_off + n_toks - 1) DIV {ctx_len}").alias("end_seq"),
        ).withColumn("is_split", F.col("end_seq") > F.col("start_seq"))
        out = out.localCheckpoint(eager=True)
    finally:
        t.unpersist()
    return out
