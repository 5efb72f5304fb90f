"""Incremental edge maintenance over a growing transcript directory —
Structured Streaming promoted from SURVEY §2.5's round-1 non-goal to a
real capability in round 2 (transcript logs in production arrive
continuously; the contract's static snapshot is just the time-zero
case).

Design (micro-batch via ``foreachBatch`` — the standard pattern for
reusing exact batch logic on a stream):

- Each micro-batch runs the SAME X1–X5 extraction (`build_edges`) the
  batch engine uses, so streaming and batch semantics cannot drift.
- Per-batch edge-count deltas are APPENDED to a delta directory; the
  consolidated edge table is ``edges_snapshot`` = groupBy-sum over the
  deltas (weight = count is commutative + associative, so append-then-
  sum is exactly an Iceberg ``MERGE INTO ... SUM`` without needing the
  Iceberg runtime — the same seam as sources/catalog.py).
- Assumption (documented, asserted in tests): a conversation's turns
  arrive within one micro-batch (transcripts are logged per finished
  conversation).  When turns DO span batches, use the stateful variant
  — ``streaming/stateful.py`` links across micro-batch boundaries with
  ``applyInPandasWithState`` keyed by conv_id; the delta/snapshot
  contract is the same.

``windowed_actor_activity`` is the pure-streaming operator: per-actor
turn counts in event-time tumbling windows with a watermark for late
data — the watermark+window aggregation shape every streaming
training-data pipeline needs (e.g. rate monitoring, freshness cuts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.fixtures import TRANSCRIPT_SCHEMA
from mesos_pregel_spark.functions.edges import actor_col, build_edges


def stream_edge_deltas(
    spark: SparkSession,
    input_dir: str,
    delta_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Watch ``input_dir`` for new transcript parquet files; per
    micro-batch, extract edges with the batch X1–X5 pipeline and append
    the weighted deltas to ``delta_dir``.  Returns the started query
    (``available_now=True`` drains what exists and stops — the
    test/backfill trigger; pass False for a continuous query)."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        deltas = build_edges(batch_df).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        deltas.write.mode("append").parquet(delta_dir)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def edges_snapshot(spark: SparkSession, delta_dir: str) -> DataFrame:
    """Consolidated (src_actor, dst_actor, weight) view over the
    appended deltas — weight sums merge because edge weight = count is
    a commutative/associative measure (the combiner property, P2)."""
    return (
        spark.read.parquet(delta_dir)
        .groupBy("src_actor", "dst_actor")
        .agg(F.sum("weight").alias("weight"))
    )


def windowed_actor_activity(
    transcripts_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling-window turn counts per actor with a
    watermark bounding late-data state: the canonical streaming
    aggregation (append-mode compatible).  Works on a streaming OR
    batch transcript DataFrame (same expression tree — tested for
    batch/stream agreement)."""
    return (
        transcripts_stream
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("win"),
            actor_col().alias("actor"),
        )
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "actor",
            "n_turns",
        )
    )
