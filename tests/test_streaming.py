"""Structured Streaming operators (streaming/edges.py):

1. stream-vs-batch equivalence — the consolidated snapshot after
   streaming N batches of transcript files equals build_edges over the
   union (foreachBatch reuses the batch pipeline, sums merge);
2. incrementality — a second availableNow run picks up ONLY new files
   (checkpointed source offsets) and the snapshot updates;
3. windowed_actor_activity — watermarked event-time aggregation,
   batch/stream agreement on the same rows.
"""

import time

from pyspark.sql import functions as F

from mesos_pregel_spark.fixtures import generate_transcripts
from mesos_pregel_spark.functions.edges import build_edges
from mesos_pregel_spark.streaming.edges import (
    edges_snapshot,
    stream_edge_deltas,
    windowed_actor_activity,
)


def _edge_map(df):
    return {
        (r["src_actor"], r["dst_actor"]): r["weight"] for r in df.collect()
    }


def _run_stream(spark, input_dir, delta_dir, ckpt_dir):
    q = stream_edge_deltas(spark, input_dir, delta_dir, ckpt_dir)
    q.awaitTermination(120)
    for _ in range(60):  # availableNow stops itself; belt and braces
        if not q.isActive:
            break
        time.sleep(1)
    assert not q.isActive


def test_stream_edges_equals_batch_and_is_incremental(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    delta_dir = str(tmp_path / "deltas")
    ckpt_dir = str(tmp_path / "ckpt")

    t1 = generate_transcripts(spark, n_conv=120, seed=42)
    t1.write.mode("append").parquet(input_dir)
    _run_stream(spark, input_dir, delta_dir, ckpt_dir)
    snap1 = _edge_map(edges_snapshot(spark, delta_dir))
    assert snap1 == _edge_map(build_edges(t1))

    # second wave of conversations: only the NEW files are processed
    t2 = generate_transcripts(spark, n_conv=120, seed=99)
    t2 = t2.withColumn(
        "conv_id", F.concat(F.lit("w2"), F.col("conv_id"))
    )  # disjoint conv ids — each conversation arrives whole, per contract
    t2.write.mode("append").parquet(input_dir)
    _run_stream(spark, input_dir, delta_dir, ckpt_dir)

    snap2 = _edge_map(edges_snapshot(spark, delta_dir))
    expected = _edge_map(build_edges(t1.unionByName(t2)))
    assert snap2 == expected
    # incrementality: delta rows carry at least two distinct batch ids
    batches = spark.read.parquet(delta_dir).select("batch_id").distinct().count()
    assert batches >= 2


def test_windowed_actor_activity_stream_matches_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in2")
    out_dir = str(tmp_path / "out2")
    ckpt_dir = str(tmp_path / "ck2")
    t = generate_transcripts(spark, n_conv=200, seed=42)
    t.write.mode("overwrite").parquet(input_dir)

    from mesos_pregel_spark.fixtures import TRANSCRIPT_SCHEMA
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    q = (
        windowed_actor_activity(stream, window="10 minutes",
                                watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for _ in range(60):
        if not q.isActive:
            break
        time.sleep(1)

    got = spark.read.parquet(out_dir)
    expected = windowed_actor_activity(t)
    key = lambda r: (r["window_start"], r["actor"])  # noqa: E731
    g = {key(r): r["n_turns"] for r in got.collect()}
    e = {key(r): r["n_turns"] for r in expected.collect()}
    # append mode emits only windows the watermark has CLOSED; every
    # emitted window must match the batch computation exactly, and the
    # batch result must contain nothing the stream contradicts
    assert g, "stream emitted no closed windows"
    for k, v in g.items():
        assert e[k] == v
    # late-data bound: windows still open at end-of-stream (within the
    # watermark of max ts) are the only ones allowed to be missing
    missing = set(e) - set(g)
    if missing:
        max_ts = t.agg(F.max("ts")).first()[0]
        import datetime
        horizon = max_ts - datetime.timedelta(minutes=30)
        assert all(k[0] >= horizon - datetime.timedelta(minutes=10)
                   for k in missing)
