"""Cross-batch consecutive-turn linking — the custom STATEFUL
streaming operator (``applyInPandasWithState``) that removes the
documented assumption of the foreachBatch path (streaming/edges.py:
"a conversation's turns arrive within one micro-batch").

Semantics: identical to the batch X2–X4 pipeline (functions/edges.py
``build_edges``) — within each ``conv_id``, turns ordered by
``turn_idx`` link actor_i → actor_{i+1}, self-loops dropped — but the
per-conversation state (last seen turn's actor) survives micro-batch
boundaries, so a conversation whose turns arrive across many batches
still yields exactly the batch pipeline's edges
(tests/test_streaming_stateful.py asserts snapshot ≡ build_edges on
the same turns split mid-conversation).

Arrival contract: per conversation, turns arrive in non-decreasing
``turn_idx`` order ACROSS batches (append-only transcript logs);
within a batch any order is fine (sorted here).

Execution shape (design-for-100×): state is keyed by conv_id —
high-cardinality, hash-partitioned, no hotspot; per-group state is two
scalars (last turn_idx + actor string), so the state store stays tiny
regardless of conversation length; emitted rows are raw transitions
whose consolidation (groupBy-sum) happens once at snapshot time, the
same append-then-sum delta contract as streaming/edges.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.fixtures import TRANSCRIPT_SCHEMA
from mesos_pregel_spark.functions.edges import actor_col

_OUT_SCHEMA = "src_actor string, dst_actor string"
_STATE_SCHEMA = "last_idx long, last_actor string"


def _link_group(key, pdf_iter, state):
    """Per-conversation linker: prepend the remembered last actor,
    emit one row per consecutive-actor transition, remember the new
    last turn.  Vectorized pandas (``shift`` of the sorted actor
    column seeds row 0 from the cross-batch state) — the only scalar
    state is the (last_idx, last_actor) pair; no per-row Python in the
    batch body."""
    import pandas as pd

    last_idx, last_actor = state.get if state.exists else (None, None)
    chunks = [p for p in pdf_iter if len(p)]
    if chunks:
        pdf = pd.concat(chunks).sort_values("turn_idx")
        src = pdf["actor"].shift(1)
        if last_actor is not None:
            src.iloc[0] = last_actor
        mask = src.notna() & (src != pdf["actor"])
        out = pd.DataFrame({
            "src_actor": src[mask].to_numpy(),
            "dst_actor": pdf["actor"][mask].to_numpy(),
        })
        tail_actor = pdf["actor"].iloc[-1]
        if tail_actor is not None:
            last_idx, last_actor = int(pdf["turn_idx"].iloc[-1]), tail_actor
    else:
        out = pd.DataFrame({"src_actor": [], "dst_actor": []})
    if last_actor is not None:
        state.update((last_idx, last_actor))
    yield out


def stateful_edge_stream(
    spark: SparkSession,
    input_dir: str,
    transitions_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Watch ``input_dir`` for transcript parquet; append raw
    (src_actor, dst_actor) transition rows to ``transitions_dir``,
    linking across micro-batch boundaries via per-conv_id state.
    Returns the started query."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    turns = (
        reader.parquet(input_dir)
        .select("conv_id", "turn_idx", actor_col().alias("actor"))
    )
    linked = turns.groupBy("conv_id").applyInPandasWithState(
        _link_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        linked.writeStream.format("parquet")
        .option("path", transitions_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_edges_snapshot(spark: SparkSession, transitions_dir: str) -> DataFrame:
    """Consolidated edge table over the appended transitions — same
    (src_actor, dst_actor, weight) contract as the batch pipeline."""
    return (
        spark.read.schema(_OUT_SCHEMA).parquet(transitions_dir)
        .groupBy("src_actor", "dst_actor")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
