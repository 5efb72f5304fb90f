"""Structured Streaming operators (round 2 — promoted from the round-1
non-goal boundary): incremental edge maintenance over a growing
transcript directory (``edges.stream_edge_deltas`` /
``edges.edges_snapshot`` — foreachBatch reusing the exact batch X1–X5
pipeline, append-then-sum merge) and event-time windowed actor
activity with a watermark (``edges.windowed_actor_activity``).

The contract's static-Iceberg-snapshot input remains the primary path;
these operators cover the continuously-arriving-transcripts deployment
(the delta/snapshot contract is the jar-less stand-in for an Iceberg
``MERGE INTO``, same seam as sources/catalog.py).
"""

from mesos_pregel_spark.streaming.edges import (
    edges_snapshot,
    stream_edge_deltas,
    windowed_actor_activity,
)

__all__ = ["stream_edge_deltas", "edges_snapshot", "windowed_actor_activity"]
