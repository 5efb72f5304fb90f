"""Structured Streaming operators (round 2 — promoted from the round-1
non-goal boundary): incremental edge maintenance over a growing
transcript directory (``edges.stream_edge_deltas`` /
``edges.edges_snapshot`` — foreachBatch reusing the exact batch X1–X5
pipeline, append-then-sum merge) and event-time windowed actor
activity with a watermark (``edges.windowed_actor_activity``).

``stateful.stateful_edge_stream`` is the custom STATEFUL operator
(``applyInPandasWithState`` keyed by conv_id): consecutive-turn
linking whose per-conversation state survives micro-batch boundaries,
removing the foreachBatch path's turns-arrive-together assumption.

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
from mesos_pregel_spark.streaming.stateful import (
    stateful_edge_stream,
    stateful_edges_snapshot,
)

__all__ = [
    "stream_edge_deltas",
    "edges_snapshot",
    "windowed_actor_activity",
    "stateful_edge_stream",
    "stateful_edges_snapshot",
]
