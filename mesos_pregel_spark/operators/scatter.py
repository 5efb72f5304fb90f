"""P1 — scatter: message generation along out-edges.

Pregel semantics [P §3]: each *active* vertex runs Compute and calls
SendMessageTo along its out-edges; messages are visible at the next
superstep.  Spark-first mapping: an equi-join of the (static,
pre-partitioned, persisted) edge table with the active vertex state,
projecting ``(dst, msg)``.

Scale notes:
- The edge table is repartitioned by ``src`` ONCE and persisted, so
  every superstep's scatter join reuses that partitioning: only the
  (small) vertex-state side shuffles.
- When the active frontier is small (late CC/LPA supersteps) the
  driver passes ``broadcast=True`` and the join degrades to a
  broadcast-hash join — no shuffle at all (SURVEY §4.3 frontier
  broadcast; the optimizer can't know frontier size across supersteps,
  the driver does, from the P5 aggregators).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scatter(
    edges: DataFrame,
    vertices: DataFrame,
    msg_cols: Sequence[Column],
    active_filter: Column | None = None,
    broadcast: bool = False,
) -> DataFrame:
    """Join edges (src, dst, weight) with vertex state on src == id and
    project message columns.

    ``msg_cols`` are expressions over the joined row (edge columns +
    vertex columns); each must be aliased.  ``active_filter`` restricts
    the sending side (vote-to-halt / frontier).  Returns one message
    row per (active-src out-edge).
    """
    v = vertices
    if active_filter is not None:
        v = v.where(active_filter)
    if broadcast:
        v = F.broadcast(v)
    joined = edges.join(v, edges["src"] == v["id"], "inner")
    return joined.select(F.col("dst"), *msg_cols)
