"""Deterministic graph walks — the graph-sampling primitive a
training-data pipeline runs over a link graph (random-walk corpora for
embedding training, neighborhood sampling, DeepWalk/node2vec-style
inputs) with HASH-DERIVED choices instead of RNG state, so the output
is reproducible across cluster sizes, resumable, and exactly
oracle-able.

Pinned semantics:

- Directed graph, parallel edges collapsed (distinct (src, dst)).
- One walk per vertex; step 0 is the start vertex itself.
- From ``cur`` at step t, the next vertex is the out-neighbor
  minimizing ``md5(seed || ':' || t || ':' || cur || ':' || dst)``
  (ids compared via their string casts; ties — md5 collisions —
  broken toward the smaller dst by appending ``'|' || dst`` to the
  comparison key).  A vertex with no out-neighbors ends its walk.
- Output rows (start, step, vertex), step = 0..length.

Execution shape (design-for-100×): the frontier (one row per live
walk) joins the src-partitioned persisted edge table once per step and
collapses with a single min_by aggregate — scatter + mergeable-combine
economics, L joins total, no per-row Python.  Walks-per-vertex
parallelism comes free from the start key; longer corpora = rerun with
different seeds (each seed is an independent, reproducible sample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def deterministic_walks(
    spark: SparkSession,
    edges: DataFrame,
    length: int = 8,
    seed: str = "42",
    edge_partitions: int | None = None,
) -> DataFrame:
    """Walk ``length`` steps from every vertex.  Returns
    (start, step, vertex)."""
    if length < 0:
        raise ValueError("length must be >= 0")
    nparts = edge_partitions or spark.sparkContext.defaultParallelism
    e = (
        edges.select("src", "dst").distinct()
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    frontier = verts.select(F.col("v").alias("start"), F.col("v").alias("cur"))
    parts = [frontier.select(
        "start", F.lit(0).alias("step"), F.col("cur").alias("vertex")
    )]
    for t in range(length):
        key = F.concat(
            F.md5(F.concat_ws(
                ":", F.lit(seed), F.lit(t),
                F.col("cur").cast("string"), F.col("dst").cast("string"),
            )),
            F.lit("|"), F.col("dst").cast("string"),
        )
        frontier = (
            frontier.join(e, frontier["cur"] == e["src"])
            .groupBy("start")
            .agg(F.min_by("dst", key).alias("cur"))
            # truncate the L-deep join lineage (S3 rule: iterative
            # frontier state)
            .localCheckpoint(eager=False)
        )
        parts.append(frontier.select(
            "start", F.lit(t + 1).alias("step"), F.col("cur").alias("vertex")
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
