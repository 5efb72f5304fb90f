"""k-truss — the edge-level cohesive-subgraph decomposition
completing the k-core family: the maximal subgraph in which every
edge participates in at least k-2 triangles (of the subgraph).
Denser and more noise-robust than k-core; the standard community-core
filter for link graphs.

Pinned semantics (python peel oracle in tests, unrolled SQL oracle in
the driver):

- UNDIRECTED simple graph: edges canonicalized to (lo, hi) pairs,
  self-loops dropped, parallel edges collapsed.
- Synchronous peel: each round counts, for every surviving edge, the
  triangles formed with surviving edges only; edges with support
  < k-2 are removed together; repeat until stable.  Returns the
  surviving edge set (lo, hi).
- Like k-core, peeling is MONOTONE, so a run capped at R rounds
  equals an R-round unrolled oracle exactly.

Execution shape (design-for-100×): each round is the degree-bounded
triangle enumeration (two self-joins of the canonical edge table —
the same O(m^1.5)-bounded shape as A4's wedge join) plus a count
groupBy; state (the edge set) is truncated with an eager
localCheckpoint per round.  Rounds are usually few (each removes a
whole support-stratum at once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.plans.pregel import PregelRun


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 30,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Peel to the k-truss.  Returns (truss_edges(lo, hi), run)."""
    if k < 2:
        raise ValueError("k-truss requires k >= 2")
    nparts = edge_partitions or spark.sparkContext.defaultParallelism
    e = (
        edges.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .repartition(nparts, "lo")
        .localCheckpoint(eager=True)
    )
    run = PregelRun(spark, "ktruss")
    need = k - 2
    while run.superstep < max_rounds:
        n_edges = e.count()
        if n_edges == 0:
            break
        # triangles (a<b<c) among surviving edges: each contributes
        # support to its three edges
        e1 = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        e2 = e.select(F.col("lo").alias("a2"), F.col("hi").alias("c"))
        e3 = e.select(F.col("lo").alias("b3"), F.col("hi").alias("c3"))
        tri = (
            e1.join(e2, (F.col("a") == F.col("a2")) & (F.col("b") < F.col("c")))
            .join(e3, (F.col("b") == F.col("b3")) & (F.col("c") == F.col("c3")))
            .select("a", "b", "c")
        )
        sup = (
            tri.select(F.col("a").alias("lo"), F.col("b").alias("hi"))
            .unionByName(tri.select(F.col("a").alias("lo"), F.col("c").alias("hi")))
            .unionByName(tri.select(F.col("b").alias("lo"), F.col("c").alias("hi")))
            .groupBy("lo", "hi")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        keep = (
            e.join(sup, ["lo", "hi"], "left_outer")
            .where(F.coalesce(F.col("support"), F.lit(0)) >= need)
            .select("lo", "hi")
            .localCheckpoint(eager=True)
        )
        n_keep = keep.count()
        run.record(edges=n_edges, removed=n_edges - n_keep)
        run.next_superstep()
        e = keep
        if n_keep == n_edges:
            break
    return run.finish(e), run
