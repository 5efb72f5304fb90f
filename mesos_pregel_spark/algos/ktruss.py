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

Execution shape (design-for-100×): each round enumerates triangles
with the SAME degree-ordered orientation as A4 (algos/triangles.py):
surviving edges are oriented from their lower-(current degree, id)
endpoint to the higher one, so every vertex's oriented out-degree is
O(sqrt(m)) even for hubs and the wedge self-join is O(m^1.5)-bounded.
(Orienting on the id-canonical `lo` endpoint instead — the round-2
shape — lets a hub with a small vertex id generate O(deg²) wedge rows
per round; degree orientation exists exactly to prevent that.)
Support is mapped back from oriented triangles to the canonical
(lo, hi) edges; state (the edge set) is truncated with an eager
localCheckpoint per round.  Rounds are usually few (each removes a
whole support-stratum at once).  Degrees are recomputed per round on
the SURVIVING subgraph — one cheap groupBy against the wedge join it
bounds.

``trussness`` (the full decomposition — trussness(e) = the largest k
such that e survives in the k-truss) runs the same peel at increasing
k over the shrinking survivor set: edges peeled out at level k have
trussness k-1.  One pass over strata, not a user-driven k-sweep;
capped variants are exact on both sides because each level's peel is
monotone (the driver oracle unrolls the identical (level, round)
schedule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.plans.pregel import PregelRun


def _round_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support of the canonical edge set ``e(lo, hi)``
    via degree-ordered wedge joins (A4's plan shape, re-run per peel
    round on the surviving subgraph).  Returns (support_df(lo, hi,
    support) covering edges with support >= 1, oriented_df) — the
    caller unpersists ``oriented_df`` once support is materialized."""
    deg = (
        e.select(F.col("lo").alias("id"))
        .unionByName(e.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.withColumnsRenamed({"id": "lo", "deg": "deg_lo"}), "lo")
        .join(deg.withColumnsRenamed({"id": "hi", "deg": "deg_hi"}), "hi")
    )
    lo_first = (F.col("deg_lo") < F.col("deg_hi")) | (
        (F.col("deg_lo") == F.col("deg_hi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = ed.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        F.when(lo_first, F.col("deg_hi")).otherwise(F.col("deg_lo")).alias("deg_v"),
    )
    # Referenced three times (both wedge sides + the closing probe) —
    # materialize once per round, exactly as triangles.py does.
    oriented = oriented.persist(StorageLevel.MEMORY_AND_DISK)

    a = oriented.alias("a")
    b = oriented.alias("b")
    wedges = a.join(b, F.col("a.u") == F.col("b.u")).where(
        (F.col("a.deg_v") < F.col("b.deg_v"))
        | ((F.col("a.deg_v") == F.col("b.deg_v")) & (F.col("a.v") < F.col("b.v")))
    ).select(
        F.col("a.u").alias("u"), F.col("a.v").alias("v"), F.col("b.v").alias("w")
    )
    c = oriented.alias("c")
    tri = wedges.alias("wg").join(
        c, (F.col("wg.v") == F.col("c.u")) & (F.col("wg.w") == F.col("c.v"))
    ).select(F.col("wg.u").alias("u"), F.col("wg.v").alias("v"),
             F.col("wg.w").alias("w"))

    # Each oriented triangle (u,v,w) supports its three edges, mapped
    # back to the id-canonical (lo, hi) the peel state is keyed by.
    def canon(x: str, y: str) -> DataFrame:
        return tri.select(
            F.least(F.col(x), F.col(y)).alias("lo"),
            F.greatest(F.col(x), F.col(y)).alias("hi"),
        )

    sup = (
        canon("u", "v")
        .unionByName(canon("u", "w"))
        .unionByName(canon("v", "w"))
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return sup, oriented


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
        sup, oriented = _round_support(e)
        keep = (
            e.join(sup, ["lo", "hi"], "left_outer")
            .where(F.coalesce(F.col("support"), F.lit(0)) >= need)
            .select("lo", "hi")
            .localCheckpoint(eager=True)
        )
        n_keep = keep.count()
        oriented.unpersist()
        run.record(edges=n_edges, removed=n_edges - n_keep)
        run.next_superstep()
        e = keep
        if n_keep == n_edges:
            break
    return run.finish(e), run


def trussness(
    spark: SparkSession,
    edges: DataFrame,
    max_k: int = 20,
    max_rounds_per_level: int = 30,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Full truss decomposition in ONE run: every canonical edge gets
    ``trussness`` = the largest k such that it survives the k-truss
    peel (edges in no triangle get 2, the definitional floor).

    Strata peel: for k = 3, 4, ... the surviving set is peeled to the
    k-truss (reusing the degree-ordered round kernel); edges removed at
    level k have trussness k-1.  Because (k+1)-truss ⊆ k-truss, each
    level starts from the previous survivor set — total work is the sum
    of the shrinking per-level peels, not a k-sweep over the full
    graph.

    Caps are part of the pinned semantics (mirrored exactly by the
    driver's unrolled oracle, queries.SQL_TRUSSNESS): each level runs
    at most ``max_rounds_per_level`` peel rounds, and survivors of
    level ``max_k`` are reported with trussness ``max_k`` — monotone
    peeling makes the capped run equal the capped unroll, and a python
    oracle pytest (tests/test_ktruss.py) pins the uncapped ground truth
    at fixture scale.

    Returns (decomposition(lo, hi, trussness), run).
    """
    if max_k < 3:
        raise ValueError("trussness requires max_k >= 3")
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
    run = PregelRun(spark, "trussness")
    strata: list[DataFrame] = []  # per-level removed edges, labeled
    for k in range(3, max_k + 1):
        need = k - 2
        rounds = 0
        while rounds < max_rounds_per_level:
            n_edges = e.count()
            if n_edges == 0:
                break
            sup, oriented = _round_support(e)
            keep = (
                e.join(sup, ["lo", "hi"], "left_outer")
                .where(F.coalesce(F.col("support"), F.lit(0)) >= need)
                .select("lo", "hi")
                .localCheckpoint(eager=True)
            )
            n_keep = keep.count()
            oriented.unpersist()
            rounds += 1
            run.record(level=k, edges=n_edges, removed=n_edges - n_keep)
            run.next_superstep()
            if n_keep == n_edges:
                e = keep
                break
            # removed at level k => trussness k-1 (kept as lazy plans
            # over checkpointed inputs; unioned once at the end)
            strata.append(
                e.join(keep, ["lo", "hi"], "left_anti")
                .select("lo", "hi", F.lit(k - 1).cast("long").alias("trussness"))
                .localCheckpoint(eager=True)
            )
            e = keep
        if e.count() == 0:
            break
    survivors = e.select(
        "lo", "hi", F.lit(max_k).cast("long").alias("trussness")
    )
    out = survivors
    for s in strata:
        out = out.unionByName(s)
    return run.finish(out), run
