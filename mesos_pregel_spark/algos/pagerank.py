"""A1 — PageRank, the Pregel paper's worked example [P §5.1].

Pinned semantics (SURVEY §2.2 A1; the numpy oracle implements the same
paragraph):

    pr'_v = (1-d)/N + d * Σ_{u→v} pr_u / outdeg_u        (d = 0.85)

- UNWEIGHTED: outdeg_u = number of distinct out-neighbors (the edge
  table is already multi-edge-collapsed by build_edges).
- Dangling vertices send nothing — their mass leaks; do NOT
  renormalize (Pregel-paper variant).
- Initial value 1/N.  All vertices recompute every superstep.
- Converge when max_v |pr'_v − pr_v| < tol (1e-6, BASELINE.json:2).

Physical plan per superstep: scatter join (edges pre-partitioned by
src, persisted — only the small vertex state shuffles) → combiner
(hash agg with automatic map-side partials; optional explicit salting
for hub skew) → left join back to state + pure column expressions.
The only driver boundary is the P5 aggregator collect (max delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.operators.combine import combine
from mesos_pregel_spark.operators.scatter import scatter
from mesos_pregel_spark.plans.pregel import PregelRun


def init_state(edges: DataFrame) -> tuple[DataFrame, int]:
    """Vertex state (id, outdeg, pr) with pr = 1/N.  Returns (state, N)."""
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    outdeg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    n = vertices.count()
    state = (
        vertices.join(outdeg, "id", "left_outer")
        .select(
            "id",
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            (F.lit(1.0) / F.lit(float(n))).alias("pr"),
        )
    )
    return state, n


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_supersteps: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    n_salt: int = 0,
    salt_hot_k: int = 0,
    edge_partitions: int | None = None,
    kernel: str = "join",
) -> tuple[DataFrame, PregelRun]:
    """Run PageRank to convergence.  Returns (ranks(id, pagerank), run).

    ``kernel='csr'`` switches the gather to the Arrow/CSR fast path
    (operators/csr.py) — correct when vertex state fits in a broadcast,
    which holds for actor graphs (vertex set = roles ∪ tools).
    """
    run, resumed = (
        PregelRun.resume(
            spark, "pagerank", checkpoint_dir,
            checkpoint_every=checkpoint_every,
            params={"damping": damping, "tol": tol},
        )
        if checkpoint_dir
        else (PregelRun(spark, "pagerank", params={"damping": damping, "tol": tol}), None)
    )

    if run.resumed_final:
        return resumed, run  # already-converged run: stored (id, pagerank)

    # edge_partitions=0 ⇒ caller already partitioned+persisted the edge
    # table (one-time setup, amortized over all supersteps/algorithms)
    # AND guarantees it is multi-edge-collapsed; otherwise collapse
    # parallel edges here — outdeg counts distinct out-neighbors (the
    # pinned UNWEIGHTED semantics above), so duplicate (src,dst) rows
    # must not double-send mass.
    nparts = edge_partitions or spark.sparkContext.defaultParallelism
    if edge_partitions == 0:
        edges = edges.select("src", "dst")
    else:
        edges = edges.select("src", "dst").distinct() \
            .repartition(nparts, "src") \
            .persist(StorageLevel.MEMORY_AND_DISK)
    edge_count = edges.count()  # materialize once; reused every superstep

    if resumed is not None:
        state = resumed
        n = state.count()
    else:
        state, n = init_state(edges)
        state = run.materialize(state)

    if kernel == "csr":
        from mesos_pregel_spark.operators.csr import csr_gather_sums
        csr_edges = None  # packed lazily below

    # S1 hot-list: computed once per graph, reused every superstep.
    hot = None
    if n_salt > 0 and salt_hot_k > 0:
        from mesos_pregel_spark.operators.combine import hot_destinations
        hot = hot_destinations(edges, salt_hot_k)

    converged = False
    while run.superstep < max_supersteps:
        if kernel == "csr":
            from mesos_pregel_spark.operators.csr import pack_edges_by_dst
            if csr_edges is None:
                csr_edges = pack_edges_by_dst(edges, nparts)
            combined = csr_gather_sums(spark, csr_edges, state)
        else:
            msgs = scatter(
                edges,
                state.where(F.col("outdeg") > 0),
                [(F.col("pr") / F.col("outdeg")).alias("msg"), F.col("src").alias("msrc")],
            )
            combined = combine(
                msgs, ["dst"], {"msg_sum": ("msg", "sum")},
                n_salt=n_salt, salt_on="msrc", hot_keys=hot,
            )

        teleport = (1.0 - damping) / float(n)
        new_state = (
            state.join(combined, state["id"] == combined["dst"], "left_outer")
            .select(
                state["id"],
                state["outdeg"],
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(combined["msg_sum"], F.lit(0.0))
                ).alias("pr"),
                state["pr"].alias("pr_prev"),
            )
            .withColumn("delta", F.abs(F.col("pr") - F.col("pr_prev")))
            .drop("pr_prev")
        )

        new_state = run.materialize(new_state, meta={"n_vertices": n})
        aggs = run.aggregators(
            new_state,
            [
                F.max("delta").alias("max_delta"),
                F.sum("pr").alias("pr_mass"),
                F.count(F.lit(1)).alias("n_vertices"),
            ],
        )
        run.record(
            max_delta=aggs["max_delta"],
            pr_mass=aggs["pr_mass"],
            messages_emitted=edge_count,
            active=n,
        )
        state = new_state.drop("delta")
        run.next_superstep()
        converged = aggs["max_delta"] < tol
        if converged:
            break

    result = run.finish(
        state.select("id", F.col("pr").alias("pagerank")), converged=converged
    )
    if edge_partitions != 0:
        edges.unpersist()
    if kernel == "csr" and csr_edges is not None:
        csr_edges.unpersist()
    return result, run
