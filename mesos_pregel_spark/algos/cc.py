"""A2 — Connected components via hash-min label propagation.

Pinned semantics (SURVEY §2.2 A2; CC is the canonical "min" combiner
example [P §3.2]):

- Undirected: edges are symmetrized once up front.
- init comp_v = id_v; each superstep comp_v = min(comp_v, min(msgs)).
- Frontier/delta optimization: only vertices whose comp changed last
  superstep send (exactly Pregel's vote-to-halt — a vertex halts when
  its value stops changing and is reactivated by an incoming smaller
  label).  The driver swaps the scatter join to broadcast-hash when
  the frontier falls under ``broadcast_threshold`` rows (SURVEY §4.3).
- Terminate when no vertex changed.  EXACT match required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.functions.edges import symmetrize
from mesos_pregel_spark.operators.combine import combine
from mesos_pregel_spark.operators.scatter import scatter
from mesos_pregel_spark.plans.pregel import PregelRun


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_supersteps: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    n_salt: int = 0,
    salt_hot_k: int = 0,
    broadcast_threshold: int = 100_000,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Run hash-min CC to fixpoint.  Returns (components(id, component), run)."""
    run, resumed = (
        PregelRun.resume(spark, "cc", checkpoint_dir, checkpoint_every=checkpoint_every)
        if checkpoint_dir
        else (PregelRun(spark, "cc"), None)
    )

    if run.resumed_final:
        return resumed, run  # already-converged run: stored (id, component)

    nparts = edge_partitions or spark.sparkContext.defaultParallelism
    sym = symmetrize(edges.select("src", "dst", "weight")) \
        .select("src", "dst").repartition(nparts, "src") \
        .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()

    if resumed is not None:
        state = resumed
    else:
        vertices = (
            sym.select(F.col("src").alias("id")).distinct()
        )  # symmetrized: src set == dst set == all non-isolated vertices
        state = vertices.select(
            "id", F.col("id").alias("comp"), F.lit(True).alias("changed")
        )
        state = run.materialize(state)

    hot = None
    if n_salt > 0 and salt_hot_k > 0:
        from mesos_pregel_spark.operators.combine import hot_destinations
        hot = hot_destinations(sym, salt_hot_k)

    active = None  # frontier size; None = unknown (first superstep)
    while run.superstep < max_supersteps:
        use_broadcast = active is not None and active <= broadcast_threshold
        msgs = scatter(
            sym,
            state,
            [F.col("comp").alias("msg"), F.col("src").alias("msrc")],
            active_filter=F.col("changed"),
            broadcast=use_broadcast,
        )
        combined = combine(
            msgs, ["dst"], {"msg_min": ("msg", "min")},
            n_salt=n_salt, salt_on="msrc", hot_keys=hot,
        )
        new_state = (
            state.join(combined, state["id"] == combined["dst"], "left_outer")
            .select(
                state["id"],
                F.least(state["comp"], F.coalesce(combined["msg_min"], state["comp"]))
                .alias("comp"),
                (
                    F.coalesce(combined["msg_min"], state["comp"]) < state["comp"]
                ).alias("changed"),
            )
        )
        new_state = run.materialize(new_state)
        aggs = run.aggregators(
            new_state,
            [
                F.sum(F.col("changed").cast("long")).alias("changed_count"),
                F.count(F.lit(1)).alias("n_vertices"),
            ],
        )
        run.record(active=aggs["changed_count"], n_vertices=aggs["n_vertices"])
        state = new_state
        run.next_superstep()
        active = aggs["changed_count"]
        if active == 0:
            break

    result = run.finish(
        state.select("id", F.col("comp").alias("component")),
        converged=(active == 0),
    )
    sym.unpersist()
    return result, run
