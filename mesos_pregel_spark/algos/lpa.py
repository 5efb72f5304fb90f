"""A3 — Synchronous label propagation (community detection).

Pinned semantics (SURVEY §2.2 A3; the oracle implements the same
paragraph — determinism is part of the contract, BASELINE.json:14):

- Undirected: edges symmetrized once; message weight = edge weight.
- init label_v = id_v.
- Each superstep EVERY vertex recomputes
      label_v = argmax_label Σ weight(in-messages with that label)
  ties broken toward the SMALLEST label (deterministic).  The vertex's
  own current label does NOT vote.  Vertices with no in-messages keep
  their label.
- Synchronous LPA can oscillate (bipartite graphs), so the run is
  bounded by ``max_supersteps`` (default 20); halts early when no
  label changed.

The combiner is the per-(dst,label) weight sum — commutative +
associative, so map-side partials apply; the argmax is a single
``max_by``-style struct aggregate (max of (weight_sum, -label)), not a
window, so it stays one hash aggregation per superstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.functions.edges import symmetrize
from mesos_pregel_spark.operators.combine import combine
from mesos_pregel_spark.operators.scatter import scatter
from mesos_pregel_spark.plans.pregel import PregelRun


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    max_supersteps: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    n_salt: int = 0,
    salt_hot_k: int = 0,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Run sync-LPA.  Returns (labels(id, label), run)."""
    run, resumed = (
        PregelRun.resume(spark, "lpa", checkpoint_dir, checkpoint_every=checkpoint_every)
        if checkpoint_dir
        else (PregelRun(spark, "lpa"), None)
    )

    if run.resumed_final:
        return resumed, run  # bounded-superstep run already completed

    nparts = edge_partitions or spark.sparkContext.defaultParallelism
    sym = symmetrize(edges.select("src", "dst", "weight")) \
        .repartition(nparts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()

    if resumed is not None:
        state = resumed
    else:
        state = sym.select(F.col("src").alias("id")).distinct() \
            .select("id", F.col("id").alias("label"))
        state = run.materialize(state)

    hot = None
    if n_salt > 0 and salt_hot_k > 0:
        from mesos_pregel_spark.operators.combine import hot_destinations
        hot = hot_destinations(sym, salt_hot_k)

    while run.superstep < max_supersteps:
        msgs = scatter(
            sym,
            state,
            [
                F.col("label").alias("msg_label"),
                F.col("weight").alias("msg_weight"),
                F.col("src").alias("msrc"),
            ],
        )
        # Combiner stage: per-(dst, label) weight sums (partial-agg friendly).
        per_label = combine(
            msgs,
            ["dst", "msg_label"],
            {"wsum": ("msg_weight", "sum")},
            n_salt=n_salt,
            salt_on="msrc",
            hot_keys=hot,
        )
        # Argmax with smallest-label tie-break: min of struct
        # (-wsum, label) compares weight first (negated => largest sum
        # wins), then prefers the smaller label — type-generic, works
        # for long ids and string actor keys alike.
        winner = per_label.groupBy("dst").agg(
            F.min(F.struct((-F.col("wsum")).alias("neg_wsum"),
                           F.col("msg_label").alias("lbl"))).alias("best")
        ).select("dst", F.col("best.lbl").alias("new_label"))

        new_state = (
            state.join(winner, state["id"] == winner["dst"], "left_outer")
            .select(
                state["id"],
                F.coalesce(winner["new_label"], state["label"]).alias("label"),
                (F.coalesce(winner["new_label"], state["label"]) != state["label"])
                .alias("changed"),
            )
        )
        new_state = run.materialize(new_state)
        aggs = run.aggregators(
            new_state,
            [
                F.sum(F.col("changed").cast("long")).alias("changed_count"),
                F.count_distinct(F.col("label")).alias("n_labels"),
            ],
        )
        run.record(changed=aggs["changed_count"], n_labels=aggs["n_labels"])
        state = new_state.drop("changed")
        run.next_superstep()
        if aggs["changed_count"] == 0:
            break

    result = run.finish(state.select("id", "label"))
    sym.unpersist()
    return result, run
