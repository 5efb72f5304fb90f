"""A5 — Single-source shortest paths, the Pregel paper's canonical
example [P §5.2] and mesos-pregel's built-in vertex program
(algorithms/shortestpath in the Go repo layout, SURVEY §1.1 [R?]).

Pinned semantics (shared with tests/oracle_pregel.py::oracle_sssp):
- Directed, weighted (edge weight = interaction count ≥ 0).
- init dist(source) = 0, dist(v) = +inf elsewhere.
- Superstep: every vertex whose distance improved last superstep
  relaxes its out-edges (msg = dist + weight); combiner = MIN
  [P §3.2]; vertex update dist' = min(dist, min(msgs)).
- Vote-to-halt: a vertex halts when its distance stops improving and
  reactivates on a smaller incoming distance — exactly the CC frontier
  machinery with (dist, +) in place of (comp, min-id).
- Terminates when no distance changed; unreachable vertices keep +inf
  (reported as null in the result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.operators.combine import combine
from mesos_pregel_spark.operators.scatter import scatter
from mesos_pregel_spark.plans.pregel import PregelRun

_INF = float("inf")


def shortest_paths(
    spark: SparkSession,
    edges: DataFrame,
    source,
    max_supersteps: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    n_salt: int = 0,
    salt_hot_k: int = 0,
    broadcast_threshold: int = 100_000,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Run SSSP from ``source``.  Returns (dists(id, distance), run)
    with distance null for unreachable vertices."""
    run, resumed = (
        PregelRun.resume(spark, "sssp", checkpoint_dir,
                         checkpoint_every=checkpoint_every,
                         params={"source": str(source)})
        if checkpoint_dir
        else (PregelRun(spark, "sssp", params={"source": str(source)}), None)
    )
    if run.resumed_final:
        return resumed, run

    nparts = edge_partitions or spark.sparkContext.defaultParallelism
    if edge_partitions == 0:
        e = edges.select("src", "dst", "weight")
    else:
        e = edges.select("src", "dst", "weight").repartition(nparts, "src") \
            .persist(StorageLevel.MEMORY_AND_DISK)
        e.count()

    if resumed is not None:
        state = resumed
    else:
        vertices = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        state = vertices.select(
            "id",
            F.when(F.col("id") == F.lit(source), F.lit(0.0))
            .otherwise(F.lit(_INF)).alias("dist"),
            (F.col("id") == F.lit(source)).alias("changed"),
        )
        state = run.materialize(state)

    hot = None
    if n_salt > 0 and salt_hot_k > 0:
        from mesos_pregel_spark.operators.combine import hot_destinations
        hot = hot_destinations(e, salt_hot_k)

    active = None
    while run.superstep < max_supersteps:
        use_broadcast = active is not None and active <= broadcast_threshold
        msgs = scatter(
            e,
            state,
            [(F.col("dist") + F.col("weight")).alias("msg"),
             F.col("src").alias("msrc")],
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
                F.least(
                    state["dist"], F.coalesce(combined["msg_min"], state["dist"])
                ).alias("dist"),
                (
                    F.coalesce(combined["msg_min"], state["dist"]) < state["dist"]
                ).alias("changed"),
            )
        )
        new_state = run.materialize(new_state)
        aggs = run.aggregators(
            new_state,
            [
                F.sum(F.col("changed").cast("long")).alias("changed_count"),
                F.sum(F.when(F.col("dist") != _INF, 1).otherwise(0))
                .alias("reached"),
            ],
        )
        run.record(active=aggs["changed_count"], reached=aggs["reached"])
        state = new_state
        run.next_superstep()
        active = aggs["changed_count"]
        if active == 0:
            break

    result = run.finish(
        state.select(
            "id",
            F.when(F.col("dist") == _INF, F.lit(None).cast("double"))
            .otherwise(F.col("dist")).alias("distance"),
        ),
        converged=(active == 0),
    )
    if edge_partitions != 0:
        e.unpersist()
    return result, run
