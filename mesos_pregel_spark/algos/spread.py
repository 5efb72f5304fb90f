"""Linear-threshold influence spread — the deterministic core of the
classic influence-maximization model (Kempe-Kleinberg-Tardos 2003):
a vertex activates once the summed edge weight arriving from already-
active in-neighbours reaches a fixed fraction of its total in-weight.
Over a transcript-derived interaction graph this answers "if these
actors adopt a behaviour, how far does it cascade and how fast".

Pinned semantics (mirrored by the unrolled DuckDB twin,
queries.SQL_LT_SPREAD):

- WEIGHTED directed graph, parallel edges pre-collapsed (weight =
  transition count); influence flows src → dst.
- Seeds activate at round 0.  Vertex v (inw(v) > 0) activates at
  round r+1 iff Σ_{u active by round r, u→v} w(u,v) ≥ θ·inw(v);
  vertices with inw = 0 never activate (strict in-neighbourhood
  model — seeds excepted).  θ = 0.5 in the driver query.
- MONOTONE: active vertices stay active, so a k-round unroll is
  exact whether the engine halts early at the fixpoint or runs to
  the cap.
- DETERMINISM: received mass is a sum of exact integer counts
  (lossless in doubles ≤ 2^53) and θ·inw is one exact product, so
  the threshold comparison cannot drift cross-engine.

Execution shape (design-for-100×): the cumulative-inbox trick makes
this a frontier algorithm — each vertex SENDS exactly once (the
superstep after it activates, via ``active_filter``), and the
receiver accumulates, so total message volume is O(E) across the
whole run, not O(E·rounds).  Per superstep: one frontier-filtered
scatter join + one sum combine with map-side partials over the
src-partitioned persisted edge set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.plans.pregel import PregelRun
from mesos_pregel_spark.plans.program import VertexProgram, pregel


def lt_spread(
    spark: SparkSession,
    edges: DataFrame,
    seeds: Sequence,
    theta: float = 0.5,
    max_supersteps: int = 8,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Linear-threshold cascade from ``seeds``.  Returns
    (spread(id, round), run) — round = activation round (seeds 0),
    -1 where the cascade never arrives."""
    sds = sorted(set(seeds))
    if not sds:
        raise ValueError("need at least one seed")

    def prep(e: DataFrame) -> DataFrame:
        return e.groupBy("src", "dst").agg(F.sum("weight").alias("w"))

    def init(e: DataFrame, ctx: dict) -> DataFrame:
        vertices = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        inw = e.groupBy(F.col("dst").alias("id")).agg(F.sum("w").alias("inw"))
        seeded = F.col("id").isin(sds)
        return (
            vertices.join(inw, "id", "left_outer")
            .select(
                "id",
                F.coalesce("inw", F.lit(0.0)).alias("inw"),
                F.lit(0.0).alias("received"),
                F.when(seeded, F.lit(0).cast("long"))
                .otherwise(F.lit(None).cast("long")).alias("round"),
                seeded.alias("changed"),
                # superstep counter carried in-state so the activation
                # round label survives checkpoint/resume without driver
                # bookkeeping
                F.lit(0).cast("long").alias("t"),
            )
        )

    def apply(state: DataFrame, combined: DataFrame, ctx: dict) -> DataFrame:
        inbox = F.coalesce(combined["w_sum"], F.lit(0.0))
        received = state["received"] + inbox
        newly = (
            state["round"].isNull()
            & (state["inw"] > 0.0)
            & (received >= F.lit(theta) * state["inw"])
        )
        return (
            state.join(combined, state["id"] == combined["dst"], "left_outer")
            .select(
                state["id"],
                state["inw"],
                received.alias("received"),
                F.when(state["round"].isNotNull(), state["round"])
                .when(newly, state["t"] + 1)
                .otherwise(F.lit(None).cast("long"))
                .alias("round"),
                newly.alias("changed"),
                (state["t"] + 1).alias("t"),
            )
        )

    program = VertexProgram(
        name="lt_spread",
        init=init,
        prep_edges=prep,
        edge_cols=("src", "dst", "w"),
        msg_cols=[F.col("w").alias("m")],
        active_filter=F.col("changed"),
        combiner={"w_sum": ("m", "sum")},
        apply=apply,
        aggregators=[F.sum(F.col("changed").cast("long")).alias("active")],
        halt=lambda aggs: aggs["active"] == 0,
        frontier_agg="active",
        finalize=lambda s: s.select(
            "id", F.coalesce("round", F.lit(-1)).alias("round")
        ),
        converged_at_cap=True,
        params={"theta": theta, "seeds": [str(s) for s in sds]},
    )
    return pregel(
        spark, edges, program,
        max_supersteps=max_supersteps,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        edge_partitions=edge_partitions,
    )
