"""Katz centrality (Katz 1953) on the generic vertex-program API —
the attenuation-weighted walk-count member of the ranking family
(PageRank's teleport-free ancestor: every in-walk of length t
contributes beta^t).

Pinned semantics (mirrored by the unrolled DuckDB twin,
queries.SQL_KATZ_STEP4):

- UNWEIGHTED directed graph; parallel edges collapsed in prep.
- x_0 = 1 at every vertex; x_{t+1}(v) = beta * Σ_{u→v} x_t(u);
  katz(v) = Σ_{t=0..k} x_t(v)  (the common "1 + attenuated in-walk
  counts" form — subtract 1 for the strict series).
- Fixed superstep budget (bounded-iteration semantics like sync-LPA);
  beta must be < 1/λ_max for the infinite series to converge, but a
  FIXED unroll is exact for any beta — the driver query pins
  beta = 0.05 and k = 4.
- The only doubles summed across partitions are the x terms; the
  result rounds to 9dp in finalize (the ranking-family discipline
  that collapses summation-order ulps — same contract as PageRank).

Execution shape (design-for-100×): identical to PageRank's — one
scatter join + one sum combine with map-side partials per superstep
over the src-partitioned persisted edge set; state carries two
doubles per vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.plans.pregel import PregelRun
from mesos_pregel_spark.plans.program import VertexProgram, pregel


def katz(
    spark: SparkSession,
    edges: DataFrame,
    beta: float = 0.05,
    max_supersteps: int = 4,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Run the k-step Katz unroll.  Returns (scores(id, katz), run)."""

    def prep(e: DataFrame) -> DataFrame:
        return e.select("src", "dst").distinct()

    def init(e: DataFrame, ctx: dict) -> DataFrame:
        vertices = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        return vertices.select(
            "id", F.lit(1.0).alias("x"), F.lit(1.0).alias("katz")
        )

    def apply(state: DataFrame, combined: DataFrame, ctx: dict) -> DataFrame:
        return (
            state.join(combined, state["id"] == combined["dst"], "left_outer")
            .select(
                state["id"],
                (F.lit(beta) * F.coalesce(combined["x_sum"], F.lit(0.0)))
                .alias("x"),
                state["katz"],
            )
            .withColumn("katz", F.col("katz") + F.col("x"))
        )

    def finalize(s: DataFrame) -> DataFrame:
        return s.select("id", F.round("katz", 9).alias("katz"))

    program = VertexProgram(
        name="katz",
        init=init,
        msg_cols=[F.col("x").alias("msg_x")],
        combiner={"x_sum": ("msg_x", "sum")},
        apply=apply,
        aggregators=[F.sum("x").alias("x_total")],
        halt=lambda aggs: False,
        edge_cols=("src", "dst"),
        prep_edges=prep,
        finalize=finalize,
        converged_at_cap=True,
        params={"beta": beta, "k": max_supersteps},
    )
    return pregel(
        spark, edges, program,
        max_supersteps=max_supersteps,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        edge_partitions=edge_partitions,
    )
