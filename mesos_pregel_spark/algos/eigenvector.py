"""Eigenvector centrality by power iteration on the generic
vertex-program API — the last classic member of the ranking family
(PageRank = teleported, Katz = attenuated+shifted, HITS = bipartite;
this is the bare A^T x fixpoint).

Pinned semantics (mirrored by the unrolled DuckDB twin,
queries.SQL_EIGENVECTOR_STEP4):

- UNWEIGHTED directed graph; parallel edges collapsed in prep.
- x_0 = 1 at every vertex; x_{t+1}(v) = Σ_{u→v} x_t(u);
  eig(v) = x_k(v) / ||x_k||_2  (normalizing once at the end is
  algebraically identical to normalizing every step — the per-step
  scalars factor out of the direction — so the unroll stays a pure
  integer recurrence until the single final division).
- Fixed superstep budget (bounded-iteration semantics like Katz);
  the driver query pins k = 4.
- DETERMINISM: every x_t is an exact INTEGER (x_t(v) = number of
  in-walks of length t ending at v), represented losslessly in a
  double up to 2^53 — cross-partition sums of exact integers cannot
  drift, so the only FP ops are the final sqrt + divide, computed
  once from exact inputs.  Result rounds to 9 dp.
- SCALE NOTE (100×): in-walk counts grow like (avg indeg)^k; past
  ~2^53 the exactness argument lapses — at that scale switch to the
  per-step-rescaled variant (divide by the aggregator-carried
  Σx each superstep; same direction, bounded magnitudes).  k = 4 on
  the driver substrate peaks far below the threshold (the run's
  ``x_total`` aggregator makes the headroom observable per step).

Execution shape (design-for-100×): identical to Katz — one scatter
join + one sum combine with map-side partials per superstep over the
src-partitioned persisted edge set; the final norm is a 1-row
aggregate broadcast back over the state (BroadcastExchange, not a
shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.plans.pregel import PregelRun
from mesos_pregel_spark.plans.program import VertexProgram, pregel


def eigenvector(
    spark: SparkSession,
    edges: DataFrame,
    max_supersteps: int = 4,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """k-step power iteration.  Returns (scores(id, eigenvector), run)."""

    def prep(e: DataFrame) -> DataFrame:
        return e.select("src", "dst").distinct()

    def init(e: DataFrame, ctx: dict) -> DataFrame:
        vertices = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        return vertices.select("id", F.lit(1.0).alias("x"))

    def apply(state: DataFrame, combined: DataFrame, ctx: dict) -> DataFrame:
        return (
            state.join(combined, state["id"] == combined["dst"], "left_outer")
            .select(
                state["id"],
                F.coalesce(combined["x_sum"], F.lit(0.0)).alias("x"),
            )
        )

    def finalize(s: DataFrame) -> DataFrame:
        # ||x||_2 as a 1-row broadcast — a BroadcastExchange over the
        # state, never a shuffle.  All-zero x (possible on a DAG deeper
        # than k nowhere, but pinned anyway) maps to 0 scores.
        norm = s.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("norm"))
        return (
            s.crossJoin(F.broadcast(norm))
            .select(
                "id",
                F.when(F.col("norm") > 0.0, F.round(F.col("x") / F.col("norm"), 9))
                .otherwise(F.lit(0.0))
                .alias("eigenvector"),
            )
        )

    program = VertexProgram(
        name="eigenvector",
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
        params={"k": max_supersteps},
    )
    return pregel(
        spark, edges, program,
        max_supersteps=max_supersteps,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        edge_partitions=edge_partitions,
    )
