"""Expected hitting time to a landmark under the uniform random walk —
value iteration in EXACT integer micro-steps.

The absorbing-chain companion of the distance family: `landmark_distances`
answers "how many hops IF you walk optimally", hitting time answers "how
many steps does the RANDOM walker take on average" — the quantity behind
random-walk closeness and first-passage analyses (Lovász 1993 survey,
§2).  On a link graph it separates vertices that are topologically close
but probabilistically hard to reach (hub-shadowed pockets the walker
rarely enters).

Pinned semantics (mirrored by the unrolled DuckDB twin,
queries.SQL_HITTING_TIME):

- UNDIRECTED uniform walk on the distinct symmetrized edge set:
  P(v→u) = 1/deg(v) over distinct neighbors.
- Landmark L = MIN vertex id (the house total-order pin; no sampling).
- Value iteration from below with the classic Bellman recurrence,
  h_0 ≡ 0 and

      h_{t+1}(v) = 1 + (1/deg(v)) · Σ_{u~v} h_t(u)      (v ≠ L)
      h_t(L)     = 0

  capped at a fixed k supersteps (driver query pins k = 8).  h_t is
  MONOTONE non-decreasing in t and converges to the true hitting time
  where finite, so a capped run is a lower-bound profile — the same
  fixed-budget contract as markov_step8 (capped ≡ unrolled, exact).
- DETERMINISM: h is carried in integer MICRO-steps (BIGINT): each
  update is ``10^6 + (Σ h_micro) div deg`` — an order-independent
  exact integer sum followed by ONE integer floor division.  Zero FP
  anywhere, so cross-engine equality is bitwise, and the floor error
  per step is < 1 micro-step.

Execution shape (design-for-100×): identical to PageRank — one
symmetrize + one degree aggregate at prep, then each superstep is one
scatter join over the src-partitioned persisted edges + one sum
combine with map-side partials.  deg rides as a state column so apply
is a join-free projection over (state ⋈ combined).  No per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.plans.pregel import PregelRun
from mesos_pregel_spark.plans.program import VertexProgram, pregel

MICRO = 1_000_000


def hitting_time(
    spark: SparkSession,
    edges: DataFrame,
    max_supersteps: int = 8,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """k-step hitting-time value iteration.

    Returns (profile(id, h_micro), run) — h_micro = expected steps to
    the min-id landmark in exact integer micro-steps, lower bound
    after k iterations (exactly the k-step Bellman value).
    """

    def prep(e: DataFrame) -> DataFrame:
        # distinct symmetrized neighbor set — the uniform walk ignores
        # weights and parallel edges by definition.
        und = e.select("src", "dst").where(F.col("src") != F.col("dst"))
        return (
            und.unionByName(
                und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .distinct()
        )

    def init(e: DataFrame, ctx: dict) -> DataFrame:
        deg = e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).cast("long").alias("deg")
        )
        # the pinned landmark: one tiny driver-side scalar (the
        # landmark_distances precedent — a 1-row agg, not a collect loop)
        ctx["landmark"] = deg.agg(F.min("id")).collect()[0][0]
        return deg.select(
            "id", "deg", F.lit(0).cast("long").alias("h")
        )

    def apply(state: DataFrame, combined: DataFrame, ctx: dict) -> DataFrame:
        lm = F.lit(ctx["landmark"])
        return (
            state.join(combined, state["id"] == combined["dst"], "left_outer")
            .select(
                state["id"],
                state["deg"],
                F.when(state["id"] == lm, F.lit(0).cast("long"))
                .otherwise(
                    F.lit(MICRO)
                    + F.expr("coalesce(h_sum, 0) div deg").cast("long")
                )
                .alias("h"),
            )
        )

    def restore_ctx(state: DataFrame, ctx: dict) -> None:
        ctx["landmark"] = state.agg(F.min("id")).collect()[0][0]

    program = VertexProgram(
        name="hitting_time",
        init=init,
        prep_edges=prep,
        edge_cols=("src", "dst"),
        msg_cols=[F.col("h").alias("m")],
        combiner={"h_sum": ("m", "sum")},
        apply=apply,
        aggregators=[F.sum("h").alias("h_total")],
        halt=lambda aggs: False,
        finalize=lambda s: s.select("id", "h"),
        restore_ctx=restore_ctx,
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
