"""Markov-chain mass flow on the weighted transition graph — the
row-stochastic cousin of the ranking family (PageRank = teleported
uniform-restart, eigenvector = un-normalized adjacency; this is the
bare P^T x step where P is the out-weight-normalized transition
matrix).  k steps of it answer "where does probability mass sit after
k tool/actor transitions if usage starts uniform" — the natural
steady-state read-out over a transcript-derived interaction graph.

Pinned semantics (mirrored by the unrolled DuckDB twin,
queries.SQL_MARKOV_STEP8):

- WEIGHTED directed graph, parallel edges pre-collapsed by the
  substrate (weight = transition count).
- P(u→v) = w(u,v) / outw(u); x_0 = 1/n everywhere;
  x_{t+1}(v) = Σ_{u→v} x_t(u) · (w(u,v)/outw(u)).
- NO teleport and NO dangling redistribution: mass entering a vertex
  with outw = 0 leaves the chain (pinned, documented; the teleported
  variant is exactly A1 PageRank).  Fixed superstep budget k; the
  driver query pins k = 8.
- DETERMINISM: the per-edge factor is computed as x · (w / outw) —
  the parenthesization is load-bearing and mirrored verbatim in the
  SQL twin, because (x·w)/outw can differ in the last ulp.  Sums are
  the same double-sum combine the PageRank oracles already hash-match
  through; results round to 9 dp.

Execution shape (design-for-100×): identical to PageRank — the
transition probability is a per-edge constant joined once at prep
(one groupBy(src) for outw, one broadcast-free equi-join), then each
superstep is one scatter join + one sum combine with map-side
partials over the src-partitioned persisted edge set.  No per-row
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.plans.pregel import PregelRun
from mesos_pregel_spark.plans.program import VertexProgram, pregel


def markov_mass(
    spark: SparkSession,
    edges: DataFrame,
    max_supersteps: int = 8,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """k-step row-stochastic mass flow.  Returns (mass(id, mass), run)."""

    def prep(e: DataFrame) -> DataFrame:
        # out-weight per source, folded into a per-edge transition
        # probability once — one aggregate + one equi-join, reused by
        # every superstep.
        w = e.groupBy("src", "dst").agg(F.sum("weight").alias("w"))
        outw = w.groupBy("src").agg(F.sum("w").alias("outw"))
        return w.join(outw, "src").select(
            "src", "dst", (F.col("w") / F.col("outw")).alias("p")
        )

    def init(e: DataFrame, ctx: dict) -> DataFrame:
        vertices = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        n = vertices.count()
        ctx["n"] = n
        return vertices.select("id", (F.lit(1.0) / F.lit(float(n))).alias("x"))

    def apply(state: DataFrame, combined: DataFrame, ctx: dict) -> DataFrame:
        return (
            state.join(combined, state["id"] == combined["dst"], "left_outer")
            .select(
                state["id"],
                F.coalesce(combined["x_sum"], F.lit(0.0)).alias("x"),
            )
        )

    program = VertexProgram(
        name="markov",
        init=init,
        prep_edges=prep,
        edge_cols=("src", "dst", "p"),
        # x · (w/outw): p IS (w/outw), so this is the pinned
        # parenthesization
        msg_cols=[(F.col("x") * F.col("p")).alias("m")],
        combiner={"x_sum": ("m", "sum")},
        apply=apply,
        aggregators=[F.sum("x").alias("mass_total")],
        halt=lambda aggs: False,
        finalize=lambda s: s.select("id", F.round("x", 9).alias("mass")),
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
