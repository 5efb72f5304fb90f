"""A2 — Connected components via hash-min label propagation.

Pinned semantics (SURVEY §2.2 A2; CC is the canonical "min" combiner
example [P §3.2]):

- Undirected: edges are symmetrized once up front.
- init comp_v = id_v; each superstep comp_v = min(comp_v, min(msgs)).
- Frontier/delta optimization: only vertices whose comp changed last
  superstep send (exactly Pregel's vote-to-halt — a vertex halts when
  its value stops changing and is reactivated by an incoming smaller
  label).  The runner swaps the scatter join to broadcast-hash when
  the frontier falls under ``broadcast_threshold`` rows (SURVEY §4.3).
- Terminate when no vertex changed.  EXACT match required.

Expressed as a :class:`VertexProgram` on plans/program.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.functions.edges import symmetrize
from mesos_pregel_spark.plans.pregel import PregelRun
from mesos_pregel_spark.plans.program import VertexProgram, pregel


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

    def init(e: DataFrame, ctx: dict) -> DataFrame:
        # symmetrized: src set == dst set == all non-isolated vertices
        vertices = e.select(F.col("src").alias("id")).distinct()
        return vertices.select(
            "id", F.col("id").alias("comp"), F.lit(True).alias("changed")
        )

    def apply(state: DataFrame, combined: DataFrame, ctx: dict) -> DataFrame:
        return (
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

    program = VertexProgram(
        name="cc",
        init=init,
        prep_edges=lambda e: symmetrize(e.select("src", "dst", "weight"))
        .select("src", "dst"),
        edge_cols=("src", "dst"),
        msg_cols=[F.col("comp").alias("msg")],
        active_filter=F.col("changed"),
        combiner={"msg_min": ("msg", "min")},
        apply=apply,
        aggregators=[
            F.sum(F.col("changed").cast("long")).alias("active"),
            F.count(F.lit(1)).alias("n_vertices"),
        ],
        halt=lambda aggs: aggs["active"] == 0,
        frontier_agg="active",
        finalize=lambda s: s.select("id", F.col("comp").alias("component")),
    )
    return pregel(
        spark, edges, program,
        max_supersteps=max_supersteps,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        n_salt=n_salt, salt_hot_k=salt_hot_k,
        broadcast_threshold=broadcast_threshold,
        edge_partitions=edge_partitions,
    )
