"""Personalized PageRank — the first algorithm VERDICT r01 named as
"what a user would build next" on the generic vertex-program API, and
exactly the kind of mesos-pregel user program the engine must host
without engine changes.  ~40 declarative lines on plans/program.py.

Pinned semantics (mirrors A1's Pregel-paper variant, with the teleport
mass concentrated on a source set instead of uniform):

    pr'_v = (1-d)·e_v + d · Σ_{u→v} pr_u / outdeg_u      (d = 0.85)
    e_v   = 1/|S| if v ∈ S else 0                        (S = sources)

- init pr_v = e_v; dangling mass leaks (no renormalization).
- Converge when max_v |pr'_v − pr_v| < tol.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.plans.pregel import PregelRun
from mesos_pregel_spark.plans.program import VertexProgram, pregel


def personalized_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    sources: Sequence,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_supersteps: int = 100,
    edge_partitions: int | None = None,
    n_salt: int = 0,
    salt_hot_k: int = 0,
) -> tuple[DataFrame, PregelRun]:
    """Run PPR from ``sources``.  Returns (ranks(id, ppr), run)."""
    if not sources:
        raise ValueError("personalized_pagerank needs a non-empty source set")
    src_list = list(sources)
    e_mass = 1.0 / float(len(src_list))

    def teleport_col():
        return F.when(
            F.col("id").isin(src_list), F.lit(e_mass)
        ).otherwise(F.lit(0.0))

    def init(e: DataFrame, ctx: dict) -> DataFrame:
        vertices = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        outdeg = e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("outdeg")
        )
        return (
            vertices.join(outdeg, "id", "left_outer")
            .select(
                "id",
                F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
                teleport_col().alias("pr"),
            )
        )

    def apply(state: DataFrame, combined: DataFrame, ctx: dict) -> DataFrame:
        return (
            state.join(combined, state["id"] == combined["dst"], "left_outer")
            .select(
                state["id"],
                state["outdeg"],
                (
                    F.lit(1.0 - damping) * teleport_col()
                    + F.lit(damping) * F.coalesce(combined["msg_sum"], F.lit(0.0))
                ).alias("pr"),
                state["pr"].alias("pr_prev"),
            )
            .withColumn("delta", F.abs(F.col("pr") - F.col("pr_prev")))
            .drop("pr_prev")
        )

    program = VertexProgram(
        name="ppr",
        init=init,
        prep_edges=lambda e: e.select("src", "dst").distinct(),
        edge_cols=("src", "dst"),
        msg_cols=[(F.col("pr") / F.col("outdeg")).alias("msg")],
        active_filter=(F.col("outdeg") > 0) & (F.col("pr") > 0),
        combiner={"msg_sum": ("msg", "sum")},
        apply=apply,
        aggregators=[
            F.max("delta").alias("max_delta"),
            F.sum("pr").alias("pr_mass"),
        ],
        halt=lambda aggs: aggs["max_delta"] < tol,
        finalize=lambda s: s.select("id", F.col("pr").alias("ppr")),
        params={"damping": damping, "tol": tol,
                "sources": sorted(map(str, src_list))},
    )
    return pregel(
        spark, edges, program,
        max_supersteps=max_supersteps,
        n_salt=n_salt, salt_hot_k=salt_hot_k,
        edge_partitions=edge_partitions,
    )
