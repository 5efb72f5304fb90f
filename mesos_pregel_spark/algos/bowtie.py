"""Bow-tie decomposition of a directed graph (Broder et al., "Graph
structure in the Web", WWW 2000) — the canonical link-graph structure
report: the giant strongly connected CORE, the IN set (reaches the
core), the OUT set (reachable from the core), and everything else
(tendrils + disconnected, lumped as OTHER; Broder's finer tendril
split needs two more reach passes and adds nothing to the health
check this implements).

Pinned semantics (mirrored by the DuckDB twin, queries.SQL_BOWTIE):

- Vertices = src ∪ dst of the distinct-collapsed directed edge set.
- CORE = the largest SCC, ties broken toward the SMALLEST SCC label
  (labels are SCC-minimum vertex ids, so the tie-break is total).
- IN  = vertices that reach the core, not in it (backward BFS from
  the core over reversed edges).
- OUT = vertices the core reaches, not in it.  IN ∩ OUT \\ CORE is
  empty by construction (a vertex both reaching and reached by the
  core is IN the core's SCC).
- Output: one row per NON-EMPTY class, (cls, n_vertices, share);
  share is ONE rounded division of exact longs.

Execution shape (design-for-100×): one SCC run (path doubling, the
engine's A-scc kernel), two monotone BFS flag propagations — each
superstep is one scatter from the fresh frontier + one sum combine,
the same vote-to-halt economics as CC — and two hash aggregates.
The only driver-side value is the giant SCC's 1-row (size, label)
pick."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mesos_pregel_spark.plans.pregel import PregelRun
from mesos_pregel_spark.plans.program import VertexProgram, pregel


def reachable_from(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    reverse: bool = False,
    max_supersteps: int = 40,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Monotone BFS reachability from a seed set: (id, reached) for
    every vertex of the directed graph; ``reverse=True`` follows
    edges backward (who can reach the seeds).  The frontier is the
    scatter's active_filter, so late supersteps touch only the
    expanding boundary; reached is monotone, and the run halts when a
    superstep adds nothing."""

    def prep(e: DataFrame) -> DataFrame:
        e = e.select("src", "dst").distinct()
        if reverse:
            e = e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        return e

    def init(e: DataFrame, ctx: dict) -> DataFrame:
        vertices = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        s = seeds.select("id", F.lit(True).alias("seeded"))
        return vertices.join(s, "id", "left_outer").select(
            "id",
            F.coalesce("seeded", F.lit(False)).alias("reached"),
            F.coalesce("seeded", F.lit(False)).alias("fresh"),
        )

    def apply(state: DataFrame, combined: DataFrame, ctx: dict) -> DataFrame:
        hit = F.coalesce(combined["hits"], F.lit(0)) > 0
        newly = (~state["reached"]) & hit
        return (
            state.join(combined, state["id"] == combined["dst"], "left_outer")
            .select(
                state["id"],
                (state["reached"] | newly).alias("reached"),
                newly.alias("fresh"),
            )
        )

    program = VertexProgram(
        name="reach",
        init=init,
        prep_edges=prep,
        edge_cols=("src", "dst"),
        msg_cols=[F.lit(1).cast("long").alias("m")],
        active_filter=F.col("fresh"),
        combiner={"hits": ("m", "sum")},
        apply=apply,
        aggregators=[F.sum(F.col("fresh").cast("long")).alias("fresh_count")],
        halt=lambda aggs: aggs["fresh_count"] == 0,
        finalize=lambda s: s.select("id", "reached"),
        converged_at_cap=True,
        params={"reverse": reverse},
    )
    return pregel(
        spark, edges, program,
        max_supersteps=max_supersteps,
        edge_partitions=edge_partitions,
    )


def bowtie(
    spark: SparkSession,
    edges: DataFrame,
    max_supersteps: int = 40,
    edge_partitions: int | None = None,
) -> DataFrame:
    """Bow-tie class profile (cls, n_vertices, share) — see module
    docstring for the pinned CORE/IN/OUT/OTHER semantics."""
    from mesos_pregel_spark.algos.scc import strongly_connected_components

    labels, _run = strongly_connected_components(
        spark, edges, edge_partitions=edge_partitions
    )
    sizes = labels.groupBy("scc").agg(F.count(F.lit(1)).alias("n"))
    giant = sizes.orderBy(F.desc("n"), F.asc("scc")).limit(1).collect()[0][
        "scc"
    ]
    core = labels.where(F.col("scc") == F.lit(giant)).select("id")
    fwd, _ = reachable_from(
        spark, edges, core, reverse=False,
        max_supersteps=max_supersteps, edge_partitions=edge_partitions,
    )
    bwd, _ = reachable_from(
        spark, edges, core, reverse=True,
        max_supersteps=max_supersteps, edge_partitions=edge_partitions,
    )
    cls = (
        labels.select("id", (F.col("scc") == F.lit(giant)).alias("is_core"))
        .join(
            fwd.where("reached").select("id", F.lit(True).alias("f")),
            "id", "left_outer",
        )
        .join(
            bwd.where("reached").select("id", F.lit(True).alias("b")),
            "id", "left_outer",
        )
        .select(
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("b").isNotNull(), F.lit("in"))
            .when(F.col("f").isNotNull(), F.lit("out"))
            .otherwise(F.lit("other"))
            .alias("cls")
        )
    )
    counts = cls.groupBy("cls").agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )
    # total via a whole-frame window over the ≤4-row class counts: a
    # separate aggregate would re-run the full label/reach join job
    w = Window.partitionBy()
    return counts.select(
        "cls",
        "n_vertices",
        F.round(
            F.col("n_vertices").cast("double")
            / F.sum("n_vertices").over(w).cast("double"),
            9,
        ).alias("share"),
    )
