"""Semi-clustering — the Pregel paper's semi-cluster example [P §5.3]:
every vertex accumulates the best C_max overlapping vertex groups
("semi-clusters", at most M_max members) it belongs to, scored by
internal- vs boundary-edge weight.  mesos-pregel ships this as a user
Compute program over list-valued messages; the reference dir is empty
(SURVEY §0), so semantics are pinned to the published paper text with
the deterministic choices below.

Pinned semantics:

- UNDIRECTED weighted graph (symmetrized, self-loops dropped,
  parallel edges collapsed); edge weights are INTEGER counts (the
  transcript/bipartite builders emit counts), carried as longs so
  every internal/boundary sum is exact and order-independent —
  which makes the score doubles BIT-IDENTICAL across engines.
- A semi-cluster is identified by its member set; canonical key =
  comma-joined ascending-sorted member ids.  For member set c:
  I_c = total weight of edges with both endpoints in c,
  B_c = total weight of edges with exactly one endpoint in c.
- Score S_c = (I_c - f_B * B_c) / (n(n-1)/2) with boundary factor
  f_B pinned to 1/2, i.e. S_c = (2*I_c - B_c) / (2 * n(n-1)/2) —
  an exact-integer numerator/denominator, divided once at the end.
  Singletons (n = 1) are pinned to score 0.0 (the paper leaves the
  n=1 denominator undefined; 0 ranks seeds below any net-positive
  cluster and above any net-negative one).
- Superstep 0: every vertex holds the singleton {v} with I=0,
  B = weighted degree.  Each superstep, every vertex sends its whole
  cluster list to every neighbor; a receiver v
    * keeps received clusters that already contain v,
    * extends received clusters with n < M_max and v not in c to
      c' = c + v, updating exactly: I' = I + W(v,c),
      B' = B + degw(v) - 2*W(v,c), where W(v,c) = total weight from
      v into c (set functions => any arrival order yields the same
      integers);
    * unions those with its previous list, dedupes by canonical key,
      and keeps the top C_max by (score DESC, key ASC).
- Fixed superstep count (the paper's max-superstep termination);
  the same unroll is the DuckDB twin, so parity is exact at any
  shared cap.

Why not the generic VertexProgram substrate: the merge step (dedupe
by member set + top-C_max selection) is not a sum/min/max combiner,
so this runs as a dedicated loop with the same hygiene — one
scatter-shaped join per superstep over src-partitioned edges and
``truncate_plan`` between supersteps.  State stays EXPLODED (one row
per (vertex, cluster)), never array-of-struct, so every step is plain
joins + window ranking (JVM whole-stage codegen; the only
higher-order function is the W(v,c) member-weight fold).

Design-for-100x: per-superstep message volume is O(E * C_max) rows
of (key, i, b) — the paper's own cost model; hub fan-in is bounded by
the top-C_max window per receiver, and the per-vertex neighbor-weight
map used for W(v,c) is bounded by ``cap_degree`` (hubs keep their
``cap_degree`` lexicographically-first neighbors for extension
bookkeeping; 0 = uncapped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mesos_pregel_spark.functions.edges import symmetrize
from mesos_pregel_spark.plans.truncate import truncate_plan


def _score() -> F.Column:
    """(2I - B) / (2 * n(n-1)/2) over (key, i, b); 0.0 for singletons.
    Exact-integer numerator and denominator -> identical doubles in
    Spark and DuckDB."""
    n = F.size(F.split(F.col("key"), ","))
    pairs = (n * (n - F.lit(1))).cast("long")  # == 2 * n(n-1)/2
    return (
        F.when(n == 1, F.lit(0.0))
        .otherwise(
            (F.lit(2) * F.col("i") - F.col("b")).cast("double")
            / pairs.cast("double")
        )
    )


def semi_clusters(
    spark: SparkSession,
    edges: DataFrame,
    supersteps: int = 3,
    c_max: int = 3,
    m_max: int = 4,
    cap_degree: int = 0,
    edge_partitions: int | None = None,
) -> DataFrame:
    """Run the pinned semi-clustering for ``supersteps`` rounds.
    Returns one row per (vertex, kept cluster):
    (id, rank, members, score) with rank 1..c_max by
    (score DESC, members ASC)."""
    parts = edge_partitions or spark.sparkContext.defaultParallelism
    sym = (
        symmetrize(edges.select("src", "dst", "weight"))
        .select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
            F.col("weight").cast("long").alias("wl"),
        )
        .repartition(parts, "src")
        .persist()
    )

    # per-vertex neighbor-weight map (for W(v,c)) and weighted degree;
    # degw is ALWAYS the full degree — only the extension bookkeeping
    # map is capped for hubs.
    nbr_src = sym.select("src", "dst", "wl")
    if cap_degree:
        w = Window.partitionBy("src").orderBy("dst")
        nbr_src = (
            nbr_src.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= cap_degree)
            .drop("_rn")
        )
    nbr = (
        sym.groupBy("src").agg(F.sum("wl").alias("degw"))
        .join(
            nbr_src.groupBy("src").agg(
                F.map_from_entries(
                    F.collect_list(F.struct("dst", "wl"))
                ).alias("nbrw")
            ),
            "src",
        )
        .withColumnRenamed("src", "id")
        .persist()
    )

    # superstep 0: singleton {v}, I = 0, B = degw(v)
    state = nbr.select(
        "id",
        F.col("id").alias("key"),
        F.lit(0).cast("long").alias("i"),
        F.col("degw").alias("b"),
    )
    state = truncate_plan(state.repartition(parts, "id"))

    for _ in range(supersteps):
        # every vertex's list rides its outgoing edges
        msgs = (
            sym.join(state, sym["src"] == state["id"])
            .select(sym["dst"].alias("id"), "key", "i", "b")
        )
        members = F.split(F.col("key"), ",")
        has_me = F.array_contains(members, F.col("id"))
        keep = msgs.where(has_me).select("id", "key", "i", "b")
        ext = (
            msgs.where(~has_me & (F.size(members) < m_max))
            .join(nbr, "id")
            .withColumn(
                "w_in",
                F.aggregate(
                    members,
                    F.lit(0).cast("long"),
                    lambda acc, m: acc
                    + F.coalesce(
                        F.element_at(F.col("nbrw"), m), F.lit(0).cast("long")
                    ),
                ),
            )
            .select(
                "id",
                F.concat_ws(
                    ",", F.array_sort(F.array_append(members, F.col("id")))
                ).alias("key"),
                (F.col("i") + F.col("w_in")).alias("i"),
                (F.col("b") + F.col("degw") - 2 * F.col("w_in")).alias("b"),
            )
        )
        cands = (
            state.unionByName(keep).unionByName(ext)
            # same key => same member set => identical exact (i, b)
            .groupBy("id", "key").agg(F.min("i").alias("i"),
                                      F.min("b").alias("b"))
        )
        rank_w = Window.partitionBy("id").orderBy(
            _score().desc(), F.col("key").asc()
        )
        state = (
            cands.withColumn("rank", F.row_number().over(rank_w))
            .where(F.col("rank") <= c_max)
            .select("id", "key", "i", "b")
        )
        state = truncate_plan(state.repartition(parts, "id"))

    rank_w = Window.partitionBy("id").orderBy(
        _score().desc(), F.col("key").asc()
    )
    out = state.select(
        "id",
        F.row_number().over(rank_w).alias("rank"),
        F.col("key").alias("members"),
        F.round(_score(), 9).alias("score"),
    )
    out = out.localCheckpoint()
    sym.unpersist()
    nbr.unpersist()
    return out
