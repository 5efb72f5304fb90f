"""Exact 4-clique (K4) counting — the next motif up from A4's
triangles, the standard density/community-strength signal beyond
triangle count (clique-percolation communities use exactly these).

Semantics: per-vertex number of K4 subgraphs containing the vertex on
the canonical undirected simple graph, plus the global total.

Execution shape (design-for-100×): the same degree-(deg, id) DAG
orientation as the triangle kernel — every vertex's oriented
out-degree is O(sqrt(m)) on skewed graphs, so wedge and extension
fan-outs are hub-bounded.  Each K4 {a,b,c,d} sorted by the orientation
rank is enumerated EXACTLY once: its lowest-rank oriented triangle
(a,b,c) extended by the common oriented out-neighbor d of all three.
Three equi-joins against the once-persisted oriented table; per-vertex
counts are one explode + hash aggregate.  Counts are orientation-
independent, so the DuckDB twin may use the simpler id-canonical DAG
and still match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.algos.triangles import canonical_undirected


def four_clique_count(
    spark: SparkSession, edges: DataFrame
) -> tuple[DataFrame, int]:
    """Exact K4 counting.  Returns (per_vertex(id, k4) including zero
    rows for K4-free vertices, global_total)."""
    und = canonical_undirected(edges)
    deg = (
        und.select(F.col("lo").alias("id"))
        .unionByName(und.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        und.join(deg.withColumnsRenamed({"id": "lo", "deg": "deg_lo"}), "lo")
        .join(deg.withColumnsRenamed({"id": "hi", "deg": "deg_hi"}), "hi")
    )
    lo_first = (F.col("deg_lo") < F.col("deg_hi")) | (
        (F.col("deg_lo") == F.col("deg_hi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = e.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        F.when(lo_first, F.col("deg_hi")).otherwise(F.col("deg_lo"))
        .alias("deg_v"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    oriented.count()

    a = oriented.alias("a")
    b = oriented.alias("b")
    # oriented wedge (u -> v, u -> w) with rank(v) < rank(w): rank
    # order among out-neighbors == orientation order, so the closing
    # edge, when present, is oriented (v, w)
    wedges = a.join(b, F.col("a.u") == F.col("b.u")).where(
        (F.col("a.deg_v") < F.col("b.deg_v"))
        | ((F.col("a.deg_v") == F.col("b.deg_v"))
           & (F.col("a.v") < F.col("b.v")))
    ).select(
        F.col("a.u").alias("u"), F.col("a.v").alias("v"),
        F.col("b.v").alias("w"),
    )
    c = oriented.alias("c")
    tri = wedges.alias("wg").join(
        c,
        (F.col("wg.v") == F.col("c.u")) & (F.col("wg.w") == F.col("c.v")),
        "left_semi",
    ).select("u", "v", "w")

    # extend: x is a common oriented out-neighbor of u, v AND w — the
    # highest-rank corner, so each K4 appears exactly once
    ext = oriented.select(
        F.col("u").alias("w"), F.col("v").alias("x")
    )
    k4 = (
        tri.join(ext, "w")
        .join(
            oriented.select(F.col("u").alias("v"), F.col("v").alias("x")),
            ["v", "x"], "left_semi",
        )
        .join(
            oriented.select(F.col("u").alias("u"), F.col("v").alias("x")),
            ["u", "x"], "left_semi",
        )
        .select("u", "v", "w", "x")
    )
    corners = (
        k4.select(F.col("u").alias("id"))
        .unionByName(k4.select(F.col("v").alias("id")))
        .unionByName(k4.select(F.col("w").alias("id")))
        .unionByName(k4.select(F.col("x").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("k4"))
    )
    per_vertex = (
        deg.select("id")
        .join(corners, "id", "left_outer")
        .select("id", F.coalesce("k4", F.lit(0)).cast("long").alias("k4"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    total_row = per_vertex.agg(F.sum("k4").alias("t")).collect()[0]
    oriented.unpersist()
    return per_vertex, int((total_row["t"] or 0) // 4)
