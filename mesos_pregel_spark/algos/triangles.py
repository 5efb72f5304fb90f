"""A4 — Triangle count (global + per-vertex).

Pinned semantics (SURVEY §2.2 A4): undirected triangles after
canonicalization — drop self-loops, collapse multi-edges, keep each
undirected edge once as (lo, hi).  EXACT counts; every triangle
credits all three corners.

Physical strategy (the scale path): degree-ordered orientation.  Each
canonical edge is oriented from its lower-(degree, id) endpoint to the
higher one, so every vertex's oriented out-degree is O(sqrt(m)) even
for hubs — the classic bound that keeps the wedge self-join from
exploding on skewed graphs.  Two joins total:

    wedges  = A ⋈ A  on shared source   (pairs of out-neighbors,
              ordered by (deg, id) so each wedge appears once)
    closed  = wedges ⋈ A on the closing edge

Spark executes both as hash joins with AQE skew splitting as backstop;
no iteration, no window over the full vertex set.

An alternative CSR kernel (sorted-adjacency numpy intersections inside
``applyInPandas``) lives in operators/csr.py for the per-partition
path (SURVEY §2.2 A4 "OR CSR-partition applyInPandas").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """(lo, hi) per undirected edge — self-loops out, multi-edges collapsed."""
    return (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )


def triangle_tuples(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Enumerate the distinct triangles themselves — (a, b, c) with
    a < b < c — via the same degree-oriented wedge kernel as
    triangle_count (each triangle emitted exactly once from its
    lowest-rank corner; wedge work bounded by oriented out-degrees,
    the hub-safe shape).

    Returns a PERSISTED DataFrame (a, b, c); the caller owns the
    unpersist.  Sorting the tuple to id order (vs orientation order)
    costs one sort_array over a 3-element literal array — no shuffle."""
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
        F.when(lo_first, F.col("deg_hi")).otherwise(F.col("deg_lo")).alias("deg_v"),
    )
    from pyspark.storagelevel import StorageLevel
    oriented = oriented.persist(StorageLevel.MEMORY_AND_DISK)
    a, b = oriented.alias("a"), oriented.alias("b")
    wedges = a.join(b, F.col("a.u") == F.col("b.u")).where(
        (F.col("a.deg_v") < F.col("b.deg_v"))
        | ((F.col("a.deg_v") == F.col("b.deg_v")) & (F.col("a.v") < F.col("b.v")))
    ).select(
        F.col("a.u").alias("u"), F.col("a.v").alias("v"), F.col("b.v").alias("w")
    )
    wg, c = wedges.alias("wg"), oriented.alias("c")
    tri = wg.join(
        c, (F.col("wg.v") == F.col("c.u")) & (F.col("wg.w") == F.col("c.v"))
    ).select(
        F.sort_array(F.array("wg.u", "wg.v", "wg.w")).alias("abc")
    ).select(
        F.col("abc")[0].alias("a"),
        F.col("abc")[1].alias("b"),
        F.col("abc")[2].alias("c"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tri.count()  # materialize so the oriented cache can be released
    oriented.unpersist()
    return tri


def triangle_count(
    spark: SparkSession, edges: DataFrame, kernel: str = "join"
) -> tuple[DataFrame, int]:
    """Exact triangle counting.

    Returns (per_vertex(id, triangles) including zero rows for
    triangle-free vertices, global_total).

    ``kernel='csr'`` uses the broadcast sorted-adjacency numpy kernel
    (operators/csr.py) instead of the wedge joins — same pinned
    semantics, chosen when the oriented adjacency fits a broadcast.
    """
    und = canonical_undirected(edges)

    # Undirected degree per vertex (for orientation and zero-fill).
    deg = (
        und.select(F.col("lo").alias("id"))
        .unionByName(und.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    # Orient each edge from lower (deg, id) to higher (deg, id).
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
        F.when(lo_first, F.col("deg_hi")).otherwise(F.col("deg_lo")).alias("deg_v"),
    )
    # The oriented table is referenced three times downstream (both
    # wedge sides + the closing join; or toPandas + mapInPandas in the
    # CSR path).  Materialize it ONCE — without this, the whole
    # canonicalize/degree/orient subplan re-executes per reference
    # (measured 28-35s vs ~7s at 1M edges).
    from pyspark.storagelevel import StorageLevel
    oriented = oriented.persist(StorageLevel.MEMORY_AND_DISK)

    if kernel == "csr":
        from mesos_pregel_spark.operators.csr import csr_triangle_counts
        counts_csr = csr_triangle_counts(spark, oriented)
        per_vertex = (
            deg.select("id")
            .join(counts_csr, "id", "left_outer")
            .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        total_row = per_vertex.agg(F.sum("triangles").alias("t")).collect()[0]
        oriented.unpersist()  # per_vertex is materialized; safe to drop
        return per_vertex, int((total_row["t"] or 0) // 3)

    # Wedges: two out-neighbors of the same source, rank-ordered so each
    # unordered pair appears exactly once.
    a = oriented.alias("a")
    b = oriented.alias("b")
    wedges = a.join(b, F.col("a.u") == F.col("b.u")).where(
        (F.col("a.deg_v") < F.col("b.deg_v"))
        | ((F.col("a.deg_v") == F.col("b.deg_v")) & (F.col("a.v") < F.col("b.v")))
    ).select(
        F.col("a.u").alias("u"), F.col("a.v").alias("v"), F.col("b.v").alias("w")
    )

    # Close the wedge: oriented edge (v, w) exists (v precedes w by rank,
    # which the wedge ordering above guarantees matches the orientation).
    wg = wedges.alias("wg")
    c = oriented.alias("c")
    tri = wg.join(
        c, (F.col("wg.v") == F.col("c.u")) & (F.col("wg.w") == F.col("c.v"))
    ).select(F.col("wg.u").alias("u"), F.col("wg.v").alias("v"),
             F.col("wg.w").alias("w"))

    corners = (
        tri.select(F.col("u").alias("id"))
        .unionByName(tri.select(F.col("v").alias("id")))
        .unionByName(tri.select(F.col("w").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    per_vertex = (
        deg.select("id")
        .join(counts, "id", "left_outer")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    total_row = per_vertex.agg(F.sum("triangles").alias("t")).collect()[0]
    total = int((total_row["t"] or 0) // 3)
    oriented.unpersist()  # per_vertex is materialized; safe to drop
    return per_vertex, total
