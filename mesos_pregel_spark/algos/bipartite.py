"""Butterfly counting — the bipartite 2×2-biclique motif (two left
vertices sharing two right vertices), the bipartite analogue of the
triangle and the unit of bipartite clustering / community strength
(Wang et al., "Butterfly Counting in Bipartite Networks", KDD 2014;
Sanei-Mehri et al. 2018).

Semantics: over the DISTINCT bipartite edge set (left, right), a
butterfly is an unordered pair {l1, l2} × {r1, r2} with all four edges
present.  Per-vertex counts = butterflies containing the vertex;
total counted once per butterfly.

Pinned arithmetic: for a left pair sharing k right vertices the pair
contributes C(k,2) = k(k-1) div 2 butterflies — exact longs end to
end; per-vertex counts are hash aggregates of those longs.  The
left-side and right-side totals are equal by double counting (the
engine asserts this as a self-check — both derivations run anyway to
produce both sides' per-vertex counts).

Execution shape (design-for-100×): the standard exact algorithm —
per-side wedge aggregation (self-join on the shared endpoint, count
per pair), cost Σ_r C(deg r, 2) + Σ_l C(deg l, 2).  Skewed hubs
dominate that sum on any engine; the `max_degree` cap (drop wedge
CENTERS above the cap, documented bias, same knob as
structure.link_prediction's hub cap) bounds it when an approximate
count suffices.  All joins are equi-joins on one key — AQE handles
residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.plans.truncate import truncate_plan


def butterfly_counts(
    spark: SparkSession,
    edges: DataFrame,
    max_degree: int | None = None,
) -> tuple[DataFrame, int]:
    """Per-vertex butterfly counts over the distinct bipartite edge
    set ``edges`` (left, right = first two columns).  Returns
    (per_vertex(id, butterflies) — every vertex of either side, zero
    rows included, global_total)."""
    lcol, rcol = edges.columns[0], edges.columns[1]
    be = (
        edges.select(F.col(lcol).alias("l"), F.col(rcol).alias("r"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    be.count()

    def side(df, key, other):
        """Pair table over ``key`` wedges centered on ``other``:
        (x1 < x2, k shared centers) with per-pair C(k,2)."""
        src = df
        if max_degree is not None:
            centers = (
                df.groupBy(other).agg(F.count(F.lit(1)).alias("d"))
                .where(F.col("d") <= max_degree)
                .select(other)
            )
            src = df.join(centers, other, "left_semi")
        a, b = src.alias("a"), src.alias("b")
        return (
            a.join(b, F.col(f"a.{other}") == F.col(f"b.{other}"))
            .where(F.col(f"a.{key}") < F.col(f"b.{key}"))
            .groupBy(
                F.col(f"a.{key}").alias("x1"), F.col(f"b.{key}").alias("x2")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("k"))
            .select(
                "x1", "x2",
                F.expr("k * (k - 1) div 2").cast("long").alias("bf"),
            )
            .where(F.col("bf") > 0)
        )

    lp = side(be, "l", "r").persist(StorageLevel.MEMORY_AND_DISK)
    rp = side(be, "r", "l").persist(StorageLevel.MEMORY_AND_DISK)

    def per_vertex(pairs):
        return (
            pairs.select(F.col("x1").alias("id"), "bf")
            .unionByName(pairs.select(F.col("x2").alias("id"), "bf"))
            .groupBy("id")
            .agg(F.sum("bf").cast("long").alias("butterflies"))
        )

    verts = be.select(F.col("l").alias("id")).unionByName(
        be.select(F.col("r").alias("id"))
    ).distinct()
    # re-aggregate after the union: if an id appears on BOTH sides
    # (the generic two-column API never promised disjoint vertex
    # namespaces), it gets a row from each side's per-vertex table —
    # without this sum the left join below would emit duplicate rows
    # for that id, one per side
    counts = (
        per_vertex(lp).unionByName(per_vertex(rp))
        .groupBy("id")
        .agg(F.sum("butterflies").cast("long").alias("butterflies"))
    )
    out = truncate_plan(
        verts.join(counts, "id", "left_outer")
        .select(
            "id",
            F.coalesce("butterflies", F.lit(0)).cast("long")
            .alias("butterflies"),
        )
    )
    tl = lp.agg(F.sum("bf")).collect()[0][0] or 0
    tr = rp.agg(F.sum("bf")).collect()[0][0] or 0
    if max_degree is None:
        assert tl == tr, f"butterfly double-count mismatch: {tl} != {tr}"
    lp.unpersist()
    rp.unpersist()
    be.unpersist()
    return out, int(tl)


def bipartite_clustering(
    spark: SparkSession,
    edges: DataFrame,
    max_degree: int | None = None,
) -> DataFrame:
    """Robins-Alexander bipartite clustering coefficient — the
    C4-density analogue of transitivity: cc4 = 4·butterflies /
    caterpillars, where caterpillars (3-paths) = Σ over edges (l, r)
    of (deg l − 1)·(deg r − 1), both exact longs, ONE rounded
    division (NULL when the graph has no 3-path).  Butterfly total
    reuses butterfly_counts (left-pair derivation counts each C4
    once); the caterpillar sum is one degree join + one aggregate
    over the edge set.  Returns one row
    (butterflies, caterpillars, cc4)."""
    lcol, rcol = edges.columns[0], edges.columns[1]
    be = (
        edges.select(F.col(lcol).alias("l"), F.col(rcol).alias("r"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    be.count()
    try:
        degl = be.groupBy("l").agg(F.count(F.lit(1)).alias("dl"))
        degr = be.groupBy("r").agg(F.count(F.lit(1)).alias("dr"))
        cat = (
            be.join(degl, "l")
            .join(degr, "r")
            .agg(
                F.sum(
                    (F.col("dl") - 1).cast("long")
                    * (F.col("dr") - 1).cast("long")
                ).cast("long").alias("c")
            )
            .collect()[0]["c"]
        ) or 0
        _pv, bf = butterfly_counts(spark, be, max_degree=max_degree)
    finally:
        be.unpersist()
    row = spark.createDataFrame(
        [(int(bf), int(cat))], "butterflies long, caterpillars long"
    )
    return row.select(
        "butterflies",
        "caterpillars",
        F.when(
            F.col("caterpillars") > 0,
            F.round(
                F.lit(4.0) * F.col("butterflies").cast("double")
                / F.col("caterpillars").cast("double"),
                9,
            ),
        ).alias("cc4"),
    )
