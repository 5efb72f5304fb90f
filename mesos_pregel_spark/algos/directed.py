"""Directed-graph analytics: reciprocity and the directed triangle
census (cyclic vs transitive motifs) — the direction-aware cousins of
A4's undirected triangle kernel.

Semantics (standard network-science definitions; Wasserman-Faust triad
census restricted to the two closed-triangle classes, Garlaschelli-
Loffredo 2004 for reciprocity): over the DISTINCT directed edge set
(src, dst), src != dst —

- reciprocity r = |{(u,v) in E : (v,u) in E}| / |E|.  The numerator
  counts ORDERED mutual pairs (both directions of a mutual dyad), the
  standard definition.
- a CYCLIC triangle is a directed 3-cycle u->v->w->u; each cycle is
  counted once via its unique rotation starting at the minimum vertex
  (u < v AND u < w).
- a TRANSITIVE triplet is an ordered triple (u->v, v->w, u->w) of
  distinct vertices — the directed path that is "closed the consistent
  way"; counted once per ordered occurrence (the directed analogue of
  the wedge-closure ratio's numerator).

Pinned arithmetic: every count is an exact long from hash aggregates
of equi-joins; reciprocity is ONE rounded double division of exact
longs (no-FP-in-the-aggregate discipline).

Execution shape (design-for-100×): all joins are equi-joins on one or
two integer/string keys over the distinct edge set — no cross joins,
no Python.  The path join's row count is Σ_v indeg(v)·outdeg(v); the
`max_degree` cap (drop vertices whose total distinct degree exceeds
the cap, documented bias — same knob as bipartite.butterfly_counts)
bounds it on hub-skewed graphs when an approximate census suffices.
AQE handles residual key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.plans.truncate import truncate_plan


def _distinct_directed(edges: DataFrame, max_degree: int | None) -> DataFrame:
    src, dst = edges.columns[0], edges.columns[1]
    de = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if max_degree is not None:
        deg = (
            de.select(F.col("src").alias("id"))
            .unionByName(de.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_degree)
            .select("id")
        )
        de = (
            de.join(deg.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(deg.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
    return de


def reciprocity(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """One row (total_edges, mutual_edges, n_vertices, reciprocity,
    rho): the fraction r of distinct directed edges whose reverse also
    exists, plus the density-corrected reciprocity rho of
    Garlaschelli-Loffredo 2004 — rho = (r − a)/(1 − a) with edge
    density a = m/(n(n−1)), reduced to (mut·N − m²)/(m·N − m²) with
    N = n(n−1).  rho > 0 means more mutual dyads than a
    density-matched random digraph (NULL when the graph is complete
    or empty — the correction is undefined, guarded by the
    overflow-free integer test m > 0 AND m < N).

    Arithmetic contract: the counts are exact longs; rho's PRODUCTS
    are evaluated in IEEE double (m·N overflows int64 around 2e6
    dense vertices — Spark 4's ANSI mode would throw, pre-ANSI would
    silently wrap).  Both engines evaluate the identical op sequence
    (convert-then-multiply-then-divide), so the doubles stay
    bit-identical cross-engine at any scale; below 2^53 the products
    are also exact.  One left-semi self-join + three counts; ratios
    rounded to 9dp, r = 0.0 on an empty edge set (pinned in the SQL
    twin)."""
    de = _distinct_directed(edges, None).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        rev = de.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        nv = (
            de.select(F.col("src").alias("id"))
            .unionByName(de.select(F.col("dst").alias("id")))
            .distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
        )
        m, mut = F.col("total_edges"), F.col("mutual_edges")
        md = m.cast("double")
        mutd = mut.cast("double")
        nd = F.col("n_vertices").cast("double")
        cap = nd * (nd - F.lit(1.0))
        out = truncate_plan(
            de.join(rev, ["src", "dst"], "left_semi")
            .agg(F.count(F.lit(1)).cast("long").alias("mutual_edges"))
            .crossJoin(F.broadcast(
                de.agg(F.count(F.lit(1)).cast("long").alias("total_edges"))
            ))
            .crossJoin(F.broadcast(nv))
            .select(
                "total_edges",
                "mutual_edges",
                "n_vertices",
                F.when(m > 0, F.round(mutd / md, 9))
                .otherwise(F.lit(0.0)).alias("reciprocity"),
                # denominator m(N−m) > 0 ⟺ 0 < m < N: product-free guard
                F.when((m > 0) & (md < cap),
                       F.round(
                           (mutd * cap - md * md)
                           / (md * cap - md * md), 9))
                .alias("rho"),
            )
        )
    finally:
        de.unpersist()
    return out


def triangle_census(
    spark: SparkSession,
    edges: DataFrame,
    max_degree: int | None = None,
) -> DataFrame:
    """One row (cyclic_triangles, transitive_triplets) — exact counts
    of the two closed directed-triangle motifs over the distinct edge
    set.  Cycles are min-vertex-rooted so each directed 3-cycle counts
    once; transitive triplets count once per ordered occurrence."""
    de = _distinct_directed(edges, max_degree).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        e1, e2, e3 = de.alias("e1"), de.alias("e2"), de.alias("e3")
        cyc = (
            e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
            .join(e3, (F.col("e2.dst") == F.col("e3.src"))
                  & (F.col("e3.dst") == F.col("e1.src")))
            .where((F.col("e1.src") < F.col("e1.dst"))
                   & (F.col("e1.src") < F.col("e2.dst")))
            .agg(F.count(F.lit(1)).cast("long").alias("cyclic_triangles"))
        )
        tra = (
            e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
            .where(F.col("e1.src") != F.col("e2.dst"))
            .join(e3, (F.col("e3.src") == F.col("e1.src"))
                  & (F.col("e3.dst") == F.col("e2.dst")), "left_semi")
            .agg(F.count(F.lit(1)).cast("long").alias("transitive_triplets"))
        )
        out = truncate_plan(cyc.crossJoin(F.broadcast(tra)))
    finally:
        de.unpersist()
    return out


def directed_assortativity(
    spark: SparkSession, edges: DataFrame
) -> DataFrame:
    """The four directed degree-correlation coefficients (Foster,
    Foster, Grassberger, Paczuski, PNAS 2010): for every edge u→v and
    every mode pair (α, β) ∈ {out, in}², the Pearson correlation of
    (α-degree of u, β-degree of v) — a directed graph has FOUR
    assortativities, and their signs disagree on real networks (the
    paper's point; the undirected scalar A16 reports hides this).

    Pinned semantics: self-loops dropped, parallel edges collapsed;
    all 24 sufficient statistics (n and Σx, Σy, Σx², Σy², Σxy per
    mode) are exact BIGINT sums aggregated in ONE pass over the
    degree-joined edge table, so the four r values are fixed double
    expressions over identical integers in both engines (the A16
    discipline), rounded to 9dp; a zero-variance side reports NULL r.
    At 100-TB edge counts promote the products to decimal(38,0) — the
    plan shape is unchanged.

    Shape (design-for-100x): two degree aggregates, one full outer
    join into a |V|-row degree table (AQE-broadcast when small), one
    edge scan with two hash joins, ONE 24-column aggregate; output is
    exactly 4 rows.  Returns (mode, n_edges, r).
    """
    de = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    od = de.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("dout")
    )
    idg = de.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("din")
    )
    degs = (
        od.join(idg, "id", "full_outer")
        .select(
            "id",
            F.coalesce("dout", F.lit(0)).cast("long").alias("dout"),
            F.coalesce("din", F.lit(0)).cast("long").alias("din"),
        )
    )
    p = (
        de.join(
            degs.withColumnsRenamed(
                {"id": "src", "dout": "so", "din": "si"}), "src")
        .join(
            degs.withColumnsRenamed(
                {"id": "dst", "dout": "to", "din": "ti"}), "dst")
    )
    modes = {
        "out-out": ("so", "to"),
        "out-in": ("so", "ti"),
        "in-out": ("si", "to"),
        "in-in": ("si", "ti"),
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    for m, (x, y) in modes.items():
        tag = m.replace("-", "_")
        aggs += [
            F.sum(x).alias(f"sx_{tag}"),
            F.sum(y).alias(f"sy_{tag}"),
            F.sum(F.col(x) * F.col(x)).alias(f"sxx_{tag}"),
            F.sum(F.col(y) * F.col(y)).alias(f"syy_{tag}"),
            F.sum(F.col(x) * F.col(y)).alias(f"sxy_{tag}"),
        ]
    s = p.agg(*aggs)
    out = None
    for m in modes:
        tag = m.replace("-", "_")
        n = F.col("n")
        num = (n * F.col(f"sxy_{tag}")
               - F.col(f"sx_{tag}") * F.col(f"sy_{tag}")).cast("double")
        denx = (n * F.col(f"sxx_{tag}")
                - F.col(f"sx_{tag}") * F.col(f"sx_{tag}")).cast("double")
        deny = (n * F.col(f"syy_{tag}")
                - F.col(f"sy_{tag}") * F.col(f"sy_{tag}")).cast("double")
        row = s.select(
            F.lit(m).alias("mode"),
            n.cast("long").alias("n_edges"),
            F.when(
                (denx > 0) & (deny > 0),
                F.round(num / F.sqrt(denx * deny), 9),
            ).alias("r"),
        )
        out = row if out is None else out.unionByName(row)
    return out
