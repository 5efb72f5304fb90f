"""Community-quality analytics over a vertex-labelling: per-community
size / internal edges / volume / cut / conductance and Newman
modularity, with EXACT integer arithmetic everywhere except the two
final reported ratios.

Semantics (Newman & Girvan 2004, standard undirected form):

  Q = sum_c ( e_c / m  -  (vol_c / 2m)^2 )

over the canonical undirected simple graph (self-loops dropped,
multi-edges collapsed — the engine's triangle/k-truss substrate):
m = |und|, e_c = internal edges of community c, vol_c = sum of
distinct-neighbour degrees.  Per community the numerator is held as
the exact integer 4*m*e_c - vol_c^2 over denominator 4*m^2, so the
argsum is order-independent and both engines (Spark / the DuckDB
twin) perform ONE double division of identical integers — the same
no-FP-in-the-aggregate discipline as structure.densest_subgraph.

Conductance(c) = cut_c / min(vol_c, 2m - vol_c) with cut_c =
vol_c - 2*e_c, defined 0.0 when the denominator is 0 (a community
holding the whole graph has cut 0).

Scale shape: two hash aggregates over the labelled edge/degree tables
(the label join is a plain equi-join on vertex id — broadcast when
labels are small, shuffled otherwise, Catalyst/AQE's choice) plus one
scalar m.  No iteration, no window over a whole community, nothing
proportional to community size on a single task — a 100-TB edge set
with a dominant community still distributes, because every per-
community quantity is a partial-aggregable SUM/COUNT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.algos.triangles import canonical_undirected
from mesos_pregel_spark.algos.structure import _und_degrees


def community_stats(
    spark: SparkSession, edges: DataFrame, labels: DataFrame
) -> DataFrame:
    """Per-community stats for ``labels`` (id, label) over the
    canonical undirected form of ``edges`` (src, dst[, weight]).

    Returns (label, n_vertices, internal_edges, volume, cut,
    conductance, modularity_part) — one row per community that owns at
    least one graph vertex.  All counts are exact longs; conductance
    and modularity_part are the only doubles, each produced by a
    single division of exact integers and rounded to 9 digits.
    """
    und = canonical_undirected(edges)
    deg = _und_degrees(und)
    m = und.count()

    lab = labels.select("id", "label")
    vol = (
        deg.join(lab, "id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("deg").cast("long").alias("volume"),
        )
    )
    internal = (
        und.join(lab.withColumnsRenamed({"id": "lo", "label": "l1"}), "lo")
        .join(lab.withColumnsRenamed({"id": "hi", "label": "l2"}), "hi")
        .where(F.col("l1") == F.col("l2"))
        .groupBy(F.col("l1").alias("label"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )

    e_in = F.coalesce("internal_edges", F.lit(0)).cast("long")
    cut = (F.col("volume") - 2 * e_in).cast("long")
    cond_den = F.least(F.col("volume"), F.lit(2 * m) - F.col("volume"))
    # exact integer numerator / denominator; ONE double division each
    mod_num = (F.lit(4 * m) * e_in - F.col("volume") * F.col("volume")).cast(
        "long"
    )
    mod_den = float(4 * m * m) if m else 1.0
    return (
        vol.join(internal, "label", "left_outer")
        .select(
            "label",
            "n_vertices",
            e_in.alias("internal_edges"),
            "volume",
            cut.alias("cut"),
            F.round(
                F.when(cond_den == 0, F.lit(0.0)).otherwise(
                    cut.cast("double") / cond_den.cast("double")
                ),
                9,
            ).alias("conductance"),
            F.round(mod_num.cast("double") / F.lit(mod_den), 9).alias(
                "modularity_part"
            ),
        )
    )


def modularity(
    spark: SparkSession, edges: DataFrame, labels: DataFrame
) -> DataFrame:
    """Global Newman modularity of ``labels`` over ``edges``.

    One row: (n_communities, modularity).  The sum runs over the exact
    integer numerators (order-independent), then divides once.
    """
    und = canonical_undirected(edges)
    deg = _und_degrees(und)
    m = und.count()
    lab = labels.select("id", "label")

    vol = (
        deg.join(lab, "id")
        .groupBy("label")
        .agg(F.sum("deg").cast("long").alias("volume"))
    )
    internal = (
        und.join(lab.withColumnsRenamed({"id": "lo", "label": "l1"}), "lo")
        .join(lab.withColumnsRenamed({"id": "hi", "label": "l2"}), "hi")
        .where(F.col("l1") == F.col("l2"))
        .groupBy(F.col("l1").alias("label"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    e_in = F.coalesce("internal_edges", F.lit(0)).cast("long")
    num = (F.lit(4 * m) * e_in - F.col("volume") * F.col("volume")).cast("long")
    den = float(4 * m * m) if m else 1.0
    return (
        vol.join(internal, "label", "left_outer")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.round(F.sum(num).cast("double") / F.lit(den), 9).alias(
                "modularity"
            ),
        )
    )


def greedy_modularity(
    spark: SparkSession,
    edges: DataFrame,
    steps: int = 4,
) -> DataFrame:
    """Synchronous Louvain-style local-move community detection:
    ``steps`` rounds where EVERY vertex simultaneously considers the
    neighbouring communities' exact-integer modularity scores against
    the PREVIOUS round's labelling (so a round is order-independent,
    unlike classic sequential Louvain).

    Pinned transition rule (all quantities exact integers):

      score(v, c) = 2m * k_vc - deg(v) * (vol(c) - deg(v) * [c = l(v)])

    where k_vc = |N(v) in c| under the previous labels, vol(c) = the
    previous community volume, and the own-community volume excludes
    v's own degree (the standard stay-vs-move correction, Blondel et
    al. 2008 eq. 2 with the constant terms dropped).  v moves to the
    best candidate among {own} ∪ {neighbour communities c with
    c < l(v) AND score(v,c) > score(v, own)} — the MONOTONE min-label
    restriction used by distributed Louvain variants (Lu, Halappanavar
    & Kalyanaraman 2015 §4) to kill the synchronous two-cycle where
    adjacent singletons endlessly swap labels: per-vertex labels never
    increase, so the process terminates, and every accepted move has
    strictly positive gain under last round's volumes.  Ties break
    toward the smallest label; l0(v) = v.  Deterministic, so an
    unrolled SQL twin reproduces it bit-for-bit.

    Scale shape per round: one adjacency-label equi-join (the scatter),
    two hash aggregates (k_vc and community volumes), one min_by argmax
    — every aggregate map-side combinable, nothing proportional to a
    community's size on one task.  Returns labels (id, label).
    """
    from mesos_pregel_spark.plans.truncate import truncate_plan

    und = canonical_undirected(edges).persist()
    deg = truncate_plan(_und_degrees(und)).persist()
    m = und.count()
    adj = und.select(
        F.col("lo").alias("v"), F.col("hi").alias("nbr")
    ).unionByName(
        und.select(F.col("hi").alias("v"), F.col("lo").alias("nbr"))
    ).persist()

    labels = truncate_plan(deg.select(F.col("id").alias("v"),
                                      F.col("id").alias("label")))
    for _ in range(steps):
        prev = labels.persist()
        vol = prev.join(deg.withColumnsRenamed({"id": "v"}), "v").groupBy(
            "label"
        ).agg(F.sum("deg").cast("long").alias("vol"))
        nbr_lab = adj.join(
            prev.withColumnsRenamed({"v": "nbr", "label": "c"}), "nbr"
        ).select("v", "c", F.lit(1).alias("k"))
        own = prev.select("v", F.col("label").alias("c"),
                          F.lit(0).alias("k"))
        cand = (
            nbr_lab.unionByName(own)
            .groupBy("v", "c")
            .agg(F.sum("k").cast("long").alias("kvc"))
        )
        scored = (
            cand.join(deg.withColumnsRenamed({"id": "v"}), "v")
            .join(vol.withColumnsRenamed({"label": "c"}), "c")
            .join(prev, "v")
            .select(
                "v", "c", "label",
                (
                    F.lit(2 * m) * F.col("kvc")
                    - F.col("deg")
                    * (
                        F.col("vol")
                        - F.when(F.col("c") == F.col("label"),
                                 F.col("deg")).otherwise(F.lit(0))
                    )
                ).cast("long").alias("score"),
            )
        )
        own_score = scored.where(F.col("c") == F.col("label")).select(
            "v", F.col("score").alias("own_score")
        )
        allowed = scored.join(own_score, "v").where(
            (F.col("c") == F.col("label"))
            | ((F.col("c") < F.col("label"))
               & (F.col("score") > F.col("own_score")))
        )
        labels = truncate_plan(
            allowed.groupBy("v")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("score")).alias("ns"),
                        F.col("c").alias("label"),
                    )
                ).alias("b")
            )
            .select("v", F.col("b.label").alias("label"))
        )
        labels.count()
        prev.unpersist()
    und.unpersist()
    deg.unpersist()
    adj.unpersist()
    return labels.withColumnsRenamed({"v": "id"})


def clustering_agreement(x: DataFrame, y: DataFrame) -> DataFrame:
    """Pair-counting agreement between two labellings of the SAME
    vertex set — Rand index and Adjusted Rand Index (Hubert & Arabie
    1985) from exact integer sufficient statistics.

    ``x`` and ``y`` are (id, label) DataFrames (label types may
    differ).  Returns ONE row:

      (n, pairs, both_pairs, x_pairs, y_pairs, rand, ari)

    where pairs = C(n,2), both_pairs = Σ_ij C(n_ij,2) over the
    contingency table, x_pairs/y_pairs = the per-labelling analogues,
    rand = (pairs - x_pairs - y_pairs + 2·both_pairs)/pairs and
    ari = (b - xp·yp/t) / ((xp+yp)/2 - xp·yp/t), NULL when the
    denominator is 0 (both labellings trivial).

    DETERMINISM: every statistic is an exact integer SUM (n_ij ≤ n,
    so C(n_ij,2) stays in int64 far past any realistic vertex count);
    rand is ONE double division and ari's expression tree is mirrored
    token-for-token in the DuckDB twin (queries.SQL_LPA_CC_AGREEMENT),
    so the doubles are produced by identical IEEE op sequences.

    Scale shape (design-for-100×): one equi-join on vertex id + three
    hash aggregates, all map-side combinable — no windows, nothing
    proportional to cluster size on one task.  At 10^12 vertices the
    int64 pair counts overflow; at that scale lift the three Σ C(·,2)
    sums to DecimalType(38,0) (same plan shape) — documented, not
    silently wrong, since C(n,2) itself leaves int64 first.
    """
    j = (
        x.select("id", F.col("label").alias("lx"))
        .join(y.select("id", F.col("label").alias("ly")), "id")
    )
    cells = j.groupBy("lx", "ly").agg(F.count(F.lit(1)).alias("nij"))
    # integer `div` everywhere — n·(n-1) is even, so the halves are
    # exact longs, never doubles
    pair2 = "%s * (%s - 1) div 2"
    per_x = (
        cells.groupBy("lx").agg(F.sum("nij").alias("ai"))
        .select(F.expr(pair2 % ("ai", "ai")).alias("p"))
        .agg(F.sum("p").cast("long").alias("x_pairs"))
    )
    per_y = (
        cells.groupBy("ly").agg(F.sum("nij").alias("bj"))
        .select(F.expr(pair2 % ("bj", "bj")).alias("p"))
        .agg(F.sum("p").cast("long").alias("y_pairs"))
    )
    stats = (
        cells.select(
            F.expr(pair2 % ("nij", "nij")).alias("p"), F.col("nij")
        )
        .agg(
            F.sum("p").cast("long").alias("both_pairs"),
            F.sum("nij").cast("long").alias("n"),
        )
        .crossJoin(F.broadcast(per_x))
        .crossJoin(F.broadcast(per_y))
    )
    t = F.expr(pair2 % ("n", "n")).cast("long")
    b = F.col("both_pairs").cast("double")
    xp = F.col("x_pairs").cast("double")
    yp = F.col("y_pairs").cast("double")
    td = t.cast("double")
    exp = xp * yp / td
    denom = (xp + yp) / F.lit(2.0) - exp
    return stats.select(
        "n",
        t.alias("pairs"),
        "both_pairs",
        "x_pairs",
        "y_pairs",
        F.round(
            (td - xp - yp + F.lit(2.0) * b) / td, 9
        ).alias("rand"),
        F.when(denom != 0.0, F.round((b - exp) / denom, 9))
        .otherwise(F.lit(None).cast("double"))
        .alias("ari"),
    )
