"""Local clustering by PPR sweep cut (Andersen-Chung-Lang FOCS 2006
— the classic local graph-partitioning method: push personalized
PageRank mass from a seed, order vertices by ppr/deg, and read the
conductance curve of the rank prefixes; the best prefix is a provably
good local cluster around the seed).

Pinned semantics (mirrored by queries.SQL_SWEEP_CUT):

- UNDIRECTED graph (edges symmetrized; deg = undirected degree).
- PPR = the engine's own 4-superstep personalized_pagerank from the
  single seed (pr_0 = e_seed; pr_{t+1} = 0.15·e + 0.85·A_rw pr_t) —
  the recurrence already pinned hash-exact by `ppr_step4`.
- Sweep order: smicro = ROUND(ROUND(ppr,9)·1e9) as an exact BIGINT
  (the 9dp round collapses summation-order ulps, the micro snap makes
  the score an integer), order by (smicro/deg — ONE double division
  of exact integers, identical in both engines) DESC, id ASC;
  support only (smicro > 0), prefix positions capped at ``max_k``.
- For prefix i: vol(i) = Σ deg (exact), cut(i) = #edges with min
  endpoint-rank ≤ i  −  #edges with both ranks ≤ i (ranks outside
  the top-``max_k`` set count as +∞) — both cumulative INTEGER
  histograms; conductance = cut / min(vol, 2m − vol), ONE rounded
  division, NULL when the denominator is 0 (the prefix swallowed
  every edge).

Shape (design-for-100×): the PPR run is the audited superstep kernel;
the sweep itself touches the full edge set exactly ONCE (a broadcast
join against the ≤max_k-row rank map to histogram rmin/rmax) and every
window runs over ≤ max_k rows — the rich_club discipline (never a
window over |V| or |E|).  A 4-step PPR's support is the seed's 4-hop
ball; capping the sweep at max_k positions keeps the method local no
matter how large that ball grows on a hub seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mesos_pregel_spark.plans.truncate import truncate_plan

# rank sentinel for vertices outside the swept prefix set: strictly
# larger than any real rank, so LEAST/GREATEST arithmetic is exact
_INF_RANK = 1 << 40


def sweep_cut(
    spark: SparkSession,
    edges: DataFrame,
    max_supersteps: int = 4,
    max_k: int = 64,
) -> DataFrame:
    """Run the PPR sweep from the minimum vertex id.  ``edges`` is an
    undirected edge list given once per pair (src < dst, parallel
    pairs pre-collapsed).  Returns the conductance curve
    (i, part, deg, vol, cut, conductance), one row per prefix."""
    from mesos_pregel_spark.algos.ppr import personalized_pagerank

    und = truncate_plan(edges.select("src", "dst").distinct())
    sym = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    # one scan for both scalars (edge count + minimum vertex id)
    hdr = und.agg(
        F.count(F.lit(1)).alias("m"),
        F.least(F.min("src"), F.min("dst")).alias("seed"),
    ).collect()[0]
    m, seed = hdr["m"], hdr["seed"]

    ranks, _run = personalized_pagerank(
        spark, sym, [seed], tol=0.0, max_supersteps=max_supersteps,
        edge_partitions=8,
    )
    smicro = F.round(F.round(F.col("ppr"), 9) * 1e9).cast("long")
    support = (
        ranks.select("id", smicro.alias("smicro"))
        .where(F.col("smicro") > 0)
        .join(deg, "id")
    )
    # global order over the support, capped at max_k rows — the ONLY
    # unpartitioned window, bounded by construction
    rk_w = Window.orderBy(
        F.desc(F.col("smicro").cast("double") / F.col("deg").cast("double")),
        F.asc("id"),
    )
    # ≤max_k rows, referenced three times below (rl, rh, curve) —
    # materialize once so the degree shuffle + window don't re-run
    top = truncate_plan(
        support.withColumn("rk", F.row_number().over(rk_w).cast("long"))
        .where(F.col("rk") <= max_k)
        .select("id", "deg", "rk")
    )
    # one pass over the edge set: rank histogram of min/max endpoint
    # ranks (broadcast the tiny rank map)
    rl = top.select(F.col("id").alias("lo_id"), F.col("rk").alias("r1"))
    rh = top.select(F.col("id").alias("hi_id"), F.col("rk").alias("r2"))
    er = (
        und.join(F.broadcast(rl), und["src"] == rl["lo_id"], "left_outer")
        .join(F.broadcast(rh), und["dst"] == rh["hi_id"], "left_outer")
        .select(
            F.coalesce("r1", F.lit(_INF_RANK)).alias("ra"),
            F.coalesce("r2", F.lit(_INF_RANK)).alias("rb"),
        )
        .select(
            F.least("ra", "rb").alias("rmin"),
            F.greatest("ra", "rb").alias("rmax"),
        )
    )
    # both cumulative histograms from ONE scan of the edge set: each
    # edge contributes (rmin, is_min=1) and (rmax, is_min=0) events
    hist = (
        er.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("rmin").alias("rk"), F.lit(1).alias("is_min")
                    ),
                    F.struct(
                        F.col("rmax").alias("rk"), F.lit(0).alias("is_min")
                    ),
                )
            ).alias("ev")
        )
        .where(F.col("ev.rk") <= max_k)
        .groupBy(F.col("ev.rk").alias("rk"))
        .agg(
            F.sum("ev.is_min").cast("long").alias("c_min"),
            F.sum(1 - F.col("ev.is_min")).cast("long").alias("c_max"),
        )
    )

    cum_w = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        top.join(hist, "rk", "left_outer")
        .select(
            F.col("rk").alias("i"), F.col("id").alias("part"), "deg",
            F.coalesce("c_min", F.lit(0)).alias("c_min"),
            F.coalesce("c_max", F.lit(0)).alias("c_max"),
        )
        .withColumn("vol", F.sum("deg").over(cum_w).cast("long"))
        .withColumn(
            "cut",
            (F.sum("c_min").over(cum_w) - F.sum("c_max").over(cum_w))
            .cast("long"),
        )
    )
    denom = F.least(F.col("vol"), F.lit(2 * m) - F.col("vol"))
    return curve.select(
        "i", "part", "deg", "vol", "cut",
        F.when(
            denom > 0,
            F.round(F.col("cut").cast("double") / denom.cast("double"), 9),
        ).alias("conductance"),
    )
