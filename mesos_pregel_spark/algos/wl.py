"""1-dimensional Weisfeiler-Lehman color refinement (Weisfeiler &
Lehman 1968; the WL-subtree kernel of Shervashidze et al. JMLR 2011)
— iterated structural-role signatures: two vertices share a color
after k rounds iff their depth-k neighborhood trees are identical.
The classic uses: structural-role discovery, graph-kernel features,
and a cheap isomorphism/symmetry certificate (color histogram).

Pinned semantics (exact DuckDB twin, queries.SQL_WL_COLORS):

- UNDIRECTED graph (edges symmetrized).
- c_0(v) = CAST(deg(v) AS STRING) — the degree-refined start.
- c_t(v) = md5( c_{t-1}(v) || '|' ||
              concat_ws(',', SORTED multiset of neighbor c_{t-1}) )
  — the neighbor multiset is sorted lexicographically, so the
  aggregation order Spark/DuckDB feed the list in can never change
  the digest; md5 of an identical string is identical in both
  engines (the engine-wide hash discipline).
- Fixed k rounds (refinement is monotone: classes only split, so
  capped ≡ unrolled at any shared k).

Shape (design-for-100×): one shuffle per round — edges join the
current color table and hash-aggregate by dst with a
sort_array(collect_list(...)) finisher.  A hub's neighbor-color list
is its degree long; the sort is per-vertex local work (no cross-
vertex state), and the string digest immediately collapses it back to
32 bytes — the same per-superstep economics as the engine's scatter/
combine with a heavier combiner.  At extreme hub degrees the standard
mitigation is hashing CHUNKS of the sorted multiset first (an
associative pre-fold); documented, not needed at the driver scales.

Iteration discipline: the symmetrized edge table is persisted once
(it feeds every round), and the carried color frame is
truncate_plan-materialized per round — without this, round k's lazy
plan re-executes rounds 1..k-1 (the color frame appears twice in each
round's plan: once as the join left side, once inside the neighbor
aggregate, so both recomputation and the carried-stats BigInt double
per round).  Superseded checkpoints are reaped eagerly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.plans.truncate import release_plan, truncate_plan


def wl_colors(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 3,
) -> DataFrame:
    """Run k rounds of 1-WL refinement over an undirected edge list
    (one row per pair, src < dst).  Returns (id, wl_color, class_size)
    — the color after round k and how many vertices share it."""
    und = edges.select("src", "dst").distinct()
    sym = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        colors = truncate_plan(
            sym.groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
            .select("id", F.col("deg").cast("string").alias("color"))
        )

        for _ in range(rounds):
            nbr = (
                sym.join(
                    colors.select(
                        F.col("id").alias("src"),
                        F.col("color").alias("c_src"),
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(
                    F.concat_ws(
                        ",", F.sort_array(F.collect_list("c_src"))
                    ).alias("nbrs")
                )
            )
            nxt = truncate_plan(
                colors.join(nbr, "id").select(
                    "id",
                    F.md5(
                        F.concat(F.col("color"), F.lit("|"), F.col("nbrs"))
                    ).alias("color"),
                )
            )
            release_plan(colors)
            colors = nxt

        sizes = colors.groupBy("color").agg(
            F.count(F.lit(1)).cast("long").alias("class_size")
        )
        return colors.join(sizes, "color").select(
            "id", F.col("color").alias("wl_color"), "class_size"
        )
    finally:
        # Every round materialized through truncate_plan, so the
        # returned plan references only the final checkpoint RDD —
        # the symmetrized cache is no longer needed.
        sym.unpersist()
