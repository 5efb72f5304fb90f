"""Landmark SimRank — "two objects are similar if they are referenced
by similar objects" (Jeh & Widom, KDD 2002), computed EXACTLY on the
induced subgraph of the top-K-degree vertices.

Why landmark-bounded: SimRank's state is inherently O(n²) pairs — at
10^10 vertices the full matrix is not a thing any engine stores.  The
production pattern is to pin a small landmark set (hubs, category
anchors, a curated vocabulary) and compute the pair matrix exactly
within it; K² pairs is a constant, every join below is
landmark-bounded, and the corpus-sized edge table is touched once (to
pick the landmarks and induce their subgraph).  That is the 100-TB
story; an unbounded all-pairs SimRank would be dishonest.

Pinned semantics (mirrored by the unrolled DuckDB twin,
queries.SQL_SIMRANK_TOPK):

- Landmarks = top K vertices by (degree DESC, id ASC) — exact integer
  ordering, deterministic cross-engine.  Graph = the induced
  undirected subgraph; neighbourhoods and degrees are INDUCED.
- s₀ = identity; iteration (C = 4/5):
    s_k(a,b) = (4 · Σ_{u∈N(a), v∈N(b)} s_{k-1}(u,v)) div (5·d(a)·d(b))
  for a ≠ b, s_k(a,a) = SCALE, held in integer MICRO-units — C = 0.8
  becomes multiply-by-4 / floor-divide-by-5·d·d, so the whole
  recurrence is EXACT INTEGER arithmetic: no FP anywhere, no rounding
  rule to reconcile between engines.  (The div floors each pair's
  score once per iteration; both engines floor identically.)
- The double sum factors through the neighbour matrix twice:
  T(u,b) = Σ_{v∈N(b)} s(u,v), then Σ_{u∈N(a)} T(u,b) — two
  landmark-bounded equi-joins + hash aggregates per iteration instead
  of a quadruple join.
- Zero pairs are dropped from the sparse state (they contribute
  nothing and cannot enter a top-k); isolated landmarks never appear
  in the adjacency, so the d(a)·d(b) denominator is never 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCALE = 1_000_000


def simrank_pairs(
    spark: SparkSession,
    und: DataFrame,
    top_k: int = 32,
    iters: int = 3,
    pair_limit: int = 100,
) -> DataFrame:
    """Exact integer-micro SimRank over the top-``top_k``-degree
    induced subgraph of ``und`` (lo, hi distinct undirected edges).
    Returns the ``pair_limit`` most similar unordered pairs
    (a, b, sim_micro), ordered deterministically by
    (sim_micro DESC, a, b)."""
    deg = (
        und.select(F.col("lo").alias("id"))
        .unionByName(und.select(F.col("hi").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    )
    top = deg.orderBy(F.desc("deg"), "id").limit(top_k).select("id")
    ind = (
        und.join(top.withColumnRenamed("id", "lo"), "lo")
        .join(top.withColumnRenamed("id", "hi"), "hi")
        .select("lo", "hi")
    )
    adj = ind.select(F.col("lo").alias("v"), F.col("hi").alias("b")).unionByName(
        ind.select(F.col("hi").alias("v"), F.col("lo").alias("b"))
    )
    ideg = adj.groupBy(F.col("v").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    diag = top.select(
        F.col("id").alias("u"),
        F.col("id").alias("v"),
        F.lit(SCALE).cast("long").alias("s"),
    )
    s = diag
    for _ in range(iters):
        # hop 1: T(u, nb) = Σ_{v ∈ N(nb)} s(u, v)
        hop1 = adj.select(F.col("v").alias("h1v"), F.col("b").alias("nb"))
        t = (
            s.join(hop1, s["v"] == hop1["h1v"])
            .groupBy(s["u"].alias("tu"), hop1["nb"].alias("nb"))
            .agg(F.sum("s").cast("long").alias("t"))
        )
        # hop 2: Σ_{u ∈ N(a)} T(u, nb)
        hop2 = adj.select(F.col("v").alias("h2v"), F.col("b").alias("na"))
        off = (
            t.join(hop2, t["tu"] == hop2["h2v"])
            .groupBy(hop2["na"].alias("a"), t["nb"].alias("b"))
            .agg(F.sum("t").cast("long").alias("tot"))
            .where(F.col("a") != F.col("b"))
            .join(ideg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
            .join(ideg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
            .select(
                F.col("a").alias("u"),
                F.col("b").alias("v"),
                F.expr("(4 * tot) div (5 * da * db)").cast("long").alias("s"),
            )
            .where(F.col("s") > 0)
        )
        s = diag.unionByName(off)
    return (
        s.where(F.col("u") < F.col("v"))
        .orderBy(F.desc("s"), "u", "v")
        .limit(pair_limit)
        .select(F.col("u").alias("a"), F.col("v").alias("b"),
                F.col("s").alias("sim_micro"))
    )
