"""Deterministic graph walks — the graph-sampling primitive a
training-data pipeline runs over a link graph (random-walk corpora for
embedding training, neighborhood sampling, DeepWalk/node2vec-style
inputs) with HASH-DERIVED choices instead of RNG state, so the output
is reproducible across cluster sizes, resumable, and exactly
oracle-able.

Pinned semantics:

- Directed graph.  Unweighted mode collapses parallel edges
  (distinct (src, dst)); weighted mode collapses them by SUMMING
  ``weight`` (transcript edges carry interaction counts).
- ``n_walks`` walks per vertex, indexed ``walk = 0..n_walks-1``;
  step 0 is the start vertex itself.
- UNWEIGHTED next hop from ``cur`` at step t of walk w: the
  out-neighbor minimizing ``md5(seed || ':' || t || ':' || w || ':'
  || cur || ':' || dst)`` (ids compared via their string casts; ties —
  md5 collisions — broken toward the smaller dst by appending
  ``'|' || dst``).
- WEIGHTED next hop (node2vec-style weight-proportional sampling,
  derandomized): a uniform draw ``u = int(md5(seed:t:w:cur)[:12
  hex]) / 2^48`` ∈ [0,1) per live walk, then inverse-CDF over the
  out-edges ordered by dst — the chosen dst is the smallest whose
  running weight sum exceeds ``u * total_weight``.  Exactly
  reproducible (u is a 48-bit dyadic rational; running sums of
  integer-valued weights are order-exact doubles).
- NODE2VEC second-order bias (``p``/``q`` ≠ 1, weighted sampler
  required): the out-edge weight is scaled by α(prev, cur, dst) before
  the inverse-CDF — α = 1/p if dst == prev (return), 1 if the directed
  edge prev→dst exists in the collapsed edge table (stay near), else
  1/q (explore) — and the uniform draw salts on the predecessor too:
  ``u = md5(seed:t:w:cur:coalesce(prev, '-'))``.  Step 1 has no
  predecessor (α ≡ 1, prev hashes as '-').  Exact parity holds for
  dyadic 1/p, 1/q (products with integer-count weights stay exact
  doubles; both engines sum in dst order and round the single
  ``u·total`` product identically).
- A vertex with no out-neighbors ends its walk.
- Output rows (start, walk, step, vertex), step = 0..length.

Execution shape (design-for-100×): the frontier (one row per live
walk) joins the src-partitioned persisted edge table once per step.
Unweighted collapses with a single min_by hash aggregate (scatter +
mergeable-combine economics); weighted needs the running sum, i.e. one
window sort per step over the joined rows — each (start, walk)
partition is one vertex's out-degree, so the sort is hub-bounded.
L joins total, no per-row Python.  Second-order (p/q) adds ONE
(prev, dst) equi-join per step against the same edge table for the
adjacency test — still linear in frontier-out-degree rows, no
neighborhood materialization per walk (the classic node2vec alias
tables would be O(Σ deg²) state; the join is the scalable form).  n_walks multiplies frontier rows,
never edge-table copies.  Per-step frontiers are lazily
localCheckpoint'ed (S3) and all of them are unpersisted before
returning — the returned union is eagerly checkpointed first, so a
multi-seed corpus loop does not accumulate ~length cached frontiers
per call (ADVICE r3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.plans.truncate import truncate_plan

_U_DENOM = float(2 ** 48)  # 12 hex digits of md5 → uniform in [0,1)


def deterministic_walks(
    spark: SparkSession,
    edges: DataFrame,
    length: int = 8,
    seed: str = "42",
    n_walks: int = 1,
    weighted: bool = False,
    p: float = 1.0,
    q: float = 1.0,
    edge_partitions: int | None = None,
) -> DataFrame:
    """Walk ``length`` steps, ``n_walks`` times from every vertex.
    ``p``/``q`` ≠ 1 enables node2vec second-order bias (module
    docstring).  Returns (start, walk, step, vertex)."""
    if length < 0:
        raise ValueError("length must be >= 0")
    if n_walks < 1:
        raise ValueError("n_walks must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be > 0")
    second_order = p != 1.0 or q != 1.0
    if second_order and not weighted:
        raise ValueError(
            "p/q bias rides the weight-proportional sampler; pass "
            "weighted=True (weight=1.0 rows for an unweighted graph)"
        )
    nparts = edge_partitions or spark.sparkContext.defaultParallelism
    if weighted:
        e = (
            edges.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
            .repartition(nparts, "src")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    else:
        e = (
            edges.select("src", "dst").distinct()
            .repartition(nparts, "src")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    walk_idx = F.explode(
        F.sequence(F.lit(0), F.lit(n_walks - 1))
    ).alias("walk")
    id_type = dict(e.dtypes)["src"]  # vertex ids: long OR string keys
    frontier = verts.select(
        F.col("v").alias("start"), walk_idx, F.col("v").alias("cur"),
        *([F.lit(None).cast(id_type).alias("prev")] if second_order else []),
    )
    parts = [frontier.select(
        "start", "walk", F.lit(0).alias("step"), F.col("cur").alias("vertex")
    )]
    if second_order:
        adj = e.select(
            F.col("src").alias("pa"), F.col("dst").alias("pb"),
            F.lit(True).alias("adj"),
        )
    frontiers: list[DataFrame] = []
    for t in range(length):
        joined = frontier.join(e, frontier["cur"] == e["src"])
        if weighted:
            u = (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(
                            ":", F.lit(seed), F.lit(t), F.col("walk"),
                            F.col("cur").cast("string"),
                            *([F.coalesce(
                                F.col("prev").cast("string"), F.lit("-")
                            )] if second_order else []),
                        )),
                        1, 12,
                    ),
                    16, 10,
                ).cast("double") / F.lit(_U_DENOM)
            )
            if second_order:
                joined = joined.join(
                    adj,
                    (F.col("prev") == F.col("pa"))
                    & (joined["dst"] == F.col("pb")),
                    "left_outer",
                )
                alpha = (
                    F.when(F.col("prev").isNull(), F.lit(1.0))
                    .when(joined["dst"] == F.col("prev"), F.lit(1.0 / p))
                    .when(F.col("adj").isNotNull(), F.lit(1.0))
                    .otherwise(F.lit(1.0 / q))
                )
                joined = joined.withColumn("eff", F.col("weight") * alpha)
                wcol = "eff"
            else:
                wcol = "weight"
            part = Window.partitionBy("start", "walk")
            cum = F.sum(wcol).over(part.orderBy("dst"))
            total = F.sum(wcol).over(part)
            frontier = (
                joined.select(
                    "start", "walk", "cur", F.col("dst"),
                    cum.alias("cum"), total.alias("total"), u.alias("u"),
                )
                .where(F.col("cum") > F.col("u") * F.col("total"))
                .groupBy("start", "walk")
                .agg(
                    F.min("dst").alias("cur"),
                    # every row in the (start, walk) group shares cur —
                    # MIN is just the deterministic way to carry it
                    *([F.min("cur").alias("prev")] if second_order else []),
                )
            )
            if second_order:
                frontier = frontier.select("start", "walk", "cur", "prev")
        else:
            key = F.concat(
                F.md5(F.concat_ws(
                    ":", F.lit(seed), F.lit(t), F.col("walk"),
                    F.col("cur").cast("string"), F.col("dst").cast("string"),
                )),
                F.lit("|"), F.col("dst").cast("string"),
            )
            frontier = (
                joined
                .groupBy("start", "walk")
                .agg(F.min_by("dst", key).alias("cur"))
            )
        # truncate the L-deep join lineage (S3 rule: iterative
        # frontier state) with the carried-stats strip — the frontier
        # is rebuilt from itself every step (plans/truncate.py);
        # handle kept for post-materialize release
        frontier = truncate_plan(frontier, eager=False)
        frontiers.append(frontier)
        parts.append(frontier.select(
            "start", "walk", F.lit(t + 1).alias("step"),
            F.col("cur").alias("vertex"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # Materialize the result ONCE, then release every intermediate —
    # repeated multi-seed invocations previously accumulated ~length
    # cached frontier RDDs per call (ADVICE r3).
    out = truncate_plan(out)
    for f in frontiers:
        f.unpersist()
    e.unpersist()
    return out
