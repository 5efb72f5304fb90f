"""Exact sampled harmonic centrality on the bit-packed MSBFS
substrate: harmonic(v) = sum over pivots s != v of 1/d(s, v), hop
distances, truncated at ``max_depth``.

Unlike the HyperBall estimate (algos/anf.py::centralities), the
per-pivot contribution here is EXACT: when pivot bit i first lands on
v at superstep t, d(s_i, v) = t, so v accumulates the exact long
``HC_SCALE div t``.  The sum is order-independent (integers), the only
double is the final reported ratio — the same fixed-point discipline
as structure.link_prediction_ra.

Pinned semantics (mirrored by the recursive-CTE DuckDB twin):

- pivots = the k vertices minimizing (md5(string(id)), id) over the
  undirected vertex set — deterministic cross-engine (the same pivot
  rule as algos/betweenness.py).
- undirected hop BFS over the symmetrized collapsed edge set; a pivot
  never contributes to itself (its bit is set at depth 0).
- contributions stop at depth ``max_depth`` (both engines).

Execution shape (design-for-100×): ONE 64-bit mask column carries all
k frontiers — per superstep one frontier-filtered scatter of the FRESH
bits only (a vertex re-sends nothing once its bits stop growing), one
bit_or combine with map-side partials, and the accumulator update is
two integer columns.  k pivots cost one edge pass per BFS level, not
k, and state is O(1) per vertex regardless of k <= 63.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.functions.edges import symmetrize
from mesos_pregel_spark.operators.combine import combine
from mesos_pregel_spark.operators.scatter import scatter
from mesos_pregel_spark.plans.pregel import PregelRun

# 12-digit fixed point: HC_SCALE div t is exact per term; <= 63 pivots
# keep the per-vertex sum below 63e12, far inside int64.
HC_SCALE = 10**12


def harmonic_sampled(
    spark: SparkSession,
    edges: DataFrame,
    n_pivots: int = 8,
    max_depth: int = 10,
    edge_partitions: int | None = None,
    pivots: Sequence | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Exact truncated harmonic centrality from ``n_pivots`` md5-min
    pivots.  Returns (hc(id, n_reached, hnum, dsum, ecc_lb), run) —
    ``hnum`` is the exact scaled-integer numerator (callers report
    hnum / HC_SCALE), ``dsum`` = the exact total hop distance to the
    reaching pivots (the sampled-closeness numerator: closeness =
    n_reached / dsum, Wasserman-Faust-style reach correction left to
    the caller), and ``ecc_lb`` = max over reaching pivots of
    d(s, v), the standard pivot-sampled eccentricity LOWER bound
    (0 where no pivot reaches v).  All three read-outs ride the SAME
    run — one BFS, three centralities."""
    if not 0 < n_pivots <= 63:
        raise ValueError(f"need 1..63 pivots, got {n_pivots}")
    nparts = edge_partitions or spark.sparkContext.defaultParallelism
    e = (
        symmetrize(edges.select("src", "dst", "weight")).select("src", "dst")
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()
    verts = e.select(F.col("src").alias("id")).distinct()
    if pivots is None:
        pivots = [
            r["id"]
            for r in verts.orderBy(
                F.md5(F.col("id").cast("string")), F.col("id")
            ).limit(n_pivots).collect()
        ]
    pivots = sorted(pivots)
    run = PregelRun(
        spark, "harmonic",
        params={"pivots": [str(p) for p in pivots], "max_depth": max_depth},
    )
    run._edges_live = e

    try:
        init_mask = F.lit(0).cast("long")
        for i, p in enumerate(pivots):
            init_mask = init_mask.bitwiseOR(
                F.when(F.col("id") == F.lit(p), F.lit(1 << i))
                .otherwise(F.lit(0)).cast("long")
            )
        state = run.materialize(
            verts.select(
                "id",
                init_mask.alias("mask"),
                init_mask.alias("fresh"),
                F.lit(0).cast("long").alias("hnum"),
                F.lit(0).cast("long").alias("dsum"),
                F.lit(0).cast("long").alias("n_reached"),
                F.lit(0).cast("long").alias("ecc_lb"),
            ),
            durable=False,
        )
        for t in range(1, max_depth + 1):
            msgs = scatter(
                e, state,
                [F.col("fresh").alias("m")],
                active_filter=F.col("fresh") != 0,
            )
            combined = combine(msgs, ["dst"], {"inbox": ("m", "bit_or")})
            joined = state.join(
                combined, state["id"] == combined["dst"], "left_outer"
            )
            inbox = F.coalesce(combined["inbox"], F.lit(0)).cast("long")
            new_bits = inbox.bitwiseAND(F.bitwise_not(state["mask"]))
            nb = F.bit_count(new_bits).cast("long")
            state = run.materialize(joined.select(
                state["id"],
                state["mask"].bitwiseOR(inbox).alias("mask"),
                new_bits.alias("fresh"),
                (state["hnum"] + nb * F.lit(HC_SCALE // t)).alias("hnum"),
                (state["dsum"] + nb * F.lit(t)).alias("dsum"),
                (state["n_reached"] + nb).alias("n_reached"),
                # depth is monotone: any fresh bit at t raises the bound
                F.when(nb > 0, F.lit(t)).otherwise(state["ecc_lb"])
                .cast("long").alias("ecc_lb"),
            ))
            aggs = run.aggregators(state, [
                F.sum(F.bit_count(F.col("fresh")).cast("long")).alias(
                    "new_bits"
                ),
            ])
            run.record(depth=t, **aggs)
            run.next_superstep()
            if not aggs["new_bits"]:
                break
        result = state.select("id", "n_reached", "hnum", "dsum", "ecc_lb")
    except BaseException:
        # release the run's checkpointed state frames too, not just the
        # edge cache — mirrors betweenness_sampled's failure path (the
        # leak class test_no_cache_leak pins there)
        run.release()
        raise
    e.unpersist()
    run._edges_live = None
    return result, run
