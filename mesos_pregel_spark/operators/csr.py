"""S2 — CSR-packed Arrow kernels (BASELINE.json:6 "vectorized
Arrow/pandas UDFs over CSR-packed edge partitions").

The gather (message sum per destination) has a join-free fast path
when the *vertex state* is small relative to the edge table — exactly
the transcript-graph regime: 10^12 turns collapse to an actor graph
whose vertex set is |roles ∪ tools| while the edge weights carry the
mass.  Per superstep:

1. vertex contributions (pr/outdeg) are broadcast to every executor
   as plain numpy arrays (sorted ids + values — a binary-searchable
   CSR-style index);
2. ``mapInPandas`` streams the (static, dst-partitioned, persisted)
   edge table in Arrow batches and reduces contributions per dst with
   ``np.unique``/``np.bincount`` — a per-partition CSR reduction, no
   per-row Python;
3. because edges are hash-partitioned by dst, the finishing
   ``groupBy(dst)`` merges at most #batches partial rows per dst.

This trades the scatter join's shuffle of the vertex side for a
broadcast — the right physical plan when |V| ≪ |E|, and the driver
chooses it explicitly (``kernel='csr'``) since Catalyst can't know the
iteration-invariant structure.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def pack_edges_by_dst(edges: DataFrame, nparts: int) -> DataFrame:
    """Static edge table hash-partitioned by dst and persisted — packed
    once, reused by every superstep's gather."""
    packed = edges.select("src", "dst").repartition(nparts, "dst") \
        .persist(StorageLevel.MEMORY_AND_DISK)
    packed.count()
    return packed


def csr_gather_sums(
    spark: SparkSession, packed_edges: DataFrame, state: DataFrame
) -> DataFrame:
    """PageRank gather: Σ_{u→v} pr_u/outdeg_u per v, via broadcast
    contributions + Arrow-batched CSR reduction.  Returns (dst, msg_sum)."""
    pdf = state.select("id", "outdeg", "pr").toPandas()
    senders = pdf[pdf["outdeg"] > 0]
    order = np.argsort(senders["id"].to_numpy())
    ids = senders["id"].to_numpy()[order]
    contrib = (senders["pr"].to_numpy() / senders["outdeg"].to_numpy())[order]
    bc = spark.sparkContext.broadcast((ids, contrib))

    def reduce_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_contrib = bc.value
        for batch in batches:
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            idx = np.searchsorted(b_ids, src)
            # Dangling sources never appear (outdeg>0 by construction),
            # but guard against ids missing from state.
            idx = np.clip(idx, 0, len(b_ids) - 1)
            valid = b_ids[idx] == src
            if not valid.all():
                src, dst, idx = src[valid], dst[valid], idx[valid]
            vals = b_contrib[idx]
            # CSR-style reduction: unique dsts -> offsets -> segment sums.
            u_dst, inverse = np.unique(dst, return_inverse=True)
            sums = np.bincount(inverse, weights=vals, minlength=len(u_dst))
            yield pd.DataFrame({"dst": u_dst, "msg_sum": sums})

    partials = packed_edges.mapInPandas(reduce_batches, "dst long, msg_sum double")
    # dst-partitioned input => this merge moves ~#batches rows per dst.
    return partials.groupBy("dst").agg(F.sum("msg_sum").alias("msg_sum"))


def csr_triangle_counts(
    spark: SparkSession, oriented: DataFrame
) -> DataFrame:
    """A4 alternate kernel: per-edge sorted-adjacency intersections.

    ``oriented`` is the degree-ordered oriented edge table (u, v) from
    algos/triangles.py.  The full oriented adjacency (CSR: sorted u →
    sorted neighbor arrays) is broadcast; ``mapInPandas`` streams edge
    batches and intersects adj(u) ∩ adj(v) with ``np.intersect1d`` —
    each common neighbor w closes a triangle {u, v, w}, credited to
    all three corners.

    Regime: adjacency must fit in a broadcast (fine for actor graphs
    and up to ~10^8 oriented edges); beyond that, the join formulation
    in algos/triangles.py is the scale path.  Returns (id, triangles)
    partial counts (sum per id = per-vertex count; total = sum/3).
    """
    pdf = oriented.select("u", "v").toPandas()
    u = pdf["u"].to_numpy()
    v = pdf["v"].to_numpy()
    order = np.lexsort((v, u))
    u_sorted, v_sorted = u[order], v[order]
    uniq, starts = np.unique(u_sorted, return_index=True)
    bounds = np.append(starts, len(u_sorted))
    bc = spark.sparkContext.broadcast((uniq, bounds, v_sorted))
    _EMPTY = np.empty(0, dtype=np.int64)

    def count_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_uniq, b_bounds, b_adj = bc.value

        def adj(x: int) -> np.ndarray:
            i = np.searchsorted(b_uniq, x)
            if i >= len(b_uniq) or b_uniq[i] != x:
                return _EMPTY
            return b_adj[b_bounds[i]:b_bounds[i + 1]]

        for batch in batches:
            ids: list[int] = []
            counts: list[int] = []
            for eu, ev in zip(batch["u"].to_numpy(), batch["v"].to_numpy()):
                common = np.intersect1d(adj(eu), adj(ev), assume_unique=True)
                n = len(common)
                if n:
                    ids.extend((eu, ev))
                    counts.extend((n, n))
                    ids.extend(common.tolist())
                    counts.extend([1] * n)
            yield pd.DataFrame(
                {"id": np.array(ids, dtype=np.int64),
                 "triangles": np.array(counts, dtype=np.int64)}
            )

    partials = oriented.select("u", "v").mapInPandas(
        count_batches, "id long, triangles long"
    )
    return partials.groupBy("id").agg(F.sum("triangles").alias("triangles"))
