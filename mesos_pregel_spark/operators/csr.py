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
iteration-invariant structure.  The broadcast is GUARDED: state larger
than ``max_broadcast_rows`` raises :class:`CsrStateTooLarge` instead
of silently collecting the cluster's vertex state through the driver —
callers fall back to the join kernel (algos/pagerank.py does so
automatically).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Vertex-state rows above which the CSR gather refuses to broadcast.
# 5e7 rows × ~24 B/row ≈ 1.2 GB on the driver and per executor — the
# sane ceiling for a broadcast; past it the join kernel wins anyway.
MAX_BROADCAST_ROWS = 50_000_000


class CsrStateTooLarge(ValueError):
    """Vertex state exceeds the broadcastable bound for a CSR kernel."""


def pack_edges_by_dst(edges: DataFrame, nparts: int) -> DataFrame:
    """Static edge table hash-partitioned by dst and persisted — packed
    once, reused by every superstep's gather."""
    packed = edges.select("src", "dst").repartition(nparts, "dst") \
        .persist(StorageLevel.MEMORY_AND_DISK)
    packed.count()
    return packed


def csr_gather_sums(
    spark: SparkSession,
    packed_edges: DataFrame,
    state: DataFrame,
    n_vertices: int | None = None,
    max_broadcast_rows: int | None = None,
) -> DataFrame:
    """PageRank gather: Σ_{u→v} pr_u/outdeg_u per v, via broadcast
    contributions + Arrow-batched CSR reduction.  Returns (dst, msg_sum).

    Raises :class:`CsrStateTooLarge` when the vertex state exceeds
    ``max_broadcast_rows`` (pass ``n_vertices`` if the caller already
    knows the count — avoids an extra job)."""
    if max_broadcast_rows is None:
        max_broadcast_rows = MAX_BROADCAST_ROWS
    if n_vertices is None:
        n_vertices = state.count()
    if n_vertices > max_broadcast_rows:
        raise CsrStateTooLarge(
            f"vertex state has {n_vertices:,} rows > broadcastable bound "
            f"{max_broadcast_rows:,}; use the join kernel (kernel='join')"
        )
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
    spark: SparkSession,
    oriented: DataFrame,
    max_broadcast_rows: int | None = None,
) -> DataFrame:
    """A4 alternate kernel: fully vectorized pair-membership triangle
    counting over a broadcast CSR adjacency.

    ``oriented`` is the degree-ordered oriented edge table (u, v) from
    algos/triangles.py.  Vertex ids are densified to 32-bit so an
    oriented edge packs into one uint64 key; the sorted key array IS
    the adjacency membership index.  For each edge batch:

    1. expand every edge (u, v) into its candidate rows — one per
       neighbor w ∈ adj(u) — with a repeat/cumsum gather (no Python
       loop: the concatenated adjacency slices are one fancy-index);
    2. w closes triangle {u, v, w} iff oriented edge (v, w) exists —
       ONE vectorized ``np.searchsorted`` of the packed (v<<32|w) keys
       against the broadcast key array;
    3. credit u and v with their per-edge hit counts (``np.bincount``)
       and each hit w with 1.

    Replaces the per-edge ``np.intersect1d`` loop (round-1 bench's
    slowest query — VERDICT r01 "What's wrong" #3).

    Regime: the oriented edge list must fit in a broadcast
    (``max_broadcast_rows`` guard); beyond that, the wedge-join
    formulation in algos/triangles.py is the scale path.  Returns
    (id, triangles) partial counts (sum per id = per-vertex count;
    total = sum/3).
    """
    if max_broadcast_rows is None:
        max_broadcast_rows = MAX_BROADCAST_ROWS
    n_edges = oriented.count()
    if n_edges > max_broadcast_rows:
        raise CsrStateTooLarge(
            f"oriented edge list has {n_edges:,} rows > broadcastable bound "
            f"{max_broadcast_rows:,}; use the join kernel"
        )
    pdf = oriented.select("u", "v").toPandas()
    u = pdf["u"].to_numpy()
    v = pdf["v"].to_numpy()
    vocab = np.unique(np.concatenate([u, v]))  # sorted raw ids
    if len(vocab) >= 2**31:
        raise CsrStateTooLarge("vertex count exceeds 32-bit dense id space")
    ud = np.searchsorted(vocab, u).astype(np.uint64)
    vd = np.searchsorted(vocab, v).astype(np.uint64)
    keys = np.sort((ud << np.uint64(32)) | vd)  # membership index
    order = np.lexsort((vd, ud))
    ud_s, vd_s = ud[order], vd[order]
    uniq, starts = np.unique(ud_s, return_index=True)
    bounds = np.append(starts, len(ud_s))
    bc = spark.sparkContext.broadcast((vocab, uniq, bounds, vd_s, keys))

    def count_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_vocab, b_uniq, b_bounds, b_adj, b_keys = bc.value
        for batch in batches:
            eu = np.searchsorted(b_vocab, batch["u"].to_numpy()).astype(np.uint64)
            ev = np.searchsorted(b_vocab, batch["v"].to_numpy()).astype(np.uint64)
            nb = len(eu)
            iu = np.searchsorted(b_uniq, eu)
            iu = np.clip(iu, 0, len(b_uniq) - 1)
            present = b_uniq[iu] == eu
            du = np.where(present, b_bounds[iu + 1] - b_bounds[iu], 0)
            total = int(du.sum())
            if total == 0:
                yield pd.DataFrame({"id": np.empty(0, np.int64),
                                    "triangles": np.empty(0, np.int64)})
                continue
            edge_rep = np.repeat(np.arange(nb), du)
            grp_start = np.cumsum(du) - du
            within = np.arange(total) - np.repeat(grp_start, du)
            pos = np.repeat(b_bounds[iu], du) + within
            w = b_adj[pos]                          # candidates: adj(u)
            probe = (np.repeat(ev, du) << np.uint64(32)) | w
            loc = np.searchsorted(b_keys, probe)
            loc = np.clip(loc, 0, len(b_keys) - 1)
            hit = b_keys[loc] == probe              # (v, w) edge exists
            per_edge = np.bincount(edge_rep[hit], minlength=nb)
            nz = per_edge > 0
            ids = np.concatenate([
                b_vocab[eu[nz].astype(np.int64)],
                b_vocab[ev[nz].astype(np.int64)],
                b_vocab[w[hit].astype(np.int64)],
            ])
            counts = np.concatenate([
                per_edge[nz], per_edge[nz],
                np.ones(int(hit.sum()), dtype=np.int64),
            ])
            yield pd.DataFrame({"id": ids.astype(np.int64),
                                "triangles": counts.astype(np.int64)})

    partials = oriented.select("u", "v").mapInPandas(
        count_batches, "id long, triangles long"
    )
    return partials.groupBy("id").agg(F.sum("triangles").alias("triangles"))
