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
