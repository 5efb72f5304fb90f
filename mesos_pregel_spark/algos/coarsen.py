"""Graph coarsening by matching contraction — the multilevel
primitive (Karypis-Kumar METIS, SIAM J. Sci. Comput. 1998; Hendrickson-
Leland Chaco): contract a maximal matching's pairs into super-vertices
and re-aggregate edge weights.  One coarsening level shrinks the
vertex set by up to half while preserving cut structure, which is how
multilevel partitioners, multilevel community detectors, and
hierarchical graph layouts make billion-edge problems tractable — the
coarse graph answers first, the answer is then projected back and
refined.  At 100 TB this is the preprocessing that turns "partition
10^10 vertices" into "partition 10^7 super-vertices, refine locally".

Built ENTIRELY from audited kernels: the matching is the engine's
deterministic local-max maximal matching (algos/matching.py — md5
edge priorities, capped ≡ unrolled), the contraction is two label
joins + one hash aggregate.  No new iterative machinery.

Pinned semantics (shared with the DuckDB twin in queries.py):

- matching: ``max_rounds`` rounds of the pinned local-max rule
  (monotone ⇒ a capped run equals the same-cap unrolled oracle
  exactly, regardless of whether maximality was reached);
- super-vertex id = NUMERIC min(id, mate) for matched vertices, own
  id otherwise — deterministic, join-free to invert;
- coarse edges: endpoints relabeled to super ids, intra-super edges
  (the contracted matching edges) dropped, parallel edges collapsed
  by SUMMING weights (exact: input weights are integral counts,
  summed as BIGINT-exact doubles then cast), canonical (lo, hi)
  orientation on super ids.

Execution shape (design-for-100x): the matching is the audited
scatter/combine loop (one mergeable struct-min per superstep over the
shrinking active subgraph); the contraction is two broadcast-or-
shuffle equi-joins of the edge table against the |V|-row super map
plus ONE map-side-combinable aggregate on the coarse key.  The edge
table is touched twice, never iterated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.algos.matching import maximal_matching


def coarsen_graph(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 6,
    edge_partitions: int | None = None,
    priority: str = "md5",
) -> tuple[DataFrame, DataFrame]:
    """One coarsening level: match, contract, re-aggregate.

    ``edges``: (src, dst, weight) directed-or-undirected input (the
    matching symmetrizes internally; contraction canonicalizes).
    ``priority="weight"`` = HEAVY-EDGE coarsening (the METIS rule:
    contract the heaviest incident edge, maximizing the weight removed
    per level — the variant that matters when edge weights carry
    meaning, e.g. co-occurrence counts).
    Returns (coarse_edges(lo, hi, weight), super_map(id, super)).
    """
    membership, _run = maximal_matching(
        spark, edges, max_rounds=max_rounds,
        edge_partitions=edge_partitions, priority=priority,
    )
    # the matching substrate carries mate as the message payload's
    # string form — re-type it to the id's own type before the NUMERIC
    # min that picks the super id
    id_type = dict(membership.dtypes)["id"]
    mate = F.col("mate").cast(id_type)
    super_map = membership.select(
        "id",
        F.when(mate.isNotNull(), F.least(F.col("id"), mate))
        .otherwise(F.col("id")).alias("super"),
    )
    sup_a = super_map.withColumnsRenamed({"id": "src", "super": "ssup"})
    sup_b = super_map.withColumnsRenamed({"id": "dst", "super": "dsup"})
    coarse = (
        edges.join(sup_a, "src")
        .join(sup_b, "dst")
        .where(F.col("ssup") != F.col("dsup"))
        .groupBy(
            F.least("ssup", "dsup").alias("lo"),
            F.greatest("ssup", "dsup").alias("hi"),
        )
        .agg(F.sum("weight").cast("long").alias("weight"))
    )
    return coarse, super_map
