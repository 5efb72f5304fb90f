"""TrustRank / spam mass — link-spam triage (Gyöngyi, Garcia-Molina,
Pedersen, "Combating Web Spam with TrustRank", VLDB 2004; Gyöngyi,
Berkhin, Garcia-Molina, Pedersen, "Link Spam Detection Based on Mass
Estimation", VLDB 2006): trust = personalized PageRank whose teleport
mass is concentrated on a trusted seed set; a vertex's RELATIVE SPAM
MASS is the share of its PageRank NOT attributable to trusted
teleportation — high rel_mass = rank acquired from outside the trusted
core, the classic link-farm signature.  On the transcript actor graph
this flags actors whose centrality comes from outside the
high-activity core rather than from it.

Pinned semantics (shared with the DuckDB twin in queries.py):

- pr = the engine's audited PageRank kernel, tr = the audited
  personalized-PageRank kernel (same damping 0.85, same dangling-leak
  rule), both run a FIXED ``steps`` supersteps (capped ≡ unrolled);
- both scores snap to integer NANO-units (CAST(ROUND(x * 1e9) AS
  BIGINT)) BEFORE any cross-vertex aggregation, so the corpus sums
  are exact integers — order-independent (the unigram contract; a
  double Σpr would carry partition-order ulps);
- scale = Σpr_n / Σtr_n (ONE double division of exact integers)
  normalizes trust to the same total mass as PageRank (the VLDB 2006
  estimator), and rel_mass = ROUND((pr_n − tr_n·scale) / pr_n, 6) —
  a pinned sequence of IEEE ops on engine-identical operands; NULL
  when pr_n snaps to 0 (unreachable while 0.15/n · 1e9 ≥ 1).

Execution shape (design-for-100x): two audited superstep loops over
the SAME prepared edge table + one id-keyed join of their outputs +
one 1-row broadcast of the two exact sums.  Nothing new iterates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.algos.pagerank import pagerank
from mesos_pregel_spark.algos.ppr import personalized_pagerank


def spam_mass(
    spark: SparkSession,
    edges: DataFrame,
    seeds: Sequence,
    steps: int = 4,
    edge_partitions: int | None = None,
) -> DataFrame:
    """Relative spam mass per vertex.  ``seeds`` = the trusted set
    (teleport support of the trust run).  Returns
    (id, pr_n, tr_n, rel_mass) with pr_n/tr_n in exact nano-units."""
    pr, _run1 = pagerank(
        spark, edges, tol=0.0, max_supersteps=steps,
        edge_partitions=edge_partitions,
    )
    tr, _run2 = personalized_pagerank(
        spark, edges, list(seeds), tol=0.0, max_supersteps=steps,
        edge_partitions=edge_partitions,
    )
    nano = lambda c: F.round(F.col(c) * 1e9).cast("long")  # noqa: E731
    both = (
        pr.select("id", nano("pagerank").alias("pr_n"))
        .join(tr.select("id", nano("ppr").alias("tr_n")), "id")
    )
    sums = both.agg(
        F.sum("pr_n").alias("sum_pr"), F.sum("tr_n").alias("sum_tr")
    )
    scale = F.col("sum_pr").cast("double") / F.col("sum_tr").cast("double")
    rel = F.round(
        (F.col("pr_n").cast("double")
         - F.col("tr_n").cast("double") * scale)
        / F.col("pr_n").cast("double"),
        6,
    )
    return (
        both.crossJoin(F.broadcast(sums))
        .select(
            "id", "pr_n", "tr_n",
            F.when(F.col("pr_n") > 0, rel).alias("rel_mass"),
        )
    )
