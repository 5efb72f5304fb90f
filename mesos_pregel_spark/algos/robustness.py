"""Attack-tolerance profile (Albert, Jeong, Barabási, "Error and
attack tolerance of complex networks", Nature 2000): remove the top
f-fraction highest-degree hubs and report how the giant connected
component shrinks — THE robustness read-out for a scale-free link
graph (a zipf web graph is resilient to random failure but shatters
under targeted hub attack; the curve quantifies exactly how fast).

Pinned semantics (mirrored by the DuckDB twin, queries.SQL_ROBUSTNESS):

- Substrate: the canonical undirected graph (self-loops out, parallel
  edges collapsed); n = its vertex count; degree = distinct-neighbor
  count.
- For each fraction f: remove the floor(f*n) vertices ranked by
  (degree DESC, id ASC) — a total order, so the removed set is pinned.
- Remaining vertices n_remaining = n - n_removed, INCLUDING vertices
  isolated by the removal (they are size-1 components).
- giant_size = the largest component of the surviving edge set (>= 1
  whenever any vertex remains); giant_share = ONE rounded division.

Execution shape (design-for-100×): one degree aggregate shared by all
fractions; per fraction two LEFT ANTI joins (hub set broadcast — it
is floor(f*n) ids) and one engine CC run; the profile is
len(fractions) rows.  The only driver-side values are n (one count)
and the per-fraction 1-row summaries."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.algos.triangles import canonical_undirected


def attack_tolerance(
    spark: SparkSession,
    edges: DataFrame,
    fractions: tuple[float, ...] = (0.01, 0.05, 0.2),
    strategy: str = "degree",
    seed: str = "fail42",
    edge_partitions: int | None = None,
) -> DataFrame:
    """Removal-robustness profile.  Returns one row per fraction:
    (frac, n_removed, n_remaining, giant_size, giant_share).

    ``strategy='degree'`` is the targeted ATTACK curve (top hubs by
    (deg DESC, id ASC)); ``strategy='random'`` is the Nature-2000
    paper's companion ERROR/failure curve — the "random" victims are
    the md5((seed || ':' || id))-smallest vertices, a deterministic
    degree-blind order both engines reproduce byte-identically (the
    stratified_sample trick), so the two curves' gap IS the
    scale-free-network signature (resilient to failure, fragile to
    attack) and still hash-compares exactly."""
    from mesos_pregel_spark.algos.cc import connected_components

    if strategy not in ("degree", "random"):
        raise ValueError("strategy must be 'degree' or 'random'")
    und = canonical_undirected(edges)
    deg = (
        und.select(F.col("lo").alias("id"))
        .unionByName(und.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ).persist()
    n = deg.count()
    out = None
    for f in fractions:
        k = int(math.floor(f * n))
        if strategy == "degree":
            ranked = deg.orderBy(F.desc("deg"), F.asc("id"))
        else:
            ranked = deg.orderBy(
                F.md5(F.concat(F.lit(f"{seed}:"),
                               F.col("id").cast("string"))),
                F.asc("id"),
            )
        hubs = ranked.limit(k).select("id")
        rem = (
            und.join(hubs.withColumnRenamed("id", "lo"), "lo", "left_anti")
            .join(hubs.withColumnRenamed("id", "hi"), "hi", "left_anti")
        )
        n_rem = n - k
        if rem.limit(1).count() == 0:
            giant = 1 if n_rem > 0 else 0
        else:
            labels, _run = connected_components(
                spark,
                rem.select(
                    F.col("lo").alias("src"),
                    F.col("hi").alias("dst"),
                    F.lit(1.0).alias("weight"),
                ),
                edge_partitions=edge_partitions,
            )
            giant = (
                labels.groupBy("component")
                .agg(F.count(F.lit(1)).alias("sz"))
                .agg(F.max("sz").alias("g"))
                .collect()[0]["g"]
            )
            # vertices isolated by the removal are size-1 components
            giant = max(giant, 1 if n_rem > 0 else 0)
        row = spark.createDataFrame(
            [(float(f), k, n_rem, giant)],
            "frac double, n_removed long, n_remaining long, giant_size long",
        )
        out = row if out is None else out.unionByName(row)
    deg.unpersist()
    return out.select(
        "frac",
        "n_removed",
        "n_remaining",
        "giant_size",
        F.when(
            F.col("n_remaining") > 0,
            F.round(
                F.col("giant_size").cast("double")
                / F.col("n_remaining").cast("double"),
                9,
            ),
        ).otherwise(F.lit(0.0)).alias("giant_share"),
    )
