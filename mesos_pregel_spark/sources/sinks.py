"""Bucketed table sink — pre-shuffled storage for co-located joins.

At 100-TB scale the edge table is joined on ``src`` every superstep
and the vertex state on ``id`` by every downstream consumer; paying
that shuffle once AT WRITE TIME and never again is classic Spark
bucketing: ``bucketBy(n, key).sortBy(key).saveAsTable`` records the
hash-partitioning in the catalog, and a join of two tables bucketed
the same way compiles to a zero-Exchange sort-merge join (the
SortMergeJoin reads buckets pairwise; tests assert no Exchange in the
physical plan).

This complements the in-session ``repartition(n, "src").persist``
the superstep loop does (plans/program.py) — persistence amortizes the
shuffle within one run, bucketing amortizes it across runs/jobs, which
is exactly what a nightly 100-TB edge build feeding many algorithm
runs wants.

Requires a session with a warehouse (any Spark session has one; the
sandbox's derby metastore works) — tables are addressed by name, not
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on
    ``bucket_col`` so later equi-joins on that column skip the
    exchange AND the sort."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata only survives table reads
    (a path-based parquet read of the same files loses it)."""
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a SHUFFLE Exchange
    (``Exchange hashpartitioning``/``rangepartitioning``) — the thing
    bucketed joins exist to eliminate.  BroadcastExchange is not a
    shuffle and doesn't count (used by tests; handy for plan
    audits)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        "Exchange" in line and "BroadcastExchange" not in line
        for line in plan.splitlines()
    )
