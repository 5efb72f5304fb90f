"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: mesos_pregel_spark — a from-scratch PySpark-native Pregel
(vertex-centric BSP) link-graph engine; see SURVEY.md for the
operator inventory and README.md for architecture.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the actor-interaction graph from sf0.001 event
    sequences (the transcript-shaped substrate) and run PageRank to
    1e-6 convergence.  Returns (actor, pagerank)."""
    from mesos_pregel_spark.algos.pagerank import pagerank
    from mesos_pregel_spark.queries import _graph_edges

    edges = _graph_edges(spark, "/root/testdata/sf0.001")
    ranks, _run = pagerank(
        spark, edges, tol=1e-6, max_supersteps=120, edge_partitions=8
    )
    return ranks.select(F.col("id").alias("actor"), "pagerank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (X1–X6
    extraction, P1–P5 superstep parity, A1–A4 algorithms, aggregators,
    relational feed).  Alias discipline: every computed column carries
    the same name in the Spark query and the oracle SQL."""
    from mesos_pregel_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins of ``queries()`` over the pre-registered views.
    ``cc_full`` uses a recursive-CTE transitive closure; float columns
    are rounded to 9 dp on both sides (see queries.py docstring)."""
    from mesos_pregel_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
