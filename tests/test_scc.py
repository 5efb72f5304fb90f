"""SCC (coloring algorithm): engine vs Kosaraju oracle, planted
digraphs with the shapes that break naive approaches."""

import pytest

from pyspark.sql import types as T

from tests.conftest import id_space
from tests.oracle_pregel import oracle_scc

from mesos_pregel_spark.algos.scc import strongly_connected_components
from mesos_pregel_spark.fixtures import generate_transcripts, micro_graph_df
from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids


def _df(spark, rows):
    schema = T.StructType([
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ])
    return spark.createDataFrame(rows, schema=schema)


def _compare(spark, edges_df, oracle_edges, **kw):
    got, run = strongly_connected_components(spark, edges_df, **kw)
    expected = oracle_scc(oracle_edges)
    assert {r["id"]: r["scc"] for r in got.collect()} == expected
    return run


def test_two_cycles_one_way_bridge(spark):
    """3-cycle → 2-cycle → DAG tail: SCCs {1,2,3}, {4,5}, then
    singletons 6 and 7 — exercises color, backward reach AND trim."""
    rows = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0),   # cycle A
            (3, 4, 1.0),                              # one-way bridge
            (4, 5, 1.0), (5, 4, 1.0),                 # cycle B
            (5, 6, 1.0), (6, 7, 1.0)]                 # DAG tail
    got, _run = strongly_connected_components(spark, _df(spark, rows))
    m = {r["id"]: r["scc"] for r in got.collect()}
    assert m == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 7}


def test_directed_chain_all_singletons(spark):
    rows = [(i, i + 1, 1.0) for i in range(1, 6)]
    got, _run = strongly_connected_components(spark, _df(spark, rows))
    m = {r["id"]: r["scc"] for r in got.collect()}
    assert m == {i: i for i in range(1, 7)}


@pytest.mark.parametrize(
    "name", ["tri_cycle", "chain4", "k4", "star_hub", "two_islands",
             "bipartite6"]
)
def test_micro_graphs(spark, name):
    ids_df, edges, _names = id_space(spark, micro_graph_df(spark, name))
    _compare(spark, ids_df, edges)


def test_long_cycle_log_rounds(spark):
    """Pointer jumping on the inner fixpoints (color AND backward):
    a planted directed 480-cycle is ONE SCC whose diameter (479) far
    exceeds max_inner=200 — the round-3 one-hop propagation would
    raise; with doubling both phases converge in O(log d) iterations."""
    n = 480
    rows = [(i, (i + 1) % n, 1.0) for i in range(n)]
    got, run = strongly_connected_components(spark, _df(spark, rows))
    assert {r["scc"] for r in got.collect()} == {0}
    assert got.count() == n
    peel = [m for m in run.metrics if m.get("phase") == "peel"]
    assert peel, "expected a peel phase"
    # log2(480) ≈ 8.9; jump convergence needs ~log d + detection slack
    assert peel[0]["color_iters"] <= 25
    assert peel[0]["backward_iters"] <= 25


def test_transcript_graph(spark):
    t = generate_transcripts(spark, n_conv=300, seed=42)
    ids_df = edges_with_ids(build_edges(t))
    edges = [(r["src"], r["dst"], r["weight"]) for r in ids_df.collect()]
    _compare(spark, ids_df, edges)
