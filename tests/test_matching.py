"""Maximal matching (deterministic local-max, Pregel [P §5.2]):
engine vs the round-replaying python oracle (identical for fixed md5
edge priorities) + structural validity/maximality checks."""

import pytest

from pyspark.sql import types as T

from tests.conftest import id_space
from tests.oracle_pregel import oracle_matching

from mesos_pregel_spark.algos.matching import maximal_matching
from mesos_pregel_spark.fixtures import generate_transcripts, micro_graph_df
from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids


def _df(spark, rows):
    schema = T.StructType([
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ])
    return spark.createDataFrame(rows, schema=schema)


def _compare(spark, ids_df, oracle_edges, **kw):
    got, run = maximal_matching(spark, ids_df, **kw)
    got_map = {r["id"]: r["mate"] for r in got.collect()}
    expect = {
        k: (None if v is None else str(v))
        for k, v in oracle_matching(oracle_edges).items()
    }
    # engine ids may be longs; normalize both sides to strings
    got_map = {str(k): v for k, v in got_map.items()}
    expect = {str(k): v for k, v in expect.items()}
    assert got_map == expect
    return got_map, run


def _check_structural(got_map, oracle_edges):
    """Validity: mate is symmetric and an actual neighbor.  Maximality:
    no edge has both endpoints unmatched."""
    nbrs = {}
    for s, d, _w in oracle_edges:
        if s != d:
            nbrs.setdefault(str(s), set()).add(str(d))
            nbrs.setdefault(str(d), set()).add(str(s))
    for v, m in got_map.items():
        if m is not None:
            assert got_map[m] == v, (v, m)
            assert m in nbrs.get(v, set()), (v, m)
    for s, ds in nbrs.items():
        if got_map.get(s) is None:
            assert all(got_map.get(d) is not None for d in ds), s


@pytest.mark.parametrize("name", [
    "tri_cycle", "chain4", "star_hub", "k4", "two_islands", "bipartite6",
])
def test_micro_graphs(spark, name):
    ids_df, edges, _names = id_space(spark, micro_graph_df(spark, name))
    got_map, _run = _compare(spark, ids_df, edges)
    _check_structural(got_map, edges)


def test_chain_pairs_by_edge_priority(spark):
    """Hand-check on a path: the globally-min md5 edge matches first,
    then the rest re-pair among leftovers."""
    rows = [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0)]
    got_map, _run = _compare(spark, _df(spark, rows), rows)
    _check_structural(got_map, rows)
    assert sum(1 for m in got_map.values() if m is not None) in (2, 4)


def test_transcript_graph(spark):
    t = generate_transcripts(spark, n_conv=300, seed=42)
    ids_df = edges_with_ids(build_edges(t))
    edges = [(r["src"], r["dst"], r["weight"]) for r in ids_df.collect()]
    got_map, run = _compare(spark, ids_df, edges)
    _check_structural(got_map, edges)
    assert run.metrics[-1]["proposals"] == 0  # converged inside cap


def test_capped_equals_unrolled_prefix(spark):
    """Monotone matching: a 1-round cap equals one oracle round —
    only mutual local-min pairs are matched, nothing else moved."""
    rows = [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0),
            (5, 6, 1.0), (1, 6, 1.0)]
    got, _run = maximal_matching(spark, _df(spark, rows), max_rounds=1)
    got_map = {str(r["id"]): r["mate"] for r in got.collect()}
    expect = {
        str(k): (None if v is None else str(v))
        for k, v in oracle_matching(rows, max_rounds=1).items()
    }
    assert got_map == expect
