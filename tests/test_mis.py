"""Maximal independent set (Luby with deterministic md5 priorities):
engine vs the greedy-by-priority oracle (they coincide exactly for
fixed priorities) + structural independence/maximality checks."""

import pytest

from pyspark.sql import types as T

from tests.conftest import id_space
from tests.oracle_pregel import oracle_mis

from mesos_pregel_spark.algos.mis import maximal_independent_set
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
    got, run = maximal_independent_set(spark, ids_df, **kw)
    got_map = {r["id"]: r["in_mis"] for r in got.collect()}
    assert got_map == oracle_mis(oracle_edges)
    return got_map, run


def _check_structural(got_map, oracle_edges):
    """Independence: no edge inside the set.  Maximality: every
    excluded vertex has an included neighbor."""
    nbrs = {}
    for s, d, _w in oracle_edges:
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    for v, inside in got_map.items():
        if inside:
            assert not any(got_map[u] for u in nbrs.get(v, ())), v
        else:
            assert any(got_map[u] for u in nbrs.get(v, ())), v


@pytest.mark.parametrize("name", [
    "tri_cycle", "chain4", "star_hub", "k4", "two_islands", "bipartite6",
])
def test_micro_graphs(spark, name):
    ids_df, edges, _names = id_space(spark, micro_graph_df(spark, name))
    got_map, _run = _compare(spark, ids_df, edges)
    _check_structural(got_map, edges)


def test_chain_is_greedy(spark):
    """Hand-check on a path: greedy by md5 priority, kills cascade."""
    rows = [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0)]
    got_map, _run = _compare(spark, _df(spark, rows), rows)
    _check_structural(got_map, rows)


def test_transcript_graph(spark):
    t = generate_transcripts(spark, n_conv=300, seed=42)
    ids_df = edges_with_ids(build_edges(t))
    edges = [(r["src"], r["dst"], r["weight"]) for r in ids_df.collect()]
    got_map, run = _compare(spark, ids_df, edges)
    _check_structural(got_map, edges)
    assert run.metrics[-1]["undecided"] == 0  # fully decided inside cap


def test_capped_equals_unrolled_prefix(spark):
    """Monotone status lattice: a 1-superstep cap must equal one
    unrolled transition — only globally-local-minima are in, nothing
    is out yet (kills arrive a superstep after their winner joins)."""
    rows = [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0)]
    got, _run = maximal_independent_set(spark, _df(spark, rows),
                                        max_supersteps=1)
    import hashlib
    p = {v: hashlib.md5(str(v).encode()).hexdigest() for v in range(1, 6)}
    nbrs = {1: [2], 2: [1, 3], 3: [2, 4], 4: [3, 5], 5: [4]}
    expect_in = {v for v in p
                 if all((p[v], v) < (p[u], u) for u in nbrs[v])}
    got_in = {r["id"] for r in got.collect() if r["in_mis"]}
    assert got_in == expect_in
