"""A5 SSSP: engine vs oracle + closed forms, exact (weights are
integer-valued counts, so float equality is exact)."""

import pytest

from tests.conftest import id_space
from tests.oracle_pregel import oracle_sssp

from mesos_pregel_spark.algos.sssp import shortest_paths
from mesos_pregel_spark.fixtures import generate_transcripts, micro_graph_df
from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids


def _compare(spark, ids_df, oracle_edges, source, **kw):
    got, run = shortest_paths(spark, ids_df, source, **kw)
    expected = oracle_sssp(oracle_edges, source)
    got_map = {r["id"]: r["distance"] for r in got.collect()}
    assert got_map == expected
    return run


def test_chain_hand_checked(spark):
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, "chain4"))
    run = _compare(spark, ids_df, edges, names["a"])
    got = {r["id"]: r["distance"] for r in
           shortest_paths(spark, ids_df, names["a"])[0].collect()}
    assert got[names["a"]] == 0.0
    assert got[names["d"]] == 3.0
    assert run.metrics[-1]["active"] == 0


def test_unreachable_is_null(spark):
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, "chain4"))
    got = {r["id"]: r["distance"] for r in
           shortest_paths(spark, ids_df, names["d"])[0].collect()}
    assert got[names["d"]] == 0.0
    assert got[names["a"]] is None  # chain is directed a->b->c->d


@pytest.mark.parametrize("name", ["two_islands", "star_hub", "k4"])
def test_micro_graphs(spark, name):
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, name))
    src = min(names.values())
    _compare(spark, ids_df, edges, src)


def test_transcript_graph_weighted(spark):
    t = generate_transcripts(spark, n_conv=300, seed=42)
    ids_df = edges_with_ids(build_edges(t))
    edges = [(r["src"], r["dst"], r["weight"]) for r in ids_df.collect()]
    src = min(e[0] for e in edges)
    _compare(spark, ids_df, edges, src)


def test_resume(spark, tmp_path):
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, "chain4"))
    ck = str(tmp_path / "sssp")
    shortest_paths(spark, ids_df, names["a"], max_supersteps=2,
                   checkpoint_dir=ck, checkpoint_every=1)
    resumed, _ = shortest_paths(spark, ids_df, names["a"],
                                checkpoint_dir=ck, checkpoint_every=1)
    expected = oracle_sssp(edges, names["a"])
    assert {r["id"]: r["distance"] for r in resumed.collect()} == expected
