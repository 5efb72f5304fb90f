"""Multi-source BFS (bit-packed frontier, bit_or combiner): engine vs
python oracle (exact masks) + hand-checked chain."""

import pytest

from tests.conftest import id_space
from tests.oracle_pregel import oracle_msbfs

from mesos_pregel_spark.algos.msbfs import multi_source_bfs
from mesos_pregel_spark.fixtures import generate_transcripts, micro_graph_df
from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids


def _compare(spark, ids_df, oracle_edges, sources, **kw):
    got, run = multi_source_bfs(spark, ids_df, sources, **kw)
    expected = oracle_msbfs(oracle_edges, sources)
    assert {r["id"]: r["mask"] for r in got.collect()} == expected
    return run


def test_chain_hand_checked(spark):
    """Directed a→b→c→d, sources sorted([a,b]): a's bit floods all,
    b's bit floods b..d."""
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, "chain4"))
    srcs = sorted([names["a"], names["b"]])
    got, run = multi_source_bfs(spark, ids_df, srcs)
    m = {r["id"]: r["mask"] for r in got.collect()}
    bit = {s: 1 << i for i, s in enumerate(srcs)}
    assert m[names["a"]] == bit[names["a"]]
    assert m[names["b"]] == bit[names["a"]] | bit[names["b"]]
    assert m[names["d"]] == bit[names["a"]] | bit[names["b"]]
    # BFS depth of the chain: 3 flooding rounds + 1 quiet round
    assert len(run.metrics) == 4
    assert run.metrics[-1]["active"] == 0


@pytest.mark.parametrize("name", ["chain4", "star_hub", "two_islands", "k4"])
def test_micro_graphs(spark, name):
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, name))
    srcs = sorted(names.values())[:3]
    _compare(spark, ids_df, edges, srcs)


def test_transcript_graph(spark):
    t = generate_transcripts(spark, n_conv=300, seed=42)
    ids_df = edges_with_ids(build_edges(t))
    edges = [(r["src"], r["dst"], r["weight"]) for r in ids_df.collect()]
    srcs = sorted({e[0] for e in edges})[:5]
    _compare(spark, ids_df, edges, srcs)


def test_too_many_sources_rejected(spark):
    ids_df, _e, _n = id_space(spark, micro_graph_df(spark, "chain4"))
    with pytest.raises(ValueError, match="1..63"):
        multi_source_bfs(spark, ids_df, list(range(64)))
