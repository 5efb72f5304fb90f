"""Semi-clustering (Pregel [P §5.3], f_B = 1/2, deterministic
ranking): engine vs the superstep-replaying python oracle (exact —
integer I/B sums make the score doubles bit-identical) + structural
checks on the kept clusters."""

import pytest

from pyspark.sql import types as T

from tests.conftest import id_space
from tests.oracle_pregel import oracle_semiclusters

from mesos_pregel_spark.algos.semicluster import semi_clusters
from mesos_pregel_spark.fixtures import generate_transcripts, micro_graph_df
from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids


def _df(spark, rows):
    schema = T.StructType([
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ])
    return spark.createDataFrame(rows, schema=schema)


def _collect(out):
    got = {}
    for r in out.collect():
        got.setdefault(str(r["id"]), []).append(
            (r["rank"], r["members"], r["score"])
        )
    for v in got:
        got[v].sort()
    return got


def _compare(spark, df, oracle_edges, **kw):
    got = _collect(semi_clusters(spark, df, **kw))
    exp = oracle_semiclusters(oracle_edges, **kw)
    exp = {str(k): v for k, v in exp.items()}
    assert got == exp
    return got


@pytest.mark.parametrize("name", [
    "tri_cycle", "chain4", "star_hub", "k4", "two_islands", "bipartite6",
])
def test_micro_graphs(spark, name):
    ids_df, edges, _names = id_space(spark, micro_graph_df(spark, name))
    _compare(spark, ids_df, edges, supersteps=3, c_max=3, m_max=4)


def test_weighted_triangle_plus_tail(spark):
    """Hand-check: a heavy triangle with a light tail — the triangle
    members' best cluster is the full triangle (I=9, B=1 at the tail
    vertex's attachment, score (2*9-B)/6)."""
    rows = [("a", "b", 3.0), ("b", "c", 3.0), ("a", "c", 3.0),
            ("c", "d", 1.0)]
    got = _compare(spark, _df(spark, rows), [tuple(r) for r in rows],
                   supersteps=3, c_max=3, m_max=3)
    best = got["a"][0]
    assert best[1] == "a,b,c"
    assert best[2] == pytest.approx((2 * 9 - 1) / 6.0)


def test_mmax_caps_cluster_size(spark):
    rows = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0),
            ("d", "a", 1.0), ("a", "c", 1.0), ("b", "d", 1.0)]  # K4
    got = _compare(spark, _df(spark, rows), [tuple(r) for r in rows],
                   supersteps=4, c_max=4, m_max=2)
    for v, lst in got.items():
        for _rank, members, _s in lst:
            assert len(members.split(",")) <= 2


def test_cmax_truncates_list(spark):
    ids_df, edges, _names = id_space(spark, micro_graph_df(spark, "k4"))
    got = _compare(spark, ids_df, edges, supersteps=3, c_max=2, m_max=4)
    for v, lst in got.items():
        assert len(lst) <= 2
        assert [r for r, _m, _s in lst] == list(range(1, len(lst) + 1))


def test_transcript_graph(spark):
    t = generate_transcripts(spark, n_conv=120, seed=7)
    ids_df = edges_with_ids(build_edges(t))
    edges = [(r["src"], r["dst"], r["weight"]) for r in ids_df.collect()]
    _compare(spark, ids_df, edges, supersteps=2, c_max=3, m_max=4)
