"""Landmark distances (k-lane Bellman-Ford): each lane must equal an
independent SSSP run / the python oracle, in one Pregel run."""

import pytest

from tests.conftest import id_space
from tests.oracle_pregel import oracle_sssp

from mesos_pregel_spark.algos.landmarks import landmark_distances
from mesos_pregel_spark.fixtures import generate_transcripts, micro_graph_df
from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids


def _compare(spark, ids_df, oracle_edges, lms, **kw):
    got, run = landmark_distances(spark, ids_df, lms, **kw)
    rows = {r["id"]: r for r in got.collect()}
    for i, s in enumerate(sorted(set(lms))):
        expected = oracle_sssp(oracle_edges, s)
        lane = {vid: r[f"d{i}"] for vid, r in rows.items()}
        assert lane == expected, f"lane {i} (source {s})"
    return run


@pytest.mark.parametrize("name", ["chain4", "star_hub", "two_islands", "k4"])
def test_micro_graphs_each_lane_is_sssp(spark, name):
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, name))
    lms = sorted(names.values())[:3]
    _compare(spark, ids_df, edges, lms)


def test_transcript_graph(spark):
    t = generate_transcripts(spark, n_conv=300, seed=42)
    ids_df = edges_with_ids(build_edges(t))
    edges = [(r["src"], r["dst"], r["weight"]) for r in ids_df.collect()]
    lms = sorted({e[0] for e in edges})[:4]
    _compare(spark, ids_df, edges, lms)


def test_unreachable_is_null(spark):
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, "chain4"))
    got, _ = landmark_distances(spark, ids_df, [names["d"]])
    rows = {r["id"]: r["d0"] for r in got.collect()}
    assert rows[names["d"]] == 0.0
    assert rows[names["a"]] is None  # chain is directed a->b->c->d


def test_too_many_landmarks_rejected(spark):
    ids_df, _e, _n = id_space(spark, micro_graph_df(spark, "chain4"))
    with pytest.raises(ValueError, match="1..16"):
        landmark_distances(spark, ids_df, list(range(17)))
