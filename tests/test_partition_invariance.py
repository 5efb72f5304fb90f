"""FIXTURES §4.2 for the round-2 algorithms: identical results at
different partition counts (correctness must be partition-count
invariant — the property that makes the engine safe to re-partition
at cluster scale)."""

import pytest

from tests.conftest import id_space

from mesos_pregel_spark.algos.hits import hits
from mesos_pregel_spark.algos.kcore import k_core
from mesos_pregel_spark.algos.landmarks import landmark_distances
from mesos_pregel_spark.algos.msbfs import multi_source_bfs
from mesos_pregel_spark.algos.scc import strongly_connected_components
from mesos_pregel_spark.fixtures import generate_transcripts
from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids


@pytest.fixture(scope="module")
def graph(spark):
    t = generate_transcripts(spark, n_conv=200, seed=42)
    ids_df = edges_with_ids(build_edges(t)).persist()
    ids_df.count()
    yield ids_df
    ids_df.unpersist()


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_hits_partition_invariance(spark, graph):
    a, _ = hits(spark, graph, max_supersteps=4, edge_partitions=2)
    b, _ = hits(spark, graph, max_supersteps=4, edge_partitions=16)
    # float sums: shuffle order differs across partitionings in the
    # last ulp — compare at far-below-oracle grain
    ma = {r["id"]: (r["authority"], r["hub"]) for r in a.collect()}
    mb = {r["id"]: (r["authority"], r["hub"]) for r in b.collect()}
    assert ma.keys() == mb.keys()
    for v in ma:
        assert ma[v][0] == pytest.approx(mb[v][0], abs=1e-12)
        assert ma[v][1] == pytest.approx(mb[v][1], abs=1e-12)


def test_kcore_partition_invariance(spark, graph):
    a, _ = k_core(spark, graph, k=3, edge_partitions=2)
    b, _ = k_core(spark, graph, k=3, edge_partitions=16)
    assert _rows(a) == _rows(b)  # booleans: exact


def test_msbfs_partition_invariance(spark, graph):
    srcs = sorted(r["src"] for r in graph.select("src").distinct().limit(4).collect())
    a, _ = multi_source_bfs(spark, graph, srcs, edge_partitions=2)
    b, _ = multi_source_bfs(spark, graph, srcs, edge_partitions=16)
    assert _rows(a) == _rows(b)  # bitmasks: exact


def test_landmarks_partition_invariance(spark, graph):
    lms = sorted(r["src"] for r in graph.select("src").distinct().limit(3).collect())
    a, _ = landmark_distances(spark, graph, lms, edge_partitions=2)
    b, _ = landmark_distances(spark, graph, lms, edge_partitions=16)
    # integer-weight min-sums: exact doubles (None = unreachable)
    ma = {r["id"]: (r["d0"], r["d1"], r["d2"]) for r in a.collect()}
    mb = {r["id"]: (r["d0"], r["d1"], r["d2"]) for r in b.collect()}
    assert ma == mb


def test_scc_partition_invariance(spark, graph):
    a, _ = strongly_connected_components(spark, graph, edge_partitions=2)
    b, _ = strongly_connected_components(spark, graph, edge_partitions=16)
    assert _rows(a) == _rows(b)  # labels: exact


def test_boruvka_partition_invariance(spark, graph):
    from mesos_pregel_spark.algos.boruvka import boruvka_msf

    a, _ = boruvka_msf(spark, graph, edge_partitions=2)
    b, _ = boruvka_msf(spark, graph, edge_partitions=16)
    assert _rows(a) == _rows(b)  # exact integers + strings


def test_unigram_partition_invariance(spark):
    from mesos_pregel_spark.functions.text import unigram_logprob
    from mesos_pregel_spark.fixtures import generate_documents_dist

    docs = generate_documents_dist(spark, 400, dup_frac=0.1, partitions=4)
    a = unigram_logprob(docs.repartition(2))
    b = unigram_logprob(docs.repartition(16))
    assert _rows(a) == _rows(b)  # micro-nat integer sums: exact
