"""Butterfly counting (algos/bipartite.py) plus the new structure
profiles (knn, edge embeddedness) vs brute-force oracles."""

from collections import defaultdict
from itertools import combinations

from mesos_pregel_spark.algos.bipartite import butterfly_counts
from mesos_pregel_spark.algos.structure import (
    avg_neighbor_degree,
    edge_embeddedness,
)


def _be(spark, pairs):
    return spark.createDataFrame(list(pairs), "l string, r string")


def _oracle_butterflies(pairs):
    es = set(pairs)
    lefts = sorted({l for l, _ in es})
    rights = sorted({r for _, r in es})
    per = {v: 0 for v in lefts + rights}
    total = 0
    for l1, l2 in combinations(lefts, 2):
        for r1, r2 in combinations(rights, 2):
            if {(l1, r1), (l1, r2), (l2, r1), (l2, r2)} <= es:
                total += 1
                for v in (l1, l2, r1, r2):
                    per[v] += 1
    return per, total


def test_butterflies_closed_form(spark):
    # complete bipartite K(3,3): C(3,2)^2 = 9 butterflies; every
    # vertex is in C(2,1)*... each vertex in 2-subsets: C(2,1)? — use
    # the oracle for per-vertex, pin the total by hand
    pairs = [(f"l{i}", f"r{j}") for i in range(3) for j in range(3)]
    per, total = butterfly_counts(spark, _be(spark, pairs))
    assert total == 9
    want_per, want_total = _oracle_butterflies(pairs)
    assert want_total == 9
    assert {r["id"]: r["butterflies"] for r in per.collect()} == want_per


def test_butterflies_vs_oracle_mixed(spark):
    pairs = [
        ("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),   # 1 butterfly
        ("c", "x"), ("c", "z"), ("d", "z"),                # extra wedges
        ("a", "x"),                                         # dup edge
        ("e", "w"),                                         # isolated edge
    ]
    per, total = butterfly_counts(spark, _be(spark, pairs))
    want_per, want_total = _oracle_butterflies(set(pairs))
    assert total == want_total
    assert {r["id"]: r["butterflies"] for r in per.collect()} == want_per


def test_butterflies_hub_cap(spark):
    # right hub z connected to everything: capped out of wedge-center
    # role on the left-pair side
    pairs = [(f"l{i}", "z") for i in range(5)] + [
        ("l0", "r0"), ("l1", "r0"), ("l0", "r1"), ("l1", "r1")
    ]
    _per, total = butterfly_counts(spark, _be(spark, pairs))
    _per2, capped = butterfly_counts(spark, _be(spark, pairs), max_degree=3)
    assert capped < total


def _g(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src string, dst string, weight double"
    )


PAIRS = [
    ("a", "b"), ("b", "c"), ("a", "c"),
    ("c", "d"), ("d", "e"), ("c", "e"),
    ("e", "f"), ("b", "a"), ("a", "a"),
]


def _und(pairs):
    return {(min(a, b), max(a, b)) for a, b in pairs if a != b}


def _adj(und):
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def test_avg_neighbor_degree(spark):
    got = {
        r["deg"]: (r["n_vertices"], r["sum_neighbor_deg"], r["knn"])
        for r in avg_neighbor_degree(spark, _g(spark, PAIRS)).collect()
    }
    adj = _adj(_und(PAIRS))
    byk = defaultdict(lambda: [0, 0])
    for v, nbrs in adj.items():
        k = len(nbrs)
        byk[k][0] += 1
        byk[k][1] += sum(len(adj[u]) for u in nbrs)
    want = {
        k: (n, w, round(w / (k * n), 9)) for k, (n, w) in byk.items()
    }
    assert got == want


def test_edge_embeddedness(spark):
    got = [
        (r["lo"], r["hi"], r["cn"])
        for r in edge_embeddedness(spark, _g(spark, PAIRS), top_k=20)
        .collect()
    ]
    und = _und(PAIRS)
    adj = _adj(und)
    rows = sorted(
        ((a, b, len(adj[a] & adj[b])) for a, b in und),
        key=lambda r: (-r[2], r[0], r[1]),
    )
    assert got == rows[:20]
    # the pendant edge e-f is a bridge: support 0
    assert ("e", "f", 0) in got


def test_overlapping_vertex_namespaces_one_row_per_id(spark):
    """Review fix: when an id occurs on BOTH bipartite sides (the
    generic API never promised disjoint namespaces), the per-vertex
    table must still emit ONE row per id with the summed count."""
    from pyspark.sql import functions as F

    # two butterflies: {1,2}x{3,4} on the left side AND {3,4}x{1,2}
    # — i.e. vertex ids reused across sides
    edges = [(1, 3), (1, 4), (2, 3), (2, 4), (3, 1), (3, 2), (4, 1), (4, 2)]
    df = spark.createDataFrame(edges, "l long, r long")
    per_vertex, total = butterfly_counts(spark, df)
    rows = per_vertex.collect()
    ids = [r["id"] for r in rows]
    assert sorted(ids) == sorted(set(ids)), "duplicate per-vertex rows"
    got = {r["id"]: r["butterflies"] for r in rows}
    # each vertex sits in one butterfly per orientation = 2 total
    assert got == {1: 2, 2: 2, 3: 2, 4: 2} and total == 2


def test_bipartite_clustering_complete_k22(spark):
    from mesos_pregel_spark.algos.bipartite import bipartite_clustering

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")], "l string, r string"
    )
    row = bipartite_clustering(spark, df).collect()[0]
    # complete K_{2,2}: 1 butterfly, 4 caterpillars, cc4 = 1.0
    assert (row["butterflies"], row["caterpillars"], row["cc4"]) == (1, 4, 1.0)


def test_bipartite_clustering_star_is_null(spark):
    from mesos_pregel_spark.algos.bipartite import bipartite_clustering

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("a", "z")], "l string, r string"
    )
    row = bipartite_clustering(spark, df).collect()[0]
    # no 3-path at all: coefficient undefined, pinned to NULL
    assert (row["butterflies"], row["caterpillars"], row["cc4"]) == (0, 0, None)


def test_bipartite_clustering_open_path(spark):
    from mesos_pregel_spark.algos.bipartite import bipartite_clustering

    df = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("b", "y")], "l string, r string"
    )
    row = bipartite_clustering(spark, df).collect()[0]
    # one caterpillar, no butterfly closing it
    assert (row["butterflies"], row["caterpillars"], row["cc4"]) == (0, 1, 0.0)


def test_bipartite_clustering_pendant(spark):
    from mesos_pregel_spark.algos.bipartite import bipartite_clustering

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("a", "z")],
        "l string, r string",
    )
    row = bipartite_clustering(spark, df).collect()[0]
    assert (row["butterflies"], row["caterpillars"]) == (1, 6)
    assert row["cc4"] == round(4.0 / 6.0, 9)
