"""Community analytics (algos/communities.py): hand-computed modularity
and conductance on planted graphs, plus a brute-force cross-check."""

import math

import pytest
from pyspark.sql import functions as F

from mesos_pregel_spark.algos.communities import community_stats, modularity


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src string, dst string, weight double"
    )


def _labels(spark, mapping):
    return spark.createDataFrame(
        list(mapping.items()), "id string, label string"
    )


# Two triangles {a,b,c} and {d,e,f} joined by one bridge edge c-d.
TWO_TRIANGLES = [
    ("a", "b"), ("b", "c"), ("a", "c"),
    ("d", "e"), ("e", "f"), ("d", "f"),
    ("c", "d"),
]


def test_modularity_two_triangles_hand_value(spark):
    # m=7; each community: e_in=3, vol=7 (2+2+3).
    # Q = 2 * (3/7 - (7/14)^2) = 6/7 - 1/2 = 5/14.
    e = _edges(spark, TWO_TRIANGLES)
    lab = _labels(
        spark, {"a": "L", "b": "L", "c": "L", "d": "R", "e": "R", "f": "R"}
    )
    row = modularity(spark, e, lab).collect()[0]
    assert row["n_communities"] == 2
    assert math.isclose(row["modularity"], 5.0 / 14.0, abs_tol=1e-9)


def test_community_stats_two_triangles(spark):
    e = _edges(spark, TWO_TRIANGLES)
    lab = _labels(
        spark, {"a": "L", "b": "L", "c": "L", "d": "R", "e": "R", "f": "R"}
    )
    rows = {r["label"]: r for r in community_stats(spark, e, lab).collect()}
    for side in ("L", "R"):
        r = rows[side]
        assert r["n_vertices"] == 3
        assert r["internal_edges"] == 3
        assert r["volume"] == 7
        assert r["cut"] == 1
        # conductance = 1 / min(7, 14-7) = 1/7
        assert math.isclose(r["conductance"], 1.0 / 7.0, abs_tol=1e-9)
        # part = (4*7*3 - 49) / (4*49) = 35/196 = 5/28
        assert math.isclose(r["modularity_part"], 5.0 / 28.0, abs_tol=1e-9)


def test_single_community_zero_conductance_zero_modularity(spark):
    # Whole graph one community: cut=0; Q = e/m - (2m/2m)^2 = 1 - 1 = 0.
    e = _edges(spark, [("a", "b"), ("b", "c")])
    lab = _labels(spark, {"a": "X", "b": "X", "c": "X"})
    r = community_stats(spark, e, lab).collect()[0]
    assert r["cut"] == 0
    assert r["conductance"] == 0.0
    q = modularity(spark, e, lab).collect()[0]
    assert q["n_communities"] == 1
    assert math.isclose(q["modularity"], 0.0, abs_tol=1e-9)


def test_singleton_partition_brute_force(spark):
    """Every vertex its own community on a small deterministic graph:
    Q = -sum(deg^2)/(4m^2) (no internal edges), checked per community
    against a python brute force."""
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"),
        ("d", "e"), ("e", "f"),
    ]
    e = _edges(spark, pairs)
    verts = sorted({v for p in pairs for v in p})
    lab = _labels(spark, {v: v for v in verts})

    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = len(pairs)

    rows = {r["label"]: r for r in community_stats(spark, e, lab).collect()}
    assert set(rows) == set(verts)
    for v in verts:
        r = rows[v]
        assert r["n_vertices"] == 1
        assert r["internal_edges"] == 0
        assert r["volume"] == deg[v]
        assert r["cut"] == deg[v]
        exp_cond = deg[v] / min(deg[v], 2 * m - deg[v])
        assert math.isclose(r["conductance"], exp_cond, abs_tol=1e-9)
        exp_part = -(deg[v] ** 2) / (4.0 * m * m)
        assert math.isclose(r["modularity_part"], exp_part, abs_tol=1e-9)

    q = modularity(spark, e, lab).collect()[0]
    exp_q = -sum(d * d for d in deg.values()) / (4.0 * m * m)
    assert math.isclose(q["modularity"], exp_q, abs_tol=1e-9)


def test_multi_edges_and_self_loops_collapse(spark):
    """The stats run on the canonical simple graph: duplicate and
    reversed edges collapse, self-loops drop — same substrate as
    triangles/k-truss."""
    e = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"), ("b", "c")],
    )
    lab = _labels(spark, {"a": "X", "b": "X", "c": "Y"})
    rows = {r["label"]: r for r in community_stats(spark, e, lab).collect()}
    assert rows["X"]["internal_edges"] == 1  # a-b once
    assert rows["X"]["volume"] == 3  # deg a=1, b=2
    assert rows["Y"]["volume"] == 1


def _oracle_greedy_modularity(pairs, steps):
    """Brute-force synchronous local-move with the pinned monotone
    min-label restriction: candidates are own community plus
    strictly-smaller-labelled neighbour communities whose exact-integer
    score strictly beats staying."""
    from collections import defaultdict

    und = set()
    for a, b in pairs:
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(n) for v, n in adj.items()}
    m = len(und)
    lab = {v: v for v in adj}
    for _ in range(steps):
        vol = defaultdict(int)
        for v in adj:
            vol[lab[v]] += deg[v]
        new = {}
        for v in adj:
            kvc = defaultdict(int)
            kvc[lab[v]] += 0
            for u in adj[v]:
                kvc[lab[u]] += 1
            scores = {
                c: 2 * m * k
                - deg[v] * (vol[c] - (deg[v] if c == lab[v] else 0))
                for c, k in kvc.items()
            }
            own = scores[lab[v]]
            pool = [
                (-s, c)
                for c, s in scores.items()
                if c == lab[v] or (c < lab[v] and s > own)
            ]
            new[v] = min(pool)[1]
        lab = new
    return lab


@pytest.mark.parametrize("steps", [1, 2, 4])
def test_greedy_modularity_vs_oracle(spark, steps):
    from mesos_pregel_spark.algos.communities import greedy_modularity

    pairs = TWO_TRIANGLES + [
        ("f", "g"), ("g", "h"), ("h", "f"),   # third triangle off f
        ("x", "y"),                            # isolated dumbbell edge
        ("b", "a"), ("a", "a"),                # reverse dup + self loop
    ]
    got = {
        r["id"]: r["label"]
        for r in greedy_modularity(spark, _edges(spark, pairs), steps=steps)
        .collect()
    }
    assert got == _oracle_greedy_modularity(pairs, steps)


def test_greedy_modularity_finds_planted_communities(spark):
    from mesos_pregel_spark.algos.communities import greedy_modularity

    lab = {
        r["id"]: r["label"]
        for r in greedy_modularity(
            spark, _edges(spark, TWO_TRIANGLES), steps=4
        ).collect()
    }
    assert len({lab[v] for v in "abc"}) == 1
    assert len({lab[v] for v in "def"}) == 1
    assert lab["a"] != lab["d"]
