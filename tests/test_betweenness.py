"""Pivot-sampled Brandes betweenness (algos/betweenness.py) vs a
python reference: exact per-vertex dependency sums (round 6), pivot
exclusion, bounded-radius truncation, lane-vs-sequential equality."""

import hashlib
from collections import defaultdict, deque

from pyspark.sql import functions as F

from mesos_pregel_spark.algos.betweenness import betweenness_sampled


def _df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src string, dst string, weight double"
    )


def _adj(pairs):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _pivots(adj, k):
    return sorted(adj, key=lambda v: (hashlib.md5(v.encode()).hexdigest(), v))[:k]


def _brandes_oracle(pairs, k, max_depth):
    """Truncated Brandes from the k md5-min pivots: BFS to max_depth,
    dependency sweep, delta summed per vertex excluding its own pivot
    lane — the engine's pinned contract."""
    adj = _adj(pairs)
    bc = {v: 0.0 for v in adj}
    for s in _pivots(adj, k):
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            if dist[v] == max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = defaultdict(float)
        for w in reversed(order):
            for v in adj[w]:
                if v in dist and dist[v] == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
        for v in order:
            if v != s:
                bc[v] += delta[v]
    return {v: round(x, 6) for v, x in bc.items()}


PAIRS = [
    # a path a-b-c-d-e with a triangle hanging off c and a star at e
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
    ("c", "f"), ("f", "g"), ("g", "c"),
    ("e", "h"), ("e", "i"), ("e", "j"),
    # a disconnected pair
    ("x", "y"),
]


def _collect(df):
    return {r["id"]: r["bc"] for r in df.collect()}


def test_matches_python_brandes(spark):
    got, run = betweenness_sampled(
        spark, _df(spark, PAIRS), n_pivots=4, max_depth=10
    )
    assert _collect(got) == _brandes_oracle(PAIRS, 4, 10)


def test_all_pivots_equals_full_brandes(spark):
    """With every vertex a pivot the sampled sum IS directed-sweep
    Brandes betweenness over the symmetrized graph."""
    adj = _adj(PAIRS)
    got, _run = betweenness_sampled(
        spark, _df(spark, PAIRS), n_pivots=len(adj), max_depth=10
    )
    assert _collect(got) == _brandes_oracle(PAIRS, len(adj), 10)
    # sanity on the planted shape: the path's inner cut vertices carry
    # the most betweenness; leaves carry none
    bc = _collect(got)
    assert bc["h"] == bc["i"] == bc["j"] == 0.0
    assert bc["c"] > bc["b"] > 0
    assert bc["e"] > 0


def test_truncation_is_pinned(spark):
    """max_depth caps the sweep on BOTH sides identically."""
    got, run = betweenness_sampled(
        spark, _df(spark, PAIRS), n_pivots=4, max_depth=2
    )
    assert _collect(got) == _brandes_oracle(PAIRS, 4, 2)


def test_no_cache_leak(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    betweenness_sampled(spark, _df(spark, PAIRS), n_pivots=2, max_depth=4)
    assert jsc.getPersistentRDDs().size() <= before + 1  # final state only
