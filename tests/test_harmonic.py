"""Sampled harmonic centrality (algos/harmonic.py) vs a brute-force
python BFS oracle: exact scaled-integer contributions, pivot rule,
depth truncation, and the isolated-vertex zero case."""

import hashlib
from collections import defaultdict, deque

from mesos_pregel_spark.algos.harmonic import HC_SCALE, harmonic_sampled


def _df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src string, dst string, weight double"
    )


def _und(pairs):
    s = set()
    for a, b in pairs:
        if a != b:
            s.add((min(a, b), max(a, b)))
    return s


def _oracle(pairs, n_pivots, max_depth):
    und = _und(pairs)
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    verts = sorted(adj)
    pivots = sorted(
        verts, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:n_pivots]
    hnum = defaultdict(int)
    dsum = defaultdict(int)
    nreach = defaultdict(int)
    ecc = defaultdict(int)
    for s in pivots:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_depth:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for v, d in dist.items():
            if 1 <= d <= max_depth:
                hnum[v] += HC_SCALE // d
                dsum[v] += d
                nreach[v] += 1
                ecc[v] = max(ecc[v], d)
    return {v: (nreach[v], hnum[v], dsum[v], ecc[v]) for v in verts}


PAIRS = [
    ("a", "b"), ("b", "c"), ("a", "c"),
    ("c", "d"), ("d", "e"), ("e", "f"),
    ("f", "g"), ("g", "h"),
    ("x", "y"),                # far component
    ("b", "a"), ("a", "a"),    # reverse dup + self loop
]


def test_harmonic_vs_oracle(spark):
    out, run = harmonic_sampled(
        spark, _df(spark, PAIRS), n_pivots=4, max_depth=10
    )
    got = {r["id"]: (r["n_reached"], r["hnum"], r["dsum"], r["ecc_lb"])
           for r in out.collect()}
    assert got == _oracle(PAIRS, 4, 10)
    assert run.metrics


def test_harmonic_depth_truncation(spark):
    # path graph: depth limit 2 must drop the far contributions
    path = [(str(i), str(i + 1)) for i in range(8)]
    out, _run = harmonic_sampled(
        spark, _df(spark, path), n_pivots=3, max_depth=2
    )
    got = {r["id"]: (r["n_reached"], r["hnum"], r["dsum"], r["ecc_lb"])
           for r in out.collect()}
    assert got == _oracle(path, 3, 2)
    deep = _oracle(path, 3, 10)
    assert got != {v: deep[v] for v in got}


def test_harmonic_partition_invariance(spark):
    a, _ = harmonic_sampled(
        spark, _df(spark, PAIRS), n_pivots=4, max_depth=10,
        edge_partitions=1,
    )
    b, _ = harmonic_sampled(
        spark, _df(spark, PAIRS), n_pivots=4, max_depth=10,
        edge_partitions=7,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_closeness_readout(spark):
    # closeness = n_reached / dsum on the same run; star center at
    # depth 1 from every leaf pivot
    star = [("c", str(i)) for i in range(5)]
    out, _run = harmonic_sampled(spark, _df(spark, star), n_pivots=3,
                                 max_depth=10)
    rows = {r["id"]: r for r in out.collect()}
    want = _oracle(star, 3, 10)
    for v, (nr, _hn, ds, _e) in want.items():
        assert (rows[v]["n_reached"], rows[v]["dsum"]) == (nr, ds)
