"""algos/simrank.py vs a pure-python integer-micro replication, plus
the structural pins SimRank is known for: co-cited leaves beat
directly-linked hubs, and symmetric positions tie exactly."""

import itertools
import random

from mesos_pregel_spark.algos.simrank import SCALE, simrank_pairs


def _df(spark, edges, parts=4):
    return spark.createDataFrame(
        [(int(lo), int(hi)) for lo, hi in edges], "lo long, hi long"
    ).repartition(parts)


def _py_simrank(edges, top_k, iters, limit):
    und = {(min(a, b), max(a, b)) for a, b in edges}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    top = [v for v, _d in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))][:top_k]
    tset = set(top)
    ind = {(a, b) for a, b in und if a in tset and b in tset}
    nbr = {v: set() for v in tset}
    for a, b in ind:
        nbr[a].add(b)
        nbr[b].add(a)
    ideg = {v: len(ns) for v, ns in nbr.items() if ns}
    s = {(v, v): SCALE for v in tset}
    for _ in range(iters):
        new = {(v, v): SCALE for v in tset}
        for a, b in itertools.permutations(ideg, 2):
            tot = sum(s.get((u, v), 0) for u in nbr[a] for v in nbr[b])
            val = (4 * tot) // (5 * ideg[a] * ideg[b])
            if val > 0:
                new[(a, b)] = val
        s = new
    pairs = sorted(
        ((a, b, v) for (a, b), v in s.items() if a < b),
        key=lambda x: (-x[2], x[0], x[1]),
    )
    return pairs[:limit]


def test_simrank_matches_python(spark):
    rng = random.Random(17)
    edges = list({
        tuple(sorted((rng.randrange(12), rng.randrange(12))))
        for _ in range(40)
    })
    edges = [(a, b) for a, b in edges if a != b]
    got = [
        tuple(r) for r in simrank_pairs(
            spark, _df(spark, edges), top_k=8, iters=3, pair_limit=50
        ).collect()
    ]
    assert got == _py_simrank(edges, 8, 3, 50)


def test_simrank_cocitation_beats_direct_link(spark):
    """The classic SimRank pin: leaves 1 and 2 both hang off hub 0
    (co-cited, structurally equivalent) while 3-4 are directly linked
    but share no neighbours.  s(1,2) > s(3,4) = 0."""
    edges = [(0, 1), (0, 2), (3, 4)]
    rows = simrank_pairs(spark, _df(spark, edges), top_k=8, iters=3,
                         pair_limit=50).collect()
    sim = {(r["a"], r["b"]): r["sim_micro"] for r in rows}
    assert sim.get((1, 2), 0) > 0
    assert (3, 4) not in sim  # no shared neighbours -> score 0, dropped


def test_simrank_symmetric_positions_tie(spark):
    """On a 4-cycle 0-1-2-3, opposite corners are structurally
    identical: s(0,2) == s(1,3) exactly (integer arithmetic — ties
    are exact, not approximate)."""
    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    rows = simrank_pairs(spark, _df(spark, edges), top_k=4, iters=3,
                         pair_limit=50).collect()
    sim = {(r["a"], r["b"]): r["sim_micro"] for r in rows}
    assert sim[(0, 2)] == sim[(1, 3)] > 0
