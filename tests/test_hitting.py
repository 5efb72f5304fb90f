"""algos/hitting.py vs a pure-python replication of the exact integer
Bellman recurrence, plus closed forms and partition invariance."""

import random

import pytest

from mesos_pregel_spark.algos.hitting import MICRO, hitting_time


def _df(spark, edges, parts=4):
    """edges = [(src, dst)] — weight unused by the uniform walk."""
    return spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in edges],
        "src long, dst long, weight double",
    ).repartition(parts)


def _py_hitting(edges, k):
    """The exact recurrence: integer micro-steps, floor division."""
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    lm = min(adj)
    h = {v: 0 for v in adj}
    for _ in range(k):
        nh = {}
        for v, ns in adj.items():
            if v == lm:
                nh[v] = 0
            else:
                nh[v] = MICRO + sum(h[u] for u in ns) // len(ns)
        h = nh
    return h


@pytest.mark.parametrize("k", [1, 3, 8])
def test_hitting_matches_python(spark, k):
    rng = random.Random(23)
    edges = sorted({
        (rng.randrange(10), rng.randrange(10)) for _ in range(30)
    })
    edges = [(s, d) for s, d in edges if s != d]
    prof, run = hitting_time(spark, _df(spark, edges),
                             max_supersteps=k, edge_partitions=4)
    got = {r["id"]: r["h"] for r in prof.collect()}
    assert got == _py_hitting(edges, k)
    assert len(run.metrics) == k


def test_hitting_star_closed_form(spark):
    """Star with the landmark at the center: every leaf hits in
    exactly one step (h = MICRO, stable from superstep 1 on)."""
    edges = [(0, i) for i in range(1, 6)]
    prof, _run = hitting_time(spark, _df(spark, edges),
                              max_supersteps=8, edge_partitions=2)
    got = {r["id"]: r["h"] for r in prof.collect()}
    assert got[0] == 0
    assert all(got[i] == MICRO for i in range(1, 6))


def test_hitting_path_converges_from_below(spark):
    """Path 1-2-3: true hitting times are 3 and 4 steps; the capped
    iteration is monotone from below and lands within a micro-step
    floor error of the fixpoint by k=40."""
    edges = [(1, 2), (2, 3)]
    prof, _run = hitting_time(spark, _df(spark, edges),
                              max_supersteps=40, edge_partitions=2)
    got = {r["id"]: r["h"] for r in prof.collect()}
    assert got[1] == 0
    assert abs(got[2] - 3 * MICRO) <= 40  # 3 + floor drift
    assert abs(got[3] - 4 * MICRO) <= 40
    # monotone from below: a shorter run is never above a longer one
    prof8, _ = hitting_time(spark, _df(spark, edges),
                            max_supersteps=8, edge_partitions=2)
    got8 = {r["id"]: r["h"] for r in prof8.collect()}
    assert all(got8[v] <= got[v] for v in got)


def test_hitting_partition_invariance(spark):
    rng = random.Random(7)
    edges = sorted({
        (rng.randrange(12), rng.randrange(12)) for _ in range(40)
    })
    edges = [(s, d) for s, d in edges if s != d]
    outs = []
    for parts in (1, 3, 8):
        prof, _ = hitting_time(spark, _df(spark, edges, parts),
                               max_supersteps=5, edge_partitions=parts)
        outs.append(sorted((r["id"], r["h"]) for r in prof.collect()))
    assert outs[0] == outs[1] == outs[2]
