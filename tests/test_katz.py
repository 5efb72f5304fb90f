"""algos/katz.py vs a pure-python unroll, plus partition invariance
and the beta=0 / empty-in-edge edge cases."""

import random

import pytest

from mesos_pregel_spark.algos.katz import katz


def _py_katz(edges, beta, k):
    e = {(s, d) for s, d in edges}
    verts = {v for p in e for v in p}
    x = {v: 1.0 for v in verts}
    out = {v: 1.0 for v in verts}
    for _ in range(k):
        nx = {v: 0.0 for v in verts}
        for s, d in e:
            nx[d] += beta * x[s]
        x = nx
        for v in verts:
            out[v] += x[v]
    return {v: round(val, 9) for v, val in out.items()}


def _df(spark, edges, parts=4):
    return spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in edges],
        "src long, dst long, weight double",
    ).repartition(parts)


@pytest.mark.parametrize("k", [1, 3, 5])
def test_katz_matches_python(spark, k):
    rng = random.Random(3)
    edges = list({(rng.randrange(9), rng.randrange(9)) for _ in range(30)})
    scores, run = katz(spark, _df(spark, edges), beta=0.1,
                       max_supersteps=k, edge_partitions=4)
    got = {r["id"]: r["katz"] for r in scores.collect()}
    assert got == _py_katz(edges, 0.1, k)
    assert len(run.metrics) == k


def test_katz_partition_invariance(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    a, _ = katz(spark, _df(spark, edges, 2), max_supersteps=4,
                edge_partitions=2)
    b, _ = katz(spark, _df(spark, edges, 7), max_supersteps=4,
                edge_partitions=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_katz_sink_and_source(spark):
    # 1 -> 2: source vertex 1 receives nothing (katz stays 1.0);
    # sink 2 accumulates beta each remaining step only from x1
    scores, _ = katz(spark, _df(spark, [(1, 2)]), beta=0.5,
                     max_supersteps=3, edge_partitions=2)
    got = {r["id"]: r["katz"] for r in scores.collect()}
    # x: step1 -> x(2)=0.5; step2 -> x(2)=0 (1's x became 0)
    assert got == {1: 1.0, 2: 1.5}
