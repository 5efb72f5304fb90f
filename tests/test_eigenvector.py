"""algos/eigenvector.py vs a pure-python power-iteration unroll, plus
partition invariance, the L2-normalization contract, and the zero-norm
(deep-DAG) edge case."""

import math
import random

import pytest

from mesos_pregel_spark.algos.eigenvector import eigenvector


def _py_eig(edges, k):
    e = {(s, d) for s, d in edges}
    verts = {v for p in e for v in p}
    x = {v: 1.0 for v in verts}
    for _ in range(k):
        nx = {v: 0.0 for v in verts}
        for s, d in e:
            nx[d] += x[s]
        x = nx
    norm = math.sqrt(sum(v * v for v in x.values()))
    if norm > 0.0:
        return {v: round(val / norm, 9) for v, val in x.items()}
    return {v: 0.0 for v in verts}


def _df(spark, edges, parts=4):
    return spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in edges],
        "src long, dst long, weight double",
    ).repartition(parts)


@pytest.mark.parametrize("k", [1, 3, 4])
def test_eigenvector_matches_python(spark, k):
    rng = random.Random(7)
    edges = list({(rng.randrange(9), rng.randrange(9)) for _ in range(30)})
    scores, run = eigenvector(spark, _df(spark, edges),
                              max_supersteps=k, edge_partitions=4)
    got = {r["id"]: r["eigenvector"] for r in scores.collect()}
    assert got == _py_eig(edges, k)
    assert len(run.metrics) == k


def test_eigenvector_unit_norm(spark):
    """The returned vector has L2 norm 1 (up to the 9-dp rounding)."""
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (2, 4)]
    scores, _ = eigenvector(spark, _df(spark, edges), max_supersteps=4,
                            edge_partitions=3)
    vals = [r["eigenvector"] for r in scores.collect()]
    assert abs(math.sqrt(sum(v * v for v in vals)) - 1.0) < 1e-8


def test_eigenvector_cycle_is_uniform(spark):
    """On a directed n-cycle every vertex scores exactly 1/sqrt(n)."""
    n = 5
    edges = [(i, (i + 1) % n) for i in range(n)]
    scores, _ = eigenvector(spark, _df(spark, edges), max_supersteps=4,
                            edge_partitions=2)
    want = round(1.0 / math.sqrt(n), 9)
    assert {r["eigenvector"] for r in scores.collect()} == {want}


def test_eigenvector_zero_norm_chain(spark):
    """A 3-chain DAG has no in-walk of length 3 — x_3 is all zero and
    the pinned zero-norm rule maps every score to 0.0."""
    scores, _ = eigenvector(spark, _df(spark, [(1, 2), (2, 3)]),
                            max_supersteps=3, edge_partitions=2)
    assert {r["eigenvector"] for r in scores.collect()} == {0.0}


def test_eigenvector_partition_invariance(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    a, _ = eigenvector(spark, _df(spark, edges, 2), max_supersteps=4,
                       edge_partitions=2)
    b, _ = eigenvector(spark, _df(spark, edges, 7), max_supersteps=4,
                       edge_partitions=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
