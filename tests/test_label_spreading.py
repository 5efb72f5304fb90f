"""Label spreading (Zhou et al. 2004) — algos/spread.py."""

from __future__ import annotations

import math

import pytest

from mesos_pregel_spark.algos.spread import label_spreading

pytestmark = pytest.mark.usefixtures("spark")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d, 1.0) for s, d in pairs], "src string, dst string, weight double"
    )


def _snap(x: float) -> int:
    # half-up for positive doubles, matching Spark/DuckDB ROUND
    return int(math.floor(x + 0.5))


def _oracle(pairs, seeds, alpha=0.85, steps=4):
    """Exact-recipe replay in plain python."""
    sym = set()
    for s, d in pairs:
        sym.add((s, d))
        sym.add((d, s))
    verts = sorted({v for e in sym for v in e})
    deg = {v: sum(1 for s, d in sym if s == v) for v in verts}
    k = len(seeds)
    restart = _snap((1.0 - alpha) * 1_000_000)
    f = {v: [1_000_000 if v == seeds[i] else 0 for i in range(k)]
         for v in verts}
    y = {v: [restart if v == seeds[i] else 0 for i in range(k)]
         for v in verts}
    for _ in range(steps):
        acc = {v: [0] * k for v in verts}
        for s, d in sym:
            sq = math.sqrt(float(deg[s] * deg[d]))
            for i in range(k):
                acc[d][i] += _snap(f[s][i] / sq)
        f = {
            v: [_snap(alpha * acc[v][i]) + y[v][i] for i in range(k)]
            for v in verts
        }
    out = {}
    for v in verts:
        best = max(f[v])
        cls = min(i for i in range(k) if f[v][i] == best)
        out[v] = (tuple(f[v]), cls)
    return out


def _run(spark, pairs, seeds, **kw):
    labels, _run = label_spreading(spark, _edges(spark, pairs), seeds, **kw)
    k = len(seeds)
    return {
        r["id"]: (tuple(r[f"f{i}"] for i in range(k)), r["cls"])
        for r in labels.collect()
    }


def test_matches_exact_recipe_oracle(spark):
    # two loose clusters bridged by one edge
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"),
             ("c", "x")]
    seeds = ["a", "z"]
    assert _run(spark, pairs, seeds) == _oracle(pairs, seeds)


def test_seeds_win_their_own_cluster(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"),
             ("c", "x")]
    got = _run(spark, pairs, ["a", "z"])
    assert got["b"][1] == 0 and got["y"][1] == 1


def test_three_lanes_and_tie_break(spark):
    # symmetric star: spokes tie on nothing (each seed is a spoke),
    # hub ties across all three lanes -> lowest lane wins
    pairs = [("h", "s0"), ("h", "s1"), ("h", "s2")]
    seeds = ["s0", "s1", "s2"]
    got = _run(spark, pairs, seeds)
    assert got == _oracle(pairs, seeds)
    assert got["h"][1] == 0  # exact three-way tie -> lane 0


def test_steps_zero_is_pure_seed_matrix(spark):
    pairs = [("a", "b")]
    got = _run(spark, pairs, ["a"], steps=1)
    oracle = _oracle(pairs, ["a"], steps=1)
    assert got == oracle


def test_duplicate_seed_raises(spark):
    with pytest.raises(ValueError):
        label_spreading(spark, _edges(spark, [("a", "b")]), ["a", "a"])
