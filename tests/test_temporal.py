"""algos/temporal.py (time-respecting earliest arrival) vs a pure-
python relaxation oracle, plus the foremost-path semantics pins:
a static path that is temporally backwards is NOT reachable, and
capped ≡ deep-cap on a converged instance."""

import random

from mesos_pregel_spark.algos.temporal import temporal_reach

INF = 1.0e18


def _df(spark, transitions, parts=4):
    """transitions = [(src, dst, t_us)]"""
    return spark.createDataFrame(
        [(int(s), int(d), int(t)) for s, d, t in transitions],
        "src long, dst long, t long",
    ).repartition(parts)


def _py_reach(transitions, seed, rounds):
    tr = {(s, d, float(t)) for s, d, t in transitions if s != d}
    verts = {v for s, d, _t in tr for v in (s, d)}
    arr = {v: (0.0 if v == seed else INF) for v in verts}
    for _ in range(rounds):
        new = dict(arr)
        for s, d, t in tr:
            if t >= arr[s] and t < new[d]:
                new[d] = t
        arr = new
    return {
        v: (None if a >= INF else int(a)) for v, a in arr.items()
    }


def test_temporal_reach_matches_python(spark):
    rng = random.Random(31)
    transitions = [
        (rng.randrange(8), rng.randrange(8), rng.randrange(1, 1000))
        for _ in range(60)
    ]
    transitions = [(s, d, t) for s, d, t in transitions if s != d]
    seed = min(v for s, d, _t in transitions for v in (s, d))
    got_df, _ = temporal_reach(spark, _df(spark, transitions), seed,
                               max_supersteps=6, edge_partitions=4)
    got = {r["id"]: r["arrival_us"] for r in got_df.collect()}
    assert got == _py_reach(transitions, seed, 6)


def test_temporal_reach_respects_time_order(spark):
    """0→1 at t=100, 1→2 at t=50: statically 2 is reachable from 0,
    temporally it is NOT (the 1→2 transition departs before arrival
    at 1).  The reverse ordering IS reachable."""
    backwards = [(0, 1, 100), (1, 2, 50)]
    got_df, _ = temporal_reach(spark, _df(spark, backwards), 0,
                               max_supersteps=6, edge_partitions=2)
    got = {r["id"]: r["arrival_us"] for r in got_df.collect()}
    assert got == {0: 0, 1: 100, 2: None}

    forwards = [(0, 1, 50), (1, 2, 100)]
    got_df, _ = temporal_reach(spark, _df(spark, forwards), 0,
                               max_supersteps=6, edge_partitions=2)
    got = {r["id"]: r["arrival_us"] for r in got_df.collect()}
    assert got == {0: 0, 1: 50, 2: 100}


def test_temporal_reach_takes_earliest_usable(spark):
    """Two usable transitions into the same vertex: the earlier one
    wins; an even earlier but UNUSABLE one (departs before arrival at
    its source) does not."""
    transitions = [
        (0, 1, 200),   # arrive at 1 at t=200
        (1, 2, 300),   # usable, arrives 300
        (0, 2, 250),   # usable, arrives 250  <- earliest usable
        (1, 2, 100),   # unusable: departs 1 before arrival (200)
    ]
    got_df, _ = temporal_reach(spark, _df(spark, transitions), 0,
                               max_supersteps=6, edge_partitions=2)
    got = {r["id"]: r["arrival_us"] for r in got_df.collect()}
    assert got[2] == 250


def test_temporal_reach_capped_equals_deep_cap(spark):
    """Monotone relaxation: early-halt at the fixpoint equals a much
    deeper cap — the property the 6-step SQL unroll rests on."""
    rng = random.Random(7)
    transitions = [
        (rng.randrange(6), rng.randrange(6), rng.randrange(1, 500))
        for _ in range(30)
    ]
    transitions = [(s, d, t) for s, d, t in transitions if s != d]
    a, _ = temporal_reach(spark, _df(spark, transitions), 0,
                          max_supersteps=6, edge_partitions=2)
    b, _ = temporal_reach(spark, _df(spark, transitions), 0,
                          max_supersteps=25, edge_partitions=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
