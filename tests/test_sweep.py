"""algos/sweep.py vs an exact-recipe python replication (4-step PPR
unroll + ppr/deg sweep + integer cut/vol bookkeeping), plus the
planted-community sanity: on two cliques joined by one bridge, the
conductance minimum is exactly the seed's clique."""

import decimal
import math

from mesos_pregel_spark.algos.sweep import sweep_cut

_INF = 1 << 40


def _snap(x):
    return int(decimal.Decimal(x).quantize(0, rounding=decimal.ROUND_HALF_UP))


def _py_sweep(edges, steps=4, max_k=64):
    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    sym = {}
    for a, b in und:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    deg = {v: len(ns) for v, ns in sym.items()}
    m = len(und)
    seed = min(deg)
    pr = {v: (1.0 if v == seed else 0.0) for v in deg}
    for _ in range(steps):
        agg = {v: 0.0 for v in deg}
        for s, ns in sym.items():
            for d in ns:
                agg[d] += pr[s] / deg[s]
        pr = {v: 0.15 * (1.0 if v == seed else 0.0) + 0.85 * agg[v]
              for v in deg}
    smic = {v: _snap(round(p, 9) * 1e9) for v, p in pr.items() if
            _snap(round(p, 9) * 1e9) > 0}
    order = sorted(smic, key=lambda v: (-(smic[v] / deg[v]), v))[:max_k]
    rk = {v: i + 1 for i, v in enumerate(order)}
    rows = []
    vol = 0
    for i, v in enumerate(order, start=1):
        vol += deg[v]
        cut = 0
        for a, b in und:
            ra, rb = rk.get(a, _INF), rk.get(b, _INF)
            if (ra <= i) != (rb <= i):
                cut += 1
        den = min(vol, 2 * m - vol)
        cond = round(cut / den, 9) if den > 0 else None
        rows.append((i, v, deg[v], vol, cut, cond))
    return rows


def _df(spark, edges, parts=4):
    return spark.createDataFrame(
        [(int(min(a, b)), int(max(a, b))) for a, b in edges],
        "src long, dst long",
    ).repartition(parts)


def test_sweep_matches_recipe_oracle(spark):
    import random

    rng = random.Random(17)
    edges = list({tuple(sorted((rng.randrange(12), rng.randrange(12))))
                  for _ in range(40)})
    edges = [(a, b) for a, b in edges if a != b]
    got = [tuple(r) for r in
           sweep_cut(spark, _df(spark, edges)).orderBy("i").collect()]
    assert got == _py_sweep(edges)


def test_sweep_finds_planted_clique(spark):
    """Cliques {0..4} and {10..14} joined by the single bridge (4,10);
    seed = 0.  The curve's conductance minimum sits exactly at prefix
    size 5 (= the seed's whole clique, cut = 1 bridge edge)."""
    import itertools

    a = list(itertools.combinations(range(5), 2))
    b = list(itertools.combinations(range(10, 15), 2))
    edges = a + b + [(4, 10)]
    rows = sweep_cut(spark, _df(spark, edges)).orderBy("i").collect()
    best = min(
        (r for r in rows if r["conductance"] is not None),
        key=lambda r: (r["conductance"], r["i"]),
    )
    assert best["i"] == 5
    assert best["cut"] == 1
    assert set(r["part"] for r in rows[:5]) == {0, 1, 2, 3, 4}


def test_sweep_whole_graph_prefix_is_null(spark):
    """A connected triangle swallowed entirely: the final prefix has
    vol = 2m, denominator 0, conductance NULL."""
    rows = sweep_cut(spark, _df(spark, [(1, 2), (2, 3), (1, 3)])) \
        .orderBy("i").collect()
    assert rows[-1]["conductance"] is None
    assert rows[-1]["cut"] == 0
