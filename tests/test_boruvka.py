"""Borůvka MSF (algos/boruvka.py) vs python references: a Kruskal
union-find oracle under the pinned (weight, lo, hi) total order (true
unique MSF), and a transition-replaying oracle that mirrors the
engine's rounds/jump caps exactly (capped == unrolled contract)."""

import random

from mesos_pregel_spark.algos.boruvka import boruvka_msf


def _df(spark, triples):
    return spark.createDataFrame(
        [(a, b, float(w)) for a, b, w in triples],
        "src string, dst string, weight double",
    )


def _canon(triples):
    """Mirror _canonical: string-ordered endpoints, self-loops dropped,
    parallel edges collapsed to min weight."""
    best = {}
    for a, b, w in triples:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        k = (lo, hi)
        if k not in best or int(w) < best[k]:
            best[k] = int(w)
    return sorted((w, lo, hi) for (lo, hi), w in best.items())


def _kruskal(triples):
    """Unique MSF under (weight, lo, hi): sorted union-find."""
    edges = _canon(triples)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for w, lo, hi in edges:
        ra, rb = find(lo), find(hi)
        if ra != rb:
            parent[ra] = rb
            forest.add((lo, hi, w))
    return forest


def _replay(triples, max_rounds, jump_depth):
    """Exact python mirror of one engine run (and of the SQL twin):
    per-component struct-min selection, mutual-pair root break,
    jump_depth pointer jumps, relabel.  Selection happens over the raw
    relabeled edge set — provably equal to the engine's collapsed
    working set (min over pair minima == global min)."""
    edges = _canon(triples)
    comp = {}
    for _, lo, hi in edges:
        comp[lo] = lo
        comp[hi] = hi
    forest = set()
    for _ in range(max_rounds):
        sel = {}
        for w, lo, hi in edges:
            ca, cb = comp[lo], comp[hi]
            if ca == cb:
                continue
            for c, oc in ((ca, cb), (cb, ca)):
                m = (w, lo, hi, oc)
                if c not in sel or m < sel[c]:
                    sel[c] = m
        if not sel:
            break
        for w, lo, hi, _ in sel.values():
            forest.add((lo, hi, w))
        ptr = {c: m[3] for c, m in sel.items()}
        ptr = {
            c: (c if ptr.get(p) == c and c < p else p)
            for c, p in ptr.items()
        }
        for _ in range(jump_depth):
            ptr = {c: ptr[p] for c, p in ptr.items()}
        comp = {v: ptr.get(c, c) for v, c in comp.items()}
    return forest


def _collect(df):
    return {(r["lo"], r["hi"], r["weight"]) for r in df.collect()}


PATH = [("a", "b", 1), ("b", "c", 2), ("c", "d", 3)]
CYCLE = [("a", "b", 1), ("b", "c", 2), ("c", "a", 3)]
TWO_COMPS = [("a", "b", 5), ("c", "d", 1), ("d", "e", 2), ("c", "e", 9)]
MESSY = [  # parallel edges, self-loop, reversed duplicates, weight ties
    ("x", "y", 4), ("y", "x", 2), ("x", "x", 1), ("y", "z", 2),
    ("z", "w", 2), ("w", "x", 2), ("w", "y", 7),
]


def test_msf_small_graphs(spark):
    for triples in (PATH, CYCLE, TWO_COMPS, MESSY):
        forest, _run = boruvka_msf(
            spark, _df(spark, triples), strict_contract=True
        )
        assert _collect(forest) == _kruskal(triples), triples


def test_msf_random_graph(spark):
    rnd = random.Random(20260818)
    n = 120
    triples = [
        (f"v{rnd.randrange(n)}", f"v{rnd.randrange(n)}", rnd.randrange(1, 40))
        for _ in range(400)
    ]
    forest, run = boruvka_msf(
        spark, _df(spark, triples), strict_contract=True
    )
    got = _collect(forest)
    assert got == _kruskal(triples)
    # spanning forest size: |V| - #components of the canonical graph
    verts = set()
    for _, lo, hi in _canon(triples):
        verts.update((lo, hi))
    n_comps = len(verts) - len(got)
    assert n_comps >= 1
    assert run.superstep <= 8  # log-round convergence on 120 vertices


def test_capped_round_equals_replay(spark):
    """A 1-round run must equal the python transition replay at the
    same cap (capped == unrolled), even though it is not the MSF yet."""
    triples = PATH + [("d", "e", 1), ("e", "f", 5), ("f", "a", 4)]
    forest, _run = boruvka_msf(spark, _df(spark, triples), max_rounds=1)
    assert _collect(forest) == _replay(triples, 1, 5)


def test_shallow_jump_parity(spark):
    """jump_depth=0 leaves pointer chains uncontracted; the engine must
    still match the replay exactly (shared-cap parity holds even when
    contraction is incomplete)."""
    rnd = random.Random(7)
    triples = [
        (f"u{rnd.randrange(40)}", f"u{rnd.randrange(40)}", rnd.randrange(1, 9))
        for _ in range(90)
    ]
    forest, _run = boruvka_msf(
        spark, _df(spark, triples), max_rounds=3, jump_depth=0
    )
    assert _collect(forest) == _replay(triples, 3, 0)


def test_no_cache_leak(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    boruvka_msf(spark, _df(spark, MESSY))
    assert jsc.getPersistentRDDs().size() <= before + 1  # final forest only
