"""algos/directed.py — reciprocity + directed triangle census against
independent brute-force oracles (the oracles count by iterating ALL
ordered triples, not by the engine's min-vertex rooting, so a rooting
bug cannot cancel out)."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from mesos_pregel_spark.algos.directed import reciprocity, triangle_census


def _df(spark, edges):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges], "src long, dst long"
    )


def _brute_rho(edges):
    """Garlaschelli-Loffredo rho via the exact-integer reduction,
    None when the density correction is undefined (complete/empty)."""
    e = {(s, d) for s, d in edges if s != d}
    verts = {v for p in e for v in p}
    m = len(e)
    mut = sum(1 for (s, d) in e if (d, s) in e)
    cap = len(verts) * (len(verts) - 1)
    den = m * cap - m * m
    if den <= 0:
        return None
    return round((mut * cap - m * m) / den, 9)


def _brute(edges):
    e = {(s, d) for s, d in edges if s != d}
    verts = {v for p in e for v in p}
    mutual = sum(1 for (s, d) in e if (d, s) in e)
    cyc3 = sum(
        1
        for u, v, w in itertools.permutations(verts, 3)
        if (u, v) in e and (v, w) in e and (w, u) in e
    )
    assert cyc3 % 3 == 0
    tra = sum(
        1
        for u, v, w in itertools.permutations(verts, 3)
        if (u, v) in e and (v, w) in e and (u, w) in e
    )
    return len(e), mutual, cyc3 // 3, tra


GRAPHS = {
    "cycle3": [(1, 2), (2, 3), (3, 1)],
    "transitive3": [(1, 2), (2, 3), (1, 3)],
    "full_k3": [(a, b) for a, b in itertools.permutations([1, 2, 3], 2)],
    "mutual_pair_plus_tail": [(1, 2), (2, 1), (2, 3)],
    "two_cycles_sharing_edge": [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_micro_graphs(spark, name):
    edges = GRAPHS[name]
    total, mutual, cyc, tra = _brute(edges)
    r = reciprocity(spark, _df(spark, edges)).collect()[0]
    assert (r["total_edges"], r["mutual_edges"]) == (total, mutual)
    assert r["reciprocity"] == round(mutual / total, 9)
    assert r["rho"] == _brute_rho(edges)
    c = triangle_census(spark, _df(spark, edges)).collect()[0]
    assert (c["cyclic_triangles"], c["transitive_triplets"]) == (cyc, tra)


def test_full_k3_closed_form(spark):
    # all 6 directed edges on 3 vertices: 2 directed 3-cycles, every
    # ordered triple transitive (6), reciprocity 1.0
    c = triangle_census(spark, _df(spark, GRAPHS["full_k3"])).collect()[0]
    assert (c["cyclic_triangles"], c["transitive_triplets"]) == (2, 6)
    r = reciprocity(spark, _df(spark, GRAPHS["full_k3"])).collect()[0]
    assert r["reciprocity"] == 1.0
    assert r["rho"] is None          # complete digraph: a = 1, undefined


def test_random_graph_vs_brute(spark):
    rng = random.Random(7)
    edges = list(
        {(rng.randrange(12), rng.randrange(12)) for _ in range(90)}
    )
    total, mutual, cyc, tra = _brute(edges)
    r = reciprocity(spark, _df(spark, edges)).collect()[0]
    assert (r["total_edges"], r["mutual_edges"]) == (total, mutual)
    assert r["rho"] == _brute_rho(edges)
    c = triangle_census(spark, _df(spark, edges)).collect()[0]
    assert (c["cyclic_triangles"], c["transitive_triplets"]) == (cyc, tra)


def test_duplicate_rows_and_self_loops_ignored(spark):
    edges = GRAPHS["cycle3"] + GRAPHS["cycle3"] + [(1, 1), (2, 2)]
    c = triangle_census(spark, _df(spark, edges)).collect()[0]
    assert (c["cyclic_triangles"], c["transitive_triplets"]) == (1, 0)


def test_hub_cap_matches_brute_on_reduced_graph(spark):
    rng = random.Random(11)
    edges = list({(rng.randrange(10), rng.randrange(10)) for _ in range(70)})
    cap = 6
    e = {(s, d) for s, d in edges if s != d}
    deg = {}
    for s, d in e:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    kept = [(s, d) for s, d in e if deg[s] <= cap and deg[d] <= cap]
    _, _, cyc, tra = _brute(kept)
    c = triangle_census(spark, _df(spark, edges), max_degree=cap).collect()[0]
    assert (c["cyclic_triangles"], c["transitive_triplets"]) == (cyc, tra)


def test_rank_drift_replication(spark):
    """window_rank_drift vs a hand replication: dense rank by strength
    within window (ties share), delta vs previous APPEARANCE window."""
    from mesos_pregel_spark.functions.edges import window_rank_drift

    rows = [
        # window 0: a out-strength 3, b 2, c 2
        (0, "a", "x", 3.0), (0, "b", "x", 2.0), (0, "c", "x", 2.0),
        # window 1: b 5, a 1   (c absent)
        (1, "b", "x", 5.0), (1, "a", "x", 1.0),
        # window 3: c returns
        (3, "c", "x", 4.0), (3, "a", "x", 4.0),
    ]
    wedges = spark.createDataFrame(
        rows, "window_idx long, src_actor string, dst_actor string, weight double"
    )
    got = {
        (r["window_idx"], r["actor"]): (r["out_weight"], r["rnk"], r["rank_delta"])
        for r in window_rank_drift(wedges).collect()
    }
    assert got == {
        (0, "a"): (3.0, 1, None),
        (0, "b"): (2.0, 2, None),
        (0, "c"): (2.0, 2, None),      # tie shares dense rank 2
        (1, "b"): (5.0, 1, -1),
        (1, "a"): (1.0, 2, 1),
        (3, "a"): (4.0, 1, -1),        # previous appearance = window 1
        (3, "c"): (4.0, 1, -1),        # previous appearance = window 0
    }


def _oracle_dir_assort(edges):
    """Exact-recipe replication of directed_assortativity."""
    import math as _math
    from collections import Counter

    de = {(a, b) for a, b in edges if a != b}
    dout, din = Counter(), Counter()
    for a, b in de:
        dout[a] += 1
        din[b] += 1
    modes = {
        "out-out": lambda a, b: (dout[a], dout[b]),
        "out-in": lambda a, b: (dout[a], din[b]),
        "in-out": lambda a, b: (din[a], dout[b]),
        "in-in": lambda a, b: (din[a], din[b]),
    }
    n = len(de)
    out = {}
    for m, f in modes.items():
        sx = sy = sxx = syy = sxy = 0
        for a, b in de:
            x, y = f(a, b)
            sx += x; sy += y; sxx += x * x; syy += y * y; sxy += x * y
        denx = float(n * sxx - sx * sx)
        deny = float(n * syy - sy * sy)
        r = (round(float(n * sxy - sx * sy) / _math.sqrt(denx * deny), 9)
             if denx > 0 and deny > 0 else None)
        out[m] = (n, r)
    return out


def test_directed_assortativity_matches_recipe_oracle(spark):
    from mesos_pregel_spark.algos.directed import directed_assortativity

    edges = [
        (1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (4, 2), (5, 4), (2, 5),
        (6, 1), (6, 2), (6, 3), (3, 6), (7, 7),     # self-loop dropped
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["mode"]: (r["n_edges"], r["r"])
        for r in directed_assortativity(spark, df).collect()
    }
    assert got == _oracle_dir_assort(edges)
    assert len(got) == 4


def test_directed_assortativity_zero_variance_is_null(spark):
    from mesos_pregel_spark.algos.directed import directed_assortativity

    # directed 3-cycle: every in/out degree is 1 -> zero variance
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    got = {
        r["mode"]: r["r"]
        for r in directed_assortativity(spark, df).collect()
    }
    assert got == {m: None for m in ("out-out", "out-in", "in-out", "in-in")}
