"""K4 counting (algos/cliques.py) vs a brute-force itertools oracle."""

from itertools import combinations

from mesos_pregel_spark.algos.cliques import four_clique_count


def _df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src string, dst string, weight double"
    )


def _oracle(pairs):
    und = set()
    for a, b in pairs:
        if a != b:
            und.add((min(a, b), max(a, b)))
    verts = sorted({v for e in und for v in e})
    per = {v: 0 for v in verts}
    total = 0
    for quad in combinations(verts, 4):
        if all(
            (min(x, y), max(x, y)) in und for x, y in combinations(quad, 2)
        ):
            total += 1
            for v in quad:
                per[v] += 1
    return per, total


def test_k5_closed_form(spark):
    # K5 contains C(5,4)=5 K4s; every vertex is in C(4,3)=4 of them
    k5 = [(a, b) for a in "pqrst" for b in "pqrst" if a < b]
    per, total = four_clique_count(spark, _df(spark, k5))
    assert total == 5
    assert {r["id"]: r["k4"] for r in per.collect()} == {
        v: 4 for v in "pqrst"
    }


def test_mixed_graph_vs_oracle(spark):
    # K5 + an overlapping K4 + a triangle (no K4) + pendant + dups
    pairs = (
        [(a, b) for a in "pqrst" for b in "pqrst" if a < b]
        + [("t", "u"), ("t", "v"), ("u", "v"), ("s", "u"), ("s", "v")]
        + [("x", "y"), ("y", "z"), ("x", "z")]
        + [("z", "w"), ("q", "p"), ("p", "p")]
    )
    per, total = four_clique_count(spark, _df(spark, pairs))
    want_per, want_total = _oracle(pairs)
    assert total == want_total
    assert {r["id"]: r["k4"] for r in per.collect()} == want_per


def test_k4_free(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    per, total = four_clique_count(spark, _df(spark, pairs))
    assert total == 0
    assert all(r["k4"] == 0 for r in per.collect())
