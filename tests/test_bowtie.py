"""Bow-tie decomposition (algos/bowtie.py) vs brute-force reachability
oracles on hand graphs."""

import itertools

import pytest

from mesos_pregel_spark.algos.bowtie import bowtie, reachable_from


def _df(spark, edges):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )


def _closure(edges):
    """Brute-force reachability closure (a reaches b, incl. a==a)."""
    verts = {v for e in edges for v in e}
    reach = {v: {v} for v in verts}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            for v in verts:
                if a in reach[v] and b not in reach[v]:
                    reach[v].add(b)
                    changed = True
    return verts, reach


def _oracle_bowtie(edges):
    verts, reach = _closure(edges)
    sccs = {}
    for v in verts:
        sccs[v] = min(u for u in verts if u in reach[v] and v in reach[u])
    from collections import Counter

    sizes = Counter(sccs.values())
    giant = min(
        sizes, key=lambda lbl: (-sizes[lbl], lbl)
    )
    core = {v for v in verts if sccs[v] == giant}
    out = {b for c in core for b in reach[c]} - core
    inn = {v for v in verts if (reach[v] & core) and v not in core}
    counts = Counter()
    for v in verts:
        counts[
            "core" if v in core
            else "in" if v in inn
            else "out" if v in out
            else "other"
        ] += 1
    n = len(verts)
    return {
        cls: (c, round(c / n, 9)) for cls, c in counts.items()
    }


def _run_bowtie(spark, edges):
    return {
        r["cls"]: (r["n_vertices"], r["share"])
        for r in bowtie(spark, _df(spark, edges), edge_partitions=4).collect()
    }


def test_bowtie_classic_shape(spark):
    """1 -> core{2,3} -> 4; a tied-size SCC {5,6} loses the giant pick
    to the smaller label; 7->8 is a disconnected tendril."""
    edges = [(1, 2), (2, 3), (3, 2), (3, 4), (5, 6), (6, 5), (7, 8)]
    got = _run_bowtie(spark, edges)
    assert got == _oracle_bowtie(edges)
    assert got["core"] == (2, round(2 / 8, 9))
    assert got["in"] == (1, round(1 / 8, 9))
    assert got["out"] == (1, round(1 / 8, 9))
    assert got["other"] == (4, round(4 / 8, 9))


def test_bowtie_all_core(spark):
    edges = [(1, 2), (2, 3), (3, 1)]
    got = _run_bowtie(spark, edges)
    assert got == _oracle_bowtie(edges) == {"core": (3, 1.0)}


def test_bowtie_matches_brute_on_dense_mixed_graph(spark):
    # deterministic pseudo-random digraph: i -> (i*i+1) % 11 plus a
    # planted 3-cycle and a source/sink pair
    edges = sorted(
        {((i * 3 + 1) % 11, (i * i + 1) % 11) for i in range(11)}
        | {(20, 21), (21, 22), (22, 20), (22, 0), (30, 20)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    got = _run_bowtie(spark, edges)
    assert got == _oracle_bowtie(edges)


def test_reachable_from_forward_and_reverse(spark):
    edges = [(1, 2), (2, 3), (4, 3), (5, 5)]
    e = _df(spark, [(a, b) for a, b in edges if a != b])
    seeds = spark.createDataFrame([(2,)], "id long")
    fwd, _ = reachable_from(spark, e, seeds, edge_partitions=2)
    assert {r["id"] for r in fwd.where("reached").collect()} == {2, 3}
    bwd, _ = reachable_from(spark, e, seeds, reverse=True, edge_partitions=2)
    assert {r["id"] for r in bwd.where("reached").collect()} == {1, 2}
