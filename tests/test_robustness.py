"""Attack-tolerance profile (algos/robustness.py) vs a union-find
oracle replicating the exact recipe."""

import math
from collections import Counter

from mesos_pregel_spark.algos.robustness import attack_tolerance


def _df(spark, edges):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )


def _oracle(edges, fractions):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg = Counter()
    for lo, hi in und:
        deg[lo] += 1
        deg[hi] += 1
    n = len(deg)
    rows = []
    for f in fractions:
        k = int(math.floor(f * n))
        hubs = set(sorted(deg, key=lambda v: (-deg[v], v))[:k])
        verts = set(deg) - hubs
        parent = {v: v for v in verts}

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        for lo, hi in und:
            if lo in verts and hi in verts:
                parent[find(lo)] = find(hi)
        sizes = Counter(find(v) for v in verts)
        giant = max(sizes.values()) if sizes else 0
        share = round(giant / (n - k), 9) if n - k > 0 else 0.0
        rows.append((float(f), k, n - k, giant, share))
    return sorted(rows)


def _run(spark, edges, fractions):
    return sorted(
        tuple(r)
        for r in attack_tolerance(
            spark, _df(spark, edges), fractions=fractions, edge_partitions=4
        ).collect()
    )


def test_star_shatters_under_hub_attack(spark):
    """A 9-leaf star: removing the single top hub (f=0.1 -> k=1)
    collapses the giant share from 1.0 to 1/9."""
    edges = [(0, i) for i in range(1, 10)]
    fr = (0.0, 0.1)
    got = _run(spark, edges, fr)
    assert got == _oracle(edges, fr)
    by_f = {r[0]: r for r in got}
    assert by_f[0.0][4] == 1.0
    assert by_f[0.1] == (0.1, 1, 9, 1, round(1 / 9, 9))


def test_matches_union_find_oracle_mixed_graph(spark):
    # two communities bridged by one hub + a pendant path
    edges = (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)]
        + [(4, 100), (100, 10), (20, 21), (21, 22)]
    )
    fr = (0.0, 0.05, 0.2, 0.5)
    assert _run(spark, edges, fr) == _oracle(edges, fr)


def test_remove_everything(spark):
    edges = [(1, 2), (2, 3)]
    fr = (1.0,)
    got = _run(spark, edges, fr)
    assert got == _oracle(edges, fr) == [(1.0, 3, 0, 0, 0.0)]


def _oracle_random(edges, fractions, seed="fail42"):
    import hashlib

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg = Counter()
    for lo, hi in und:
        deg[lo] += 1
        deg[hi] += 1
    n = len(deg)
    rows = []
    for f in fractions:
        k = int(math.floor(f * n))
        victims = set(sorted(
            deg, key=lambda v: (
                hashlib.md5(f"{seed}:{v}".encode()).hexdigest(), v)
        )[:k])
        verts = set(deg) - victims
        parent = {v: v for v in verts}

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        for lo, hi in und:
            if lo in verts and hi in verts:
                parent[find(lo)] = find(hi)
        sizes = Counter(find(v) for v in verts)
        giant = max(sizes.values()) if sizes else 0
        share = round(giant / (n - k), 9) if n - k > 0 else 0.0
        rows.append((float(f), k, n - k, giant, share))
    return sorted(rows)


def test_random_failure_matches_md5_oracle_and_spares_the_star(spark):
    """On the 9-leaf star with k=1: random removal almost surely takes
    a LEAF (md5-pinned here: whichever the hash picks, the oracle
    replicates it exactly), and the attack/error gap shows when the
    hub survives."""
    edges = [(0, i) for i in range(1, 10)]
    fr = (0.1, 0.3)
    got = sorted(
        tuple(r)
        for r in attack_tolerance(
            spark, _df(spark, edges), fractions=fr, strategy="random",
            edge_partitions=4,
        ).collect()
    )
    assert got == _oracle_random(edges, fr)


def test_random_strategy_rejects_unknown(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        attack_tolerance(
            spark, _df(spark, [(1, 2)]), strategy="nope"
        )


def test_percolation_profile_monotone_and_exact():
    """Bond-percolation twin on a hand graph: the kept-edge sets nest
    (same uniform, rising p) so giant share is monotone; exact values
    replicated by a pure-python union-find over the same md5 coins."""
    import hashlib

    import duckdb

    from mesos_pregel_spark.queries import _PERC_PS, SQL_PERCOLATION

    con = duckdb.connect()
    con.execute("CREATE TABLE lineitem (l_orderkey INT, l_partkey INT)")
    edges = [(i, i + 1) for i in range(1, 40)] + \
        [(i, i + 5) for i in range(1, 35, 3)]
    for oid, (a, b) in enumerate(edges):
        con.execute("INSERT INTO lineitem VALUES (?, ?)", [500 + oid, a])
        con.execute("INSERT INTO lineitem VALUES (?, ?)", [500 + oid, b])

    def u48(lo, hi):
        h = hashlib.md5(f"perc42|{lo}|{hi}".encode()).hexdigest()[:12]
        return int(h, 16) / 281474976710656.0

    und = sorted({tuple(sorted(e)) for e in edges})
    verts = sorted({v for e in und for v in e})
    got = {r[0]: r[1:] for r in con.execute(SQL_PERCOLATION).fetchall()}
    prev_share = -1.0
    for p in _PERC_PS:
        kept = [(lo, hi) for lo, hi in und if u48(lo, hi) < p]
        parent = {v: v for v in verts}

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        for lo, hi in kept:
            parent[find(lo)] = find(hi)
        from collections import Counter
        sizes = Counter(find(v) for v in verts)
        giant = max(sizes.values()) if sizes else 1
        nv, ek, g, share = got[p]
        assert (nv, ek, g) == (len(verts), len(kept), giant), p
        assert share == round(giant / len(verts), 9)
        assert share >= prev_share   # nested edge sets -> monotone
        prev_share = share
