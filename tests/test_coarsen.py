"""Graph coarsening by matching contraction (algos/coarsen.py):
python oracle replaying the pinned matching + contraction, plus the
invariants a multilevel stack relies on."""

import hashlib

from mesos_pregel_spark.algos.coarsen import coarsen_graph


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, float(w)) for a, b, w in pairs],
        "src long, dst long, weight double",
    )


def _py_matching(pairs, rounds):
    """The pinned local-max matching: md5 priorities over STRING id
    forms, mutual-pointer acceptance, ``rounds`` rounds."""
    und = {(min(a, b), max(a, b)) for a, b, _ in pairs if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def prio(u, v):
        lo, hi = sorted((str(u), str(v)))
        return hashlib.md5(f"{lo}|{hi}".encode()).hexdigest()

    mate = {}
    for _ in range(rounds):
        cand = {}
        for v in adj:
            if v in mate:
                continue
            best = None
            for u in adj[v]:
                if u in mate:
                    continue
                key = prio(u, v) + "|" + str(u)
                if best is None or key < best[0]:
                    best = (key, u)
            if best:
                cand[v] = best[1]
        newly = [(v, c) for v, c in cand.items() if cand.get(c) == v]
        for v, c in newly:
            mate[v] = c
    return mate


def _py_coarsen(pairs, rounds):
    mate = _py_matching(pairs, rounds)
    sup = {}
    for a, b, _ in pairs:
        for v in (a, b):
            sup[v] = min(v, mate[v]) if v in mate else v
    coarse = {}
    for a, b, w in pairs:
        sa, sb = sup[a], sup[b]
        if sa == sb:
            continue
        key = (min(sa, sb), max(sa, sb))
        coarse[key] = coarse.get(key, 0) + int(w)
    return sup, coarse


PAIRS = [
    (1, 2, 3), (2, 3, 1), (1, 3, 2), (3, 4, 5),
    (4, 5, 1), (5, 6, 2), (6, 7, 1), (7, 8, 4),
    (2, 8, 1), (4, 8, 2),
]


def test_matches_python_oracle(spark):
    coarse_df, sup_df = coarsen_graph(
        spark, _edges(spark, PAIRS), max_rounds=6
    )
    exp_sup, exp_coarse = _py_coarsen(PAIRS, 6)
    got_sup = {r["id"]: r["super"] for r in sup_df.collect()}
    got_coarse = {
        (r["lo"], r["hi"]): r["weight"] for r in coarse_df.collect()
    }
    assert got_sup == exp_sup
    assert got_coarse == exp_coarse


def test_coarsening_invariants(spark):
    """Super count shrinks (a maximal matching on a connected graph
    matches >= 1 pair), every super id is a member of its own group,
    and total coarse weight = total weight minus intra-super weight —
    nothing is lost or double-counted."""
    coarse_df, sup_df = coarsen_graph(
        spark, _edges(spark, PAIRS), max_rounds=6
    )
    sup = {r["id"]: r["super"] for r in sup_df.collect()}
    assert len(set(sup.values())) < len(sup)
    for v, s in sup.items():
        assert sup[s] == s
    intra = sum(int(w) for a, b, w in PAIRS if sup[a] == sup[b])
    total_coarse = sum(r["weight"] for r in coarse_df.collect())
    assert total_coarse == sum(int(w) for _, _, w in PAIRS) - intra


def test_capped_rounds_prefix(spark):
    """A 1-round cap contracts only first-round mutual pairs — the
    capped ≡ unrolled contract inherited from the matching kernel."""
    coarse_df, sup_df = coarsen_graph(
        spark, _edges(spark, PAIRS), max_rounds=1
    )
    exp_sup, exp_coarse = _py_coarsen(PAIRS, 1)
    assert {r["id"]: r["super"] for r in sup_df.collect()} == exp_sup
    assert {
        (r["lo"], r["hi"]): r["weight"] for r in coarse_df.collect()
    } == exp_coarse


def test_contraction_preserves_connectivity(spark):
    """The invariant a multilevel stack rests on: contracting matched
    pairs never connects or disconnects anything, so the engine's CC
    on the COARSE graph, projected back through the super map, equals
    CC on the FINE graph (up to component relabeling)."""
    from mesos_pregel_spark.algos.cc import connected_components

    pairs = PAIRS + [(20, 21, 1), (21, 22, 2)]  # second component
    edges = _edges(spark, pairs)
    coarse_df, sup_df = coarsen_graph(spark, edges, max_rounds=6)
    coarse_edges = coarse_df.select(
        coarse_df["lo"].alias("src"), coarse_df["hi"].alias("dst"),
        coarse_df["weight"].cast("double").alias("weight"),
    )
    fine, _ = connected_components(spark, edges, edge_partitions=4)
    coarse, _ = connected_components(spark, coarse_edges, edge_partitions=4)
    sup = {r["id"]: r["super"] for r in sup_df.collect()}
    comp_coarse = {r["id"]: r["component"] for r in coarse.collect()}
    comp_fine = {r["id"]: r["component"] for r in fine.collect()}

    def project(v):
        s = sup[v]
        # super-vertices with no coarse edge (fully contracted
        # component) are their own component
        return comp_coarse.get(s, s)

    # same partition: fine components and projected-coarse components
    # induce the same equivalence classes
    from itertools import combinations
    for a, b in combinations(sorted(comp_fine), 2):
        assert (comp_fine[a] == comp_fine[b]) == (project(a) == project(b))


def test_partition_gain_python_replication(spark):
    """coarsen_partition_gain's counting rule replicated in python on
    a matched-pair-heavy graph: matched edges can never cut under the
    super-id hash, so the gain is strictly positive here."""
    import hashlib

    from mesos_pregel_spark.queries import _GAIN_P

    def pid(v):
        return int(hashlib.md5(
            str(v).encode()).hexdigest()[:12], 16) % _GAIN_P

    # long path: the local-max matching matches many disjoint pairs
    pairs = [(i, i + 1, 1) for i in range(1, 40)]
    edges = _edges(spark, pairs)
    coarse_df, sup_df = coarsen_graph(spark, edges, max_rounds=6)
    sup = {r["id"]: r["super"] for r in sup_df.collect()}

    und = {(min(a, b), max(a, b)) for a, b, _ in pairs}
    cut_fine = sum(1 for a, b in und if pid(a) != pid(b))
    cut_super = sum(1 for a, b in und if pid(sup[a]) != pid(sup[b]))
    n_matched_edges = sum(1 for a, b in und if sup[a] == sup[b])
    assert n_matched_edges > 10  # the matching actually matched
    # matched edges never cut under super ids
    assert all(
        pid(sup[a]) == pid(sup[b]) for a, b in und if sup[a] == sup[b]
    )

    from mesos_pregel_spark.queries import q_coarsen_partition_gain  # noqa: F401
    # replicate the engine aggregate directly over the same tagged rows
    from mesos_pregel_spark.algos.triangles import canonical_undirected
    from pyspark.sql import functions as F

    tagged = (
        canonical_undirected(edges)
        .join(sup_df.withColumnsRenamed({"id": "lo", "super": "slo"}), "lo")
        .join(sup_df.withColumnsRenamed({"id": "hi", "super": "shi"}), "hi")
    )

    def spid(col):
        return F.conv(
            F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10
        ).cast("long") % _GAIN_P

    row = tagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(spid("lo") != spid("hi"), 1).otherwise(0)).alias("cf"),
        F.sum(F.when(spid("slo") != spid("shi"), 1).otherwise(0)).alias("cs"),
    ).collect()[0]
    assert (row["n"], row["cf"], row["cs"]) == (
        len(und), cut_fine, cut_super)
    assert cut_super < cut_fine


def test_heavy_edge_priority_prefers_weight(spark):
    """Heavy-edge matching contracts the heaviest incident edge; the
    md5 order ignores weight.  On a star where the heavy edge is
    pinned, the weighted variant MUST pick it, whatever md5 says."""
    from mesos_pregel_spark.algos.matching import maximal_matching

    for heavy_leaf in (1, 3):
        pairs = [(2, 1, 9.0 if heavy_leaf == 1 else 1.0),
                 (2, 3, 9.0 if heavy_leaf == 3 else 1.0)]
        e = spark.createDataFrame(
            pairs, "src long, dst long, weight double")
        m, _ = maximal_matching(spark, e, max_rounds=4, priority="weight")
        got = {r["id"]: r["mate"] for r in m.collect()}
        assert got[2] == str(heavy_leaf)


def _py_heavy_matching(pairs, rounds):
    """Python replay of the weight-priority local-max rule."""
    import hashlib

    und = {}
    for a, b, w in pairs:
        if a != b:
            und[(min(a, b), max(a, b))] = int(w)
    adj = {}
    for (a, b), w in und.items():
        adj.setdefault(a, {})[b] = w
        adj.setdefault(b, {})[a] = w

    def prio(u, v, w):
        lo, hi = sorted((str(u), str(v)))
        return (str(10**15 - w).zfill(16)
                + hashlib.md5(f"{lo}|{hi}".encode()).hexdigest())

    mate = {}
    for _ in range(rounds):
        cand = {}
        for v in adj:
            if v in mate:
                continue
            best = None
            for u, w in adj[v].items():
                if u in mate:
                    continue
                key = prio(u, v, w) + "|" + str(u)
                if best is None or key < best[0]:
                    best = (key, u)
            if best:
                cand[v] = best[1]
        for v, c in list(cand.items()):
            if cand.get(c) == v:
                mate[v] = c
    return mate


def test_heavy_matching_matches_python(spark):
    from mesos_pregel_spark.algos.matching import maximal_matching

    pairs = [
        (1, 2, 3), (2, 3, 7), (3, 4, 7), (4, 5, 2),
        (5, 6, 9), (6, 1, 1), (2, 5, 4), (3, 6, 5),
    ]
    e = spark.createDataFrame(
        [(a, b, float(w)) for a, b, w in pairs],
        "src long, dst long, weight double",
    )
    m, _ = maximal_matching(spark, e, max_rounds=6, priority="weight")
    got = {r["id"]: (r["matched"], r["mate"]) for r in m.collect()}
    exp_mate = _py_heavy_matching(pairs, 6)
    for v, (matched, mate) in got.items():
        assert matched == (v in exp_mate)
        assert (mate is None and v not in exp_mate) or \
            mate == str(exp_mate[v])
