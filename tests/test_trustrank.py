"""TrustRank / spam mass (algos/trustrank.py): python replication of
the pinned composition plus the separation property the operator
exists for — rank fed from outside the trusted core scores high."""

from mesos_pregel_spark.algos.trustrank import spam_mass


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _py_spam_mass(pairs, seeds, steps):
    verts = sorted({v for p in pairs for v in p})
    n = len(verts)
    od = {}
    for a, _ in pairs:
        od[a] = od.get(a, 0) + 1
    e = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in verts}
    pr = {v: 1.0 / n for v in verts}
    tr = dict(e)
    for _ in range(steps):
        acc_pr, acc_tr = {}, {}
        for a, b in pairs:
            acc_pr[b] = acc_pr.get(b, 0.0) + pr[a] / od[a]
            acc_tr[b] = acc_tr.get(b, 0.0) + tr[a] / od[a]
        pr = {v: 0.15 / n + 0.85 * acc_pr.get(v, 0.0) for v in verts}
        tr = {v: 0.15 * e[v] + 0.85 * acc_tr.get(v, 0.0) for v in verts}
    pr_n = {v: int(round(pr[v] * 1e9)) for v in verts}
    tr_n = {v: int(round(tr[v] * 1e9)) for v in verts}
    scale = sum(pr_n.values()) / sum(tr_n.values())
    return {
        v: (pr_n[v], tr_n[v],
            round((pr_n[v] - tr_n[v] * scale) / pr_n[v], 6)
            if pr_n[v] > 0 else None)
        for v in verts
    }


# trusted core 1-2-3 wired both ways; 9 is a "link farm" target fed
# only by the untrusted tail 7->8->9, 8->9
PAIRS = [
    (1, 2), (2, 3), (3, 1), (2, 1), (3, 2),
    (1, 4), (4, 5), (5, 1),
    (7, 8), (8, 9), (7, 9), (9, 7),
]
SEEDS = [1, 2, 3]


def test_matches_python_replication(spark):
    got = {
        r["id"]: (r["pr_n"], r["tr_n"], r["rel_mass"])
        for r in spam_mass(
            spark, _edges(spark, PAIRS), SEEDS, steps=4
        ).collect()
    }
    assert got == _py_spam_mass(PAIRS, SEEDS, 4)


def test_untrusted_rank_scores_high(spark):
    """The separation the VLDB 2006 estimator promises: a vertex
    whose rank comes only from outside the trusted teleport support
    carries near-total relative spam mass; the seeds themselves and
    their direct beneficiaries sit far lower."""
    got = {
        r["id"]: r["rel_mass"]
        for r in spam_mass(
            spark, _edges(spark, PAIRS), SEEDS, steps=4
        ).collect()
    }
    farm = got[9]
    assert farm > 0.9
    for trusted in SEEDS + [4, 5]:
        assert got[trusted] < farm
