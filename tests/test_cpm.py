"""algos/cpm.py (k=3 clique percolation) vs hand-derived communities:
edge-sharing triangles merge, vertex-sharing triangles do NOT, and the
shared vertex overlaps both communities — the defining CPM behaviors
(Palla et al. 2005)."""

from mesos_pregel_spark.algos.cpm import clique_communities


def _df(spark, edges, parts=4):
    return spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in edges],
        "src long, dst long, weight double",
    ).repartition(parts)


EDGES = [
    # T1 {1,2,3} and T2 {2,3,4} share edge (2,3) -> ONE community
    (1, 2), (1, 3), (2, 3), (2, 4), (3, 4),
    # T3 {4,5,6} shares only VERTEX 4 with T2 -> separate community
    (4, 5), (4, 6), (5, 6),
    # a 4-cycle: triangle-free, no community membership at all
    (7, 8), (8, 9), (9, 10), (7, 10),
]


def test_cpm_edge_vs_vertex_sharing(spark):
    memb, _run = clique_communities(spark, _df(spark, EDGES),
                                    edge_partitions=4)
    got = {}
    for r in memb.collect():
        got.setdefault(r["community"], set()).add(r["id"])
    # community labels are the MIN edge-key string of each component
    assert got == {"1|2": {1, 2, 3, 4}, "4|5": {4, 5, 6}}


def test_cpm_overlap_vertex(spark):
    memb, _run = clique_communities(spark, _df(spark, EDGES),
                                    edge_partitions=2)
    rows = [(r["id"], r["community"]) for r in memb.collect()]
    # vertex 4 sits in BOTH communities; 7..10 in none
    assert {(4, "1|2"), (4, "4|5")} <= set(rows)
    assert not any(v in (7, 8, 9, 10) for v, _c in rows)


def test_cpm_partition_invariance(spark):
    outs = []
    for parts in (1, 3, 8):
        memb, _ = clique_communities(spark, _df(spark, EDGES, parts),
                                     edge_partitions=parts)
        outs.append(sorted((r["id"], r["community"])
                           for r in memb.collect()))
    assert outs[0] == outs[1] == outs[2]


def _memb_set(df):
    return sorted((r["id"], r["community"]) for r in df.collect())


def test_warm_cpm_equals_cold(spark):
    """Warm refresh under additions: a delta that chains two previously
    separate communities through new edge-sharing triangles (plus one
    brand-new triangle) must reproduce the cold full-graph membership
    exactly; a triangle-free delta is a no-op; re-applying the same
    delta is idempotent."""
    from mesos_pregel_spark.streaming.refresh import (
        cpm_apply_delta,
        cpm_membership,
        cpm_state,
    )

    base = [
        (1, 2), (1, 3), (2, 3), (2, 4), (3, 4),      # community A
        (10, 11), (10, 12), (11, 12),                # community B
    ]
    delta = [
        (3, 10), (4, 10),    # triangle {3,4,10} shares (3,4) with A
        (4, 11),             # triangle {4,10,11} shares (10,11) with B
        (20, 21), (20, 22), (21, 22),   # brand-new triangle
    ]

    cold = cpm_state(spark, _df(spark, base + delta))
    state0 = cpm_state(spark, _df(spark, base))
    state1 = cpm_apply_delta(spark, state0, _df(spark, delta),
                             edge_partitions=4)
    assert _memb_set(cpm_membership(state1)) == \
        _memb_set(cpm_membership(cold))
    # A and B really merged (one community spans 1..12 now)
    comms = {c for _v, c in _memb_set(cpm_membership(state1))}
    by_comm = {}
    for v, c in _memb_set(cpm_membership(state1)):
        by_comm.setdefault(c, set()).add(v)
    assert {1, 2, 3, 4, 10, 11, 12} in by_comm.values()
    assert {20, 21, 22} in by_comm.values()
    assert len(comms) == 2

    # triangle-free delta: membership unchanged
    state2 = cpm_apply_delta(spark, state1, _df(spark, [(5, 30)]),
                             edge_partitions=4)
    assert _memb_set(cpm_membership(state2)) == \
        _memb_set(cpm_membership(state1))

    # idempotency: same delta again
    state3 = cpm_apply_delta(spark, state2, _df(spark, delta),
                             edge_partitions=4)
    assert _memb_set(cpm_membership(state3)) == \
        _memb_set(cpm_membership(state1))
