"""Cross-check the stand-in reference oracle against closed forms
(SURVEY §5.2 item 1, FIXTURES.md §2) — these expectations are computed
by hand, independent of both the oracle and the engine."""

import math

from tests.oracle_pregel import (
    oracle_cc,
    oracle_lpa,
    oracle_pagerank,
    oracle_triangles,
)

from mesos_pregel_spark.fixtures import MICRO_GRAPHS


def test_pagerank_cycle_uniform():
    pr = oracle_pagerank(MICRO_GRAPHS["tri_cycle"])
    for v in "abc":
        assert math.isclose(pr[v], 1.0 / 3, abs_tol=1e-6)


def test_pagerank_chain_hand_computed():
    # a→b→c→d, d dangling (mass leaks). Fixpoint:
    # pr_a = 0.0375; pr_b = .0375 + .85*pr_a; etc.
    pr = oracle_pagerank(MICRO_GRAPHS["chain4"], tol=1e-12, max_iter=2000)
    t = 0.15 / 4
    ea = t
    eb = t + 0.85 * ea
    ec = t + 0.85 * eb
    ed = t + 0.85 * ec
    for v, e in zip("abcd", [ea, eb, ec, ed]):
        assert math.isclose(pr[v], e, abs_tol=1e-9), (v, pr[v], e)


def test_pagerank_star_hand_computed():
    # x1..x10 → hub; leaves get only teleport; hub = t + .85 * 10 * t.
    pr = oracle_pagerank(MICRO_GRAPHS["star_hub"], tol=1e-12, max_iter=2000)
    t = 0.15 / 11
    assert math.isclose(pr["hub"], t + 0.85 * 10 * t, abs_tol=1e-9)
    assert math.isclose(pr["x3"], t, abs_tol=1e-9)


def test_cc_two_islands():
    comp = oracle_cc(MICRO_GRAPHS["two_islands"])
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == comp["z"] == "x"


def test_cc_chain_one_component():
    comp = oracle_cc(MICRO_GRAPHS["chain4"])
    assert set(comp.values()) == {"a"}


def test_triangles_k4():
    count, total = oracle_triangles(MICRO_GRAPHS["k4"])
    assert total == 4
    assert all(count[v] == 3 for v in "abcd")


def test_triangles_cycle_and_islands():
    _, total = oracle_triangles(MICRO_GRAPHS["tri_cycle"])
    assert total == 1
    count, total2 = oracle_triangles(MICRO_GRAPHS["two_islands"])
    assert total2 == 2
    assert count["a"] == 1 and count["x"] == 1


def test_lpa_k4_single_label():
    labels = oracle_lpa(MICRO_GRAPHS["k4"])
    # Complete graph: everyone sees the same votes; smallest label wins.
    assert set(labels.values()) == {"a"}


def test_lpa_bipartite_bounded_and_deterministic():
    # K3,3 is the sync-LPA oscillation worst case; the bounded run must
    # still terminate and be deterministic across calls.
    l1 = oracle_lpa(MICRO_GRAPHS["bipartite6"], max_iter=20)
    l2 = oracle_lpa(MICRO_GRAPHS["bipartite6"], max_iter=20)
    assert l1 == l2
