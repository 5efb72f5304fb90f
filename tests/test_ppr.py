"""Personalized PageRank (algos/ppr.py, built on the generic
vertex-program API) vs an in-test numpy oracle, plus the
uniform-source cross-check: PPR over ALL vertices IS ordinary
PageRank (same teleport vector), so the two engines' flagship
algorithms must agree."""

import math

import pytest

from tests.conftest import id_space

from mesos_pregel_spark.algos.pagerank import pagerank
from mesos_pregel_spark.algos.ppr import personalized_pagerank
from mesos_pregel_spark.fixtures import micro_graph_df


def oracle_ppr(edges, sources, damping=0.85, tol=1e-6, max_iter=100):
    verts = sorted({u for u, v, _ in edges} | {v for u, v, _ in edges})
    out = {v: sorted({d for s, d, _ in edges if s == v}) for v in verts}
    e = {v: (1.0 / len(sources) if v in set(sources) else 0.0) for v in verts}
    pr = dict(e)
    for _ in range(max_iter):
        contrib = {v: 0.0 for v in verts}
        for u in verts:
            if out[u] and pr[u] > 0:
                share = pr[u] / len(out[u])
                for d in out[u]:
                    contrib[d] += share
        new = {v: (1 - damping) * e[v] + damping * contrib[v] for v in verts}
        delta = max(abs(new[v] - pr[v]) for v in verts)
        pr = new
        if delta < tol:
            break
    return pr


@pytest.mark.parametrize("name", ["chain4", "star_hub", "two_islands"])
def test_ppr_matches_oracle(spark, name):
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, name))
    source = min(names.values())
    got, run = personalized_pagerank(spark, ids_df, [source], tol=1e-8,
                                     max_supersteps=60)
    expected = oracle_ppr(edges, [source], tol=1e-8, max_iter=60)
    got_map = {r["id"]: r["ppr"] for r in got.collect()}
    assert set(got_map) == set(expected)
    for v in expected:
        assert math.isclose(got_map[v], expected[v], abs_tol=1e-6), (
            v, got_map[v], expected[v])
    # mass concentrates on/near the source; unreachable other-island
    # vertices get exactly zero
    assert got_map[source] == max(got_map.values())


def test_ppr_uniform_sources_equals_pagerank(spark):
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, "k4"))
    all_ids = sorted(names.values())
    ppr_df, _ = personalized_pagerank(spark, ids_df, all_ids, tol=0.0,
                                      max_supersteps=8)
    pr_df, _ = pagerank(spark, ids_df, tol=0.0, max_supersteps=8)
    a = {r["id"]: r["ppr"] for r in ppr_df.collect()}
    b = {r["id"]: r["pagerank"] for r in pr_df.collect()}
    assert set(a) == set(b)
    for v in a:
        assert math.isclose(a[v], b[v], abs_tol=1e-12), (v, a[v], b[v])
