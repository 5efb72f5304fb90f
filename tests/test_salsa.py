"""SALSA: engine vs python oracle (allclose 1e-9 — same arithmetic
path) + a closed form on the directed star."""

import pytest

from tests.conftest import id_space
from tests.oracle_pregel import _dedupe_directed, _vertices, _key

from mesos_pregel_spark.algos.salsa import salsa
from mesos_pregel_spark.fixtures import micro_graph_df


def oracle_salsa(edges, steps):
    """Jacobi SALSA, exactly the semantics paragraph of
    algos/salsa.py.  Returns {v: (authority, hub)}."""
    directed = _dedupe_directed(edges)
    vs = sorted(_vertices(edges), key=_key)
    outdeg = {v: 0 for v in vs}
    indeg = {v: 0 for v in vs}
    for s, d in directed:
        outdeg[s] += 1
        indeg[d] += 1
    auth = {v: 1.0 for v in vs}
    hub = {v: 1.0 for v in vs}
    for _ in range(steps):
        new_auth = {v: 0.0 for v in vs}
        new_hub = {v: 0.0 for v in vs}
        for s, d in directed:
            new_auth[d] += hub[s] / outdeg[s]
            new_hub[s] += auth[d] / indeg[d]
        auth, hub = new_auth, new_hub
    return {v: (auth[v], hub[v]) for v in vs}


@pytest.mark.parametrize("name", ["chain4", "k4", "two_islands", "bipartite6"])
def test_micro_graphs_vs_oracle(spark, name):
    ids_df, edges, _names = id_space(spark, micro_graph_df(spark, name))
    got, _run = salsa(spark, ids_df, max_supersteps=4)
    expected = oracle_salsa(edges, 4)
    m = {r["id"]: (r["authority"], r["hub"]) for r in got.collect()}
    assert m.keys() == expected.keys()
    for v, (a, h) in expected.items():
        assert m[v][0] == pytest.approx(a, abs=1e-9)
        assert m[v][1] == pytest.approx(h, abs=1e-9)


def test_star_closed_form(spark):
    """Directed star x1..x10 → hub: odd steps give auth(hub) = 10
    (every leaf's full unit hub mass, outdeg 1 each) and leaf hub =
    auth(hub)/indeg(hub) = 1/10 of the PREVIOUS auth (Jacobi) — the
    period-2 oscillation of the unnormalized chain; even steps return
    to (1, 1)."""
    ids_df, _edges, names = id_space(spark, micro_graph_df(spark, "star_hub"))
    for steps, (want_auth, want_leaf_hub) in {
        3: (10.0, 0.1), 4: (1.0, 1.0)
    }.items():
        got, _run = salsa(spark, ids_df, max_supersteps=steps)
        m = {r["id"]: (r["authority"], r["hub"]) for r in got.collect()}
        assert m[names["hub"]][0] == pytest.approx(want_auth, abs=1e-12)
        assert m[names["hub"]][1] == pytest.approx(0.0, abs=1e-12)
        for i in range(1, 11):
            assert m[names[f"x{i}"]][0] == pytest.approx(0.0, abs=1e-12)
            assert m[names[f"x{i}"]][1] == pytest.approx(
                want_leaf_hub, abs=1e-12
            )


def test_partition_invariance(spark):
    ids_df, _edges, _names = id_space(spark, micro_graph_df(spark, "k4"))
    a, _ = salsa(spark, ids_df, max_supersteps=4, edge_partitions=1)
    b, _ = salsa(spark, ids_df, max_supersteps=4, edge_partitions=7)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    for x, y in zip(ra, rb):
        assert x[0] == y[0]
        assert x[1] == pytest.approx(y[1], abs=1e-12)
        assert x[2] == pytest.approx(y[2], abs=1e-12)
