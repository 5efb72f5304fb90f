"""Condensation DAG + longest-path levels (algos/condense.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mesos_pregel_spark.algos.condense import (
    condensation,
    condensation_levels,
)

pytestmark = pytest.mark.usefixtures("spark")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d, 1.0) for s, d in pairs], "src string, dst string, weight double"
    )


def _levels(spark, pairs, **kw):
    out, _run = condensation_levels(spark, _edges(spark, pairs), **kw)
    return {r["comp"]: (r["n_vertices"], r["level"]) for r in out.collect()}


def test_line_graph_levels(spark):
    got = _levels(spark, [("a", "b"), ("b", "c")])
    assert got == {"a": (1, 0), "b": (1, 1), "c": (1, 2)}


def test_cycle_contracts_to_one_component(spark):
    # a->b->c->a is one SCC (label = min id "a"); the tail c->d hangs
    # one level below it
    got = _levels(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    assert got == {"a": (3, 0), "d": (1, 1)}


def test_edgeless_condensation(spark):
    # one big cycle: a single component, no condensation edges, level 0
    got = _levels(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert got == {"a": (3, 0)}


def test_diamond_takes_longest_path(spark):
    # a->b->d and a->d: d's level is 2 (the longer path wins)
    got = _levels(spark, [("a", "b"), ("b", "d"), ("a", "d")])
    assert got == {"a": (1, 0), "b": (1, 1), "d": (1, 2)}


def test_disjoint_components_both_seeded(spark):
    got = _levels(spark, [("a", "b"), ("x", "y")])
    assert got == {"a": (1, 0), "b": (1, 1), "x": (1, 0), "y": (1, 1)}


def test_condensation_edges_distinct_and_acyclic(spark):
    # two SCCs {a,b} and {c,d} with parallel multigraph links between
    # them collapse to ONE condensation edge
    pairs = [
        ("a", "b"), ("b", "a"),
        ("c", "d"), ("d", "c"),
        ("a", "c"), ("b", "d"),
    ]
    comps, cedges = condensation(spark, _edges(spark, pairs))
    assert {(r["comp"], r["n_vertices"]) for r in comps.collect()} == {
        ("a", 2), ("c", 2)
    }
    assert [(r["src"], r["dst"]) for r in cedges.collect()] == [("a", "c")]


def test_superstep_cap_truncates_levels_exactly(spark):
    # k-superstep partial fixpoint of monotone max-propagation is
    # min(level, k) per vertex — the contract the capped driver
    # query's bounded-recursion SQL twin relies on
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    got = _levels(spark, chain, max_supersteps=3)
    assert got == {
        "a": (1, 0), "b": (1, 1), "c": (1, 2),
        "d": (1, 3), "e": (1, 3), "f": (1, 3),
    }


def test_warm_dag_levels_matches_cold(spark):
    from mesos_pregel_spark.streaming.refresh import warm_dag_levels

    # deterministic layered DAG: chain 0->1->...->7 plus skip edges
    base = [(f"v{i}", f"v{i+1}") for i in range(7)]
    base += [("v0", "v3"), ("v2", "v5")]
    delta = [("v5", "w0"), ("w0", "w1"), ("v1", "v6")]

    cold_prev, run_prev = warm_dag_levels(
        spark, _edges(spark, base), prev_levels=None
    )
    prev_pd = cold_prev.select(
        "comp", "level"
    )
    full = _edges(spark, base + delta)
    cold_full, run_cold = warm_dag_levels(spark, full, prev_levels=None)
    warm_full, run_warm = warm_dag_levels(
        spark, full,
        prev_levels=prev_pd,
        delta_edges=_edges(spark, delta),
    )
    cold = {r["comp"]: (r["n_vertices"], r["level"])
            for r in cold_full.collect()}
    warm = {r["comp"]: (r["n_vertices"], r["level"])
            for r in warm_full.collect()}
    assert warm == cold
    # the delta frontier re-propagates only the perturbed region
    assert len(run_warm.metrics) <= len(run_cold.metrics)


def test_warm_dag_levels_without_delta_is_exact(spark):
    from mesos_pregel_spark.streaming.refresh import warm_dag_levels

    base = [("a", "b"), ("b", "c")]
    delta = [("c", "d")]
    prev, _ = warm_dag_levels(spark, _edges(spark, base), prev_levels=None)
    full = _edges(spark, base + delta)
    # prev_converged=False drops the delta: one full re-send round,
    # values still exactly the cold fixpoint
    warm, _run = warm_dag_levels(
        spark, full,
        prev_levels=prev.select("comp", "level"),
        delta_edges=_edges(spark, delta),
        prev_converged=False,
    )
    got = {r["comp"]: r["level"] for r in warm.collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_transitive_redundancy_diamond(spark):
    from mesos_pregel_spark.algos.condense import transitive_redundancy

    # a->b->c plus the shortcut a->c: only a->c is wedge-witnessed
    out = transitive_redundancy(
        spark, _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    )
    got = {r["src"]: (r["outdeg"], r["n_redundant"]) for r in out.collect()}
    assert got == {"a": (2, 1), "b": (1, 0)}


def test_transitive_redundancy_chain_has_none(spark):
    from mesos_pregel_spark.algos.condense import transitive_redundancy

    out = transitive_redundancy(
        spark, _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    )
    got = {r["src"]: (r["outdeg"], r["n_redundant"]) for r in out.collect()}
    assert got == {"a": (1, 0), "b": (1, 0), "c": (1, 0)}


def test_transitive_redundancy_hub_cap_drops_middle(spark):
    from mesos_pregel_spark.algos.condense import transitive_redundancy

    # b is the only wedge middle (total degree 4 > cap 3): with the
    # cap, nothing witnesses a->c / a->d
    pairs = [("a", "b"), ("b", "c"), ("b", "d"), ("x", "b"),
             ("a", "c"), ("a", "d")]
    uncapped = transitive_redundancy(spark, _edges(spark, pairs))
    got_u = {r["src"]: r["n_redundant"] for r in uncapped.collect()}
    assert got_u["a"] == 2
    capped = transitive_redundancy(
        spark, _edges(spark, pairs), max_degree=3
    )
    got_c = {r["src"]: r["n_redundant"] for r in capped.collect()}
    assert got_c["a"] == 0


def test_mixed_scc_and_dag_levels(spark):
    # source s feeds the cycle {p,q}, which feeds sink t:
    # s (0) -> {p,q} (1) -> t (2)
    got = _levels(
        spark, [("s", "p"), ("p", "q"), ("q", "p"), ("q", "t")]
    )
    assert got == {"s": (1, 0), "p": (2, 1), "t": (1, 2)}
