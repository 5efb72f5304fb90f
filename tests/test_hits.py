"""HITS: engine vs python oracle (allclose 1e-9 — same arithmetic
path) + closed forms on micro graphs."""

import math

import pytest

from tests.conftest import id_space
from tests.oracle_pregel import oracle_hits

from mesos_pregel_spark.algos.hits import hits
from mesos_pregel_spark.fixtures import generate_transcripts, micro_graph_df
from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids


def _compare(spark, ids_df, oracle_edges, steps, **kw):
    got, run = hits(spark, ids_df, max_supersteps=steps, **kw)
    expected = oracle_hits(oracle_edges, steps)
    got_map = {r["id"]: (r["authority"], r["hub"]) for r in got.collect()}
    assert got_map.keys() == expected.keys()
    for v, (a, h) in expected.items():
        assert got_map[v][0] == pytest.approx(a, abs=1e-9)
        assert got_map[v][1] == pytest.approx(h, abs=1e-9)
    return run


def test_star_closed_form(spark):
    """Directed star x1..x10 → hub: the hub is the unique authority,
    the leaves are uniform hubs; converges in one step."""
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, "star_hub"))
    got, _run = hits(spark, ids_df, max_supersteps=3)
    m = {r["id"]: (r["authority"], r["hub"]) for r in got.collect()}
    assert m[names["hub"]][0] == pytest.approx(1.0, abs=1e-12)
    assert m[names["hub"]][1] == pytest.approx(0.0, abs=1e-12)
    for i in range(1, 11):
        assert m[names[f"x{i}"]][0] == pytest.approx(0.0, abs=1e-12)
        assert m[names[f"x{i}"]][1] == pytest.approx(
            1.0 / math.sqrt(10), abs=1e-12
        )


def test_cycle_uniform(spark):
    """3-cycle is vertex-transitive: both vectors are uniform."""
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, "tri_cycle"))
    got, _run = hits(spark, ids_df, max_supersteps=5)
    u = 1.0 / math.sqrt(3)
    for r in got.collect():
        assert r["authority"] == pytest.approx(u, abs=1e-12)
        assert r["hub"] == pytest.approx(u, abs=1e-12)


@pytest.mark.parametrize("name", ["chain4", "k4", "two_islands", "bipartite6"])
def test_micro_graphs_vs_oracle(spark, name):
    ids_df, edges, _names = id_space(spark, micro_graph_df(spark, name))
    _compare(spark, ids_df, edges, steps=4)


def test_transcript_graph(spark):
    t = generate_transcripts(spark, n_conv=300, seed=42)
    ids_df = edges_with_ids(build_edges(t))
    edges = [(r["src"], r["dst"], r["weight"]) for r in ids_df.collect()]
    _compare(spark, ids_df, edges, steps=6)


def test_tol_halts_early(spark):
    """star_hub reaches its fixpoint immediately — a tol-driven run
    must converge long before the cap."""
    ids_df, _edges, _names = id_space(spark, micro_graph_df(spark, "star_hub"))
    _got, run = hits(spark, ids_df, tol=1e-9, max_supersteps=50)
    assert run.superstep < 10
    assert run.metrics[-1]["max_delta"] < 1e-9


def test_resume(spark, tmp_path):
    """Bounded-iteration semantics (tol=0: the cap IS the job spec):
    the cap is recorded in checkpoint params, so resume with the SAME
    cap returns the stored final scores, and a DIFFERENT cap is
    rejected loudly — the capped result is the final answer for that
    cap, not a resumable prefix (a silent resume previously returned
    the old cap's finished state as if it were the new run's)."""
    ids_df, edges, _names = id_space(spark, micro_graph_df(spark, "bipartite6"))
    ck = str(tmp_path / "hits")
    hits(spark, ids_df, max_supersteps=2, checkpoint_dir=ck,
         checkpoint_every=1)
    resumed, run = hits(spark, ids_df, max_supersteps=2,
                        checkpoint_dir=ck, checkpoint_every=1)
    assert run.resumed_final
    expected = oracle_hits(edges, 2)
    got = {r["id"]: (r["authority"], r["hub"]) for r in resumed.collect()}
    for v, (a, h) in expected.items():
        assert got[v][0] == pytest.approx(a, abs=1e-9)
        assert got[v][1] == pytest.approx(h, abs=1e-9)
    with pytest.raises(ValueError, match="params"):
        hits(spark, ids_df, max_supersteps=5, checkpoint_dir=ck,
             checkpoint_every=1)
