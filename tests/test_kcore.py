"""k-core peeling: engine vs python oracle (exact) + closed forms,
including a multi-round cascade."""

import pytest

from tests.conftest import id_space
from tests.oracle_pregel import oracle_kcore

from mesos_pregel_spark.algos.kcore import k_core
from mesos_pregel_spark.fixtures import generate_transcripts, micro_graph_df
from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids

from pyspark.sql import types as T


def _compare(spark, ids_df, oracle_edges, k, **kw):
    got, run = k_core(spark, ids_df, k=k, **kw)
    expected = oracle_kcore(oracle_edges, k)
    got_map = {r["id"]: r["in_core"] for r in got.collect()}
    assert got_map == expected
    return run


def _df(spark, rows):
    schema = T.StructType([
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ])
    return spark.createDataFrame(rows, schema=schema)


def test_triangle_with_tail_cascade(spark):
    """Triangle 1-2-3 plus tail 3-4-5: the 2-core is the triangle and
    the tail peels over TWO rounds (5 first, then 4) — exercises the
    multi-round cascade, not just one sweep."""
    rows = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (3, 4, 1.0), (4, 5, 1.0)]
    run = _compare(spark, _df(spark, rows), rows, k=2)
    got, _ = k_core(spark, _df(spark, rows), k=2)
    core = {r["id"] for r in got.collect() if r["in_core"]}
    assert core == {1, 2, 3}
    # removals land in two distinct supersteps, then one quiet round
    removed = [m["removed"] for m in run.metrics]
    assert removed[0] == 1 and removed[1] == 1 and removed[-1] == 0


def test_k4_closed_form(spark):
    ids_df, edges, names = id_space(spark, micro_graph_df(spark, "k4"))
    got3, _ = k_core(spark, ids_df, k=3)
    assert all(r["in_core"] for r in got3.collect())
    got4, _ = k_core(spark, ids_df, k=4)
    assert not any(r["in_core"] for r in got4.collect())


def test_star_two_rounds_to_empty(spark):
    """Star: leaves (degree 1) peel in round 1, the hub (now isolated)
    in round 2 — the 2-core is empty."""
    ids_df, edges, _names = id_space(spark, micro_graph_df(spark, "star_hub"))
    run = _compare(spark, ids_df, edges, k=2)
    assert run.metrics[-1]["core_size"] == 0
    assert len(run.metrics) == 3  # two peel rounds + the quiet round


@pytest.mark.parametrize("k", [1, 2, 3])
def test_transcript_graph(spark, k):
    t = generate_transcripts(spark, n_conv=300, seed=42)
    ids_df = edges_with_ids(build_edges(t))
    edges = [(r["src"], r["dst"], r["weight"]) for r in ids_df.collect()]
    _compare(spark, ids_df, edges, k=k)


def test_capped_run_equals_unrolled_prefix(spark):
    """Monotone peeling: a run capped at S supersteps equals the
    oracle peeled for exactly S rounds (the property the bounded
    driver query + unrolled SQL oracle rely on)."""
    rows = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (3, 4, 1.0), (4, 5, 1.0)]
    got, run = k_core(spark, _df(spark, rows), k=2, max_supersteps=1)
    assert run.superstep == 1
    got_map = {r["id"]: r["in_core"] for r in got.collect()}
    # after exactly one sweep only vertex 5 (degree 1) is out
    assert got_map == {1: True, 2: True, 3: True, 4: True, 5: False}
