"""Pointer-jumping CC kernel: identical labels to hash-min CC, in
O(log diameter) rounds (the 100-TB high-diameter story)."""

import pytest

from pyspark.sql import types as T

from tests.conftest import id_space
from tests.oracle_pregel import oracle_cc

from mesos_pregel_spark.algos.cc import (
    connected_components,
    connected_components_jump,
)
from mesos_pregel_spark.fixtures import generate_transcripts, micro_graph_df
from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids


def _df(spark, rows):
    schema = T.StructType([
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ])
    return spark.createDataFrame(rows, schema=schema)


@pytest.mark.parametrize("name", ["chain4", "two_islands", "star_hub", "k4"])
def test_micro_graphs_match_hashmin(spark, name):
    ids_df, edges, _names = id_space(spark, micro_graph_df(spark, name))
    jump, _ = connected_components_jump(spark, ids_df)
    expected = oracle_cc(edges)
    assert {r["id"]: r["component"] for r in jump.collect()} == expected


def test_transcript_graph_matches_hashmin(spark):
    t = generate_transcripts(spark, n_conv=300, seed=42)
    ids_df = edges_with_ids(build_edges(t))
    jump, _ = connected_components_jump(spark, ids_df)
    plain, _ = connected_components(spark, ids_df)
    assert (
        {r["id"]: r["component"] for r in jump.collect()}
        == {r["id"]: r["component"] for r in plain.collect()}
    )


def test_chain_round_counts(spark):
    """1000-vertex path: hash-min needs 999 supersteps; pointer
    jumping must finish in O(log n) — the reason this kernel exists."""
    n = 1000
    rows = [(i, i + 1, 1.0) for i in range(n - 1)]
    comps, run = connected_components_jump(spark, _df(spark, rows))
    got = {r["id"]: r["component"] for r in comps.collect()}
    assert got == {i: 0 for i in range(n)}
    assert run.superstep <= 15, run.superstep  # log2(1000) ≈ 10 + slack
