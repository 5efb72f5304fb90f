"""Distributed transcript generator (fixtures.generate_transcripts_dist):
schema parity with the pinned TRANSCRIPT_SCHEMA, determinism across
partitionings, and the structural invariants the edge extractor relies
on — contiguous turn_idx, user/system openers, tool turns only after
assistant turns, hub-skewed tool picks."""

from pyspark.sql import functions as F

from mesos_pregel_spark.fixtures import (
    TOOL_NAMES,
    TRANSCRIPT_SCHEMA,
    generate_transcripts_dist,
)
from mesos_pregel_spark.functions.edges import build_edges


def test_dist_schema_matches_pinned(spark):
    df = generate_transcripts_dist(spark, 50)
    got = [(f.name, f.dataType) for f in df.schema.fields]
    want = [(f.name, f.dataType) for f in TRANSCRIPT_SCHEMA.fields]
    assert got == want


def test_dist_deterministic_across_partitionings(spark):
    a = generate_transcripts_dist(spark, 300).collect()
    b = generate_transcripts_dist(spark, 300, partitions=5).collect()
    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len({key(r) for r in a}) == len(a)  # (conv, turn) unique


def test_dist_structural_invariants(spark):
    pdf = generate_transcripts_dist(spark, 400).toPandas()
    for _, grp in pdf.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        idx = grp["turn_idx"].to_list()
        assert idx == list(range(len(idx)))          # contiguous turns
        assert 3 <= len(idx) <= 41
        roles = grp["role"].to_list()
        assert roles[0] in ("user", "system")
        for prev, cur in zip(roles, roles[1:]):
            if cur == "tool":
                assert prev == "assistant"           # tools follow assistant
        # tool name present iff role == tool
        assert (grp["tool"].notna() == (grp["role"] == "tool")).all()
    # hub skew: the rank-0 tool dominates (zipf pick)
    tool_counts = pdf["tool"].value_counts()
    assert len(tool_counts) > 3
    assert tool_counts.index[0] == TOOL_NAMES[0]


def test_dist_feeds_edge_extractor(spark):
    t = generate_transcripts_dist(spark, 500, partitions=4)
    edges = build_edges(t)
    rows = edges.collect()
    assert len(rows) > 5
    actors = {r["src_actor"] for r in rows} | {r["dst_actor"] for r in rows}
    assert "role:user" in actors and "role:assistant" in actors
    assert any(a.startswith("tool:") for a in actors)
    # weights are positive interaction counts
    assert all(r["weight"] >= 1.0 for r in rows)
