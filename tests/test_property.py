"""Property-based tests (hypothesis) for the X-layer edge builders and
the directed/rich-club kernels — randomized micro-inputs against pure
python replications, derandomized so CI is stable.

These generalize the fixed-seed oracle tests: hypothesis explores the
corner lattice (empty partitions, single rows, all-equal actors,
boundary window sizes) that hand fixtures under-sample."""

import pytest

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)

# a sequence table: per partition key, rows at unique positions with a
# small actor vocabulary (ties impossible: position is unique per key)
seq_tables = st.dictionaries(
    st.integers(0, 3),                                  # partition key
    st.lists(st.sampled_from("abcd"), min_size=0, max_size=8),
    min_size=1, max_size=4,
)


def _py_edges(table):
    out = {}
    for _key, actors in table.items():
        for a, b in zip(actors, actors[1:]):
            if a != b:
                out[(a, b)] = out.get((a, b), 0) + 1
    return out


@given(table=seq_tables)
@SET
def test_build_edges_generic_matches_python(spark, table):
    from mesos_pregel_spark.functions.edges import build_edges_generic

    rows = [
        (k, i, actor)
        for k, actors in table.items() for i, actor in enumerate(actors)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "k long, pos long, actor string")
    got = {
        (r["src_actor"], r["dst_actor"]): r["weight"]
        for r in build_edges_generic(df, "k", ["pos"], F.col("actor")).collect()
    }
    assert got == {k: float(v) for k, v in _py_edges(table).items()}


@given(table=seq_tables, window_s=st.sampled_from([1, 2, 5]))
@SET
def test_windowed_edges_sum_to_global_property(spark, table, window_s):
    import datetime

    from mesos_pregel_spark.functions.edges import (
        build_edges_generic,
        build_edges_windowed,
    )

    rows = [
        (k, i, actor, datetime.datetime(2026, 1, 1, 0, 0, i))
        for k, actors in table.items() for i, actor in enumerate(actors)
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "k long, pos long, actor string, ts timestamp_ntz"
    )
    wdf = build_edges_windowed(
        df, "k", ["pos"], F.col("actor"),
        ts_col="ts", window_us=window_s * 1_000_000,
    )
    summed = {
        (r["src_actor"], r["dst_actor"]): r["w"]
        for r in wdf.groupBy("src_actor", "dst_actor")
        .agg(F.sum("weight").alias("w")).collect()
    }
    glob = {
        (r["src_actor"], r["dst_actor"]): r["weight"]
        for r in build_edges_generic(df, "k", ["pos"], F.col("actor")).collect()
    }
    assert summed == glob


digraphs = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)),
    min_size=1, max_size=25,
)


@given(edges=digraphs)
@SET
def test_triangle_census_property(spark, edges):
    import itertools

    from mesos_pregel_spark.algos.directed import triangle_census

    e = {(s, d) for s, d in edges if s != d}
    if not e:
        return
    verts = {v for p in e for v in p}
    cyc = sum(
        1 for u, v, w in itertools.permutations(verts, 3)
        if (u, v) in e and (v, w) in e and (w, u) in e
    ) // 3
    tra = sum(
        1 for u, v, w in itertools.permutations(verts, 3)
        if (u, v) in e and (v, w) in e and (u, w) in e
    )
    df = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges], "src long, dst long"
    )
    c = triangle_census(spark, df).collect()[0]
    assert (c["cyclic_triangles"], c["transitive_triplets"]) == (cyc, tra)


undirected = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=1, max_size=25,
)


@given(edges=undirected)
@SET
def test_rich_club_property(spark, edges):
    from mesos_pregel_spark.algos.structure import rich_club

    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not e:
        return
    deg = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    expect = {}
    for k in sorted(set(deg.values())):
        rich = {v for v, d in deg.items() if d > k}
        if len(rich) < 2:
            continue
        re_ = sum(1 for a, b in e if a in rich and b in rich)
        expect[k] = (len(rich), re_,
                     round(2 * re_ / (len(rich) * (len(rich) - 1)), 9))
    df = spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in edges],
        "src long, dst long, weight double",
    )
    got = {
        r["k"]: (r["n_rich"], r["rich_edges"], r["phi"])
        for r in rich_club(spark, df).collect()
    }
    assert got == expect


# small random corpora: token lists over a tiny vocabulary (collisions
# and repeated spans are likely by construction)
corpora = st.lists(
    st.lists(st.sampled_from("pqrs"), min_size=0, max_size=12),
    min_size=1, max_size=6,
)


@given(docs=corpora, k=st.sampled_from([2, 3]))
@SET
def test_span_dedup_conservation_property(spark, docs, k):
    """Keep-first conservation: total spans - total duplicate spans ==
    number of DISTINCT span hashes (each hash keeps exactly one)."""
    from mesos_pregel_spark.functions.dedup import span_dedup_stats

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    rows = span_dedup_stats(df, span_tokens=k).collect()
    total = sum(r["n_spans"] for r in rows)
    dups = sum(r["dup_spans"] for r in rows)
    distinct = len({
        tuple(toks[p * k:(p + 1) * k])
        for toks in ([t for t in d] for d in docs)
        for p in range(len(toks) // k)
    })
    assert total - dups == distinct
    assert all(0 <= r["dup_spans"] <= r["n_spans"] for r in rows)


@given(docs=corpora, w=st.sampled_from([2, 4]), s=st.sampled_from([1, 2]))
@SET
def test_chunk_windows_coverage_property(spark, docs, w, s):
    """Every token position of every document is covered by >= 1 chunk,
    chunk starts advance by exactly the stride, and the last chunk
    reaches the end of the document."""
    from mesos_pregel_spark.functions.packing import chunk_windows

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    rows = chunk_windows(df, window_tokens=w, stride=s).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_tok"], r["n_tokens"])
        )
    for i, toks in enumerate(docs):
        nt = max(len(toks), 1)          # empty text tokenizes to ['']
        chunks = sorted(by_doc[i])
        covered = set()
        for idx, (ci, start, n) in enumerate(chunks):
            assert ci == idx and start == idx * s and n >= 1
            covered.update(range(start, start + n))
        assert covered == set(range(nt))
        assert chunks[-1][1] + chunks[-1][2] == nt


@given(docs=corpora)
@SET
def test_ngram_hotspots_total_count_property(spark, docs):
    """With an unbounded top_k, the n-gram counts sum to
    sum_d max(nt_d - n + 1, 0)."""
    from mesos_pregel_spark.functions.composition import ngram_hotspots

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    rows = ngram_hotspots(df, n=2, top_k=10**6).collect()
    want = sum(max(max(len(t), 1) - 1, 0) for t in docs)
    assert sum(r["cnt"] for r in rows) == want


# undirected micro-graphs: unique canonical pairs over a small vertex set
micro_graphs = st.sets(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).map(
        lambda p: (min(p), max(p))
    ).filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=16,
)


@given(edges=micro_graphs)
@SET
def test_turn_entropy_bounds_property(spark, edges):
    """0 <= H <= ln(n_actors) + snap slack for every conversation."""
    import math

    from mesos_pregel_spark.functions.sessions import turn_entropy

    rows = [(f"c{a % 3}", f"actor{b}") for a, b in edges]
    df = spark.createDataFrame(rows, "user_id string, event_type string")
    for r in turn_entropy(df).collect():
        assert r["entropy"] >= -1e-6
        assert r["entropy"] <= math.log(r["n_actors"]) + 1e-6


@given(edges=micro_graphs)
@SET
def test_wl_class_sizes_partition_vertices_property(spark, edges):
    """WL class sizes sum to |V| and every class member count is
    consistent with its recorded class_size."""
    from collections import Counter

    from mesos_pregel_spark.algos.wl import wl_colors

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )
    rows = wl_colors(spark, df).collect()
    verts = {v for e in edges for v in e}
    assert len(rows) == len(verts)
    by_color = Counter(r["wl_color"] for r in rows)
    for r in rows:
        assert by_color[r["wl_color"]] == r["class_size"]


@given(edges=micro_graphs)
@SET
def test_sweep_conductance_bounds_property(spark, edges):
    """Conductance in [0, 1]; vol strictly increasing; cut >= 0; the
    full-support prefix of a connected component never exceeds phi=1."""
    from mesos_pregel_spark.algos.sweep import sweep_cut

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )
    rows = sweep_cut(spark, df).orderBy("i").collect()
    prev_vol = 0
    for r in rows:
        assert r["cut"] >= 0
        assert r["vol"] > prev_vol
        prev_vol = r["vol"]
        if r["conductance"] is not None:
            assert 0.0 <= r["conductance"] <= 1.0


# ---------------------------------------------------------------------------
# round-5 final additions: novelty bounds, funnel monotonicity,
# partition-cut bounds, attribute-assortativity range
# ---------------------------------------------------------------------------

small_corpora = st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=10),
    min_size=1, max_size=6,
)


@given(docs=small_corpora)
@SET
def test_ngram_novelty_bounds_property(spark, docs):
    """novelty_ratio ∈ [0, 1]; duplicating the whole corpus forces
    every ratio to exactly 0 (no gram can be unique to one doc)."""
    from mesos_pregel_spark.functions.decontam import ngram_novelty

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in ngram_novelty(df, n=3).collect():
        assert 0.0 <= r["novelty_ratio"] <= 1.0
        assert 0 <= r["n_novel"] <= r["n_grams"]
    dup_rows = rows + [(i + 1000, t) for i, t in rows]
    ddf = spark.createDataFrame(dup_rows, "doc_id long, text string")
    for r in ngram_novelty(ddf, n=3).collect():
        assert r["n_novel"] == 0


@given(edges=undirected)
@SET
def test_partition_cut_bounds_property(spark, edges):
    """0 ≤ cut ≤ m at every P, and P=1 always cuts nothing."""
    from mesos_pregel_spark.algos.structure import partition_cut

    e = [(s, d) for s, d in edges if s != d]
    if not e:
        return
    df = spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in e],
        "src long, dst long, weight double",
    )
    for r in partition_cut(spark, df, n_partitions=(1, 3, 16)).collect():
        assert 0 <= r["cut_edges"] <= r["n_edges"]
        if r["n_partitions"] == 1:
            assert r["cut_edges"] == 0


@given(edges=undirected, n_labels=st.sampled_from([1, 2, 3]))
@SET
def test_attr_assortativity_range_property(spark, edges, n_labels):
    """r ∈ [−1, 1] whenever defined; the single-class case is NULL."""
    from mesos_pregel_spark.algos.structure import attribute_assortativity

    e = [(s, d) for s, d in edges if s != d]
    if not e:
        return
    verts = sorted({v for p in e for v in p})
    lab = {v: f"c{v % n_labels}" for v in verts}
    edf = spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in e],
        "src long, dst long, weight double",
    )
    ldf = spark.createDataFrame(
        [(int(v), c) for v, c in lab.items()], "id long, label string"
    )
    row = attribute_assortativity(spark, edf, ldf).collect()[0]
    classes_present = {lab[v] for v in verts}
    if row["r"] is None:
        # undefined only when the denominator vanishes: every stub in
        # one class
        assert len(classes_present) == 1 or row["same_edges"] == row["m_edges"]
    else:
        assert -1.0 <= row["r"] <= 1.0 + 1e-12


@given(
    log=st.lists(
        st.tuples(
            st.integers(0, 2),            # user
            st.integers(0, 50),           # minute
            st.sampled_from("ABCX"),      # event type
        ),
        min_size=1, max_size=20, unique=True,
    )
)
@SET
def test_funnel_monotone_property(spark, log):
    """n_sessions ≥ n_s1 ≥ n_s12 ≥ n_s123 — the funnel can only
    narrow."""
    from datetime import datetime, timedelta

    from mesos_pregel_spark.functions.sessions import funnel_conversion

    base = datetime(2024, 6, 1)
    rows = [
        (i, base + timedelta(minutes=m), u, t, 0.0, "{}")
        for i, (u, m, t) in enumerate(log)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    r = funnel_conversion(df, ("A", "B", "C"), gap_us=10 * 60 * 1_000_000)
    row = r.collect()[0]
    assert row["n_sessions"] >= row["n_s1"] >= row["n_s12"] >= row["n_s123"]
