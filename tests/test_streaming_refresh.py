"""Streaming → Pregel warm-start refresh (streaming/refresh.py):

1. warm-start from the previous converged state converges in FEWER
   supersteps than cold on the same delta'd graph (the point of the
   glue), and to the same fixpoint (damped power iteration has a
   unique one);
2. end-to-end: stateful-linked transitions from two micro-batches feed
   refresh_pagerank_from_stream; the second refresh warm-starts from
   the first and reaches the same fixpoint as a cold run on the final
   snapshot (its delta is large by construction, so the superstep-
   savings claim lives in the controlled micro test).
"""

import time

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mesos_pregel_spark.algos.pagerank import pagerank
from mesos_pregel_spark.streaming.refresh import (
    refresh_pagerank_from_stream,
    warm_pagerank,
)


def _df(spark, rows):
    schema = T.StructType([
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ])
    return spark.createDataFrame(rows, schema=schema)


def _ranks(df):
    return {r["id"]: r["pagerank"] for r in df.collect()}


def test_warm_start_converges_in_fewer_supersteps(spark):
    """Asymmetric 500-vertex digraph (non-uniform fixpoint — on a
    symmetric graph the cold 1/N init coincides with the fixpoint and
    warm buys nothing) + a 1-edge delta.  The warm init starts ~100x
    closer to the new fixpoint (measured: first-step max_delta 3.6e-4
    vs cold 4.1e-2 on this fixture); with the tolerance BETWEEN the
    perturbation scale and the cold-init error — the production regime
    for micro-batch deltas on a big graph — warm converges in a
    fraction of the cold supersteps.  (At tolerances far below the
    perturbation both runs grind the same spectral tail and warm only
    saves its head start; the glue's value is the common case where
    the delta per refresh is tiny relative to the graph.)"""
    # squaring maps are non-bijective => skewed in-degrees => the
    # fixpoint sits far from the uniform cold init
    base = [(i, (i * i + 1) % 500, 1.0) for i in range(500)] + \
           [(i, (i * i * i + 7) % 500, 1.0) for i in range(500)]
    base = [e for e in base if e[0] != e[1]]
    prev, run_prev = pagerank(spark, _df(spark, base), tol=1e-6,
                              edge_partitions=4)
    delta = base + [(3, 17, 1.0)]
    cold, run_cold = pagerank(spark, _df(spark, delta), tol=1e-4,
                              edge_partitions=4)
    warm, run_warm = warm_pagerank(spark, _df(spark, delta), prev,
                                   tol=1e-4, edge_partitions=4)
    assert len(run_warm.metrics) < len(run_cold.metrics), (
        len(run_warm.metrics), len(run_cold.metrics))
    cold_m, warm_m = _ranks(cold), _ranks(warm)
    assert set(cold_m) == set(warm_m)
    for v, pr in cold_m.items():
        assert warm_m[v] == pytest.approx(pr, abs=1e-3)


def test_warm_start_handles_new_vertices(spark):
    """Vertices absent from prev_ranks (arrived with the delta) start
    cold at 1/N — the run still reaches the unique fixpoint."""
    base = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)]
    prev, _ = pagerank(spark, _df(spark, base), tol=1e-6, edge_partitions=4)
    delta = base + [(3, 4, 1.0), (4, 1, 1.0)]
    cold, _ = pagerank(spark, _df(spark, delta), tol=1e-6, edge_partitions=4)
    warm, _ = warm_pagerank(spark, _df(spark, delta), prev, tol=1e-6,
                            edge_partitions=4)
    cold_m, warm_m = _ranks(cold), _ranks(warm)
    assert set(warm_m) == set(cold_m) == {1, 2, 3, 4}
    for v, pr in cold_m.items():
        assert warm_m[v] == pytest.approx(pr, abs=2e-5)


def test_refresh_from_stream_end_to_end(spark, tmp_path):
    """Micro-batch 1 lands; refresh (cold).  Micro-batch 2 lands;
    refresh warm-started from run 1 — identical fixpoint to a cold run
    on the same final snapshot."""
    from mesos_pregel_spark.fixtures import generate_transcripts
    from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids
    from tests.test_streaming_stateful import _run, _write_file

    t = generate_transcripts(spark, n_conv=60, seed=42).persist()
    first, second = t.where(F.col("turn_idx") < 3), t.where(F.col("turn_idx") >= 3)
    input_dir = str(tmp_path / "in")
    trans_dir = str(tmp_path / "tr")
    ckpt_dir = str(tmp_path / "ck")
    now = time.time()

    _write_file(first, input_dir, "f1", now - 60, str(tmp_path))
    _run(spark, input_dir, trans_dir, ckpt_dir)
    ranks1, _run1 = refresh_pagerank_from_stream(
        spark, trans_dir, prev_ranks=None, tol=1e-6, edge_partitions=4)
    ranks1 = ranks1.persist()
    ranks1.count()

    _write_file(second, input_dir, "f2", now, str(tmp_path))
    _run(spark, input_dir, trans_dir, ckpt_dir)
    warm, run_warm = refresh_pagerank_from_stream(
        spark, trans_dir, prev_ranks=ranks1, tol=1e-6, edge_partitions=4)

    cold, run_cold = pagerank(
        spark, edges_with_ids(build_edges(t)), tol=1e-6, edge_partitions=4)
    # The e2e delta (every conversation's second half) is LARGE, so the
    # superstep claim lives in the controlled micro test above; here we
    # pin the glue's correctness: same vertex set, same fixpoint.
    cold_m, warm_m = _ranks(cold), _ranks(warm)
    assert set(cold_m) == set(warm_m)
    for v, pr in cold_m.items():
        assert warm_m[v] == pytest.approx(pr, abs=2e-5)
    ranks1.unpersist()
    t.unpersist()


def test_incremental_dedup_end_to_end(spark):
    """Document micro-batches through the REAL incremental chain:
    refresh_dedup_pipeline LSH-blocks the new batch against the
    historical band index, Jaccard-verifies only new-involving
    candidates, and folds the verified pairs into the previous cluster
    assignment via the star-quotient warm CC.  Final clusters ≡ the
    batch dedup_clusters composition (near_duplicates → CC → min-label
    keeper) over the full corpus — including a family SPLIT across the
    batch boundary."""
    from mesos_pregel_spark.algos.cc import connected_components
    from mesos_pregel_spark.functions.dedup import (
        near_duplicates,
        release_dedup_caches,
    )
    from mesos_pregel_spark.streaming.refresh import refresh_dedup_pipeline

    base_a = ("the quick brown fox jumps over the lazy dog while the "
              "rain falls softly on the quiet town square")
    base_b = ("distributed graph engines shuffle vertex messages across "
              "partitions to converge on a stable fixpoint quickly")
    uniq = ("completely unrelated text about cooking pasta with garlic "
            "olive oil and a pinch of sea salt for dinner")
    batch1_rows = [
        (1, base_a), (2, base_a.replace("quick", "swift")),
        (10, base_b), (50, uniq),
    ]
    # doc 3 joins family A across the boundary; 11 joins family B;
    # 60 starts a brand-new family with 61
    batch2_rows = [
        (3, base_a.replace("lazy", "sleepy")),
        (11, base_b.replace("quickly", "rapidly")),
        (60, uniq.replace("dinner", "supper")),
        (61, uniq.replace("dinner", "lunch")),
    ]
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(batch1_rows, schema=schema)
    full = spark.createDataFrame(batch1_rows + batch2_rows, schema=schema)

    def verified_pairs(docs):
        p = (
            near_duplicates(docs)
            .where(F.col("jaccard") >= 0.8)
            .select("doc_a", "doc_b")
            .localCheckpoint(eager=True)
        )
        release_dedup_caches()
        return p

    def clusters_from_pairs(pairs):
        comps, _ = connected_components(
            spark,
            pairs.select(
                F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"),
                F.lit(1.0).alias("weight"),
            ),
            edge_partitions=4,
        )
        return comps.select(
            F.col("id").alias("doc_id"), F.col("component").alias("cluster"),
            (F.col("id") == F.col("component")).alias("keep"),
        )

    b2 = spark.createDataFrame(batch2_rows, schema=schema)
    state = clusters_from_pairs(verified_pairs(b1)).localCheckpoint(
        eager=True)

    refreshed, new_index, run = refresh_dedup_pipeline(
        spark, b1, b2, state, jaccard_min=0.8)
    # the returned index covers the whole corpus (next batch's input)
    assert new_index.select("doc_id").distinct().count() == full.count()
    pairs_all = verified_pairs(full)

    expected = {
        r["doc_id"]: (r["cluster"], r["keep"])
        for r in clusters_from_pairs(pairs_all).collect()
    }
    got = {
        r["doc_id"]: (r["cluster"], r["keep"]) for r in refreshed.collect()
    }
    assert got == expected
    # the cross-boundary family actually merged: 3 landed in 1's cluster
    assert got[3] == (1, False) and got[1] == (1, True)
    assert len(run.metrics) <= 5


# ---------------------------------------------------------------------------
# warm LPA (r5)
# ---------------------------------------------------------------------------


def _cliques_df(spark, sizes, bridges=()):
    rows = []
    base = 0
    for n in sizes:
        for i in range(base, base + n):
            for j in range(i + 1, base + n):
                rows.append((i, j, 1.0))
        base += n
    rows += [(a, b, 1.0) for a, b in bridges]
    return _df(spark, rows)


def test_warm_lpa_verifies_fixpoint_in_one_superstep(spark):
    """Two 12-cliques: cold LPA converges to per-clique communities;
    add an intra-clique edge delta (communities unchanged) — the warm
    run must return EXACTLY the cold-run labels of the refreshed graph
    in one superstep (fixpoint verification), vs multiple cold."""
    from mesos_pregel_spark.algos.lpa import label_propagation
    from mesos_pregel_spark.streaming.refresh import warm_lpa

    g0 = _cliques_df(spark, [12, 12])
    prev, run0 = label_propagation(spark, g0, max_supersteps=20)
    prev = prev.localCheckpoint(eager=True)
    assert len(run0.metrics) > 1

    # delta: an edge inside clique 2 was missing before — add it now
    g1 = _cliques_df(spark, [12, 12]).where(
        ~((F.col("src") == 13) & (F.col("dst") == 17))
    )
    g1_full = _cliques_df(spark, [12, 12])
    cold, run_cold = label_propagation(spark, g1_full, max_supersteps=20)
    warm, run_warm = warm_lpa(spark, g1_full, prev, max_supersteps=20)

    cold_labels = {r["id"]: r["label"] for r in cold.collect()}
    warm_labels = {r["id"]: r["label"] for r in warm.collect()}
    assert warm_labels == cold_labels
    assert len(run_warm.metrics) == 1          # fixpoint verified
    assert len(run_warm.metrics) < len(run_cold.metrics)


def test_warm_lpa_new_vertices_start_cold(spark):
    from mesos_pregel_spark.streaming.refresh import warm_lpa

    g0 = _cliques_df(spark, [6])
    from mesos_pregel_spark.algos.lpa import label_propagation
    prev, _ = label_propagation(spark, g0, max_supersteps=20)
    prev = prev.localCheckpoint(eager=True)
    # new clique appears; old one untouched
    g1 = _cliques_df(spark, [6, 5])
    warm, run = warm_lpa(spark, g1, prev, max_supersteps=20)
    labels = {r["id"]: r["label"] for r in warm.collect()}
    assert len({labels[i] for i in range(6)}) == 1
    assert len({labels[i] for i in range(6, 11)}) == 1
    assert labels[0] != labels[6]


# ---------------------------------------------------------------------------
# incremental assortativity (r5)
# ---------------------------------------------------------------------------


def _assort_row(df):
    r = df.collect()[0]
    return (r["n_endpoints"], r["assortativity"])


def test_incremental_assortativity_matches_batch(spark):
    """State built on g0, deltas applied (adds incl. a NEW vertex,
    removals, and a no-op re-add) must equal the batch recompute on
    the final edge set EXACTLY (same integers -> same one float
    expression)."""
    import random

    from mesos_pregel_spark.algos.structure import degree_assortativity
    from mesos_pregel_spark.streaming.refresh import (
        assortativity_apply_delta,
        assortativity_from_state,
        assortativity_state,
    )

    rng = random.Random(7)
    base = {(rng.randrange(40), rng.randrange(40)) for _ in range(120)}
    base = [(a, b) for a, b in base if a != b]
    g0 = _df(spark, [(a, b, 1.0) for a, b in base])

    state = assortativity_state(spark, g0)
    adds = [(1, 41, 1.0), (41, 42, 1.0), (2, 3, 1.0), (base[0][0], base[0][1], 1.0)]
    rems = [(a, b, 1.0) for a, b in base[10:14]]
    state = assortativity_apply_delta(
        spark, state, add_edges=_df(spark, adds), remove_edges=_df(spark, rems),
    )

    final = {(min(a, b), max(a, b)) for a, b in base}
    final |= {(1, 41), (41, 42), (2, 3)}
    final -= {(min(a, b), max(a, b)) for a, b, _w in rems}
    g1 = _df(spark, [(a, b, 1.0) for a, b in sorted(final)])

    got = _assort_row(assortativity_from_state(state))
    want = _assort_row(degree_assortativity(spark, g1))
    assert got == want

    # second delta on the already-incremental state: removals only
    rems2 = [(a, b, 1.0) for a, b in sorted(final)[:5]]
    state = assortativity_apply_delta(
        spark, state, remove_edges=_df(spark, rems2))
    g2 = _df(spark, [(a, b, 1.0) for a, b in sorted(final)[5:]])
    got2 = _assort_row(assortativity_from_state(state))
    want2 = _assort_row(degree_assortativity(spark, g2))
    assert got2 == want2


def test_incremental_assortativity_state_shape(spark):
    """The refresh never shuffles the historical edge set: the state's
    und table is only broadcast-filtered (N_old lookup) — assert the
    vertex stats table stays |V|-sized and und row count tracks the
    delta arithmetic."""
    from mesos_pregel_spark.streaming.refresh import (
        assortativity_apply_delta,
        assortativity_state,
    )

    g0 = _cliques_df(spark, [8])
    state = assortativity_state(spark, g0)
    assert state["und"].count() == 28
    state = assortativity_apply_delta(
        spark, state, add_edges=_df(spark, [(0, 100, 1.0)]),
        remove_edges=_df(spark, [(0, 1, 1.0)]),
    )
    assert state["und"].count() == 28
    assert state["verts"].count() == 9


def test_incremental_transitivity_matches_batch(spark):
    """Triangle/wedge maintenance under add+remove deltas equals the
    batch global_clustering on the final edge set exactly — including
    multi-delta-edge triangles (counted once) and triangles formed
    entirely by added edges."""
    from mesos_pregel_spark.algos.structure import global_clustering
    from mesos_pregel_spark.streaming.refresh import (
        transitivity_apply_delta,
        transitivity_from_state,
        transitivity_state,
    )

    base = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5),
            (5, 6), (6, 7)]
    g0 = _df(spark, [(a, b, 1.0) for a, b in base])
    state = transitivity_state(spark, g0)

    # delta 1: close two new triangles sharing added edges (6-7-8 via
    # two added edges + one old), remove one edge of an existing
    # triangle (0-2), re-add an existing edge (no-op)
    adds = [(6, 8, 1.0), (7, 8, 1.0), (5, 7, 1.0), (0, 1, 1.0)]
    rems = [(0, 2, 1.0), (30, 31, 1.0)]  # second removal not present
    state = transitivity_apply_delta(
        spark, state, add_edges=_df(spark, adds), remove_edges=_df(spark, rems),
    )
    final = {(min(a, b), max(a, b)) for a, b in base}
    final |= {(6, 8), (7, 8), (5, 7)}
    final -= {(0, 2)}
    g1 = _df(spark, [(a, b, 1.0) for a, b in sorted(final)])

    got = transitivity_from_state(spark, state).collect()[0]
    want = global_clustering(spark, g1).collect()[0]
    assert (got["triangles"], got["wedges"], got["transitivity"]) == (
        want["triangles"], want["wedges"], want["transitivity"])

    # delta 2 on the incremental state: remove a 2-triangle edge
    state = transitivity_apply_delta(
        spark, state, remove_edges=_df(spark, [(5, 6, 1.0)]))
    g2 = _df(spark, [(a, b, 1.0) for a, b in sorted(final - {(5, 6)})])
    got2 = transitivity_from_state(spark, state).collect()[0]
    want2 = global_clustering(spark, g2).collect()[0]
    assert (got2["triangles"], got2["wedges"], got2["transitivity"]) == (
        want2["triangles"], want2["wedges"], want2["transitivity"])


def test_incremental_community_stats_matches_batch(spark):
    """Per-community sufficient statistics under add+remove deltas
    with fixed labels equal the batch community_stats on the final
    edge set exactly — including new-vertex singleton labelling,
    community disappearance (all internal edges removed), and a
    no-op delta (absent removal + already-present addition)."""
    from mesos_pregel_spark.algos.communities import community_stats
    from mesos_pregel_spark.streaming.refresh import (
        community_apply_delta,
        community_from_state,
        community_state,
    )

    base = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5),
            (5, 6)]
    labels = {0: "L", 1: "L", 2: "L", 3: "R", 4: "R", 5: "R", 6: "R"}
    g0 = _df(spark, [(a, b, 1.0) for a, b in base])
    lab0 = spark.createDataFrame(
        list(labels.items()), "id long, label string"
    )

    def batch(edge_pairs, lab_map):
        g = _df(spark, [(a, b, 1.0) for a, b in sorted(edge_pairs)])
        lab = spark.createDataFrame(
            list(lab_map.items()), "id long, label string"
        )
        return {
            tuple(r) for r in community_stats(spark, g, lab).collect()
        }

    def compare(state, edge_pairs, lab_map):
        got = {tuple(r) for r in community_from_state(spark, state).collect()}
        assert got == batch(edge_pairs, lab_map)

    state = community_state(spark, g0, lab0)
    compare(state, {(min(a, b), max(a, b)) for a, b in base}, labels)

    # delta 1: new vertices 7, 8 (own-id singletons), an intra-L add,
    # an inter-community add, a no-op re-add, a no-op absent removal
    adds = [(6, 7, 1.0), (7, 8, 1.0), (0, 1, 1.0), (1, 0, 1.0),
            (2, 4, 1.0)]
    rems = [(40, 41, 1.0)]
    state = community_apply_delta(
        spark, state,
        add_edges=_df(spark, adds), remove_edges=_df(spark, rems),
    )
    final = {(min(a, b), max(a, b)) for a, b in base}
    final |= {(6, 7), (7, 8), (2, 4)}
    lab1 = {**labels, 7: "7", 8: "8"}
    compare(state, final, lab1)

    # delta 2: removals only — kill all of L's internal edges so the
    # community's e_in row vanishes but its members remain
    state = community_apply_delta(
        spark, state,
        remove_edges=_df(spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]),
    )
    final2 = final - {(0, 1), (1, 2), (0, 2)}
    lab2 = {k: v for k, v in lab1.items() if k != 0}  # 0 is degree-0 now
    compare(state, final2, lab2)
