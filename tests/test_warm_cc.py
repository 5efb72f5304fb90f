"""Warm-start CC (additions-only) + incremental dedup-cluster refresh:
warm ≡ cold labels, with measurably fewer supersteps on a micro-batch
delta; refresh over the star quotient ≡ full re-run over all pairs."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mesos_pregel_spark.algos.cc import connected_components
from mesos_pregel_spark.streaming.refresh import (
    refresh_dedup_clusters,
    warm_connected_components,
)

_EDGE_SCHEMA = T.StructType([
    T.StructField("src", T.LongType(), False),
    T.StructField("dst", T.LongType(), False),
    T.StructField("weight", T.DoubleType(), False),
])


def _edges(spark, rows):
    return spark.createDataFrame(rows, schema=_EDGE_SCHEMA)


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_warm_equals_cold_fewer_supersteps(spark):
    """Production regime: a large stable component (long chain — worst
    case for hash-min) plus a tiny delta that merges a small island
    into it.  Cold pays the full chain diameter again; warm starts from
    the collapsed labels and only the delta frontier re-propagates."""
    chain = [(i, i + 1, 1.0) for i in range(24)]          # one component, min 0
    island = [(100, 101, 1.0)]                            # component min 100
    delta = [(24, 100, 1.0)]                              # merges them
    full_df = _edges(spark, chain + island + delta)
    # previous converged labels (what an earlier run on chain+island
    # returns): chain → 0, island → 100
    prev = spark.createDataFrame(
        [(i, 0) for i in range(25)] + [(100, 100), (101, 100)],
        schema="id long, component long",
    )
    cold, cold_run = connected_components(spark, full_df, edge_partitions=4)
    warm, warm_run = warm_connected_components(
        spark, full_df, prev, delta_edges=_edges(spark, delta),
        edge_partitions=4,
    )
    assert _labels(warm) == _labels(cold)
    assert all(v == 0 for v in _labels(warm).values())
    # cold re-floods the 25-hop chain; warm only walks the delta →
    # island merge (a handful of supersteps)
    assert len(cold_run.metrics) >= 20
    assert len(warm_run.metrics) <= 6
    assert len(warm_run.metrics) < len(cold_run.metrics) / 3


def test_warm_without_delta_still_exact(spark):
    """No delta_edges hint → every vertex is initially active; labels
    still exact, supersteps still bounded by the quotient flood."""
    chain = [(i, i + 1, 1.0) for i in range(24)]
    delta = [(3, 100, 1.0), (100, 101, 1.0)]
    full_df = _edges(spark, chain + delta)
    prev = spark.createDataFrame(
        [(i, 0) for i in range(25)], schema="id long, component long",
    )
    cold, _ = connected_components(spark, full_df, edge_partitions=4)
    warm, warm_run = warm_connected_components(
        spark, full_df, prev, edge_partitions=4,
    )
    assert _labels(warm) == _labels(cold)
    assert len(warm_run.metrics) <= 6


def test_warm_new_vertices_cold_seeded(spark):
    """Vertices unseen by prev_labels seed from their own id (cold) and
    join whatever component the delta attaches them to."""
    old = [(1, 2, 1.0), (2, 3, 1.0)]
    delta = [(3, 7, 1.0), (7, 8, 1.0), (9, 10, 1.0)]  # 9-10: brand-new island
    full_df = _edges(spark, old + delta)
    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], schema="id long, component long",
    )
    warm, _ = warm_connected_components(
        spark, full_df, prev, delta_edges=_edges(spark, delta),
        edge_partitions=4,
    )
    cold, _ = connected_components(spark, full_df, edge_partitions=4)
    assert _labels(warm) == _labels(cold)
    assert _labels(warm)[8] == 1 and _labels(warm)[10] == 9


def _clusters(df):
    return {r["doc_id"]: (r["cluster"], r["keep"]) for r in df.collect()}


def test_refresh_dedup_clusters_equals_full_rerun(spark):
    """Micro-batch cluster maintenance over the star quotient must
    equal CC over ALL historical pairs (the batch dedup_clusters
    semantics), including transitive merges across the batch boundary
    and untouched singleton keepers."""
    pair_schema = "doc_a long, doc_b long"
    batch1 = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], schema=pair_schema)
    batch2 = spark.createDataFrame([(3, 10), (20, 21)], schema=pair_schema)

    def pairs_to_edges(p):
        return p.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"),
            F.lit(1.0).alias("weight"),
        )

    # previous assignment = batch-1 clusters + an untouched singleton 50
    comps1, _ = connected_components(
        spark, pairs_to_edges(batch1), edge_partitions=4)
    prev = comps1.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster"),
        (F.col("id") == F.col("component")).alias("keep"),
    ).unionByName(spark.createDataFrame(
        [(50, 50, True)], schema="doc_id long, cluster long, keep boolean"))

    refreshed, refresh_run = refresh_dedup_clusters(spark, prev, batch2)

    full, _ = connected_components(
        spark, pairs_to_edges(batch1.unionByName(batch2)), edge_partitions=4)
    expected = {
        r["id"]: (r["component"], r["id"] == r["component"])
        for r in full.collect()
    }
    expected[50] = (50, True)  # singleton untouched by any pair
    assert _clusters(refreshed) == expected
    # the star quotient floods a merged cluster through its hub —
    # supersteps stay O(1) regardless of how many docs the old
    # clusters hold
    assert len(refresh_run.metrics) <= 5


def test_refresh_dedup_clusters_chained_batches(spark):
    """Three micro-batches folded in sequence ≡ one cold run over the
    union — the streaming cadence (mirrors test_streaming_refresh's
    e2e shape for PageRank)."""
    pair_schema = "doc_a long, doc_b long"
    batches = [
        [(1, 2), (5, 6)],
        [(2, 5)],                # merges {1,2} with {5,6}
        [(6, 9), (30, 31)],      # extends the merged cluster + new pair
    ]
    dfs = [spark.createDataFrame(b, schema=pair_schema) for b in batches]

    def pairs_to_edges(p):
        return p.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"),
            F.lit(1.0).alias("weight"),
        )

    comps, _ = connected_components(
        spark, pairs_to_edges(dfs[0]), edge_partitions=4)
    state = comps.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster"),
        (F.col("id") == F.col("component")).alias("keep"),
    )
    for b in dfs[1:]:
        state, _ = refresh_dedup_clusters(spark, state, b)

    all_pairs = dfs[0]
    for b in dfs[1:]:
        all_pairs = all_pairs.unionByName(b)
    full, _ = connected_components(
        spark, pairs_to_edges(all_pairs), edge_partitions=4)
    expected = {
        r["id"]: (r["component"], r["id"] == r["component"])
        for r in full.collect()
    }
    assert _clusters(state) == expected
