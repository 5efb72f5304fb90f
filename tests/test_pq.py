"""functions/clustering.py::pq_adc_topk — the ADC identity (the
query's own estimate equals the sum of its two per-subspace
quantization errors) and planted-cluster retrieval."""

import random

from pyspark.sql import functions as F

from mesos_pregel_spark.functions.clustering import kmeans, pq_adc_topk


def _emb_df(spark, rows):
    """rows = [(vec_id, [floats])]"""
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _clustered(rng, centers, per, dim=8):
    rows, vid = [], 0
    for c in centers:
        for _ in range(per):
            rows.append((vid, [c + rng.uniform(-0.5, 0.5) for _ in range(dim)]))
            vid += 1
    return rows


def test_pq_adc_identity_for_query_vector(spark):
    """adc(query) must equal ROUND(d0+d1, 6) where d0/d1 are the
    query's own per-subspace kmeans quantization errors — the ADC
    estimate of a vector against itself IS its quantization error."""
    rng = random.Random(3)
    rows = _clustered(rng, [0.0, 10.0, 20.0], per=6, dim=8)
    df = _emb_df(spark, rows)
    out = {r["vec_id"]: r["adc"] for r in pq_adc_topk(spark, df).collect()}

    emb = df.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    sub0 = emb.select("vec_id", F.slice("e", 1, 4).alias("embedding"))
    sub1 = emb.select("vec_id", F.slice("e", 5, 4).alias("embedding"))
    d0 = {r["vec_id"]: r["dist2"]
          for r in kmeans(spark, sub0, k=4, iters=2).collect()}
    d1 = {r["vec_id"]: r["dist2"]
          for r in kmeans(spark, sub1, k=4, iters=2).collect()}
    qid = 0  # smallest vec_id is the query
    assert out[qid] == round(d0[qid] + d1[qid], 6)


def test_pq_retrieves_planted_cluster(spark):
    """Query sits in cluster A (8 members, far from B and C): every
    cluster-A member must rank ahead of any B/C vector in the ADC
    top-10."""
    rng = random.Random(9)
    rows = _clustered(rng, [0.0, 50.0, 100.0], per=8, dim=8)
    df = _emb_df(spark, rows)
    top = pq_adc_topk(spark, df, topk=10).collect()
    top_ids = [r["vec_id"] for r in top]
    # cluster A = vec_ids 0..7; all 8 must precede any foreign vector
    assert set(top_ids[:8]) == set(range(8))


def test_pq_topk_deterministic_across_partitioning(spark):
    rng = random.Random(11)
    rows = _clustered(rng, [0.0, 10.0], per=10, dim=6)
    a = pq_adc_topk(spark, _emb_df(spark, rows).repartition(2)).collect()
    b = pq_adc_topk(spark, _emb_df(spark, rows).repartition(7)).collect()
    assert list(map(tuple, a)) == list(map(tuple, b))
