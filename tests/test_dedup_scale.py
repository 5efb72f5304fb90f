"""Dedup at scale: sub-quadratic candidate growth and planted-family
recall on the distributed synthetic corpus generator (the bench's
dedup_scale workload runs the same stack at 50k docs)."""

from mesos_pregel_spark.fixtures import generate_documents_dist
from mesos_pregel_spark.functions.dedup import (
    lsh_candidates,
    near_duplicates,
    release_dedup_caches,
)


def test_lsh_candidate_growth_is_subquadratic(spark):
    """Doubling the corpus must ~double the LSH candidate pairs (the
    planted-dup population is linear in n and base docs share no
    shingles); an all-pairs or bucket-degenerate scheme would grow 4x.
    Pinned < 3x with deterministic fixtures."""
    counts = {}
    for n in (2000, 4000):
        docs = generate_documents_dist(spark, n, dup_frac=0.2) \
            .select("doc_id", "text")
        counts[n] = lsh_candidates(docs, k=32, bands=4,
                                   hash_fn="xxhash64").count()
        release_dedup_caches()
    growth = counts[4000] / max(counts[2000], 1)
    assert counts[2000] > 0
    assert growth < 3.0, (counts, growth)


def test_planted_family_recall(spark):
    """Every dup doc is one word off its base (5-gram Jaccard ~0.87).
    The banded LSH (r=8, b=4) catches ~0.9 of them; pin >= 0.7 planted
    (base, dup) pairs surviving the jaccard >= 0.8 verify."""
    corpus = generate_documents_dist(spark, 2000, dup_frac=0.2)
    planted = {
        (min(r["base_id"], r["doc_id"]), max(r["base_id"], r["doc_id"]))
        for r in corpus.where("is_dup").collect()
    }
    nd = near_duplicates(corpus.select("doc_id", "text"), k=32, bands=4,
                         hash_fn="xxhash64")
    found = {(r["doc_a"], r["doc_b"]) for r in
             nd.where("jaccard >= 0.8").collect()}
    release_dedup_caches()
    recall = len(planted & found) / len(planted)
    assert recall >= 0.7, recall


def test_release_dedup_caches_empties_registry(spark):
    docs = generate_documents_dist(spark, 200).select("doc_id", "text")
    near_duplicates(docs, k=8, bands=4, hash_fn="xxhash64").count()
    assert release_dedup_caches() >= 2  # cand + shingles (+ signatures)
    assert release_dedup_caches() == 0  # idempotent: registry drained
