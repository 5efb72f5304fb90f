"""The composed training-data preparation pipeline — the query a real
user of this engine runs nightly: language filter → quality filter →
exact dedup → near-dup removal, as ONE declarative plan over the
documents table.

Pinned semantics (mirrored by queries_text.SQL_CORPUS_CLEAN):

- keep docs whose ``language_id`` == ``lang``;
- keep docs with ``quality_score`` ≥ ``quality_min``;
- exact dedup: keep only each fingerprint group's canonical (minimum)
  doc_id;
- near-dup removal: the MinHash-LSH + Jaccard-verify pairs of the
  FULL corpus at ``jaccard_min`` drop the higher doc_id of every pair
  (greedy keep-first by id — deterministic; pairs are computed on the
  full corpus, not the filtered subset, so the drop set is
  order-independent of the other filters).

Returns (doc_id, lang_pred, quality) for the surviving corpus.

Scale shape: every stage is an existing sub-quadratic operator (the
near-dup stage is the banded LSH self-join, not all-pairs); the
composition adds only broadcast-size joins on doc_id, and Catalyst
fuses the scalar filters into one pass over the documents scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Window

from mesos_pregel_spark.functions.dedup import near_duplicates
from mesos_pregel_spark.functions.text import profile_documents


def clean_corpus(
    docs: DataFrame,
    lang: str = "en",
    quality_min: float = 0.55,
    jaccard_min: float = 0.8,
) -> DataFrame:
    """Run the composed cleaning pipeline (see module docstring).

    Plan shape (scan-count-asserted in tests): TWO scans of the
    documents table total — one fused profile pass
    (text.profile_documents: quality + language + fingerprint in a
    single projection; composing the three operators naively costs a
    scan each) and one shingle pass for the MinHash near-dup stage.
    The exact-dedup canonical is a min-over-fingerprint WINDOW on the
    profile branch (one shuffle, no self-join, branch referenced
    once).

    The near-dup stage persists shingle/signature/candidate
    intermediates (they are multiply referenced within the returned
    plan).  Long-lived sessions should call
    ``dedup.release_dedup_caches()`` after materializing the result to
    free executor memory (the bench does)."""
    prof = profile_documents(docs)
    canonical = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    survivors = (
        prof.withColumn("canonical_id", canonical)
        .where(F.col("doc_id") == F.col("canonical_id"))
    )
    near_drop = (
        near_duplicates(docs)
        .where(F.col("jaccard") >= jaccard_min)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        survivors.join(near_drop, "doc_id", "left_anti")
        .where((F.col("lang_pred") == lang) & (F.col("quality") >= quality_min))
        .select("doc_id", "lang_pred", "quality")
    )
