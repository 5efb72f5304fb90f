"""Eval-set decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The standard pretraining hygiene step (n-gram overlap decontamination,
as popularized by the GPT-3/PaLM data cards): an eval document's
distinct word n-grams form a blocklist; a training document is
contaminated when any of its n-grams (or more than ``ratio_min`` of
them) appears in the blocklist.

Pinned semantics (shared with the DuckDB twin in queries_text.py and
the python oracle in tests):

- tokenization = the engine's pinned normalize/split
  (functions/text.py::tokens_col);
- an n-gram = ``n`` consecutive tokens joined by single spaces;
  documents with fewer than ``n`` tokens contribute their whole token
  sequence as one gram (mirroring the shingle floor in
  functions/dedup.py);
- grams are DISTINCT per document (a doc repeating an eval gram ten
  times scores one hit) and hashed with md5 before the join — the
  engines compare 32-hex strings, never raw text;
- overlap_ratio = hits / grams, rounded to 9 dp;
  contaminated ⟺ hits ≥ 1 (the any-hit rule; callers wanting a
  softer rule filter on the ratio).

Scale shape: both sides reduce to (doc_id, gram_hash) rows — linear
in corpus tokens.  The join is a hash-partitioned equi-join on the
gram hash; an eval set is small relative to 100 TB of training data
but its distinct-gram table can still reach 10^7-10^8 rows, so the
plan does NOT force a broadcast — AQE promotes it when the blocklist
side is actually small, and otherwise both sides shuffle by gram hash
(never by document).  The hit count is a map-side-combinable sum per
doc_id.  No Python UDFs anywhere; every expression is whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mesos_pregel_spark.functions.text import tokens_col


def ngram_hashes(docs: DataFrame, n: int = 8) -> DataFrame:
    """Distinct md5-hashed word n-grams per document:
    (doc_id, gram).  Short documents (< n tokens) yield their whole
    token sequence as the single gram."""
    toks = tokens_col(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(toks, i, F.lit(n)))
        ),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
) -> DataFrame:
    """Per-training-document contamination report against
    ``eval_docs``: (doc_id, n_grams, n_hits, overlap_ratio,
    contaminated), one row per training document (module docstring for
    the pinned rule)."""
    train_grams = ngram_hashes(train_docs, n)
    block = ngram_hashes(eval_docs, n).select("gram").distinct()
    hits = (
        train_grams.join(block, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    totals = train_grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    return (
        totals.join(hits, "doc_id", "left_outer")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_grams"),
                9,
            ).alias("overlap_ratio"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= 1).alias("contaminated"),
        )
    )


def ngram_novelty(docs: DataFrame, n: int = 5) -> DataFrame:
    """Per-document n-gram NOVELTY — the memorization-risk /
    boilerplate triage the eval-hygiene step's mirror image: instead
    of comparing against a held-out blocklist, each document is scored
    against the REST OF THE CORPUS.  A document whose distinct word
    n-grams mostly appear in other documents is template/boilerplate
    (or a near-copy the pairwise dedup stack should have caught); a
    document whose grams appear nowhere else is novel content.

    Pinned semantics (shared with the DuckDB twin and the python
    oracle): grams are the decontamination stack's distinct md5'd word
    ``n``-grams per document (``ngram_hashes`` — same short-doc floor);
    a gram is NOVEL when exactly ONE document in the corpus contains
    it (doc-frequency 1; counted over distinct-per-doc grams, so
    self-repetition inside one document stays novel);
    novelty_ratio = n_novel / n_grams rounded 9dp.

    Shape (design-for-100x): the (doc_id, gram) stream is linear in
    corpus tokens; doc-frequency is ONE map-side-combinable hash
    aggregate keyed by gram; the verdict joins the df table back to
    the stream on the same gram key — two shuffles total, both on the
    uniformly-distributed md5 key (no hot keys by construction), then
    one per-doc aggregate.  No UDFs, no windows, no driver data.
    Returns (doc_id, n_grams, n_novel, novelty_ratio).
    """
    grams = ngram_hashes(docs, n)
    gdf = grams.groupBy("gram").agg(
        F.count(F.lit(1)).cast("long").alias("gram_docs")
    )
    return (
        grams.join(gdf, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("gram_docs") == 1, 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
        .select(
            "doc_id", "n_grams", "n_novel",
            F.round(
                F.col("n_novel").cast("double")
                / F.col("n_grams").cast("double"), 9
            ).alias("novelty_ratio"),
        )
    )
