"""Concat-and-chunk sequence packing — the example-construction step
of an LLM pre-training pipeline: documents of a stratum are
concatenated in a pinned order and the token stream is cut into
fixed-size training chunks.  (This is the packing real pipelines run —
documents DO split across chunk boundaries; greedy no-split bin
packing is a different, sequential recurrence and deliberately not
this operator.)

Pinned semantics (exact DuckDB window twin in queries_text.py):

- token count per doc = the pinned tokenization (functions/text.py);
- order within a stratum = doc_id ascending (total, stable);
- start_tok(doc) = running sum of preceding docs' token counts;
  first_chunk = start_tok // chunk_tokens,
  last_chunk  = (start_tok + n_tokens - 1) // chunk_tokens
  (empty docs take first_chunk with 0 span).

All integer arithmetic — hash-exact across engines.

Execution shape (design-for-100x): ONE window cumsum per stratum
partition plus a projection — a single exchange on the stratum key,
no join, no iteration.  Strata (source shards) are independent, so
the operator parallelizes across them exactly the way production
packing shards do; within a stratum the window sort is the stable
doc-order contract, which a real lake gets for free from sorted
bucketed layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mesos_pregel_spark.functions.text import tokens_col


def pack_concat(
    docs: DataFrame,
    chunk_tokens: int = 512,
    stratum_col: str = "source",
) -> DataFrame:
    """Per-document chunk spans under concat-and-chunk packing.

    Returns (doc_id, stratum, n_tokens, start_tok, first_chunk,
    last_chunk, n_chunks_spanned)."""
    n_tokens = F.size(tokens_col(F.col("text"))).cast("long")
    with_counts = docs.select(
        "doc_id",
        F.col(stratum_col).alias("stratum"),
        n_tokens.alias("n_tokens"),
    ).select(
        "doc_id",
        "stratum",
        "n_tokens",
        (F.sum("n_tokens").over(
            Window.partitionBy("stratum")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - F.col("n_tokens")).alias("start_tok"),
    )
    # integer division (`div`), not double `/` + cast: double rounding
    # can misplace a chunk boundary for non-power-of-two chunk sizes
    # once offsets pass 2^53 — real at 100-TB token streams.
    first_chunk = F.expr(f"start_tok div {int(chunk_tokens)}")
    last_chunk = F.expr(
        f"(start_tok + greatest(n_tokens - 1, 0)) div {int(chunk_tokens)}"
    )
    return with_counts.select(
        "doc_id",
        "stratum",
        "n_tokens",
        "start_tok",
        first_chunk.alias("first_chunk"),
        last_chunk.alias("last_chunk"),
        (last_chunk - first_chunk + 1).alias("n_chunks_spanned"),
    )
