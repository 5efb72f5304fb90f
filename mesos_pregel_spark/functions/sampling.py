"""Deterministic corpus sampling for training-data mixes: stratified
rate sampling and per-stratum token-budget downsampling.

A 100-TB pretraining pipeline rarely ships the raw corpus — it ships a
MIX: per-source/per-language rates, or "cap every language at B
tokens".  Both are one-scan operators here, and both are DERANDOMIZED
so runs are reproducible and exactly oracle-checkable:

- The per-document uniform is ``u(doc) = int(first 12 hex of
  md5(seed || ':' || doc_id)) / 2^48`` ∈ [0, 1) — a 48-bit dyadic
  rational, exactly representable in a double, computed identically by
  Spark (``conv(substr(md5(..), 1, 12), 16, 10)``) and DuckDB
  (``('0x' || substr(..)) :: BIGINT``).  A document's keep/drop
  decision is a pure function of (seed, doc_id, its stratum's rate):
  stable under repartitioning, re-runs, and engine choice — the same
  trick as the derandomized walk sampler (algos/walks.py).
- ``sample_to_token_budget`` derives the rates FROM the data: one
  tiny per-stratum aggregate (#strata rows — languages/sources, not
  documents), broadcast back over the scan.  rate = min(1, budget /
  stratum_tokens) is a single IEEE double division, identical across
  engines.

Scale shape: ``stratified_sample`` is a pure filter over the scan (no
shuffle at all — the rates ship as a literal CASE).  The budget
variant is one map-side-combinable aggregate producing O(#strata) rows
+ one broadcast join + the same filter; nothing is ever collected per
document.  Sampling DECISIONS never look at text — only doc_id and the
stratum column — so column pruning keeps the scan narrow when the
caller only needs ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mesos_pregel_spark.functions.text import tokens_col

_U_DENOM = float(2**48)


def uniform_col(seed: str, key: Column) -> Column:
    """The pinned 48-bit md5 uniform in [0, 1) (module docstring)."""
    h12 = F.substring(
        F.md5(F.concat_ws(":", F.lit(seed), key.cast("string"))), 1, 12
    )
    return F.conv(h12, 16, 10).cast("long") / F.lit(_U_DENOM)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    seed: str = "sample42",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each document with its stratum's probability,
    deterministically: kept ⟺ u(doc) < rate(stratum).  ``rates`` maps
    stratum value → rate in [0, 1]; strata absent from the map get
    ``default_rate`` (0 = drop, the conservative default for unknown
    sources).  Returns the kept (doc_id, stratum, u) rows — ``u`` is
    exact (dyadic), so downstream consumers can re-thin to any
    SMALLER rate without re-hashing (u < r' ⊆ u < r: nested samples
    for free, the standard hash-sampling trick)."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(float(r))).otherwise(
            rate
        )
    u = uniform_col(seed, F.col("doc_id"))
    return (
        docs.select(
            "doc_id",
            F.col(stratum_col).alias("stratum"),
            u.alias("u"),
            rate.alias("rate"),
        )
        .where(F.col("u") < F.col("rate"))
        .select("doc_id", "stratum", "u")
    )


def sample_to_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    stratum_col: str = "lang",
    seed: str = "budget42",
) -> DataFrame:
    """Downsample every stratum to an expected ``budget_tokens``
    tokens: rate_s = min(1, budget / tokens_s), keep ⟺ u(doc) <
    rate_s.  Token counts use the engine's pinned tokenization
    (functions/text.py), so the budget is measured in the same units
    as token_stats.  Returns kept (doc_id, stratum, n_tokens, rate)
    rows.

    The per-stratum rate table is O(#strata) rows from one map-side
    combinable sum — broadcast explicitly: at any corpus scale the
    stratum table is languages or sources, never documents."""
    with_tokens = docs.select(
        "doc_id",
        F.col(stratum_col).alias("stratum"),
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    totals = with_tokens.groupBy("stratum").agg(
        F.sum("n_tokens").alias("stratum_tokens")
    )
    rates = totals.select(
        "stratum",
        F.least(
            F.lit(1.0),
            F.lit(float(budget_tokens)) / F.col("stratum_tokens").cast("double"),
        ).alias("rate"),
    )
    u = uniform_col(seed, F.col("doc_id"))
    return (
        with_tokens.join(F.broadcast(rates), "stratum")
        .where(u < F.col("rate"))
        .select("doc_id", "stratum", "n_tokens", "rate")
    )
