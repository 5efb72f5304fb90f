"""Unigram-LM fluency score (functions/text.py::unigram_logprob) vs a
python replication of the pinned model: add-one-smoothed corpus
unigram counts, integer micro-nat per-token log-probs (exact
order-independent sums), mean negative log-prob rounded at 6dp."""

import math
import re
from collections import Counter

from mesos_pregel_spark.functions.text import unigram_logprob


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def _tokens(text):
    return [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ")
            if t]



def _half_away(x):
    """Round half away from zero — Spark's and DuckDB's ROUND rule
    (python's round() is banker's and diverges on exact .5 boundaries,
    which integer micro-nat sums divided by small n DO hit: verified
    against both engines on 8058483/6e6 = 1.3430805 -> 1.343081)."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _round6(x):
    return _half_away(x * 1e6) / 1e6


def _oracle(docs):
    cnt = Counter()
    for t in docs:
        cnt.update(_tokens(t))
    total, vocab = sum(cnt.values()), len(cnt)
    micro = {
        w: _half_away(math.log((c + 1) / (total + vocab)) * 1e6)
        for w, c in cnt.items()
    }
    out = {}
    for i, t in enumerate(docs):
        toks = _tokens(t)
        if not toks:
            continue
        s = sum(micro[w] for w in toks)
        out[i] = (len(toks), _round6(-s / (len(toks) * 1e6)))
    return out


DOCS = [
    "the cat sat on the mat",
    "the the the the",                       # stopword soup: lowest nll
    "zygomorphic quetzalcoatlus apocrypha",  # rare-token soup: highest nll
    "   ",                                   # zero tokens: no output row
    "The CAT   sat\ton the mat",             # normalizes to doc 0's tokens
]


def test_matches_python_oracle(spark):
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll"])
        for r in unigram_logprob(_df(spark, DOCS)).collect()
    }
    assert got == _oracle(DOCS)


def test_fluency_ordering_and_empty_doc(spark):
    got = {
        r["doc_id"]: r["nll"]
        for r in unigram_logprob(_df(spark, DOCS)).collect()
    }
    assert 3 not in got                     # zero-token doc emits no row
    assert got[1] < got[0] < got[2]         # repeated < prose < rare soup
    assert got[4] == got[0]                 # normalization-equal texts tie


def _bigram_oracle(docs):
    from mesos_pregel_spark.functions.text import bigram_logprob  # noqa: F401
    cnt = Counter()
    big = Counter()
    for t in docs:
        toks = _tokens(t)
        cnt.update(toks)
        big.update(zip(toks, toks[1:]))
    total, vocab = sum(cnt.values()), len(cnt)
    out = {}
    for i, t in enumerate(docs):
        toks = _tokens(t)
        if not toks:
            continue
        s = _half_away(math.log((cnt[toks[0]] + 1) / (total + vocab)) * 1e6)
        for a, b in zip(toks, toks[1:]):
            s += _half_away(
                math.log((big[(a, b)] + 1) / (cnt[a] + vocab)) * 1e6)
        out[i] = (len(toks), _round6(-s / (len(toks) * 1e6)))
    return out


def test_bigram_matches_python_oracle(spark):
    from mesos_pregel_spark.functions.text import bigram_logprob

    got = {
        r["doc_id"]: (r["n_tokens"], r["nll"])
        for r in bigram_logprob(_df(spark, DOCS)).collect()
    }
    assert got == _bigram_oracle(DOCS)


def test_bigram_rewards_predictable_sequences(spark):
    from mesos_pregel_spark.functions.text import bigram_logprob

    # same unigram distribution, different bigram structure: the
    # repeated phrase must score lower nll than the shuffled one
    docs = ["a b a b a b a b", "a a b b b a a b", "a b", "b a"]
    got = {
        r["doc_id"]: r["nll"]
        for r in bigram_logprob(_df(spark, docs)).collect()
    }
    assert got[0] < got[1]
    # single-bigram docs: "a b" occurs 5x in corpus, "b a" 4x
    assert got[2] < got[3]
