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


def _oracle(docs):
    cnt = Counter()
    for t in docs:
        cnt.update(_tokens(t))
    total, vocab = sum(cnt.values()), len(cnt)
    micro = {
        w: int(round(math.log((c + 1) / (total + vocab)) * 1e6))
        for w, c in cnt.items()
    }
    out = {}
    for i, t in enumerate(docs):
        toks = _tokens(t)
        if not toks:
            continue
        s = sum(micro[w] for w in toks)
        out[i] = (len(toks), round(-s / (len(toks) * 1e6), 6))
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
