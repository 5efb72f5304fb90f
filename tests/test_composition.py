"""Corpus-composition operators (functions/composition.py) vs
hand-computed values on a toy corpus."""

import math

import pytest

from mesos_pregel_spark.functions.composition import (
    length_histogram,
    source_mix,
    vocab_stats,
)


def _docs(spark):
    rows = [
        (1, "a b c d", "en", "web", 7),
        (2, "a a b", "en", "web", 5),
        (3, "x y", "en", "books", 3),
        (4, "a  B\tc", "en", "books", 6),   # messy whitespace + case
        (5, "zz", "en", "code", 2),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_source_mix_hand(spark):
    got = {r["source"]: r for r in source_mix(_docs(spark)).collect()}
    # tokens: web 4+3=7, books 2+3=5, code 1; total 13
    assert got["web"]["n_docs"] == 2 and got["web"]["n_tokens"] == 7
    assert got["books"]["n_tokens"] == 5
    assert got["code"]["n_tokens"] == 1
    assert got["web"]["token_share"] == round(7 / 13, 9)
    w = {s: round(math.sqrt(t) * 1e6) for s, t in
         {"web": 7, "books": 5, "code": 1}.items()}
    tot = sum(w.values())
    for s in w:
        assert got[s]["mix_weight"] == round(w[s] / tot, 9), s
    # temperature flattening: sqrt weights are closer together
    assert got["code"]["mix_weight"] > got["code"]["token_share"]
    assert got["web"]["mix_weight"] < got["web"]["token_share"]


def test_source_mix_alpha_pinned(spark):
    with pytest.raises(ValueError):
        source_mix(_docs(spark), alpha=0.7)


def test_vocab_stats_hand(spark):
    row = vocab_stats(_docs(spark)).collect()[0]
    # tokens: a×4 b×3 c×2 d×1 x×1 y×1 zz×1  (B lowercased to b)
    assert row["total_tokens"] == 13
    assert row["vocab_size"] == 7
    assert row["hapax"] == 4
    assert row["type_token_ratio"] == round(7 / 13, 9)


def test_length_histogram_hand(spark):
    got = {r["bucket"]: (r["n_docs"], r["sum_tokens"])
           for r in length_histogram(_docs(spark)).collect()}
    # doc token counts: 4,3,2,3,1 → buckets 2,1,1,1,0
    assert got == {2: (1, 4), 1: (3, 8), 0: (1, 1)}
