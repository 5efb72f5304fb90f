"""Eval-set decontamination: engine vs a python replica of the pinned
rule (normalize → word n-grams → md5 → distinct → any-hit), with a
planted contaminated document."""

import hashlib
import re

from mesos_pregel_spark.functions.decontam import decontaminate, ngram_hashes


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def _grams(text: str, n: int) -> set:
    toks = _norm(text).split(" ")
    hi = max(len(toks) - (n - 1), 1)
    return {
        hashlib.md5(" ".join(toks[i : i + n]).encode()).hexdigest()
        for i in range(hi)
    }


def _oracle(train, eval_docs, n):
    block = set()
    for _i, t in eval_docs:
        block |= _grams(t, n)
    out = {}
    for i, t in train:
        g = _grams(t, n)
        hits = len(g & block)
        out[i] = (
            len(g),
            hits,
            round(hits / len(g), 9),
            hits >= 1,
        )
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_contamination(spark):
    secret = "alpha bravo charlie delta echo foxtrot golf hotel"
    train = [
        (1, f"clean doc one two three four five six seven eight nine ten"),
        (2, f"prefix words {secret} suffix words here now"),
        (3, "short doc"),
        (4, f"  ALPHA   bravo charlie delta echo foxtrot golf hotel  "),
    ]
    evals = [(100, f"the eval set contains {secret} verbatim once")]
    got = {
        r["doc_id"]: (
            r["n_grams"], r["n_hits"], r["overlap_ratio"], r["contaminated"]
        )
        for r in decontaminate(
            _df(spark, train), _df(spark, evals), n=8
        ).collect()
    }
    assert got == _oracle(train, evals, 8)
    assert got[2][3] is True        # planted 8-gram found
    assert got[4][3] is True        # found through normalization
    assert got[1][3] is False
    assert got[3] == (1, 0, 0.0, False)  # short-doc floor: whole text


def test_short_doc_floor(spark):
    """Documents with < n tokens contribute their whole token sequence
    as ONE gram — and can still be contaminated if the eval set has
    the same short text."""
    train = [(1, "tiny text"), (2, "other words")]
    evals = [(9, "tiny text")]
    got = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(
            _df(spark, train), _df(spark, evals), n=8
        ).collect()
    }
    assert got == {1: True, 2: False}


def test_grams_distinct_per_doc(spark):
    """A doc repeating an eval gram scores it once."""
    phrase = "a b c d e f g h"
    train = [(1, f"{phrase} {phrase} {phrase}")]
    evals = [(9, phrase)]
    row = decontaminate(_df(spark, train), _df(spark, evals), n=8).collect()[0]
    expected = _oracle(train, evals, 8)[1]
    assert (
        row["n_grams"], row["n_hits"], row["overlap_ratio"],
        row["contaminated"],
    ) == expected


def test_ngram_hashes_match_python(spark):
    rows = [(1, "one two three four five six seven eight nine")]
    got = {r["gram"] for r in ngram_hashes(_df(spark, rows), n=4).collect()}
    assert got == _grams(rows[0][1], 4)
