"""Sliding-window chunking (functions/packing.py::chunk_windows) vs a
direct python replication of the pinned rule."""

import hashlib
import re

import pytest

from mesos_pregel_spark.functions.packing import chunk_windows


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def _oracle(docs, w, s):
    out = set()
    for i, t in enumerate(docs):
        toks = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        nt = len(toks)
        n_chunks = 1 + (max(nt - w, 0) + s - 1) // s if nt > w else 1
        for c in range(n_chunks):
            start = c * s
            win = toks[start:start + w]
            h = hashlib.md5(" ".join(win).encode()).hexdigest()
            out.add((i, c, start, len(win), h))
    return out


def _collect(df):
    return {
        (r["doc_id"], r["chunk_idx"], r["start_tok"], r["n_tokens"],
         r["chunk_hash"])
        for r in df.collect()
    }


DOCS = [
    "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9",   # 10 tokens
    "a b c",                           # shorter than the window
    "x",                               # single token
    "A  B\tc d e f g h",               # messy whitespace, 8 tokens
]


def test_matches_python_oracle(spark):
    got = _collect(chunk_windows(_df(spark, DOCS), 8, 4))
    assert got == _oracle(DOCS, 8, 4)


def test_exact_coverage_no_tail_drop(spark):
    # nt=10, w=8, s=4: exactly 2 chunks — [0,8) and [4,10); the second
    # window reaches the end, so no third window is emitted
    rows = sorted(
        (r["chunk_idx"], r["start_tok"], r["n_tokens"])
        for r in chunk_windows(_df(spark, [DOCS[0]]), 8, 4)
        .where("doc_id = 0").collect()
    )
    assert rows == [(0, 0, 8), (1, 4, 6)]


def test_every_doc_emits_one_chunk_minimum(spark):
    got = _collect(chunk_windows(_df(spark, DOCS), 8, 4))
    assert {d for d, *_ in got} == set(range(len(DOCS)))


def test_nonoverlapping_when_stride_equals_window(spark):
    got = _collect(chunk_windows(_df(spark, DOCS), 4, 4))
    assert got == _oracle(DOCS, 4, 4)


def test_validation(spark):
    with pytest.raises(ValueError):
        chunk_windows(_df(spark, ["a"]), 4, 5)      # gap would drop tokens
    with pytest.raises(ValueError):
        chunk_windows(_df(spark, ["a"]), 0, 1)
