"""Winnowing fingerprints (functions/dedup.py::winnow_fingerprints)
vs a direct python replication of the pinned rule, plus the MOSS
guarantee: documents sharing a substring of length >= w + k - 1 share
at least one fingerprint."""

import hashlib
import re

from mesos_pregel_spark.functions.dedup import winnow_fingerprints

K, W = 5, 4


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def _norm(t):
    return re.sub(r"\s+", " ", t.lower()).strip()


def _oracle(docs, k=K, w=W):
    out = set()
    for i, t in enumerate(docs):
        norm = _norm(t)
        n = max(len(norm) - (k - 1), 1)
        hs = [hashlib.md5(norm[p - 1:p - 1 + k].encode()).hexdigest()
              for p in range(1, n + 1)]
        for s in range(1, n + 1):
            win = range(s, min(s + w - 1, n) + 1)
            # min hash, rightmost position on ties
            best = min(win, key=lambda p: (hs[p - 1], -p))
            out.add((i, best, hs[best - 1]))
    return out


def _collect(df):
    return {(r["doc_id"], r["pos"], r["fp"]) for r in df.collect()}


DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "lorem ipsum the quick brown fox dolor sit amet",
    "aaaaaaaaaaaa",          # all grams identical: tie-break exercise
    "tiny",                  # shorter than k: single whole-text gram
    "The  QUICK brown fox jumps over the lazy dog",  # normalizes to doc 0
]


def test_matches_python_oracle(spark):
    assert _collect(winnow_fingerprints(_df(spark, DOCS), K, W)) == \
        _oracle(DOCS)


def test_moss_guarantee_and_normalization(spark):
    got = _collect(winnow_fingerprints(_df(spark, DOCS), K, W))
    by_doc = {}
    for d, p, fp in got:
        by_doc.setdefault(d, set()).add(fp)
    # docs 0 and 1 share "the quick brown fox" (19 chars >= w+k-1 = 8)
    assert by_doc[0] & by_doc[1]
    # normalization-equal docs have identical fingerprint sets
    assert by_doc[0] == by_doc[4]
    # all-identical grams: exactly one distinct fingerprint hash
    assert len(by_doc[2]) == 1
    # sub-k doc: one row, position 1
    assert {(p, len(fp)) for d, p, fp in got if d == 3} == {(1, 32)}


def test_overlap_candidates(spark):
    from mesos_pregel_spark.functions.dedup import overlap_candidates

    shared = "a long shared passage that both documents quote verbatim"
    docs = [
        "first document begins here " + shared + " then diverges alpha",
        "second one opens differently " + shared + " and ends with beta",
        # candidate discovery is gram-level: keep the controls free of
        # any 5-char overlap with each other or the pair above
        "zzqzz qqzqq zqzqz qzqzq zzzqq",
        "wvwwv vvwvv wvvvw vwvwv wwwvv",
    ]
    got = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in overlap_candidates(_df(spark, docs), K, W).collect()
    }
    assert (0, 1) in got and got[(0, 1)] >= 2   # the quoting pair
    for pair in got:                            # no unrelated pair slips in
        assert pair == (0, 1)


def test_overlap_cap_drops_stop_grams(spark):
    from mesos_pregel_spark.functions.dedup import overlap_candidates

    # every doc shares the ubiquitous prefix: with cap below the doc
    # count, those fps are stop-grams and no pair may form from them
    docs = [f"common prefix shared by all then unique tail {i} {i} {i}"
            for i in range(8)]
    got = overlap_candidates(_df(spark, docs), K, W, cap=7).collect()
    prefix_only = overlap_candidates(_df(spark, docs), K, W, cap=50).collect()
    assert len(got) == 0          # capped: ubiquitous fps dropped
    assert len(prefix_only) > 0   # uncapped control: pairs exist
