"""tf-idf top-k (functions/text.py::tfidf_topk): hand-checked scores
and a python replication of the pinned formula."""

import math

from mesos_pregel_spark.functions.text import tfidf_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_tfidf(rows, k):
    import re
    toks = {
        d: [t for t in re.sub(r"\s+", " ", txt.lower()).strip().split(" ")
            if t != ""]
        for d, txt in rows
    }
    n = len(rows)
    df = {}
    for d, ts in toks.items():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for d, ts in toks.items():
        tf = {}
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            (
                (-round(c * round(math.log((n + 1) / (df[t] + 1)) + 1.0, 6),
                        6), t)
                for t, c in tf.items()
            )
        )[:k]
        out[d] = [(r + 1, t, -s) for r, (s, t) in enumerate(scored)]
    return out


def test_matches_python_replication(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog ate the cat food"),
        (3, "quantum flux capacitors hum the song"),
        (4, "cat cat cat dog"),
        (5, ""),
    ]
    got = {}
    for r in tfidf_topk(_docs(spark, rows), k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["score"])
        )
    for d in got:
        got[d].sort()
    exp = _py_tfidf(rows, k=3)
    exp = {d: v for d, v in exp.items() if v}  # empty doc emits no rows
    assert got == exp


def test_rare_term_outranks_common(spark):
    rows = [
        (1, "alpha beta"),
        (2, "alpha gamma"),
        (3, "alpha delta"),
    ]
    got = {
        (r["doc_id"], r["rank"]): r["term"]
        for r in tfidf_topk(_docs(spark, rows), k=2).collect()
    }
    # 'alpha' is in every doc (df=3, idf=1+ln(4/4)=1); each rare term
    # has idf 1+ln(2) > 1, so it ranks first in its doc.
    assert got[(1, 1)] == "beta" and got[(1, 2)] == "alpha"
    assert got[(2, 1)] == "gamma"
    assert got[(3, 1)] == "delta"
