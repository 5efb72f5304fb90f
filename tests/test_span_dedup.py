"""C4-style span dedup (functions/dedup.py::span_dedup_stats) vs a
direct python replication of the pinned rule (full k-token spans,
md5 span hash, keep-first by (doc_id, pos))."""

import hashlib
import re

from mesos_pregel_spark.functions.dedup import span_dedup_stats

K = 3


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def _norm(t):
    return re.sub(r"\s+", " ", t.lower()).strip()


def _oracle(docs, k=K):
    spans = []          # (doc_id, pos, hash)
    for i, t in enumerate(docs):
        toks = _norm(t).split(" ")
        for p in range(len(toks) // k):
            h = hashlib.md5(
                " ".join(toks[p * k:(p + 1) * k]).encode()
            ).hexdigest()
            spans.append((i, p, h))
    first = {}
    for i, p, h in spans:
        if h not in first or (i, p) < first[h]:
            first[h] = (i, p)
    out = {}
    for i, t in enumerate(docs):
        out[i] = [len(_norm(t).split(" ")) // k, 0]
    for i, p, h in spans:
        if first[h] != (i, p):
            out[i][1] += 1
    return {
        i: (ns, dup, round(dup / ns, 9) if ns else 0.0)
        for i, (ns, dup) in out.items()
    }


def _collect(df):
    return {
        r["doc_id"]: (r["n_spans"], r["dup_spans"], r["dup_ratio"])
        for r in df.collect()
    }


DOCS = [
    "alpha beta gamma delta epsilon zeta",       # 2 spans, both first
    "alpha beta gamma delta epsilon zeta eta",   # ragged tail dropped
    "x y z alpha beta gamma",                    # span 1 dups doc 0's span 0
    "short",                                     # 0 spans
    "ALPHA   beta GAMMA delta epsilon zeta",     # normalizes to doc 0
]


def test_matches_python_oracle(spark):
    got = _collect(span_dedup_stats(_df(spark, DOCS), span_tokens=K))
    want = _oracle(DOCS)
    assert got == want
    # sanity on the fixture itself: doc 1's spans duplicate doc 0's,
    # doc 4 duplicates doc 0 entirely, doc 3 has no full span
    assert want[0] == (2, 0, 0.0)
    assert want[1] == (2, 2, 1.0)
    assert want[2][1] == 1
    assert want[3] == (0, 0, 0.0)
    assert want[4] == (2, 2, 1.0)


def test_keep_first_is_global_min(spark):
    # the same span in three docs: only the lexicographically smallest
    # (doc_id, pos) occurrence is kept
    docs = ["a b c", "z z z a b c", "a b c z z z"]
    got = _collect(span_dedup_stats(_df(spark, docs), span_tokens=3))
    assert got[0] == (1, 0, 0.0)
    assert got[1] == (2, 1, 0.5)      # pos 0 ("z z z") is first; pos 1 dups
    assert got[2] == (2, 2, 1.0)      # both spans seen earlier


def test_span_tokens_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        span_dedup_stats(_df(spark, ["a"]), span_tokens=0)


# ---------------------------------------------------------------------------
# simhash_candidates (functions/dedup.py — banded bucketing over simhash)
# ---------------------------------------------------------------------------


def test_simhash_candidates_pigeonhole_exact(spark):
    """With max_hamming < n_bands the banded join is EXACT: the
    candidate set equals the brute-force Hamming-<=h pair set."""
    from mesos_pregel_spark.functions.dedup import simhash, simhash_candidates

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "entirely different words compose this one text"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "another fully unrelated document body here now"),
        (6, "entirely different words compose this other text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: r["simhash"]
           for r in simhash(docs, bits=32).collect()}
    brute = {
        (a, b, bin(sig[a] ^ sig[b]).count("1"))
        for a in sig for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_candidates(
            docs, bits=32, n_bands=4, max_hamming=3).collect()
    }
    assert got == brute
    # identical docs share the signature -> hamming 0 pair present
    assert (1, 4, 0) in got


def test_dedup_report_consistency(spark):
    """The one-row report's counters agree with the stage outputs it
    summarizes, at the fixture scale."""
    from mesos_pregel_spark.functions.dedup import exact_duplicates
    from mesos_pregel_spark.queries_text import (
        _dedup_clusters,
        _dedup_report,
        _docs,
    )

    sf = "/root/testdata/sf0.001"
    row = _dedup_report(spark, sf).collect()[0]
    docs = _docs(spark, sf)
    assert row["n_docs"] == docs.count()
    ed = exact_duplicates(docs)
    assert row["n_exact_dups"] == ed.where("is_duplicate").count()
    clu = _dedup_clusters(spark, sf)
    assert row["n_near_members"] == clu.count()
    assert row["n_near_dropped"] == clu.where("NOT keep").count()
    # the sf0.001 fixture carries near-dups but no byte-exact dups —
    # the counters must agree either way
    assert 0 <= row["chars_in_exact_dups"] < row["chars_total"]
    assert (row["chars_in_exact_dups"] == 0) == (row["n_exact_dups"] == 0)


def test_quality_vs_dup_buckets_partition_corpus(spark):
    """The three buckets partition the corpus, and each mean is the
    exact nano-snapped group mean."""
    from mesos_pregel_spark.functions.text import quality_score
    from mesos_pregel_spark.queries_text import (
        _dedup_clusters,
        _docs,
        _quality_vs_dup,
    )

    sf = "/root/testdata/sf0.001"
    out = {r["bucket"]: r for r in _quality_vs_dup(spark, sf).collect()}
    docs = _docs(spark, sf)
    assert sum(r["n_docs"] for r in out.values()) == docs.count()
    # python replication of one bucket's mean
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    keep = {r["doc_id"]: r["keep"]
            for r in _dedup_clusters(spark, sf).collect()}
    dropped = [round(q[d] * 1e9) for d in q if d in keep and not keep[d]]
    assert out["dropped"]["n_docs"] == len(dropped)
    assert out["dropped"]["mean_quality"] == round(
        (sum(dropped) / 1e9) / len(dropped), 9)
