"""BM25 top-k (functions/text.py::bm25_topk): python replication of
the pinned formula plus the two properties the operator exists for —
tf saturation (k1) and document-length normalization (b)."""

import math

from mesos_pregel_spark.functions.text import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_bm25(rows, n_query_terms, topk, k1=1.2, b=0.75):
    import re

    toks = {
        d: [t for t in re.sub(r"\s+", " ", txt.lower()).strip().split(" ")
            if t != ""]
        for d, txt in rows
    }
    n_docs = len(rows)
    total = sum(len(ts) for ts in toks.values())
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    q = sorted(df, key=lambda t: (-df[t], t))[:n_query_terms]
    avgdl6 = round(total / n_docs, 6)
    agg = {}
    for d, ts in toks.items():
        if not ts:
            continue
        r6 = round(len(ts) / avgdl6, 6)
        sum_micro, hits = 0, 0
        for t in q:
            tf = ts.count(t)
            if tf == 0:
                continue
            idf6 = round(math.log((n_docs - df[t] + 0.5)
                                  / (df[t] + 0.5) + 1.0), 6)
            contrib = idf6 * ((tf * 2.2)
                              / (tf + 1.2 * (0.25 + 0.75 * r6)))
            sum_micro += int(round(contrib * 1e6))
            hits += 1
        if hits:
            agg[d] = (hits, sum_micro)
    order = sorted(agg, key=lambda d: (-agg[d][1], d))[:topk]
    return [
        (r + 1, d, agg[d][0], round(agg[d][1] / 1e6, 6))
        for r, d in enumerate(order)
    ]


ROWS = [
    (1, "the cat sat on the mat near the cat"),
    (2, "the dog ate the cat food and the dog slept"),
    (3, "quantum flux capacitors hum the song of the void"),
    (4, "cat cat cat cat cat cat cat cat cat cat cat cat"),
    (5, ""),
    (6, "the the the the"),
    (7, "a short cat note"),
]


def test_matches_python_replication(spark):
    got = [
        (r["rank"], r["doc_id"], r["n_hits"], r["score"])
        for r in bm25_topk(_docs(spark, ROWS), n_query_terms=3, topk=10)
        .orderBy("rank").collect()
    ]
    assert got == _py_bm25(ROWS, 3, 10)


def test_tf_saturation(spark):
    """k1 caps the tf contribution: a doc repeating the query term 12
    times must score less than 12x a single occurrence's contribution
    (the saturation property BM25 adds over raw tf)."""
    rows = [
        (1, "cat"),
        (2, "cat " * 12),
        (3, "dog bird fish"),
    ]
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(_docs(spark, rows), n_query_terms=1,
                           topk=10).collect()
    }
    assert out[2] > out[1]
    assert out[2] < 12 * out[1]


def test_length_normalization(spark):
    """b penalizes long documents: same single query-term occurrence,
    the doc padded with off-query terms scores lower."""
    rows = [
        (1, "cat alpha beta"),
        (2, "cat " + " ".join(f"pad{i}" for i in range(30))),
        (3, "cat gamma"),
    ]
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(_docs(spark, rows), n_query_terms=1,
                           topk=10).collect()
    }
    assert out[1] > out[2] or out[3] > out[2]
    assert out[2] < out[1] and out[2] < out[3]


def test_empty_docs_never_rank(spark):
    out = bm25_topk(_docs(spark, ROWS), n_query_terms=3, topk=10).collect()
    assert all(r["doc_id"] != 5 for r in out)
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))


# ---------------------------------------------------------------------------
# approx_vocab (FM-sketch distinct counting; functions/text.py)
# ---------------------------------------------------------------------------


def _py_fm_vocab(rows, k, seed):
    import hashlib
    import re

    terms = {}
    for src, txt in rows:
        for t in re.sub(r"\s+", " ", txt.lower()).strip().split(" "):
            if t:
                terms.setdefault(src, set()).add(t)
    out = {}
    for src, ts in terms.items():
        masks = []
        for j in range(k):
            m = 0
            for t in ts:
                h = int(hashlib.md5(
                    f"{seed}:{j}:{t}".encode()).hexdigest()[:12], 16)
                m |= (1 << 48) if h == 0 else (h & -h)
            masks.append(m)
        s = sum(((~m) & (m + 1)).bit_length() - 1 for m in masks)
        i, frac = s // k, s % k
        est = round((1 << i) * (2.0 ** (frac / k)) / 0.77351, 6)
        out[src] = (len(ts), est, round((est - len(ts)) / len(ts), 6))
    return out


def test_approx_vocab_matches_python(spark):
    from mesos_pregel_spark.functions.text import approx_vocab

    rows = [
        ("a", "alpha beta gamma delta epsilon zeta eta theta"),
        ("a", "iota kappa lambda mu nu xi omicron pi rho sigma"),
        ("b", "one two three one two three"),
        ("c", " ".join(f"w{i}" for i in range(200))),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["source"]: (r["exact_distinct"], r["fm_estimate"], r["rel_error"])
        for r in approx_vocab(docs, k=4, seed="vocab42").collect()
    }
    assert got == _py_fm_vocab(rows, 4, "vocab42")
    # the sketch estimate must be within an order of magnitude of
    # exact on every source (FM with k=4 registers is coarse but sane)
    for exact, est, _err in got.values():
        assert exact / 10 < est < exact * 10
