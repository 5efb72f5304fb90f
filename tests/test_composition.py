"""Corpus-composition operators (functions/composition.py) vs
hand-computed values on a toy corpus."""

import math

import pytest

from mesos_pregel_spark.functions.composition import (
    length_histogram,
    source_kl,
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


def _oracle_source_kl(rows):
    """Exact-recipe replication: micro-nat snap per (source, term)
    BEFORE summation, one final division."""
    import re
    from collections import Counter, defaultdict

    st = Counter()
    for _, text, _, src, _ in rows:
        toks = [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ")
                if t]
        for t in toks:
            st[(src, t)] += 1
    n_s = defaultdict(int)
    c_t = defaultdict(int)
    terms = defaultdict(int)
    for (s_, t), c in st.items():
        n_s[s_] += c
        c_t[t] += c
        terms[s_] += 1
    n = sum(n_s.values())
    out = {}
    for s_ in n_s:
        tot = 0
        for (s2, t), c in st.items():
            if s2 != s_:
                continue
            lr = math.log((float(c) * n) / (float(c_t[t]) * n_s[s_]))
            micro = int(math.floor(lr * 1e6 + 0.5)) if lr >= 0 else \
                -int(math.floor(-lr * 1e6 + 0.5))
            tot += c * micro
        out[s_] = (n_s[s_], terms[s_], round(tot / (n_s[s_] * 1e6), 9))
    return out


def test_source_kl_matches_recipe_oracle(spark):
    rows = [
        (1, "a b c d", "en", "web", 7),
        (2, "a a b", "en", "web", 5),
        (3, "x y", "en", "books", 3),
        (4, "a  B\tc", "en", "books", 6),
        (5, "zz", "en", "code", 2),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["source"]: (r["n_tokens"], r["n_terms"], r["kl"])
        for r in source_kl(df).collect()
    }
    assert got == _oracle_source_kl(rows)
    # a source whose vocabulary IS the corpus blend has near-zero KL;
    # the single-doc rare-token source diverges most
    assert got["code"][2] > got["web"][2]


def test_source_kl_single_source_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en", "web", 5), (2, "a d", "en", "web", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = source_kl(df).collect()
    assert len(rows) == 1 and rows[0]["kl"] == 0.0


def test_source_kl_nonnegative(spark):
    for r in source_kl(_docs(spark)).collect():
        assert r["kl"] >= -1e-6


def test_ngram_hotspots_hand(spark):
    from mesos_pregel_spark.functions.composition import ngram_hotspots

    docs = [
        (1, "the quick brown fox", "en", "web", 0),
        (2, "the quick brown dog", "en", "web", 0),
        (3, "THE  quick brown fox", "en", "web", 0),   # normalizes to doc 1
        (4, "xy", "en", "web", 0),                     # shorter than n=3
    ]
    df = spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [(r["ngram"], r["cnt"], r["n_docs"])
           for r in ngram_hotspots(df, n=3, top_k=10).collect()]
    assert got == [
        ("the quick brown", 3, 3),
        ("quick brown fox", 2, 2),
        ("quick brown dog", 1, 1),
    ]


def test_ngram_hotspots_tie_order_and_limit(spark):
    from mesos_pregel_spark.functions.composition import ngram_hotspots

    docs = [(1, "b b", "en", "w", 0), (2, "a a", "en", "w", 0)]
    df = spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [r["ngram"] for r in ngram_hotspots(df, n=2, top_k=1).collect()]
    assert got == ["a a"]       # tie on (cnt, n_docs) breaks to string asc


def _oracle_pmi(texts, min_count, top_k):
    """Exact-recipe replication of pmi_topk (contingency-table PMI,
    micro-nat snap, all-integer ordering)."""
    import re
    from collections import Counter

    bg = Counter()
    for t in texts:
        toks = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    n_b = sum(bg.values())
    r_x = Counter()
    c_y = Counter()
    for (a, b), c in bg.items():
        r_x[a] += c
        c_y[b] += c
    rows = []
    for (a, b), c in bg.items():
        if c < min_count:
            continue
        lr = math.log((float(c) * float(n_b))
                      / (float(r_x[a]) * float(c_y[b])))
        micro = int(_half_up(lr * 1e6))
        rows.append((a, b, c, micro))
    rows.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    return [(a, b, c, m / 1e6) for a, b, c, m in rows[:top_k]]


def _half_up(x):
    import decimal
    return decimal.Decimal(x).quantize(0, rounding=decimal.ROUND_HALF_UP)


def test_pmi_topk_collocation_outranks_common_pair(spark):
    """'new york' (always together) must outrank 'the cat' (both parts
    promiscuous) even though 'the cat' is more frequent."""
    from mesos_pregel_spark.functions.composition import pmi_topk

    texts = (
        ["flights to new york today"] * 3
        + ["the cat sat", "the cat ran", "the dog sat", "the cat hid",
           "a cat the dog saw"]
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in pmi_topk(df, min_count=3, top_k=50).collect()]
    assert got == _oracle_pmi(texts, 3, 50)
    scores = {(r[0], r[1]): r[3] for r in got}
    assert scores[("new", "york")] > scores[("the", "cat")]


def test_pmi_topk_matches_recipe_oracle(spark):
    """Deterministic messy corpus vs the exact-recipe python oracle,
    min_count=1 so every pair (incl. negatives/ties) is compared."""
    from mesos_pregel_spark.functions.composition import pmi_topk

    texts = [
        "a b a b a c", "b a  B\tc", "c c c a", "x", "", "a b c a b",
        "y z y z", "z y x w", "w w w w w",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in pmi_topk(df, min_count=1, top_k=1000).collect()]
    assert got == _oracle_pmi(texts, 1, 1000)


def test_pmi_topk_min_count_and_short_docs(spark):
    """Sub-2-token docs emit nothing; min_count filters hapax pairs."""
    from mesos_pregel_spark.functions.composition import pmi_topk

    df = spark.createDataFrame(
        [(0, "solo"), (1, ""), (2, "p q"), (3, "p q"), (4, "q r")],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in pmi_topk(df, min_count=2, top_k=10).collect()]
    assert [(r[0], r[1], r[2]) for r in got] == [("p", "q", 2)]
    with pytest.raises(ValueError):
        pmi_topk(df, min_count=0)


def _oracle_heaps(texts_by_doc_id):
    """Exact-recipe replication of heaps_law (global doc_id-ordered
    running totals, micro-nat snap, exact-integer regression sums)."""
    import re

    def toks(t):
        s = re.sub(r"\s+", " ", t.lower()).strip()
        return [w for w in s.split(" ") if w != ""]

    seen = set()
    n = v = 0
    pts = []
    tot_nt = tot_nv = 0
    for _, t in sorted(texts_by_doc_id):
        ws = toks(t)
        new = [w for w in ws if w not in seen and not seen.add(w)]
        n += len(ws)
        v += len(new)
        tot_nt += len(ws)
        tot_nv += len(new)
        if n > 0 and v > 0:
            pts.append((int(_half_up(math.log(float(n)) * 1e6)),
                        int(_half_up(math.log(float(v)) * 1e6))))
    cnt = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sx2 = sum(p[0] * p[0] for p in pts)
    den = float(cnt) * float(sx2) - float(sx) * float(sx)
    if den != 0:
        beta = round((float(cnt) * float(sxy) - float(sx) * float(sy))
                     / den, 9)
        ln_k = round((float(sy) - beta * float(sx))
                     / (float(cnt) * 1e6), 9)
    else:
        beta = ln_k = None
    return (cnt, tot_nt, tot_nv, beta, ln_k)


def _heaps_run(spark, rows, partitions=None):
    from mesos_pregel_spark.functions.composition import heaps_law

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = heaps_law(df, partitions=partitions).collect()
    assert len(out) == 1
    r = out[0]
    return (r["n_points"], r["total_tokens"], r["vocab_size"],
            r["beta"], r["ln_k"])


def test_heaps_law_all_new_singletons_beta_one(spark):
    """Every doc = one never-seen token: V == N, so ln V = ln N exactly
    -> beta 1, ln_k 0."""
    rows = [(i, f"w{i}") for i in range(20)]
    got = _heaps_run(spark, rows)
    assert got == _oracle_heaps(rows)
    assert got[3] == 1.0 and got[4] == 0.0


def test_heaps_law_constant_vocab_beta_zero(spark):
    """Same single token forever: V == 1, y == 0 constant -> beta 0,
    ln_k 0 (K = 1)."""
    rows = [(i, "same") for i in range(16)]
    got = _heaps_run(spark, rows)
    assert got == _oracle_heaps(rows)
    assert got[3] == 0.0 and got[4] == 0.0


def test_heaps_law_matches_recipe_oracle(spark):
    rows = [
        (0, "a b c"), (1, ""), (2, "a b d e"), (3, "f"), (4, "a a a"),
        (5, "g h i j k"), (6, "b c g  Z\tz"), (7, "m"), (8, "a m n"),
    ]
    for parts in (1, 3, 8):
        assert _heaps_run(spark, rows, partitions=parts) == \
            _oracle_heaps(rows)


def test_heaps_law_degenerate_single_point(spark):
    got = _heaps_run(spark, [(0, "only doc here")])
    assert got[0] == 1 and got[3] is None and got[4] is None


def _oracle_textrank(texts, k=4, min_len=3):
    """Exact-recipe replication of functions/composition.py::textrank
    (pinned tokenization, length-gated adjacent pairs, canonicalized
    undirected weights, 4-step weighted PageRank, 9-dp round)."""
    import re
    from collections import Counter

    und = Counter()
    for t in texts:
        toks = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        for a, b in zip(toks, toks[1:]):
            if len(a) >= min_len and len(b) >= min_len and a != b:
                und[(min(a, b), max(a, b))] += 1
    edges = {}
    for (a, b), w in und.items():
        edges[(a, b)] = float(w)
        edges[(b, a)] = float(w)
    verts = {v for p in edges for v in p}
    n = float(len(verts))
    wout = Counter()
    for (s, _d), w in edges.items():
        wout[s] += w
    pr = {v: 1.0 / n for v in verts}
    for _ in range(k):
        agg = {v: 0.0 for v in verts}
        for (s, d), w in edges.items():
            agg[d] += pr[s] * w / wout[s]
        pr = {v: (1.0 - 0.85) / n + 0.85 * agg[v] for v in verts}
    return {v: round(p, 9) for v, p in pr.items()}


def test_textrank_matches_recipe_oracle(spark):
    from mesos_pregel_spark.functions.composition import textrank

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "quick brown foxes love quick brown dogs",
        "graph ranking ranks graph words by graph structure",
        "ranking words  with\tgraph   structure", "x y", "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["token"]: r["textrank"] for r in textrank(df).collect()}
    assert got == _oracle_textrank(texts)


def test_textrank_hub_word_outranks_leaf(spark):
    """A word co-occurring with many distinct words must outrank a
    word that appears only once at the corpus edge."""
    from mesos_pregel_spark.functions.composition import textrank

    texts = [
        "graph theory", "graph algebra", "graph mining", "graph walks",
        "graph systems", "lonely sentinel",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["token"]: r["textrank"] for r in textrank(df).collect()}
    assert got["graph"] > got["theory"]
    assert got["graph"] > got["lonely"]
    # short tokens are gated out of the graph entirely
    assert "x" not in got and "y" not in got


def test_textrank_short_token_gate(spark):
    """Pairs survive only when BOTH sides pass the length gate; a doc
    of all-short tokens contributes no vertices."""
    from mesos_pregel_spark.functions.composition import textrank

    df = spark.createDataFrame(
        [(0, "a bb very long words"), (1, "a b c d")],
        "doc_id long, text string",
    )
    got = {r["token"] for r in textrank(df).collect()}
    assert got == {"very", "long", "words"}
