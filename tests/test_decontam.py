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


# ---------------------------------------------------------------------------
# fuzzy (MinHash-LSH) decontamination
# ---------------------------------------------------------------------------


def _shingles(text: str, n: int = 5) -> set:
    t = _norm(text)
    if len(t) <= n:
        return {t}
    return {t[i:i + n] for i in range(len(t) - n + 1)}


def _oracle_fuzzy(train, evals, n=5, k=8, bands=4, thr=0.5):
    """Exact-recipe replication: md5 minhash bands -> cross candidates
    -> exact jaccard -> best (max jaccard, min eval_id) per train doc."""
    def sig(text):
        sh = _shingles(text, n)
        return [
            min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in sh)
            for i in range(k)
        ]

    r = k // bands

    def bandkeys(text):
        s = sig(text)
        return {(j, "|".join(s[j * r:(j + 1) * r])) for j in range(bands)}

    out = {}
    for tid, ttext in train:
        bt = bandkeys(ttext)
        best = None
        for eid, etext in evals:
            if not (bt & bandkeys(etext)):
                continue
            a, b = _shingles(ttext, n), _shingles(etext, n)
            j = round(len(a & b) / len(a | b), 9)
            if j < thr:
                continue
            if best is None or (j, -eid) > (best[1], -best[0]):
                best = (eid, j)
        if best:
            out[tid] = best
    return out


def test_fuzzy_planted_paraphrase_caught_exact_misses(spark):
    """A lightly edited copy of an eval doc: the exact 8-gram
    decontaminate misses it (no shared 8-gram), fuzzy flags it."""
    from mesos_pregel_spark.functions.dedup import fuzzy_decontaminate

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    edited = base.replace("jumps", "leaps").replace("lazy", "sleepy")
    train = [(1, edited), (2, "completely unrelated text about spark plans")]
    evals = [(25, base)]
    got = {
        r["doc_id"]: (r["eval_id"], r["jaccard"])
        for r in fuzzy_decontaminate(
            _df(spark, train), _df(spark, evals), threshold=0.5
        ).collect()
    }
    assert got == _oracle_fuzzy(train, evals)
    assert 1 in got and got[1][0] == 25 and got[1][1] >= 0.5
    assert 2 not in got
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(
            _df(spark, train), _df(spark, evals), n=8
        ).collect()
    }
    assert exact[1] is False  # the paraphrase slips past exact n-grams


def test_fuzzy_best_match_tiebreak_and_threshold(spark):
    """Identical jaccard vs two eval docs -> min eval_id wins; a
    below-threshold candidate is dropped."""
    from mesos_pregel_spark.functions.dedup import fuzzy_decontaminate

    text = "alpha beta gamma delta epsilon zeta eta theta"
    train = [(3, text)]
    evals = [(50, text), (75, text), (100, "nothing in common here at all")]
    got = [tuple(r) for r in fuzzy_decontaminate(
        _df(spark, train), _df(spark, evals), threshold=0.9
    ).collect()]
    assert got == [(3, 50, 1.0)]
    assert _oracle_fuzzy(train, evals, thr=0.9) == {3: (50, 1.0)}


def test_fuzzy_matches_recipe_oracle_mixed_corpus(spark):
    from mesos_pregel_spark.functions.dedup import fuzzy_decontaminate

    evals = [
        (25, "machine learning models overfit small datasets easily"),
        (50, "distributed graph processing with bulk synchronous steps"),
    ]
    train = [
        (1, "machine learning models overfit small datasets very easily"),
        (2, "distributed graph processing with bulk synchronous steps"),
        (3, "an entirely different document about cooking pasta"),
        (4, "machine learning models overfit tiny datasets easily"),
    ]
    for thr in (0.3, 0.6, 0.95):
        got = {
            r["doc_id"]: (r["eval_id"], r["jaccard"])
            for r in fuzzy_decontaminate(
                _df(spark, train), _df(spark, evals), threshold=thr
            ).collect()
        }
        assert got == _oracle_fuzzy(train, evals, thr=thr)


def test_dup_source_matrix_hand_case(spark):
    """Two planted near-dup pairs: one across sources (web<->wiki),
    one within (web<->web); an unrelated doc contributes nothing."""
    from mesos_pregel_spark.functions.dedup import dup_source_matrix

    t = "the exact same duplicated document text appears again here"
    rows = [
        (1, t, "web"), (2, t, "wiki"),       # cross-source pair
        (3, t + "!", "web"),                 # near-dup of 1 (same source)
        (4, "totally different content about engines", "code"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source_lo"], r["source_hi"]): r["n_pairs"]
        for r in dup_source_matrix(df, threshold=0.5).collect()
    }
    # pairs: (1,2) web/wiki, (1,3) web/web, (2,3) wiki/web
    assert got == {("web", "wiki"): 2, ("web", "web"): 1}
