"""Deterministic stratified / budget sampling: engine vs a python
replica of the pinned 48-bit md5 uniform, plus the nested-sample
property that makes hash sampling re-thinnable."""

import hashlib

from pyspark.sql import functions as F

from mesos_pregel_spark.functions.sampling import (
    sample_to_token_budget,
    stratified_sample,
    uniform_col,
)


def _u(seed: str, key) -> float:
    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:12]
    return int(h, 16) / float(2**48)


def _docs_df(spark, n=200):
    rows = [
        (
            i,
            " ".join(f"w{(i * 7 + j) % 23}" for j in range(5 + i % 9)),
            ["en", "de", "es"][i % 3],
            f"s{i % 4}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_uniform_col_matches_python(spark):
    docs = _docs_df(spark, 50)
    got = {
        r["doc_id"]: r["u"]
        for r in docs.select(
            "doc_id", uniform_col("sample42", F.col("doc_id")).alias("u")
        ).collect()
    }
    assert got == {i: _u("sample42", i) for i in range(50)}


def test_stratified_sample_oracle(spark):
    docs = _docs_df(spark)
    rates = {"s0": 0.5, "s1": 0.25, "s3": 1.0}
    got = {
        (r["doc_id"], r["stratum"], r["u"])
        for r in stratified_sample(docs, rates, seed="tst").collect()
    }
    expected = set()
    for i in range(200):
        stratum = f"s{i % 4}"
        u = _u("tst", i)
        if u < rates.get(stratum, 0.0):
            expected.add((i, stratum, u))
    assert got == expected
    assert expected  # fixture actually exercises the filter


def test_nested_samples(spark):
    """u is exact, so a smaller rate's sample is a SUBSET of a larger
    rate's — re-thinning without re-hashing."""
    docs = _docs_df(spark)
    big = {
        r["doc_id"]
        for r in stratified_sample(
            docs, {f"s{i}": 0.8 for i in range(4)}, seed="n"
        ).collect()
    }
    small = {
        r["doc_id"]
        for r in stratified_sample(
            docs, {f"s{i}": 0.3 for i in range(4)}, seed="n"
        ).collect()
    }
    assert small <= big
    assert len(small) < len(big)


def test_budget_sample_oracle(spark):
    docs = _docs_df(spark)
    budget = 300
    got = {
        (r["doc_id"], r["stratum"], r["n_tokens"], r["rate"])
        for r in sample_to_token_budget(
            docs, budget, stratum_col="lang", seed="b"
        ).collect()
    }
    # python replica with the same float ops
    toks = {i: 5 + i % 9 for i in range(200)}
    totals: dict[str, int] = {}
    for i in range(200):
        lang = ["en", "de", "es"][i % 3]
        totals[lang] = totals.get(lang, 0) + toks[i]
    expected = set()
    for i in range(200):
        lang = ["en", "de", "es"][i % 3]
        rate = min(1.0, float(budget) / float(totals[lang]))
        if _u("b", i) < rate:
            expected.add((i, lang, toks[i], rate))
    assert got == expected
    assert expected


def test_budget_caps_expected_tokens(spark):
    """Sampled token mass lands near the budget for an over-budget
    stratum (expectation check, deterministic fixture)."""
    docs = _docs_df(spark, 400)
    budget = 200
    out = sample_to_token_budget(docs, budget, stratum_col="lang", seed="b2")
    kept = (
        out.groupBy("stratum").agg(F.sum("n_tokens").alias("t")).collect()
    )
    for r in kept:
        assert r["t"] < 4 * budget  # loose deterministic sanity bound
