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


def test_cluster_split_is_leakage_safe():
    """Two identical docs whose RAW ids hash to different splits
    (doc 1 -> u=0.534 train, doc 10 -> u=0.975 test) must land in the
    SAME split under the group-aware rule, because the split hashes
    the dedup-cluster representative, not the doc id (twin side — the
    Spark side is pinned by driver parity at two scales)."""
    import hashlib

    import duckdb

    from mesos_pregel_spark.queries_text import SQL_CLUSTER_SPLIT

    def u(gid):
        h = hashlib.md5(f"split42:{gid}".encode()).hexdigest()[:12]
        return int(h, 16) / 281474976710656.0

    # fixture precondition: a naive doc_id split WOULD separate them
    assert u(1) < 0.90 <= 0.95 <= u(10)

    dup_text = " ".join(f"w{i}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(40))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text TEXT, "
        "lang TEXT, source TEXT, n_chars BIGINT)"
    )
    for did, text, src in [(1, dup_text, "s1"), (10, dup_text, "s1"),
                           (3, other, "s2")]:
        con.execute("INSERT INTO documents VALUES (?, ?, 'en', ?, ?)",
                    [did, text, src, len(text)])
    rows = con.execute(SQL_CLUSTER_SPLIT).fetchall()
    s1 = [r for r in rows if r[1] == "s1"]
    # ONE row: both dups in the cluster-representative's split (train)
    assert len(s1) == 1 and s1[0][0] == "train"
    assert (s1[0][2], s1[0][3]) == (2, 1)  # 2 docs, 1 group
    assert sum(r[2] for r in rows) == 3
