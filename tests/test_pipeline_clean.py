"""Composed cleaning pipeline (functions/pipeline.py): a planted
corpus where each stage must drop exactly its targets."""

from mesos_pregel_spark.functions.pipeline import clean_corpus

GOOD_EN = (
    "the quick brown fox and the lazy dog walk to the market and "
    "talk of the weather because it is warm and the road is long " * 3
)


def _docs(spark):
    rows = [
        (1, GOOD_EN),                      # survives everything
        (2, GOOD_EN),                      # exact dup of 1 → dropped (canonical is 1)
        (3, GOOD_EN + " extra tail words here of the day"),  # near-dup of 1 → dropped
        (4, "el perro y el gato que corren por la calle de la ciudad "
            "porque el sol es grande y la casa es bonita " * 4),  # not en
        (5, "x!!! y??? z;;; .,;:!?" * 20),  # punct-heavy → low quality
        (6, "the friendly people of the town gather near the river and "
            "speak of the harvest because the season is kind and the "
            "fields are full of grain and the children play " * 3),  # survives
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_each_stage_drops_its_target(spark):
    got = clean_corpus(_docs(spark), lang="en", quality_min=0.5,
                       jaccard_min=0.6)
    rows = {r["doc_id"]: r for r in got.collect()}
    assert set(rows) == {1, 6}
    assert all(r["lang_pred"] == "en" for r in rows.values())
    assert all(r["quality"] >= 0.5 for r in rows.values())


def test_near_dup_drop_keeps_lower_id(spark):
    # with the near-dup stage relaxed to impossible, doc 3 comes back
    got = clean_corpus(_docs(spark), lang="en", quality_min=0.5,
                       jaccard_min=1.1)
    assert set(r["doc_id"] for r in got.collect()) == {1, 3, 6}


def test_fused_profile_equals_individual_operators(spark):
    """profile_documents must be bitwise-identical to the three
    operators it fuses (same pinned expressions, one scan)."""
    from mesos_pregel_spark.functions.text import (
        fingerprint,
        language_id,
        profile_documents,
        quality_score,
    )

    docs = _docs(spark)
    prof = {r["doc_id"]: r for r in profile_documents(docs).collect()}
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    l = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    f = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    assert {k: v["quality"] for k, v in prof.items()} == q
    assert {k: v["lang_pred"] for k, v in prof.items()} == l
    assert {k: v["fingerprint"] for k, v in prof.items()} == f


def test_fused_profile_is_single_scan(spark, tmp_path):
    """The 100x-scale property: the pipeline's scalar stages (quality
    + language + fingerprint/canonical) read the documents table ONCE
    via the fused profile, where composing the individual operators
    costs one scan each (asserted on the physical plans)."""
    from pyspark.sql import functions as F

    from mesos_pregel_spark.functions.dedup import exact_duplicates
    from mesos_pregel_spark.functions.text import (
        language_id,
        profile_documents,
        quality_score,
    )

    path = str(tmp_path / "docs")
    _docs(spark).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    def scans(df):
        return (
            df._jdf.queryExecution().executedPlan().toString()
            .count("Scan parquet")
        )

    assert scans(profile_documents(docs)) == 1
    naive = (
        quality_score(docs)
        .join(language_id(docs), "doc_id")
        .join(
            exact_duplicates(docs).where(~F.col("is_duplicate"))
            .select("doc_id"),
            "doc_id",
        )
    )
    # 4: quality + language + the two branches of exact_duplicates'
    # fingerprint⋈canonical self-join — all folded into 1 by the fused
    # profile + window
    assert scans(naive) == 4
