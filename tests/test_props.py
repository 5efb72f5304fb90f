"""queries.py::q_props_rollup building blocks: JSON k extraction with
NULL exclusion, cents snapping before the sum, decile bucketing."""

from pyspark.sql import functions as F


def _rollup(spark, rows):
    from mesos_pregel_spark.queries import q_props_rollup  # noqa: F401
    # drive the same expressions q_props_rollup uses, on an inline df
    ev = spark.createDataFrame(
        rows, "event_type string, props string, value double"
    )
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    cents = F.round(F.col("value") * 100.0).cast("long")
    return (
        ev.select("event_type", k.alias("k"), cents.alias("cents"))
        .where(F.col("k").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("k").cast("double") / 10.0).cast("long")
            .alias("k_decile"),
            "k", "cents",
        )
        .groupBy("event_type", "k_decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
    )


def test_props_rollup_json_and_cents(spark):
    rows = [
        ("view", '{"k": 3}', 1.25),       # decile 0
        ("view", '{"k": 7}', 2.005),      # decile 0; 200.5 rounds half-up
        ("view", '{"k": 17}', 0.10),      # decile 1
        ("view", '{"k": -3}', 1.00),      # decile -1 (FLOOR, not trunc)
        ("view", "not json", 9.99),       # excluded: k unparseable
        ("view", '{"other": 1}', 9.99),   # excluded: no k
        ("click", '{"k": 17}', 4.00),     # separate event_type
    ]
    got = {
        (r["event_type"], r["k_decile"]): (r["n"], r["sum_cents"])
        for r in _rollup(spark, rows).collect()
    }
    assert got == {
        ("view", 0): (2, 125 + 201),
        ("view", 1): (1, 10),
        ("view", -1): (1, 100),
        ("click", 1): (1, 400),
    }
