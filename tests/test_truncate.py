"""plans/truncate.py: localCheckpoint carries the origin plan's
ESTIMATED stats, so iterated self-join loops double the carried
BigInt's bit-length every iteration (exponential driver-side grind —
a 6-vertex SCC measured 10+ minutes before the fix).  truncate_plan
must (a) keep values bit-identical to plain localCheckpoint and
(b) keep the carried sizeInBytes BOUNDED across iterations."""

from pyspark.sql import functions as F

from mesos_pregel_spark.plans.truncate import truncate_plan


def _size_digits(df):
    sz = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return len(str(sz))


def test_values_identical_through_shuffles(spark):
    base = spark.range(20_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("s"),
        (F.col("id") % 97).alias("k"),
    )
    agg = base.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    j = base.join(agg, "k").select("id", "s", "k", "c")
    plain = sorted(tuple(r) for r in j.localCheckpoint(eager=True).collect())
    eager = sorted(tuple(r) for r in truncate_plan(j).collect())
    lazy = sorted(
        tuple(r) for r in truncate_plan(j, eager=False).collect()
    )
    assert plain == eager == lazy
    assert len(plain) == 20_000


def test_stats_stay_bounded_in_self_join_loop(spark):
    """The pathological shape: each iteration self-joins the previous
    checkpoint.  Bare localCheckpoint doubles the stats digits per
    iteration (4 -> 7k digits by iteration 12 measured on this Spark);
    truncate_plan must stay flat."""
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    digits = []
    for _ in range(8):
        a, b = df.alias("a"), df.alias("b")
        j = a.join(b, F.col("a.v") == F.col("b.id")).select(
            F.col("a.id").alias("id"), F.col("b.v").alias("v")
        )
        df = truncate_plan(j)
        digits.append(_size_digits(df))
    assert max(digits) <= 40, digits
    assert digits[-1] == digits[1]  # flat, not growing
