"""Plan truncation WITHOUT Catalyst-stats compounding.

``Dataset.localCheckpoint`` truncates the logical plan (load-bearing
for iterative loops, see plans/pregel.py::materialize) but Spark's
``LogicalRDD.fromDataset`` copies the origin plan's ESTIMATED
statistics into the checkpoint node.  Inner-join size estimates are
PRODUCTS of their children's ``sizeInBytes``, so any loop whose per-
iteration plan references the previous state twice — one scatter join
plus one gather join, or a pointer-jumping label self-join — DOUBLES
the carried BigInt's bit-length every iteration, straight through the
checkpoint.  Measured on this Spark (4.1.2): a 10-row DataFrame
self-joined through eager localCheckpoints reaches a 7,608-DIGIT
sizeInBytes after 12 iterations; by ~25 iterations every stats
computation multiplies million-digit BigIntegers (Toom-Cook range) and
the driver spends MINUTES per superstep inside
``SizeInBytesOnlyStatsPlanVisitor`` — a 6-vertex SCC took 10+ minutes.
At 100× scale with hundreds of supersteps this is a hard engine
killer, independent of data size: the cost lives on the driver and
grows exponentially with iteration count.

Fix: after ``localCheckpoint``, rebuild the DataFrame from the
checkpointed internal RDD via ``SparkSession.internalCreateDataFrame``
(``private[sql]`` in Scala, hence public in bytecode and callable over
py4j).  The rebuilt plan is a ``LogicalRDD`` WITHOUT origin stats, so
its ``sizeInBytes`` falls back to ``spark.sql.defaultSizeInBytes`` —
a constant — and per-iteration stats stay O(plan width).  Values are
bit-identical: the checkpoint already materialized row COPIES, and the
rebuild only re-wraps that RDD (pinned by tests/test_truncate.py on a
shuffled 200k-row round-trip and by every iterative-algo oracle test
in the suite).  Broadcast decisions for truncated state rely on AQE's
RUNTIME sizes rather than the (previously astronomically wrong)
estimates — strictly an improvement.

Falls back to plain ``localCheckpoint`` when the py4j internals are
unavailable (e.g. Spark Connect), where the classic compounding path
does not exist anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_plan(df: DataFrame, eager: bool = True) -> DataFrame:
    """``localCheckpoint`` + carried-stats strip (module docstring).
    Laziness is preserved: for ``eager=False`` the checkpoint (and the
    one pass over the data) happens inside the caller's next action."""
    ck = df.localCheckpoint(eager=eager)
    try:
        jdf = ck._jdf
        spark = ck.sparkSession
        jrdd = jdf.queryExecution().toRdd()
        j2 = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        out = DataFrame(j2, spark)
        try:
            # Handle to the PERSISTED checkpoint RDD (LogicalRDD.rdd —
            # NOT queryExecution().toRdd(), which wraps it in a fresh
            # MapPartitionsRDD).  DataFrame.unpersist is a no-op for
            # localCheckpoint persistence (RDD-level, not CacheManager),
            # so without this handle superseded superstep states linger
            # until JVM GC + ContextCleaner — see PregelRun.reap.
            out._ck_jrdd = jdf.queryExecution().analyzed().rdd()
        except Exception:
            pass
        return out
    except Exception:  # pragma: no cover - non-classic sessions
        return ck


def release_plan(df: DataFrame | None) -> None:
    """Drop a truncate_plan frame once nothing references it:
    ``DataFrame.unpersist`` alone is a no-op for localCheckpoint RDD
    persistence (plans/pregel.py::reap), so also unpersist the
    checkpoint RDD handle captured by truncate_plan."""
    if df is None:
        return
    try:
        df.unpersist()
    except Exception:
        pass
    jrdd = getattr(df, "_ck_jrdd", None)
    if jrdd is not None:
        try:
            jrdd.unpersist(False)
        except Exception:
            pass
