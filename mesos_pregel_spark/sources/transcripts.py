"""Transcript-table source (X1) — fixed schema, never inferred.

Input shape (BASELINE.json:15): ``conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp``.  Reads via a
catalog (Iceberg when configured, parquet-dir fallback — see
catalog.py) and validates the schema up front so shape drift fails at
the scan, not superstep 40.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mesos_pregel_spark.functions.edges import validate_transcripts
from mesos_pregel_spark.sources.catalog import open_catalog


def read_transcripts(
    spark: SparkSession, uri: str, table: str = "transcripts"
) -> DataFrame:
    """Load + schema-validate the transcript table from ``uri``."""
    return validate_transcripts(open_catalog(spark, uri).read(table))
