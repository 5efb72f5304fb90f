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


def read_transcript_files(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Raw-file ingestion for the formats transcript logs actually
    arrive in before anyone parquet-ifies them: ``parquet`` |
    ``json`` (JSONL) | ``csv`` (header row).  The fixed
    TRANSCRIPT_SCHEMA is always supplied to the reader — schema
    inference is disabled by construction (X1: never inferred), so a
    malformed column fails at the scan with the declared type, and the
    json/csv scans skip their expensive inference pass entirely.
    Timestamps parse as ISO-8601 (Spark's default for both sources).
    """
    from mesos_pregel_spark.fixtures import TRANSCRIPT_SCHEMA

    if fmt == "parquet":
        df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
    elif fmt == "json":
        df = spark.read.schema(TRANSCRIPT_SCHEMA).json(path)
    elif fmt == "csv":
        df = spark.read.schema(TRANSCRIPT_SCHEMA).option("header", True).csv(path)
    else:
        raise ValueError(f"unsupported transcript format: {fmt!r}")
    return validate_transcripts(df)
