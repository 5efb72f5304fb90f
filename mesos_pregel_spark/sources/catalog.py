"""Storage abstraction (SURVEY §7.6 risk 1).

The contract (BASELINE.json) names Iceberg as the table format for the
transcript source and checkpoint targets.  This sandbox ships no
Iceberg runtime jars and has no network, so the engine reads/writes
through a two-implementation seam:

- ``IcebergCatalog`` — used when the active SparkSession has an
  Iceberg catalog configured (``spark.sql.catalog.<name>``); pure
  config, no code change: tables are addressed ``catalog.db.table``
  and read via ``spark.read.table`` (snapshot isolation, partition
  pruning and column pruning come from the Iceberg source).
- ``ParquetDirCatalog`` — fallback: one parquet directory per table
  under a root, addressed by name.  Used by all tests/benches here.

Both return plain DataFrames; everything downstream is format-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ParquetDirCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, table: str) -> str:
        p = os.path.join(self.root, f"{table}.parquet")
        return p if os.path.exists(p) else os.path.join(self.root, table)

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self._path(table))

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(os.path.join(self.root, table))


class IcebergCatalog:
    """Thin wrapper over an Iceberg catalog configured on the session."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "default"):
        conf_key = f"spark.sql.catalog.{catalog}"
        if spark.conf.get(conf_key, None) is None:
            raise RuntimeError(
                f"No Iceberg catalog {catalog!r} configured ({conf_key} unset). "
                "Add the iceberg-spark-runtime jar and catalog config, or use "
                "ParquetDirCatalog."
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace

    def _ident(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def read(self, table: str) -> DataFrame:
        return self.spark.read.table(self._ident(table))

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        writer = df.writeTo(self._ident(table))
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()


def open_catalog(spark: SparkSession, uri: str):
    """``iceberg://catalog/namespace`` or a filesystem root path."""
    if uri.startswith("iceberg://"):
        rest = uri[len("iceberg://"):]
        catalog, _, namespace = rest.partition("/")
        return IcebergCatalog(spark, catalog, namespace or "default")
    return ParquetDirCatalog(spark, uri)
