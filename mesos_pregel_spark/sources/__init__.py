"""Input/output: transcript tables, catalogs (Iceberg w/ parquet fallback)."""
