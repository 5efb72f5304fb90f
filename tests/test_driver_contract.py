"""Replicates the driver's verification locally (SURVEY §3.3): run
every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, compare row count, column names,
and order-insensitive values.  Runs at sf0.001 for speed; the driver
runs the same protocol at sf0.01."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _norm(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only contract: runs, returns a stable schema
        sdf = q(spark, SF_DIR)
        assert len(sdf.columns) > 0
        assert sdf.count() >= 0
        return

    sdf = q(spark, SF_DIR)
    spark_rows = [r.asDict() for r in sdf.collect()]
    cols = sorted(sdf.columns)

    ddf = duck.execute(sql).fetch_arrow_table()
    assert sorted(ddf.column_names) == cols, (
        f"column mismatch: spark={cols} duckdb={sorted(ddf.column_names)}"
    )
    duck_rows = ddf.to_pylist()

    assert len(spark_rows) == len(duck_rows), (
        f"row count: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    a, b = _norm(spark_rows, cols), _norm(duck_rows, cols)
    for x, y in zip(a, b):
        for xv, yv in zip(x, y):
            if isinstance(xv, float):
                assert math.isclose(xv, yv, rel_tol=1e-9, abs_tol=1e-9), (name, x, y)
            else:
                assert xv == yv, (name, x, y)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"actor", "pagerank"}
    total = sum(r["pagerank"] for r in rows)
    assert 0 < total <= 1.0 + 1e-6  # dangling mass leaks, never grows
