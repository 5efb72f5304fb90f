"""Parity-check NAMED queries() entries against their oracle_sql() twins.

Same compare as scripts/replay_driver.py (row count, sorted column names,
order-insensitive values, 1e-9 float tolerance) but selects queries by
name instead of by window position — the fast feedback loop when adding
a new operator.

Usage: python scripts/check_queries.py name1,name2[,...] [sf_dir]
"""

import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


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


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from mesos_pregel_spark.session import get_spark

    spark = get_spark(app_name="check-queries", cores=16)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    for name in names:
        if name not in queries:
            results[name] = {"ok": False, "err": "not registered"}
            print(f"{name}: ERR not registered", flush=True)
            continue
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            spark_rows = [r.asDict() for r in sdf.collect()]
            cols = sorted(sdf.columns)
            sql = oracles.get(name)
            if sql is None:
                results[name] = {"ok": True, "rows": len(spark_rows), "oracle": False}
                print(f"{name}: rows-only ok ({len(spark_rows)})", flush=True)
                continue
            ddf = duck.execute(sql).fetch_arrow_table()
            ok_cols = sorted(ddf.column_names) == cols
            duck_rows = ddf.to_pylist()
            ok_rows = len(spark_rows) == len(duck_rows)
            ok_vals = ok_cols and ok_rows
            if ok_vals:
                a, b = _norm(spark_rows, cols), _norm(duck_rows, cols)
                for x, y in zip(a, b):
                    for xv, yv in zip(x, y):
                        if isinstance(xv, float):
                            if not math.isclose(xv, yv, rel_tol=1e-9, abs_tol=1e-9):
                                ok_vals = False
                                break
                        elif xv != yv:
                            ok_vals = False
                            break
                    if not ok_vals:
                        break
            results[name] = {
                "ok": bool(ok_cols and ok_rows and ok_vals),
                "rows_match": ok_rows, "schema_match": ok_cols,
                "hash_match": ok_vals, "spark_rows": len(spark_rows),
                "oracle_rows": len(duck_rows), "sec": round(time.time() - t0, 1),
            }
            status = "OK" if results[name]["ok"] else "FAIL"
            print(
                f"{name}: {status} rows={len(spark_rows)}/{len(duck_rows)}"
                f" cols={ok_cols} vals={ok_vals}"
                f" ({results[name]['sec']}s)", flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — record, keep checking
            results[name] = {"ok": False, "err": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"{name}: ERR {results[name]['err']}", flush=True)

    n_ok = sum(1 for r in results.values() if r.get("ok"))
    print(json.dumps({"sf_dir": sf_dir, "checked": len(results), "ok": n_ok}))
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
