"""Pre-validate the driver's CORRECTNESS protocol at its real scale:
run the first-50 window of queries() against oracle_sql() on DuckDB at
sf0.01 (the driver's comparison scale; the in-repo pytest replica runs
sf0.001).  Prints one line per query and a final summary."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from mesos_pregel_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
N = int(os.environ.get("SWEEP_N", "50"))
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    spark = get_spark(app_name="sweep-sf001", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    qs, osql = em.queries(), em.oracle_sql()
    only = os.environ.get("SWEEP_ONLY")
    names = only.split(",") if only else list(qs.keys())[:N]
    bad = []
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, SF)
            cols = sorted(sdf.columns)
            s = sorted(
                (tuple(r[c] for c in cols) for r in sdf.collect()), key=repr
            )
            sql = osql.get(name)
            if sql is None:
                print(f"{name}: rows-only ({len(s)}) "
                      f"[{time.monotonic() - t0:.1f}s]", flush=True)
                continue
            d = con.execute(sql).fetch_arrow_table().to_pylist()
            d = sorted(
                (tuple(r[c] for c in sorted(r)) for r in d), key=repr
            )

            def _norm(rows):
                out = []
                for row in rows:
                    out.append(tuple(
                        round(v, 9) if isinstance(v, float) else v
                        for v in row
                    ))
                return sorted(out, key=repr)

            ok = _norm(s) == _norm(d)
            print(f"{name}: {'MATCH' if ok else 'MISMATCH'} rows={len(s)} "
                  f"[{time.monotonic() - t0:.1f}s]", flush=True)
            if not ok:
                bad.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
            bad.append(name)
    print(f"SUMMARY: {len(names) - len(bad)}/{len(names)} ok; bad={bad}",
          flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
