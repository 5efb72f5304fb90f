"""Driver-registry contract (queries.py): the external driver checks
only the FIRST 50 ``queries()`` entries, so ordering is load-bearing.
Pins: oracle coverage is total, the priority list is a permutation of
the registry, and every query with no green official CORRECTNESS row
on record sits inside the 50-query window (the r4 headline finding —
never-verified queries must never be parked past the cap)."""

import glob
import json
import os

import __spark_entry__ as entry_mod

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _recorded_green():
    green = set()
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        rows = json.load(open(path))
        for name, r in rows.items():
            if (r.get("rows_match") and r.get("schema_match")
                    and r.get("hash_match") and not r.get("err")):
                green.add(name)
    return green


def test_every_query_has_an_oracle():
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(qs) == set(osql)


def test_priority_list_is_a_permutation():
    from mesos_pregel_spark.queries import _ALL_QUERIES, _QUERY_PRIORITY

    assert sorted(_QUERY_PRIORITY) == sorted(set(_QUERY_PRIORITY))
    assert set(_QUERY_PRIORITY) == set(_ALL_QUERIES)


def test_never_green_queries_sit_inside_the_window():
    names = list(entry_mod.queries())
    past_window = set(names[WINDOW:])
    never_green = past_window - _recorded_green()
    assert not never_green, (
        f"queries with no green official record parked past the driver's "
        f"{WINDOW}-query window: {sorted(never_green)}"
    )
