"""Gap-based sessionization over the events stream — the standard
pre-processing step that turns a flat event log into per-user sessions
(conversation episodes, tool-use bursts) before graph extraction or
training-mix stats.

Pinned semantics (exact DuckDB twin in queries.py):

- order within a user = (ts, event_id) — the same stable tiebreak as
  edge extraction (X2);
- a new session starts at the first event of a user and at every
  event whose gap from the previous event exceeds ``gap_us``
  MICROSECONDS (strict >).  All arithmetic is on epoch-microsecond
  longs — no float, no timezone: hash-exact across engines;
- session_idx = running count of session starts (1-based).

Execution shape (design-for-100x): one window pass (lag + running
sum) partitioned by user_id plus one hash aggregation — both shuffle
on user_id only, so Spark plans a SINGLE exchange reused by the
window and the groupBy (the sort feeds both).  Skewed users are
bounded by their own event count; no cross-user state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def _us_col() -> "F.Column":
    """Microseconds since the NTZ epoch, computed as pure wall-clock
    arithmetic: the events parquet carries TIMESTAMP_NTZ, which
    ``unix_micros`` rejects and whose cast to TIMESTAMP would drag the
    session timezone into the value.  ``timestampdiff`` between two
    NTZ values is timezone-free and equals DuckDB's ``epoch_us`` on
    naive timestamps exactly."""
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    )


def sessionize(events: DataFrame, gap_us: int = DEFAULT_GAP_US) -> DataFrame:
    """Per-event session assignment: adds (us, session_idx)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = _us_col()
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    return events.select(
        "user_id", "event_id", "event_type", us.alias("us"),
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("session_idx"),
    )


def session_stats(
    events: DataFrame, gap_us: int = DEFAULT_GAP_US
) -> DataFrame:
    """Per-session rollup: (user_id, session_idx, n_events, start_us,
    end_us, duration_us, n_types).  Epoch-microsecond longs
    throughout — exact in any engine."""
    s = sessionize(events, gap_us=gap_us)
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.countDistinct("event_type").alias("n_types"),
    )
