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


def turn_entropy(events: DataFrame) -> DataFrame:
    """Per-conversation turn-taking entropy: the Shannon entropy of
    the actor (event_type/role) distribution over a conversation's
    turns — the transcript-quality signal that separates a balanced
    multi-party dialogue (high H) from a monologue or a tool-spam loop
    (H near 0).  A training-mix recipe thresholds or stratifies on it
    next to quality_score.

    Pinned semantics (exact DuckDB twin, queries.SQL_TURN_ENTROPY —
    the pmi/source_kl micro-nat discipline):

    - c = turns per (conversation, actor); n = turns per conversation
      (exact integer aggregates);
    - each actor term c*ln(c) is snapped to BIGINT micro-nats BEFORE
      the cross-partition sum (ROUND(c*ln(c)*1e6)), so partition order
      can never change a digit; c = 1 contributes exactly 0;
    - H = ln(n) - (s_micro/1e6)/n, one final ln + division from exact
      integers, rounded to 9 dp.  The micro-nat snap bounds the
      quantization error at 5e-7/n nats — deterministic, documented,
      and far inside any downstream threshold's tolerance (a
      single-actor conversation may read as ±a few 1e-8 instead of
      exactly 0; that is the price of an order-independent sum).

    Shape (design-for-100x): two hash aggregates, both map-side
    combinable, shuffling on user_id then (user_id) again — AQE
    coalesces them into one exchange reuse; no windows, no UDFs.
    Returns (user_id, n_turns, n_actors, entropy).
    """
    by_actor = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    c_d = F.col("c").cast("double")
    t_micro = F.round(c_d * F.log(c_d) * 1e6).cast("long")
    per_conv = (
        by_actor.select("user_id", "c", t_micro.alias("t_micro"))
        .groupBy("user_id")
        .agg(
            F.sum("c").cast("long").alias("n_turns"),
            F.count(F.lit(1)).cast("long").alias("n_actors"),
            F.sum("t_micro").cast("long").alias("s_micro"),
        )
    )
    n_d = F.col("n_turns").cast("double")
    ent = F.round(
        F.log(n_d) - (F.col("s_micro").cast("double") / 1e6) / n_d, 9
    )
    return per_conv.select(
        "user_id", "n_turns", "n_actors", ent.alias("entropy")
    )


DAY_US = 86_400_000_000


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention matrix over the event log — the product-
    analytics read-out a usage pipeline publishes next to the session
    stats: users are grouped by the DAY of their first activity (the
    cohort), and each cell reports how many of that cohort were active
    ``age`` days after joining.  Declining columns = churn; a flat row
    = a sticky cohort.

    Pinned semantics (exact DuckDB twin in queries.py):

    - day = epoch-microseconds div 86_400_000_000 — the NTZ-safe
      integer day index shared with the daily edge windows; no
      timezone, no date types, no float;
    - cohort(user) = MIN(day) over the user's events; age = day −
      cohort (≥ 0 by construction);
    - n_active counts DISTINCT users per (cohort, age);
      retention = ROUND(n_active / cohort_size, 9) — ONE division of
      exact integers; the age-0 row always has retention 1.0.

    Execution shape (design-for-100x): the (user, day) distinct and
    the per-user MIN both shuffle on user_id ONLY (one exchange,
    reused), the matrix aggregate shuffles O(#users × active-days)
    rows on the (cohort, age) key — cohort cells are bounded by the
    calendar, not the corpus, so the output is tiny; cohort sizes ride
    a broadcast join back onto the matrix.  No windows, no UDFs.
    Returns (cohort_day, age, n_active, cohort_size, retention).
    """
    day = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        f" div {DAY_US}"
    ).cast("long")
    ud = events.select("user_id", day.alias("day")).distinct()
    cohort = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    mat = (
        ud.join(cohort, "user_id")
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("age")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    sizes = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        mat.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day", "age", "n_active", "cohort_size",
            F.round(
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double"), 9
            ).alias("retention"),
        )
    )


def funnel_conversion(
    events: DataFrame,
    stages: tuple[str, str, str],
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Ordered three-stage funnel over gap-sessionized events — the
    conversion read-out behind every onboarding / checkout / agent-
    task-completion dashboard: of the sessions that reached stage 1,
    how many went on to stage 2 AFTER it, and stage 3 after that?

    Pinned semantics (exact DuckDB twin in queries.py):

    - sessions = the engine's pinned gap sessionization (strict-gt
      microsecond gap, (ts, event_id) order);
    - t1 = MIN event time of a stage-1 event in the session; t2 = MIN
      time of a stage-2 event STRICTLY AFTER t1; t3 = MIN stage-3
      time strictly after t2 — the strictly-ordered funnel rule (a
      stage-2 event before the first stage-1 does not count);
    - all comparisons are epoch-microsecond longs; conversion ratios
      are ONE rounded division each, NULL when the upstream count is
      zero.

    Shape (design-for-100x): the sessionize window + three hash
    aggregates keyed by (user_id, session_idx) — every one shuffles on
    the same key, so Spark reuses a single exchange; the final rollup
    is a 1-row aggregate.  Returns one row (n_sessions, n_s1, n_s12,
    n_s123, conv_12, conv_23).
    """
    s1, s2, s3 = stages
    ev = sessionize(events, gap_us=gap_us)
    key = ["user_id", "session_idx"]
    t1 = ev.groupBy(*key).agg(
        F.min(F.when(F.col("event_type") == s1, F.col("us"))).alias("t1")
    )
    t2 = (
        ev.join(t1, key)
        .groupBy(*key)
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == s2)
                    & F.col("t1").isNotNull() & (F.col("us") > F.col("t1")),
                    F.col("us"),
                )
            ).alias("t2")
        )
    )
    t3 = (
        ev.join(t2, key)
        .groupBy(*key)
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == s3)
                    & F.col("t2").isNotNull() & (F.col("us") > F.col("t2")),
                    F.col("us"),
                )
            ).alias("t3")
        )
    )
    per_session = t1.join(t2, key).join(t3, key)
    counts = per_session.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_s1"),
        F.sum(F.when(F.col("t2").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_s12"),
        F.sum(F.when(F.col("t3").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_s123"),
    )
    return counts.select(
        "n_sessions", "n_s1", "n_s12", "n_s123",
        F.when(
            F.col("n_s1") > 0,
            F.round(
                F.col("n_s12").cast("double") / F.col("n_s1").cast("double"),
                9,
            ),
        ).alias("conv_12"),
        F.when(
            F.col("n_s12") > 0,
            F.round(
                F.col("n_s123").cast("double")
                / F.col("n_s12").cast("double"), 9
            ),
        ).alias("conv_23"),
    )
