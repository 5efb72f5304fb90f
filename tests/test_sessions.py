"""Gap-based sessionization (functions/sessions.py) vs a hand-rolled
python oracle: boundary strictness, per-user independence, stable
(ts, event_id) tiebreak, rollup stats."""

import datetime as dt
from collections import defaultdict

from mesos_pregel_spark.functions.sessions import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1)


def _ev(eid, user, sec, typ="click", micro=0):
    return (eid, T0 + dt.timedelta(seconds=sec, microseconds=micro),
            user, typ, 1.0, "{}")


SCHEMA = ("event_id long, ts timestamp_ntz, user_id long,"
          " event_type string, value double, props string")


def _oracle(rows, gap_us):
    epoch = dt.datetime(1970, 1, 1)
    by_user = defaultdict(list)
    for eid, ts, user, typ, _v, _p in rows:
        us = (ts - epoch) // dt.timedelta(microseconds=1)
        by_user[user].append((ts, eid, typ, us))
    out = {}
    for user, evs in by_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        idx = 0
        prev = None
        for ts, eid, typ, us in evs:
            if prev is None or us - prev > gap_us:
                idx += 1
            out[(user, eid)] = (idx, typ, us)
            prev = us
    return out


def test_sessionize_boundaries(spark):
    gap = 60 * 1_000_000  # 1 minute
    rows = [
        _ev(1, 7, 0), _ev(2, 7, 30), _ev(3, 7, 90),      # 30s in, 60s gap
        _ev(4, 7, 150, micro=1),                          # 60s + 1us -> new
        _ev(5, 9, 0), _ev(6, 9, 61),                      # other user
        _ev(7, 9, 61, typ="view", micro=0),               # eid tiebreak
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in sessionize(df, gap_us=gap).collect()
    }
    want = _oracle(rows, gap)
    assert got == {k: v[0] for k, v in want.items()}
    # exact boundary: gap of exactly 60s does NOT split (strict >)
    assert got[(7, 3)] == got[(7, 2)]
    # 60s + 1us DOES split
    assert got[(7, 4)] == got[(7, 3)] + 1


def test_session_stats_rollup(spark):
    gap = 60 * 1_000_000
    rows = [
        _ev(1, 7, 0), _ev(2, 7, 30, typ="view"), _ev(3, 7, 300),
        _ev(4, 9, 0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["duration_us"], r["n_types"]
        )
        for r in session_stats(df, gap_us=gap).collect()
    }
    assert got[(7, 1)] == (2, 30_000_000, 2)
    assert got[(7, 2)] == (1, 0, 1)
    assert got[(9, 1)] == (1, 0, 1)


# ---------------------------------------------------------------------------
# concat-and-chunk packing (functions/packing.py)
# ---------------------------------------------------------------------------


def test_pack_concat_spans(spark):
    from mesos_pregel_spark.functions.packing import pack_concat

    docs = spark.createDataFrame(
        [
            # stratum A: 3+4+5 tokens, chunk=4
            (1, "a b c", "A"),
            (2, "d e f g", "A"),
            (3, "h i j k l", "A"),
            # stratum B independent
            (10, "x y", "B"),
            # empty doc: 1 token after normalization ('' splits to [''])
            (11, "", "B"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_tok"], r["first_chunk"],
            r["last_chunk"], r["n_chunks_spanned"],
        )
        for r in pack_concat(docs, chunk_tokens=4).collect()
    }
    # A: doc1 tokens 0-2 (chunk 0); doc2 tokens 3-6 (chunks 0-1);
    #    doc3 tokens 7-11 (chunks 1-2)
    assert got[1] == (3, 0, 0, 0, 1)
    assert got[2] == (4, 3, 0, 1, 2)
    assert got[3] == (5, 7, 1, 2, 2)
    # B restarts at 0
    assert got[10] == (2, 0, 0, 0, 1)
    assert got[11] == (1, 2, 0, 0, 1)


def test_pack_concat_distributed_prefix_sum_skew(spark):
    """Scale contract (r4 verdict #2): a dominant stratum must NOT be
    one serial window partition.  80% of docs in one stratum; with the
    two-phase prefix sum the big stratum spans multiple range
    partitions (>1 task), and start_tok still equals the single-stream
    running sum."""
    import random

    from mesos_pregel_spark.functions.packing import pack_concat

    rng = random.Random(42)
    rows = []
    for doc_id in range(4000):
        stratum = "big" if doc_id % 5 != 0 else f"s{doc_id % 3}"
        n_words = rng.randrange(1, 12)
        rows.append((doc_id, " ".join(["w"] * n_words), stratum))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    out = pack_concat(docs, chunk_tokens=7, partitions=8, _keep_pid=True)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}

    # the dominant stratum is processed by >1 physical partition — the
    # serial-per-stratum WindowExec shape is structurally impossible
    big_pids = {r["pid"] for r in got.values() if r["stratum"] == "big"}
    assert len(big_pids) > 1, f"dominant stratum serialized: pids={big_pids}"

    # exact single-stream oracle: running sum per stratum in doc_id order
    expect_start: dict = {}
    running: dict = {}
    for doc_id, text, stratum in sorted(rows):
        n_tok = len(text.split(" ")) if text else 1
        expect_start[doc_id] = (stratum, n_tok, running.get(stratum, 0))
        running[stratum] = running.get(stratum, 0) + n_tok
    assert len(got) == len(rows)
    for doc_id, (stratum, n_tok, start) in expect_start.items():
        r = got[doc_id]
        assert (r["stratum"], r["n_tokens"], r["start_tok"]) == (
            stratum, n_tok, start), doc_id
        assert r["first_chunk"] == start // 7
        assert r["last_chunk"] == (start + max(n_tok - 1, 0)) // 7
        assert r["n_chunks_spanned"] == r["last_chunk"] - r["first_chunk"] + 1


def test_pack_concat_no_stratum_window_in_plan(spark):
    """Pin the plan shape: no WindowExec whose partition key is only
    the stratum column may touch the document rows.  The only window
    allowed is over the tiny per-(pid, stratum) totals table — its
    partition spec includes pid-derived input, and it sits behind the
    localCheckpoint scan in the final plan."""
    from mesos_pregel_spark.functions.packing import pack_concat

    docs = spark.createDataFrame(
        [(i, "a b c", "only") for i in range(100)],
        "doc_id long, text string, source string",
    )
    plan = pack_concat(docs, chunk_tokens=4, partitions=4)._jdf.queryExecution(
    ).executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line:
            # the totals window partitions by (stratum, ...pid lineage);
            # a serial plan would show partitionBy [stratum#...] alone
            # directly over the doc scan
            assert "pid" in line, f"stratum-only window over docs: {line}"


def _oracle_entropy(rows):
    """Exact-recipe replication of sessions.py::turn_entropy."""
    import decimal
    import math
    from collections import Counter

    def snap(x):
        return int(decimal.Decimal(x).quantize(
            0, rounding=decimal.ROUND_HALF_UP))

    by = Counter()
    for user, actor in rows:
        by[(user, actor)] += 1
    out = {}
    for user in {u for u, _ in by}:
        cs = [c for (u, _a), c in by.items() if u == user]
        n = sum(cs)
        s_micro = sum(snap(float(c) * math.log(float(c)) * 1e6) for c in cs)
        out[user] = (
            n, len(cs), round(math.log(float(n)) - (s_micro / 1e6) / n, 9)
        )
    return out


def test_turn_entropy_matches_recipe_oracle(spark):
    from mesos_pregel_spark.functions.sessions import turn_entropy

    rows = [
        ("c1", "user"), ("c1", "assistant"), ("c1", "user"),
        ("c1", "assistant"), ("c1", "tool"),
        ("c2", "assistant"), ("c2", "assistant"), ("c2", "assistant"),
        ("c3", "user"),
        ("c4", "user"), ("c4", "assistant"),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string")
    got = {
        r["user_id"]: (r["n_turns"], r["n_actors"], r["entropy"])
        for r in turn_entropy(df).collect()
    }
    assert got == _oracle_entropy(rows)
    # balanced 2-actor conversation ~ ln 2; monologue ~ 0
    assert abs(got["c4"][2] - 0.693147181) < 1e-6
    assert abs(got["c2"][2]) < 1e-6
    assert got["c3"] == (1, 1, 0.0)


def test_turn_entropy_order_invariance(spark):
    """Micro-nat snapping makes the sum order-independent: shuffled
    input and different partitioning give bit-identical entropy."""
    import random

    from mesos_pregel_spark.functions.sessions import turn_entropy

    rng = random.Random(11)
    rows = [(f"c{rng.randrange(6)}", f"a{rng.randrange(4)}")
            for _ in range(300)]
    shuffled = rows[:]
    rng.shuffle(shuffled)
    a = turn_entropy(spark.createDataFrame(
        rows, "user_id string, event_type string").repartition(2)).collect()
    b = turn_entropy(spark.createDataFrame(
        shuffled, "user_id string, event_type string").repartition(9)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_session_copairs_hand_case(spark, tmp_path):
    """q_session_copairs on a hand-built events parquet: two sessions
    for u1 (gap > 30 min splits), one for u2; lift checks against the
    hand contingency table."""
    import datetime as dt

    from mesos_pregel_spark.queries import q_session_copairs

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(eid, uid, typ, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ,
                1.0, "{}")

    rows = [
        # u1 session 1: a, b together
        ev(1, 1, "a", 0), ev(2, 1, "b", 1),
        # u1 session 2 (gap 60 min): a alone
        ev(3, 1, "a", 61),
        # u2 session 1: a, b, c
        ev(4, 2, "a", 0), ev(5, 2, "b", 2), ev(6, 2, "c", 3),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)
    # q_* reads <sf_dir>/events.parquet
    got = {
        (r["a"], r["b"]): (r["n_both"], r["n_a"], r["n_b"], r["lift"])
        for r in q_session_copairs(spark, str(tmp_path)).collect()
    }
    # S = 3 sessions; n_a = 3, n_b = 2, n_c = 1
    assert got == {
        ("a", "b"): (2, 3, 2, round(2 * 3 / (3 * 2), 9)),
        ("a", "c"): (1, 3, 1, round(1 * 3 / (3 * 1), 9)),
        ("b", "c"): (1, 2, 1, round(1 * 3 / (2 * 1), 9)),
    }


# ---------------------------------------------------------------------------
# retention_cohorts (functions/sessions.py)
# ---------------------------------------------------------------------------


def test_retention_cohorts_matches_python(spark):
    """Python replication of the cohort matrix: NTZ day indices,
    cohort = first active day, exact distinct-user counts."""
    from datetime import datetime

    from mesos_pregel_spark.functions.sessions import retention_cohorts

    rows = [
        # (event_id, user, day, hour)
        (1, 1, 1, 3), (2, 1, 1, 9), (3, 1, 2, 1), (4, 1, 4, 5),
        (5, 2, 1, 7), (6, 2, 3, 2),
        (7, 3, 2, 4), (8, 3, 2, 6), (9, 3, 3, 1),
        (10, 4, 4, 8),
    ]
    events = spark.createDataFrame(
        [
            (eid, datetime(2024, 3, day, hour), uid, "e", 0.0, "{}")
            for eid, uid, day, hour in rows
        ],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    got = {
        (r["cohort_day"], r["age"]): (r["n_active"], r["cohort_size"],
                                      r["retention"])
        for r in retention_cohorts(events).collect()
    }
    # python oracle
    from collections import defaultdict
    epoch_day = {}
    for eid, uid, day, hour in rows:
        d = (datetime(2024, 3, day, hour)
             - datetime(1970, 1, 1)).total_seconds() * 1e6 // 86400000000
        epoch_day.setdefault(uid, set()).add(int(d))
    cohort = {u: min(ds) for u, ds in epoch_day.items()}
    sizes = defaultdict(int)
    for u in cohort:
        sizes[cohort[u]] += 1
    exp = defaultdict(int)
    for u, ds in epoch_day.items():
        for d in ds:
            exp[(cohort[u], d - cohort[u])] += 1
    expect = {
        k: (n, sizes[k[0]], round(n / sizes[k[0]], 9))
        for k, n in exp.items()
    }
    assert got == expect
    # age-0 rows are always full retention
    for (c, age), (n, size, ret) in got.items():
        if age == 0:
            assert n == size and ret == 1.0


# ---------------------------------------------------------------------------
# funnel_conversion (functions/sessions.py)
# ---------------------------------------------------------------------------


def test_funnel_conversion_strict_order(spark):
    """Hand-built sessions pin the strictly-ordered rule: a stage-2
    event BEFORE the session's first stage-1 event does not convert,
    and every ratio is the exact count division."""
    from datetime import datetime, timedelta

    from mesos_pregel_spark.functions.sessions import funnel_conversion

    base = datetime(2024, 5, 1, 12, 0, 0)

    def ev(eid, uid, minute, etype):
        return (eid, base + timedelta(minutes=minute), uid, etype, 0.0, "{}")

    rows = [
        # user 1, one session: full A -> B -> C conversion
        ev(1, 1, 0, "A"), ev(2, 1, 1, "B"), ev(3, 1, 2, "C"),
        # user 2, one session: B before A — reaches A only (B does not
        # count, no C at all)
        ev(4, 2, 0, "B"), ev(5, 2, 1, "A"),
        # user 3, one session: A -> B but C precedes B — stops at B
        ev(6, 3, 0, "A"), ev(7, 3, 1, "C"), ev(8, 3, 2, "B"),
        # user 4: no stage-1 at all
        ev(9, 4, 0, "B"), ev(10, 4, 1, "C"),
        # user 1, SECOND session (>30 min gap): A only
        ev(11, 1, 90, "A"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    out = funnel_conversion(events, ("A", "B", "C")).collect()[0]
    assert out["n_sessions"] == 5
    assert out["n_s1"] == 4      # u1s1, u2, u3, u1s2
    assert out["n_s12"] == 2     # u1s1, u3
    assert out["n_s123"] == 1    # u1s1 only
    assert out["conv_12"] == round(2 / 4, 9)
    assert out["conv_23"] == round(1 / 2, 9)


def test_packing_report_consistency_with_pack_concat(spark):
    """The report's chunk counts agree with the span table: per
    stratum, pack_concat's max last_chunk + 1 == the report's
    n_chunks, and fill = total/(n_chunks*C)."""
    from mesos_pregel_spark.functions.packing import pack_concat
    from mesos_pregel_spark.queries_text import (
        _PACK_CHUNK_TOKENS,
        _docs,
        _packing_report,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rep = {r["stratum"]: r for r in _packing_report(spark, sf).collect()}
    spans = pack_concat(
        _docs(spark, sf), chunk_tokens=_PACK_CHUNK_TOKENS
    ).groupBy("stratum").agg(
        (F.max("last_chunk") + 1).alias("n_chunks"),
        F.sum("n_tokens").alias("total"),
    )
    for r in spans.collect():
        rr = rep[r["stratum"]]
        assert rr["n_chunks"] == r["n_chunks"]
        assert rr["total_tokens"] == r["total"]
        assert 0 <= rr["waste_tokens"] < _PACK_CHUNK_TOKENS
        assert rr["fill_ratio"] == round(
            rr["total_tokens"] / (rr["n_chunks"] * _PACK_CHUNK_TOKENS), 9)


def test_session_histogram_buckets(spark):
    """Buckets partition all sessions; bucket of n is bit_length-1
    (the libm-free floor(log2)); totals agree with session_stats."""
    from mesos_pregel_spark.queries import q_session_histogram
    from mesos_pregel_spark.functions.sessions import session_stats
    from mesos_pregel_spark.queries import _events, _SESSION_GAP_US

    sf = "/root/testdata/sf0.001"
    hist = {r["bucket"]: r for r in q_session_histogram(spark, sf).collect()}
    stats = session_stats(_events(spark, sf),
                          gap_us=_SESSION_GAP_US).collect()
    from collections import defaultdict
    exp = defaultdict(lambda: [0, 0])
    for r in stats:
        b = r["n_events"].bit_length() - 1
        exp[b][0] += 1
        exp[b][1] += r["n_events"]
    assert {b: (r["n_sessions"], r["sum_events"])
            for b, r in hist.items()} == {b: tuple(v) for b, v in exp.items()}


def test_burstiness_closed_forms():
    """Goh-Barabási B over the twin (DuckDB side — the Spark side is
    pinned by driver parity at two scales): a metronome stream is
    exactly B = -1 (sigma 0), a two-burst stream is strongly positive,
    and a single gap is NULL (n < 2)."""
    import duckdb

    from mesos_pregel_spark.queries import SQL_BURSTINESS

    con = duckdb.connect()
    rows = []
    # metronome: every 10s
    rows += [("periodic", i, f"2026-01-01 00:00:{i:02d}0") for i in range(6)]
    # bursty: 5 events in 2s, then one 1h later, then 5 more
    ts = [0, 1, 2, 3, 4, 3600, 3601, 3602, 3603, 3604]
    rows += [("bursty", 100 + i, None) for i in range(len(ts))]
    con.execute("""
        CREATE TABLE events (
          user_id INT, event_type TEXT, event_id INT, ts TIMESTAMP)
    """)
    for a, i, t in rows:
        if a == "periodic":
            con.execute(
                "INSERT INTO events VALUES (1, 'periodic', ?, "
                "TIMESTAMP '2026-01-01 00:00:00' + to_seconds(? * 10))",
                [i, i],
            )
    for j, t in enumerate(ts):
        con.execute(
            "INSERT INTO events VALUES (1, 'bursty', ?, "
            "TIMESTAMP '2026-01-01 00:00:00' + to_seconds(?))",
            [100 + j, t],
        )
    con.execute(
        "INSERT INTO events VALUES (1, 'single', 900, TIMESTAMP "
        "'2026-01-01 00:00:00'), (1, 'single', 901, TIMESTAMP "
        "'2026-01-01 00:05:00')"
    )
    got = {r[0]: (r[1], r[2])
           for r in con.execute(SQL_BURSTINESS).fetchall()}
    assert got["periodic"] == (5, -1.0)
    # 8 one-second gaps + one hour gap: mu~400s, sigma~1131s -> B~0.48
    assert got["bursty"][1] > 0.4
    assert got["single"] == (1, None)


def test_gap_percentiles_order_statistics():
    """The twin's percentile rule (DuckDB side — the Spark side is
    pinned by driver parity at two scales) against an explicit python
    sort with the same lower-index rule, plus the n=1 degenerate."""
    import duckdb

    from mesos_pregel_spark.queries import SQL_GAP_PERCENTILES

    con = duckdb.connect()
    con.execute("""
        CREATE TABLE events (
          user_id INT, event_type TEXT, event_id INT, ts TIMESTAMP)
    """)
    # gaps (seconds): 1, 2, 4, 8, 100 -> sorted same; n=5
    offs = [0, 1, 3, 7, 15, 115]
    for i, t in enumerate(offs):
        con.execute(
            "INSERT INTO events VALUES (1, 'a', ?, "
            "TIMESTAMP '2026-01-01 00:00:00' + to_seconds(?))",
            [i, t],
        )
    # single-gap actor: every percentile is that one gap
    con.execute(
        "INSERT INTO events VALUES (1, 'b', 900, TIMESTAMP "
        "'2026-01-01 00:00:00'), (1, 'b', 901, TIMESTAMP "
        "'2026-01-01 00:00:07')"
    )
    got = {r[0]: r[1:] for r in con.execute(SQL_GAP_PERCENTILES).fetchall()}
    gaps = sorted((offs[i + 1] - offs[i]) * 1_000_000
                  for i in range(len(offs) - 1))
    n = len(gaps)
    exp = tuple(gaps[(n - 1) * p // 100] for p in (50, 90, 99))
    # lower-index rule: p90/p99 land on index (4*90)//100 = 3 -> 8s
    assert got["a"] == (n,) + exp
    assert got["a"][1:] == (4_000_000, 8_000_000, 8_000_000)
    assert got["b"] == (1, 7_000_000, 7_000_000, 7_000_000)


def test_circadian_closed_forms():
    """Hour histogram on the twin: an always-9am actor peaks at hour 9
    with share 1.0 and zero entropy; a 50/50 two-hour actor has
    peak_share 0.5, lower-hour tie-break, and ln(2) nats/event."""
    import math

    import duckdb

    from mesos_pregel_spark.queries import SQL_CIRCADIAN

    con = duckdb.connect()
    con.execute("""
        CREATE TABLE events (
          user_id INT, event_type TEXT, event_id INT, ts TIMESTAMP)
    """)
    for i in range(4):
        con.execute(
            "INSERT INTO events VALUES (1, 'nine', ?, "
            "TIMESTAMP '2026-01-0" + str(i + 1) + " 09:15:00')", [i])
    for i in range(3):
        con.execute(
            "INSERT INTO events VALUES (1, 'both', ?, "
            "TIMESTAMP '2026-01-0" + str(i + 1) + " 08:00:00')", [100 + i])
        con.execute(
            "INSERT INTO events VALUES (1, 'both', ?, "
            "TIMESTAMP '2026-01-0" + str(i + 1) + " 20:30:00')", [200 + i])
    got = {r[0]: r[1:] for r in con.execute(SQL_CIRCADIAN).fetchall()}
    n, peak, share, emicro, rnano = got["nine"]
    assert (n, peak, share, emicro, rnano) == (4, 9, 1.0, 0, 0)
    n, peak, share, emicro, rnano = got["both"]
    assert (n, peak, share) == (6, 8, 0.5)   # tie -> lower hour
    # 2 * round(3*ln(2)*1e6) micro-nats; rate = ln(2) nano-nats/event
    assert emicro == 2 * round(3 * math.log(2) * 1e6)
    assert abs(rnano - 1000 * round(math.log(2) * 1e6) // 1) <= 1000
