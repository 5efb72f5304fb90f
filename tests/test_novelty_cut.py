"""ngram_novelty (functions/decontam.py), attribute_assortativity and
partition_cut (algos/structure.py): python replications and the
semantic pins each operator exists for."""

import hashlib

from mesos_pregel_spark.algos.structure import (
    attribute_assortativity,
    partition_cut,
)
from mesos_pregel_spark.functions.decontam import ngram_novelty


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------


def _py_novelty(rows, n):
    import re

    grams = {}
    for d, txt in rows:
        ts = [t for t in re.sub(r"\s+", " ", txt.lower()).strip().split(" ")
              if t != ""]
        gs = set()
        for i in range(max(len(ts) - n + 1, 1)):
            gs.add(" ".join(ts[i:i + n]))
        grams[d] = gs
    dfreq = {}
    for gs in grams.values():
        for g in gs:
            dfreq[g] = dfreq.get(g, 0) + 1
    out = {}
    for d, gs in grams.items():
        novel = sum(1 for g in gs if dfreq[g] == 1)
        out[d] = (len(gs), novel, round(novel / len(gs), 9))
    return out


def test_novelty_matches_python(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact copy of 1
        (3, "one two three four five six seven"),
        (4, "one two three four nine ten eleven"),    # shares a prefix gram
        (5, "wholly unique pentagram of fresh words"),
    ]
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_ratio"])
        for r in ngram_novelty(_docs(spark, rows), n=4).collect()
    }
    assert got == _py_novelty(rows, 4)
    # exact copies share every gram: zero novelty both ways
    assert got[1][2] == 0.0 and got[2][2] == 0.0
    # the unique doc is fully novel
    assert got[5][2] == 1.0
    # partial overlap sits strictly between
    assert 0.0 < got[3][2] < 1.0


def test_novelty_short_doc_floor(spark):
    """Docs below n tokens contribute their whole token sequence as
    one gram (the decontamination stack's shingle floor)."""
    rows = [(1, "tiny doc"), (2, "tiny doc"), (3, "other short")]
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"])
        for r in ngram_novelty(_docs(spark, rows), n=5).collect()
    }
    assert got[1] == (1, 0) and got[2] == (1, 0) and got[3] == (1, 1)


# ---------------------------------------------------------------------------
# attribute_assortativity
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _labels(spark, lab):
    return spark.createDataFrame(
        list(lab.items()), "id long, label string"
    )


def _py_attr_r(pairs, lab):
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    m = len(edges)
    same = sum(1 for a, b in edges if lab[a] == lab[b])
    stubs = {}
    for a, b in edges:
        stubs[lab[a]] = stubs.get(lab[a], 0) + 1
        stubs[lab[b]] = stubs.get(lab[b], 0) + 1
    s2 = sum(v * v for v in stubs.values())
    num = 2 * m * 2 * same - s2
    den = (2 * m) ** 2 - s2
    return len(stubs), m, same, round(num / den, 9)


def test_attr_assortativity_matches_python(spark):
    # two same-label triangles bridged by one cross edge
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    lab = {1: "a", 2: "a", 3: "a", 4: "b", 5: "b", 6: "b"}
    row = attribute_assortativity(
        spark, _edges(spark, pairs), _labels(spark, lab)
    ).collect()[0]
    exp = _py_attr_r(pairs, lab)
    assert (row["n_classes"], row["m_edges"], row["same_edges"],
            row["r"]) == exp
    assert row["r"] > 0  # mostly same-label wiring


def test_attr_assortativity_perfect_and_disassortative(spark):
    # disjoint same-label cliques: r = 1 exactly
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5)]
    lab = {1: "a", 2: "a", 3: "a", 4: "b", 5: "b"}
    row = attribute_assortativity(
        spark, _edges(spark, pairs), _labels(spark, lab)
    ).collect()[0]
    assert row["r"] == 1.0
    # complete bipartite cross-labelling: r < 0 and matches python
    pairs2 = [(1, 3), (1, 4), (2, 3), (2, 4)]
    lab2 = {1: "a", 2: "a", 3: "b", 4: "b"}
    row2 = attribute_assortativity(
        spark, _edges(spark, pairs2), _labels(spark, lab2)
    ).collect()[0]
    assert row2["r"] == _py_attr_r(pairs2, lab2)[3]
    assert row2["r"] < 0


# ---------------------------------------------------------------------------
# partition_cut
# ---------------------------------------------------------------------------


def _py_pid(v, p):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16) % p


def test_partition_cut_matches_python(spark):
    pairs = [(i, j) for i in range(1, 12) for j in range(i + 1, 12)
             if (i + j) % 3 != 0]
    out = {
        r["n_partitions"]: r
        for r in partition_cut(
            spark, _edges(spark, pairs), n_partitions=(2, 8, 32)
        ).collect()
    }
    for p, row in out.items():
        exp_cut = sum(1 for a, b in pairs if _py_pid(a, p) != _py_pid(b, p))
        assert row["n_edges"] == len(pairs)
        assert row["cut_edges"] == exp_cut
        assert row["cut_ratio"] == round(exp_cut / len(pairs), 9)
        assert row["random_expect"] == round(1.0 - 1.0 / p, 9)


def test_partition_cut_monotone_expectation(spark):
    """More partitions can only push the uniform-hash expectation up;
    P=1 cuts nothing (the degenerate pin)."""
    pairs = [(i, i + 1) for i in range(1, 40)]
    out = {
        r["n_partitions"]: r
        for r in partition_cut(
            spark, _edges(spark, pairs), n_partitions=(1, 4, 64)
        ).collect()
    }
    assert out[1]["cut_edges"] == 0
    assert out[1]["random_expect"] == 0.0
    assert out[4]["random_expect"] < out[64]["random_expect"]


# ---------------------------------------------------------------------------
# dedup_keep_best (queries_text.py composition)
# ---------------------------------------------------------------------------


def test_dedup_keep_best_is_the_quality_argmax(spark):
    """Per duplicate cluster exactly ONE keep_best, and it is the
    (quality DESC, doc_id ASC) argmax — the retention rule that
    distinguishes this from dedup_clusters' min-id canonical pick."""
    from mesos_pregel_spark.queries_text import _dedup_keep_best

    rows = _dedup_keep_best(spark, "/root/testdata/sf0.001").collect()
    assert rows, "fixture corpus must contain near-dup clusters"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for members in by_cluster.values():
        kept = [r for r in members if r["keep_best"]]
        assert len(kept) == 1
        best = min(members, key=lambda r: (-r["quality"], r["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"]


# ---------------------------------------------------------------------------
# motif_significance (queries.py — configuration-model expectation)
# ---------------------------------------------------------------------------


def test_motif_significance_formula(spark):
    """The 1-row formula pinned against a hand-computed graph: a
    triangle-closed graph beats the configuration-model expectation
    (ratio > 1), and the exact integer sums match."""
    import duckdb

    from mesos_pregel_spark.queries import SQL_MOTIF_SIGNIFICANCE

    con = duckdb.connect()
    # two orders sharing parts -> a small co-purchase graph with a
    # planted triangle
    con.execute("""
        CREATE VIEW lineitem AS SELECT * FROM (VALUES
          (1, 10), (1, 11), (1, 12),          -- triangle 10-11-12
          (2, 12), (2, 13),
          (3, 13), (3, 14)
        ) t(l_orderkey, l_partkey)
    """)
    row = con.execute(SQL_MOTIF_SIGNIFICANCE).fetch_arrow_table().to_pylist()[0]
    # edges: (10,11),(10,12),(11,12),(12,13),(13,14) -> degs: 10:2,
    # 11:2, 12:3, 13:2, 14:1; sum_k=10, sum_kk1=2+2+6+2+0=12
    assert row["n_triangles"] == 1
    assert row["sum_k"] == 10 and row["sum_kk1"] == 12
    r = 12 / 10
    assert row["expected"] == round(r * r * r / 6.0, 6)
    assert row["ratio"] == round(1 / (r * r * r / 6.0), 6)
    assert row["ratio"] > 1.0


def test_attr_assortativity_single_class_is_null(spark):
    """Degenerate single-class graph: r is mathematically undefined
    (0/0) — both engines must emit NULL, not NaN (the twin contract)."""
    pairs = [(1, 2), (2, 3)]
    lab = {1: "a", 2: "a", 3: "a"}
    row = attribute_assortativity(
        spark, _edges(spark, pairs), _labels(spark, lab)
    ).collect()[0]
    assert row["r"] is None


def test_degree_gini_formula(spark):
    """Histogram-form Gini pinned against the classic sorted-form
    definition on a hand graph, plus the two poles: a regular ring
    scores exactly 0, a star scores the closed-form value."""
    import duckdb

    from mesos_pregel_spark.queries import SQL_DEGREE_GINI

    def gini_sorted(degs):
        n, s = len(degs), sum(degs)
        d = sorted(degs)
        return round(
            sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(d))
            / (n * s), 9)

    def run(lineitem_rows):
        con = duckdb.connect()
        vals = ", ".join(f"({o}, {p})" for o, p in lineitem_rows)
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM (VALUES {vals})"
                    " t(l_orderkey, l_partkey)")
        return con.execute(SQL_DEGREE_GINI).fetch_arrow_table().to_pylist()[0]

    # ring of 4 parts (two orders of 2 overlapping pairs -> cycle):
    # orders {1,2},{2,3},{3,4},{4,1} -> every deg = 2 -> gini 0
    ring = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 3), (3, 4), (4, 4), (4, 1)]
    r = run(ring)
    assert (r["n_vertices"], r["gini"]) == (4, 0.0)

    # star: one order with 5 parts gives K5... instead hub via pairs:
    # orders {h,x} for x in 1..4 -> degs h:4, leaves:1
    star = [(i, 9) for i in range(1, 5)] + [(i, i) for i in range(1, 5)]
    r2 = run(star)
    assert r2["gini"] == gini_sorted([4, 1, 1, 1, 1])


def test_rank_degree_corr_and_source_retention(spark):
    """rank_degree_corr: NULL on a regular graph (zero degree
    variance), near +1 on a hub-dominated one.  source_retention:
    retention = 1 - dropped/docs per source, exactly."""
    import duckdb

    from mesos_pregel_spark.queries import SQL_RANK_DEGREE_CORR
    from mesos_pregel_spark.queries_text import (
        _dedup_clusters,
        _docs,
        _source_retention,
    )

    # regular graph: a 4-cycle of events per user gives every actor
    # identical out-degree -> corr NULL
    con = duckdb.connect()
    con.execute("""
        CREATE VIEW events AS SELECT * FROM (VALUES
          (1, TIMESTAMP '2024-01-01 00:00:01', 1, 'a', 0.0, '{}'),
          (2, TIMESTAMP '2024-01-01 00:00:02', 1, 'b', 0.0, '{}'),
          (3, TIMESTAMP '2024-01-01 00:00:03', 1, 'a', 0.0, '{}'),
          (4, TIMESTAMP '2024-01-01 00:00:04', 1, 'b', 0.0, '{}')
        ) t(event_id, ts, user_id, event_type, value, props)
    """)
    row = con.execute(
        SQL_RANK_DEGREE_CORR).fetch_arrow_table().to_pylist()[0]
    assert row["corr"] is None  # od(a) == od(b): zero variance

    sf = "/root/testdata/sf0.001"
    ret = {r["source"]: r for r in _source_retention(spark, sf).collect()}
    docs = _docs(spark, sf).select("doc_id", "source")
    clu = _dedup_clusters(spark, sf).where("NOT keep").select("doc_id")
    dropped = dict(
        docs.join(clu, "doc_id").groupBy("source").count().collect()
    )
    for src, r in ret.items():
        assert r["n_dropped"] == dropped.get(src, 0)
        assert r["retention"] == round(
            (r["n_docs"] - r["n_dropped"]) / r["n_docs"], 9)
