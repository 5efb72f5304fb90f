"""Deterministic Lloyd's k-means (functions/clustering.py): engine vs
a python replication of the pinned loop (seed-by-lowest-id init,
ROUND(d2,6)+cell argmin, ROUND(avg,6) centroid update, empty cells
keep their centroid)."""

import pytest

from pyspark.sql import types as T

from mesos_pregel_spark.functions.clustering import kmeans


def _py_kmeans(rows, k, iters):
    import struct

    def f32(x):
        # the DataFrame column is float32: narrow exactly as Spark does
        return struct.unpack("f", struct.pack("f", x))[0]

    rows = [(vid, [f32(x) for x in v]) for vid, v in rows]
    cents = {vid: list(map(float, v)) for vid, v in sorted(rows)[:k]}

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return round(acc, 6)

    def assign():
        out = {}
        for vid, v in rows:
            v = list(map(float, v))
            out[vid] = min(
                ((d2(v, c), cell) for cell, c in cents.items())
            )
        return out  # vid -> (dist2, cell)

    for _ in range(iters):
        a = assign()
        groups = {}
        for vid, v in rows:
            groups.setdefault(a[vid][1], []).append(list(map(float, v)))
        for cell, vs in groups.items():
            dim = len(vs[0])
            cents[cell] = [
                round(sum(v[i] for v in vs) / len(vs), 6) for i in range(dim)
            ]
    return assign()


def _df(spark, rows):
    schema = T.StructType([
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ])
    return spark.createDataFrame(
        [(vid, [float(x) for x in v]) for vid, v in rows], schema=schema
    )


def _mk_rows(n=40, dim=6, seed=3):
    import random
    rnd = random.Random(seed)
    return [
        (i, [round(rnd.uniform(-1, 1), 4) for _ in range(dim)])
        for i in range(n)
    ]


def test_matches_python_replication(spark):
    rows = _mk_rows()
    got = {
        r["vec_id"]: (r["dist2"], r["cell"])
        for r in kmeans(spark, _df(spark, rows), k=4, iters=3).collect()
    }
    assert got == _py_kmeans(rows, k=4, iters=3)


def test_empty_cell_keeps_centroid(spark):
    # seeds are vec_ids 0..2; vec 2 duplicates vec 0, so every point
    # ties between cells 0 and 2 and the cell-asc tie-break starves
    # cell 2 — the run must not drop or NaN it.
    rows = _mk_rows(n=12, dim=4, seed=9)
    rows[2] = (2, list(rows[0][1]))
    got = {
        r["vec_id"]: (r["dist2"], r["cell"])
        for r in kmeans(spark, _df(spark, rows), k=3, iters=2).collect()
    }
    exp = _py_kmeans(rows, k=3, iters=2)
    assert got == exp
    # iteration 1 starves cell 2 (tie-break to cell 0); the retained
    # centroid may legitimately win points back once cell 0 moves —
    # the equality above pins that path on both sides.


def test_single_iteration_prefix(spark):
    rows = _mk_rows(n=20, dim=3, seed=5)
    got = {
        r["vec_id"]: (r["dist2"], r["cell"])
        for r in kmeans(spark, _df(spark, rows), k=3, iters=1).collect()
    }
    assert got == _py_kmeans(rows, k=3, iters=1)


def test_cluster_balanced_sample(spark):
    from mesos_pregel_spark.functions.clustering import (
        cluster_balanced_sample,
        kmeans,
    )

    rows = _mk_rows(n=60, dim=4, seed=13)
    df = _df(spark, rows)
    picked = cluster_balanced_sample(
        spark, df, k=3, iters=2, per_cell=5
    ).collect()
    cells = {}
    for r in picked:
        cells.setdefault(r["cell"], []).append((r["pick"], r["vec_id"]))
    # at most per_cell picks per cell, ranks contiguous from 1
    for cell, picks in cells.items():
        assert len(picks) <= 5
        assert sorted(p for p, _v in picks) == list(range(1, len(picks) + 1))
    # picks are drawn from the cell's actual kmeans assignment
    assign = {
        r["vec_id"]: r["cell"]
        for r in kmeans(spark, df, k=3, iters=2).collect()
    }
    for r in picked:
        assert assign[r["vec_id"]] == r["cell"]
    # md5 order is the pick order within a cell
    import hashlib
    for cell, picks in cells.items():
        members = sorted(
            (hashlib.md5(f"cbs42|{v}".encode()).hexdigest(), v)
            for _p, v in picks
        )
        by_rank = [v for _p, v in sorted(picks)]
        assert by_rank == [v for _h, v in members]


# ---------------------------------------------------------------------------
# kmeanspp_seeds (farthest-point seeding)
# ---------------------------------------------------------------------------


def test_kmeanspp_matches_python_and_spreads(spark):
    """Python replication of the derandomized farthest-point rule,
    plus the spread property: on three planted clusters, the first 3
    seeds land in 3 DIFFERENT clusters (the failure of lowest-id init
    this operator exists to fix)."""
    from mesos_pregel_spark.functions.clustering import kmeanspp_seeds

    clusters = {
        0: [0.0, 0.0], 1: [10.0, 0.0], 2: [0.0, 10.0],
    }
    rows = []
    vid = 0
    for c, base in clusters.items():
        for i in range(4):
            rows.append(
                (vid, [base[0] + 0.1 * i, base[1] + 0.05 * i], c))
            vid += 1
    emb = spark.createDataFrame(
        [(v, [float(x) for x in e], c) for v, e, c in rows],
        "vec_id long, embedding array<float>, label int",
    )
    got = [
        (r["rank"], r["vec_id"], r["sep_dist2"])
        for r in kmeanspp_seeds(spark, emb, k=4).orderBy("rank").collect()
    ]

    # python replication (float32 narrowing via the stored embedding)
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    vecs = {v: [f32(x) for x in e] for v, e, _c in rows}

    def d2(a, b):
        return round(sum((x - y) ** 2 for x, y in zip(a, b)), 6)

    seeds = [min(vecs)]
    exp = [(1, seeds[0], None)]
    for rank in range(2, 5):
        best = None
        for v, e in vecs.items():
            mind = min(d2(e, vecs[s]) for s in seeds)
            key = (-mind, v)
            if best is None or key < best[0]:
                best = (key, v, mind)
        seeds.append(best[1])
        exp.append((rank, best[1], best[2]))
    assert got == exp
    # spread: first three seeds hit three different planted clusters
    lab = {v: c for v, _e, c in rows}
    assert len({lab[v] for _r, v, _d in got[:3]}) == 3
