"""algos/wl.py vs an exact-recipe python replication, plus the
classic WL sanity pins: vertex-transitive graphs collapse to one
color, isomorphic components get identical color multisets, and a
path's colors are symmetric around its center."""

import hashlib

from mesos_pregel_spark.algos.wl import wl_colors


def _py_wl(edges, rounds=3):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    color = {v: str(len(ns)) for v, ns in nbrs.items()}
    for _ in range(rounds):
        color = {
            v: hashlib.md5(
                (color[v] + "|" + ",".join(sorted(color[u] for u in ns)))
                .encode()
            ).hexdigest()
            for v, ns in nbrs.items()
        }
    sizes = {}
    for c in color.values():
        sizes[c] = sizes.get(c, 0) + 1
    return {v: (c, sizes[c]) for v, c in color.items()}


def _df(spark, edges, parts=4):
    return spark.createDataFrame(
        [(int(min(a, b)), int(max(a, b))) for a, b in edges],
        "src long, dst long",
    ).repartition(parts)


def test_wl_matches_recipe_oracle(spark):
    import random

    rng = random.Random(23)
    edges = list({tuple(sorted((rng.randrange(14), rng.randrange(14))))
                  for _ in range(45)})
    edges = [(a, b) for a, b in edges if a != b]
    got = {r["id"]: (r["wl_color"], r["class_size"])
           for r in wl_colors(spark, _df(spark, edges)).collect()}
    assert got == _py_wl(edges)


def test_wl_cycle_is_one_class(spark):
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    got = wl_colors(spark, _df(spark, edges)).collect()
    assert {r["wl_color"] for r in got} == {got[0]["wl_color"]}
    assert all(r["class_size"] == n for r in got)


def test_wl_path_symmetry_and_refinement(spark):
    """Path 0-1-2-3-4: WL distinguishes ends / next-to-ends / center —
    3 classes, mirror-symmetric (0~4, 1~3)."""
    got = {r["id"]: r["wl_color"] for r in
           wl_colors(spark, _df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)]))
           .collect()}
    assert got[0] == got[4]
    assert got[1] == got[3]
    assert len({got[0], got[1], got[2]}) == 3


def test_wl_isomorphic_components_share_colors(spark):
    """Two disjoint triangles: all six vertices one class."""
    edges = [(1, 2), (2, 3), (1, 3), (11, 12), (12, 13), (11, 13)]
    got = wl_colors(spark, _df(spark, edges)).collect()
    assert len({r["wl_color"] for r in got}) == 1
    assert all(r["class_size"] == 6 for r in got)
