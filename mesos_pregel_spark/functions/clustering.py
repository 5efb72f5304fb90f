"""Embedding clustering — deterministic Lloyd's k-means over an
``array<float>`` column.  Complements the IVF index
(functions/similarity.py, whose coarse quantizer is deterministic
sampling and whose docstring defers centroid TRAINING to this
operator) and gives the training-data pipeline its standard
corpus-partitioning primitive (cluster-balanced sampling, dedup
within semantic cells, topic bucketing).

Pinned semantics (cross-engine determinism first):

- init: centroids = the k lowest ``vec_id`` vectors (deterministic
  sampling, same convention as ivf_topk).
- assignment: argmin of ROUND(squared-L2, 6) with cell-ascending
  tie-break — rounding collapses float summation-order ulps between
  engines (the recipe every cosine/IVF twin in this repo uses).
- update: per-dimension mean, each component ROUNDED to 6dp — the
  rounding re-synchronizes both engines' centroids every iteration,
  so drift can never accumulate.  Cells with no assigned vectors
  keep their previous centroid.
- fixed ``iters`` (assign, update) pairs, then one final assignment
  under the trained centroids — the returned rows.

Execution shape (design-for-100x): centroids are tiny (k x dim
doubles) and live as LITERAL expressions — assignment is ONE
projection over the corpus per iteration (k fused zip_with/aggregate
folds inside whole-stage codegen, no shuffle, no UDF); the update is
one posexplode + hash aggregate (k x dim groups).  The only
driver-side data is the k x dim centroid table per iteration —
O(k*dim), independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dist2(e, cvec: list[float]):
    """ROUND(squared-L2(e, literal centroid), 6) as a column."""
    lit = F.array(*[F.lit(float(x)) for x in cvec])
    return F.round(
        F.aggregate(
            F.zip_with(e, lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def kmeans(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    return_centroids: bool = False,
) -> "DataFrame | tuple[DataFrame, dict]":
    """Train deterministic k-means and return the final assignment:
    (vec_id, cell, dist2).  ``cell`` is the seed vector's vec_id.
    With ``return_centroids`` also returns the trained {cell:
    [double, ...]} codebook (PQ and ADC consumers need the vectors,
    not just the assignment)."""
    emb = embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    ).persist()
    seeds = emb.orderBy("vec_id").limit(k).collect()
    cents: dict = {r["vec_id"]: list(r["e"]) for r in seeds}

    def assign() -> DataFrame:
        pairs = F.array(*[
            F.struct(
                _dist2(F.col("e"), vec).alias("d2"),
                F.lit(cell).alias("cell"),
            )
            for cell, vec in sorted(cents.items())
        ])
        best = F.array_sort(pairs)[0]
        return emb.select(
            "vec_id", "e",
            best["cell"].alias("cell"), best["d2"].alias("dist2"),
        )

    for _ in range(iters):
        assigned = assign()
        upd = (
            assigned.select("cell", F.posexplode("e").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.round(F.avg("val"), 6).alias("cm"))
            .collect()
        )
        new: dict = {}
        for r in upd:
            new.setdefault(r["cell"], {})[r["dim"]] = r["cm"]
        # empty cells keep their previous centroid
        cents = {
            cell: (
                [new[cell][i] for i in range(len(vec))]
                if cell in new else vec
            )
            for cell, vec in cents.items()
        }

    out = assign().select("vec_id", "cell", "dist2").localCheckpoint()
    emb.unpersist()
    if return_centroids:
        return out, cents
    return out


def cluster_balanced_sample(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    per_cell: int = 10,
    seed: str = "cbs42",
) -> DataFrame:
    """Cluster-balanced corpus sampling: train k-means, then keep the
    ``per_cell`` deterministically-lowest md5(seed|vec_id) vectors in
    every cell — equal representation across semantic cells regardless
    of cell size (the standard defense against majority-topic capture
    when subsampling a corpus for training).

    Pure composition of two pinned primitives (kmeans + md5-order
    pick), so the DuckDB twin is the kmeans unroll plus one window.
    Returns (vec_id, cell, pick) for kept rows, pick = 1..per_cell in
    md5 order.
    """
    from pyspark.sql import Window

    assigned = kmeans(spark, embeddings, k=k, iters=iters)
    u = F.md5(F.concat(F.lit(seed + "|"), F.col("vec_id").cast("string")))
    w = Window.partitionBy("cell").orderBy(u.asc(), F.col("vec_id").asc())
    return (
        assigned.withColumn("pick", F.row_number().over(w).cast("int"))
        .where(F.col("pick") <= per_cell)
        .select("vec_id", "cell", "pick")
    )


def kmeanspp_seeds(
    spark: SparkSession, embeddings: DataFrame, k: int = 8
) -> DataFrame:
    """Deterministic k-means++-style FARTHEST-POINT seeding (Arthur-
    Vassilvitskii 2007 derandomized the way every sampler here is:
    the argmax replaces the D²-weighted draw, Gonzalez 1985's 2-approx
    k-center rule): seed 1 = the lowest vec_id; each next seed is the
    vector FARTHEST from its nearest already-chosen seed (squared-L2
    rounded 6dp, vec_id-ascending tie-break).  Spread-out seeds are
    the standard fix for Lloyd's sensitivity to the ``k lowest ids``
    init that the pinned ``kmeans`` uses — run this first, feed the
    returned ids as the centroid init.

    Pinned semantics (exact DuckDB twin in queries_text.py): distances
    via the shared ROUND(squared-L2, 6) recipe; the per-vector
    min-over-seeds compares ROUNDED doubles so engine summation-order
    ulps cannot flip an argmax; ``sep_dist2`` = the distance to the
    nearest prior seed at pick time (NULL for seed 1 — there is no
    prior).

    Shape (design-for-100x): k−1 rounds; each is ONE projection over
    the corpus (≤ k−1 fused literal-vector distance folds inside
    whole-stage codegen) + a 1-row TakeOrdered — driver traffic
    O(k·dim) total, corpus never shuffles.  Returns
    (rank, vec_id, sep_dist2).
    """
    emb = embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    ).persist()
    first = emb.orderBy("vec_id").limit(1).collect()[0]
    seeds = [(int(first["vec_id"]), list(first["e"]), None)]
    for _ in range(k - 1):
        mind = F.array_min(
            F.array(*[_dist2(F.col("e"), vec) for _sid, vec, _d in seeds])
        )
        nxt = (
            emb.select("vec_id", "e", mind.alias("mind"))
            .orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        seeds.append((int(nxt["vec_id"]), list(nxt["e"]), float(nxt["mind"])))
    emb.unpersist()
    return spark.createDataFrame(
        [(r + 1, sid, d) for r, (sid, _v, d) in enumerate(seeds)],
        "rank int, vec_id long, sep_dist2 double",
    )


def pq_adc_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    topk: int = 10,
) -> DataFrame:
    """Product quantization with asymmetric-distance top-k (Jégou-
    Douze-Schmid TPAMI 2011 — the codebook ANN path beside flat /
    LSH / IVF): the vector splits into two subspaces, each trained
    with the deterministic k-means above (k codewords, smallest-
    vec_id seeding), every vector encodes as two cell ids, and a
    query ranks the corpus by the ADC estimate
    Σ_s d²(query_sub_s, codeword[code_s]) — a per-vector LOOKUP of
    two precomputed distances instead of a D-dim scan.

    Query = the smallest vec_id (the cosine-stack convention).
    Determinism: codebooks are the audited kmeans recipe (6dp-rounded
    centroids/distances, (d2, cell) argmin); the per-cell ADC entries
    are the same ROUND(squared-L2, 6) fold; the final estimate is ONE
    addition of two 6dp doubles rounded once more.

    Scale shape (design-for-100×): training touches the corpus
    2·iters times (k literal-centroid folds per pass, the kmeans
    shape); ENCODE + ADC is ONE projection over the corpus — both
    codebooks are driver-side literal dicts, so each vector's two
    codes AND their ADC lookups evaluate as fused literal expressions
    in the same whole-stage-codegen pass (no corpus-side join, no
    shuffle of the vector table at any point) + a TakeOrdered; the
    10⁹-vector regime stores two SMALLINT codes per vector instead of
    D floats (the entire point of PQ)."""
    emb = embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    ).persist()
    first = emb.orderBy("vec_id").limit(1).collect()[0]
    dim = len(first["e"])
    half = dim // 2
    q0 = list(first["e"][:half])
    q1 = list(first["e"][half:])

    sub0 = emb.select("vec_id", F.slice("e", 1, half).alias("embedding"))
    sub1 = emb.select(
        "vec_id", F.slice("e", half + 1, dim - half).alias("embedding")
    )
    _a0, c0 = kmeans(spark, sub0, k=k, iters=iters, return_centroids=True)
    _a1, c1 = kmeans(spark, sub1, k=k, iters=iters, return_centroids=True)

    def code_expr(cents: dict, e_slice):
        # the kmeans assign() recipe verbatim: argmin of
        # (ROUND(d2, 6), cell) via array_sort — same tie-break, same
        # rounding, so the encoded cell equals the kmeans assignment
        pairs = F.array(*[
            F.struct(
                _dist2(e_slice, vec).alias("d2"),
                F.lit(cell).alias("cell"),
            )
            for cell, vec in sorted(cents.items())
        ])
        return F.array_sort(pairs)[0]["cell"]

    def adc_expr(cents: dict, qsub: list, code_col):
        # k-entry literal lookup: the distance table rides the same
        # projection as the code (python-side d2 would not mirror the
        # twin's in-SQL fold, so each entry is the _dist2 fold between
        # two literal arrays, evaluated by the engine itself)
        expr = F.lit(None).cast("double")
        for cell, vec in sorted(cents.items()):
            lit_cv = F.array(*[F.lit(float(x)) for x in vec])
            d = F.round(
                F.aggregate(
                    F.zip_with(lit_cv, F.array(*[F.lit(float(x)) for x in qsub]),
                               lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            )
            expr = F.when(code_col == F.lit(cell), d).otherwise(expr)
        return expr

    k0 = code_expr(c0, F.slice("e", 1, half))
    k1 = code_expr(c1, F.slice("e", half + 1, dim - half))
    out = (
        emb.select(
            "vec_id",
            F.round(
                adc_expr(c0, q0, k0) + adc_expr(c1, q1, k1), 6
            ).alias("adc"),
        )
        .orderBy("adc", "vec_id")
        .limit(topk)
        .localCheckpoint()
    )
    emb.unpersist()
    return out
