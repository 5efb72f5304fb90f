"""Similarity search over an embedding column (``array<float>``).

- ``cosine_scores`` / ``cosine_topk``: brute-force exact cosine — the
  correctness baseline, built from higher-order array functions
  (``zip_with`` + ``aggregate``), JVM-side, no Python UDFs.  Both have
  DuckDB oracle twins (``list_cosine_similarity`` over DOUBLE[]);
  ranking ties are broken on (rounded cosine desc, vec_id asc) so the
  top-k is deterministic across engines.
- ``ann_lsh_topk`` / ``ivf_topk``: the scale paths — random-hyperplane
  LSH buckets (or IVF inverted lists) so each query only scores its own
  bucket / probed cells (sub-linear work, approximate recall).  Both
  structures are derived deterministically (md5-bit hyperplanes,
  lowest-vec_id centroids), so both have EXACT DuckDB oracle twins
  (queries_text.SQL_ANN_LSH_TOPK / SQL_IVF_TOPK) in addition to the
  pytest'd recall-vs-exact bounds.

Scale notes: brute force is a broadcast (queries) × scan (corpus) —
embarrassingly parallel, no shuffle; LSH adds one groupBy on
(bucket), uniformly distributed by construction.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_scores(
    spark: SparkSession, embeddings: DataFrame, n_queries: int = 3
) -> DataFrame:
    """Exact cosine of the ``n_queries`` lowest vec_ids against the
    whole corpus (excluding self): (query_id, vec_id, cosine@6dp)."""
    emb = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("e"))
    queries = (
        emb.orderBy("vec_id").limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("q"))
    )
    joined = emb.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("q"), F.col("e")) / (
        F.sqrt(_dot(F.col("q"), F.col("q"))) * F.sqrt(_dot(F.col("e"), F.col("e")))
    )
    return joined.select(
        "query_id", "vec_id", F.round(cos, 6).alias("cosine")
    )


def cosine_topk(
    spark: SparkSession, embeddings: DataFrame, n_queries: int = 3, k: int = 10
) -> DataFrame:
    """Deterministic exact top-k per query: rank on (cosine@6dp desc,
    vec_id asc)."""
    scores = cosine_scores(spark, embeddings, n_queries)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dups(
    spark: SparkSession,
    embeddings: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 6,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection (the dedup-pipeline
    flavor of similarity search): candidate pairs are blocked on the
    engine's own hyperplane-LSH bucket (self-contained, sub-quadratic —
    the pair space is Σ_bucket n_b², not n²), then verified with exact
    cosine.  ``block_col`` substitutes an externally supplied coarse
    partitioner (cluster id, IVF cell) for the LSH bucket.  Returns
    (vec_a, vec_b, cosine@6dp) for pairs at or above ``threshold``.

    Scale note: identical vectors always share an LSH bucket (equal
    sign patterns), so exact duplicates have recall 1.0; near-dup
    recall rises with cosine and falls with ``n_planes`` (more planes =
    smaller buckets = less verify work)."""
    if block_col is None:
        dim = embeddings.select(F.size("embedding").alias("d")).first()["d"]
        e = embeddings.select(
            "vec_id", _as_double(F.col("embedding")).alias("e")
        ).withColumn("blk", _bucket_expr(_hyperplanes(dim, n_planes)))
    else:
        e = embeddings.select(
            "vec_id",
            F.col(block_col).alias("blk"),
            _as_double(F.col("embedding")).alias("e"),
        )
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = _dot(F.col("a.e"), F.col("b.e")) / (
        F.sqrt(_dot(F.col("a.e"), F.col("a.e")))
        * F.sqrt(_dot(F.col("b.e"), F.col("b.e")))
    )
    return pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(cos, 6).alias("cosine"),
    ).where(F.col("cosine") >= threshold)


def _hyperplanes(dim: int, n_planes: int, salt: int = 0) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign p,d from a bit of
    md5(f"{p}:{d}") — or md5(f"t{salt}:{p}:{d}") for the extra tables
    of the multi-table index (salt 0 keeps the original derivation so
    every existing bucket/oracle constant is unchanged).  No RNG,
    reproducible everywhere (the DuckDB oracle twins inline the same
    constants)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            key = f"{p}:{d}" if salt == 0 else f"t{salt}:{p}:{d}"
            h = hashlib.md5(key.encode()).digest()[0]
            row.append(1.0 if h & 1 else -1.0)
        planes.append(row)
    return planes


def _bucket_expr(planes: list[list[float]]):
    """Hyperplane signature of the ``e`` column: fold the sign bits in
    plane order (acc*2 + bit), so plane 0 is the high bit."""
    planes_col = F.array(*[F.array(*[F.lit(v) for v in row]) for row in planes])
    return F.aggregate(
        planes_col,
        F.lit(0),
        lambda acc, plane: acc * 2
        + F.when(_dot(plane, F.col("e")) > 0, F.lit(1)).otherwise(F.lit(0)),
    )


def ivf_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    n_queries: int = 3,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-flat approximate top-k: a coarse quantizer of ``n_cells``
    centroids partitions the corpus into inverted lists; each query
    scores only its ``n_probe`` nearest cells — the classic
    sub-linear ANN structure complementing the hyperplane-LSH variant
    (recall degrades near cell boundaries; n_probe trades scan cost
    back for recall).

    Centroids are the ``n_cells`` lowest vec_ids (deterministic
    sampling — no k-means loop; a production index would train them,
    which changes recall, not the plan shape).  Physical plan: corpus
    × broadcast(centroids) argmax assignment (one scan, no shuffle),
    then an equi-join on cell id — both sides hash-partitioned by the
    cell key, uniform by construction for random data.

    Returns (query_id, vec_id, cosine@6dp, rank).
    """
    emb = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    cents = (
        emb.orderBy("vec_id").limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("e").alias("c"))
    )
    ccos = _dot(F.col("c"), F.col("e")) / (
        F.sqrt(_dot(F.col("c"), F.col("c"))) * F.sqrt(_dot(F.col("e"), F.col("e")))
    )
    # cell ranking uses ROUNDED cosine (6dp) + cell-asc tie-break so the
    # assignment is deterministic across engines (the DuckDB oracle twin
    # ranks the same way; unrounded doubles could flip near-ties).
    scored_cells = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "e", "cell", F.round(ccos, 6).alias("ccos")
    )
    cell_rank = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cell")
    )
    ranked_cells = scored_cells.withColumn("crank", F.row_number().over(cell_rank))
    # inverted lists: every vector lives in exactly its nearest cell
    assigned = ranked_cells.where(F.col("crank") == 1).select(
        "vec_id", "e", "cell"
    )
    # queries probe their n_probe nearest cells
    queries = (
        emb.orderBy("vec_id").limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("q"))
    )
    qcells = (
        queries.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "q", "cell",
            F.round(
                _dot(F.col("c"), F.col("q")) / (
                    F.sqrt(_dot(F.col("c"), F.col("c")))
                    * F.sqrt(_dot(F.col("q"), F.col("q")))
                ),
                6,
            ).alias("qcos"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cell"))
            ),
        )
        .where(F.col("crank") <= n_probe)
        .select("query_id", "q", "cell")
    )
    joined = assigned.join(F.broadcast(qcells), "cell").where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("q"), F.col("e")) / (
        F.sqrt(_dot(F.col("q"), F.col("q"))) * F.sqrt(_dot(F.col("e"), F.col("e")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        joined.select("query_id", "vec_id", F.round(cos, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def ann_lsh_multitable_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    n_queries: int = 3,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 3,
) -> DataFrame:
    """Multi-table hyperplane LSH — the standard recall lever: L
    independent plane sets each bucket the corpus; a query's candidate
    set is the UNION of its L buckets (a true neighbor is missed only
    if every table splits the pair, so miss probability decays
    exponentially in L at L× the scan/memory cost).

    Physical plan: buckets are computed in one projection per side
    (posexplode to (table, bucket) rows), candidates found by a
    broadcast join against the tiny exploded query side, deduped with
    one distinct, then scored against the corpus via an equi-join on
    vec_id.  Returns (query_id, vec_id, cosine@6dp, rank)."""
    dim = embeddings.select(F.size("embedding").alias("d")).first()["d"]
    tables = [_hyperplanes(dim, n_planes, salt=t) for t in range(n_tables)]

    emb = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    ).withColumn("bks", F.array(*[_bucket_expr(p) for p in tables]))
    queries = (
        emb.orderBy("vec_id").limit(n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("q"),
            F.col("bks").alias("qbks"),
        )
    )
    flat = emb.select(
        "vec_id", F.posexplode("bks").alias("tbl", "bucket")
    )
    qflat = queries.select(
        "query_id", F.posexplode("qbks").alias("qtbl", "qbucket")
    )
    pairs = (
        flat.join(
            F.broadcast(qflat),
            (F.col("tbl") == F.col("qtbl"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = pairs.join(emb.select("vec_id", "e"), "vec_id").join(
        F.broadcast(queries.select("query_id", "q")), "query_id"
    )
    cos = _dot(F.col("q"), F.col("e")) / (
        F.sqrt(_dot(F.col("q"), F.col("q"))) * F.sqrt(_dot(F.col("e"), F.col("e")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.select("query_id", "vec_id", F.round(cos, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def ann_lsh_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    n_queries: int = 3,
    k: int = 10,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature buckets the
    corpus into ≤ 2^n_planes cells; each query scores only its own
    bucket.  Returns (query_id, vec_id, cosine@6dp, rank)."""
    first = embeddings.select(F.size("embedding").alias("d")).first()
    dim = first["d"]

    emb = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    ).withColumn("bucket", _bucket_expr(_hyperplanes(dim, n_planes)))
    queries = (
        emb.orderBy("vec_id").limit(n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("q"),
            F.col("bucket").alias("qbucket"),
        )
    )
    joined = emb.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    cos = _dot(F.col("q"), F.col("e")) / (
        F.sqrt(_dot(F.col("q"), F.col("q"))) * F.sqrt(_dot(F.col("e"), F.col("e")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        joined.select("query_id", "vec_id", F.round(cos, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def ivf_purity(
    spark: SparkSession,
    embeddings: DataFrame,
    n_cells: int = 16,
) -> DataFrame:
    """Label purity of the IVF inverted lists — the index-quality /
    clustering-evaluation read-out over ``ivf_topk``'s own coarse
    quantizer: per cell, how dominated is the list by one planted
    ``label``?  Low purity cells are where IVF recall dies (mixed
    lists force higher n_probe); a pipeline checks this before
    committing to an (n_cells, n_probe) operating point.

    Pinned semantics (exact DuckDB twin, queries_text.SQL_IVF_PURITY):
    - the assignment is BIT-IDENTICAL to ivf_topk's: n_cells lowest
      vec_ids as centroids, argmax of 6dp-ROUNDED cosine with
      cell-asc tie-break;
    - per cell: n_vectors, the majority label (ties -> MIN label),
      its count, purity = ONE rounded division of exact integers.

    Shape (design-for-100x): corpus x broadcast(centroids) argmax
    (one scan, no shuffle), then two hash aggregates keyed by cell /
    (cell, label) — n_cells x n_labels groups, trivially bounded.
    Returns (cell, n_vectors, majority_label, n_majority, purity).
    """
    from pyspark.sql import Window

    emb = embeddings.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("e"),
        F.col("label").cast("long").alias("label"),
    )
    cents = (
        emb.orderBy("vec_id").limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("e").alias("c"))
    )
    ccos = _dot(F.col("c"), F.col("e")) / (
        F.sqrt(_dot(F.col("c"), F.col("c")))
        * F.sqrt(_dot(F.col("e"), F.col("e")))
    )
    cell_rank = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cell")
    )
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", "label", "cell", F.round(ccos, 6).alias("ccos"))
        .withColumn("crank", F.row_number().over(cell_rank))
        .where(F.col("crank") == 1)
        .select("vec_id", "label", "cell")
    )
    by_label = assigned.groupBy("cell", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    maj_rank = Window.partitionBy("cell").orderBy(
        F.desc("n"), F.asc("label")
    )
    majority = (
        by_label.withColumn("mrank", F.row_number().over(maj_rank))
        .where(F.col("mrank") == 1)
        .select(
            "cell",
            F.col("label").alias("majority_label"),
            F.col("n").alias("n_majority"),
        )
    )
    totals = by_label.groupBy("cell").agg(
        F.sum("n").cast("long").alias("n_vectors")
    )
    return (
        totals.join(majority, "cell")
        .select(
            "cell", "n_vectors", "majority_label", "n_majority",
            F.round(
                F.col("n_majority").cast("double")
                / F.col("n_vectors").cast("double"), 9
            ).alias("purity"),
        )
    )


def ann_recall(
    spark: SparkSession,
    embeddings: DataFrame,
    n_queries: int = 3,
    k: int = 10,
    n_planes: int = 6,
) -> DataFrame:
    """Recall@k of the hyperplane-LSH ANN path measured against the
    exact brute-force top-k — the operational metric an ANN operating
    point is chosen by, computed entirely from the two already-pinned
    operators (``ann_lsh_topk`` vs ``cosine_topk``), so the result is
    deterministic by construction: recall = |approx ∩ exact| / k per
    query, exact integer intersection via an equi-join on
    (query_id, vec_id), ONE rounded division.

    Shape (design-for-100x): both inputs are top-k tables
    (n_queries x k rows) — the join and aggregate are trivially
    bounded; ALL the heavy lifting lives in the audited underlying
    operators.  Returns (query_id, n_hits, recall).
    """
    exact = cosine_topk(spark, embeddings, n_queries=n_queries, k=k)
    approx = ann_lsh_topk(
        spark, embeddings, n_queries=n_queries, k=k, n_planes=n_planes
    )
    hits = (
        exact.select("query_id", "vec_id")
        .join(approx.select("query_id", "vec_id"), ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    # queries whose approx list shares nothing with the exact list
    # still report (n_hits = 0)
    qids = exact.select("query_id").distinct()
    return (
        qids.join(hits, "query_id", "left_outer")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)).cast("double") / float(k), 9
            ).alias("recall"),
        )
    )


def dim_truncation_recall(
    spark: SparkSession,
    embeddings: DataFrame,
    dims: tuple = (8, 16, 32),
    n_queries: int = 3,
    k: int = 10,
) -> DataFrame:
    """Matryoshka-style dimension-truncation read-out (Kusupati et al.
    NeurIPS 2022): recall@k of exact top-k computed on the FIRST d
    dimensions against the full-dimension exact top-k — the curve an
    embedding-serving plan reads before trading index size for recall
    (truncate-then-index is the standard MRL deployment).

    Deterministic by construction: both rankings are the pinned
    cosine_topk contract (cosine@6dp DESC, vec_id ASC); recall is an
    exact integer intersection via an equi-join, ONE rounded division;
    zero-overlap queries surface as recall 0.0 (left join).

    Shape (design-for-100×): the truncation is a JVM slice projection
    — no Python, no shuffle; each rung reruns the already-audited
    brute-force kernel on a SHORTER vector (strictly cheaper than the
    full-dim pass); the joins are over n_queries·k-row tables."""
    exact = cosine_topk(spark, embeddings, n_queries=n_queries, k=k)
    qids = exact.select("query_id").distinct()
    out = None
    for d in dims:
        trunc = embeddings.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        approx = cosine_topk(spark, trunc, n_queries=n_queries, k=k)
        hits = (
            exact.select("query_id", "vec_id")
            .join(approx.select("query_id", "vec_id"),
                  ["query_id", "vec_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        )
        rung = qids.join(hits, "query_id", "left_outer").select(
            F.lit(d).cast("long").alias("dim"),
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)).cast("double") / F.lit(float(k)),
                9,
            ).alias("recall"),
        )
        out = rung if out is None else out.unionByName(rung)
    return out
