"""Driver-contract queries for the training-data-pipeline operators
(text analysis, dedup, similarity search, multimodal) with their
DuckDB oracle twins.  Merged into the main registry by queries.py.

Shared determinism contract (see functions/text.py): normalization =
``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``; tokens =
single-space split of the normalized text; hashes = md5 hex; floats
rounded at a pinned precision on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.functions.dedup import (
    DEFAULT_BANDS,
    DEFAULT_K,
    SIMHASH_BITS,
    dup_source_matrix,
    exact_duplicates,
    lsh_candidates,
    near_duplicates,
    release_dedup_caches,
    overlap_candidates,
    simhash,
    simhash_candidates,
    span_dedup_stats,
    winnow_fingerprints,
)


def _eager_release(df: DataFrame) -> DataFrame:
    """Driver-path cache hygiene (ADVICE r3): the dedup operators
    persist shingle/signature/candidate intermediates in a module
    registry; materialize the query's result ONCE (localCheckpoint) and
    release the registry immediately, so a long-lived driver session
    running many queries does not accumulate cached tables.  The
    checkpointed result itself is cleaned by Spark's ContextCleaner
    when the caller drops it."""
    out = df.localCheckpoint(eager=True)
    release_dedup_caches()
    return out
from mesos_pregel_spark.functions.similarity import (
    ann_lsh_multitable_topk,
    ann_lsh_topk,
    cosine_scores,
    cosine_topk,
    ann_recall,
    dim_truncation_recall,
    embedding_near_dups,
    ivf_purity,
    ivf_topk,
)
from mesos_pregel_spark.functions.pipeline import clean_corpus
from mesos_pregel_spark.functions.text import (
    approx_vocab,
    bm25_topk,
    tfidf_topk,
    tokens_col,
    unigram_logprob,
    bigram_logprob,
    LANG_STOPWORDS,
    PII_PATTERNS,
    fertility_stats,
    fingerprint,
    lexical_pairs,
    language_id,
    pii_redact,
    quality_score,
    repetition_stats,
    token_stats,
)
from mesos_pregel_spark.sources.multimodal import decode_features, synthesize_media
from mesos_pregel_spark.functions.clustering import (
    pq_adc_topk,
    cluster_balanced_sample,
    kmeans,
    kmeanspp_seeds,
)
from mesos_pregel_spark.functions.composition import (
    doc_kl_outliers,
    heaps_law,
    length_histogram,
    ngram_hotspots,
    pmi_topk,
    source_kl,
    source_mix,
    textrank,
    vocab_stats,
)
from mesos_pregel_spark.functions.decontam import decontaminate, ngram_novelty
from mesos_pregel_spark.functions.packing import chunk_windows, pack_concat
from mesos_pregel_spark.functions.sampling import (
    sample_to_token_budget,
    stratified_sample,
    uniform_col,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# SQL building blocks
# ---------------------------------------------------------------------------

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

_SQL_STATS = f"""
WITH base AS (
  SELECT doc_id, text,
         {_NORM} AS norm,
         string_split({_NORM}, ' ') AS toks
  FROM documents
),
stats AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT)
           AS n_punct,
         CAST(len(list_filter(toks, t -> t IN ('the','and','of','to','is')))
           AS BIGINT) AS n_stop
  FROM base
),
token_stats AS (
  SELECT doc_id, n_chars, n_tokens,
         ROUND(CAST(n_chars AS DOUBLE) / GREATEST(n_tokens, 1), 9)
           AS avg_token_len,
         ROUND(CAST(n_punct AS DOUBLE) / GREATEST(n_chars, 1), 9)
           AS punct_ratio,
         ROUND(CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1), 9)
           AS stopword_ratio
  FROM stats
)
"""

SQL_TOKEN_STATS = _SQL_STATS + "SELECT * FROM token_stats"

SQL_QUALITY = _SQL_STATS + """
SELECT doc_id,
       ROUND((LEAST(n_tokens / 100.0, 1.0)
            + LEAST(stopword_ratio * 5.0, 1.0)
            + GREATEST(0.0, 1.0 - punct_ratio * 5.0)) / 3.0, 9) AS quality
FROM token_stats
"""


def _sql_lang_id() -> str:
    cnts = ",\n         ".join(
        f"CAST(len(list_filter(toks, t -> t IN "
        f"({', '.join(repr(w) for w in sw)}))) AS BIGINT) AS cnt_{lang}"
        for lang, sw in LANG_STOPWORDS.items()
    )
    langs = list(LANG_STOPWORDS)
    best = f"GREATEST({', '.join('cnt_' + lang for lang in langs)})"
    case = "CASE WHEN " + best + " <= 0 THEN 'und'\n"
    for lang in langs:
        case += f"            WHEN cnt_{lang} = {best} THEN '{lang}'\n"
    case += "       END"
    return f"""
WITH base AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
),
counted AS (
  SELECT doc_id,
         {cnts}
  FROM base
)
SELECT doc_id, {case} AS lang_pred FROM counted
"""


SQL_LANG_ID = _sql_lang_id()

SQL_FINGERPRINT = f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents"

SQL_DEDUP_EXACT = f"""
WITH fp AS (SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents),
canon AS (
  SELECT fingerprint, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size
  FROM fp GROUP BY fingerprint
)
SELECT fp.doc_id, canon.canonical_id,
       fp.doc_id <> canon.canonical_id AS is_duplicate,
       canon.group_size
FROM fp JOIN canon ON fp.fingerprint = canon.fingerprint
"""


def _sql_shingle_prelude(n: int = 5) -> str:
    return f"""
WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           [substr(t, i, {n}) FOR i IN
            generate_series(1, GREATEST(length(t) - {n - 1}, 1))]
         )) AS shingle
  FROM norm
)
"""


def _sql_minhash_sig(k: int = DEFAULT_K) -> str:
    mins = ",\n         ".join(
        f"MIN(md5('{i}:' || shingle)) AS mh{i}" for i in range(k)
    )
    return f""",
sig AS (
  SELECT doc_id,
         {mins}
  FROM sh GROUP BY doc_id
)
"""


def _sql_banded(k: int = DEFAULT_K, bands: int = DEFAULT_BANDS) -> str:
    r = k // bands
    parts = []
    for j in range(bands):
        key = " || '|' || ".join(f"mh{j * r + t}" for t in range(r))
        parts.append(
            f"SELECT {j} AS band_idx, {key} AS band_key, doc_id FROM sig"
        )
    union = "\n  UNION ALL ".join(parts)
    return f""",
banded AS (
  {union}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
)
"""


SQL_LSH_CANDIDATES = (
    _sql_shingle_prelude() + _sql_minhash_sig() + _sql_banded()
    + "SELECT doc_a, doc_b FROM cand"
)

SQL_NEAR_DUPLICATES = (
    _sql_shingle_prelude() + _sql_minhash_sig() + _sql_banded()
    + """,
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE)
             / (na.n_sh + nb.n_sh - COALESCE(i.inter, 0)), 9) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes na ON na.doc_id = c.doc_a
JOIN sizes nb ON nb.doc_id = c.doc_b
"""
)


def _sql_simhash(bits: int = SIMHASH_BITS) -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits)
    )
    sig = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END" for j in range(bits)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS token FROM documents
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h FROM tok
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes
"""


SQL_SIMHASH = _sql_simhash()

_SQL_COS = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e ORDER BY vec_id LIMIT 3),
scores AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cosine
  FROM q, e WHERE e.vec_id <> q.query_id
)
"""

SQL_COSINE_SCORES = _SQL_COS + "SELECT query_id, vec_id, cosine FROM scores"

# Embedding near-dup verification: pairs blocked on the engine's OWN
# hyperplane-LSH bucket (same deterministic ±1 planes as
# similarity._hyperplanes, inlined as literals on both sides), exact
# cosine at 6dp.  Threshold 0.35 chosen by inspection so sf0.01's
# random embeddings yield a NON-EMPTY result (~17 pairs) — values are
# actually compared, not just two empty sets.
EMBED_NEAR_DUP_THRESHOLD = 0.35
_EMBED_DIM = 64  # driver testdata embeddings are 64-d (TESTDATA.md)
_EMBED_PLANES = 6


def _sql_embedding_near_dups(
    threshold: float = EMBED_NEAR_DUP_THRESHOLD,
    dim: int = _EMBED_DIM,
    n_planes: int = _EMBED_PLANES,
) -> str:
    from mesos_pregel_spark.functions.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes)
    terms = []
    for p, row in enumerate(planes):
        lit = "[" + ", ".join(str(v) for v in row) + "]::DOUBLE[]"
        weight = 2 ** (n_planes - 1 - p)
        terms.append(
            f"(CASE WHEN list_dot_product({lit}, v) > 0 "
            f"THEN {weight} ELSE 0 END)"
        )
    bucket = "\n       + ".join(terms)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (
  SELECT vec_id, v,
         {bucket} AS blk
  FROM e
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
  FROM b a JOIN b b ON a.blk = b.blk AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= {threshold}
"""


SQL_EMBEDDING_NEAR_DUPS = _sql_embedding_near_dups()

SQL_COSINE_TOPK = _SQL_COS + """
, ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scores
)
SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


def _sql_ann_lsh_topk(
    dim: int = _EMBED_DIM, n_planes: int = _EMBED_PLANES, k: int = 10
) -> str:
    """Exact twin of similarity.ann_lsh_topk: the deterministic ±1
    hyperplanes are inlined as literals (same md5-bit derivation), the
    bucket fold uses the same plane-0-is-high-bit weights, and ranking
    matches (cosine@6dp desc, vec_id asc)."""
    from mesos_pregel_spark.functions.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes)
    terms = []
    for p, row in enumerate(planes):
        lit = "[" + ", ".join(str(v) for v in row) + "]::DOUBLE[]"
        weight = 2 ** (n_planes - 1 - p)
        terms.append(
            f"(CASE WHEN list_dot_product({lit}, v) > 0 "
            f"THEN {weight} ELSE 0 END)"
        )
    bucket = "\n       + ".join(terms)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (
  SELECT vec_id, v,
         {bucket} AS blk
  FROM e
),
q AS (
  SELECT vec_id AS query_id, v AS qv, blk AS qblk
  FROM b ORDER BY vec_id LIMIT 3
),
scores AS (
  SELECT q.query_id, b.vec_id,
         ROUND(list_cosine_similarity(q.qv, b.v), 6) AS cosine
  FROM q JOIN b ON b.blk = q.qblk AND b.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scores
)
SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


SQL_ANN_LSH_TOPK = _sql_ann_lsh_topk()

SQL_ANN_RECALL = f"""
WITH exact_k AS ({SQL_COSINE_TOPK}),
approx_k AS ({SQL_ANN_LSH_TOPK}),
hits AS (
  SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM exact_k e JOIN approx_k a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
),
qids AS (SELECT DISTINCT query_id FROM exact_k)
SELECT q.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 10.0, 9) AS recall
FROM qids q LEFT JOIN hits h ON h.query_id = q.query_id
"""


def _sql_ann_multitable_topk(
    dim: int = _EMBED_DIM, n_planes: int = _EMBED_PLANES,
    n_tables: int = 3, k: int = 10,
) -> str:
    """Exact twin of similarity.ann_lsh_multitable_topk: one inlined
    bucket fold per table (salted plane derivations), candidates =
    DISTINCT matches on ANY table (the OR-join is the union of the L
    bucket probes), same (cosine@6dp desc, vec_id asc) ranking."""
    from mesos_pregel_spark.functions.similarity import _hyperplanes

    def fold(planes):
        terms = []
        for p, row in enumerate(planes):
            lit = "[" + ", ".join(str(v) for v in row) + "]::DOUBLE[]"
            weight = 2 ** (n_planes - 1 - p)
            terms.append(
                f"(CASE WHEN list_dot_product({lit}, v) > 0 "
                f"THEN {weight} ELSE 0 END)"
            )
        return "\n       + ".join(terms)

    cols = ",\n         ".join(
        f"{fold(_hyperplanes(dim, n_planes, salt=t))} AS b{t}"
        for t in range(n_tables)
    )
    qcols = ", ".join(f"b{t} AS q{t}" for t in range(n_tables))
    anymatch = " OR ".join(f"b.b{t} = q.q{t}" for t in range(n_tables))
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (
  SELECT vec_id, v,
         {cols}
  FROM e
),
q AS (
  SELECT vec_id AS query_id, v AS qv, {qcols}
  FROM b ORDER BY vec_id LIMIT 3
),
cand AS (
  SELECT DISTINCT q.query_id, b.vec_id
  FROM q JOIN b ON b.vec_id <> q.query_id AND ({anymatch})
),
scores AS (
  SELECT c.query_id, c.vec_id,
         ROUND(list_cosine_similarity(q.qv, b.v), 6) AS cosine
  FROM cand c
  JOIN b ON b.vec_id = c.vec_id
  JOIN q ON q.query_id = c.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scores
)
SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


SQL_ANN_MULTITABLE_TOPK = _sql_ann_multitable_topk()

# IVF twin: centroids = the 16 lowest vec_ids; every vector is assigned
# to its nearest centroid by (cosine@6dp desc, cell asc) — the SAME
# rounded ranking the engine uses, so near-tie assignments cannot flip
# across engines; queries probe their 2 nearest cells.
SQL_IVF_PURITY = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, CAST(label AS BIGINT) AS label
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cell, v AS cv FROM e ORDER BY vec_id LIMIT 16
),
assigned AS (
  SELECT vec_id, label, cell FROM (
    SELECT e.vec_id, e.label, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY ROUND(list_cosine_similarity(c.cv, e.v), 6) DESC,
                      c.cell ASC) AS crank
    FROM e, cents c
  ) WHERE crank = 1
),
by_label AS (
  SELECT cell, label, CAST(COUNT(*) AS BIGINT) AS n
  FROM assigned GROUP BY 1, 2
),
majority AS (
  SELECT cell, label AS majority_label, n AS n_majority FROM (
    SELECT cell, label, n,
           ROW_NUMBER() OVER (
             PARTITION BY cell ORDER BY n DESC, label ASC) AS mrank
    FROM by_label
  ) WHERE mrank = 1
),
totals AS (
  SELECT cell, CAST(SUM(n) AS BIGINT) AS n_vectors FROM by_label GROUP BY 1
)
SELECT t.cell, t.n_vectors, m.majority_label, m.n_majority,
       ROUND(CAST(m.n_majority AS DOUBLE) / CAST(t.n_vectors AS DOUBLE), 9)
         AS purity
FROM totals t JOIN majority m ON m.cell = t.cell
"""


SQL_IVF_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cell, v AS cv FROM e ORDER BY vec_id LIMIT 16
),
scored AS (
  SELECT e.vec_id, e.v, c.cell,
         ROUND(list_cosine_similarity(c.cv, e.v), 6) AS ccos
  FROM e, cents c
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell,
           ROW_NUMBER() OVER (
             PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS crank
    FROM scored
  ) WHERE crank = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e ORDER BY vec_id LIMIT 3),
qcells AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(list_cosine_similarity(c.cv, q.qv), 6) DESC,
                      c.cell ASC) AS crank
    FROM q, cents c
  ) WHERE crank <= 2
),
scores AS (
  SELECT qc.query_id, a.vec_id,
         ROUND(list_cosine_similarity(qc.qv, a.v), 6) AS cosine
  FROM qcells qc JOIN assigned a ON a.cell = qc.cell
  WHERE a.vec_id <> qc.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scores
)
SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


# Composed cleaning pipeline (functions/pipeline.py): thresholds
# picked by inspection at sf0.01 so every stage filters non-trivially
# (en 382/500 docs, quality spread 0.4-0.8, 25 near-dup pairs).
CLEAN_LANG = "en"
CLEAN_QUALITY_MIN = 0.55
CLEAN_JACCARD_MIN = 0.8

SQL_CORPUS_CLEAN = f"""
SELECT q.doc_id, l.lang_pred, q.quality
FROM ({SQL_QUALITY}) q
JOIN ({SQL_LANG_ID}) l ON l.doc_id = q.doc_id
JOIN (SELECT doc_id FROM ({SQL_DEDUP_EXACT}) WHERE NOT is_duplicate) c
  ON c.doc_id = q.doc_id
LEFT JOIN (SELECT DISTINCT doc_b FROM ({SQL_NEAR_DUPLICATES})
           WHERE jaccard >= {CLEAN_JACCARD_MIN}) d
  ON d.doc_b = q.doc_id
WHERE d.doc_b IS NULL
  AND l.lang_pred = '{CLEAN_LANG}'
  AND q.quality >= {CLEAN_QUALITY_MIN}
"""


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query for the multimodal Arrow plumbing — now with an
    EXACT DuckDB twin (SQL_MULTIMODAL_FEATURES): the synthetic payload
    is the unhexed md5 pair of the text, so its per-byte values are
    recomputable in SQL from the hex digits, and the kernel's float64
    stats touch only exactly-representable intermediates (integer
    samples, dyadic mean/variance, one correctly-rounded sqrt) — both
    engines produce bit-identical doubles.  ``feat`` (array<float> of
    segment means, each = segment-byte-sum/4) is projected to the
    integer signature ``feat_sig`` = the comma-joined segment sums
    (×4 is exact), because the driver's pandas canonicalization cannot
    hash an array column; the array-typed path stays covered by
    tests/test_text_pipeline.py."""
    from pyspark.sql import functions as F

    feats = decode_features(synthesize_media(_docs(spark, sf_dir)), partitions=8)
    feat_sig = F.concat_ws(
        ",",
        F.transform(
            F.col("feat"),
            lambda x: (x.cast("double") * 4).cast("int").cast("string"),
        ),
    )
    return feats.select(
        "media_id", "kind", "n_bytes", "mean", "std",
        feat_sig.alias("feat_sig"),
    )


def _sql_multimodal_features() -> str:
    """Exact twin of _multimodal_features: payload bytes re-derived
    from the md5 hex pairs, float64 stats evaluated over the same
    exactly-representable intermediates."""
    hexv = "0123456789abcdef"
    seg_sums = ", ".join(
        f"CAST(list_sum(bytes[{4 * s + 1}:{4 * s + 4}]) AS VARCHAR)"
        for s in range(8)
    )
    return f"""
WITH hexes AS (
  SELECT doc_id AS media_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         md5(text) || md5('2:' || text) AS h
  FROM documents
),
b AS (
  SELECT media_id, kind,
         [ (strpos('{hexv}', substr(h, 2*i - 1, 1)) - 1) * 16
           + (strpos('{hexv}', substr(h, 2*i, 1)) - 1)
           FOR i IN generate_series(1, 32) ] AS bytes
  FROM hexes
),
m AS (
  SELECT media_id, kind, bytes,
         CAST(list_sum(bytes) AS DOUBLE) / 32.0 AS mean
  FROM b
)
SELECT media_id, kind, CAST(32 AS BIGINT) AS n_bytes, mean,
       sqrt(list_sum(list_transform(bytes,
            x -> (x - mean) * (x - mean))) / 32.0) AS std,
       concat_ws(',', {seg_sums}) AS feat_sig
FROM m
"""


SQL_MULTIMODAL_FEATURES = _sql_multimodal_features()


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame: verified near-dup pairs (jaccard >= 0.8)
    become edges, the engine's own connected-components groups them
    into duplicate CLUSTERS, and each cluster keeps exactly one
    canonical representative (the lexicographically smallest doc_id —
    CC's min-label IS the canonical pick, no extra pass).  Covers only
    docs that appear in a verified pair; everything else is trivially
    kept.  This is the composition a 100 TB pipeline actually runs:
    transitive closure matters because near-dup is not transitive
    (A~B, B~C does not imply A~C passes the threshold) yet A, B, C
    must land in ONE cluster or two of them survive dedup."""
    from pyspark.sql import functions as F

    from mesos_pregel_spark.algos.cc import connected_components

    docs = _docs(spark, sf_dir)
    pairs = near_duplicates(docs).where(F.col("jaccard") >= CLEAN_JACCARD_MIN)
    edges = pairs.select(
        F.col("doc_a").alias("src"),
        F.col("doc_b").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    comps, _run = connected_components(spark, edges, edge_partitions=8)
    # CC materialized the edge table before iterating, so the dedup
    # intermediates behind `pairs` are already consumed — release them
    # here rather than leaking them across driver queries (ADVICE r3).
    release_dedup_caches()
    return comps.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster"),
        (F.col("id") == F.col("component")).alias("keep"),
    )


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({SQL_NEAR_DUPLICATES})
  WHERE jaccard >= {CLEAN_JACCARD_MIN}
),
sym AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT s AS doc_id, s AS c FROM sym
  UNION
  SELECT sym.d, r.c FROM reach r JOIN sym ON sym.s = r.doc_id
)
SELECT doc_id, MIN(c) AS cluster, doc_id = MIN(c) AS keep
FROM reach GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# decontamination + deterministic sampling (functions/decontam.py,
# functions/sampling.py)
# ---------------------------------------------------------------------------

# Pinned driver-query constants, mirrored by the SQL twins: the eval
# set is every 25th document (a deterministic held-out split of the
# fixture — no external data), 8-token grams, the any-hit rule.
DECON_N = 8
DECON_EVAL_MOD = 25
SAMPLE_RATES = {"src0": 0.5, "src1": 0.25, "src2": 1.0, "src3": 0.125}
BUDGET_TOKENS = 2000


def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
    eval_docs = docs.where(F.col("doc_id") % DECON_EVAL_MOD == 0)
    return decontaminate(train, eval_docs, n=DECON_N)


def _decontam_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination rate per source — the report a data recipe reads
    before deciding which source needs a harder filter: the pinned
    exact-8-gram decontamination verdicts rolled up on the documents
    table's source label.  Counts exact integers, rate = ONE rounded
    division; one broadcast-joinable (doc_id, source) projection over
    the already-audited decontaminate output."""
    rep = _decontaminate(spark, sf_dir)
    src = _docs(spark, sf_dir).select("doc_id", "source")
    contaminated = F.sum(
        F.when(F.col("contaminated"), 1).otherwise(0)
    ).cast("long")
    return (
        rep.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            contaminated.alias("n_contaminated"),
        )
        .select(
            "source", "n_docs", "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double")
                / F.col("n_docs").cast("double"), 9
            ).alias("contamination_rate"),
        )
    )


def _sql_decontaminate(n: int = DECON_N, mod: int = DECON_EVAL_MOD) -> str:
    return f"""
WITH norm AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_distinct(
    [MD5(array_to_string(list_slice(toks, i, i + {n - 1}), ' '))
     FOR i IN generate_series(1, GREATEST(len(toks) - {n - 1}, 1))]
  )) AS gram
  FROM norm
),
train AS (SELECT * FROM grams WHERE doc_id % {mod} <> 0),
block AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {mod} = 0),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_hits
  FROM train t JOIN block b USING (gram) GROUP BY t.doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM train GROUP BY doc_id)
SELECT t.doc_id, t.n_grams,
       COALESCE(h.n_hits, 0) AS n_hits,
       ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_grams, 9)
         AS overlap_ratio,
       COALESCE(h.n_hits, 0) >= 1 AS contaminated
FROM tot t LEFT JOIN hits h ON h.doc_id = t.doc_id
"""


SQL_DECONTAMINATE = _sql_decontaminate()

SQL_DECONTAM_BY_SOURCE = f"""
WITH rep AS ({SQL_DECONTAMINATE}),
srcmap AS (SELECT doc_id, source FROM documents)
SELECT s.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN r.contaminated THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       ROUND(CAST(SUM(CASE WHEN r.contaminated THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 9) AS contamination_rate
FROM rep r JOIN srcmap s ON s.doc_id = r.doc_id
GROUP BY s.source
"""


def _sql_fuzzy_decon(
    n: int = 5,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    mod: int = DECON_EVAL_MOD,
    thr: float = 0.5,
) -> str:
    """Twin of functions/dedup.py::fuzzy_decontaminate over the same
    train/eval doc_id-mod split the exact `decontaminate` query uses:
    md5 MinHash signatures on BOTH corpora, banded cross-corpus
    equi-join, exact shingle-Jaccard verify, best (max jaccard, min
    eval_id) match per flagged train doc."""
    r = k // bands
    mins = ",\n         ".join(
        f"MIN(md5('{i}:' || shingle)) AS mh{i}" for i in range(k)
    )

    def side(name: str, pred: str) -> str:
        parts = []
        for j in range(bands):
            key = " || '|' || ".join(f"mh{j * r + t}" for t in range(r))
            parts.append(
                f"SELECT {j} AS band_idx, {key} AS band_key, doc_id "
                f"FROM sig_{name}"
            )
        union = "\n  UNION ALL ".join(parts)
        return f"""
norm_{name} AS (
  SELECT doc_id, {_NORM} AS t FROM documents WHERE {pred}
),
sh_{name} AS (
  SELECT doc_id,
         unnest(list_distinct(
           [substr(t, i, {n}) FOR i IN
            generate_series(1, GREATEST(length(t) - {n - 1}, 1))]
         )) AS shingle
  FROM norm_{name}
),
sig_{name} AS (
  SELECT doc_id,
         {mins}
  FROM sh_{name} GROUP BY doc_id
),
banded_{name} AS (
  {union}
)"""

    return (
        "WITH"
        + side("t", f"doc_id % {mod} <> 0")
        + ","
        + side("e", f"doc_id % {mod} = 0")
        + f""",
cand AS (
  SELECT DISTINCT t.doc_id, e.doc_id AS eval_id
  FROM banded_t t
  JOIN banded_e e ON e.band_idx = t.band_idx
                 AND e.band_key = t.band_key
),
inter AS (
  SELECT c.doc_id, c.eval_id, COUNT(*) AS inter
  FROM cand c
  JOIN sh_t st ON st.doc_id = c.doc_id
  JOIN sh_e se ON se.doc_id = c.eval_id AND se.shingle = st.shingle
  GROUP BY c.doc_id, c.eval_id
),
n_t AS (SELECT doc_id, COUNT(*) AS n_t FROM sh_t GROUP BY doc_id),
n_e AS (SELECT doc_id, COUNT(*) AS n_e FROM sh_e GROUP BY doc_id),
scored AS (
  SELECT c.doc_id, c.eval_id,
         ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE)
               / (t.n_t + e.n_e - COALESCE(i.inter, 0)), 9) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.doc_id = c.doc_id AND i.eval_id = c.eval_id
  JOIN n_t t ON t.doc_id = c.doc_id
  JOIN n_e e ON e.doc_id = c.eval_id
),
best AS (
  SELECT doc_id, eval_id, jaccard,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY jaccard DESC, eval_id ASC) AS rn
  FROM scored WHERE jaccard >= {thr}
)
SELECT doc_id, eval_id, jaccard FROM best WHERE rn = 1
"""
    )


SQL_FUZZY_DECONTAMINATE = _sql_fuzzy_decon()


# Cross-source duplication leakage (functions/dedup.py::
# dup_source_matrix): the near_duplicates pipeline at a threshold,
# joined to the (doc_id, source) map, canonical unordered source pair.
DUP_MATRIX_THR = 0.5

SQL_DUP_SOURCE_MATRIX = (
    _sql_shingle_prelude() + _sql_minhash_sig() + _sql_banded()
    + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
),
flagged AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes na ON na.doc_id = c.doc_a
  JOIN sizes nb ON nb.doc_id = c.doc_b
  WHERE ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE)
              / (na.n_sh + nb.n_sh - COALESCE(i.inter, 0)), 9)
        >= {DUP_MATRIX_THR}
),
lab AS (SELECT doc_id, source FROM documents)
SELECT LEAST(a.source, b.source) AS source_lo,
       GREATEST(a.source, b.source) AS source_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM flagged f
JOIN lab a ON a.doc_id = f.doc_a
JOIN lab b ON b.doc_id = f.doc_b
GROUP BY LEAST(a.source, b.source), GREATEST(a.source, b.source)
"""
)


def _fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mesos_pregel_spark.functions.dedup import fuzzy_decontaminate

    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
    eval_docs = docs.where(F.col("doc_id") % DECON_EVAL_MOD == 0)
    return fuzzy_decontaminate(train, eval_docs, threshold=0.5)

_SQL_U = (
    "('0x' || substr(MD5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 12))"
    "::BIGINT / 281474976710656.0"
)


def _sql_stratified_sample(rates: dict[str, float] = SAMPLE_RATES) -> str:
    whens = " ".join(
        f"WHEN '{v}' THEN {float(r)!r}" for v, r in sorted(rates.items())
    )
    u = _SQL_U.format(seed="sample42")
    return f"""
WITH s AS (
  SELECT doc_id, source AS stratum, {u} AS u,
         CASE source {whens} ELSE 0.0 END AS rate
  FROM documents
)
SELECT doc_id, stratum, u FROM s WHERE u < rate
"""


SQL_STRATIFIED_SAMPLE = _sql_stratified_sample()


def _sql_sample_budget(budget: int = BUDGET_TOKENS) -> str:
    u = _SQL_U.format(seed="budget42")
    return f"""
WITH base AS (
  SELECT doc_id, lang AS stratum,
         CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
tot AS (SELECT stratum, SUM(n_tokens) AS st FROM base GROUP BY stratum),
rates AS (
  SELECT stratum, LEAST(1.0, {float(budget)!r} / CAST(st AS DOUBLE)) AS rate
  FROM tot
)
SELECT b.doc_id, b.stratum, b.n_tokens, r.rate
FROM base b JOIN rates r USING (stratum)
WHERE {u.replace('doc_id', 'b.doc_id')} < r.rate
"""


SQL_SAMPLE_BUDGET = _sql_sample_budget()


# ---------------------------------------------------------------------------
# PII redaction + repetition (round 4)
# ---------------------------------------------------------------------------
#
# The synthetic corpus is PII-free word soup, so the pii_redact DRIVER
# QUERY deterministically injects PII-shaped spans derived from doc_id
# (identical expression on both sides) before scrubbing — the redaction
# regexes are exercised on real matches and the full redacted strings
# are hash-compared.  The library operator (functions/text.py::
# pii_redact) takes whatever text column it is given.


def _pii_injected(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ).alias("text"),
    )


_SQL_PII_INJECT = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or call 555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'"
)


def _sql_pii_redact() -> str:
    """Oracle twin generated FROM the same PII_PATTERNS schedule the
    Spark operator walks — counts at each stage, then global replace."""
    parts = [f"WITH s0 AS (SELECT doc_id, {_SQL_PII_INJECT} AS t0 FROM documents)"]
    cols = []
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        prev = ", ".join([f"{c}" for c in cols])
        prev = prev + ", " if prev else ""
        parts.append(f""",
s{i + 1} AS (
  SELECT doc_id, {prev}
         CAST(len(regexp_extract_all(t{i}, '{pat}')) AS BIGINT) AS {name},
         regexp_replace(t{i}, '{pat}', '{repl}', 'g') AS t{i + 1}
  FROM s{i})""")
        cols.append(name)
    n = len(PII_PATTERNS)
    parts.append(
        f"\nSELECT doc_id, {', '.join(cols)}, t{n} AS redacted FROM s{n}"
    )
    return "".join(parts)


SQL_PII_REDACT = _sql_pii_redact()


SQL_REPETITION = f"""
WITH base AS (SELECT doc_id, {_NORM} AS norm FROM documents),
tk AS (SELECT doc_id, string_split(norm, ' ') AS l FROM base),
bg AS (
  SELECT doc_id,
         CASE WHEN len(l) >= 2
              THEN list_transform(range(1, len(l)),
                                  i -> l[i] || ' ' || l[i + 1])
              ELSE CAST([] AS VARCHAR[]) END AS b
  FROM tk),
st AS (
  SELECT doc_id, CAST(len(b) AS BIGINT) AS n_bigrams,
         CAST(len(list_distinct(b)) AS BIGINT) AS distinct_bigrams
  FROM bg)
SELECT doc_id, n_bigrams, distinct_bigrams,
       CASE WHEN n_bigrams > 0
            THEN CAST(n_bigrams - distinct_bigrams AS DOUBLE)
                 / CAST(n_bigrams AS DOUBLE)
            ELSE 0.0 END AS repetition
FROM st
"""


_PACK_CHUNK_TOKENS = 512

SQL_PACK_CONCAT = f"""
WITH base AS (
  SELECT doc_id, source AS stratum,
         CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, stratum, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY stratum ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok
  FROM base
)
SELECT doc_id, stratum, n_tokens, start_tok,
       start_tok // {_PACK_CHUNK_TOKENS} AS first_chunk,
       (start_tok + greatest(n_tokens - 1, 0)) // {_PACK_CHUNK_TOKENS}
         AS last_chunk,
       ((start_tok + greatest(n_tokens - 1, 0)) // {_PACK_CHUNK_TOKENS})
         - (start_tok // {_PACK_CHUNK_TOKENS}) + 1 AS n_chunks_spanned
FROM cum
"""


# k-means twin: unrolled Lloyd iterations with the engine's pinned
# determinism recipe — assignment by ROUND(squared-L2, 6) + cell-asc
# tie-break, centroid components ROUND(AVG, 6) each iteration (the
# rounding re-synchronizes both engines' centroids so drift cannot
# accumulate), empty cells keep their previous centroid.
_KMEANS_K, _KMEANS_ITERS = 8, 3


def _sql_kmeans(k: int = _KMEANS_K, iters: int = _KMEANS_ITERS) -> str:
    d2 = ("ROUND(list_sum(list_transform(list_zip(e.v, c.c), "
          "x -> (x[1] - x[2]) * (x[1] - x[2]))), 6)")
    parts = [f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS (SELECT vec_id AS cell, v AS c FROM e ORDER BY vec_id LIMIT {k})"""]
    for t in range(1, iters + 1):
        parts.append(f""",
a{t} AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {d2} ASC, c.cell ASC) AS rn
    FROM e, c{t-1} c) WHERE rn = 1
),
u{t} AS (
  SELECT cell, list(cm ORDER BY dim) AS c FROM (
    SELECT cell, dim, ROUND(AVG(val), 6) AS cm FROM (
      SELECT cell, generate_subscripts(v, 1) AS dim, unnest(v) AS val
      FROM a{t})
    GROUP BY cell, dim)
  GROUP BY cell
),
c{t} AS (
  SELECT p.cell, COALESCE(n.c, p.c) AS c
  FROM c{t-1} p LEFT JOIN u{t} n ON n.cell = p.cell
)""")
    parts.append(f"""
SELECT vec_id, cell, dist2 FROM (
  SELECT e.vec_id, c.cell, {d2} AS dist2,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY {d2} ASC, c.cell ASC) AS rn
  FROM e, c{iters} c) WHERE rn = 1
""")
    return "".join(parts)


SQL_KMEANS = _sql_kmeans()


_TFIDF_K = 5

# tf-idf twin: idf ROUNDED at 6dp before the tf product, so a 1-ulp
# libm ln() difference between engines cannot reach the score.
SQL_TFIDF_TOPK = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY doc_id, term
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ROUND(LN(CAST(n.n_docs + 1 AS DOUBLE)
                                / CAST(df.df + 1 AS DOUBLE)) + 1.0, 6),
               6) AS score
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, CAST(rank AS INT) AS rank, term, score FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored)
WHERE rank <= {_TFIDF_K}
"""


_CBS_PER_CELL = 10

# cluster-balanced sample twin: the kmeans unroll as a subquery + one
# md5-order window pick per cell.
SQL_CLUSTER_BALANCED_SAMPLE = f"""
SELECT vec_id, cell, pick FROM (
  SELECT vec_id, cell,
         CAST(ROW_NUMBER() OVER (PARTITION BY cell
           ORDER BY MD5('cbs42|' || CAST(vec_id AS VARCHAR)) ASC,
                    vec_id ASC) AS INT) AS pick
  FROM ({_sql_kmeans()}) a
) WHERE pick <= {_CBS_PER_CELL}
"""


# unigram-LM fluency twin: per-token log-probs are rounded to integer
# MICRO-nats before the per-document SUM, so the sum is exact integer
# arithmetic — order-independent on both engines (see
# functions/text.py::unigram_logprob; a 6dp-double sum would carry
# partition-order ulps).
SQL_UNIGRAM_QUALITY = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
),
toks AS (SELECT doc_id, term FROM tok WHERE term <> ''),
cnt AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY term
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM cnt
),
logp AS (
  SELECT term,
         CAST(ROUND(LN(CAST(cnt + 1 AS DOUBLE)
                       / CAST(total + vocab AS DOUBLE)) * 1e6, 0)
              AS BIGINT) AS logp_micro
  FROM cnt, tot
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(-CAST(SUM(l.logp_micro) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS nll
FROM toks t JOIN logp l USING (term)
GROUP BY t.doc_id
"""

# bigram-LM twin: positional tokens via DuckDB's zipped parallel
# unnests + a per-doc LAG; same integer micro-nat contract as the
# unigram twin (functions/text.py::bigram_logprob).
SQL_BIGRAM_QUALITY = f"""
WITH arrs AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS arr FROM documents
),
seq0 AS (
  SELECT doc_id, unnest(arr) AS term,
         unnest(range(0, len(arr))) AS pos
  FROM arrs
),
seq AS (
  SELECT doc_id, pos, term,
         LAG(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM seq0 WHERE term <> ''
),
c1 AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c1 FROM seq GROUP BY term
),
tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM c1
),
c2 AS (
  SELECT prev, term, CAST(COUNT(*) AS BIGINT) AS c2
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, term
),
lp AS (
  SELECT s.doc_id,
         CAST(CASE WHEN s.prev IS NULL THEN
           ROUND(LN(CAST(t1.c1 + 1 AS DOUBLE)
                    / CAST(tot.total + tot.vocab AS DOUBLE)) * 1e6, 0)
         ELSE
           ROUND(LN(CAST(b.c2 + 1 AS DOUBLE)
                    / CAST(p1.c1 + tot.vocab AS DOUBLE)) * 1e6, 0)
         END AS BIGINT) AS lp_micro
  FROM seq s
  JOIN c1 t1 ON t1.term = s.term
  LEFT JOIN c1 p1 ON p1.term = s.prev
  LEFT JOIN c2 b ON b.prev = s.prev AND b.term = s.term
  CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(-CAST(SUM(lp_micro) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS nll
FROM lp
GROUP BY doc_id
"""

# winnowing twin: identical per-doc sliding frame; the composite
# string key (fixed-width md5 hex || reversed zero-padded position)
# makes MIN == (hash asc, position desc) in both engines.
_WINNOW_K, _WINNOW_W = 5, 4
# Shared winnowing-selection prefix (char-k-gram keys, per-doc sliding
# frame, rightmost-tie min): SQL_WINNOW_FP and SQL_OVERLAP_CANDIDATES
# both read `sel` — one body, so a k/w/key-encoding fix can never
# diverge between the two twins.
_SQL_WINNOW_SEL = f"""
WITH npos AS (
  SELECT doc_id, {_NORM} AS norm FROM documents
),
pos AS (
  SELECT doc_id, norm,
         unnest(range(1, GREATEST(len(norm) - {_WINNOW_K - 1}, 1) + 1)) AS p
  FROM npos
),
keyed AS (
  SELECT doc_id, p,
         MD5(SUBSTR(norm, CAST(p AS INT), {_WINNOW_K})) || '|' ||
         LPAD(CAST(1000000000 - p AS VARCHAR), 10, '0') AS key
  FROM pos
),
sel AS (
  SELECT DISTINCT doc_id,
         MIN(key) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
           AS sel_key
  FROM keyed
)"""

SQL_WINNOW_FP = _SQL_WINNOW_SEL + """
SELECT doc_id,
       CAST(1000000000 - CAST(SUBSTR(sel_key, 34, 10) AS BIGINT) AS BIGINT)
         AS pos,
       SUBSTR(sel_key, 1, 32) AS fp
FROM sel
"""

# overlap-candidates twin: winnow fp sets -> stop-gram cap -> bucket
# pair join (functions/dedup.py::overlap_candidates).
_OVERLAP_MIN_SHARED, _OVERLAP_CAP = 2, 50
SQL_OVERLAP_CANDIDATES = _SQL_WINNOW_SEL + f""",
wf AS (
  SELECT DISTINCT doc_id, SUBSTR(sel_key, 1, 32) AS fp FROM sel
),
kept AS (
  SELECT doc_id, fp FROM wf
  WHERE fp IN (SELECT fp FROM wf GROUP BY fp
               HAVING COUNT(*) BETWEEN 2 AND {_OVERLAP_CAP})
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared_fps
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {_OVERLAP_MIN_SHARED}
"""

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# corpus composition (functions/composition.py): mixture weights, vocab
# summary, sequence-length histogram
# ---------------------------------------------------------------------------

SQL_SOURCE_MIX = f"""
WITH per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split({_NORM}, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs, n_tokens,
         CAST(ROUND(SQRT(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
           AS w_micro
  FROM per_src
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
         CAST(SUM(w_micro) AS BIGINT) AS tot_w
  FROM w
)
SELECT w.source, w.n_docs, w.n_tokens,
       ROUND(CAST(w.n_tokens AS DOUBLE) / tot.tot_tokens, 9) AS token_share,
       ROUND(CAST(w.w_micro AS DOUBLE) / tot.tot_w, 9) AS mix_weight
FROM w CROSS JOIN tot
"""

SQL_VOCAB_STATS = f"""
WITH terms AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split({_NORM}, ' ')) AS token FROM documents) t
  WHERE token <> '' GROUP BY token
),
agg AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab_size,
         CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
  FROM terms
)
SELECT total_tokens, vocab_size, hapax,
       ROUND(CAST(vocab_size AS DOUBLE) / total_tokens, 9)
         AS type_token_ratio
FROM agg
"""

# Corpus heavy-hitter n-grams (functions/composition.py::ngram_hotspots):
# all-integer-then-string ordering makes the LIMIT deterministic.
_HOTSPOT_N, _HOTSPOT_K = 3, 100

SQL_NGRAM_HOTSPOTS = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         array_to_string(
           t[i : i + {_HOTSPOT_N - 1}], ' ') AS ngram
  FROM (
    SELECT doc_id, t,
           CAST(unnest(range(1, len(t) - {_HOTSPOT_N - 2})) AS BIGINT) AS i
    FROM toks WHERE len(t) >= {_HOTSPOT_N})
)
SELECT ngram,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM grams GROUP BY ngram
ORDER BY cnt DESC, n_docs DESC, ngram ASC LIMIT {_HOTSPOT_K}
"""


# Bigram PMI collocations (functions/composition.py::pmi_topk): the
# contingency-table PMI — all marginals derive from the bigram
# aggregate; the one libm LN sees a bit-identical double argument
# (same left-associated product/division shape as the Spark column),
# snapped to BIGINT micro-nats before the all-integer ordering.
_PMI_MIN_COUNT, _PMI_TOP_K = 3, 100

SQL_PMI_TOPK = f"""
WITH toks AS (
  SELECT string_split({_NORM}, ' ') AS t FROM documents
),
pairs AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (
    SELECT t, CAST(unnest(range(1, len(t))) AS BIGINT) AS i
    FROM toks WHERE len(t) >= 2)
),
bg AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pairs GROUP BY w1, w2
),
l_m AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS r_x FROM bg GROUP BY w1),
r_m AS (SELECT w2, CAST(SUM(cnt) AS BIGINT) AS c_y FROM bg GROUP BY w2),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_b FROM bg),
scored AS (
  SELECT b.w1, b.w2, b.cnt,
         CAST(ROUND(LN(
           (CAST(b.cnt AS DOUBLE) * CAST(t.n_b AS DOUBLE))
           / (CAST(l.r_x AS DOUBLE) * CAST(r.c_y AS DOUBLE))) * 1e6)
           AS BIGINT) AS pmi_micro
  FROM bg b
  JOIN l_m l ON l.w1 = b.w1
  JOIN r_m r ON r.w2 = b.w2
  CROSS JOIN tot t
  WHERE b.cnt >= {_PMI_MIN_COUNT}
)
SELECT w1, w2, cnt, CAST(pmi_micro AS DOUBLE) / 1e6 AS pmi
FROM scored
ORDER BY pmi_micro DESC, cnt DESC, w1 ASC, w2 ASC LIMIT {_PMI_TOP_K}
"""


# TextRank keyword scores (functions/composition.py::textrank): the
# word co-occurrence graph + a 4-step weighted-PageRank unroll — the
# same MATERIALIZED-CTE-per-superstep technique as the actor-graph
# pagerank oracles, applied to the token substrate.  Scores cover the
# whole vocabulary (no float-boundary LIMIT in the contract).
_TEXTRANK_STEPS, _TEXTRANK_MIN_LEN = 4, 3


def _sql_textrank(steps: int) -> str:
    parts = [f"""
WITH toks AS (
  SELECT string_split({_NORM}, ' ') AS t FROM documents
),
wpairs AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (
    SELECT t, CAST(unnest(range(1, len(t))) AS BIGINT) AS i
    FROM toks WHERE len(t) >= 2)
),
und AS (
  SELECT LEAST(w1, w2) AS a, GREATEST(w1, w2) AS b,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM wpairs
  WHERE LENGTH(w1) >= {_TEXTRANK_MIN_LEN}
    AND LENGTH(w2) >= {_TEXTRANK_MIN_LEN} AND w1 <> w2
  GROUP BY 1, 2
),
wedges AS MATERIALIZED (
  SELECT a AS s, b AS d, w FROM und
  UNION ALL SELECT b, a, w FROM und
),
wverts AS (SELECT DISTINCT s AS token FROM wedges),
wn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM wverts),
wout AS (SELECT s, SUM(w) AS wt FROM wedges GROUP BY s),
tr0 AS MATERIALIZED (
  SELECT token, 1.0/(SELECT n FROM wn) AS pr FROM wverts
)"""]
    for k in range(1, steps + 1):
        parts.append(f""",
tr{k} AS MATERIALIZED (
  SELECT v.token,
         0.15/(SELECT n FROM wn) + 0.85*COALESCE(c.s, 0.0) AS pr
  FROM wverts v LEFT JOIN (
    SELECT e.d AS token, SUM(p.pr * e.w / wout.wt) AS s
    FROM wedges e
    JOIN tr{k-1} p ON e.s = p.token
    JOIN wout ON e.s = wout.s
    GROUP BY e.d) c
  ON v.token = c.token
)""")
    parts.append(f"""
SELECT token, ROUND(pr, 9) AS textrank FROM tr{steps}
""")
    return "".join(parts)


SQL_TEXTRANK = _sql_textrank(_TEXTRANK_STEPS)


# Heaps'-law vocabulary-growth fit (functions/composition.py::
# heaps_law): the global doc_id-ordered running totals are plain
# windows here (DuckDB sorts centrally anyway); the Spark side uses
# the distributed two-phase prefix sum.  Regression sums are exact
# integers (HUGEINT here, decimal(38,0) in Spark); beta and ln_k
# repeat the identical pinned double-op sequence.
SQL_HEAPS_LAW = f"""
WITH toksrc AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
),
per_doc AS (
  SELECT doc_id,
         CAST(len(list_filter(t, x -> x <> '')) AS BIGINT) AS nt
  FROM toksrc
),
firsts AS (
  SELECT token, MIN(doc_id) AS fd FROM (
    SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS token
    FROM documents) u
  WHERE token <> '' GROUP BY token
),
newt AS (
  SELECT fd AS doc_id, CAST(COUNT(*) AS BIGINT) AS nv
  FROM firsts GROUP BY fd
),
base AS (
  SELECT p.doc_id, p.nt, COALESCE(n.nv, 0) AS nv
  FROM per_doc p LEFT JOIN newt n USING (doc_id)
),
cum AS (
  SELECT SUM(nt) OVER w AS N, SUM(nv) OVER w AS V
  FROM base
  WINDOW w AS (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
pts AS (
  SELECT CAST(ROUND(LN(CAST(N AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(ROUND(LN(CAST(V AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM cum WHERE N > 0 AND V > 0
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sx2
  FROM pts
),
g AS (
  SELECT CAST(SUM(nt) AS BIGINT) AS total_tokens,
         CAST(SUM(nv) AS BIGINT) AS vocab_size
  FROM base
),
b AS (
  SELECT n, sx, sy,
         CASE WHEN (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0
         THEN ROUND(
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9)
         END AS beta
  FROM s
)
SELECT b.n AS n_points, g.total_tokens, g.vocab_size, b.beta,
       CASE WHEN b.beta IS NOT NULL THEN
         ROUND((CAST(b.sy AS DOUBLE) - b.beta * CAST(b.sx AS DOUBLE))
               / (CAST(b.n AS DOUBLE) * 1e6), 9)
       END AS ln_k
FROM b CROSS JOIN g
"""


# Sliding-window chunking (functions/packing.py::chunk_windows): pure
# integer coordinates + md5 of the space-rejoined token window.
_CHUNK_W, _CHUNK_S = 32, 16

SQL_CHUNK_WINDOWS = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
),
base AS (
  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS nt,
         1 + CASE WHEN len(t) > {_CHUNK_W}
                  THEN (len(t) - {_CHUNK_W} + {_CHUNK_S - 1}) // {_CHUNK_S}
                  ELSE 0 END AS n_chunks
  FROM toks
),
chunks AS (
  SELECT doc_id, t, nt, CAST(unnest(range(0, n_chunks)) AS BIGINT) AS i
  FROM base
)
SELECT doc_id,
       i AS chunk_idx,
       i * {_CHUNK_S} AS start_tok,
       CAST(LEAST({_CHUNK_W}, nt - i * {_CHUNK_S}) AS BIGINT) AS n_tokens,
       md5(array_to_string(
         t[i*{_CHUNK_S}+1 :
           i*{_CHUNK_S} + LEAST({_CHUNK_W}, nt - i*{_CHUNK_S})], ' '))
         AS chunk_hash
FROM chunks
"""


# Per-source unigram KL divergence (functions/composition.py::source_kl):
# the log-ratio is snapped to exact BIGINT micro-nats per (source, term)
# BEFORE summation — operand order in the ratio mirrors the Spark
# expression exactly so the one libm LN sees a bit-identical argument.
SQL_SOURCE_KL = f"""
WITH st AS (
  SELECT source, token AS term, CAST(COUNT(*) AS BIGINT) AS c_st FROM (
    SELECT source, unnest(string_split({_NORM}, ' ')) AS token
    FROM documents) t
  WHERE token <> '' GROUP BY source, token
),
per_source AS (
  SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM st GROUP BY source
),
per_term AS (
  SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY term
),
tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_total FROM per_source),
contrib AS (
  SELECT s.source,
         s.c_st * CAST(ROUND(LN(
           (CAST(s.c_st AS DOUBLE) * CAST(t.n_total AS DOUBLE))
           / (CAST(p.c_t AS DOUBLE) * CAST(ps.n_s AS DOUBLE))) * 1e6)
           AS BIGINT) AS c
  FROM st s
  JOIN per_term p ON p.term = s.term
  JOIN per_source ps ON ps.source = s.source
  CROSS JOIN tot t
),
sums AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS sum_micro
  FROM contrib GROUP BY source
)
SELECT ps.source, ps.n_s AS n_tokens, ps.n_terms,
       ROUND(CAST(c.sum_micro AS DOUBLE)
             / (CAST(ps.n_s AS DOUBLE) * 1e6), 9) AS kl
FROM sums c JOIN per_source ps ON ps.source = c.source
"""


# Per-document KL outliers (functions/composition.py::doc_kl_outliers):
# source_kl's exact micro-nat contract at doc granularity; the top-k
# ordering divides the exact integer pair ONCE per doc so duplicate
# documents tie exactly and break on doc_id.
SQL_DOC_KL_OUTLIERS = f"""
WITH dt AS (
  SELECT doc_id, token AS term, CAST(COUNT(*) AS BIGINT) AS c_dt FROM (
    SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS token
    FROM documents) t
  WHERE token <> '' GROUP BY doc_id, token
),
per_doc AS (
  SELECT doc_id, CAST(SUM(c_dt) AS BIGINT) AS n_d,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM dt GROUP BY doc_id
),
per_term AS (
  SELECT term, CAST(SUM(c_dt) AS BIGINT) AS c_t FROM dt GROUP BY term
),
tot AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n_total FROM per_doc),
contrib AS (
  SELECT d.doc_id,
         d.c_dt * CAST(ROUND(LN(
           (CAST(d.c_dt AS DOUBLE) * CAST(t.n_total AS DOUBLE))
           / (CAST(p.c_t AS DOUBLE) * CAST(pd.n_d AS DOUBLE))) * 1e6)
           AS BIGINT) AS c
  FROM dt d
  JOIN per_term p ON p.term = d.term
  JOIN per_doc pd ON pd.doc_id = d.doc_id
  CROSS JOIN tot t
),
sums AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS sum_micro
  FROM contrib GROUP BY doc_id
)
SELECT pd.doc_id, pd.n_d AS n_tokens, pd.n_terms,
       CAST(GREATEST(s.sum_micro, 0) // pd.n_d AS BIGINT) AS kl_micro
FROM sums s JOIN per_doc pd ON pd.doc_id = s.doc_id
ORDER BY CAST(s.sum_micro AS DOUBLE) / CAST(pd.n_d AS DOUBLE) DESC,
         pd.doc_id ASC
LIMIT 50
"""


# C4-style span dedup (functions/dedup.py::span_dedup_stats): full
# 8-token spans, md5 span hash, keep-first by (doc_id, pos); the
# struct MIN is lexicographic in BOTH engines, so "first occurrence"
# is pinned identically.
_SPAN_TOKENS = 8

SQL_SPAN_DEDUP = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
),
base AS (
  SELECT doc_id, CAST(len(t) // {_SPAN_TOKENS} AS BIGINT) AS n_spans, t
  FROM toks
),
spans AS (
  SELECT doc_id, CAST(unnest(range(0, n_spans)) AS BIGINT) AS pos, t
  FROM base
),
hashed AS (
  SELECT doc_id, pos,
         md5(array_to_string(
           t[pos*{_SPAN_TOKENS}+1 : pos*{_SPAN_TOKENS}+{_SPAN_TOKENS}],
           ' ')) AS h
  FROM spans
),
firsts AS (
  SELECT h, MIN(struct_pack(d := doc_id, p := pos)) AS fst
  FROM hashed GROUP BY h
),
per_doc AS (
  SELECT s.doc_id,
         CAST(SUM(CASE WHEN s.doc_id = f.fst.d AND s.pos = f.fst.p
                  THEN 0 ELSE 1 END) AS BIGINT) AS dup_spans
  FROM hashed s JOIN firsts f ON s.h = f.h
  GROUP BY s.doc_id
)
SELECT b.doc_id, b.n_spans,
       CAST(COALESCE(p.dup_spans, 0) AS BIGINT) AS dup_spans,
       CASE WHEN b.n_spans > 0
            THEN ROUND(CAST(COALESCE(p.dup_spans, 0) AS DOUBLE)
                       / b.n_spans, 9)
            ELSE 0.0 END AS dup_ratio
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


SQL_LENGTH_HISTOGRAM = f"""
WITH lens AS (
  SELECT CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS nt
  FROM documents
)
SELECT CAST(LENGTH(bin(nt)) - 1 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS sum_tokens
FROM lens GROUP BY 1
"""


_BM25_Q = 6
_BM25_K = 20

# BM25 twin: the same pinned double-op sequence as functions/text.py::
# bm25_topk — idf and the dl/avgdl ratio each ROUNDED at 6dp before
# use, the per-(doc, term) contribution snapped to integer MICRO-points
# before the per-doc SUM (order-independent exact integers), ranking by
# the integer sum.
SQL_BM25_TOPK = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
),
toks AS (SELECT doc_id, term FROM tok WHERE term <> ''),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
st AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM toks) AS total_tokens
),
q AS (SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT {_BM25_Q}),
scored AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           ROUND(LN((CAST(st.n_docs AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5)
                    / (CAST(q.df AS DOUBLE) + 0.5) + 1.0), 6)
           * ((CAST(tf.tf AS DOUBLE) * 2.2)
              / (CAST(tf.tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75
                     * ROUND(CAST(dl.dl AS DOUBLE)
                             / ROUND(CAST(st.total_tokens AS DOUBLE)
                                     / CAST(st.n_docs AS DOUBLE), 6), 6))))
           * 1e6) AS BIGINT) AS micro
  FROM tf JOIN q USING (term) JOIN dl USING (doc_id), st
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
         CAST(SUM(micro) AS BIGINT) AS sum_micro
  FROM scored GROUP BY doc_id
),
top AS (SELECT * FROM agg ORDER BY sum_micro DESC, doc_id ASC LIMIT {_BM25_K})
SELECT CAST(ROW_NUMBER() OVER (ORDER BY sum_micro DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, n_hits,
       ROUND(CAST(sum_micro AS DOUBLE) / 1e6, 6) AS score
FROM top
"""


_NOVELTY_N = 5


def _sql_ngram_novelty(n: int = _NOVELTY_N) -> str:
    return f"""
WITH norm AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_distinct(
    [MD5(array_to_string(list_slice(toks, i, i + {n - 1}), ' '))
     FOR i IN generate_series(1, GREATEST(len(toks) - {n - 1}, 1))]
  )) AS gram
  FROM norm
),
gdf AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS gram_docs FROM grams GROUP BY gram
),
agg AS (
  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN gram_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
  FROM grams g JOIN gdf USING (gram) GROUP BY g.doc_id
)
SELECT doc_id, n_grams, n_novel,
       ROUND(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 9)
         AS novelty_ratio
FROM agg
"""


SQL_NGRAM_NOVELTY = _sql_ngram_novelty()


def _dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical pick per duplicate cluster — the
    retention rule a production dedup actually ships: within each
    transitive near-dup cluster keep the HIGHEST-quality member
    (quality_score DESC, doc_id ASC tie-break), not the smallest id.
    Composition of the engine's own CC clustering (_dedup_clusters)
    with the pinned quality score; the per-cluster argmax is one
    window over cluster-sized groups (near-dup clusters are small by
    construction — the banded LSH candidate generation bounds them),
    so no single task ever sorts a corpus-sized partition."""
    from pyspark.sql import Window

    clusters = _dedup_clusters(spark, sf_dir).select("doc_id", "cluster")
    q = quality_score(_docs(spark, sf_dir))
    joined = clusters.join(q, "doc_id")
    w = Window.partitionBy("cluster").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return joined.select(
        "doc_id", "cluster", "quality",
        (F.row_number().over(w) == 1).alias("keep_best"),
    )


SQL_DEDUP_KEEP_BEST = f"""
WITH clu AS ({SQL_DEDUP_CLUSTERS}),
q AS ({SQL_QUALITY})
SELECT clu.doc_id, clu.cluster, q.quality,
       ROW_NUMBER() OVER (
         PARTITION BY clu.cluster
         ORDER BY q.quality DESC, clu.doc_id ASC) = 1 AS keep_best
FROM clu JOIN q ON q.doc_id = clu.doc_id
"""


_AV_K = 4
_AV_SEED = "vocab42"


def _sql_approx_vocab(k: int = _AV_K, seed: str = _AV_SEED) -> str:
    from mesos_pregel_spark.algos.anf import DUCKDB_SHIFT, fm_estimate_sql

    regs = []
    for j in range(k):
        h = (f"CAST(('0x' || substr(md5('{seed}' || ':' || '{j}' || ':' "
             f"|| term), 1, 12)) AS BIGINT)")
        regs.append(
            f"CASE WHEN {h} = 0 THEN (CAST(1 AS BIGINT) << 48) "
            f"ELSE {h} & -{h} END AS r{j}"
        )
    est = fm_estimate_sql([f"m{j}" for j in range(k)], DUCKDB_SHIFT)
    bit_ors = ",\n         ".join(
        f"BIT_OR(r{j}) AS m{j}" for j in range(k)
    )
    return f"""
WITH tok AS (
  SELECT source, unnest(string_split({_NORM}, ' ')) AS term FROM documents
),
toks AS (SELECT source, term FROM tok WHERE term <> ''),
regs AS (
  SELECT source, term,
         {",         ".join(regs)}
  FROM toks
),
masks AS (
  SELECT source,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS exact_distinct,
         {bit_ors}
  FROM regs GROUP BY source
)
SELECT source, exact_distinct,
       {est} AS fm_estimate,
       ROUND(({est} - CAST(exact_distinct AS DOUBLE))
             / CAST(exact_distinct AS DOUBLE), 6) AS rel_error
FROM masks
"""


SQL_APPROX_VOCAB = _sql_approx_vocab()


_SIMC_BITS = 32    # wider than the driver-pinned 16-bit simhash: 8-bit
_SIMC_BANDS = 4    # band keys keep the bucket join sub-quadratic
_SIMC_MAXH = 3


def _sql_simhash_candidates(bits: int = _SIMC_BITS,
                            n_bands: int = _SIMC_BANDS,
                            max_h: int = _SIMC_MAXH) -> str:
    w = bits // n_bands
    mask = (1 << w) - 1
    band_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS band_idx, "
        f"(simhash >> {i * w}) & {mask} AS band_key FROM sig"
        for i in range(n_bands)
    )
    return f"""
WITH sig AS ({_sql_simhash(bits)}),
bands AS (
  {band_rows}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM bands a
JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_h}
"""


SQL_SIMHASH_CANDIDATES = _sql_simhash_candidates()


_KPP_K = 8


def _sql_kmeanspp(k: int = _KPP_K) -> str:
    """Unrolled farthest-point rounds; distances via the shared
    ROUND(squared-L2, 6) recipe, argmax by (mind DESC, vec_id ASC)."""
    d2 = ("ROUND(list_sum(list_transform(list_zip(e.v, s.v), "
          "x -> (x[1] - x[2]) * (x[1] - x[2]))), 6)")
    parts = ["""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
seeds1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)"""]
    for j in range(2, k + 1):
        parts.append(f""",
md{j} AS (
  SELECT e.vec_id, MIN({d2}) AS mind
  FROM e, seeds{j - 1} s GROUP BY e.vec_id
),
pick{j} AS (
  SELECT vec_id, mind FROM md{j}
  ORDER BY mind DESC, vec_id ASC LIMIT 1
),
seeds{j} AS (
  SELECT * FROM seeds{j - 1}
  UNION ALL
  SELECT e.vec_id, e.v FROM e WHERE e.vec_id = (
    SELECT vec_id FROM pick{j})
)""")
    rows = ["SELECT CAST(1 AS INT) AS rank, "
            "(SELECT vec_id FROM seeds1) AS vec_id, "
            "CAST(NULL AS DOUBLE) AS sep_dist2"]
    rows += [
        f"SELECT CAST({j} AS INT), vec_id, mind FROM pick{j}"
        for j in range(2, k + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(rows))
    return "".join(parts)


SQL_KMEANSPP_SEEDS = _sql_kmeanspp()

def _sql_pq(k: int = 4, iters: int = 2, topk: int = 10) -> str:
    """Product-quantization ADC twin: two per-subspace kmeans chains
    (the SQL_KMEANS recipe re-sourced onto sliced vectors), the final
    code assignment per subspace, a k-row ADC table per subspace
    against the smallest-vec_id query, and the lookup-sum top-k."""
    d2 = ("ROUND(list_sum(list_transform(list_zip(e.v, c.c), "
          "x -> (x[1] - x[2]) * (x[1] - x[2]))), 6)")

    def chain(tag: str, src: str) -> str:
        s = f""",
{tag}c0 AS (SELECT vec_id AS cell, v AS c FROM {src} ORDER BY vec_id LIMIT {k})"""
        for t in range(1, iters + 1):
            s += f""",
{tag}a{t} AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {d2} ASC, c.cell ASC) AS rn
    FROM {src} e, {tag}c{t-1} c) WHERE rn = 1
),
{tag}u{t} AS (
  SELECT cell, list(cm ORDER BY dim) AS c FROM (
    SELECT cell, dim, ROUND(AVG(val), 6) AS cm FROM (
      SELECT cell, generate_subscripts(v, 1) AS dim, unnest(v) AS val
      FROM {tag}a{t})
    GROUP BY cell, dim)
  GROUP BY cell
),
{tag}c{t} AS (
  SELECT p.cell, COALESCE(n.c, p.c) AS c
  FROM {tag}c{t-1} p LEFT JOIN {tag}u{t} n ON n.cell = p.cell
)"""
        s += f""",
{tag}code AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {d2} ASC, c.cell ASC) AS rn
    FROM {src} e, {tag}c{iters} c) WHERE rn = 1
),
{tag}adc AS (
  SELECT c.cell,
         ROUND(list_sum(list_transform(list_zip(c.c, q.v),
               x -> (x[1] - x[2]) * (x[1] - x[2]))), 6) AS d
  FROM {tag}c{iters} c,
       (SELECT v FROM {src}
        WHERE vec_id = (SELECT MIN(vec_id) FROM e)) q
)"""
        return s

    head = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e0 AS (SELECT vec_id, v[1 : len(v) // 2] AS v FROM e),
e1 AS (SELECT vec_id, v[len(v) // 2 + 1 : len(v)] AS v FROM e)"""
    tail = f""",
est AS (
  SELECT a.vec_id, ROUND(d0.d + d1.d, 6) AS adc
  FROM p0code a
  JOIN p1code b ON b.vec_id = a.vec_id
  JOIN p0adc d0 ON d0.cell = a.cell
  JOIN p1adc d1 ON d1.cell = b.cell)
SELECT vec_id, adc FROM est ORDER BY adc ASC, vec_id ASC LIMIT {topk}
"""
    return head + chain("p0", "e0") + chain("p1", "e1") + tail


SQL_PQ_ADC_TOPK = _sql_pq()



def _packing_report(spark: SparkSession, sf_dir: str,
                    chunk_tokens: int = 512) -> DataFrame:
    """Packing-efficiency report per stratum — the fill-rate metric an
    LLM pre-training run tracks next to tokens/sec: concat-and-chunk
    packing (pack_concat's rule: contiguous per-stratum token stream,
    integer-div chunk boundaries) wastes only the final ragged chunk,
    so per stratum n_chunks = ceil(total/C), waste = n_chunks·C −
    total, fill = total/(n_chunks·C).  Derived from ONE per-stratum
    token aggregate — the report needs totals, not the span table.
    Exact integers, one rounded division per stratum."""
    docs = _docs(spark, sf_dir)
    n_tokens = F.size(tokens_col(F.col("text"))).cast("long")
    agg = (
        docs.select(F.col("source").alias("stratum"),
                    n_tokens.alias("nt"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("total_tokens"),
        )
    )
    # integer `div`, not double `/`: FP division misplaces the chunk
    # count past 2^53 total tokens (the pack_concat boundary lesson)
    c = F.lit(chunk_tokens)
    n_chunks = F.expr(
        f"(total_tokens + {chunk_tokens} - 1) div {chunk_tokens}"
    ).cast("long")
    return agg.select(
        "stratum", "n_docs", "total_tokens",
        n_chunks.alias("n_chunks"),
        (n_chunks * c - F.col("total_tokens")).cast("long")
        .alias("waste_tokens"),
        F.round(
            F.col("total_tokens").cast("double")
            / (n_chunks * c).cast("double"), 9
        ).alias("fill_ratio"),
    )


SQL_PACKING_REPORT = f"""
WITH agg AS (
  SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split({_NORM}, ' '))) AS BIGINT)
           AS total_tokens
  FROM documents GROUP BY source
)
SELECT stratum, n_docs, total_tokens,
       CAST((total_tokens + {_PACK_CHUNK_TOKENS} - 1)
            // {_PACK_CHUNK_TOKENS} AS BIGINT) AS n_chunks,
       CAST(((total_tokens + {_PACK_CHUNK_TOKENS} - 1)
             // {_PACK_CHUNK_TOKENS}) * {_PACK_CHUNK_TOKENS}
            - total_tokens AS BIGINT) AS waste_tokens,
       ROUND(CAST(total_tokens AS DOUBLE)
             / CAST(((total_tokens + {_PACK_CHUNK_TOKENS} - 1)
                     // {_PACK_CHUNK_TOKENS}) * {_PACK_CHUNK_TOKENS}
                    AS DOUBLE), 9) AS fill_ratio
FROM agg
"""


def _quality_vs_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the near-dup stage preferentially drop LOW-quality text?
    The audit a pipeline runs before trusting dedup as an implicit
    quality filter: mean pinned quality score for kept-vs-dropped
    cluster members and for documents outside any cluster.  Quality
    scores (9dp-rounded doubles) snap to exact integer NANO-units
    BEFORE the group sums (the unigram contract — a double mean over
    millions of docs would carry partition-order ulps); each mean is
    ONE division of exact integers, rounded 9dp."""
    docs = _docs(spark, sf_dir)
    q = quality_score(docs)
    clu = _dedup_clusters(spark, sf_dir).select("doc_id", "keep")
    tagged = q.join(clu, "doc_id", "left_outer").select(
        F.when(F.col("keep").isNull(), "unclustered")
        .when(F.col("keep"), "kept").otherwise("dropped").alias("bucket"),
        F.round(F.col("quality") * 1e9).cast("long").alias("q_n"),
    )
    return (
        tagged.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("q_n").cast("long").alias("sum_q_n"),
        )
        .select(
            "bucket", "n_docs",
            F.round(
                (F.col("sum_q_n").cast("double") / 1e9)
                / F.col("n_docs").cast("double"), 9
            ).alias("mean_quality"),
        )
    )


SQL_QUALITY_VS_DUP = f"""
WITH q AS ({SQL_QUALITY}),
clu AS ({SQL_DEDUP_CLUSTERS}),
tagged AS (
  SELECT CASE WHEN c.keep IS NULL THEN 'unclustered'
              WHEN c.keep THEN 'kept' ELSE 'dropped' END AS bucket,
         CAST(ROUND(q.quality * 1e9) AS BIGINT) AS q_n
  FROM q LEFT JOIN clu c ON c.doc_id = q.doc_id
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND((CAST(SUM(q_n) AS DOUBLE) / 1e9)
             / CAST(COUNT(*) AS DOUBLE), 9) AS mean_quality
FROM tagged GROUP BY bucket
"""


def _source_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup retention — the data-mix planner's read-out:
    of each source's documents, how many survive the near-dup stage
    (cluster members that are not the canonical keep lose their slot)?
    A source with low retention is shipping copies of other sources'
    content.  Composition of the CC-cluster stage with the source
    label; exact counts, ONE rounded division per source."""
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    clu = _dedup_clusters(spark, sf_dir).select("doc_id", "keep")
    tagged = docs.join(clu, "doc_id", "left_outer")
    dropped = F.sum(
        F.when(F.col("keep").isNotNull() & ~F.col("keep"), 1).otherwise(0)
    ).cast("long")
    return (
        tagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            dropped.alias("n_dropped"),
        )
        .select(
            "source", "n_docs", "n_dropped",
            F.round(
                (F.col("n_docs") - F.col("n_dropped")).cast("double")
                / F.col("n_docs").cast("double"), 9
            ).alias("retention"),
        )
    )


SQL_SOURCE_RETENTION = f"""
WITH clu AS ({SQL_DEDUP_CLUSTERS}),
tagged AS (
  SELECT d.source, c.keep
  FROM documents d LEFT JOIN clu c ON c.doc_id = d.doc_id
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep IS NOT NULL AND NOT keep
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       ROUND(CAST(COUNT(*) - SUM(CASE WHEN keep IS NOT NULL AND NOT keep
                                      THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS retention
FROM tagged GROUP BY source
"""


# Group-aware split fractions: 90/5/5 by the pinned 48-bit md5 uniform
# on the GROUP id, so every member of a near-dup cluster lands in the
# SAME split by construction (leakage-safe), while singleton docs
# split on their own id.
_SPLIT_SEED = "split42"
_SPLIT_TRAIN = 0.90
_SPLIT_VAL = 0.95


def _cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment — the split a careful
    pipeline runs INSTEAD of hashing raw doc_ids: near-duplicate
    documents must land in the SAME split or eval leaks train content
    through paraphrases (the contamination mode exact-match decon
    can't see).  Group id = the doc's dedup CLUSTER representative
    (engine CC over verified near-dup pairs) when it has one, else its
    own doc_id; the split decision hashes the GROUP id with the
    pinned 48-bit md5 uniform, so cluster members agree by
    construction rather than by audit.

    Output is the per-(split, source) budget report: exact doc /
    group / token counts.  Scale shape: the cluster map is the
    already-audited dedup composition; the split label is one JVM
    md5 projection (no shuffle); the report is one hash aggregate
    with map-side partials — the doc table is scanned once."""
    docs = _docs(spark, sf_dir)
    clu = _dedup_clusters(spark, sf_dir).select("doc_id", "cluster")
    toks = token_stats(docs).select("doc_id", "n_tokens")
    base = (
        docs.select("doc_id", "source")
        .join(clu, "doc_id", "left_outer")
        .select(
            "doc_id", "source",
            F.coalesce("cluster", F.col("doc_id")).alias("gid"),
        )
    )
    u = uniform_col(_SPLIT_SEED, F.col("gid"))
    lab = base.select(
        "doc_id", "source", "gid",
        F.when(u < F.lit(_SPLIT_TRAIN), F.lit("train"))
        .when(u < F.lit(_SPLIT_VAL), F.lit("val"))
        .otherwise(F.lit("test")).alias("split"),
    )
    return (
        lab.join(toks, "doc_id")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("gid").cast("long").alias("n_groups"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


_SQL_SPLIT_U = (
    "('0x' || substr(MD5('" + _SPLIT_SEED + ":' || CAST(g.gid AS VARCHAR)),"
    " 1, 12))::BIGINT / 281474976710656.0"
)

SQL_CLUSTER_SPLIT = (
    f"WITH clu AS ({SQL_DEDUP_CLUSTERS}),\n"
    + _SQL_STATS.replace("WITH ", "", 1).rstrip()
    + f""",
grp AS (
  SELECT d.doc_id, d.source, COALESCE(c.cluster, d.doc_id) AS gid
  FROM documents d LEFT JOIN clu c ON c.doc_id = d.doc_id
),
lab AS (
  SELECT g.doc_id, g.source, g.gid,
         CASE WHEN {_SQL_SPLIT_U} < {_SPLIT_TRAIN!r} THEN 'train'
              WHEN {_SQL_SPLIT_U} < {_SPLIT_VAL!r} THEN 'val'
              ELSE 'test' END AS split
  FROM grp g
)
SELECT l.split, l.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT l.gid) AS BIGINT) AS n_groups,
       CAST(SUM(t.n_tokens) AS BIGINT) AS n_tokens
FROM lab l JOIN token_stats t ON t.doc_id = l.doc_id
GROUP BY l.split, l.source
"""
)


# Vocabulary-coverage ladder: the share of corpus token mass covered
# by the k most frequent terms, k per rung — the read-out a tokenizer/
# vocab-pruning plan consumes next to heaps_law's growth fit.
_COVERAGE_KS = (10, 100, 1000)


def _vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k vocabulary coverage: exact per-term counts, terms ranked
    by the all-total order (cnt DESC, token ASC), cumulative covered
    mass at each k rung, ONE 9dp division per rung.

    Scale shape: counts are one explode + hash aggregate (vocab-sized,
    not corpus-sized); the ranking is a TakeOrdered over the max-k
    head — never a global sort of the vocabulary (the pack_concat
    serial-window lesson applied at design time); the rungs are three
    tiny aggregates over the 1000-row head."""
    docs = _docs(spark, sf_dir)
    counts = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = counts.agg(F.sum("cnt").cast("long").alias("total_tokens"))
    kmax = max(_COVERAGE_KS)
    top = counts.orderBy(F.desc("cnt"), "token").limit(kmax)
    from pyspark.sql import Window

    ranked = top.withColumn(
        "rn", F.row_number().over(
            Window.orderBy(F.desc("cnt"), F.asc("token"))
        )
    )
    rungs = None
    for k in _COVERAGE_KS:
        r = ranked.where(F.col("rn") <= k).agg(
            F.lit(k).cast("long").alias("k"),
            F.sum("cnt").cast("long").alias("covered_tokens"),
        )
        rungs = r if rungs is None else rungs.unionByName(r)
    return rungs.join(F.broadcast(tot)).select(
        "k", "covered_tokens", "total_tokens",
        F.round(
            F.col("covered_tokens").cast("double")
            / F.col("total_tokens").cast("double"), 9
        ).alias("coverage"),
    )


_LEXPAIR_DF_CAP = 50
_LEXPAIR_TOPK = 100

SQL_LEXICAL_PAIRS = f"""
WITH toks AS (
  SELECT doc_id, token AS term FROM (
    SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS token
    FROM documents) t
  WHERE token <> ''
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
w AS (
  SELECT tf.term, tf.doc_id,
         CAST(ROUND(ROUND(CAST(tf.tf AS DOUBLE)
               * (ROUND(ln(CAST(n.n_docs + 1 AS DOUBLE)
                           / CAST(dfreq.df + 1 AS DOUBLE)) + 1.0, 6)), 6)
               * 1000000) AS BIGINT) AS w_micro
  FROM tf
  JOIN dfreq ON dfreq.term = tf.term
   AND dfreq.df BETWEEN 2 AND {_LEXPAIR_DF_CAP}
  CROSS JOIN n
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.w_micro * b.w_micro AS prod
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_terms,
       CAST(SUM(prod) AS BIGINT) AS score_micro2
FROM pairs GROUP BY doc_a, doc_b
ORDER BY score_micro2 DESC, doc_a, doc_b
LIMIT {_LEXPAIR_TOPK}
"""


_MRL_DIMS = (8, 16, 32)


def _sql_mrl_recall(dims: tuple = _MRL_DIMS, k: int = 10) -> str:
    """Per-rung truncated-cosine top-k vs the full-dim top-k —
    list slices v[1:d], the same 6dp-rounded rank contract."""
    parts = ["""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e ORDER BY vec_id LIMIT 3),
top_full AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(list_cosine_similarity(q.qv, e.v), 6) DESC,
                      e.vec_id ASC) AS rank
    FROM q, e WHERE e.vec_id <> q.query_id) r
  WHERE rank <= """ + str(k) + """
)"""]
    for d in dims:
        parts.append(f""",
top_{d} AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(list_cosine_similarity(
                        q.qv[1:{d}], e.v[1:{d}]), 6) DESC,
                      e.vec_id ASC) AS rank
    FROM q, e WHERE e.vec_id <> q.query_id) r
  WHERE rank <= {k}
),
hits_{d} AS (
  SELECT f.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM top_full f JOIN top_{d} a
    ON a.query_id = f.query_id AND a.vec_id = f.vec_id
  GROUP BY f.query_id
)""")
    rungs = "\nUNION ALL\n".join(
        f"""SELECT CAST({d} AS BIGINT) AS dim, q.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {float(k)!r}, 9)
         AS recall
FROM q LEFT JOIN hits_{d} h ON h.query_id = q.query_id"""
        for d in dims
    )
    parts.append("\n" + rungs + "\n")
    return "".join(parts)


SQL_MRL_RECALL = _sql_mrl_recall()


SQL_VOCAB_COVERAGE = f"""
WITH terms AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split({_NORM}, ' ')) AS token FROM documents) t
  WHERE token <> '' GROUP BY token
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM terms),
ranked AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rn
  FROM terms
),
rungs AS (
  SELECT CAST(10 AS BIGINT) AS k,
         CAST(SUM(cnt) AS BIGINT) AS covered_tokens
  FROM ranked WHERE rn <= 10
  UNION ALL
  SELECT 100, CAST(SUM(cnt) AS BIGINT) FROM ranked WHERE rn <= 100
  UNION ALL
  SELECT 1000, CAST(SUM(cnt) AS BIGINT) FROM ranked WHERE rn <= 1000
)
SELECT k, covered_tokens, total_tokens,
       ROUND(CAST(covered_tokens AS DOUBLE)
             / CAST(total_tokens AS DOUBLE), 9) AS coverage
FROM rungs CROSS JOIN tot
"""


SQL_FERTILITY = f"""
WITH base AS (
  SELECT source, lang, {_NORM} AS norm FROM documents
),
per AS (
  SELECT source, lang,
         CAST(length(norm) AS BIGINT) AS nc,
         CAST(len(string_split(norm, ' ')) AS BIGINT) AS nw,
         CAST(len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
              AS BIGINT) AS ns
  FROM base
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nw) AS BIGINT) AS n_words,
       CAST(SUM(ns) AS BIGINT) AS n_subwords,
       CAST(SUM(nc) AS BIGINT) AS n_chars,
       ROUND(CAST(SUM(ns) AS DOUBLE)
             / CAST(GREATEST(SUM(nw), 1) AS DOUBLE), 9) AS fertility,
       ROUND(CAST(SUM(nc) AS DOUBLE)
             / CAST(GREATEST(SUM(ns), 1) AS DOUBLE), 9) AS chars_per_subword
FROM per GROUP BY source, lang
"""


def _langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-vote language-ID against the
    documents table's ground-truth ``lang`` column — the evaluation a
    pipeline runs before trusting a heuristic classifier as a routing
    or filtering key: (true_lang, pred_lang, n, row_share) where
    row_share = n / total docs of that true language.  Exact counts,
    ONE rounded division per cell; one classifier projection + one
    id-keyed join + one hash aggregate."""
    docs = _docs(spark, sf_dir)
    pred = language_id(docs)
    truth = docs.select("doc_id", F.col("lang").alias("true_lang"))
    cells = (
        truth.join(pred, "doc_id")
        .groupBy("true_lang", F.col("lang_pred").alias("pred_lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = cells.groupBy("true_lang").agg(
        F.sum("n").cast("long").alias("row_total")
    )
    return cells.join(totals, "true_lang").select(
        "true_lang", "pred_lang", "n",
        F.round(
            F.col("n").cast("double") / F.col("row_total").cast("double"), 9
        ).alias("row_share"),
    )


SQL_LANGID_CONFUSION = f"""
WITH pred AS ({SQL_LANG_ID}),
cells AS (
  SELECT d.lang AS true_lang, p.lang_pred AS pred_lang,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents d JOIN pred p ON p.doc_id = d.doc_id
  GROUP BY 1, 2
),
totals AS (
  SELECT true_lang, CAST(SUM(n) AS BIGINT) AS row_total
  FROM cells GROUP BY true_lang
)
SELECT c.true_lang, c.pred_lang, c.n,
       ROUND(CAST(c.n AS DOUBLE) / CAST(t.row_total AS DOUBLE), 9)
         AS row_share
FROM cells c JOIN totals t ON t.true_lang = c.true_lang
"""


def _dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row dedup summary a pipeline actually publishes: corpus
    size, exact-duplicate documents and groups, near-dup clusters /
    members / drops, and the exact character mass sitting in exact
    duplicates (the bytes the exact stage alone reclaims).  Pure
    composition of the audited exact_duplicates and _dedup_clusters
    stages — every count an exact integer, no new machinery."""
    docs = _docs(spark, sf_dir)
    ed = exact_duplicates(docs)
    clu = _dedup_clusters(spark, sf_dir)
    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("chars_total"),
    )
    ex = (
        ed.join(docs.select("doc_id", F.length("text").alias("len")),
                "doc_id")
        .agg(
            F.sum(F.when(F.col("is_duplicate"), 1).otherwise(0))
            .cast("long").alias("n_exact_dups"),
            F.count_distinct(
                F.when(F.col("group_size") > 1, F.col("canonical_id"))
            ).cast("long").alias("n_dup_groups"),
            F.sum(F.when(F.col("is_duplicate"), F.col("len")).otherwise(0))
            .cast("long").alias("chars_in_exact_dups"),
        )
    )
    nc = clu.agg(
        F.count_distinct("cluster").cast("long").alias("n_near_clusters"),
        F.count(F.lit(1)).cast("long").alias("n_near_members"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1))
        .cast("long").alias("n_near_dropped"),
    )
    return base.crossJoin(F.broadcast(ex)).crossJoin(F.broadcast(nc))


SQL_DEDUP_REPORT = f"""
WITH ed AS ({SQL_DEDUP_EXACT}),
clu AS ({SQL_DEDUP_CLUSTERS}),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS chars_total
  FROM documents
),
ex AS (
  SELECT CAST(SUM(CASE WHEN ed.is_duplicate THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact_dups,
         CAST(COUNT(DISTINCT CASE WHEN ed.group_size > 1
                                  THEN ed.canonical_id END) AS BIGINT)
           AS n_dup_groups,
         CAST(SUM(CASE WHEN ed.is_duplicate THEN LENGTH(d.text)
                       ELSE 0 END) AS BIGINT) AS chars_in_exact_dups
  FROM ed JOIN documents d ON d.doc_id = ed.doc_id
),
nc AS (
  SELECT CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_near_clusters,
         CAST(COUNT(*) AS BIGINT) AS n_near_members,
         CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
           AS n_near_dropped
  FROM clu
)
SELECT * FROM base, ex, nc
"""


TEXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "token_stats": lambda s, d: token_stats(_docs(s, d)),
    "quality_score": lambda s, d: quality_score(_docs(s, d)),
    "language_id": lambda s, d: language_id(_docs(s, d)),
    "doc_fingerprint": lambda s, d: fingerprint(_docs(s, d)),
    "dedup_exact": lambda s, d: exact_duplicates(_docs(s, d)),
    "minhash_lsh_candidates": lambda s, d: _eager_release(
        lsh_candidates(_docs(s, d))),
    "near_duplicates": lambda s, d: _eager_release(
        near_duplicates(_docs(s, d))),
    "dedup_clusters": _dedup_clusters,
    "dedup_report": _dedup_report,
    "langid_confusion": _langid_confusion,
    "source_retention": _source_retention,
    "packing_report": _packing_report,
    "quality_vs_dup": _quality_vs_dup,
    "simhash": lambda s, d: simhash(_docs(s, d)),
    "simhash_candidates": lambda s, d: simhash_candidates(
        _docs(s, d), bits=_SIMC_BITS, n_bands=_SIMC_BANDS,
        max_hamming=_SIMC_MAXH),
    "corpus_clean": lambda s, d: _eager_release(clean_corpus(
        _docs(s, d), lang=CLEAN_LANG, quality_min=CLEAN_QUALITY_MIN,
        jaccard_min=CLEAN_JACCARD_MIN,
    )),
    "cosine_scores": lambda s, d: cosine_scores(s, _emb(s, d)),
    "cosine_topk": lambda s, d: cosine_topk(s, _emb(s, d)),
    "embedding_near_dups": lambda s, d: embedding_near_dups(
        s, _emb(s, d), threshold=EMBED_NEAR_DUP_THRESHOLD,
        n_planes=_EMBED_PLANES),
    "ann_lsh_topk": lambda s, d: ann_lsh_topk(s, _emb(s, d)),
    "ann_recall": lambda s, d: ann_recall(s, _emb(s, d)),
    "ann_multitable_topk": lambda s, d: ann_lsh_multitable_topk(s, _emb(s, d)),
    "ivf_topk": lambda s, d: ivf_topk(s, _emb(s, d)),
    "ivf_purity": lambda s, d: ivf_purity(s, _emb(s, d)),
    "tfidf_topk": lambda s, d: tfidf_topk(_docs(s, d), k=_TFIDF_K),
    "bm25_topk": lambda s, d: bm25_topk(
        _docs(s, d), n_query_terms=_BM25_Q, topk=_BM25_K),
    "ngram_novelty": lambda s, d: ngram_novelty(_docs(s, d), n=_NOVELTY_N),
    "approx_vocab": lambda s, d: approx_vocab(
        _docs(s, d), k=_AV_K, seed=_AV_SEED),
    "dedup_keep_best": _dedup_keep_best,
    "cluster_balanced_sample": lambda s, d: cluster_balanced_sample(
        s, _emb(s, d), k=_KMEANS_K, iters=_KMEANS_ITERS,
        per_cell=_CBS_PER_CELL),
    "kmeans": lambda s, d: kmeans(
        s, _emb(s, d), k=_KMEANS_K, iters=_KMEANS_ITERS),
    "kmeanspp_seeds": lambda s, d: kmeanspp_seeds(s, _emb(s, d), k=_KPP_K),
    "pq_adc_topk": lambda s, d: pq_adc_topk(s, _emb(s, d)),
    # Arrow/mapInPandas multimodal feature plumbing — exact oracle since
    # round 4 (synthetic payload bytes are SQL-recomputable from the md5
    # hex pair; kernel stats are float64-exact)
    "multimodal_features": lambda s, d: _multimodal_features(s, d),
    "decontaminate": _decontaminate,
    "decontam_by_source": _decontam_by_source,
    "stratified_sample": lambda s, d: stratified_sample(
        _docs(s, d), SAMPLE_RATES, stratum_col="source", seed="sample42"),
    "sample_budget": lambda s, d: sample_to_token_budget(
        _docs(s, d), BUDGET_TOKENS, stratum_col="lang", seed="budget42"),
    "pii_redact": lambda s, d: pii_redact(_pii_injected(s, d)),
    "repetition_ratio": lambda s, d: repetition_stats(_docs(s, d)),
    "pack_concat": lambda s, d: pack_concat(
        _docs(s, d), chunk_tokens=_PACK_CHUNK_TOKENS),
    "unigram_quality": lambda s, d: unigram_logprob(_docs(s, d)),
    "bigram_quality": lambda s, d: bigram_logprob(_docs(s, d)),
    "winnow_fp": lambda s, d: winnow_fingerprints(
        _docs(s, d), k=_WINNOW_K, w=_WINNOW_W),
    "overlap_candidates": lambda s, d: overlap_candidates(
        _docs(s, d), k=_WINNOW_K, w=_WINNOW_W,
        min_shared=_OVERLAP_MIN_SHARED, cap=_OVERLAP_CAP),
    "source_mix": lambda s, d: source_mix(_docs(s, d)),
    "vocab_stats": lambda s, d: vocab_stats(_docs(s, d)),
    "length_histogram": lambda s, d: length_histogram(_docs(s, d)),
    "span_dedup": lambda s, d: span_dedup_stats(
        _docs(s, d), span_tokens=_SPAN_TOKENS),
    "source_kl": lambda s, d: source_kl(_docs(s, d)),
    "doc_kl_outliers": lambda s, d: doc_kl_outliers(_docs(s, d)),
    "chunk_windows": lambda s, d: chunk_windows(
        _docs(s, d), window_tokens=_CHUNK_W, stride=_CHUNK_S),
    "ngram_hotspots": lambda s, d: ngram_hotspots(
        _docs(s, d), n=_HOTSPOT_N, top_k=_HOTSPOT_K),
    "pmi_topk": lambda s, d: pmi_topk(
        _docs(s, d), min_count=_PMI_MIN_COUNT, top_k=_PMI_TOP_K),
    "textrank": lambda s, d: textrank(
        _docs(s, d), max_supersteps=_TEXTRANK_STEPS,
        min_len=_TEXTRANK_MIN_LEN),
    "heaps_law": lambda s, d: heaps_law(_docs(s, d)),
    "fuzzy_decontaminate": _fuzzy_decontaminate,
    "dup_source_matrix": lambda s, d: _eager_release(
        dup_source_matrix(_docs(s, d), threshold=DUP_MATRIX_THR)),
    "cluster_split": _cluster_split,
    "fertility": lambda s, d: fertility_stats(_docs(s, d)),
    "vocab_coverage": _vocab_coverage,
    "mrl_recall": lambda s, d: dim_truncation_recall(s, _emb(s, d)),
    "lexical_pairs": lambda s, d: lexical_pairs(
        _docs(s, d), df_cap=_LEXPAIR_DF_CAP, top_k=_LEXPAIR_TOPK),
}

TEXT_ORACLE_SQL: dict[str, str] = {
    "token_stats": SQL_TOKEN_STATS,
    "quality_score": SQL_QUALITY,
    "language_id": SQL_LANG_ID,
    "doc_fingerprint": SQL_FINGERPRINT,
    "dedup_exact": SQL_DEDUP_EXACT,
    "minhash_lsh_candidates": SQL_LSH_CANDIDATES,
    "near_duplicates": SQL_NEAR_DUPLICATES,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_report": SQL_DEDUP_REPORT,
    "langid_confusion": SQL_LANGID_CONFUSION,
    "source_retention": SQL_SOURCE_RETENTION,
    "packing_report": SQL_PACKING_REPORT,
    "quality_vs_dup": SQL_QUALITY_VS_DUP,
    "simhash": SQL_SIMHASH,
    "simhash_candidates": SQL_SIMHASH_CANDIDATES,
    "kmeanspp_seeds": SQL_KMEANSPP_SEEDS,
    "pq_adc_topk": SQL_PQ_ADC_TOPK,
    "corpus_clean": SQL_CORPUS_CLEAN,
    "cosine_scores": SQL_COSINE_SCORES,
    "cosine_topk": SQL_COSINE_TOPK,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    "ann_recall": SQL_ANN_RECALL,
    "ann_multitable_topk": SQL_ANN_MULTITABLE_TOPK,
    "ivf_topk": SQL_IVF_TOPK,
    "ivf_purity": SQL_IVF_PURITY,
    "kmeans": SQL_KMEANS,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "bm25_topk": SQL_BM25_TOPK,
    "ngram_novelty": SQL_NGRAM_NOVELTY,
    "approx_vocab": SQL_APPROX_VOCAB,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "cluster_balanced_sample": SQL_CLUSTER_BALANCED_SAMPLE,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "decontaminate": SQL_DECONTAMINATE,
    "decontam_by_source": SQL_DECONTAM_BY_SOURCE,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "sample_budget": SQL_SAMPLE_BUDGET,
    "pii_redact": SQL_PII_REDACT,
    "repetition_ratio": SQL_REPETITION,
    "pack_concat": SQL_PACK_CONCAT,
    "unigram_quality": SQL_UNIGRAM_QUALITY,
    "bigram_quality": SQL_BIGRAM_QUALITY,
    "winnow_fp": SQL_WINNOW_FP,
    "overlap_candidates": SQL_OVERLAP_CANDIDATES,
    "source_mix": SQL_SOURCE_MIX,
    "vocab_stats": SQL_VOCAB_STATS,
    "length_histogram": SQL_LENGTH_HISTOGRAM,
    "span_dedup": SQL_SPAN_DEDUP,
    "source_kl": SQL_SOURCE_KL,
    "doc_kl_outliers": SQL_DOC_KL_OUTLIERS,
    "chunk_windows": SQL_CHUNK_WINDOWS,
    "ngram_hotspots": SQL_NGRAM_HOTSPOTS,
    "pmi_topk": SQL_PMI_TOPK,
    "textrank": SQL_TEXTRANK,
    "heaps_law": SQL_HEAPS_LAW,
    "fuzzy_decontaminate": SQL_FUZZY_DECONTAMINATE,
    "dup_source_matrix": SQL_DUP_SOURCE_MATRIX,
    "cluster_split": SQL_CLUSTER_SPLIT,
    "fertility": SQL_FERTILITY,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "mrl_recall": SQL_MRL_RECALL,
    "lexical_pairs": SQL_LEXICAL_PAIRS,
}
