"""Text-analysis operators for a large-scale training-data pipeline:
token counting, quality scoring, language-ID, document fingerprinting.

These run over the ``documents`` table and are built exclusively from
JVM-side ``pyspark.sql.functions`` (no Python UDFs) so they stay in
whole-stage codegen and scale linearly with a parquet scan.  Every
operator has an exact DuckDB oracle twin (same expressions, same
rounding) in queries.py.

Determinism rules shared with the oracle SQL:
- tokenization = lowercase, split on ``\\s+`` after trim;
- hashes = md5 hex (identical in Spark and DuckDB);
- ratios rounded to 9 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID.  Order matters: ties break toward the FIRST language in
# this list (then 'und' when nothing matches).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "et", "est", "les"),
}

PUNCT_CLASS = "[^.,;:!?]"


def tokens_col(text: Column) -> Column:
    """Pinned tokenization: normalize (lowercase, collapse whitespace,
    trim) then split on single spaces — identical in Spark and DuckDB
    (regex split trailing-empty semantics differ between engines, a
    plain space split after normalization does not)."""
    return F.split(normalize_text(text), " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token/quality statistics (doc_id keyed)."""
    toks = tokens_col(F.col("text"))
    n_chars = F.length("text")
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace("text", PUNCT_CLASS, ""))
    en_stop = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_STOPWORDS["en"]))
    )
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(
            n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)), 9
        ).alias("avg_token_len"),
        F.round(
            n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 9
        ).alias("punct_ratio"),
        F.round(
            en_stop.cast("double") / F.greatest(n_tokens, F.lit(1)), 9
        ).alias("stopword_ratio"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """A simple composite quality score in [0,1]: favors mid-length
    documents with some stopwords and moderate punctuation.  The exact
    formula is pinned here and mirrored in SQL — it is a deterministic
    scoring pipeline stage, not a model."""
    s = token_stats(docs)
    len_score = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * 5.0)
    return s.select(
        "doc_id",
        F.round((len_score + stop_score + punct_pen) / 3.0, 9).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language-ID: count tokens matching each language's
    stopword list; argmax wins, ties break by LANG_STOPWORDS order,
    zero matches → 'und'."""
    toks = tokens_col(F.col("text"))

    def stop_filter(sw):
        # NB: a plain 1-arg lambda — pyspark's higher-order-function
        # bridge inspects arity, and a 2-arg lambda (e.g. a sw=sw
        # default) would be bound as an (element, index) function.
        return lambda t: t.isin(*sw)

    counted = docs.select(
        "doc_id",
        *[
            F.size(F.filter(toks, stop_filter(sw))).alias(f"cnt_{lang}")
            for lang, sw in LANG_STOPWORDS.items()
        ],
    )
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"cnt_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first match wins => pinned tie-break order
        pred = pred.when(F.col(f"cnt_{lang}") == best, F.lit(lang))
    return counted.select("doc_id", pred.alias("lang_pred"))


def normalize_text(text: Column) -> Column:
    """Pinned normalization for fingerprinting/dedup: lowercase,
    collapse whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint = md5 of the normalized text (stable,
    engine-independent — matches the oracle byte-for-byte)."""
    return docs.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("fingerprint")
    )


def profile_documents(docs: DataFrame) -> DataFrame:
    """Fused single-pass profile: (doc_id, quality, lang_pred,
    fingerprint) computed in ONE projection over ONE scan.

    quality_score / language_id / fingerprint are all pure projections
    sharing the normalized text and token split; calling them
    separately (as a naive pipeline composition would) scans the
    documents table once EACH — at 100 TB that is two redundant full
    scans.  The expressions here are the same pinned formulas, so
    results are bitwise-identical to the individual operators
    (pytest-asserted)."""
    toks = tokens_col(F.col("text"))
    n_chars = F.length("text")
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace("text", PUNCT_CLASS, ""))
    stop_counts = {
        lang: F.size(F.filter(toks, (lambda s: lambda t: t.isin(*s))(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }
    stop_ratio = F.round(
        stop_counts["en"].cast("double") / F.greatest(n_tokens, F.lit(1)), 9
    )
    punct_ratio = F.round(
        n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 9
    )
    len_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
    best = F.greatest(*stop_counts.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_STOPWORDS:  # first match wins => pinned tie-break
        pred = pred.when(stop_counts[lang] == best, F.lit(lang))
    return docs.select(
        "doc_id",
        F.round((len_score + stop_score + punct_pen) / 3.0, 9).alias("quality"),
        pred.alias("lang_pred"),
        F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# PII redaction + within-document repetition (round 4)
# ---------------------------------------------------------------------------

# Sequential redaction schedule: each pattern is COUNTED on the text as
# of its turn (after earlier replacements) and then replaced globally.
# Patterns use only character classes, bounded quantifiers and ASCII
# \b — the Java-regex/RE2 common subset, so Spark and DuckDB match
# byte-identically.  Order matters and is pinned: emails first (their
# domains would otherwise feed the IPv4 pattern partial matches).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("emails", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phones", r"\b[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4s", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub PII-shaped spans (emails, NNN-NNNN phones, IPv4s) from
    ``text_col``; returns (doc_id, emails, phones, ipv4s, redacted).

    Pure JVM regexp expressions fused into one projection — a single
    parquet scan at any corpus size, no Python in the path.  The
    standard pre-training scrub stage: counts feed the filter policy,
    ``redacted`` feeds the next pipeline stage."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long")
            .alias(name)
        )
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select("doc_id", *counts, cur.alias("redacted"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Within-document repetition: share of duplicate token bigrams —
    the cheap n-gram repetition signal used to drop degenerate/looped
    generations from training corpora.

    Returns (doc_id, n_bigrams, distinct_bigrams, repetition) where
    repetition = (n - distinct) / n over the pinned tokenization
    (0.0 when a document has fewer than 2 tokens).  One double
    division of exact integers — oracle-bit-exact, no rounding."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    # element_at is 1-indexed (as are DuckDB lists — the oracle twin
    # uses the same indexing); the n>=2 guard keeps F.sequence from
    # producing a DESCENDING range on shorter docs.
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    nb = F.size(bigrams).cast("long")
    nd = F.size(F.array_distinct(bigrams)).cast("long")
    return docs.select(
        "doc_id",
        nb.alias("n_bigrams"),
        nd.alias("distinct_bigrams"),
        F.when(
            nb > 0, (nb - nd).cast("double") / nb.cast("double")
        ).otherwise(F.lit(0.0)).alias("repetition"),
    )


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k terms per document by smoothed tf-idf (the data
    pipeline's standard keyword/topic-signal extractor).

    Pinned semantics (cross-engine determinism):
    - tokens: the repo's pinned tokenization (``tokens_col``), empty
      tokens dropped;
    - idf = ROUND(ln((N+1)/(df+1)) + 1, 6) — smoothed, and ROUNDED at
      6dp so a 1-ulp libm difference between engines' ``ln`` cannot
      surface (tf * idf6 is then an exact decimal product);
    - score = ROUND(tf * idf, 6); ranking by (score DESC, term ASC).

    Shape: two hash aggregates (tf per (doc, term); df per term), a
    broadcast of the 1-row corpus count, and a per-document window
    bounded by distinct terms per doc — no UDFs, no driver data.
    Returns (doc_id, rank, term, score).
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    idf = F.round(
        F.log((F.col("n_docs") + 1).cast("double")
              / (F.col("df") + 1).cast("double")) + 1.0,
        6,
    )
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term",
            F.round(F.col("tf").cast("double") * idf, 6).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "score")
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """CCNet-style fluency score: per-document mean negative
    log-probability per token under an add-one-smoothed unigram
    language model trained on the corpus itself — the in-sandbox
    stand-in for a KenLM n-gram perplexity filter (Wenzek et al.,
    "CCNet", 2020 filters by LM perplexity; no n-gram LM toolkit
    exists in this environment, so the model is the honest unigram).
    Low nll = stopword-heavy "typical" prose; high nll = rare-token
    soup — the pipeline filters by band, not by a single cutoff.

    Pinned semantics (cross-engine determinism):
    - tokens: the repo's pinned tokenization (``tokens_col``), empty
      tokens dropped; documents with zero tokens emit no row (same
      empty-doc rule as tfidf_topk);
    - p(t) = (cnt(t) + 1) / (total_tokens + vocab) — add-one
      smoothing over the corpus unigram counts;
    - per-token logp_micro = CAST(ROUND(ln(p) * 1e6) AS BIGINT).
      Rounding to micro-nats makes each per-token contribution an
      exact INTEGER, so the per-document sum is order-independent —
      STRICTLY stronger than tfidf's round-at-6dp pattern, which is
      safe for per-row products but not for a SUM of thousands of
      doubles whose partition order Spark does not pin;
    - nll = ROUND(-sum_micro / (n_tokens * 1e6), 6): one division of
      two exactly-representable integers (|sum_micro| < 2^53 up to
      ~10^8-token documents), a single correctly-rounded IEEE op —
      identical in Spark and DuckDB.

    Shape (design-for-100x): one hash aggregate for corpus term
    counts, a 1-row broadcast of (total, vocab), one term-keyed
    equi-join of the token stream against the term table, and one
    per-doc hash aggregate of exact integers — no UDFs, no windows,
    no driver data.  The term join's key distribution is zipfian
    (stopwords are hot keys), but the count table is |vocab| rows —
    AQE broadcasts it when small and splits skewed shuffle partitions
    otherwise.  Returns (doc_id, n_tokens, nll).
    """
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    cnt = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    totals = cnt.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    logp = cnt.crossJoin(F.broadcast(totals)).select(
        "term",
        F.round(
            F.log(
                (F.col("cnt") + 1).cast("double")
                / (F.col("total") + F.col("vocab")).cast("double")
            ) * 1e6
        ).cast("bigint").alias("logp_micro"),
    )
    return (
        toks.join(logp, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("logp_micro").alias("sum_micro"),
        )
        .select(
            "doc_id", "n_tokens",
            F.round(
                -F.col("sum_micro").cast("double")
                / (F.col("n_tokens").cast("double") * 1e6),
                6,
            ).alias("nll"),
        )
    )


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Bigram extension of ``unigram_logprob`` — one step closer to
    CCNet's n-gram LM: each token after the first is scored by the
    add-one-smoothed conditional p(t_i | t_{i-1}) =
    (c2(t_{i-1}, t_i) + 1) / (c1(t_{i-1}) + vocab); the first token
    falls back to the unigram p(t_0) = (c1 + 1) / (total + vocab).
    The model is trained on the scored corpus itself, so every
    observed bigram has c2 >= 1 and no unseen-event path exists.

    Same pinned determinism contract as unigram_logprob: per-token
    log-probs become exact INTEGER micro-nats before the per-doc sum
    (order-independent), and nll is one correctly-rounded division of
    exact integers, ROUND 6dp.  Empty docs emit no row.

    Shape (design-for-100x): one per-doc LAG window (bounded by
    document length), two corpus hash aggregates (unigram + bigram
    counts), a 1-row broadcast of (total, vocab), three equi-joins of
    the token stream against the count tables, one per-doc hash
    aggregate of exact integers — no UDFs, no unbounded windows.
    Returns (doc_id, n_tokens, nll).
    """
    from pyspark.sql import Window

    seq = (
        docs.select(
            "doc_id",
            F.posexplode(tokens_col(F.col("text"))).alias("pos", "term"),
        )
        .where(F.col("term") != "")
        .withColumn(
            "prev",
            F.lag("term").over(
                Window.partitionBy("doc_id").orderBy("pos")
            ),
        )
    )
    c1 = seq.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c1")
    )
    totals = c1.agg(
        F.sum("c1").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    c2 = (
        seq.where(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    c1t = c1.select(F.col("term").alias("t_term"), F.col("c1").alias("c1t"))
    c1p = c1.select(F.col("term").alias("p_term"), F.col("c1").alias("c1p"))
    joined = (
        seq.join(c1t, seq["term"] == c1t["t_term"])
        .join(c1p, seq["prev"] == c1p["p_term"], "left_outer")
        .join(c2, ["prev", "term"], "left_outer")
        .crossJoin(F.broadcast(totals))
    )
    lp = F.when(
        F.col("prev").isNull(),
        F.round(
            F.log(
                (F.col("c1t") + 1).cast("double")
                / (F.col("total") + F.col("vocab")).cast("double")
            ) * 1e6
        ),
    ).otherwise(
        F.round(
            F.log(
                (F.col("c2") + 1).cast("double")
                / (F.col("c1p") + F.col("vocab")).cast("double")
            ) * 1e6
        )
    ).cast("bigint")
    return (
        joined.select("doc_id", lp.alias("lp_micro"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lp_micro").alias("sum_micro"),
        )
        .select(
            "doc_id", "n_tokens",
            F.round(
                -F.col("sum_micro").cast("double")
                / (F.col("n_tokens").cast("double") * 1e6),
                6,
            ).alias("nll"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    n_query_terms: int = 6,
    topk: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 retrieval scoring (Robertson et al., TREC-3 1994;
    the Lucene default ranking function) — the relevance-ranking step
    a data pipeline runs when mining a corpus for documents matching a
    query (eval-set curation, topic mining, RAG index sanity checks).

    The query is DERIVED from the corpus so the operator is
    self-contained at any scale factor: the ``n_query_terms`` terms
    with the highest document frequency (ties broken term-ascending) —
    a deterministic, data-defined "head query" that exercises exactly
    the BM25 machinery (idf discounts the common terms, tf saturates
    via k1, dl/avgdl normalizes long documents via b).

    Pinned semantics (cross-engine determinism, shared with the DuckDB
    twin in queries_text.py):

    - tokens: the repo's pinned tokenization (``tokens_col``), empty
      tokens dropped; dl = per-doc token count; N = total corpus rows
      (empty docs count toward N and avgdl's denominator, matching the
      classical corpus-statistics definition);
    - avgdl6 = ROUND(total_tokens / N, 6) and r6 = ROUND(dl / avgdl6,
      6) — both single IEEE divisions rounded at 6dp so downstream
      products are engine-identical;
    - idf6 = ROUND(LN((N - df + 0.5)/(df + 0.5) + 1.0), 6) — the
      Lucene "+1 inside the log" variant (non-negative for df <= N);
      rounded BEFORE use so a 1-ulp libm ln() divergence cannot
      surface (the tfidf_topk contract);
    - per-(doc, term) contribution = idf6 * ((tf * (k1+1)) / (tf + k1
      * (1 - b + b * r6))) — a pinned parenthesization of double ops,
      then CAST(ROUND(x * 1e6) AS BIGINT): integer MICRO-points, so
      the per-document SUM over matched query terms is exact integer
      arithmetic, order-independent (the unigram_logprob contract);
    - score = ROUND(sum_micro / 1e6, 6); ranking by (sum_micro DESC,
      doc_id ASC) — the tie-break compares exact integers, never
      doubles.

    Shape (design-for-100x): hash aggregates over the (doc, term)
    table + a 1-row corpus-stats broadcast + a ``topk``-row
    TakeOrdered — the query-term table is ``n_query_terms`` rows and
    broadcasts, so after the qterm filter the scoring side is tiny
    (verified: AQE builds the broadcast from the FILTERED tf side, not
    the corpus); the final global top-k is TakeOrderedAndProject
    (per-partition heads, no full sort).  Returns
    (rank, doc_id, n_hits, score).
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # dl / total_tokens / df all derive from the tf aggregate, so every
    # downstream reduction works on the much smaller (doc, term) table.
    # NOTE (plan shape): Catalyst does not dedupe the shared tf subtree
    # across the df/dl/stats branches — physically the corpus is
    # re-tokenized per branch.  A caller amortizing this over a 100-TB
    # corpus persists tf (or the token stream) first, exactly like the
    # bench's shared-corpus-cache workloads; the function stays
    # cache-free so it composes with the caller's storage policy.
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).crossJoin(
        F.broadcast(dl.agg(
            F.sum("dl").cast("long").alias("total_tokens")
        ))
    )
    qterms = df.orderBy(F.desc("df"), F.asc("term")).limit(n_query_terms)

    avgdl6 = F.round(
        F.col("total_tokens").cast("double") / F.col("n_docs").cast("double"),
        6,
    )
    r6 = F.round(F.col("dl").cast("double") / F.col("avgdl6"), 6)
    idf6 = F.round(
        F.log(
            (F.col("n_docs").cast("double") - F.col("df").cast("double")
             + 0.5) / (F.col("df").cast("double") + 0.5) + 1.0
        ),
        6,
    )
    tf_d = F.col("tf").cast("double")
    contrib = F.col("idf6") * (
        (tf_d * (k1 + 1.0))
        / (tf_d + k1 * ((1.0 - b) + b * F.col("r6")))
    )
    scored = (
        tf.join(F.broadcast(qterms.select("term", "df")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl6", avgdl6)
        .withColumn("r6", r6)
        .withColumn("idf6", idf6)
        .select(
            "doc_id",
            F.round(contrib * 1e6).cast("long").alias("micro"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.sum("micro").alias("sum_micro"),
        )
    )
    top = scored.orderBy(F.desc("sum_micro"), F.asc("doc_id")).limit(topk)
    w = Window.orderBy(F.desc("sum_micro"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "doc_id", "n_hits",
        F.round(F.col("sum_micro").cast("double") / 1e6, 6).alias("score"),
    )


def approx_vocab(
    docs: DataFrame, k: int = 4, seed: str = "vocab42"
) -> DataFrame:
    """Per-source approximate distinct-token count via derandomized
    Flajolet-Martin sketches, reported NEXT TO the exact count — the
    sketch-quality read-out a 100-TB pipeline consults before swapping
    its exact DISTINCT aggregations (a full shuffle of the token
    stream) for sketch merges (k longs per group, map-side
    combinable).  At scale the exact column is the one you drop; here
    it doubles as the built-in accuracy audit.

    DERANDOMIZED like every sampler in this engine (algos/anf.py):
    register j's contribution for term t is the lowest set bit of the
    48-bit integer md5(seed:j:t)[:12 hex] (all-zero hash pins 2^48),
    the per-source mask is a ``bit_or`` aggregate — a union
    homomorphism, so occurrence multiplicity is irrelevant by
    construction — and the estimate is the exact-IEEE FM read-out
    shared with ANF (``fm_estimate``: integer shift + pinned
    fractional-power literals, no libm pow).  The APPROXIMATION is
    pinned; the computation is exact, so the DuckDB twin hash-matches.

    Shape (design-for-100x): ONE projection computing k register
    columns per token row, ONE hash aggregate per source (k bit_ors +
    the exact COUNT DISTINCT used as the audit baseline).  Returns
    (source, exact_distinct, fm_estimate, rel_error).
    """
    from mesos_pregel_spark.algos.anf import fm_estimate

    toks = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("term")
    ).where(F.col("term") != "")

    def reg(j: int) -> Column:
        h = (
            f"cast(conv(substring(md5(concat_ws(':', '{seed}', '{j}', "
            f"term)), 1, 12), 16, 10) as bigint)"
        )
        return F.expr(
            f"CASE WHEN {h} = 0 THEN shiftleft(cast(1 as bigint), 48) "
            f"ELSE {h} & -{h} END"
        )

    masks = toks.groupBy("source").agg(
        F.count_distinct("term").cast("long").alias("exact_distinct"),
        *[F.bit_or(reg(j)).alias(f"m{j}") for j in range(k)],
    )
    est = fm_estimate([f"m{j}" for j in range(k)])
    return masks.select(
        "source", "exact_distinct",
        est.alias("fm_estimate"),
        F.round(
            (est - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double"), 6
        ).alias("rel_error"),
    )


# The BPE-ish subword proxy: maximal lowercase-alpha runs, digit runs,
# and single other-characters over the NORMALIZED text — a tokenizer-
# agnostic stand-in for subword count whose regex behaves identically
# in Java (Spark) and RE2-like (DuckDB) engines for this class-only
# pattern.  Mirrored verbatim in queries_text.SQL_FERTILITY.
SUBWORD_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def fertility_stats(docs: DataFrame) -> DataFrame:
    """Tokenizer fertility per (source, lang) — the pre-training
    budget metric: how many SUBWORDS a tokenizer will spend per
    whitespace word (fertility), and how many characters each subword
    carries.  High-fertility slices (digit-heavy, punctuation-heavy,
    non-English) consume token budget disproportionately to their
    text volume — the roll-up a data recipe reads next to source_mix
    before converting byte budgets into token budgets.

    Pinned: per-doc counts are exact longs (word count = the shared
    tokens_col split; subword count = regexp_extract_all over the
    same normalized text with the class-only SUBWORD_RE); the
    per-group sums are order-independent integer aggregates; fertility
    and chars_per_subword are ONE 9dp-rounded division each with
    GREATEST(. , 1) guards.  One corpus scan, one hash aggregate with
    map-side partials, no joins, no Python."""
    per = docs.select(
        "source", "lang", normalize_text(F.col("text")).alias("norm")
    ).select(
        "source", "lang",
        F.length("norm").cast("long").alias("nc"),
        F.size(F.split(F.col("norm"), " ")).cast("long").alias("nw"),
        F.size(
            F.expr(f"regexp_extract_all(norm, '{SUBWORD_RE}', 0)")
        ).cast("long").alias("ns"),
    )
    return (
        per.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nw").cast("long").alias("n_words"),
            F.sum("ns").cast("long").alias("n_subwords"),
            F.sum("nc").cast("long").alias("n_chars"),
        )
        .select(
            "source", "lang", "n_docs", "n_words", "n_subwords", "n_chars",
            F.round(
                F.col("n_subwords").cast("double")
                / F.greatest(F.col("n_words"), F.lit(1)).cast("double"), 9
            ).alias("fertility"),
            F.round(
                F.col("n_chars").cast("double")
                / F.greatest(F.col("n_subwords"), F.lit(1)).cast("double"), 9
            ).alias("chars_per_subword"),
        )
    )


def lexical_pairs(
    docs: DataFrame, df_cap: int = 50, top_k: int = 100
) -> DataFrame:
    """Sparse lexical all-pairs similarity (Bayardo-Ma-Srikant WWW
    2007's inverted-index family): the tf-idf dot product between
    every document pair that shares at least one DISCRIMINATIVE term
    — the lexical cousin of embedding_near_dups, catching template
    reuse that shingle Jaccard misses when boilerplate is reordered.

    Pinned exactness: per-(doc, term) weights follow the tfidf_topk
    discipline (idf ROUNDED at 6dp before any product) and are then
    SNAPPED to BIGINT micro-units, so every pair score is an exact
    integer sum of exact integer products — order-independent under
    any partitioning, zero FP in the aggregate; top-k under the
    all-integer (score DESC, doc_a, doc_b) total order.

    Scale shape: the inverted index keeps only terms with
    2 <= df <= df_cap, so pair work is bounded by vocab · C(df_cap, 2)
    — never corpus²; one self-join on the term key + one hash
    aggregate + TakeOrdered.  The df cap is the same hub discipline as
    link_prediction's degree cap (a df-10⁶ stopword would otherwise
    dominate the pair space while carrying ~zero idf weight anyway)."""
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    idf = F.round(
        F.log((F.col("n_docs") + 1).cast("double")
              / (F.col("df") + 1).cast("double")) + 1.0,
        6,
    )
    w = (
        tf.join(dfreq.where((F.col("df") >= 2) & (F.col("df") <= df_cap)),
                "term")
        .crossJoin(F.broadcast(n))
        .select(
            "term", "doc_id",
            F.round(
                F.round(F.col("tf").cast("double") * idf, 6) * 1e6
            ).cast("long").alias("w_micro"),
        )
    )
    a, b = w.alias("a"), w.alias("b")
    pairs = a.join(
        b, (F.col("a.term") == F.col("b.term"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        (F.col("a.w_micro") * F.col("b.w_micro")).alias("prod"),
    )
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
            F.sum("prod").cast("long").alias("score_micro2"),
        )
        .orderBy(F.desc("score_micro2"), "doc_a", "doc_b")
        .limit(top_k)
    )
