"""Deterministic synthetic transcript tables (FIXTURES.md §1).

The engine's primary input shape (BASELINE.json:15) is an Iceberg
table of multi-turn conversation / agent transcripts:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp

No such table exists in /root/testdata, so tests and benches
synthesize it deterministically (seed=42, numpy ``default_rng``) —
zipf-length conversations, user/assistant alternation with system
openers and tool turns, zipf-skewed tool picks so that hub vertices
(``role:assistant``, ``role:user``, ``tool:bash``) exercise the skew
machinery (SURVEY §7.6 risk 6).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

TOOL_NAMES = [
    "bash", "read", "write", "edit", "grep", "glob", "search", "fetch",
    "browser", "sql", "python", "notebook", "git", "diff", "test",
    "lint", "format", "deploy", "docker", "k8s", "aws", "gcs", "http",
    "mail", "web",
]

_EPOCH = np.datetime64("2026-01-01T00:00:00")


def _text(seed: int, conv_id: str, turn_idx: int) -> str:
    h = hashlib.sha1(f"{seed}:{conv_id}:{turn_idx}".encode()).hexdigest()[:16]
    return f"{conv_id}:{turn_idx}:{h}"


def generate_transcripts_pdf(n_conv: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic transcripts as a pandas DataFrame (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    # Conversation lengths: 2 + Zipf(a=2.0), clipped to [2, 40].
    lengths = np.clip(2 + rng.zipf(2.0, size=n_conv), 2, 40)
    sys_open = rng.random(n_conv) < 0.10
    # Pre-draw per-conversation randomness for tool insertion + tool ids.
    # Worst case each conversation needs < 40 tool decisions.
    tool_flip = rng.random((n_conv, 40))
    # Zipf-distributed pick over 25 tool names (rank-skewed => hub tools).
    tool_rank = np.minimum(rng.zipf(1.5, size=(n_conv, 40)) - 1, len(TOOL_NAMES) - 1)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    tools: list[str | None] = []
    for i in range(n_conv):
        cid = f"conv{i:08d}"
        L = int(lengths[i])
        seq: list[tuple[str, str | None]] = []
        nxt = "user"
        if sys_open[i]:
            seq.append(("system", None))
        k = 0  # tool-decision cursor
        while len(seq) < L:
            seq.append((nxt, None))
            if nxt == "assistant" and tool_flip[i, k] < 0.15 and len(seq) < L:
                seq.append(("tool", TOOL_NAMES[tool_rank[i, k]]))
            k += 1
            nxt = "assistant" if nxt == "user" else "user"
        seq = seq[:L]
        for t, (role, tool) in enumerate(seq):
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(role)
            tools.append(tool)

    n = len(conv_ids)
    texts = [_text(seed, c, t) for c, t in zip(conv_ids, turn_idxs)]
    conv_num = np.array([int(c[4:]) for c in conv_ids], dtype=np.int64)
    ts = _EPOCH + conv_num * np.timedelta64(60, "s") + np.array(turn_idxs) * np.timedelta64(30, "s")
    return pd.DataFrame(
        {
            "conv_id": pd.array(conv_ids, dtype="string"),
            "turn_idx": np.array(turn_idxs, dtype=np.int32),
            "role": pd.array(roles, dtype="string"),
            "text": pd.array(texts, dtype="string"),
            "tool": pd.array(tools, dtype="string"),
            "ts": ts.astype("datetime64[us]"),
        }
    )


def generate_transcripts(spark: SparkSession, n_conv: int, seed: int = 42,
                         partitions: int | None = None) -> DataFrame:
    """Deterministic transcript DataFrame with the pinned schema.

    Driver-side (pandas) generation — fine for test-sized fixtures
    whose exact rows the oracles pin.  Benches use
    :func:`generate_transcripts_dist`, which scales."""
    pdf = generate_transcripts_pdf(n_conv, seed)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    if partitions:
        df = df.repartition(partitions, "conv_id")
    return df


_EPOCH_S = 1767225600  # 2026-01-01T00:00:00Z, matches _EPOCH above
_MAX_PAIRS = 20  # user/assistant pairs per conversation (L <= 40)


def generate_transcripts_dist(
    spark: SparkSession, n_conv: int, seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed transcript generator: ``spark.range`` + column
    functions ONLY — conversations are built as per-row array
    expressions and posexploded, so nothing materializes on the driver
    and fixtures scale to 10^8+ turns (round-1 bench shipped 4975 KiB
    tasks from the pandas path).

    Deterministic (hash-derived uniforms from ``seed``) and
    distributionally equivalent to :func:`generate_transcripts` —
    zipf-ish conversation lengths in [2, 40], 10% system openers,
    user/assistant alternation, ~15% tool turns after assistant turns
    with zipf-skewed tool picks — but NOT row-identical (numpy RNG
    streams are not reproducible in SQL expressions).  Tests pin the
    pandas rows; the bench only needs shape + skew.
    """
    from pyspark.sql import functions as F

    def u(name: str, *cols) -> F.Column:
        """Deterministic uniform in (0, 1) from (seed, name, cols)."""
        h = F.xxhash64(F.lit(f"{seed}:{name}"), *cols)
        return (F.pmod(h, F.lit(1 << 20)).cast("double") + 0.5) / float(1 << 20)

    df = spark.range(n_conv).select(F.col("id").alias("i"))
    # Heavy-tailed lengths: 2 + floor(1/u) ~ zipf(a=2), clipped to 40.
    # NB: clamp in DOUBLE before the int cast — ANSI mode makes an
    # overflowing cast a task failure, and 1/u^k explodes for tiny u.
    df = df.withColumn(
        "L",
        F.least(F.lit(40.0),
                F.lit(2.0) + F.pow(u("len", F.col("i")), F.lit(-1.0))).cast("int"),
    ).withColumn("sys", u("sys", F.col("i")) < 0.10)

    none_s = F.lit(None).cast("string")
    user_s = F.struct(F.lit("user").alias("role"), none_s.alias("tool"))
    asst_s = F.struct(F.lit("assistant").alias("role"), none_s.alias("tool"))
    sys_s = F.struct(F.lit("system").alias("role"), none_s.alias("tool"))
    tools_arr = F.array(*[F.lit(t) for t in TOOL_NAMES])

    def block(p):  # NB: 1-arg HOF lambda (closure defaults would bind the index)
        # ~15% of assistant turns are followed by a tool turn; the tool
        # pick is zipf-skewed (u^-2 rank) so hub tools dominate.
        rank = F.least(
            F.pow(u("rank", F.col("i"), p), F.lit(-2.0)) - F.lit(1.0),
            F.lit(float(len(TOOL_NAMES) - 1)),
        ).cast("int")
        tool_s = F.struct(
            F.lit("tool").alias("role"),
            F.element_at(tools_arr, rank + F.lit(1)).alias("tool"),
        )
        return F.when(
            u("flip", F.col("i"), p) < 0.15, F.array(user_s, asst_s, tool_s)
        ).otherwise(F.array(user_s, asst_s))

    seq = F.flatten(F.transform(F.sequence(F.lit(0), F.lit(_MAX_PAIRS - 1)), block))
    seq = F.when(F.col("sys"), F.concat(F.array(sys_s), seq)).otherwise(seq)
    seq = F.slice(seq, F.lit(1), F.col("L"))

    turns = df.select("i", F.posexplode(seq).alias("turn_idx", "rt"))
    conv_id = F.format_string("conv%08d", F.col("i"))
    # Same text recipe as the pandas generator: sha1(f"{seed}:{cid}:{t}")[:16].
    digest = F.substring(
        F.sha1(F.concat_ws(":", F.lit(str(seed)), conv_id, F.col("turn_idx"))), 1, 16
    )
    out = turns.select(
        conv_id.alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("rt.role").alias("role"),
        F.concat_ws(":", conv_id, F.col("turn_idx"), digest).alias("text"),
        F.col("rt.tool").alias("tool"),
        F.timestamp_seconds(
            F.lit(_EPOCH_S) + F.col("i") * 60 + F.col("turn_idx") * 30
        ).alias("ts"),
    )
    if partitions:
        out = out.repartition(partitions, "conv_id")
    return out


# Hand-checkable micro-graphs (FIXTURES.md §2): direct edge lists with
# closed-form expected outputs, independent of the Python oracle.
MICRO_GRAPHS: dict[str, list[tuple[str, str, float]]] = {
    "tri_cycle": [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
    "chain4": [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)],
    "star_hub": [(f"x{i}", "hub", 1.0) for i in range(1, 11)],
    "k4": [
        (a, b, 1.0)
        for a in "abcd"
        for b in "abcd"
        if a != b
    ],
    "two_islands": [
        (a, b, 1.0) for a in "abc" for b in "abc" if a != b
    ] + [
        (a, b, 1.0) for a in "xyz" for b in "xyz" if a != b
    ],
    "bipartite6": [
        (a, b, 1.0) for a in "abc" for b in "xyz"
    ] + [
        (b, a, 1.0) for a in "abc" for b in "xyz"
    ],
}


def micro_graph_df(spark: SparkSession, name: str) -> DataFrame:
    """A micro-graph as an edges DataFrame (src, dst string keys, weight)."""
    rows = MICRO_GRAPHS[name]
    schema = T.StructType(
        [
            T.StructField("src_actor", T.StringType(), False),
            T.StructField("dst_actor", T.StringType(), False),
            T.StructField("weight", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema=schema)


def generate_documents_dist(
    spark: SparkSession,
    n_docs: int,
    dup_frac: float = 0.2,
    n_words: int = 20,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed synthetic document corpus with PLANTED near-duplicate
    families, for dedup benches at sizes the driver testdata doesn't
    reach (``spark.range`` + column functions only — nothing on the
    driver, scales to 10^7+ docs).

    Layout: the first ``(1-dup_frac)·n`` doc ids are unique "base"
    documents of ``n_words`` hash-derived words; the rest are near-dups
    of a hash-picked base with ONE word substituted (Jaccard on 5-gram
    shingles ≈ 0.9, comfortably above the 0.8 verify threshold).
    Deterministic in ``seed``; returns (doc_id:long, text:string,
    base_id:long, is_dup:boolean) — the extra columns let tests check
    planted-pair recall without re-deriving the families.
    """
    from pyspark.sql import functions as F

    n_base = max(1, int(n_docs * (1.0 - dup_frac)))
    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_dup = F.col("doc_id") >= F.lit(n_base)
    base = F.when(
        is_dup, F.pmod(F.xxhash64(F.lit(f"{seed}:fam"), F.col("doc_id")),
                       F.lit(n_base))
    ).otherwise(F.col("doc_id"))
    df = df.select("doc_id", base.alias("base_id"), is_dup.alias("is_dup"))
    mut_pos = F.pmod(F.xxhash64(F.lit(f"{seed}:pos"), F.col("doc_id")),
                     F.lit(n_words))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda w: F.when(
            F.col("is_dup") & (w == mut_pos),
            F.substring(F.sha1(F.concat_ws(
                ":", F.lit(f"{seed}:mut"), F.col("doc_id").cast("string"),
                w.cast("string"))), 1, 8),
        ).otherwise(
            F.substring(F.sha1(F.concat_ws(
                ":", F.lit(f"{seed}:w"), F.col("base_id").cast("string"),
                w.cast("string"))), 1, 8),
        ),
    )
    out = df.select(
        "doc_id", F.concat_ws(" ", words).alias("text"), "base_id", "is_dup"
    )
    if partitions:
        out = out.repartition(partitions, "doc_id")
    return out
