"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas`` kernels.

The Spark-side plumbing here is REAL and tested — schema, hash
partitioning, Arrow batch shapes, vectorized numpy feature kernels.
The codec itself is NOT: this container ships no image/audio
libraries, so ``decode_features`` uses a deterministic fake decoder
(payload bytes → numpy buffer statistics) and ``real_decode`` raises
``NotImplementedError`` with the integration point documented.  A
deployment with PIL/torchaudio installed swaps one function.

Scale notes: payloads never leave the executor — ``mapInPandas``
streams Arrow batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), features are a few
floats per row, and the repartition key is the high-cardinality
media_id, so no skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, "
    "mean double, std double, feat array<float>"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents table: the
    payload is the md5-unhexed text digest repeated — opaque bytes with
    a stable value per doc.  Stands in for a parquet/Iceberg column of
    real encoded media."""
    payload = F.unhex(
        F.concat(F.md5(F.col("text")), F.md5(F.concat(F.lit("2:"), F.col("text"))))
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.length(F.col("text")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def real_decode(payload: bytes, kind: str):
    """Integration point for actual codecs (PIL / soundfile / pyav).
    Not available in this environment by design."""
    raise NotImplementedError(
        "media codecs are not installed in this container; plug a real "
        "decoder here (PIL.Image.open for images, soundfile.read for "
        "audio, av.open for video) and return a numpy array"
    )


def _fake_decode_batch(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes as uint8 buffers,
    padded/truncated to 32 'samples' — vectorizable and stable."""
    out = np.zeros((len(payloads), 32), dtype=np.float32)
    for i, b in enumerate(payloads):
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.float32)
        n = min(len(arr), 32)
        out[i, :n] = arr[:n]
    return out


RESIZED_SCHEMA = "media_id long, width int, height int, pixels binary"
FRAME_SCHEMA = "media_id long, frame_idx int, n_frames int, frame binary"


def resize_images(
    media: DataFrame, width: int = 4, height: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Image-resize plumbing: filters ``kind = 'image'`` rows, decodes
    each payload (fake decoder — ``real_decode`` is the swap-in point
    for PIL), resamples the buffer to ``height*width`` samples with
    deterministic nearest-neighbor index arithmetic, and re-encodes as
    a binary pixel block.  Returns (media_id, width, height, pixels).

    The Spark shape is the real one: a pushed-down kind filter, Arrow
    batches in, one row out per image, binary column out — swapping
    the fake for PIL changes only the numpy lines."""
    imgs = media.where(F.col("kind") == "image")
    if partitions:
        imgs = imgs.repartition(partitions, "media_id")

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height
        for pdf in batches:
            out_px = []
            for b in pdf["payload"]:
                buf = np.frombuffer(b, dtype=np.uint8)
                idx = (np.arange(n_out) * len(buf)) // n_out
                out_px.append(buf[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                    "pixels": out_px,
                }
            )

    return imgs.mapInPandas(do_resize, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Video frame-sampling plumbing: filters ``kind = 'video'`` rows
    and fans each payload out to ``n_frames`` evenly-spaced frames
    (fake codec: the payload is treated as a sequence of
    ``frame_bytes``-byte frames; a real deployment swaps in pyav and
    keeps the fan-out shape).  Returns one row per sampled frame:
    (media_id, frame_idx, n_frames, frame) — the 1→N mapInPandas
    expansion a frame-level feature extractor consumes downstream."""
    vids = media.where(F.col("kind") == "video")
    if partitions:
        vids = vids.repartition(partitions, "media_id")

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, frames = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                total = max(len(b) // frame_bytes, 1)
                take = min(n_frames, total)
                for j in range(take):
                    pos = (j * total) // take
                    ids.append(mid)
                    idxs.append(pos)
                    totals.append(total)
                    frames.append(b[pos * frame_bytes:(pos + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "media_id": np.array(ids, dtype=np.int64),
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "n_frames": np.array(totals, dtype=np.int32),
                    "frame": frames,
                }
            )

    return vids.mapInPandas(do_sample, FRAME_SCHEMA)


def decode_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the media table.  Returns
    (media_id, kind, n_bytes, mean, std, feat[8]) — the plumbing a real
    decode/resize/frame-sample pipeline would use, with the decoder
    faked (see module docstring)."""
    if partitions:
        media = media.repartition(partitions, "media_id")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = _fake_decode_batch(pdf["payload"])
            # Stats in float64: every intermediate (integer samples,
            # dyadic mean, squared deviations, their sums) is exactly
            # representable, so the values are reproducible bit-for-bit
            # by any exact evaluator — that is what gives the driver
            # query a hash-exact DuckDB twin (queries_text.py).
            d64 = decoded.astype(np.float64)
            mean = d64.mean(axis=1)
            std = np.sqrt(((d64 - mean[:, None]) ** 2).mean(axis=1))
            # 8-bin 'feature': segment means over the 32 samples.
            feat = decoded.reshape(len(pdf), 8, 4).mean(axis=2)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "mean": mean,
                    "std": std,
                    "feat": list(feat),
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)
