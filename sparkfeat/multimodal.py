"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / frame-sample as Arrow ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernels are
**stubbed** two ways (clearly marked):

* ``mode='fake'`` (default) — a deterministic stand-in (byte histogram
  as the "feature vector", payload length as "duration") so every piece
  of Spark-side plumbing — schema, batch shape, partitioning, null
  handling — is real and tested end-to-end;
* ``mode='real'`` — raises ``NotImplementedError`` at the exact seam
  where Pillow/ffmpeg/torchaudio decode would drop in (same signature,
  same output schema).

The batch contract is the scale-relevant part: ``mapInPandas`` streams
Arrow record batches, so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads — binary
columns of tens of MB stay bounded per batch."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", IntegerType(), True),  # 0=image,1=audio,2=video
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def attach_fake_payloads(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary payloads derived from the text column (so
    tests need no external media): payload = utf-8 bytes, mime cycles
    by id."""
    return df.select(
        F.col(id_col).alias("media_id"),
        (F.col(id_col) % 3).cast("int").alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def _byte_histogram(payload: bytes, bins: int = 16) -> list[float]:
    a = np.frombuffer(payload, dtype=np.uint8)
    if a.size == 0:
        return [0.0] * bins
    hist, _ = np.histogram(a, bins=bins, range=(0, 256))
    return (hist / a.size).astype(np.float64).tolist()


def decode_features(
    df: DataFrame, mode: str = "fake", bins: int = 16
) -> DataFrame:
    """Decode + feature-extract over the media table.

    ``mode='real'`` is the integration seam: replace `_byte_histogram`
    with the codec of the mime type (PIL Image.open → resize → pixel
    stats; ffmpeg frame sample; torchaudio load → mel stats)."""
    if mode not in ("fake", "real"):
        raise ValueError(mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real media decode requires Pillow/ffmpeg/torchaudio — "
                    "not available in this environment; use mode='fake' "
                    "for the deterministic stand-in kernel"
                )
            feats = [
                _byte_histogram(p, bins) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame, n_frames: int = 4, frame_bytes: int = 64
) -> DataFrame:
    """'Video' frame sampling plumbing: split the payload into
    ``n_frames`` evenly spaced fixed-width windows (a real decoder
    samples keyframes; the slicing/explode shape is identical). Emits
    one row per (media_id, frame_idx) with the frame bytes."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None or len(p) == 0:
                    continue
                step = max(1, (len(p) - frame_bytes) // max(1, n_frames - 1))
                for i in range(n_frames):
                    off = min(i * step, max(0, len(p) - 1))
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(p[off : off + frame_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames}).astype(
                {"media_id": "int64", "frame_idx": "int32"}
            )

    return df.mapInPandas(run, out_schema)
