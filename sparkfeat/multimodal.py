"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / frame-sample as Arrow ``mapInPandas`` stages.

Decode kernels, by honesty level:

* ``mode='real'`` — REAL decoders for the three container-less formats:
  24-bit uncompressed **BMP** (file+info header, bottom-up padded BGR
  rows), 16-bit PCM **WAV** (RIFF/fmt/data chunks), and the **RVID**
  raw-video container (header + uncompressed RGB frames, with
  O(frame) seek-decode for keyframe sampling) — pure struct+numpy, no
  codec library, byte-level round-trip tested against the matching
  encoders below. COMPRESSED video raises ``NotImplementedError`` at
  the exact seam where an ffmpeg keyframe decoder would drop in
  (compressed codecs genuinely need external libs).
* ``mode='fake'`` — a deterministic stand-in (byte histogram) kept for
  plumbing tests and as the driver-oracle query kernel.

The batch contract is the scale-relevant part: ``mapInPandas`` streams
Arrow record batches, so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads — binary
columns of tens of MB stay bounded per batch."""

from __future__ import annotations

import struct
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


# ---------------------------------------------------------------------------
# Real codecs: 24-bit BMP and 16-bit PCM WAV (struct-level, no libraries)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows padded to 4
    bytes) — the format's full required surface, byte-exact."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = pixels[y, :, ::-1].tobytes()
        body += bgr + b"\x00" * pad
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.
    Raises ValueError on anything that isn't plain 24-bit BI_RGB."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, comp = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        src = offset + i * stride
        line = np.frombuffer(payload, dtype=np.uint8, count=row, offset=src).reshape(
            w, 3
        )
        y = i if top_down else h - 1 - i
        out[y] = line[:, ::-1]  # BGR → RGB
    return out


def resize_box(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact integer box-average downsample of an (h, w, 3) uint8 image:
    each output pixel is ``floor(mean)`` of its source block. Integer
    arithmetic end-to-end — no float rounding mode to disagree about, so
    any engine (numpy here, SQL in the oracle) reproduces every byte.
    Requires integer shrink factors (h % out_h == w % out_w == 0)."""
    h, w, ch = px.shape
    if h % out_h or w % out_w:
        raise ValueError(f"non-integer resize {h}x{w} -> {out_h}x{out_w}")
    fh, fw = h // out_h, w // out_w
    blocks = px.reshape(out_h, fh, out_w, fw, ch).astype(np.uint32)
    return (blocks.sum(axis=(1, 3)) // (fh * fw)).astype(np.uint8)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("out_w", IntegerType(), False),
        StructField("out_h", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("r_mean", DoubleType(), False),
        StructField("g_mean", DoubleType(), False),
        StructField("b_mean", DoubleType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def resize_images(
    df: DataFrame,
    out_h: int = 4,
    out_w: int = 4,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Arrow-batched image resize stage: decode BMP → integer box-average
    → re-encode BMP, plus per-channel means of the resized image. Input
    rows must be images (filter ``mime == 0`` upstream); the batch
    contract bounds per-task payload memory the same way decode_features
    does."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                rp = resize_box(decode_bmp(bytes(p)), out_h, out_w)
                enc = encode_bmp(rp)
                rows.append(
                    (
                        int(i),
                        out_w,
                        out_h,
                        len(enc),
                        float(rp[:, :, 0].mean()),
                        float(rp[:, :, 1].mean()),
                        float(rp[:, :, 2].mean()),
                        enc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "out_w",
                    "out_h",
                    "n_bytes",
                    "r_mean",
                    "g_mean",
                    "b_mean",
                    "payload",
                ],
            ).astype(
                {
                    "media_id": "int64",
                    "out_w": "int32",
                    "out_h": "int32",
                    "n_bytes": "int64",
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, RESIZE_SCHEMA
    )


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 mono samples as a PCM WAV (RIFF/fmt/data)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit PCM mono/stereo WAV → (sample_rate, float64
    samples in [-1, 1]); walks RIFF chunks, so extra chunks (LIST etc.)
    are tolerated."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sr, bits, channels, data = 12, None, None, 1, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_code != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt_code}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return sr, x


def _image_features(payload: bytes) -> list[float]:
    px = decode_bmp(payload)
    gray = px.astype(np.float64).mean(axis=2)
    return [
        float(px.shape[1]),
        float(px.shape[0]),
        float(px[:, :, 0].mean()),
        float(px[:, :, 1].mean()),
        float(px[:, :, 2].mean()),
        float(gray.std()),
        float(gray.min()),
        float(gray.max()),
    ]


def _audio_features(payload: bytes) -> list[float]:
    sr, x = decode_wav(payload)
    n = len(x)
    rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
    peak = float(np.abs(x).max()) if n else 0.0
    zcr = float((np.diff(np.signbit(x)) != 0).mean()) if n > 1 else 0.0
    return [float(sr), float(n), n / sr, rms, peak, zcr, 0.0, 0.0]


def attach_real_payloads(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL media payloads per doc (no external data):
    even ids → an 8×8 24-bit BMP whose pixels are the doc text's md5
    bytes tiled; odd ids → a 16 kHz PCM WAV of a sine whose frequency is
    id-derived. Arrow-batched encode (one Python pass)."""
    media_schema = MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, mimes, payloads, sizes = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                i = int(i)
                if i % 2 == 0:
                    digest = hashlib.md5(t.encode()).digest()
                    raw = np.frombuffer((digest * 12)[: 8 * 8 * 3], dtype=np.uint8)
                    p = encode_bmp(raw.reshape(8, 8, 3).copy())
                    mime = 0
                else:
                    freq = 100.0 + (i % 50) * 10.0
                    ts = np.arange(800) / 16000.0
                    wave = (np.sin(2 * np.pi * freq * ts) * 12000).astype(np.int16)
                    p = encode_wav(wave, 16000)
                    mime = 1
                ids.append(i)
                mimes.append(mime)
                payloads.append(p)
                sizes.append(len(p))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "mime": mimes,
                    "payload": payloads,
                    "n_bytes": sizes,
                }
            ).astype({"media_id": "int64", "mime": "int32", "n_bytes": "int64"})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(gen, media_schema)


RAWVIDEO_MAGIC = b"RVID"


def encode_rawvideo(frames: np.ndarray) -> bytes:
    """Encode (n_frames, h, w, 3) uint8 RGB as an uncompressed container:
    ``RVID | u32 n_frames | u32 h | u32 w | frames...`` (row-major).
    The honest video format this environment CAN decode natively —
    compressed codecs (H.264 etc.) remain behind the ffmpeg seam."""
    n, h, w, ch = frames.shape
    assert ch == 3
    return (
        RAWVIDEO_MAGIC
        + struct.pack("<III", n, h, w)
        + np.ascontiguousarray(frames, dtype=np.uint8).tobytes()
    )


def decode_rawvideo_header(payload: bytes) -> tuple[int, int, int]:
    """(n_frames, h, w) from the 16-byte header — no frame bytes touched."""
    if payload[:4] != RAWVIDEO_MAGIC:
        raise ValueError("not a RVID payload")
    return struct.unpack("<III", payload[4:16])


def decode_rawvideo_frame(payload: bytes, idx: int) -> np.ndarray:
    """Seek-decode ONE frame: header → offset arithmetic → one slice.
    The access pattern of keyframe sampling — cost is O(frame), not
    O(video), which is what makes frame-sampling a map-side operation
    on multi-GB payloads."""
    n, h, w = decode_rawvideo_header(payload)
    if not 0 <= idx < n:
        raise IndexError(idx)
    fsz = h * w * 3
    off = 16 + idx * fsz
    return (
        np.frombuffer(payload[off : off + fsz], dtype=np.uint8)
        .reshape(h, w, 3)
        .copy()
    )


def decode_rawvideo(payload: bytes) -> np.ndarray:
    """Full decode: (n_frames, h, w, 3) uint8."""
    n, h, w = decode_rawvideo_header(payload)
    return np.stack([decode_rawvideo_frame(payload, i) for i in range(n)])


def attach_video_payloads(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_frames: int = 6,
    h: int = 4,
    w: int = 4,
) -> DataFrame:
    """Deterministic REAL raw-video payloads per doc: frame f's pixel
    byte k (row-major) = md5(text) digest byte ``(7*f + k) mod 16`` —
    the per-frame offset 7 (coprime to 16) makes every frame distinct
    while staying SQL-replayable from the digest."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        fsz = h * w * 3
        for pdf in batches:
            ids, mimes, payloads, sizes = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                digest = hashlib.md5(str(t).encode()).digest()
                tiled = np.frombuffer(digest * (2 * fsz // 16 + 2), dtype=np.uint8)
                frames = np.stack(
                    [tiled[(7 * f) % 16 :][:fsz].reshape(h, w, 3) for f in range(n_frames)]
                )
                p = encode_rawvideo(frames)
                ids.append(int(i))
                mimes.append(2)
                payloads.append(p)
                sizes.append(len(p))
            yield pd.DataFrame(
                {"media_id": ids, "mime": mimes, "payload": payloads, "n_bytes": sizes}
            ).astype({"media_id": "int64", "mime": "int32", "n_bytes": "int64"})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(gen, MEDIA_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("r_mean", DoubleType(), False),
        StructField("g_mean", DoubleType(), False),
        StructField("b_mean", DoubleType(), False),
    ]
)


def frame_sample_rawvideo(df: DataFrame, k: int = 3) -> DataFrame:
    """REAL frame sampling over the RVID container: per payload, read
    the 16-byte header, pick ``k`` evenly spaced frame indices
    (floor(j·(n−1)/(k−1))), seek-decode ONLY those frames, and emit
    per-frame channel means. One row per (media_id, sampled frame);
    unsampled frame bytes are never touched — the map-side cost model
    of keyframe extraction at scale."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, rs, gs, bs = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                p = bytes(p)
                n, _, _ = decode_rawvideo_header(p)
                picks = (
                    [int(j * (n - 1) / (k - 1)) for j in range(k)] if k > 1 else [0]
                )
                for idx in picks:
                    fr = decode_rawvideo_frame(p, idx).astype(np.float64)
                    ids.append(int(mid))
                    idxs.append(idx)
                    rs.append(float(fr[:, :, 0].mean()))
                    gs.append(float(fr[:, :, 1].mean()))
                    bs.append(float(fr[:, :, 2].mean()))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "r_mean": rs, "g_mean": gs, "b_mean": bs}
            ).astype({"media_id": "int64", "frame_idx": "int32"})

    return df.select("media_id", "payload").mapInPandas(run, VIDEO_FRAME_SCHEMA)


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

    ``mode='real'`` decodes BMP (mime 0: width/height/channel means/gray
    stats) and WAV (mime 1: sample-rate/duration/RMS/peak/zero-cross)
    with the struct-level codecs above; video (mime 2) raises
    ``NotImplementedError`` at the ffmpeg integration seam. ``'fake'``
    is the byte-histogram stand-in used by the rows-only driver query."""
    if mode not in ("fake", "real"):
        raise ValueError(mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                feats = []
                for mime, p in zip(pdf["mime"], pdf["payload"]):
                    if p is None:
                        feats.append(None)
                    elif mime == 0:
                        feats.append(_image_features(bytes(p)))
                    elif mime == 1:
                        feats.append(_audio_features(bytes(p)))
                    else:
                        raise NotImplementedError(
                            "compressed-video decode requires ffmpeg — not "
                            "available in this environment; images (BMP), "
                            "audio (WAV), and raw video (RVID — see "
                            "decode_rawvideo/frame_sample_rawvideo) decode "
                            "natively"
                        )
            else:
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
