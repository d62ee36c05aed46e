"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition sizing,
deterministic features) is real and tested. Decode is REAL for the two
most common container formats — PNG dimensions (IHDR struct read) and
WAV duration (RIFF chunk walk) — with no external libraries; formats
that genuinely need a codec stack (JPEG entropy decode, MP4) raise
NotImplementedError in strict mode or produce a deterministic fake
derived from the bytes, so pipelines still exercise the full
distributed path.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("content", T.BinaryType()),    # opaque encoded bytes
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "width int, height int, duration_ms int, feature array<float>"
)


# ---------------------------------------------------------------------------
# dependency-free PNG / WAV codecs (encode for fixtures, decode for real)
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal REAL grayscale-8 PNG (signature + IHDR + zlib IDAT + IEND,
    correct CRCs — loadable by any PNG reader). Deterministic pixel ramp
    from ``seed``; used to build media fixtures without PIL."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(((x * 31 + y * 17 + seed) % 256) for x in range(width))
        for y in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_size(content: bytes) -> tuple[int, int] | None:
    """PNG (width, height) from the IHDR struct — a pure byte read; None
    if the bytes are not a PNG."""
    if len(content) >= 24 and content[:8] == PNG_SIG and content[12:16] == b"IHDR":
        w, h = struct.unpack(">II", content[16:24])
        return w, h
    return None


def encode_wav(
    n_samples: int, sample_rate: int = 8000, seed: int = 0
) -> bytes:
    """Minimal REAL PCM16 mono WAV (RIFF/fmt/data) with a deterministic
    waveform; used to build media fixtures without soundfile."""
    data = b"".join(
        struct.pack("<h", ((i * i + seed * 97) % 20000) - 10000)
        for i in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_duration_ms(content: bytes) -> int | None:
    """WAV duration from the RIFF chunk walk (fmt byte_rate + data size) —
    pure struct reads; None if the bytes are not a RIFF/WAVE container."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    pos, byte_rate, data_size = 12, None, None
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        if tag == b"fmt " and pos + 20 <= len(content):
            byte_rate = struct.unpack("<I", content[pos + 16 : pos + 20])[0]
        elif tag == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if byte_rate and data_size is not None:
        return int(data_size * 1000 // byte_rate)
    return None


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table, generated distributively: image rows are
    REAL tiny PNGs and audio rows REAL tiny WAVs (8 seeded variants each,
    embedded as binary literals from the stdlib encoders above); video
    rows stay opaque hash-seeded bytes (MP4 needs a codec stack)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    mimes = F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"))
    idx = (F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(3)) + 1).cast("int")
    variant = (
        F.pmod(F.xxhash64(F.lit(seed + 1), F.col("id")), F.lit(8)) + 1
    ).cast("int")
    pngs = F.array(
        *[F.lit(encode_png(16 + 3 * i, 20 + 5 * i, seed=i)) for i in range(8)]
    )
    wavs = F.array(*[F.lit(encode_wav(800 + 160 * i, seed=i)) for i in range(8)])
    kind = F.element_at(kinds, idx)
    fake = F.sha2(
        F.concat(F.lit(str(seed)), F.col("id").cast("string")), 512
    ).cast("binary")
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.when(kind == "image", F.element_at(pngs, variant))
        .when(kind == "audio", F.element_at(wavs, variant))
        .otherwise(fake)
        .alias("content"),
        F.element_at(mimes, idx).alias("mime"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def _decode_image(content: bytes, strict: bool) -> tuple[int, int]:
    """REAL for PNG (IHDR struct read); other raster formats need an
    entropy decoder (PIL/libvips, absent in container) → strict raises,
    non-strict yields a deterministic fake."""
    size = decode_png_size(content)
    if size is not None:
        return size
    if strict:
        raise NotImplementedError("non-PNG image decode requires PIL/libvips")
    h = hashlib.sha256(content).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64  # deterministic fake (w, h)


def _decode_duration(content: bytes, strict: bool) -> int:
    """REAL for WAV (RIFF chunk walk); compressed a/v (MP4 etc.) needs
    ffmpeg/soundfile → strict raises, non-strict yields a deterministic
    fake."""
    dur = decode_wav_duration_ms(content)
    if dur is not None:
        return dur
    if strict:
        raise NotImplementedError("non-WAV a/v decode requires ffmpeg/soundfile")
    h = hashlib.sha256(content).digest()
    return 100 + int.from_bytes(h[2:4], "big") % 10_000


def extract_features(
    media: DataFrame, feature_dim: int = 8, strict: bool = False
) -> DataFrame:
    """Decode/feature-extract via mapInPandas: one Arrow batch in, one out.

    The 'feature' is a deterministic pseudo-embedding of the content bytes
    (stands in for a CNN/audio embedding). Batch shape, schema, and
    partition behavior match what a real extractor needs — swap the two
    _decode stubs for codec calls on a real cluster.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int32"),
                "sha256": pdf["content"].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
            }
            w, h, dur, feats = [], [], [], []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                if kind == "image":
                    iw, ih = _decode_image(content, strict)
                    w.append(iw); h.append(ih); dur.append(None)
                else:
                    w.append(None); h.append(None)
                    dur.append(_decode_duration(content, strict))
                digest = hashlib.sha256(b"feat" + content).digest()
                feats.append(
                    np.frombuffer(digest[: feature_dim * 4], dtype=">u4")
                    .astype(np.float32)
                    / np.float32(2**32)
                )
            out["width"] = pd.array(w, dtype="Int32")
            out["height"] = pd.array(h, dtype="Int32")
            out["duration_ms"] = pd.array(dur, dtype="Int32")
            out["feature"] = feats
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame timestamp
    (explode of a sequence) — the decode itself is the stub above."""
    feats = extract_features(media.filter(F.col("kind") == "video"), strict=strict)
    return feats.select(
        "media_id",
        "duration_ms",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
