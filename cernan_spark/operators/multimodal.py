"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition sizing,
deterministic fake features) is real and tested; the actual codec calls
are STUBBED — image/audio libraries are not in this container. Each stub
either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the bytes (test mode), so pipelines and
tests exercise the full distributed path.
"""

from __future__ import annotations

import hashlib
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


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: bytes derived from xxhash of the id
    (generated distributively — content is a hash-seeded byte string)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    mimes = F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"))
    idx = (F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(3)) + 1).cast("int")
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, idx).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 512)
        .cast("binary")
        .alias("content"),
        F.element_at(mimes, idx).alias("mime"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def _decode_image(content: bytes, strict: bool) -> tuple[int, int]:
    """STUB: real impl would use PIL/libvips (not in this container)."""
    if strict:
        raise NotImplementedError("image decode requires PIL/libvips")
    h = hashlib.sha256(content).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64  # deterministic fake (w, h)


def _decode_duration(content: bytes, strict: bool) -> int:
    """STUB: real impl would use ffprobe/soundfile."""
    if strict:
        raise NotImplementedError("a/v decode requires ffmpeg/soundfile")
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
