"""Multimodal column plumbing (SURVEY.md §2.E5).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct beside them. The Spark-side machinery — schema,
partition-friendly layout, Arrow-batched UDF signatures, batch shapes —
is real and tested; the actual media decode is STUBBED (the container
has no image/audio libraries): ``decode_stub=True`` produces a
deterministic fake feature vector, ``decode_stub=False`` raises
NotImplementedError where a real decoder (PIL/torchaudio/ffmpeg) would
plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

#: canonical multimodal record: opaque payload + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("meta", StructType([
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ])),
])

FEATURE_DIM = 16
FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("byte_len", LongType()),
    StructField("sha", StringType()),
    StructField("features", ArrayType(FloatType())),
])


def attach_binary_payload(df: DataFrame, src_col: str, id_col: str,
                          mime: str = "application/octet-stream") -> DataFrame:
    """Wrap an existing column's bytes as a multimodal record (used by
    tests and the oracle query to synthesize payloads from text)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(src_col), "utf-8").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> np.ndarray:
    # deterministic stand-in for a real encoder: bytes -> unit vector
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[:FEATURE_DIM * 2], dtype=np.uint16)
    v = raw.astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(df: DataFrame, decode_stub: bool = True,
                     batch_size_hint: int = 256) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    The partition-parallel shape is the real thing: payloads never hit
    the driver, batches stream through Arrow, output rows align 1:1
    with input media. Only the innermost decode is stubbed.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode needs PIL/torchaudio/ffmpeg; "
                    "not available in this environment")
            feats = [_fake_features(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "byte_len": [len(p) for p in pdf["payload"]],
                "sha": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                "features": feats,
            })

    return df.mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def resize_images(df: DataFrame, width: int = 224, height: int = 224,
                  decode_stub: bool = True) -> DataFrame:
    """Resize pass over image payloads (mapInPandas, 1:1 rows).

    Real plumbing, stubbed kernel: without PIL the "resized" payload is
    a deterministic truncation/pad of the original bytes to
    width*height — schema, batching, and partition behavior are
    exactly what a real PIL/opencv kernel would see.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize needs PIL/opencv; not in this env")
            out = [bytes(p[:target]).ljust(target, b"\0")
                   for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "payload": out,
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
            })

    return df.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024,
                  max_frames: int = 8,
                  decode_stub: bool = True) -> DataFrame:
    """Frame sampling over video payloads (mapInPandas, 1:N explode).

    Stub kernel: "frames" are fixed-stride byte slices standing in for
    ffmpeg keyframe extraction; output cardinality (N frames per
    input) and the (media_id, frame_idx) key shape are the real
    contract downstream featurizers depend on.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling needs ffmpeg; not in this env")
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for i in range(min(max_frames,
                                   max(1, len(p) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(
                        p[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame({
                "media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, FRAME_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """JVM-only metadata pass (no UDF): byte length + md5 per payload.

    This is the oracle-checkable slice of the multimodal path — binary
    column handling without Python in the loop.
    """
    return df.select(
        "media_id",
        F.length(F.col("payload")).cast("long").alias("byte_len"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.col("meta.mime").alias("mime"),
    )
