"""Multimodal column plumbing (brief: first-class operator family).

Images/audio/video travel as opaque `binary` columns with typed metadata
structs. The Spark-side plumbing — schemas, partition-preserving
mapInPandas, Arrow batch shapes, deterministic outputs — is real and
tested; the actual codec work is stubbed (the decode libraries are not in
this container) behind `DecodeUnavailable` plus a deterministic fake
decoder used by tests, clearly marked.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Real image/audio decoding needs codec libraries not present in this
    environment. The fake decoder below keeps the distributed plumbing
    testable; swap `decode_image` for a real implementation on a cluster
    with the codecs installed."""


def decode_image(payload: bytes) -> "np.ndarray":
    raise DecodeUnavailable(
        "install an image codec (pillow/opencv) and replace decode_image"
    )


def fake_decode_feature(payload: bytes, dim: int = 8) -> list:
    """Deterministic stand-in for decode + feature-extract: fold the bytes
    into `dim` float accumulators. Stable across runs/executors."""
    acc = [0.0] * dim
    if payload:
        for i, b in enumerate(payload):
            acc[i % dim] += float(b)
        n = float(len(payload))
        acc = [round(a / n, 6) for a in acc]
    return acc


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow batches
    in, one output row per input row, partitioning preserved (no
    shuffle). The batch shape — pandas DataFrame with a bytes column — is
    exactly what a real decoder (PIL/libav) would consume."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(
                        lambda p: len(p) if p is not None else 0
                    ).astype("int32"),
                    "feature": payloads.map(
                        lambda p: fake_decode_feature(p or b"", dim)
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests: payload bytes are a
    seeded function of the id."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = struct.pack("<I", i * 2654435761 % 2**32) * (4 + i % 13)
        rows.append(
            (
                f"m{i:05d}",
                kind,
                bytearray(payload),
                f"application/x-fake-{kind}",
                (64 + i % 512, 64 + (i * 7) % 512, 1000 + i, 16000),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


IMAGE_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def probe_image_header(payload: bytes) -> tuple:
    """REAL (not stubbed) container-header probing: PNG/GIF/BMP/JPEG
    dimensions parsed straight from the byte layout — no codec library
    involved, so this runs in this container and on any executor. JPEG
    walks the segment list to the first SOF marker. Returns
    (format, width, height) or (None, None, None)."""
    p = bytes(payload or b"")
    if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", p[16:24])
        return ("png", w, h)
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", p[6:10])
        return ("gif", w, h)
    if len(p) >= 26 and p[:2] == b"BM":
        w, h = struct.unpack("<ii", p[18:26])
        return ("bmp", w, abs(h))  # negative height = top-down rows
    if len(p) >= 4 and p[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                break
            marker = p[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", p[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
        return ("jpeg", None, None)
    return (None, None, None)


def image_headers(media: DataFrame) -> DataFrame:
    """Parse (format, width, height) from raw payload headers —
    mapInPandas, partition-preserving, zero codec dependencies."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = pdf["payload"].map(probe_image_header)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": probed.map(lambda t: t[0]),
                    "width": probed.map(lambda t: t[1]),
                    "height": probed.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(run, schema=IMAGE_HEADER_SCHEMA)
