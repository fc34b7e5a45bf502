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
