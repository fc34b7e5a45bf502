"""Multimodal column plumbing (brief: first-class operator family).

Images/audio/video travel as opaque `binary` columns with typed metadata
structs. The Spark-side plumbing — schemas, partition-preserving
mapInPandas, Arrow batch shapes, deterministic outputs — is real and
tested. Decoding is REAL for PNG (stdlib zlib inflate + full filter
unfiltering), binary PPM/PGM, and uncompressed BMP — no codec library
needed; only JPEG pixel decode (an entropy codec) stays behind
`DecodeUnavailable`. A deterministic fake feature extractor remains for
payloads with no decodable container.
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
    """Raised for formats whose decoding needs codec libraries not present
    in this environment (JPEG entropy decode). PNG / PPM / PGM / BMP are
    decoded for real below with zero external dependencies."""


class DecodeError(ValueError):
    """Raised when a payload IS a recognized, supported container but
    fails to parse — truncated BMP header, corrupt PNG IDAT, damaged
    JPEG entropy data. Distinct from DecodeUnavailable (format this
    environment cannot decode at all), so callers can separate
    'unsupported' from 'corrupt' without a broad except."""


# --- real, dependency-free image decoders ---------------------------------
#
# PNG (zlib inflate + full filter-type 0-4 unfiltering, bit depth 8,
# gray / RGB / palette / gray+alpha / RGBA, non-interlaced), binary
# PPM/PGM, and uncompressed 24/32-bit BMP. JPEG note:
# its entropy decode is a codec, not a container parse.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytes:
    """Reverse PNG row filters (spec §9): Sub/Up/Average/Paeth. Sequential
    per-byte recurrences, so plain Python — decode cost is per-image and
    the operator parallelizes across images, not pixels."""
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        pos += 1
        row = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        elif ftype != 0:
            raise DecodeUnavailable(f"PNG filter type {ftype}")
        out += row
        prev = row
    return bytes(out)


def _decode_png(p: bytes) -> "np.ndarray":
    import zlib

    pos = 8
    ihdr = None
    plte = b""
    idat = bytearray()
    while pos + 8 <= len(p):
        (length,) = struct.unpack(">I", p[pos : pos + 4])
        ctype = p[pos + 4 : pos + 8]
        data = p[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise DecodeUnavailable(
            f"PNG depth={depth} interlace={interlace}: only 8-bit "
            "non-interlaced supported"
        )
    if color not in _PNG_CHANNELS:
        raise DecodeUnavailable(f"PNG color type {color}")
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    pixels = _png_unfilter(raw, height, stride, ch)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, ch)
    if color == 3:  # palette -> RGB
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        arr = pal[arr[:, :, 0]]
    return arr


def _decode_pnm(p: bytes) -> "np.ndarray":
    """Binary PPM (P6, RGB) / PGM (P5, gray), maxval <= 255."""
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3 and pos < len(p):
        while pos < len(p) and p[pos : pos + 1].isspace():
            pos += 1
        if p[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(p) and p[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(p) and not p[pos : pos + 1].isspace():
            pos += 1
        fields.append(p[start:pos])
    pos += 1  # single whitespace after maxval
    width, height, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise DecodeUnavailable("PNM maxval > 255 (16-bit) unsupported")
    ch = 3 if p[:2] == b"P6" else 1
    n = width * height * ch
    return np.frombuffer(p[pos : pos + n], dtype=np.uint8).reshape(
        height, width, ch
    )


def _decode_bmp(p: bytes) -> "np.ndarray":
    (data_off,) = struct.unpack("<I", p[10:14])
    width, height = struct.unpack("<ii", p[18:26])
    planes, bits = struct.unpack("<HH", p[26:30])
    (compression,) = struct.unpack("<I", p[30:34])
    if compression != 0 or bits not in (24, 32):
        raise DecodeUnavailable(
            f"BMP bits={bits} compression={compression}: only uncompressed "
            "24/32-bit supported"
        )
    ch = bits // 8
    top_down = height < 0
    height = abs(height)
    row_bytes = ((width * ch + 3) // 4) * 4  # rows pad to 4 bytes
    rows = []
    for y in range(height):
        off = data_off + y * row_bytes
        row = np.frombuffer(
            p[off : off + width * ch], dtype=np.uint8
        ).reshape(width, ch)
        rows.append(row)
    arr = np.stack(rows if top_down else rows[::-1])
    # BGR(A) -> RGB(A)
    if ch == 3:
        return arr[:, :, ::-1]
    return arr[:, :, [2, 1, 0, 3]]


def detect_image_format(payload: bytes) -> str | None:
    """Container sniff by magic bytes: PNG / PNM / BMP / JPEG, else None."""
    p = bytes(payload or b"")
    if p[:8] == _PNG_MAGIC:
        return "PNG"
    if p[:2] in (b"P6", b"P5"):
        return "PNM"
    if p[:2] == b"BM":
        return "BMP"
    if p[:2] == b"\xff\xd8":
        return "JPEG"
    return None


def _builtin_decoder(fmt: str):
    if fmt == "JPEG":
        from hamerkop_spark.operators.jpeg import decode_jpeg

        return decode_jpeg
    return {"PNG": _decode_png, "PNM": _decode_pnm, "BMP": _decode_bmp}[fmt]


# --- pluggable codec registry ----------------------------------------------
#
# The built-in pure-Python decoders are correct and dependency-free but
# JPEG entropy decode plateaus at ~1 MB/s/core (operators/jpeg.py) — at
# crawl scale a native codec is 30-100x faster. The registry lets a
# deployment plug one in without touching any operator: entries are
# tried highest-priority-first for their declared formats, any failure
# falls through to the next entry and finally to the built-in decoder,
# which stays the correctness oracle (tests assert pixel parity between
# paths). `probe_native_codecs()` auto-registers Pillow / OpenCV /
# simplejpeg when importable; none ship in this sandbox, so the default
# chain here is [builtin] and tests exercise the registry with
# injected codecs both ways (used, and failing->fallback).
# Reference analog: hamerkop delegates ITS heaviest kernel the same way
# (uroman shells out to Perl, string.py:135-155).

_CODEC_REGISTRY: list[dict] = []
_NATIVE_PROBED = False


def register_codec(
    name: str,
    decode_fn,
    formats: tuple = ("JPEG",),
    priority: int = 50,
) -> None:
    """Register a native decode path. `decode_fn(payload: bytes) ->
    np.ndarray (H, W, C) uint8` for any of `formats`; raise to decline a
    payload (the chain falls through). Re-registering a name replaces
    the old entry."""
    unregister_codec(name)
    _CODEC_REGISTRY.append(
        {
            "name": name,
            "fn": decode_fn,
            "formats": tuple(f.upper() for f in formats),
            "priority": int(priority),
        }
    )
    _CODEC_REGISTRY.sort(key=lambda c: -c["priority"])


def unregister_codec(name: str) -> None:
    _CODEC_REGISTRY[:] = [c for c in _CODEC_REGISTRY if c["name"] != name]


def registered_codecs() -> list[str]:
    return [c["name"] for c in _CODEC_REGISTRY]


def probe_native_codecs() -> list[str]:
    """Idempotently auto-register whichever native codecs import in this
    environment (best first). Returns the names registered by the probe."""
    global _NATIVE_PROBED
    if _NATIVE_PROBED:
        return [c["name"] for c in _CODEC_REGISTRY
                if c["name"] in ("pillow", "opencv", "simplejpeg")]
    _NATIVE_PROBED = True
    found = []
    try:
        import simplejpeg  # type: ignore

        register_codec(
            "simplejpeg",
            lambda p: simplejpeg.decode_jpeg(p, colorspace="RGB"),
            formats=("JPEG",),
            priority=90,
        )
        found.append("simplejpeg")
    except ImportError:
        pass
    try:
        from PIL import Image  # type: ignore

        def _pillow(p: bytes) -> "np.ndarray":
            import io

            img = Image.open(io.BytesIO(p))
            if img.mode not in ("L", "LA", "RGB", "RGBA"):
                img = img.convert("RGB")
            return np.asarray(img)

        register_codec(
            "pillow", _pillow,
            formats=("JPEG", "PNG", "BMP", "PNM"), priority=80,
        )
        found.append("pillow")
    except ImportError:
        pass
    try:
        import cv2  # type: ignore

        def _opencv(p: bytes) -> "np.ndarray":
            arr = cv2.imdecode(
                np.frombuffer(p, dtype=np.uint8), cv2.IMREAD_UNCHANGED
            )
            if arr is None:
                raise DecodeError("cv2.imdecode returned None")
            if arr.ndim == 3 and arr.shape[2] >= 3:
                arr = arr[:, :, [2, 1, 0] + list(range(3, arr.shape[2]))]
            return arr

        register_codec(
            "opencv", _opencv,
            formats=("JPEG", "PNG", "BMP"), priority=70,
        )
        found.append("opencv")
    except ImportError:
        pass
    return found


def _normalize_pixels(arr: "np.ndarray") -> "np.ndarray":
    """Native codecs return (H, W) for grayscale and assorted dtypes;
    the engine contract is (H, W, C) uint8."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        arr = arr.astype(np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def decode_image(payload: bytes, codec: str | None = None) -> "np.ndarray":
    """Decode a PNG / binary PPM / PGM / uncompressed BMP / baseline-or-
    progressive JPEG payload to an (H, W, C) uint8 array.

    Codec resolution order: explicit `codec` arg ("builtin" forces the
    pure-Python path; a registered name forces that entry) -> the
    $HK_IMAGE_CODEC env var, same values -> every registered native
    codec claiming the sniffed format, highest priority first, each
    failure falling through -> the built-in dependency-free decoder
    (operators/jpeg.py for JPEG — sequential 8/12-bit, progressive,
    and lossless decode; arithmetic-coded streams surface as
    DecodeUnavailable). >8-bit JPEG frames decode to uint16; all
    other paths return uint8."""
    p = bytes(payload or b"")
    fmt = detect_image_format(p)
    if fmt is None:
        raise DecodeUnavailable("unrecognized image container")

    import os

    choice = codec or os.environ.get("HK_IMAGE_CODEC") or None
    if choice and choice != "builtin":
        entries = [c for c in _CODEC_REGISTRY if c["name"] == choice]
        if not entries:
            raise DecodeUnavailable(f"codec {choice!r} is not registered")
        try:
            return _normalize_pixels(entries[0]["fn"](p))
        except Exception as e:
            raise DecodeError(
                f"codec {choice!r} failed on {fmt} payload: {e}"
            ) from e
    if choice != "builtin":
        probe_native_codecs()
        for entry in _CODEC_REGISTRY:
            if fmt not in entry["formats"]:
                continue
            try:
                return _normalize_pixels(entry["fn"](p))
            except Exception:  # noqa: BLE001 — fall through to next codec
                continue
    try:
        return _builtin_decoder(fmt)(p)
    except NotImplementedError as e:  # includes DecodeUnavailable
        raise DecodeUnavailable(str(e)) from e
    except Exception as e:
        # recognized container, corrupt payload: truncated BMP header
        # (struct.error), bad IDAT (zlib.error), truncated JPEG entropy
        # data (IndexError) — surface as ONE typed error
        raise DecodeError(f"corrupt {fmt} payload: {e}") from e


def encode_png(arr: "np.ndarray", filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (gray / gray+alpha / RGB / RGBA, 8-bit) used by
    tests and synthetic corpora; can apply any spec filter uniformly so
    decode tests exercise every unfilter branch."""
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch
    raw = bytearray()
    prev = np.zeros((w * ch,), dtype=np.int32)
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int32)
        if filter_type == 0:
            filtered = row
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            filtered = row - left
        elif filter_type == 2:
            filtered = row - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            filtered = row - ((left + prev) >> 1)
        elif filter_type == 4:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            pth = left + prev - upleft
            pa, pb, pc = (
                np.abs(pth - left), np.abs(pth - prev), np.abs(pth - upleft)
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filtered = row - pred
        else:
            raise ValueError(f"filter {filter_type}")
        raw.append(filter_type)
        raw += (filtered & 0xFF).astype(np.uint8).tobytes()
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        import zlib as _z

        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
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


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("px_mean", T.DoubleType(), True),
        T.StructField("px_checksum", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """REAL decode over a binary column: per image, pixel-true
    (width, height, channels, mean, checksum) from the full decoded
    array — not just the container header. Partition-preserving
    mapInPandas; a payload that can't be decoded yields a row with
    `decode_error` set instead of failing the stage (one bad image must
    not kill a 100 TB scan)."""

    def one(mid, payload):
        try:
            arr = decode_image(payload)
        # broad by design: junk bytes inside a recognized container can
        # surface as zlib.error, struct.error, KeyError, RuntimeError...
        # — ANY decode failure must become a decode_error row, never a
        # stage failure
        except Exception as e:  # noqa: BLE001
            return (mid, None, None, None, None, None,
                    f"{type(e).__name__}: {e}"[:200])
        h, w, ch = arr.shape
        return (
            mid, int(w), int(h), int(ch),
            round(float(arr.mean()), 6),
            int(np.int64(arr.sum())),
            None,
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                one(m, p)
                for m, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "channels",
                    "px_mean", "px_checksum", "decode_error",
                ],
            )

    return media.mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


def make_synthetic_pngs(spark, n: int = 32) -> DataFrame:
    """Deterministic seeded PNG corpus: gradient/checker patterns across
    gray / gray+alpha / RGB / RGBA, every filter type 0-4 — real encoded
    bytes in a binary column, so decode tests assert exact pixel
    checksums."""
    rows = []
    for i in range(n):
        ch = [1, 2, 3, 4][i % 4]
        h, w = 8 + (i % 5) * 3, 6 + (i * 3) % 7
        yy, xx = np.mgrid[0:h, 0:w]
        base = (yy * 31 + xx * 17 + i * 101) % 256
        arr = np.stack(
            [(base + c * 29) % 256 for c in range(ch)], axis=2
        ).astype(np.uint8)
        payload = encode_png(arr, filter_type=i % 5)
        rows.append(
            (
                f"png{i:04d}",
                "image",
                bytearray(payload),
                "image/png",
                (w, h, None, None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
