"""Multimodal column plumbing (brief: first-class operator family).

Images/audio/video travel as opaque `binary` columns with typed metadata
structs. The Spark-side plumbing — schemas, partition-preserving
mapInPandas, Arrow batch shapes, deterministic outputs — is real and
tested. Decoding is REAL, dependency-free, for PNG (all bit depths,
Adam7), GIF (LZW, first frame), binary PPM/PGM, uncompressed BMP, and
JPEG (operators/jpeg.py: sequential 8/12-bit, progressive, lossless).
WEBP and TIFF are sniffed and header-probed (dimensions) but pixel
decode is registry-only; arithmetic-coded JPEG likewise surfaces as
`DecodeUnavailable` unless a registered native codec claims it. A
deterministic fake feature extractor remains for payloads with no
decodable container.
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
    """Raised for formats/profiles whose pixel decode needs a codec not
    built in here (WEBP, TIFF, arithmetic-coded JPEG) — register a
    native codec to claim them. PNG / GIF / PPM / PGM / BMP / JPEG
    (sequential, progressive, lossless) decode for real below with
    zero external dependencies."""


class DecodeError(ValueError):
    """Raised when a payload IS a recognized, supported container but
    fails to parse — truncated BMP header, corrupt PNG IDAT, damaged
    JPEG entropy data. Distinct from DecodeUnavailable (format this
    environment cannot decode at all), so callers can separate
    'unsupported' from 'corrupt' without a broad except."""


# --- real, dependency-free image decoders ---------------------------------
#
# PNG (zlib inflate + full filter-type 0-4 unfiltering, bit depths
# 1/2/4/8/16, gray / RGB / palette(+tRNS alpha) / gray+alpha / RGBA,
# Adam7 interlace), GIF (LZW, 87a/89a, interlace, transparency, first
# frame of animations), binary PPM/PGM, and uncompressed 24/32-bit
# BMP. JPEG note: its entropy decode is a codec, not a container
# parse (operators/jpeg.py).

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytes:
    """Reverse PNG row filters (spec §9). None/Sub/Up are vectorized
    (Up is elementwise over the previous row; Sub is a modular cumsum
    over each byte-residue class mod bpp); Average and Paeth are true
    per-byte recurrences on BOTH neighbors, so those rows stay plain
    Python — decode cost is per-image and the operator parallelizes
    across images, not pixels."""
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        pos += 1
        row = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub: cumsum mod 256 within each residue class
            a = np.frombuffer(bytes(row), np.uint8).astype(np.uint32)
            n = (stride + bpp - 1) // bpp
            padded = np.zeros(n * bpp, np.uint32)
            padded[:stride] = a
            csum = padded.reshape(n, bpp).cumsum(axis=0) & 0xFF
            row = bytearray(
                csum.reshape(-1)[:stride].astype(np.uint8).tobytes()
            )
        elif ftype == 2:  # Up: elementwise add of the previous row
            row = bytearray(
                (
                    (np.frombuffer(bytes(row), np.uint8).astype(np.uint16)
                     + np.frombuffer(bytes(prev), np.uint8)) & 0xFF
                ).astype(np.uint8).tobytes()
            )
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


# Adam7 interlace passes (spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unpack_subimage(raw: bytes, width: int, height: int,
                         ch: int, depth: int) -> "np.ndarray":
    """Unfilter + bit-unpack one (sub)image's scanlines: returns an
    (height, width*ch) sample array, uint8 for depth <= 8 (low depths
    hold raw 0..2^d-1 sample values), uint16 for 16."""
    bits_pp = ch * depth
    stride = (width * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)  # filter distance in BYTES (spec §9.2)
    pixels = _png_unfilter(raw, height, stride, bpp)
    if depth == 8:
        return np.frombuffer(pixels, np.uint8).reshape(height, stride)[
            :, : width * ch
        ]
    if depth == 16:
        return (
            np.frombuffer(pixels, ">u2")
            .reshape(height, stride // 2)[:, : width * ch]
            .astype(np.uint16)
        )
    # depth 1/2/4: MSB-first packed samples
    b = np.frombuffer(pixels, np.uint8).reshape(height, stride)
    bits = np.unpackbits(b, axis=1).reshape(height, stride * 8 // depth,
                                            depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = (bits * weights).sum(axis=2).astype(np.uint8)
    return vals[:, : width * ch]


def _decode_png(p: bytes) -> "np.ndarray":
    import zlib

    pos = 8
    ihdr = None
    plte = b""
    trns = None
    idat = bytearray()
    while pos + 8 <= len(p):
        (length,) = struct.unpack(">I", p[pos : pos + 4])
        ctype = p[pos + 4 : pos + 8]
        data = p[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise DecodeUnavailable(
            f"PNG compression={comp} filter={filt} interlace={interlace}"
        )
    if color not in _PNG_CHANNELS:
        raise DecodeUnavailable(f"PNG color type {color}")
    # spec §11.2.2 valid (color, depth) combinations
    valid = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
             4: (8, 16), 6: (8, 16)}
    if depth not in valid[color]:
        raise DecodeUnavailable(f"PNG color {color} depth {depth}")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    dtype = np.uint16 if depth == 16 else np.uint8
    if interlace:  # Adam7: seven independently-filtered sub-images
        img = np.zeros((height, width, ch), dtype)
        off = 0
        for xs, ys, xp, yp in _ADAM7:
            pw = (width - xs + xp - 1) // xp
            ph = (height - ys + yp - 1) // yp
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * ch * depth + 7) // 8
            n = ph * (1 + stride)
            rows = _png_unpack_subimage(raw[off : off + n], pw, ph, ch,
                                        depth)
            off += n
            img[ys::yp, xs::xp, :] = rows.reshape(ph, pw, ch)
        arr = img
    else:
        arr = _png_unpack_subimage(raw, width, height, ch, depth).reshape(
            height, width, ch
        )
    if color == 3:  # palette (+ optional tRNS alpha) -> RGB(A)
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = arr[:, :, 0]
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(pal.shape[0], 255, np.uint8)
            a = np.frombuffer(trns, np.uint8)
            alpha[: len(a)] = a
            return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        return rgb
    if color == 0 and depth < 8:
        # scale low-depth gray to the full 8-bit range (255/(2^d-1) is
        # exact for d in {1,2,4}: 255, 85, 17)
        return (arr * (255 // ((1 << depth) - 1))).astype(np.uint8)
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


# --- GIF (87a/89a, public spec): LZW decode, global/local color
# tables, 4-pass interlace, GCE transparency; animations decode to
# their FIRST frame composed onto the logical screen. ---------------------

_GIF_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]  # (row start, step)


def _gif_lzw_decode(min_code: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW (spec appendix F): LSB-first packed codes,
    variable width min_code+1 .. 12, CLEAR resets the table, EOI ends
    the stream. Returns exactly n_pixels index bytes (extra output
    from a sloppy encoder is truncated, spec-tolerant)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    # table as list of bytes; indices < clear are single literals
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out[:n_pixels])
            # table growth stops at 4096 (deferred-clear encoders keep
            # emitting 12-bit codes with a FULL table; adding phantom
            # entries would shift every later code)
            grow = len(table) < 4096
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if grow:
                    table.append(prev + entry[:1])
            elif code == len(table) and grow:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF: LZW code out of range")
            out += entry
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return bytes(out[:n_pixels])


def _decode_gif(p: bytes) -> "np.ndarray":
    """First frame of a GIF to (H, W, 3) uint8 — or (H, W, 4) when the
    frame's graphic control extension marks a transparent index —
    composed onto the logical screen (background-filled where the
    frame doesn't cover it)."""
    if p[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", p[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(p[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(p):
        block = p[pos]
        if block == 0x21:  # extension
            label = p[pos + 1]
            pos += 2
            subs = bytearray()
            while p[pos]:
                ln = p[pos]
                subs += p[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1  # terminator
            if label == 0xF9 and len(subs) >= 4 and subs[0] & 0x01:
                transparent = subs[3]
        elif block == 0x2C:  # image descriptor: decode this frame
            left, top, fw, fh, ipacked = struct.unpack(
                "<HHHHB", p[pos + 1 : pos + 10]
            )
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(
                    p[pos : pos + 3 * n], np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF: no color table")
            min_code = p[pos]
            pos += 1
            lzw = bytearray()
            while p[pos]:
                ln = p[pos]
                lzw += p[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = np.frombuffer(
                _gif_lzw_decode(min_code, bytes(lzw), fw * fh), np.uint8
            )
            if idx.size < fw * fh:
                raise ValueError("GIF: truncated image data")
            idx = idx.reshape(fh, fw)
            if ipacked & 0x40:  # 4-pass interlaced row order
                de = np.empty_like(idx)
                src = 0
                for start, step in _GIF_INTERLACE:
                    rows = range(start, fh, step)
                    de[list(rows)] = idx[src : src + len(rows)]
                    src += len(rows)
                idx = de
            idx = np.minimum(idx, len(ct) - 1)  # clamp corrupt indices
            alpha = transparent is not None
            ch = 4 if alpha else 3
            canvas = np.zeros((sh, sw, ch), np.uint8)
            if gct is not None and not alpha:
                canvas[:, :, :3] = gct[min(bg, len(gct) - 1)]
            frame = ct[idx]
            if alpha:
                a = np.where(idx == transparent, 0, 255).astype(np.uint8)
                frame = np.concatenate([frame, a[:, :, None]], axis=2)
            h2, w2 = min(fh, sh - top), min(fw, sw - left)
            if h2 > 0 and w2 > 0:
                canvas[top : top + h2, left : left + w2] = frame[:h2, :w2]
            return canvas
        elif block == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    raise ValueError("GIF: no image data")


def encode_gif(
    arr: "np.ndarray",
    palette: "np.ndarray | None" = None,
    interlace: bool = False,
    transparent: int | None = None,
    deferred_clear: bool = False,
) -> bytes:
    """GIF89a encoder for tests and synthetic corpora: `arr` is either
    (H, W) palette indices with `palette` ((N,3) uint8, N <= 256) or an
    (H, W, 3) uint8 image that is losslessly palettized (must use <=
    256 distinct colors). Real LZW compression (variable code width,
    CLEAR emission on table overflow) so the decoder's table growth
    and reset paths are honestly exercised."""
    if arr.ndim == 3:
        h, w, _ = arr.shape
        flat = arr.reshape(-1, 3)
        colors, idx = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("encode_gif: more than 256 distinct colors")
        palette = colors
        indices = idx.reshape(h, w).astype(np.uint8)
    else:
        if palette is None:
            raise ValueError("encode_gif: palette required for indices")
        indices = arr.astype(np.uint8)
        h, w = indices.shape
    pal = np.asarray(palette, np.uint8)
    # color table size: power of two >= max(2, len(pal)), min_code >= 2
    bits = max(2, int(np.ceil(np.log2(max(len(pal), 2)))) or 1)
    size = 1 << bits
    table_bytes = np.zeros((size, 3), np.uint8)
    table_bytes[: len(pal)] = pal
    min_code = bits

    seq = indices
    if interlace:
        rows = []
        for start, step in _GIF_INTERLACE:
            rows.append(indices[start::step])
        seq = np.concatenate(rows, axis=0)
    pixels = seq.reshape(-1).tolist()

    # LZW encode (spec appendix F)
    clear = 1 << min_code
    eoi = clear + 1
    out_codes: list[tuple[int, int]] = []
    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out_codes.append((clear, width))
    run = b""
    for px in pixels:
        cand = run + bytes([px])
        if cand in table:
            run = cand
            continue
        out_codes.append((table[run], width))
        if next_code <= 4095:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
            if next_code > 4095 and not deferred_clear:
                # standard: reset when the table fills; deferred_clear
                # keeps emitting 12-bit codes from the full table (a
                # real-world encoder behavior the decoder must handle
                # without growing phantom entries)
                out_codes.append((clear, width))
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = min_code + 1
        run = bytes([px])
    if run:
        out_codes.append((table[run], width))
    out_codes.append((eoi, width))
    acc = 0
    nbits = 0
    lzw = bytearray()
    for code, wdt in out_codes:
        acc |= code << nbits
        nbits += wdt
        while nbits >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        lzw.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table_bytes.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        sub = lzw[i : i + 255]
        out += bytes([len(sub)]) + sub
    out += b"\x00\x3b"
    return bytes(out)


def detect_image_format(payload: bytes) -> str | None:
    """Container sniff by magic bytes: PNG / PNM / BMP / JPEG / GIF,
    else None."""
    p = bytes(payload or b"")
    if p[:8] == _PNG_MAGIC:
        return "PNG"
    if p[:2] in (b"P6", b"P5"):
        return "PNM"
    if p[:2] == b"BM":
        return "BMP"
    if p[:2] == b"\xff\xd8":
        return "JPEG"
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return "GIF"
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        return "WEBP"
    if p[:4] in (b"II*\x00", b"MM\x00*"):
        return "TIFF"
    return None


def _decode_unavailable(fmt: str):
    def no_builtin(_p: bytes) -> "np.ndarray":
        raise DecodeUnavailable(
            f"{fmt} pixel decode has no built-in codec — register a "
            "native codec (multimodal.register_codec) for this format"
        )

    return no_builtin


def _builtin_decoder(fmt: str):
    if fmt == "JPEG":
        from hamerkop_spark.operators.jpeg import decode_jpeg

        return decode_jpeg
    # WEBP/TIFF: sniffed + header-probed (typed metadata path), but
    # pixel decode is registry-only — a VP8/VP8L or TIFF codec is out
    # of scope for the built-ins; the typed error keeps them decode_
    # error ROWS, never stage failures
    return {"PNG": _decode_png, "PNM": _decode_pnm, "BMP": _decode_bmp,
            "GIF": _decode_gif, "WEBP": _decode_unavailable("WEBP"),
            "TIFF": _decode_unavailable("TIFF")}[fmt]


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
            formats=("JPEG", "PNG", "BMP", "PNM", "GIF", "WEBP", "TIFF"),
            priority=80,
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
            formats=("JPEG", "PNG", "BMP", "TIFF", "WEBP"), priority=70,
        )
        found.append("opencv")
    except ImportError:
        pass
    return found


def _normalize_pixels(arr: "np.ndarray") -> "np.ndarray":
    """Native codecs return (H, W) for grayscale and assorted dtypes;
    the engine contract is (H, W, C) uint8 — or uint16 for >8-bit
    sources, matching the built-in decoders (a blanket uint8 cast here
    used to WRAP 16-bit samples mod 256, silently corrupting pixels
    and breaking native-vs-builtin parity on 16-bit PNG / 12-bit
    JPEG). Other dtypes (floats, odd ints) clip into uint8 as
    before."""
    arr = np.asarray(arr)
    if arr.dtype not in (np.uint8, np.uint16):
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def decode_image(payload: bytes, codec: str | None = None) -> "np.ndarray":
    """Decode a PNG (all depths, Adam7) / GIF (first frame) / binary
    PPM / PGM / uncompressed BMP / JPEG (sequential 8/12-bit,
    progressive, lossless) payload to an (H, W, C) array — uint8,
    except uint16 for 16-bit PNG and >8-bit JPEG frames.

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


def encode_png(
    arr: "np.ndarray",
    filter_type: int = 0,
    depth: int | None = None,
    interlace: int = 0,
    palette: "np.ndarray | None" = None,
    trns: bytes | None = None,
) -> bytes:
    """PNG encoder used by tests and synthetic corpora; applies any
    spec filter uniformly so decode tests exercise every unfilter
    branch. Supports bit depths 1/2/4 (gray or palette indices),
    8 (all color types), 16 (uint16 input), Adam7 interlace, indexed
    color via `palette` ((N,3) uint8, `arr` holds indices), and a
    palette-alpha tRNS chunk. Filtering is byte-level with the spec's
    bpp distance, matching the decoder for every depth."""
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if palette is not None:
        if ch != 1:
            raise ValueError("palette PNG: arr must be indices (H, W)")
        color = 3
        depth = depth or 8
    else:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        depth = depth or (16 if arr.dtype == np.uint16 else 8)
    bpp = max(1, ch * depth // 8)

    def pack_rows(block: "np.ndarray") -> list:
        ph, pw = block.shape[:2]
        flat = block.reshape(ph, pw * ch)
        if depth == 8:
            return [flat[y].astype(np.uint8).tobytes() for y in range(ph)]
        if depth == 16:
            return [flat[y].astype(">u2").tobytes() for y in range(ph)]
        out = []
        shifts = np.arange(depth - 1, -1, -1)
        for y in range(ph):
            bits = (
                (flat[y][:, None] >> shifts) & 1
            ).astype(np.uint8).reshape(-1)
            out.append(np.packbits(bits).tobytes())
        return out

    def shifted(row: "np.ndarray") -> "np.ndarray":
        return np.concatenate(
            [np.zeros(bpp, np.int32), row]
        )[: len(row)]

    def filter_block(rows: list, raw: bytearray) -> None:
        prev = np.zeros(len(rows[0]) if rows else 0, np.int32)
        for rb in rows:
            row = np.frombuffer(rb, np.uint8).astype(np.int32)
            left = shifted(row)
            if filter_type == 0:
                filtered = row
            elif filter_type == 1:
                filtered = row - left
            elif filter_type == 2:
                filtered = row - prev
            elif filter_type == 3:
                filtered = row - ((left + prev) >> 1)
            elif filter_type == 4:
                upleft = shifted(prev)
                pth = left + prev - upleft
                pa, pb, pc = (
                    np.abs(pth - left), np.abs(pth - prev),
                    np.abs(pth - upleft),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, prev, upleft),
                )
                filtered = row - pred
            else:
                raise ValueError(f"filter {filter_type}")
            raw.append(filter_type)
            raw += (filtered & 0xFF).astype(np.uint8).tobytes()
            prev = row

    raw = bytearray()
    if interlace:
        for xs, ys, xp, yp in _ADAM7:
            block = arr[ys::yp, xs::xp]
            if block.shape[0] and block.shape[1]:
                filter_block(pack_rows(block), raw)
    else:
        filter_block(pack_rows(arr), raw)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        import zlib as _z

        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if interlace else 0)
    out = _PNG_MAGIC + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
        if trns is not None:
            out += chunk(b"tRNS", trns)
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(
        b"IEND", b""
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
    if len(p) >= 30 and p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        cc = p[12:16]
        d = p[20:]
        if cc == b"VP8 " and d[3:6] == b"\x9d\x01\x2a":
            w = struct.unpack("<H", d[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", d[8:10])[0] & 0x3FFF
            return ("webp", w, h)
        if cc == b"VP8L" and d[0] == 0x2F:
            bits = struct.unpack("<I", d[1:5])[0]
            return ("webp", (bits & 0x3FFF) + 1,
                    ((bits >> 14) & 0x3FFF) + 1)
        if cc == b"VP8X":
            w = 1 + int.from_bytes(d[4:7], "little")
            h = 1 + int.from_bytes(d[7:10], "little")
            return ("webp", w, h)
        return ("webp", None, None)
    if len(p) >= 8 and p[:4] in (b"II*\x00", b"MM\x00*"):
        end = "<" if p[:2] == b"II" else ">"
        try:
            (ifd,) = struct.unpack(end + "I", p[4:8])
            (n,) = struct.unpack(end + "H", p[ifd : ifd + 2])
            w = h = None
            for k in range(n):
                e = p[ifd + 2 + 12 * k : ifd + 14 + 12 * k]
                tag, typ = struct.unpack(end + "HH", e[:4])
                if tag not in (0x0100, 0x0101):
                    continue
                val = struct.unpack(
                    end + ("H" if typ == 3 else "I"),
                    e[8 : 10 if typ == 3 else 12],
                )[0]
                if tag == 0x0100:
                    w = val
                else:
                    h = val
            return ("tiff", w, h)
        except struct.error:
            return ("tiff", None, None)
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


# --- audio / video: real WAV decode + container header probing -------------
#
# WAV (RIFF PCM int8/16/24/32 and IEEE float32/64) decodes for real;
# MP3 / OGG (Vorbis+Opus) / FLAC / MP4 are header-probed for
# (sample_rate, channels, duration_ms, width, height) from their public
# byte layouts — no codec library — so the typed-metadata path covers
# the audio/video columns the MEDIA_SCHEMA declares.

_MP3_BITRATES = {  # kbit/s, index 1-14 (0=free, 15=bad), by (version, layer)
    ("1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320],
    ("1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
               320, 384],
    ("1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
               384, 416, 448],
    ("2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
               224, 256],
    ("2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160],
    ("2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160],
}
_MP3_RATES = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
              "2.5": [11025, 12000, 8000]}


def decode_wav(payload: bytes) -> tuple["np.ndarray", int]:
    """Real WAV decode: (samples float64 in [-1, 1] shaped
    (n_frames, channels), sample_rate). PCM 8 (unsigned) / 16 / 24 /
    32-bit signed and IEEE float32/64 supported."""
    p = bytes(payload or b"")
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    fmt_body = b""
    data = None
    while pos + 8 <= len(p):
        cid = p[pos : pos + 4]
        (size,) = struct.unpack("<I", p[pos + 4 : pos + 8])
        body = p[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_fmt, ch, rate, _brate, _align, bits = fmt
    if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        # extension: cbSize(2) validbits(2) channelmask(4) GUID(16);
        # the SubFormat GUID's leading u16 is the real format tag
        # (1 = PCM, 3 = IEEE float) — decoding float as int PCM here
        # would silently produce garbage samples
        if len(fmt_body) >= 26:
            (audio_fmt,) = struct.unpack("<H", fmt_body[24:26])
        else:
            raise ValueError("WAV: truncated WAVE_FORMAT_EXTENSIBLE")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            a = (np.frombuffer(data, np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif bits == 16:
            a = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, np.uint8).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            a = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            a = np.frombuffer(data, "<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise DecodeUnavailable(f"WAV PCM {bits}-bit")
    elif audio_fmt == 3:  # IEEE float
        a = np.frombuffer(
            data, "<f4" if bits == 32 else "<f8"
        ).astype(np.float64)
    else:
        raise DecodeUnavailable(f"WAV format {audio_fmt} (compressed)")
    n = (len(a) // ch) * ch
    return a[:n].reshape(-1, ch), rate


def encode_wav(samples: "np.ndarray", rate: int, bits: int = 16,
               fmt_float: bool = False, extensible: bool = False) -> bytes:
    """WAV encoder for tests: float input in [-1, 1], (N,) or
    (N, channels). bits 16/32 integer PCM, or `fmt_float=True` for
    IEEE float32 (tag 3). `extensible=True` wraps the chosen format in
    a WAVE_FORMAT_EXTENSIBLE header (tag 0xFFFE + SubFormat GUID) —
    the layout many tools emit, used to exercise that decode path."""
    a = np.asarray(samples, np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if fmt_float:
        raw = a.astype("<f4").tobytes()
        fmt_tag, bw = 3, 4
    elif bits == 16:
        raw = np.clip(np.rint(a * 32767), -32768, 32767).astype(
            "<i2"
        ).tobytes()
        fmt_tag, bw = 1, 2
    elif bits == 32:
        raw = np.clip(
            np.rint(a * 2147483647), -(1 << 31), (1 << 31) - 1
        ).astype("<i4").tobytes()
        fmt_tag, bw = 1, 4
    else:
        raise ValueError("bits must be 16 or 32")
    fmt = struct.pack("<HHIIHH",
                      0xFFFE if extensible else fmt_tag,
                      ch, rate, rate * ch * bw, ch * bw, bw * 8)
    if extensible:
        # cbSize=22, valid bits, channel mask 0, SubFormat GUID with
        # the real format tag in its leading u16
        guid = struct.pack("<H", fmt_tag) + bytes(14)
        fmt += struct.pack("<HHI", 22, bw * 8, 0) + guid
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _mp4_boxes(p: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", p[pos : pos + 4])
        btype = p[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", p[pos + 8 : pos + 16])
        if size < 8 or pos + size > end:
            return
        yield btype, pos + 8, pos + size
        pos += size


def probe_media_header(payload: bytes) -> dict:
    """Container-header probe for audio/video payloads: returns
    {format, sample_rate, channels, duration_ms, width, height} with
    None for fields a container doesn't carry. Pure byte-layout
    parsing (WAV / MP3 / OGG Vorbis+Opus / FLAC / MP4), no codec."""
    p = bytes(payload or b"")
    out = {"format": None, "sample_rate": None, "channels": None,
           "duration_ms": None, "width": None, "height": None}
    try:
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            out["format"] = "wav"
            pos = 12
            d_size = None
            brate = None
            while pos + 8 <= len(p):
                cid = p[pos : pos + 4]
                (size,) = struct.unpack("<I", p[pos + 4 : pos + 8])
                if cid == b"fmt ":
                    _f, ch, rate, brate, _al, _b = struct.unpack(
                        "<HHIIHH", p[pos + 8 : pos + 24]
                    )
                    out["sample_rate"] = rate
                    out["channels"] = ch
                elif cid == b"data":
                    d_size = size
                pos += 8 + size + (size & 1)
            if d_size and brate:
                out["duration_ms"] = int(d_size * 1000 / brate)
            return out
        if p[:4] == b"fLaC":
            out["format"] = "flac"
            # STREAMINFO: 4 magic + 4 block header + 10 bytes, then the
            # 8-byte pack: 20-bit rate | 3-bit ch-1 | 5-bit bps-1 |
            # 36-bit total samples
            bits = int.from_bytes(p[18:26], "big")
            rate = bits >> 44
            out["sample_rate"] = rate
            out["channels"] = ((bits >> 41) & 0x7) + 1
            total = bits & ((1 << 36) - 1)
            if rate and total:
                out["duration_ms"] = int(total * 1000 / rate)
            return out
        if p[:4] == b"OggS":
            # first packet starts after the 27-byte header + seg table
            nseg = p[26]
            first = 27 + nseg
            out["format"] = "ogg"
            rate = None
            if p[first : first + 7] == b"\x01vorbis":
                out["channels"] = p[first + 11]
                (rate,) = struct.unpack(
                    "<I", p[first + 12 : first + 16]
                )
                out["sample_rate"] = rate
            elif p[first : first + 8] == b"OpusHead":
                out["channels"] = p[first + 9]
                out["sample_rate"] = 48000  # opus decodes at 48 kHz
                rate = 48000
            # last page's granule position -> duration. 'OggS' can also
            # occur INSIDE packet data (the container does not escape
            # it), so walk backwards until the match looks like a real
            # page header: version byte 0 and header-type flags <= 0x07
            last = p.rfind(b"OggS")
            while rate and last > 0:
                if (last + 14 <= len(p) and p[last + 4] == 0
                        and p[last + 5] <= 0x07):
                    (granule,) = struct.unpack(
                        "<q", p[last + 6 : last + 14]
                    )
                    if granule > 0:
                        out["duration_ms"] = int(granule * 1000 / rate)
                    break
                last = p.rfind(b"OggS", 0, last)
            return out
        if len(p) > 12 and p[4:8] == b"ftyp":
            out["format"] = "mp4"
            for btype, s, e in _mp4_boxes(p, 0, len(p)):
                if btype != b"moov":
                    continue
                for b2, s2, e2 in _mp4_boxes(p, s, e):
                    if b2 == b"mvhd":
                        ver = p[s2]
                        if ver == 1:
                            ts, dur = struct.unpack(
                                ">IQ", p[s2 + 20 : s2 + 32]
                            )
                        else:
                            ts, dur = struct.unpack(
                                ">II", p[s2 + 12 : s2 + 20]
                            )
                        if ts:
                            out["duration_ms"] = int(dur * 1000 / ts)
                    elif b2 == b"trak":
                        for b3, s3, e3 in _mp4_boxes(p, s2, e2):
                            if b3 != b"tkhd":
                                continue
                            ver = p[s3]
                            off = s3 + (96 if ver == 1 else 84) - 8
                            w, h = struct.unpack(
                                ">II", p[off : off + 8]
                            )
                            if w and h:  # 16.16 fixed; audio tracks 0
                                out["width"] = w >> 16
                                out["height"] = h >> 16
            return out
        # MP3: raw frame sync (possibly after an ID3v2 tag)
        start = 0
        if p[:3] == b"ID3" and len(p) > 10:
            syncsafe = p[6:10]
            start = 10 + (
                (syncsafe[0] << 21) | (syncsafe[1] << 14)
                | (syncsafe[2] << 7) | syncsafe[3]
            )
        i = p.find(b"\xff", start)
        while 0 <= i < len(p) - 4:
            h = p[i : i + 4]
            if (h[1] & 0xE0) == 0xE0:
                vbits = (h[1] >> 3) & 0x3
                layer = 4 - ((h[1] >> 1) & 0x3)
                version = {0: "2.5", 2: "2", 3: "1"}.get(vbits)
                if version and layer in (1, 2, 3):
                    br_idx = h[2] >> 4
                    sr_idx = (h[2] >> 2) & 0x3
                    if 0 < br_idx < 15 and sr_idx < 3:
                        out["format"] = "mp3"
                        key = (version if version == "1" else "2", layer)
                        kbps = _MP3_BITRATES[key][br_idx]
                        out["sample_rate"] = _MP3_RATES[version][sr_idx]
                        out["channels"] = 1 if (h[3] >> 6) == 3 else 2
                        if kbps:
                            out["duration_ms"] = int(
                                (len(p) - i) * 8 / kbps
                            )
                        return out
            i = p.find(b"\xff", i + 1)
    except (struct.error, IndexError):
        pass
    return out


MEDIA_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def media_probe(media: DataFrame) -> DataFrame:
    """Container-header probe over a binary column for audio/video
    payloads (WAV/MP3/OGG/FLAC/MP4), falling back to the image probe
    for image containers — one typed-metadata row per payload with no
    codec library involved (mapInPandas, partition-preserving)."""

    def one(mid, payload):
        h = probe_media_header(payload)
        if h["format"] is None:
            fmt, w, hh = probe_image_header(payload)
            if fmt is not None:
                h = {"format": fmt, "sample_rate": None,
                     "channels": None, "duration_ms": None,
                     "width": w, "height": hh}
        return (mid, h["format"], h["sample_rate"], h["channels"],
                h["duration_ms"], h["width"], h["height"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(m, q)
                    for m, q in zip(pdf["media_id"], pdf["payload"])]
            yield pd.DataFrame(
                rows,
                columns=["media_id", "format", "sample_rate", "channels",
                         "duration_ms", "width", "height"],
            )

    return media.mapInPandas(run, schema=MEDIA_PROBE_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode over a binary column (WAV PCM/float):
    sample-true (rate, channels, duration, rms, peak) per payload;
    undecodable audio yields a decode_error ROW (mapInPandas,
    partition-preserving — same failure contract as
    decode_image_stats)."""

    def one(mid, payload):
        try:
            samples, rate = decode_wav(payload)
        except Exception as e:  # noqa: BLE001 — typed row, not a crash
            return (mid, None, None, None, None, None,
                    f"{type(e).__name__}: {e}"[:200])
        n, ch = samples.shape
        return (
            mid, int(rate), int(ch),
            int(n * 1000 / rate) if rate else None,
            round(float(np.sqrt(np.mean(samples ** 2))), 8) if n else 0.0,
            round(float(np.abs(samples).max()), 8) if n else 0.0,
            None,
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(m, q)
                    for m, q in zip(pdf["media_id"], pdf["payload"])]
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "channels",
                         "duration_ms", "rms", "peak", "decode_error"],
            )

    return media.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


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
