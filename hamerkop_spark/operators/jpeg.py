"""Baseline JPEG codec, dependency-free (numpy + stdlib).

Completes the multimodal decode family (operators/multimodal.py): the
round-2 engine marked JPEG `DecodeUnavailable` because its entropy
decode is a real codec, not a container parse — this module implements
that codec from the public JPEG specification (ITU-T T.81): baseline
sequential DCT and progressive (SOF2, spectral selection + successive
approximation per G.1.2), Huffman entropy coding with the Annex-K
standard tables, 8-bit AND 12-bit sequential samples (SOF1, 16-bit
DQT tables), lossless DPCM (SOF3, Annex H: all seven predictors,
point transform, mod-2^16 differences, 2-16 bit precision), grayscale
/ 4:4:4 / 4:2:0 YCbCr, restart markers. Arithmetic coding (SOF9-11,
13-15) and hierarchical frames raise `NotImplementedError` — the
caller (multimodal.decode_image) surfaces that as DecodeUnavailable
per its contract; see the OPERATORS.md decision record for why
arithmetic stays documented-out (the Qe state table cannot be
verified against real streams in this sandbox).

Throughput note: entropy decode is a sequential per-bit loop in Python
— fine for the per-image granularity the mapInPandas operators
parallelize over (images decode independently across partitions), not
a pixel-parallel kernel. The DCT/IDCT and color transforms are
vectorized numpy over whole block grids.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1/K.2 quantization tables (quality 50 base)
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag scan order (index i of the scan -> position in the 8x8 block)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 DCT-II matrix: dct = M @ block @ M.T ; idct = M.T @ coef @ M
_M = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _M[_k, _n] = (
            np.sqrt((1 if _k else 0.5) / 4.0)
            * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
        )


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (public libjpeg formula)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], huffval: list[int]):
    """(code, length) per symbol in canonical order (spec C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) of a DC diff / AC value (spec F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _seg(marker: int, payload: bytes) -> bytes:
    """Marker segment: 2-byte marker + 2-byte length (incl. itself)."""
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _encode_prep(arr: np.ndarray, quality: int, subsampling: str,
                 precision: int = 8):
    """Shared encoder forward path: color convert, subsample, MCU-pad.
    Returns (h, w, ncomp, padded planes, quant tables, sampling,
    qy, qc, hmax, vmax, mcux, mcuy). For 12-bit frames the chroma
    center moves to 2^(P-1) and the quality tables scale x8 (samples
    are 16x wider, so this keeps relative quantization finer)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ncomp = arr.shape
    if ncomp not in (1, 3):
        raise ValueError("encode_jpeg: 1 or 3 channels")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be 4:4:4 or 4:2:0")
    sub = subsampling == "4:2:0" and ncomp == 3
    center = 1 << (precision - 1)
    qy = _scaled_quant(_QY, quality)
    qc = _scaled_quant(_QC, quality)
    if precision == 12:
        qy = qy * 8
        qc = qc * 8
    if ncomp == 3:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = center - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = center + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        if sub:
            # pad to even, then 2x2 box-average the chroma planes
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
        quants = [qy, qc, qc]
        sampling = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * 3
    else:
        planes = [arr[..., 0].astype(np.float64)]
        quants = [qy]
        sampling = [(1, 1)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, sampling):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        pp = np.pad(
            p,
            ((0, th - p.shape[0]), (0, tw - p.shape[1])),
            mode="edge",
        )
        padded.append(pp)
    return (h, w, ncomp, padded, quants, sampling, qy, qc,
            hmax, vmax, mcux, mcuy)


def _ext_huff_tables() -> tuple[tuple, tuple]:
    """Flat canonical tables for 12-bit frames (the Annex-K example
    tables only reach the 8-bit categories): DC categories 0-15 at
    code length 5; AC symbols EOB, ZRL and every (run, size 1-14)
    pair at length 9. Valid canonical codes (Kraft 16/32 and 242/512;
    no all-ones code), trivially decodable, compression-suboptimal —
    they exist to produce honest 12-bit round-trip streams."""
    dc_bits = [0] * 16
    dc_bits[4] = 16
    dc_vals = list(range(16))
    ac_bits = [0] * 16
    ac_vals = [0x00, 0xF0] + [
        (run << 4) | size for run in range(16) for size in range(1, 15)
    ]
    ac_bits[8] = len(ac_vals)
    return (dc_bits, dc_vals), (ac_bits, ac_vals)


def encode_jpeg(
    arr: np.ndarray, quality: int = 75, subsampling: str = "4:4:4",
    progressive: bool = False, precision: int = 8,
) -> bytes:
    """JFIF encoder: (H, W) grayscale or (H, W, 3) RGB, 4:4:4 or
    4:2:0 chroma sampling. `progressive=True` emits an SOF2 stream
    with a libjpeg-style scan script (spectral selection + successive
    approximation) — used to exercise the progressive decoder.
    `precision=12` emits an extended-sequential SOF1 stream (uint16
    input, 0-4095) with 16-bit DQT tables — used to exercise the
    12-bit decode path."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if progressive:
        if precision != 8:
            raise ValueError("progressive encoder is 8-bit only")
        return _encode_progressive(arr, quality, subsampling)
    (h, w, ncomp, padded, quants, sampling, qy, qc,
     hmax, vmax, mcux, mcuy) = _encode_prep(arr, quality, subsampling,
                                            precision)
    if precision == 12:
        dc_t, ac_t = _ext_huff_tables()
        dc_tabs = [_canonical_codes(*dc_t)] * ncomp
        ac_tabs = [_canonical_codes(*ac_t)] * ncomp
    else:
        dc_tabs = [_canonical_codes(*_STD_DC_LUM)] + (
            [_canonical_codes(*_STD_DC_CHR)] * 2 if ncomp == 3 else []
        )
        ac_tabs = [_canonical_codes(*_STD_AC_LUM)] + (
            [_canonical_codes(*_STD_AC_CHR)] * 2 if ncomp == 3 else []
        )
    center = float(1 << (precision - 1))

    def emit_block(ci: int, block: np.ndarray) -> None:
        coef = _M @ (block - center) @ _M.T
        q = np.round(coef / quants[ci].reshape(8, 8)).astype(np.int64)
        zz = q.reshape(64)[_ZIGZAG]
        diff = int(zz[0]) - dc_prev[ci]
        dc_prev[ci] = int(zz[0])
        size, bits = _magnitude(diff)
        code, length = dc_tabs[ci][size]
        writer.write(code, length)
        if size:
            writer.write(bits, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_tabs[ci][0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = ac_tabs[ci][(run << 4) | size]
            writer.write(code, length)
            writer.write(bits, size)
            run = 0
        if run:
            code, length = ac_tabs[ci][0x00]  # EOB
            writer.write(code, length)

    writer = _BitWriter()
    dc_prev = [0] * ncomp
    for by in range(mcuy):
        for bx in range(mcux):
            for ci, (sh, sv) in enumerate(sampling):
                for v in range(sv):
                    for hh in range(sh):
                        py = (by * sv + v) * 8
                        px = (bx * sh + hh) * 8
                        emit_block(
                            ci,
                            padded[ci][py : py + 8, px : px + 8],
                        )
    writer.flush()

    seg = _seg

    def dqt_payload(tid: int, q: np.ndarray) -> bytes:
        zz = q.reshape(64)[_ZIGZAG]
        if precision == 12:  # pq=1: 16-bit big-endian table values
            return bytes([0x10 | tid]) + b"".join(
                struct.pack(">H", int(x)) for x in zz
            )
        return bytes([tid]) + bytes(int(x) for x in zz)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, dqt_payload(0, qy))
    if ncomp == 3:
        out += seg(0xFFDB, dqt_payload(1, qc))
    comps = b""
    for ci in range(ncomp):
        sh, sv = sampling[ci]
        comps += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    sof_marker = 0xFFC1 if precision == 12 else 0xFFC0
    out += seg(sof_marker,
               struct.pack(">BHHB", precision, h, w, ncomp) + comps)
    if precision == 12:
        dc_t, ac_t = _ext_huff_tables()
        dht = [(0, 0, dc_t), (1, 0, ac_t)]
        if ncomp == 3:
            dht += [(0, 1, dc_t), (1, 1, ac_t)]
    else:
        dht = [(0, 0, _STD_DC_LUM), (1, 0, _STD_AC_LUM)] + (
            [(0, 1, _STD_DC_CHR), (1, 1, _STD_AC_CHR)]
            if ncomp == 3 else []
        )
    for cls, tid, (bits, vals) in dht:
        out += seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, surfaces RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker mid-entropy (RSTn handled at MCU boundaries by
                # sync_restart; anything else here is a corrupt stream)
                raise ValueError("unexpected marker in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)

    def sync_restart(self) -> None:
        """Discard partial bits and consume the RSTn at the boundary."""
        self.acc = 0
        self.nbits = 0
        if (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


def _decode_huffman(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        if (code, length) in table:
            return table[(code, length)]
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(p: bytes, vectorized: bool = True) -> np.ndarray:
    """JPEG decoder (sequential SOF0/1 at 8- or 12-bit, progressive
    SOF2, lossless SOF3). Returns (H, W, C) with C = 1 (grayscale) or
    3 — uint8 for precision <= 8, uint16 above. Raises
    NotImplementedError for arithmetic-coded and hierarchical streams.

    `vectorized=True` (default) runs the two-phase decoder: bit-level
    Huffman parse in Python collecting flat (index, value) coefficient
    arrays, then ONE batched numpy dezigzag + dequant + IDCT
    (`_M.T @ (N,8,8) @ _M`, per-slice dgemm — bit-identical to the
    per-block reference) and a reshape/transpose MCU assembly.
    `vectorized=False` keeps the original per-MCU reference path;
    tests assert pixel-exact agreement between the two."""
    pos = 2  # past SOI
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    progressive = False
    scans_done = 0
    coef: dict[int, np.ndarray] = {}
    ll_planes: dict[int, np.ndarray] = {}
    while pos < len(p):
        if p[pos] != 0xFF:
            pos += 1
            continue
        marker = p[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            if progressive and scans_done:
                return _progressive_finish(coef, frame, quant)
            break
        (seg_len,) = struct.unpack(">H", p[pos + 2 : pos + 4])
        data = p[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0xF
                tab = np.zeros(64, dtype=np.int32)
                if pq:  # 16-bit big-endian table values (12-bit frames)
                    tab[_ZIGZAG] = np.frombuffer(
                        data[i + 1 : i + 129], dtype=">u2"
                    ).astype(np.int32)
                    i += 129
                else:
                    tab[_ZIGZAG] = np.frombuffer(
                        data[i + 1 : i + 65], dtype=np.uint8
                    ).astype(np.int32)
                    i += 65
                quant[tq] = tab.reshape(8, 8)
        elif marker == 0xC4:
            i = 0
            while i < len(data):
                cls, tid = data[i] >> 4, data[i] & 0xF
                bits = list(data[i + 1 : i + 17])
                n = sum(bits)
                vals = list(data[i + 17 : i + 17 + n])
                codes = _canonical_codes(bits, vals)
                huff[(cls, tid)] = {
                    (code, length): sym
                    for sym, (code, length) in codes.items()
                }
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            prec, h, w, nc = struct.unpack(">BHHB", data[:6])
            if marker == 0xC3:
                if not 2 <= prec <= 16:
                    raise ValueError("lossless precision out of range")
            elif prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit DCT precision")
            elif prec == 12 and marker == 0xC2:
                raise NotImplementedError("12-bit progressive JPEG")
            comps = []
            for ci in range(nc):
                cid, samp, tq = data[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "lossless": marker == 0xC3}
            if marker == 0xC2:
                progressive = True
                _hm, _vm, _mx, _my, geo = _comp_geometry(frame)
                coef = {
                    c["id"]: np.zeros(
                        (geo[c["id"]][0] * geo[c["id"]][1], 64),
                        dtype=np.int32,
                    )
                    for c in comps
                }
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("hierarchical JPEG")
        elif marker in (0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "arithmetic-coded JPEG (see OPERATORS.md decision record)"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = data[0]
            scan = []
            for si in range(ns):
                cs, tt = data[1 + si * 2 : 3 + si * 2]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append(
                    {"comp": comp, "dc": tt >> 4, "ac": tt & 0xF}
                )
            if frame.get("lossless"):
                # Ss = predictor selector (1-7), Al = point transform.
                # Real lossless files are often NON-interleaved (one
                # scan per component), so decode scans into the shared
                # plane dict until every frame component has one.
                end = _decode_lossless_scan(
                    p, pos + 2 + seg_len, frame, scan,
                    data[1 + ns * 2], data[3 + ns * 2] & 0xF,
                    huff, restart_interval, ll_planes,
                )
                if all(c["id"] in ll_planes for c in frame["comps"]):
                    return _lossless_assemble(frame, ll_planes)
                pos = _sync_to_marker(p, end)
                continue
            if progressive:
                ss = data[1 + ns * 2]
                se = data[2 + ns * 2]
                ahal = data[3 + ns * 2]
                reader = _BitReader(p, pos + 2 + seg_len)
                _progressive_scan(
                    reader, scan, ss, se, ahal >> 4, ahal & 0xF,
                    huff, frame, coef, restart_interval,
                )
                scans_done += 1
                pos = _sync_to_marker(p, reader.pos)
                continue
            decode = _decode_scan_vectorized if vectorized else _decode_scan
            return decode(
                p, pos + 2 + seg_len, frame, scan, quant, huff,
                restart_interval,
            )
        pos += 2 + seg_len
    if progressive and scans_done:
        return _progressive_finish(coef, frame, quant)  # EOI truncated
    if ll_planes:
        raise ValueError(
            "lossless JPEG: stream ended with component scans missing"
        )
    raise ValueError("no scan found")


def _split_entropy_segments(p: bytes, start: int) -> list[bytes]:
    """Un-stuff the entropy stream (0xFF00 -> 0xFF) from `start` and
    split it on RSTn markers; scanning runs C-side via bytes.find, not
    per-byte Python. Returns one bytes segment per restart interval
    (a single segment when the stream has no restarts)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(p)
    while i < n:
        j = p.find(b"\xff", i)
        if j == -1:
            cur += p[i:]
            break
        cur += p[i:j]
        nxt = p[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:
            break  # EOI / next marker terminates the entropy stream
    segs.append(bytes(cur))
    return segs


_LUT_CACHE: dict = {}


def _huffman_value_lut(table: dict, is_dc: bool) -> list[int]:
    """16-bit-peek Huffman LUT that resolves the SYMBOL AND ITS VALUE
    FIELD in one list index whenever code_len + value_size <= 16 (the
    overwhelmingly common case) — the value bits are part of the peeked
    window, so the table can pre-extend them. AC tables additionally
    FOLD A SECOND SYMBOL into the same peek when it also fits: either a
    full second (run, value) pair or the trailing EOB that ends most
    blocks, so the typical 5-9-bit AC codes resolve two symbols per
    list index. Entry layout (Python int):

        bits 0-4   TOTAL consumed bits (incl. folded 2nd symbol)
        bits 5-6   kind: 0 complete (value resolved), 1 EOB, 2 ZRL,
                   3 fallback (value bits read separately)
        bits 7-10  run  (AC; 0 for DC)
        bits 11-27 kind 0: value + 65536   kind 3: value size
        bits 28-29 ext: 0 none, 1 second (run2, val2) folded,
                   2 EOB folded after the value (AC kind-0 only)
        bits 30-33 run2
        bits 34-50 value2 + 65536
        bits 51-55 consumed bits of the FIRST symbol alone (kind 0;
                   runtime uses it when the fold must be declined at
                   block position 63)

    0 = invalid code. Built with numpy per symbol (canonical codes own
    contiguous ranges; the value variants inside a range are a
    vectorized arange transform; the second-symbol fold is one fancy
    re-index of the single-symbol array) and cached by table CONTENT,
    so the standard Annex-K tables shared by most JPEGs build once per
    process, not once per image."""
    key = (is_dc, tuple(sorted(table.items())))
    got = _LUT_CACHE.get(key)
    if got is not None:
        return got
    lut = np.zeros(1 << 16, dtype=np.int64)
    for (code, length), sym in table.items():
        start = code << (16 - length)
        span = 1 << (16 - length)
        run, size = (0, sym) if is_dc else (sym >> 4, sym & 0xF)
        if size == 0:
            if not is_dc and run == 15:
                e = length | (2 << 5)  # ZRL
            elif not is_dc:
                e = length | (1 << 5)  # EOB
            else:
                e = length | (65536 << 11) | (length << 51)  # DC diff 0
            lut[start : start + span] = e
        elif length + size <= 16:
            idx = np.arange(span, dtype=np.int64)
            vbits = (idx >> (16 - length - size)) & ((1 << size) - 1)
            value = np.where(
                vbits >= (1 << (size - 1)), vbits, vbits - ((1 << size) - 1)
            )
            lut[start : start + span] = (
                (length + size)
                | (run << 7)
                | ((value + 65536) << 11)
                | ((length + size) << 51)
            )
        else:
            lut[start : start + span] = (
                length | (3 << 5) | (run << 7) | (size << 11)
            )
    if not is_dc:
        # Fold the next symbol where its bits are fully inside the same
        # 16-bit window. After symbol 1 consumes c1 bits, the window's
        # remaining 16-c1 bits (zero-padded below) resolve symbol 2 via
        # one fancy index of the single-symbol array; the fold is valid
        # only when symbol 2's own consumption fits those known bits —
        # canonical prefix codes guarantee the entry then depends on no
        # padding bit.
        c1 = (lut >> 51) & 31
        kind1 = (lut >> 5) & 3
        win = np.arange(1 << 16, dtype=np.int64)
        e2 = lut[(win << c1) & 0xFFFF]
        c2 = e2 & 31
        kind2 = (e2 >> 5) & 3
        fits = (lut != 0) & (kind1 == 0) & (e2 != 0) & (c1 + c2 <= 16)
        pair = fits & (kind2 == 0)
        eob = fits & (kind2 == 1)
        head = lut & ~np.int64(31)
        lut = np.where(
            pair,
            head
            | (c1 + c2)
            | (np.int64(1) << 28)
            | (((e2 >> 7) & 0xF) << 30)
            | (((e2 >> 11) & 0x1FFFF) << 34),
            np.where(eob, head | (c1 + c2) | (np.int64(2) << 28), lut),
        )
    out = tuple(lut.tolist())
    # Each entry is a 65,536-slot tuple of Python ints (~2.5 MB
    # resident). Web-crawl JPEGs are commonly mozjpeg-optimized with
    # per-image custom Huffman tables, so on the decode path most
    # entries never repeat — a large cap would just pin ~cap x 2.5 MB
    # in EVERY executor Python worker for near-zero hit rate. Cap 8
    # covers the standard Annex-K tables (4) plus one custom image's
    # worth, which is where the real reuse is.
    if len(_LUT_CACHE) >= 8:
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = out
    return out


def _decode_scan_vectorized(p, start, frame, scan, quant, huff,
                            restart_interval):
    """Two-phase scan decode (VERDICT r3 #4): phase 1 walks the bit
    stream in Python (Huffman has no vector shape) with an accumulator
    + 16-bit-peek LUT — one dict-free list index per symbol, one shift
    per value field, no per-bit loop; phase 2 is three batched numpy
    ops per component — flat scatter, dezigzag fancy-index, (N,8,8)
    matmul IDCT — plus one reshape/transpose that lays every MCU block
    into the plane with zero per-block Python."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["comp"]["h"] for c in scan)
    vmax = max(c["comp"]["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # The accumulator refills in 32-bit gulps from a per-segment list
    # of big-endian words (one list index per gulp; bit offsets stay
    # word-aligned because refills only ever add whole words). Pad with
    # 1-bits (spec padding) so the 16-bit peek never runs dry inside
    # the last symbol; a truncated stream then hits an unassigned
    # all-ones code -> 'invalid Huffman code' (or exhausts the word
    # list -> IndexError), still a typed failure at the decode_image
    # layer.
    segs = []
    for s in _split_entropy_segments(p, start):
        s += b"\xff" * (16 - len(s) % 4)
        segs.append(tuple(np.frombuffer(s, dtype=">u4").tolist()))
    luts: dict[tuple[int, bool], list[int]] = {}

    def lut_for(table, is_dc):
        key = (id(table), is_dc)
        got = luts.get(key)
        if got is None:
            got = luts[key] = _huffman_value_lut(table, is_dc)
        return got

    # per-slot state in flat lists (dict lookups cost in this loop);
    # comp_plan rows: (slot, bound packed-append, luts, blocks/MCU).
    # Each coefficient is ONE append of (flat_index << 17) | (value +
    # 65536) — the LUT stores values pre-biased, so the hot path does
    # no value arithmetic at all. MASKS avoids re-building
    # (1 << n) - 1 per symbol.
    masks = tuple((1 << n) - 1 for n in range(48))
    n_slots = len(scan)
    coef_lists = [[] for _ in range(n_slots)]
    comp_plan = [
        (
            slot,
            coef_lists[slot].append,
            lut_for(huff[(0, s["dc"])], True),
            lut_for(huff[(1, s["ac"])], False),
            s["comp"]["v"] * s["comp"]["h"],
        )
        for slot, s in enumerate(scan)
    ]
    nblk = [0] * n_slots
    dcs = [0] * n_slots
    seg_i = 0
    data = segs[0]
    bpos = 0
    acc_bits = 0
    nbits = 0
    mcu_count = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                seg_i += 1
                data = segs[seg_i]
                bpos = 0
                acc_bits = 0
                nbits = 0
                dcs = [0] * n_slots
            for slot, app, dc_lut, ac_lut, blocks in comp_plan:
                dc = dcs[slot]
                base = nblk[slot] * 64
                for _ in range(blocks):
                    # the accumulator is masked at REFILL time (garbage
                    # above nbits never survives a shift-in), so the
                    # symbol paths below skip per-symbol masking; peeks
                    # and value extractions mask their own windows
                    while nbits < 16:
                        acc_bits = (
                            (acc_bits & masks[nbits]) << 32
                        ) | data[bpos]
                        bpos += 1
                        nbits += 32
                    e = dc_lut[(acc_bits >> (nbits - 16)) & 0xFFFF]
                    if not e:
                        raise ValueError("invalid Huffman code")
                    nbits -= e & 31
                    kind = (e >> 5) & 3
                    if kind == 0:  # value resolved inside the peek
                        dc += ((e >> 11) & 0x1FFFF) - 65536
                    else:  # fallback: code+value didn't fit 16 bits
                        size = (e >> 11) & 0x1FFFF
                        while nbits < size:
                            acc_bits = (
                                (acc_bits & masks[nbits]) << 32
                            ) | data[bpos]
                            bpos += 1
                            nbits += 32
                        nbits -= size
                        v = (acc_bits >> nbits) & masks[size]
                        dc += (
                            v if v >= 1 << (size - 1) else v - masks[size]
                        )
                    app((base << 17) | (dc + 65536))
                    k = 1
                    while k < 64:
                        while nbits < 16:
                            acc_bits = (
                                (acc_bits & masks[nbits]) << 32
                            ) | data[bpos]
                            bpos += 1
                            nbits += 32
                        e = ac_lut[(acc_bits >> (nbits - 16)) & 0xFFFF]
                        if not e:
                            raise ValueError("invalid Huffman code")
                        kind = (e >> 5) & 3
                        if kind == 0:  # run + value resolved in the peek
                            run = (e >> 7) & 0xF
                            ext = (e >> 28) & 3
                            if ext and k + run < 63:
                                # folded 2nd symbol is safe: coeff 1
                                # lands strictly before 63, so the next
                                # symbol still belongs to this block
                                nbits -= e & 31
                                k += run
                                app(
                                    ((base + k) << 17)
                                    | ((e >> 11) & 0x1FFFF)
                                )
                                k += 1
                                if ext == 2:
                                    break  # folded trailing EOB
                                k += (e >> 30) & 0xF
                                if k > 63:
                                    raise ValueError("AC run overflow")
                                app(
                                    ((base + k) << 17)
                                    | ((e >> 34) & 0x1FFFF)
                                )
                                k += 1
                                continue
                            nbits -= (e >> 51) & 31  # first symbol only
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflow")
                            app(((base + k) << 17) | ((e >> 11) & 0x1FFFF))
                            k += 1
                            continue
                        nbits -= e & 31
                        if kind == 1:
                            break  # EOB
                        if kind == 2:
                            k += 16  # ZRL
                            continue
                        k += (e >> 7) & 0xF  # fallback
                        if k > 63:
                            raise ValueError("AC run overflow")
                        size = (e >> 11) & 0x1FFFF
                        while nbits < size:
                            acc_bits = (
                                (acc_bits & masks[nbits]) << 32
                            ) | data[bpos]
                            bpos += 1
                            nbits += 32
                        nbits -= size
                        v = (acc_bits >> nbits) & masks[size]
                        v = v if v >= 1 << (size - 1) else v - masks[size]
                        app(((base + k) << 17) | (v + 65536))
                        k += 1
                    base += 64
                nblk[slot] += blocks
                dcs[slot] = dc
            mcu_count += 1

    planes = {}
    for slot, s in enumerate(scan):
        c = s["comp"]
        cid = c["id"]
        n_blocks = nblk[slot]
        packed = np.asarray(coef_lists[slot], dtype=np.int64)
        flat = np.zeros(n_blocks * 64, dtype=np.float64)
        flat[packed >> 17] = (packed & 0x1FFFF) - 65536
        zz = flat.reshape(n_blocks, 64)
        coef = np.zeros((n_blocks, 64), dtype=np.float64)
        coef[:, _ZIGZAG] = zz  # dezigzag, all blocks at once
        coef = coef.reshape(n_blocks, 8, 8) * quant[c["tq"]][None, :, :]
        pix = _M.T @ coef @ _M  # batched per-slice dgemm IDCT
        v_s, h_s = c["v"], c["h"]
        planes[cid] = (
            pix.reshape(mcuy, mcux, v_s, h_s, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * v_s * 8, mcux * h_s * 8)
        )
    return _planes_to_image(planes, frame, scan, hmax, vmax)


def _decode_scan(p, start, frame, scan, quant, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["comp"]["h"] for c in scan)
    vmax = max(c["comp"]["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for s in scan:
        c = s["comp"]
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
    reader = _BitReader(p, start)
    dc_prev = {s["comp"]["id"]: 0 for s in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                # spec: RSTn between MCUs, byte-aligned, DC preds reset
                reader.sync_restart()
                dc_prev = {k: 0 for k in dc_prev}
            _decode_mcu(
                reader, scan, quant, huff, dc_prev, planes, mx, my
            )
            mcu_count += 1
    return _planes_to_image(planes, frame, scan, hmax, vmax)


def _planes_to_image(planes, frame, scan, hmax, vmax):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    out_planes = []
    for c in comps:
        plane = planes[c["id"]]
        # upsample to full resolution (nearest / pixel replication);
        # broadcast+reshape materializes both axes in ONE copy
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            ph, pw = plane.shape
            plane = np.broadcast_to(
                plane[:, None, :, None], (ph, ry, pw, rx)
            ).reshape(ph * ry, pw * rx)
        out_planes.append(plane[:h, :w])
    prec = frame.get("prec", 8)
    shift = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec <= 8 else np.uint16
    if len(out_planes) == 1:
        g = out_planes[0] + shift
        np.rint(g, out=g)
        np.clip(g, 0, maxv, out=g)
        return g.astype(dtype)[:, :, None]
    y, cb, cr = out_planes
    yb = y + shift
    out = np.empty((h, w, 3), dtype=np.float64)
    out[:, :, 0] = yb + 1.402 * cr
    out[:, :, 1] = yb - 0.344136 * cb - 0.714136 * cr
    out[:, :, 2] = yb + 1.772 * cb
    np.rint(out, out=out)
    np.clip(out, 0, maxv, out=out)
    return out.astype(dtype)


def _decode_mcu(reader, scan, quant, huff, dc_prev, planes, mx, my):
    for s in scan:
        c = s["comp"]
        for v in range(c["v"]):
            for hh in range(c["h"]):
                zz = np.zeros(64, dtype=np.int64)
                sym = _decode_huffman(reader, huff[(0, s["dc"])])
                diff = _extend(reader.bits(sym), sym) if sym else 0
                dc_prev[c["id"]] += diff
                zz[0] = dc_prev[c["id"]]
                k = 1
                while k < 64:
                    rs = _decode_huffman(reader, huff[(1, s["ac"])])
                    run, size = rs >> 4, rs & 0xF
                    if size == 0:
                        if run == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("AC run overflow")
                    zz[k] = _extend(reader.bits(size), size)
                    k += 1
                block = np.zeros(64, dtype=np.float64)
                block[_ZIGZAG] = zz
                coef = block.reshape(8, 8) * quant[c["tq"]]
                pix = _M.T @ coef @ _M
                py = (my * c["v"] + v) * 8
                px = (mx * c["h"] + hh) * 8
                planes[c["id"]][py : py + 8, px : px + 8] = pix


def _lossless_predict(pl, y, x, fresh, ra_line, predictor, default):
    """Sample prediction per T.81 H.1.1: the first sample after scan
    start / restart predicts 2^(P-Pt-1); the rest of that line uses Ra;
    later lines start from Rb and otherwise use the selected predictor
    (1=Ra, 2=Rb, 3=Rc, 4..7 the planar combinations)."""
    if fresh:
        return default
    if y == ra_line:
        return int(pl[y, x - 1])
    if x == 0:
        return int(pl[y - 1, 0])
    ra = int(pl[y, x - 1])
    rb = int(pl[y - 1, x])
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    rc = int(pl[y - 1, x - 1])
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1


def _decode_lossless_scan(p, start, frame, scan, predictor, pt, huff,
                          restart_interval, out_planes):
    """Lossless JPEG (SOF3, T.81 Annex H): Huffman-coded DPCM with one
    of seven predictors and an optional point transform Pt. Decodes
    ONE scan — interleaved (all components) or non-interleaved (a
    subset; real encoders usually emit one scan per component) — into
    `out_planes[comp_id]` with the point transform already applied.
    Differences are modulo-2^16 (H.1.2.1; SSSS=16 means +32768 with no
    extra bits). Returns the stream position after the scan's entropy
    data."""
    h, w, prec = frame["h"], frame["w"], frame["prec"]
    if not 1 <= predictor <= 7:
        raise ValueError(f"bad lossless predictor {predictor}")
    if any(s["comp"]["h"] != 1 or s["comp"]["v"] != 1 for s in scan):
        raise NotImplementedError("subsampled lossless components")
    if pt >= prec:
        raise ValueError("point transform >= precision")
    ncomp = len(scan)
    reader = _BitReader(p, start)
    tables = [huff[(0, s["dc"])] for s in scan]
    planes = [np.zeros((h, w), dtype=np.int64) for _ in range(ncomp)]
    default = 1 << (prec - pt - 1)
    count = 0
    fresh = True   # no sample since scan start / restart
    ra_line = 0    # line that falls back to the Ra predictor
    for y in range(h):
        for x in range(w):
            if restart_interval and count and (
                count % restart_interval == 0
            ):
                reader.sync_restart()
                fresh = True
                ra_line = y
            for ci in range(ncomp):
                ssss = _decode_huffman(reader, tables[ci])
                if ssss == 16:
                    diff = 32768
                elif ssss:
                    diff = _extend(reader.bits(ssss), ssss)
                else:
                    diff = 0
                pl = planes[ci]
                px = _lossless_predict(
                    pl, y, x, fresh, ra_line, predictor, default
                )
                pl[y, x] = (px + diff) & 0xFFFF
            fresh = False
            count += 1
    for ci, s in enumerate(scan):
        out_planes[s["comp"]["id"]] = planes[ci] << pt
    return reader.pos


def _lossless_assemble(frame, ll_planes) -> np.ndarray:
    """Stack decoded lossless planes in frame-component order; output
    dtype follows frame precision (uint8 <= 8, else uint16).
    Components are returned AS STORED — T.81 defines no color
    transform for the lossless process."""
    dtype = np.uint8 if frame["prec"] <= 8 else np.uint16
    return np.stack(
        [ll_planes[c["id"]] for c in frame["comps"]], axis=-1
    ).astype(dtype)


def encode_jpeg_lossless(
    arr: np.ndarray,
    predictor: int = 1,
    point_transform: int = 0,
    precision: int | None = None,
    restart_interval: int = 0,
    interleaved: bool = True,
) -> bytes:
    """Lossless JPEG encoder (SOF3, T.81 Annex H): Huffman DPCM with
    the selected predictor and point transform; components stored
    as given (no color transform). Exists to exercise the lossless
    decode path with honest round-trips — a flat canonical table
    (categories 0-16 at code length 5) keeps it table-free. Restart
    markers (DRI/RSTn) reset the prediction per H.1.1 when
    `restart_interval` (in samples) is set."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ncomp = arr.shape
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError("precision out of range")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1-7")
    pt = point_transform
    if pt >= precision:
        raise ValueError("point transform >= precision")
    samples = arr.astype(np.int64) >> pt
    default = 1 << (precision - pt - 1)
    bits = [0] * 16
    bits[4] = 17
    vals = list(range(17))
    codes = _canonical_codes(bits, vals)

    def encode_scan(comp_indices: list[int]) -> bytes:
        writer = _BitWriter()
        count = 0
        rst = 0
        fresh = True
        ra_line = 0
        for y in range(h):
            for x in range(w):
                if restart_interval and count and (
                    count % restart_interval == 0
                ):
                    writer.flush()
                    writer.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) & 7
                    fresh = True
                    ra_line = y
                for ci in comp_indices:
                    pl = samples[:, :, ci]
                    px = _lossless_predict(
                        pl, y, x, fresh, ra_line, predictor, default
                    )
                    diff = (int(pl[y, x]) - px) & 0xFFFF
                    if diff == 32768:
                        code, length = codes[16]
                        writer.write(code, length)
                    else:
                        sd = diff - 65536 if diff >= 32768 else diff
                        size, vbits = _magnitude(sd)
                        code, length = codes[size]
                        writer.write(code, length)
                        if size:
                            writer.write(vbits, size)
                fresh = False
                count += 1
        writer.flush()
        return bytes(writer.out)

    seg = _seg

    out = bytearray(b"\xff\xd8")
    comps = b""
    for ci in range(ncomp):
        comps += bytes([ci + 1, 0x11, 0])
    out += seg(
        0xFFC3, struct.pack(">BHHB", precision, h, w, ncomp) + comps
    )
    out += seg(0xFFC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    # interleaved: one scan with every component; non-interleaved (the
    # common real-world lossless layout): one scan PER component
    scan_groups = (
        [list(range(ncomp))] if interleaved
        else [[ci] for ci in range(ncomp)]
    )
    for group in scan_groups:
        sos = bytes([len(group)])
        for ci in group:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([predictor, 0, pt])
        out += seg(0xFFDA, sos)
        out += encode_scan(group)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2): spectral selection + successive approximation
# (spec G.1.2; scan-script and refinement semantics match libjpeg's
# public encoder/decoder behavior). Round-4 item: web crawls carry
# progressive JPEGs at double-digit percentages, so DecodeUnavailable
# was a real coverage gap.
# ---------------------------------------------------------------------------

# one AC Huffman table covering ALL 256 run/size symbols (9-bit codes):
# progressive scans emit EOBn symbols (r<<4 | 0, r>0) that the Annex-K
# baseline tables don't define. Suboptimal size, valid stream.
_FULL_AC_TABLE = (
    [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _comp_geometry(frame):
    """Per-component block geometry: (hmax, vmax, mcux, mcuy, per-comp
    [Bx, By, nbw, nbh]) where Bx/By are the MCU-padded grid dims the
    coefficient arrays use and nbw/nbh the actual (non-interleaved
    scan) dims."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geo = {}
    for c in comps:
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        geo[c["id"]] = (
            mcux * c["h"],  # Bx
            mcuy * c["v"],  # By
            -(-cw // 8),  # nbw
            -(-ch // 8),  # nbh
        )
    return hmax, vmax, mcux, mcuy, geo


def _progressive_scan(
    reader, scan, ss, se, ah, al, huff, frame, coef, restart_interval
):
    """Decode one progressive scan into the per-component coefficient
    arrays (natural 8x8 order, grid-raster flat block index)."""
    hmax, vmax, mcux, mcuy, geo = _comp_geometry(frame)
    zz_ = _ZIGZAG
    p1 = 1 << al
    m1 = -p1

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        interleaved = len(scan) > 1
        preds = [0] * len(scan)

        def dc_block(si, flat):
            c = scan[si]["comp"]
            arr = coef[c["id"]]
            if ah == 0:
                t = _decode_huffman(reader, huff[(0, scan[si]["dc"])])
                diff = _extend(reader.bits(t), t) if t else 0
                preds[si] += diff
                arr[flat, 0] = preds[si] << al
            else:
                arr[flat, 0] = int(arr[flat, 0]) | (reader.bit() << al)

        if interleaved:
            count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and count and (
                        count % restart_interval == 0
                    ):
                        reader.sync_restart()
                        preds[:] = [0] * len(scan)
                    for si, s in enumerate(scan):
                        c = s["comp"]
                        bx_, _by, _, _ = geo[c["id"]]
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                flat = (my * c["v"] + v) * bx_ + (
                                    mx * c["h"] + hh
                                )
                                dc_block(si, flat)
                    count += 1
        else:
            c = scan[0]["comp"]
            bx_, _by, nbw, nbh = geo[c["id"]]
            count = 0
            for by in range(nbh):
                for bx in range(nbw):
                    if restart_interval and count and (
                        count % restart_interval == 0
                    ):
                        reader.sync_restart()
                        preds[0] = 0
                    dc_block(0, by * bx_ + bx)
                    count += 1
        return

    # AC scan: single component, non-interleaved
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = scan[0]["comp"]
    arr = coef[c["id"]]
    actab = huff[(1, scan[0]["ac"])]
    bx_, _by, nbw, nbh = geo[c["id"]]
    eobrun = 0

    def refine_tail(flat, kstart):
        for k in range(kstart, se + 1):
            cv = int(arr[flat, zz_[k]])
            if cv != 0 and reader.bit() and (cv & p1) == 0:
                arr[flat, zz_[k]] = cv + (p1 if cv > 0 else m1)

    count = 0
    for by in range(nbh):
        for bx in range(nbw):
            if restart_interval and count and (
                count % restart_interval == 0
            ):
                reader.sync_restart()
                eobrun = 0
            count += 1
            flat = by * bx_ + bx
            if ah == 0:  # first scan for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _decode_huffman(reader, actab)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC band overflow")
                    arr[flat, zz_[k]] = (
                        _extend(reader.bits(s), s) << al
                    )
                    k += 1
            else:  # refinement scan (G.1.2.3)
                if eobrun > 0:
                    refine_tail(flat, ss)
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _decode_huffman(reader, actab)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) + (
                                reader.bits(r) if r else 0
                            )
                            break
                        val = 0  # ZRL: 16 zero-history skips
                    elif s == 1:
                        val = p1 if reader.bit() else m1
                    else:
                        raise ValueError(
                            "refinement symbol with size > 1"
                        )
                    while k <= se:
                        cv = int(arr[flat, zz_[k]])
                        if cv != 0:
                            if reader.bit() and (cv & p1) == 0:
                                arr[flat, zz_[k]] = cv + (
                                    p1 if cv > 0 else m1
                                )
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        arr[flat, zz_[k]] = val
                    k += 1
                if eobrun > 0:
                    refine_tail(flat, k)
                    eobrun -= 1


def _progressive_finish(coef, frame, quant):
    """Dequantize + batched IDCT + grid assembly of the accumulated
    progressive coefficients (same numpy phase 2 as the baseline
    vectorized path, grid-raster block order)."""
    hmax, vmax, _mcux, _mcuy, geo = _comp_geometry(frame)
    planes = {}
    for c in frame["comps"]:
        bx_, by_, _, _ = geo[c["id"]]
        cf = coef[c["id"]].astype(np.float64).reshape(-1, 8, 8)
        cf *= quant[c["tq"]][None, :, :]
        pix = _M.T @ cf @ _M
        planes[c["id"]] = (
            pix.reshape(by_, bx_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by_ * 8, bx_ * 8)
        )
    return _planes_to_image(planes, frame, None, hmax, vmax)


def _sync_to_marker(p: bytes, pos: int) -> int:
    """Advance past entropy data: first 0xFF followed by a byte that is
    neither a stuffed 0x00 nor an RSTn is the next marker."""
    n = len(p)
    while pos < n - 1:
        j = p.find(b"\xff", pos)
        if j == -1 or j >= n - 1:
            return n
        nxt = p[j + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            pos = j + 2
            continue
        return j
    return n


def _encode_progressive(
    arr: np.ndarray, quality: int, subsampling: str
) -> bytes:
    """Progressive JFIF encoder (SOF2) with a libjpeg-style scan
    script: DC first at Al=1 (interleaved), banded AC first scans with
    successive approximation, then DC and AC refinement scans down to
    Al=0. Exists to produce real successive-approximation streams for
    the progressive decoder's roundtrip tests; decoded output is
    bit-identical to the same image's baseline encode at the same
    quality because the final coefficient precision is Al=0."""
    (h, w, ncomp, padded, quants, sampling, qy, qc,
     hmax, vmax, mcux, mcuy) = _encode_prep(arr, quality, subsampling)

    # quantized zigzag coefficient grids: (By, Bx, 64) per component
    coefs = []
    for ci, (sh, sv) in enumerate(sampling):
        by_, bx_ = mcuy * sv, mcux * sh
        blocks = (
            padded[ci].reshape(by_, 8, bx_, 8).transpose(0, 2, 1, 3)
            - 128.0
        )
        cf = _M @ blocks @ _M.T
        q = np.round(cf / quants[ci].reshape(8, 8)).astype(np.int64)
        coefs.append(q.reshape(by_, bx_, 64)[..., _ZIGZAG])

    dc_tabs = [_canonical_codes(*_STD_DC_LUM)] + (
        [_canonical_codes(*_STD_DC_CHR)] * 2 if ncomp == 3 else []
    )
    ac_tab = _canonical_codes(*_FULL_AC_TABLE)

    # actual (non-interleaved) per-component block dims
    nbdims = []
    for ci, (sh, sv) in enumerate(sampling):
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        nbdims.append((-(-ch // 8), -(-cw // 8)))  # (nbh, nbw)

    def dc_scan(comp_ids, ah, al):
        wtr = _BitWriter()
        preds = {ci: 0 for ci in comp_ids}
        interleaved = len(comp_ids) > 1

        def one(ci, by, bx):
            v0 = int(coefs[ci][by, bx, 0])
            if ah == 0:
                val = v0 >> al  # arithmetic shift per spec point xform
                diff = val - preds[ci]
                preds[ci] = val
                size, bits = _magnitude(diff)
                code, length = dc_tabs[ci][size]
                wtr.write(code, length)
                if size:
                    wtr.write(bits, size)
            else:
                wtr.write((v0 >> al) & 1, 1)

        if interleaved:
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in comp_ids:
                        sh, sv = sampling[ci]
                        for v in range(sv):
                            for hh in range(sh):
                                one(ci, my * sv + v, mx * sh + hh)
        else:
            ci = comp_ids[0]
            nbh, nbw = nbdims[ci]
            for by in range(nbh):
                for bx in range(nbw):
                    one(ci, by, bx)
        wtr.flush()
        return wtr.out

    def ac_first_scan(ci, ss, se, al):
        wtr = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, length = ac_tab[r << 4]
                wtr.write(code, length)
                if r:
                    wtr.write(eobrun - (1 << r), r)
                eobrun = 0

        nbh, nbw = nbdims[ci]
        for by in range(nbh):
            for bx in range(nbw):
                band = coefs[ci][by, bx, ss : se + 1]
                vals = [
                    (int(v) >> al) if v >= 0 else -((-int(v)) >> al)
                    for v in band
                ]
                if not any(vals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                last_nz = max(i for i, v in enumerate(vals) if v)
                for i, v in enumerate(vals):
                    if i > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_tab[0xF0]
                        wtr.write(code, length)
                        run -= 16
                    size, bits = _magnitude(v)
                    code, length = ac_tab[(run << 4) | size]
                    wtr.write(code, length)
                    wtr.write(bits, size)
                    run = 0
                if last_nz < len(vals) - 1:
                    eobrun += 1  # trailing zeros -> EOB (run-merged)
        flush_eob()
        wtr.flush()
        return wtr.out

    def ac_refine_scan(ci, ss, se, al):
        wtr = _BitWriter()
        eobrun = 0
        br_buf: list[int] = []  # correction bits across the EOB run

        def flush_eob():
            nonlocal eobrun, br_buf
            if eobrun:
                r = eobrun.bit_length() - 1
                code, length = ac_tab[r << 4]
                wtr.write(code, length)
                if r:
                    wtr.write(eobrun - (1 << r), r)
                for b in br_buf:
                    wtr.write(b, 1)
                br_buf = []
                eobrun = 0

        nbh, nbw = nbdims[ci]
        for by in range(nbh):
            for bx in range(nbw):
                band = [int(v) for v in coefs[ci][by, bx, ss : se + 1]]
                t = [abs(v) >> al for v in band]
                eobpos = max(
                    (i for i, x in enumerate(t) if x == 1), default=-1
                )
                if eobpos == -1:
                    # nothing newly significant: whole band folds into
                    # the EOB run (corrections buffered in band order)
                    br_buf.extend(x & 1 for x in t if x > 1)
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                pend: list[int] = []
                for i, x in enumerate(t):
                    if x == 0:
                        run += 1
                        continue
                    # ZRL splitting happens at ANY nonzero (libjpeg
                    # semantics): corrections after the split stay
                    # pending for the next symbol
                    while run > 15 and i <= eobpos:
                        code, length = ac_tab[0xF0]
                        wtr.write(code, length)
                        for b in pend:
                            wtr.write(b, 1)
                        pend = []
                        run -= 16
                    if x > 1:
                        pend.append(x & 1)
                        continue
                    code, length = ac_tab[(run << 4) | 1]
                    wtr.write(code, length)
                    wtr.write(1 if band[i] > 0 else 0, 1)
                    for b in pend:
                        wtr.write(b, 1)
                    pend = []
                    run = 0
                if run > 0 or pend:
                    eobrun += 1
                    br_buf.extend(pend)
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        wtr.flush()
        return wtr.out

    # ---- scan script (libjpeg default shape) ----
    if ncomp == 3:
        script = [
            ("dc_first", [0, 1, 2], 0, 0, 0, 1),
            ("ac_first", [0], 1, 5, 0, 2),
            ("ac_first", [1], 1, 63, 0, 1),
            ("ac_first", [2], 1, 63, 0, 1),
            ("ac_first", [0], 6, 63, 0, 2),
            ("ac_refine", [0], 1, 63, 2, 1),
            ("dc_refine", [0, 1, 2], 0, 0, 1, 0),
            ("ac_refine", [1], 1, 63, 1, 0),
            ("ac_refine", [2], 1, 63, 1, 0),
            ("ac_refine", [0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ("dc_first", [0], 0, 0, 0, 1),
            ("ac_first", [0], 1, 63, 0, 1),
            ("dc_refine", [0], 0, 0, 1, 0),
            ("ac_refine", [0], 1, 63, 1, 0),
        ]

    seg = _seg

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(int(x) for x in qy.reshape(64)[_ZIGZAG]))
    if ncomp == 3:
        out += seg(
            0xFFDB, b"\x01" + bytes(int(x) for x in qc.reshape(64)[_ZIGZAG])
        )
    comps = b""
    for ci in range(ncomp):
        sh, sv = sampling[ci]
        comps += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xFFC2, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    for cls, tid, (bits, vals) in (
        [(0, 0, _STD_DC_LUM), (1, 0, _FULL_AC_TABLE)]
        + ([(0, 1, _STD_DC_CHR)] if ncomp == 3 else [])
    ):
        out += seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    for kind, comp_ids, ss, se, ah, al in script:
        if kind == "dc_first" or kind == "dc_refine":
            data = dc_scan(comp_ids, ah, al)
        elif kind == "ac_first":
            data = ac_first_scan(comp_ids[0], ss, se, al)
        else:
            data = ac_refine_scan(comp_ids[0], ss, se, al)
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            dc_id = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (dc_id << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, sos)
        out += data
    out += b"\xff\xd9"
    return bytes(out)
