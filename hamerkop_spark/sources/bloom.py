"""Per-file Bloom filters for manifest-level point-lookup skipping.

``order_by`` (catalog.py) makes min/max bounds disjoint so range scans
prune, but an APPEND-ONLY stream cannot globally sort: every commit's
files span roughly the full key range and a point lookup on a
high-cardinality key (``url``) survives min/max pruning in every file.
Iceberg's answer is a per-file Bloom filter carried in a sidecar
(puffin) file; this is that idea at the same granularity. A membership
test that returns False PROVES the key is absent from the file, so
``=`` / ``in`` filters prune files whose blooms reject every literal —
false positives only cost an extra file read, never correctness.

Hashing is ``pandas.util.hash_array`` (SipHash-1-3 with pandas' fixed
default key) over the str() of each value — deterministic across
processes (unlike builtin ``hash``), vectorized in C, and identical on
the build side (column values) and probe side (filter literals).
The two 32-bit halves of the 64-bit hash drive Kirsch-Mitzenmacher
double hashing: ``pos_i = (h1 + i*h2) % m`` — the standard trick giving
k independent-enough probes from one hash evaluation.

Scale note: blooms are built driver-side from the freshly written
files (same caveat as the footer-stats pass in catalog.py — at real
cluster scale both run inside the write tasks; the FORMAT, and every
probe-side guarantee, is identical either way). Size is bounded:
``m <= _M_CAP`` bits (1 MiB packed) per column per file; the sidecar is
zlib-compressed, and the manifest JSON carries only {m, k, n, path}.
"""

from __future__ import annotations

import os
import zlib

import numpy as np

# ~1% false-positive rate at the design point; m capped so a single
# column's bloom never exceeds 1 MiB packed per file (2^23 bits holds
# ~875k keys at the design FPR — a full-size crawl parquet file)
_FPP = 0.01
_M_CAP = 1 << 23  # bits
_M_MIN = 1 << 10
_K_CAP = 16

#: value types a bloom is built over. Anything else (floats, whose
#: str() formatting is repr-fragile; timestamps; binary) is skipped at
#: build time, which probe-side reads as "no bloom -> keep the file".
_SUPPORTED = (str, int)


def bloom_norm(v):
    """Normalize one value to the hashed representation, or None when
    the type is unsupported (build skips it; probe keeps the file).
    bool is excluded: str(True) != '1' while parquet/partition paths
    disagree on bool rendering — not worth the ambiguity for a 2-value
    column no one blooms."""
    if isinstance(v, bool) or not isinstance(v, _SUPPORTED):
        return None
    return v if isinstance(v, str) else str(v)


def _hash64(strs: list) -> np.ndarray:
    import pandas as pd

    arr = np.empty(len(strs), dtype=object)
    arr[:] = strs
    return pd.util.hash_array(arr, categorize=False)


def _positions(h64: np.ndarray, m: int, k: int) -> np.ndarray:
    h1 = h64 & np.uint64(0xFFFFFFFF)
    h2 = (h64 >> np.uint64(32)) | np.uint64(1)  # odd -> full-period step
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).ravel()


def size_for(n: int, fpp: float = _FPP) -> tuple[int, int]:
    """(m_bits, k) for n keys at the target false-positive rate,
    m rounded up to a byte multiple and clamped to [_M_MIN, _M_CAP]."""
    n = max(1, n)
    ln2 = float(np.log(2.0))
    m = int(np.ceil(-n * float(np.log(fpp)) / (ln2 * ln2)))
    m = max(_M_MIN, min(_M_CAP, (m + 7) // 8 * 8))
    k = max(1, min(_K_CAP, round(m / n * ln2)))
    return m, k


def value_tag(v) -> str | None:
    """'int' / 'str' for supported values, None otherwise. The tag is
    recorded at build time so the probe side can refuse literals of a
    DIFFERENT type: Spark compares a mistyped literal through implicit
    casts ('0501' = 501L is TRUE; '042' = 42 vs a string column is
    TRUE), which str()-of-literal hashing cannot reproduce — hashing it
    anyway would prune files that match after the cast."""
    if isinstance(v, bool):
        return None
    if isinstance(v, str):
        return "str"
    if isinstance(v, (int, np.integer)):
        return "int"
    return None


def build(values) -> tuple[int, int, int, bytes, str] | None:
    """Build a bloom over an iterable of column values (nulls and
    unsupported types are dropped). Returns (m, k, n_hashed,
    packed_bits, vtag) or None when nothing hashable remains."""
    strs = [s for v in values if v is not None
            for s in (bloom_norm(v),) if s is not None]
    if not strs:
        return None
    vtag = next(
        t for v in values for t in (value_tag(v),) if t is not None
    )
    m, k = size_for(len(strs))
    bits = np.zeros(m, dtype=bool)
    bits[_positions(_hash64(strs), m, k)] = True
    return m, k, len(strs), np.packbits(bits).tobytes(), vtag


def any_might_contain(packed: bytes, m: int, k: int, values,
                      vtag: str | None = None) -> bool:
    """True unless the bloom PROVES every literal absent — the file-
    survival test for ``col IN (values)`` (and ``=`` as a 1-list). Any
    unsupported literal, or one whose type differs from the build-side
    ``vtag`` (Spark would compare it through an implicit cast the
    str() hash cannot mirror), returns True: nothing provable.

    Probes index the packed bytes directly — no bitmap unpack — so a
    plan touching hundreds of files tests k*len(values) bits per file
    instead of allocating an m-bool array per probe."""
    strs = []
    for v in values:
        if vtag is not None and value_tag(v) != vtag:
            return True
        s = bloom_norm(v)
        if s is None:
            return True
        strs.append(s)
    if not strs:
        return True
    buf = np.frombuffer(packed, dtype=np.uint8)
    pos = _positions(_hash64(strs), m, k).reshape(k, len(strs))
    byte = pos >> np.uint64(3)
    bit = (buf[byte] >> (np.uint64(7) - (pos & np.uint64(7)))) & 1
    # packbits is MSB-first: bit index b of the bitmap lives at
    # byte b>>3, mask 1 << (7 - (b & 7)) — round-trip tested
    return bool((bit != 0).all(axis=0).any())


def might_contain(packed: bytes, m: int, k: int, value,
                  vtag: str | None = None) -> bool:
    """True unless the bloom PROVES absence of this one value."""
    return any_might_contain(packed, m, k, [value], vtag)


def write_sidecar(path: str, packed: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(zlib.compress(packed))
    os.replace(tmp, path)


def read_sidecar(path: str) -> bytes:
    with open(path, "rb") as fh:
        return zlib.decompress(fh.read())
