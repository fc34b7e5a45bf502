"""Bloom-filter primitives (sources/bloom.py): determinism, the
no-false-negative guarantee, sizing bounds, type gating, and the
sidecar round-trip. Pure Python/numpy — no Spark session."""

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hamerkop_spark.sources import bloom


def test_build_and_probe_no_false_negatives():
    keys = [f"https://s{i % 7}.ex/p/{i}" for i in range(5000)]
    m, k, n, packed, vtag = bloom.build(keys)
    assert n == 5000
    assert len(packed) == m // 8
    for key in keys[::37]:
        assert bloom.might_contain(packed, m, k, key)


def test_false_positive_rate_near_design_point():
    keys = [f"k{i}" for i in range(20000)]
    m, k, n, packed, vtag = bloom.build(keys)
    probes = [f"absent{i}" for i in range(20000)]
    fp = sum(bloom.might_contain(packed, m, k, p) for p in probes)
    assert fp / len(probes) < 0.03  # designed for ~1%


def test_determinism_across_calls():
    keys = ["a", "b", "c", "Ünïcode ✓", "x" * 500]
    assert bloom.build(keys) == bloom.build(list(keys))


def test_int_and_str_normalization_agree():
    m, k, n, packed, vtag = bloom.build([5, 42, 1000000007])
    assert bloom.might_contain(packed, m, k, 42)
    assert bloom.might_contain(packed, m, k, "42")  # str(int) parity


def test_unsupported_types_skipped_on_build_kept_on_probe():
    assert bloom.build([None, 1.5, True, b"raw"]) is None
    m, k, n, packed, vtag = bloom.build(["x"])
    # unsupported literal: nothing provable -> must keep the file
    assert bloom.might_contain(packed, m, k, 1.5)
    assert bloom.might_contain(packed, m, k, True)
    assert bloom.might_contain(packed, m, k, None)


def test_any_might_contain_semantics():
    m, k, n, packed, vtag = bloom.build(["p", "q"])
    assert bloom.any_might_contain(packed, m, k, ["definitely-not", "q"])
    assert bloom.any_might_contain(packed, m, k, [])  # vacuous: keep
    absent = [f"no{i}" for i in range(50)]
    present = [a for a in absent
               if bloom.any_might_contain(packed, m, k, [a])]
    # tiny filter over 2 keys: essentially no false positives
    assert len(present) <= 2
    assert not bloom.any_might_contain(packed, m, k, absent) or present


def test_size_bounds():
    m, k = bloom.size_for(1)
    assert m == 1 << 10 and 1 <= k <= 16
    m, k = bloom.size_for(10**9)
    assert m == 1 << 23 and k >= 1
    m, k = bloom.size_for(100_000)
    assert m % 8 == 0 and (1 << 10) <= m <= (1 << 23)


def test_sidecar_roundtrip(tmp_path):
    m, k, n, packed, vtag = bloom.build([f"u{i}" for i in range(100)])
    p = str(tmp_path / "_blooms" / "f.parquet.url.bf")
    bloom.write_sidecar(p, packed)
    assert bloom.read_sidecar(p) == packed
    assert os.path.getsize(p) <= len(packed) + 64  # zlib never blows up


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.text(max_size=40),
                          st.integers(-2**62, 2**62)),
                min_size=1, max_size=200))
def test_property_every_built_key_is_contained(keys):
    built = bloom.build(keys)
    assert built is not None
    m, k, n, packed, vtag = built
    for key in keys:
        assert bloom.might_contain(packed, m, k, key)


def test_positions_use_full_bitmap():
    # distribution sanity: 10k keys at ~1% fpp set a predictable
    # fraction of bits (1 - e^{-kn/m}), catching any masking bug that
    # would quietly confine positions to a sub-range
    keys = [f"z{i}" for i in range(10000)]
    m, k, n, packed, vtag = bloom.build(keys)
    bits = np.unpackbits(np.frombuffer(packed, dtype=np.uint8), count=m)
    frac = bits.mean()
    expect = 1.0 - np.exp(-k * n / m)
    assert abs(frac - expect) < 0.05
    # and both halves of the bitmap are populated
    assert bits[: m // 2].any() and bits[m // 2:].any()


def test_vtag_gates_mistyped_literals():
    """Spark compares a mistyped literal through implicit casts
    ('0501' = 501L is TRUE) that str()-hashing cannot mirror — the
    probe must refuse to prune on a literal whose type differs from
    the build side's."""
    m, k, n, packed, vtag = bloom.build([501, 7])
    assert vtag == "int"
    # same-type probing still proves absence/presence
    assert bloom.might_contain(packed, m, k, 501, vtag=vtag)
    assert not bloom.might_contain(packed, m, k, 9999, vtag=vtag)
    # mistyped literal: '0501' casts to 501 in Spark -> must keep
    assert bloom.might_contain(packed, m, k, "0501", vtag=vtag)
    assert bloom.might_contain(packed, m, k, "501", vtag=vtag)
    m2, k2, n2, packed2, vtag2 = bloom.build(["042", "x"])
    assert vtag2 == "str"
    # int literal vs string column: '042' = 42 is TRUE in Spark
    assert bloom.might_contain(packed2, m2, k2, 42, vtag=vtag2)
    # numpy ints count as ints on both sides
    assert bloom.value_tag(np.int64(5)) == "int"
    assert bloom.might_contain(packed, m, k, np.int64(501), vtag="int")


def test_probe_indexes_packed_bytes_directly():
    """The probe must agree with a full unpackbits readout (MSB-first
    packing) — guards the byte/bit indexing arithmetic."""
    keys = [f"key{i}" for i in range(997)]
    m, k, n, packed, vtag = bloom.build(keys)
    bits = np.unpackbits(
        np.frombuffer(packed, dtype=np.uint8), count=m
    ).astype(bool)
    probes = keys[::13] + [f"miss{i}" for i in range(200)]
    for pr in probes:
        pos = bloom._positions(bloom._hash64([pr]), m, k)
        expect = bool(bits[pos].all())
        assert bloom.might_contain(packed, m, k, pr, vtag="str") == expect
