"""Property-based tests (hypothesis) for the round-2 scalar functions:
Double Metaphone, the extended romanizer, and language detection are
total, deterministic functions over arbitrary unicode input — they run
inside Arrow batches on executors, so an exception on any input is a
stage failure at scale."""

from __future__ import annotations

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from hamerkop_spark.functions.phonetic import (
    double_metaphone_py,
    metaphone_py,
    nysiis_py,
)
from hamerkop_spark.functions.translit import romanize_py

TEXT = st.text(max_size=60)
NAMES = st.text(
    alphabet=st.characters(codec="utf-8", categories=("L", "Zs", "P", "N")),
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_double_metaphone_total_and_deterministic(s):
    p1 = double_metaphone_py(s)
    p2 = double_metaphone_py(s)
    assert p1 == p2
    pri, sec = p1
    allowed = set("ABCDEFGHIJKLMNOPQRSTUVWXYZ0'")
    assert set(pri) <= allowed and set(sec) <= allowed
    assert len(pri) <= 8 and len(sec) <= 8


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_phonetic_keys_total(s):
    assert nysiis_py(s) == nysiis_py(s)
    assert metaphone_py(s) == metaphone_py(s)


@settings(max_examples=300, deadline=None)
@given(NAMES)
def test_romanize_total_and_deterministic(s):
    r1 = romanize_py(s)
    assert r1 == romanize_py(s)
    # no combining marks and no ZWJ/ZWNJ survive
    assert not any(unicodedata.combining(ch) for ch in r1)
    assert "‌" not in r1 and "‍" not in r1


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=40))
def test_romanize_ascii_fixpoint(s):
    # printable ASCII is already Latin: romanization must not touch it
    assert romanize_py(s) == s


@settings(max_examples=200, deadline=None)
@given(NAMES)
def test_romanize_idempotent(s):
    # romanizing a romanized string changes nothing: the output of every
    # mapped script is Latin/ASCII, which maps to itself
    once = romanize_py(s)
    assert romanize_py(once) == once
