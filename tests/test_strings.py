"""Parity tests for functions/strings.py against the reference semantics
(hamerkop/string.py) — expected values computed per the documented Python
behavior (mirrors tests/test_string.py in the reference)."""

import string as pystring

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.functions import strings as S


def one(spark, col_expr, value):
    return spark.createDataFrame([(value,)], "s string").select(
        col_expr(F.col("s")).alias("out")
    ).collect()[0]["out"]


def test_remove_punct(spark):
    assert one(spark, S.remove_punct, "a.b,c!") == "abc"
    # full ASCII punct table
    assert one(spark, S.remove_punct, pystring.punctuation) == ""


def test_replace_punct_strips(spark):
    # punct -> space then strip (string.py:41-44)
    assert one(spark, S.replace_punct, ".a-b.") == "a b"


def test_unicode_punct(spark):
    # «» are category Pi/Pf, ។ is khmer sign (Po)
    assert one(spark, S.remove_unicode_punct, "«a»b។") == "ab"
    # '«a»b'.translate(punct->space).strip() == 'a b'
    assert one(spark, S.replace_unicode_punct, "«a»b") == "a b"
    # interior double space preserved (no collapsing): 'a«»b' -> 'a  b'
    assert one(spark, S.replace_unicode_punct, "a«»b") == "a  b"


def test_remove_emojis(spark):
    assert one(spark, S.remove_emojis, "hi 😀 there 🚀") == "hi  there "


def test_normalize_smart_punct(spark):
    assert one(spark, S.normalize_smart_punct, "‘a’ “b” — c…") == "'a' \"b\" - c."


def test_single_space(spark):
    assert one(spark, S.single_space, "a \t b\n\nc") == "a b c"


def test_remove_double_letter(spark):
    assert one(spark, S.remove_double_letter, "aabbccdd ee") == "abcd e"
    assert one(spark, S.remove_double_letter, "Mississippi") == "Misisipi"


@pytest.mark.parametrize(
    "s,n,expected",
    [
        ("abcd", 2, ["ab", "bc", "cd"]),
        ("abcd", 4, ["abcd"]),
        ("abc", 4, []),  # len < n -> empty (range semantics)
        ("", 2, []),
    ],
)
def test_char_ngrams(spark, s, n, expected):
    assert one(spark, lambda c: S.char_ngrams(c, n), s) == expected


def test_format_ngram_name(spark):
    # kb.py:260-264: replace_unicode_punct -> lower -> '_'.join(split(' '))
    assert one(spark, S.format_ngram_name, "New York") == "_new_york_"
    assert one(spark, S.format_ngram_name, "O'Brien") == "_o_brien_"


def test_acronym_initials(spark):
    assert one(spark, S.acronym_initials, "United Nations") == "UN"
    assert one(spark, S.acronym_initials, "united nations org") == "UNO"


def test_wikipedia_link(spark):
    # features.py:137-141: space->_, smart quote->ascii, urllib.quote
    import urllib.parse

    for name in ["New York", "O’Brien", "Côte d'Ivoire", "A&B Co"]:
        expected = "http://en.wikipedia.org/wiki/" + urllib.parse.quote(
            name.replace(" ", "_").replace("’", "'")
        )
        assert one(spark, S.wikipedia_link, name) == expected


def test_doc_type(spark):
    assert one(spark, S.doc_type_from_id, "IL5_SN_x") == "twitter"
    assert one(spark, S.doc_type_from_id, "IL5_NW_x") == "newswire"
    assert one(spark, S.doc_type_from_id, "IL5_WL_x") == "blog"
    assert one(spark, S.doc_type_from_id, "nomatch") is None


def test_entity_origin(spark):
    assert one(spark, S.entity_origin, "GEO") == "geonames"
    assert one(spark, S.entity_origin, "AUG-FOO") == "augmentation"
    assert one(spark, S.entity_origin, "geonames") == "geonames"
    assert one(spark, S.entity_origin, "XXX") is None


def test_token_count(spark):
    assert one(spark, S.token_count, "a b  c") == 3
    assert one(spark, S.token_count, "  ") == 0
