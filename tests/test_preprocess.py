"""Preprocessor parity tests (mirrors reference tests/test_preprocessor.py
cases, re-stated over the mentions DataFrame)."""

from pyspark.sql import functions as F

from hamerkop_spark.operators import preprocess as P

COLS = "mention_id string, doc_id string, string string, type string, doc_type string"


def mk(spark, rows):
    return spark.createDataFrame(rows, COLS)


def strings(df):
    return sorted(r["string"] for r in df.collect())


def test_type_validator(spark):
    df = mk(spark, [("m1", "d", "a", "PER", "newswire"),
                    ("m2", "d", "b", "DOG", "newswire")])
    out = P.type_validator(df)
    assert strings(out) == ["a"]


def test_text_normalizer(spark):
    df = mk(spark, [("m1", "d", "‘quoted’ 😀text", "PER", "newswire")])
    assert strings(P.text_normalizer(df)) == ["'quoted' text"]


def test_garbage_remover(spark):
    df = mk(spark, [
        ("m1", "d", "www.foo.com", "PER", "newswire"),
        ("m2", "d", "see http: here", "PER", "newswire"),
        ("m3", "d", "https://x", "PER", "newswire"),
        ("m4", "d", "", "PER", "newswire"),
        ("m5", "d", "keep me", "PER", "newswire"),
    ])
    assert strings(P.garbage_remover(df)) == ["keep me"]


def test_fix_type(spark):
    df = mk(spark, [("m1", "d", "al-Qaeda", "PER", "newswire"),
                    ("m2", "d", "other", "PER", "newswire")])
    out = P.fix_type({"al-qaeda": "ORG"})(df)
    assert sorted((r["string"], r["type"]) for r in out.collect()) == [
        ("al-Qaeda", "ORG"), ("other", "PER")]


def test_too_long_mention_remover(spark):
    # reference counts spaces: keep iff count(' ') < max (preprocessor.py:239-241)
    df = mk(spark, [
        ("m1", "d", "a b c d e f", "PER", "newswire"),   # 5 spaces -> keep
        ("m2", "d", "a b c d e f g", "PER", "newswire"),  # 6 spaces -> drop
    ])
    assert strings(P.too_long_mention_remover(6)(df)) == ["a b c d e f"]


def test_blacklist_ci(spark):
    df = mk(spark, [("m1", "d", "BadName", "PER", "newswire"),
                    ("m2", "d", "Good", "PER", "newswire")])
    assert strings(P.blacklist(["badname"])(df)) == ["Good"]


def test_acronym_replacer(spark):
    df = mk(spark, [("m1", "d", "UN", "ORG", "newswire"),
                    ("m2", "d", "un", "ORG", "newswire")])
    out = P.acronym_replacer({"UN": "United Nations"})(df)
    assert strings(out) == ["United Nations", "un"]
    out_ci = P.acronym_replacer({"UN": "United Nations"}, ci=True)(df)
    assert strings(out_ci) == ["United Nations", "United Nations"]


def test_name_stemmer(spark):
    df = mk(spark, [("m1", "d", "Running Dogs", "PER", "newswire")])
    out = P.name_stemmer({"running": "run", "dogs": "dog"})(df)
    assert strings(out) == ["run dog"]


def test_dict_translator(spark):
    df = mk(spark, [("m1", "d", "Bonjour", "PER", "newswire")])
    out = P.dict_translator({"bonjour": "Hello"})(df)
    assert out.collect()[0]["translate_string"] == "Hello"


def test_twitter_username_replacer(spark):
    df = mk(spark, [
        ("m1", "d", "@nytimes", "ORG", "twitter"),
        ("m2", "d", "@nytimes.", "ORG", "twitter"),     # trailing punct chopped
        ("m3", "d", "@nytimes", "ORG", "newswire"),     # not a tweet: untouched
        ("m4", "d", "@unknown", "ORG", "twitter"),      # not in map: untouched
    ])
    out = P.twitter_username_replacer({"nytimes": "New York Times"})(df)
    got = {r["mention_id"]: r["string"] for r in out.collect()}
    assert got == {
        "m1": "New York Times",
        "m2": "New York Times",
        "m3": "@nytimes",
        "m4": "@unknown",
    }


def test_twitter_hashtag(spark):
    df = mk(spark, [
        ("m1", "d", "#NewYorkCity", "GPE", "twitter"),
        ("m2", "d", "#lowercase", "GPE", "twitter"),
        ("m3", "d", "NoHash", "GPE", "twitter"),
    ])
    out = P.twitter_hashtag_processor(df)
    got = {r["mention_id"]: r["string"] for r in out.collect()}
    assert got == {"m1": "New York City", "m2": "lowercase", "m3": "NoHash"}


def test_cascade_composition(spark):
    df = mk(spark, [("m1", "d", "‘www.spam’", "PER", "newswire"),
                    ("m2", "d", "Keep", "PER", "newswire")])
    op = P.cascade(P.text_normalizer, P.garbage_remover)
    assert strings(op(df)) == ["Keep"]
