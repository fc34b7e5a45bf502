"""Pairwise feature parity (mirrors reference tests/test_features.py)."""

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.operators import features as FE

PAIR_SCHEMA = (
    "doc_id string, chain_id string, entity_id string, "
    "chain_type string, chain_name string, chain_names array<string>, "
    "chain_all_strings array<string>, entity_names array<string>, "
    "entity_urls array<string>, origin string, geo_country string, "
    "per_location string, org_location string"
)


def mk_pair(spark, chain_names, entity_names, urls=None, origin="geonames",
            all_strings=None, geo_country=None, per_location=None):
    row = (
        "d1", "c1", "E1", "PER", chain_names[0], chain_names,
        all_strings or chain_names, entity_names, urls or [], origin,
        geo_country, per_location, None,
    )
    return spark.createDataFrame([row], PAIR_SCHEMA)


def val(df, col):
    # feature exprs consume the derived normalization columns that
    # build_pairs precomputes per side; add them here like any caller
    # bypassing build_pairs must
    return FE.ensure_derived(df).select(col.alias("v")).collect()[0]["v"]


def test_origin_feature(spark):
    assert val(mk_pair(spark, ["x"], ["x"], origin="geonames"), FE.origin_feature()) == 1.0
    assert val(mk_pair(spark, ["x"], ["x"], origin="cia world orgs"), FE.origin_feature()) == 0.0
    assert val(mk_pair(spark, ["x"], ["x"], origin="augmentation"), FE.origin_feature()) == 1.0


def test_in_country(spark):
    assert val(mk_pair(spark, ["x"], ["x"], geo_country="ET"), FE.in_country_feature("ET")) == 1.0
    assert val(mk_pair(spark, ["x"], ["x"], per_location="US", geo_country="ET"),
               FE.in_country_feature("US")) == 1.0
    assert val(mk_pair(spark, ["x"], ["x"]), FE.in_country_feature("ET")) == 0.0


def test_prominence_features(spark):
    df = mk_pair(spark, ["x"], ["a", "b", "c"], urls=["u1"])
    assert val(df, FE.number_of_names_feature()) == pytest.approx(1 - 1 / 4)
    assert val(df, FE.number_of_links_feature()) == pytest.approx(1 - 1 / 2)


def test_exact_match_feature_ci(spark):
    assert val(mk_pair(spark, ["John SMITH"], ["john smith"]), FE.exact_match_feature()) == 1.0
    assert val(mk_pair(spark, ["John"], ["Johnny"]), FE.exact_match_feature()) == 0.0


def test_wikipedia_feature(spark):
    df = mk_pair(spark, ["New York"],
                 ["x"], urls=["HTTP://en.wikipedia.org/wiki/New_York"])
    assert val(df, FE.wikipedia_feature()) == 1.0
    df2 = mk_pair(spark, ["New York"], ["x"], urls=["http://other.org"])
    assert val(df2, FE.wikipedia_feature()) == 0.0


def test_shared_tokens(spark):
    # chain 'a b', entity 'b c': |{b}| / |{a,b}| = 0.5 (features.py:156-171)
    assert val(mk_pair(spark, ["a b"], ["b c"]), FE.shared_tokens_feature()) == pytest.approx(0.5)
    # max over pairs
    assert val(mk_pair(spark, ["a b", "b"], ["b c"]), FE.shared_tokens_feature()) == pytest.approx(1.0)
    assert val(mk_pair(spark, ["x"], ["y"]), FE.shared_tokens_feature()) == 0.0


def test_last_name_feature(spark):
    # both multi-token sharing last token (lowercased compare)
    assert val(mk_pair(spark, ["John Smith"], ["Jane SMITH"]), FE.last_name_feature()) == 1.0
    # single-token names never count (features.py:183-186)
    assert val(mk_pair(spark, ["Smith"], ["Jane Smith"]), FE.last_name_feature()) == 0.0
    assert val(mk_pair(spark, ["John Smith"], ["John Jones"]), FE.last_name_feature()) == 0.0


def test_levenshtein_feature(spark):
    # min over pairs of dist/max(len): 'abcd' vs 'abcx' = 1/4
    assert val(mk_pair(spark, ["abcd"], ["abcx"]), FE.levenshtein_feature()) == pytest.approx(0.25)
    assert val(mk_pair(spark, ["abcd", "zzzz"], ["abcd"]), FE.levenshtein_feature()) == 0.0
    # CI: 'ABCD' vs 'abcd' -> 0
    assert val(mk_pair(spark, ["ABCD"], ["abcd"]), FE.levenshtein_feature()) == 0.0


def test_extract_features_assembles_vector(spark):
    df = FE.extract_features(mk_pair(spark, ["John Smith"], ["John Smith"]))
    row = df.collect()[0]
    assert row["f_exact_match"] == 1.0
    assert len(row["features"]) == len(FE.STANDARD_FEATURES)
