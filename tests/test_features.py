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


def test_token_jaccard_feature(spark):
    # chain {a,b}, entity {b,c}: |{b}| / |{a,b,c}| = 1/3
    assert val(
        mk_pair(spark, ["a b"], ["b c"]), FE.token_jaccard_feature()
    ) == pytest.approx(1 / 3)
    # multi-name sides flatten to one set: {a,b} vs {a,b} -> 1.0
    assert val(
        mk_pair(spark, ["a", "b"], ["a b"]), FE.token_jaccard_feature()
    ) == pytest.approx(1.0)
    assert val(mk_pair(spark, ["x"], ["y"]), FE.token_jaccard_feature()) == 0.0


def test_hashed_embedding_deterministic_and_discriminative(spark):
    from hamerkop_spark.functions.embed import add_hashed_embedding
    from hamerkop_spark.functions.textdist import cosine_native

    df = spark.createDataFrame(
        [("john smith",), ("john smith",), ("john smyth",), ("acme corp",)],
        "name string",
    )
    out = add_hashed_embedding(df, "name", "emb", dim=32).collect()
    assert out[0]["emb"] == out[1]["emb"]  # deterministic
    assert len(out[0]["emb"]) == 32

    pairs = spark.createDataFrame(
        [("john smith", "john smyth"), ("john smith", "acme corp")],
        "a string, b string",
    )
    pairs = add_hashed_embedding(pairs, "a", "ea", dim=32)
    pairs = add_hashed_embedding(pairs, "b", "eb", dim=32)
    sims = [
        r["cos"]
        for r in pairs.select(
            cosine_native(F.col("ea"), F.col("eb")).alias("cos")
        ).collect()
    ]
    assert sims[0] > 0.5 > sims[1]  # near-dup >> unrelated
    # self-cosine is exactly 1
    same = add_hashed_embedding(
        spark.createDataFrame([("x y z",)], "a string"), "a", "e", dim=32
    )
    assert same.select(
        cosine_native(F.col("e"), F.col("e")).alias("c")
    ).collect()[0]["c"] == pytest.approx(1.0)


def test_extended_features_end_to_end(spark):
    """build_pairs(embeddings=True) + EXTENDED_FEATURES: per-side emb
    columns exist below the join and the two extra features assemble."""
    chains = spark.createDataFrame(
        [("d1", "c1", "PER", "John Smith", ["John Smith"], ["John Smith"])],
        "doc_id string, chain_id string, type string, name string, "
        "names array<string>, all_strings array<string>",
    )
    cands = spark.createDataFrame(
        [("d1", "c1", "E1")], "doc_id string, chain_id string, entity_id string"
    )
    kb = spark.createDataFrame(
        [("E1", ["John Smyth"], [], "WLL", None, None, None)],
        "entity_id string, names array<string>, urls array<string>, "
        "origin string, geo_country string, per_location string, "
        "org_location string",
    )
    pairs = FE.build_pairs(chains, cands, kb, embeddings=True)
    scored = FE.extract_features(pairs, features=FE.EXTENDED_FEATURES)
    row = scored.collect()[0]
    # {john,smith} vs {john,smyth}: 1 shared / 3 in union
    assert row["f_token_jaccard"] == pytest.approx(1 / 3)
    assert 0.5 < row["f_emb_cosine"] < 1.0
    assert len(row["features"]) == len(FE.EXTENDED_FEATURES)


def test_hashed_embedding_plan_hashes_each_gram_once(spark):
    """Regression lock for the lambda-CSE trap: the optimized plan must
    contain exactly the two xxhash64 call sites (bucket + sign) inside
    the per-gram transform — NOT dim copies inlined into a
    per-dimension lambda (the collapsed-projection failure mode)."""
    from hamerkop_spark.functions.embed import add_hashed_embedding

    df = spark.createDataFrame([("john smith",)], "name string")
    out = add_hashed_embedding(df, "name", "emb", dim=32)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("xxhash64") == 2, plan


def test_monge_elkan_matches_scalar_oracle(spark):
    from hamerkop_spark.functions.textdist import monge_elkan_py, monge_elkan_udf

    cases = [
        (["jon", "q", "smith"], ["smith", "jonathan"]),
        (["acme", "corp"], ["acme", "corp"]),
        (["a"], ["b"]),
        ([], ["x"]),
        (["kitten", "sitting"], ["sitting", "kitten", "mitten"]),
        (["new", "york", "city"], ["york", "new"]),
    ]
    df = spark.createDataFrame(cases, "xs array<string>, ys array<string>")
    got = [
        r["me"]
        for r in df.select(monge_elkan_udf("xs", "ys").alias("me")).collect()
    ]
    for (xs, ys), g in zip(cases, got):
        assert abs(g - monge_elkan_py(xs, ys)) < 1e-12, (xs, ys, g)
    # identical token sets score 1.0; disjoint unlike tokens score low
    assert got[1] == 1.0
    assert got[3] == 0.0


def test_monge_elkan_feature_in_extended_bundle(spark):
    from hamerkop_spark.operators.features import EXTENDED_FEATURES

    assert "f_monge_elkan" in EXTENDED_FEATURES


def test_monge_elkan_lev_pairs_matches_scalar(spark):
    """monge_elkan_lev_pairs (JVM-native, integer micro) vs a scalar
    recomputation with the same floor-division arithmetic."""
    from hamerkop_spark.functions.textdist import levenshtein_py
    from hamerkop_spark.operators.features import monge_elkan_lev_pairs

    cases = [
        (1, ["jon", "q", "smith"], ["smith", "jonathan"]),
        (2, ["acme", "corp"], ["acme", "corp"]),
        (3, ["a"], ["b"]),
        (4, ["kitten", "sitting"], ["sitting", "kitten", "mitten"]),
        (5, ["new", "york", "city"], ["york", "new"]),
        (6, ["dup", "dup", "x"], ["dup"]),  # array_distinct on both sides
        (7, [""], ["x"]),  # empty tokens dropped -> pair vanishes
    ]
    df = spark.createDataFrame(
        cases, "pid bigint, q_toks array<string>, c_toks array<string>"
    )
    got = {
        r["pid"]: r["me_micro"]
        for r in monge_elkan_lev_pairs(df, ["pid"]).collect()
    }

    def micro(a, b):
        big = max(len(a), len(b))
        return ((big - levenshtein_py(a, b)) * 1_000_000) // big

    for pid, xs, ys in cases:
        xs = [x for x in dict.fromkeys(xs) if x]
        ys = [y for y in dict.fromkeys(ys) if y]
        if not xs or not ys:
            assert pid not in got, (pid, got.get(pid))
            continue
        best = [max(micro(x, y) for y in ys) for x in xs]
        want = sum(best) // len(best)
        assert got[pid] == want, (pid, got[pid], want)
    assert got[2] == 1_000_000  # identical sets
    assert got[3] == 0  # fully unlike single tokens


def test_monge_elkan_randomized_vs_scalar(spark):
    import random

    from hamerkop_spark.functions.textdist import monge_elkan_py, monge_elkan_udf

    rng = random.Random(42)
    vocab = ["smith", "smyth", "jon", "john", "acme", "corp", "x", "ü", ""]
    cases = [
        (
            [rng.choice(vocab) for _ in range(rng.randrange(0, 5))],
            [rng.choice(vocab) for _ in range(rng.randrange(0, 5))],
        )
        for _ in range(120)
    ]
    df = spark.createDataFrame(cases, "xs array<string>, ys array<string>")
    got = [
        r["me"]
        for r in df.select(monge_elkan_udf("xs", "ys").alias("me")).collect()
    ]
    for (xs, ys), g in zip(cases, got):
        want = monge_elkan_py([x.lower() for x in xs], [y.lower() for y in ys])
        assert abs(g - want) < 1e-12, (xs, ys, g, want)
