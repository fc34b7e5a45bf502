"""Resolver semantics (mirrors reference tests/test_resolver.py:
one/many/none narrowing, cascade, edit-distance threshold, linear+NIL)."""

from hamerkop_spark.operators import resolve as R

PAIR_SCHEMA = (
    "doc_id string, chain_id string, entity_id string, "
    "chain_type string, chain_names array<string>, "
    "chain_all_strings array<string>, entity_names array<string>, "
    "entity_urls array<string>, source_rank int, retrieval_rank int"
)


def mk(spark, rows):
    """rows: (chain_id, entity_id, chain_names, entity_names, urls, s_rank, r_rank)"""
    data = [
        ("d1", c, e, "PER", cn, cn, en, u or [], sr, rr)
        for (c, e, cn, en, u, sr, rr) in rows
    ]
    return spark.createDataFrame(data, PAIR_SCHEMA)


def decided(decisions):
    return sorted((r["chain_id"], r["entity_id"]) for r in decisions.collect())


def test_first_resolver(spark):
    pairs = mk(spark, [
        ("c1", "E2", ["x"], ["y"], None, 1, 1),
        ("c1", "E1", ["x"], ["y"], None, 0, 1),  # earlier source wins
    ])
    d, rem = R.first_resolver(pairs)
    assert decided(d) == [("c1", "E1")]
    assert rem.count() == 0


def test_exact_name_one_match_selects(spark):
    pairs = mk(spark, [
        ("c1", "E1", ["John"], ["JOHN"], None, 0, 1),
        ("c1", "E2", ["John"], ["Jane"], None, 0, 2),
    ])
    d, rem = R.exact_name_resolver(pairs)
    assert decided(d) == [("c1", "E1")]
    assert rem.count() == 0  # decided chain leaves the pool


def test_exact_name_many_matches_narrows(spark):
    pairs = mk(spark, [
        ("c1", "E1", ["John"], ["john"], None, 0, 1),
        ("c1", "E2", ["John"], ["JOHN"], None, 0, 2),
        ("c1", "E3", ["John"], ["Jane"], None, 0, 3),
    ])
    d, rem = R.exact_name_resolver(pairs)
    assert decided(d) == []
    assert sorted(r["entity_id"] for r in rem.collect()) == ["E1", "E2"]


def test_exact_name_no_match_no_action(spark):
    pairs = mk(spark, [
        ("c1", "E1", ["John"], ["Jane"], None, 0, 1),
        ("c1", "E2", ["John"], ["Mary"], None, 0, 2),
    ])
    d, rem = R.exact_name_resolver(pairs)
    assert decided(d) == []
    assert rem.count() == 2


def test_edit_distance_threshold(spark):
    pairs = mk(spark, [
        ("c1", "E1", ["abcdefghij"], ["abcdefghix"], None, 0, 1),  # 0.1 -> NOT < 0.1
        ("c2", "E2", ["abcdefghijklmnopqrst"], ["abcdefghijklmnopqrsx"], None, 0, 1),  # 0.05
    ])
    d, rem = R.edit_distance_resolver(pairs, threshold=0.1)
    assert decided(d) == [("c2", "E2")]


def test_linear_resolver_nil(spark):
    pairs = mk(spark, [
        ("c1", "E1", ["John"], ["john"], None, 0, 1),    # exact -> high score
        ("c2", "E2", ["Alpha"], ["Omega"], None, 0, 1),  # no evidence -> NIL
    ])
    from pyspark.sql import functions as F

    from hamerkop_spark.operators.features import extract_features

    scored = extract_features(
        pairs.withColumn("chain_name", pairs.chain_names[0])
        .withColumn("origin", F.lit("geonames"))
        .withColumn("geo_country", F.lit(None).cast("string"))
        .withColumn("per_location", F.lit(None).cast("string"))
        .withColumn("org_location", F.lit(None).cast("string"))
    )
    resolver = R.linear_resolver({"f_exact_match": 1.0}, bias=0.0, threshold=0.5)
    d, rem = resolver(scored)
    assert decided(d) == [("c1", "E1")]


def test_cascade_resolver(spark):
    pairs = mk(spark, [
        ("c1", "E1", ["John"], ["john"], None, 0, 1),
        ("c2", "E2", ["abcdefghijklmnopqrst"], ["abcdefghijklmnopqrsx"], None, 0, 1),
        ("c3", "E3", ["Alpha"], ["Omega"], None, 0, 1),
    ])
    decisions = R.cascade_resolver(
        pairs,
        [R.exact_name_resolver, lambda p: R.edit_distance_resolver(p, 0.1)],
    )
    assert decided(decisions) == [("c1", "E1"), ("c2", "E2")]


def test_type_specific_gate(spark):
    pairs = mk(spark, [
        ("c1", "E1", ["John"], ["john"], None, 0, 1),
    ])
    gated = R.type_specific(R.exact_name_resolver, "ORG")
    d, rem = gated(pairs)
    assert decided(d) == []          # PER chain not touched by ORG-only stage
    assert rem.count() == 1


def test_edit_distance_margin_gate(spark):
    # c1: best 0.05, runner-up 0.10 -> gap 0.05 < margin 0.08 -> abstain
    # c2: single candidate at 0.05 -> no runner-up -> link
    pairs = mk(spark, [
        ("c1", "E1", ["abcdefghijklmnopqrst"], ["abcdefghijklmnopqrsx"], None, 0, 1),
        ("c1", "E2", ["abcdefghijklmnopqrst"], ["abcdefghijklmnopqrxx"], None, 0, 2),
        ("c2", "E3", ["abcdefghijklmnopqrst"], ["abcdefghijklmnopqrsx"], None, 0, 1),
    ])
    d, rem = R.edit_distance_resolver(pairs, threshold=0.2, margin=0.08)
    assert decided(d) == [("c2", "E3")]
    # without the margin both link (c1 by argmin)
    d0, _ = R.edit_distance_resolver(pairs, threshold=0.2)
    assert decided(d0) == [("c1", "E1"), ("c2", "E3")]


def test_linear_resolver_margin_gate(spark):
    from pyspark.sql import functions as F

    from hamerkop_spark.operators.features import extract_features

    pairs = mk(spark, [
        # c1: two exact-match candidates -> equal scores -> gap 0 -> abstain
        ("c1", "E1", ["John"], ["john"], None, 0, 1),
        ("c1", "E2", ["John"], ["john"], None, 0, 2),
        # c2: one exact candidate, one no-evidence -> big gap -> link
        ("c2", "E3", ["Mary"], ["mary"], None, 0, 1),
        ("c2", "E4", ["Mary"], ["Omega"], None, 0, 2),
    ])
    scored = extract_features(
        pairs.withColumn("chain_name", pairs.chain_names[0])
        .withColumn("origin", F.lit("geonames"))
        .withColumn("geo_country", F.lit(None).cast("string"))
        .withColumn("per_location", F.lit(None).cast("string"))
        .withColumn("org_location", F.lit(None).cast("string"))
    )
    resolver = R.linear_resolver(
        {"f_exact_match": 1.0}, bias=0.0, threshold=0.5, margin=0.3
    )
    d, rem = resolver(scored)
    assert decided(d) == [("c2", "E3")]
    # margin=0 keeps the deterministic-tie-break argmax behavior
    d0, _ = R.linear_resolver({"f_exact_match": 1.0}, 0.0, 0.5)(scored)
    assert decided(d0) == [("c1", "E1"), ("c2", "E3")]
