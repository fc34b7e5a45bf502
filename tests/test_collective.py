"""Collective (coherence) disambiguation: relatedness, rerank, resolver.

The flip fixture is the canonical collective-ER scenario: a document
mentions an ambiguous name (local score prefers the WRONG entity) next
to an unambiguous one; KB relatedness between the right entity and the
unambiguous neighbor must flip the decision.
"""

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.operators.collective import (
    MICRO,
    coherence_rerank,
    coherence_resolver,
    entity_pair_relatedness,
)
from hamerkop_spark.operators.resolve import cascade_resolver


@pytest.fixture(scope="module")
def links(spark):
    # e_city ~ e_river (3 shared links of 4 union), e_person unrelated,
    # e_bare has no links at all
    rows = [
        ("e_city", "l_france"), ("e_city", "l_europe"), ("e_city", "l_seine"),
        ("e_river", "l_france"), ("e_river", "l_europe"),
        ("e_river", "l_seine"), ("e_river", "l_water"),
        ("e_person", "l_hollywood"),
    ]
    return spark.createDataFrame(rows, "entity_id string, link string")


def _flip_cand(spark):
    # chain m1 "paris": local prefers e_person (0.9) over e_city (0.8);
    # chain m2 "seine": unambiguous e_river
    rows = [
        ("d1", "m1", "e_person", 0.9),
        ("d1", "m1", "e_city", 0.8),
        ("d1", "m2", "e_river", 1.0),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, chain_id string, entity_id string, score double"
    )


def test_relatedness_jaccard(spark, links):
    pairs = spark.createDataFrame(
        [("e_city", "e_river"), ("e_city", "e_person"), ("e_city", "e_city")],
        "a_entity string, b_entity string",
    )
    got = {
        (r.a_entity, r.b_entity): r.rel_micro
        for r in entity_pair_relatedness(pairs, links).collect()
    }
    assert got[("e_city", "e_river")] == MICRO * 3 // 4
    assert got[("e_city", "e_city")] == MICRO
    # zero overlap rows are absent, not zero
    assert ("e_city", "e_person") not in got


def test_coherence_flips_ambiguous_mention(spark, links):
    cand = _flip_cand(spark)
    # NOTE lam > 0.5: per-chain min-max sends the two local scores to
    # exactly {0, 1e6}, so lam = 0.5 would blend to a dead tie
    out = coherence_rerank(cand, links, lam_micro=600_000, iterations=2)
    scores = {
        (r.chain_id, r.entity_id): r.score_micro for r in out.collect()
    }
    # e_city gets coherence from e_river; e_person gets none
    assert scores[("m1", "e_city")] > scores[("m1", "e_person")]
    # the unambiguous chain keeps full confidence
    assert scores[("m2", "e_river")] == MICRO


def test_lambda_zero_is_pure_local(spark, links):
    cand = _flip_cand(spark)
    out = coherence_rerank(cand, links, lam_micro=0, iterations=2)
    scores = {
        (r.chain_id, r.entity_id): r.score_micro for r in out.collect()
    }
    # min-max of the local scores, untouched by coherence
    assert scores[("m1", "e_person")] == MICRO
    assert scores[("m1", "e_city")] == 0


def test_zero_iterations_is_pure_local(spark, links):
    cand = _flip_cand(spark)
    a = coherence_rerank(cand, links, lam_micro=500_000, iterations=0)
    b = coherence_rerank(cand, links, lam_micro=0, iterations=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_top_k_prunes_before_pairing(spark, links):
    rows = [("d1", "m1", f"e{i}", float(10 - i)) for i in range(8)]
    cand = spark.createDataFrame(
        rows, "doc_id string, chain_id string, entity_id string, score double"
    )
    out = coherence_rerank(cand, links, top_k=3, iterations=1)
    assert out.count() == 3
    kept = {r.entity_id for r in out.collect()}
    assert kept == {"e0", "e1", "e2"}


def test_deterministic(spark, links):
    cand = _flip_cand(spark)
    a = coherence_rerank(cand, links, lam_micro=400_000, iterations=2)
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, coherence_rerank(
            cand, links, lam_micro=400_000, iterations=2
        ).collect())
    )


def test_same_entity_supports_itself(spark, links):
    # two chains both naming e_city: rel(e,e)=1 lifts both; a bare
    # entity with no links draws nothing
    rows = [
        ("d1", "m1", "e_city", 0.5), ("d1", "m1", "e_bare", 0.9),
        ("d1", "m2", "e_city", 1.0),
    ]
    cand = spark.createDataFrame(
        rows, "doc_id string, chain_id string, entity_id string, score double"
    )
    out = coherence_rerank(cand, links, lam_micro=600_000, iterations=1)
    scores = {
        (r.chain_id, r.entity_id): r.score_micro for r in out.collect()
    }
    assert scores[("m1", "e_city")] > scores[("m1", "e_bare")]


def test_resolver_in_cascade(spark, links):
    pairs = _flip_cand(spark).withColumnRenamed("score", "match_score")
    decisions = cascade_resolver(
        pairs,
        [coherence_resolver(links, lam_micro=600_000, iterations=2)],
    )
    got = {(r.doc_id, r.chain_id): r.entity_id for r in decisions.collect()}
    assert got == {("d1", "m1"): "e_city", ("d1", "m2"): "e_river"}


def test_resolver_margin_abstains(spark, links):
    # two unrelated candidates at equal local score: min-max sends both
    # to 1e6, coherence distinguishes nothing -> margin gate abstains
    rows = [
        ("d1", "m1", "e_person", 0.9),
        ("d1", "m1", "e_bare", 0.9),
    ]
    pairs = spark.createDataFrame(
        rows,
        "doc_id string, chain_id string, entity_id string, match_score double",
    )
    res = coherence_resolver(links, margin_micro=1)
    decisions, remaining = res(pairs)
    assert decisions.count() == 0
    assert remaining.count() == 2


def test_bootstrap_cooccurrence_links(spark):
    """KB-link-free mode: a first-pass decision table supplies
    co-occurrence links; entities repeatedly linked in the same docs
    become related and lift each other in a second collective pass."""
    from hamerkop_spark.operators.collective import decisions_as_links

    history = spark.createDataFrame(
        # e_a and e_b co-occur in two docs; e_c appears alone
        [("h1", "x1", "e_a"), ("h1", "x2", "e_b"),
         ("h2", "x1", "e_a"), ("h2", "x2", "e_b"),
         ("h3", "x1", "e_c")],
        "doc_id string, chain_id string, entity_id string",
    )
    links = decisions_as_links(history)
    cand = spark.createDataFrame(
        # new doc: m1 ambiguous between e_c (local best) and e_b;
        # m2 is unambiguously e_a -> co-occurrence flips m1 to e_b
        [("d9", "m1", "e_c", 0.9), ("d9", "m1", "e_b", 0.8),
         ("d9", "m2", "e_a", 1.0)],
        "doc_id string, chain_id string, entity_id string, score double",
    )
    out = coherence_rerank(cand, links, lam_micro=600_000, iterations=1)
    scores = {(r.chain_id, r.entity_id): r.score_micro for r in out.collect()}
    assert scores[("m1", "e_b")] > scores[("m1", "e_c")]
