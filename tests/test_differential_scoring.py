"""Differential parity for pairwise features (F1-F9) and resolvers
(R1-R5) against the actual reference (editdistance backed by this repo's
pure-python Levenshtein — identical values by construction)."""

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.operators import features as FE
from hamerkop_spark.operators import resolve as R
from tests.reference_loader import load_reference

REF = load_reference()


def ref_chain(strings, translit=None):
    core = REF["core"]
    mentions = [
        core.Mention(s, "IL5_NW_d1", (i * 100 + 1, i * 100 + len(s)), (0, 1), "PER")
        for i, s in enumerate(strings)
    ]
    if translit:
        mentions[0].translit_string = translit
    return REF["coref"].MentionChain(mentions) if hasattr(REF["coref"], "MentionChain") else core.MentionChain(mentions)


def ref_entity(eid, names, urls=None, origin="GEO"):
    core = REF["core"]
    e = core.Entity(eid, "PER", names[0], origin, urls=urls or [])
    for n in names[1:]:
        e.names.add(n)
    return e


PAIR_CASES = [
    # (chain strings, translit, entity names, urls, origin)
    (["John Smith"], None, ["John Smith"], [], "GEO"),
    (["John Smith", "Smith"], None, ["Jon Smith", "J. Smith"], [], "WLL"),
    (["New York"], None, ["York"], ["http://en.wikipedia.org/wiki/New_York"], "GEO"),
    (["Москва"], "Moskva", ["Moskva"], [], "AUG-X"),
    (["abcd"], None, ["abcx", "zzzz"], [], "APB"),
    (["Alpha Beta"], None, ["Gamma Delta", "Alpha Gamma"], [], "GEO"),
]


def spark_pair_df(spark, chain_strings, translit, entity_names, urls, origin):
    all_strings = list(chain_strings) + ([translit] if translit else [])
    row = (
        "d1", "c1", "E1", "PER",
        max(chain_strings, key=len), chain_strings, all_strings,
        entity_names, urls, origin, None, None, None,
    )
    return spark.createDataFrame(
        [row],
        "doc_id string, chain_id string, entity_id string, chain_type string, "
        "chain_name string, chain_names array<string>, "
        "chain_all_strings array<string>, entity_names array<string>, "
        "entity_urls array<string>, origin string, geo_country string, "
        "per_location string, org_location string",
    )


@pytest.mark.parametrize("case", PAIR_CASES)
def test_feature_vector_differential(spark, case):
    chain_strings, translit, entity_names, urls, origin = case
    fx = REF["features"]
    extractor = fx.EntityFeatureExtractor(
        fx.OriginFeature(), fx.NumberOfNamesFeature(), fx.NumberOfLinksFeature(),
        fx.WikipediaFeature(), fx.ExactMatchFeature(), fx.SharedTokensFeature(),
        fx.LastNameFeature(), fx.LevenshteinFeature(),
    )
    chain = ref_chain(chain_strings, translit)
    entity = ref_entity("E1", entity_names, urls, origin)
    expected = extractor.extract(chain, entity, None).tolist()

    df = FE.extract_features(
        spark_pair_df(spark, chain_strings, translit, entity_names, urls,
                      REF["core"].EntityOrigin.create(origin)),
        {
            "f_origin": FE.origin_feature,
            "f_num_names": FE.number_of_names_feature,
            "f_num_links": FE.number_of_links_feature,
            "f_wikipedia": FE.wikipedia_feature,
            "f_exact_match": FE.exact_match_feature,
            "f_shared_tokens": FE.shared_tokens_feature,
            "f_last_name": FE.last_name_feature,
            "f_levenshtein": FE.levenshtein_feature,
        },
    )
    got = df.collect()[0]["features"]
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g == pytest.approx(e, abs=1e-9), (case, got, expected)


def _ref_resolve(resolver_cls, chains_entities, **kw):
    """Run a reference resolver over a fake document of chains, each with
    candidate entities; return {chain_idx: entity_id or None}."""
    core = REF["core"]

    class Doc:
        pass

    doc = Doc()
    doc.mention_chains = []
    for strings, candidates in chains_entities:
        ch = core.MentionChain(
            [core.Mention(s, "IL5_NW_d1", (i + 1, i + len(s)), (0, 1), "PER")
             for i, s in enumerate(strings)]
        )
        ch.candidates = candidates
        doc.mention_chains.append(ch)
    resolver_cls(**kw).resolve(doc) if kw else resolver_cls().resolve(doc)
    return {
        i: (ch.entity.id if ch.entity else None)
        for i, ch in enumerate(doc.mention_chains)
    }


def test_exact_name_resolver_differential(spark):
    rs = REF["resolver"]
    cases = [
        (["John"], [ref_entity("E1", ["JOHN"]), ref_entity("E2", ["Jane"])]),
        (["John"], [ref_entity("E3", ["john"]), ref_entity("E4", ["John X"])]),
        (["Solo"], [ref_entity("E5", ["Other"]), ref_entity("E6", ["Another"])]),
    ]
    expected = _ref_resolve(rs.ExactNameResolver, cases)

    rows = []
    for i, (strings, cands) in enumerate(cases):
        for e in cands:
            rows.append(
                ("d1", f"c{i}", e.id, "PER", strings, strings,
                 sorted(e.names), [], 0, 1)
            )
    pairs = spark.createDataFrame(
        rows,
        "doc_id string, chain_id string, entity_id string, chain_type string, "
        "chain_names array<string>, chain_all_strings array<string>, "
        "entity_names array<string>, entity_urls array<string>, "
        "source_rank int, retrieval_rank int",
    )
    decisions, _ = R.exact_name_resolver(pairs)
    got = {r["chain_id"]: r["entity_id"] for r in decisions.collect()}
    for i in range(len(cases)):
        assert got.get(f"c{i}") == expected[i]


def test_edit_distance_resolver_differential(spark):
    rs = REF["resolver"]
    cases = [
        (["abcdefghijklmnopqrst"],
         [ref_entity("E1", ["abcdefghijklmnopqrsx"]), ref_entity("E2", ["zzzz"])]),
        (["short"], [ref_entity("E3", ["shore"]), ref_entity("E4", ["xxxxx"])]),
    ]
    expected = _ref_resolve(rs.EditDistanceResolver, cases)

    rows = []
    for i, (strings, cands) in enumerate(cases):
        for e in cands:
            rows.append(
                ("d1", f"c{i}", e.id, "PER", strings, strings,
                 sorted(e.names), [], 0, 1)
            )
    pairs = spark.createDataFrame(
        rows,
        "doc_id string, chain_id string, entity_id string, chain_type string, "
        "chain_names array<string>, chain_all_strings array<string>, "
        "entity_names array<string>, entity_urls array<string>, "
        "source_rank int, retrieval_rank int",
    )
    decisions, _ = R.edit_distance_resolver(pairs, threshold=0.1)
    got = {r["chain_id"]: r["entity_id"] for r in decisions.collect()}
    for i in range(len(cases)):
        assert got.get(f"c{i}") == expected[i]
