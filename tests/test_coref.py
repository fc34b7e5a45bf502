"""Coref sieve stages (mirrors reference tests/test_coref.py merge cases)."""

from hamerkop_spark.operators import coref as C
from hamerkop_spark.schemas import MENTIONS

BASE = dict(
    original_string=None, translit_string=None, translate_string=None,
    char_stop=0, token_start=0, token_stop=1, doc_type="newswire", lang="eng",
)


def mk(spark, rows):
    """rows: (mention_id, doc_id, string, type, char_start)"""
    data = [
        dict(BASE, mention_id=m, doc_id=d, string=s, type=t, char_start=cs,
             char_stop=cs + len(s))
        for (m, d, s, t, cs) in rows
    ]
    return spark.createDataFrame(data, MENTIONS)


def chains_of(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["chain_id"], set()).add(r["mention_id"])
    return sorted(frozenset(v) for v in out.values())


def test_exact_match_stage(spark):
    m = mk(spark, [
        ("m1", "d1", "John Smith", "PER", 1),
        ("m2", "d1", "john smith", "PER", 20),   # CI match -> merge
        ("m3", "d1", "John Smith", "ORG", 40),   # different type -> no
        ("m4", "d2", "John Smith", "PER", 1),    # different doc -> no
    ])
    out = C.cascade_coref(m, [C.exact_match_stage])
    assert chains_of(out) == sorted([
        frozenset({"m1", "m2"}), frozenset({"m3"}), frozenset({"m4"})])


def test_acronym_stage(spark):
    m = mk(spark, [
        ("m1", "d1", "UN", "ORG", 1),
        ("m2", "d1", "United Nations", "ORG", 10),
        ("m3", "d1", "United Nations", "PER", 30),  # wrong type
        ("m4", "d1", "UX", "ORG", 50),              # no initials match
    ])
    out = C.cascade_coref(m, [C.acronym_stage(min_length=2)])
    assert frozenset({"m1", "m2"}) in chains_of(out)
    assert frozenset({"m3"}) in chains_of(out)
    assert frozenset({"m4"}) in chains_of(out)


def test_acronym_min_length(spark):
    m = mk(spark, [
        ("m1", "d1", "UN", "ORG", 1),
        ("m2", "d1", "United Nations", "ORG", 10),
    ])
    out = C.cascade_coref(m, [C.acronym_stage(min_length=3)])
    assert chains_of(out) == sorted([frozenset({"m1"}), frozenset({"m2"})])


def test_single_token_last(spark):
    m = mk(spark, [
        ("m1", "d1", "Smith", "PER", 1),
        ("m2", "d1", "John Smith", "PER", 10),
        ("m3", "d1", "Smith Barney", "ORG", 30),  # type differs
    ])
    out = C.cascade_coref(m, [C.single_token_match_stage(-1)])
    assert frozenset({"m1", "m2"}) in chains_of(out)


def test_single_token_first(spark):
    m = mk(spark, [
        ("m1", "d1", "John", "PER", 1),
        ("m2", "d1", "John Smith", "PER", 10),
        ("m3", "d1", "Mary John", "PER", 30),  # token[0] is Mary -> no
    ])
    out = C.cascade_coref(m, [C.single_token_match_stage(0)])
    assert frozenset({"m1", "m2"}) in chains_of(out)
    assert frozenset({"m3"}) in chains_of(out)


def test_language_gate(spark):
    m = mk(spark, [
        ("m1", "d1", "A B", "PER", 1),
        ("m2", "d1", "A B", "PER", 10),
    ])
    gated = C.language_specific(C.exact_match_stage, "fra")
    out = C.cascade_coref(m, [gated])
    assert chains_of(out) == sorted([frozenset({"m1"}), frozenset({"m2"})])


def test_sieve_order_transitive(spark):
    # exact match merges m1,m2; then acronym merges that chain with m3
    m = mk(spark, [
        ("m1", "d1", "UN", "ORG", 1),
        ("m2", "d1", "UN", "ORG", 10),
        ("m3", "d1", "United Nations", "ORG", 30),
    ])
    out = C.cascade_coref(m, [C.exact_match_stage, C.acronym_stage(2)])
    assert chains_of(out) == [frozenset({"m1", "m2", "m3"})]


def test_chains_table(spark):
    m = mk(spark, [
        ("m1", "d1", "John Smith", "PER", 5),
        ("m2", "d1", "John", "PER", 1),
    ])
    chained = C.cascade_coref(m, [C.single_token_match_stage(0)])
    t = C.chains_table(chained).collect()
    assert len(t) == 1
    row = t[0]
    assert row["name"] == "John Smith"           # longest string
    assert sorted(row["names"]) == ["John", "John Smith"]
    assert row["type"] == "PER"                  # first mention by char_start
    assert row["n_mentions"] == 2
