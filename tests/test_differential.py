"""DIFFERENTIAL parity tests: run the actual reference implementation
(loaded read-only as a test oracle, tests/reference_loader.py) next to
the Spark engine on the same synthetic corpus and compare outputs.

This is the SURVEY.md §5(b) strategy and the most direct evidence for
the BASELINE metric: same inputs -> same mentions (byte-exact), same
coref clusters (pairwise F1), same fuzzy-retrieval candidate sets.
"""

import itertools

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.functions import strings as S
from hamerkop_spark.operators import blocking as B
from hamerkop_spark.operators import coref as C
from hamerkop_spark.operators import preprocess as P
from hamerkop_spark.schemas import CONLL, KB_ENTITIES
from hamerkop_spark.sources.conll import extract_mentions
from hamerkop_spark.synth import make_corpus
from tests.reference_loader import load_reference

REF = load_reference()

TRICKY_STRINGS = [
    "New York", "O'Brien", "a  b", "«quoted»", "ends.", "#HashTag",
    "ALL CAPS", "mixédCase", "tab\tsep", "ሰላም ለዓለም", "…ellipsis…",
    "double  space", "a-b_c", "x", "",
]


# ---------------------------------------------------------------------------
# T1-T6: string function parity, reference python vs Spark columns


@pytest.mark.parametrize("fn_ref,fn_spark", [
    (lambda s: REF["string"].String.remove_punct(s), S.remove_punct),
    (lambda s: REF["string"].String.replace_punct(s), S.replace_punct),
    (lambda s: REF["string"].String.remove_unicode_punct(s), S.remove_unicode_punct),
    (lambda s: REF["string"].String.replace_unicode_punct(s), S.replace_unicode_punct),
    (lambda s: REF["string"].String.remove_emojis(s), S.remove_emojis),
    (lambda s: REF["string"].String.single_space(s), S.single_space),
    (lambda s: REF["string"].String.remove_double_letter(s), S.remove_double_letter),
])
def test_string_functions_differential(spark, fn_ref, fn_spark):
    df = spark.createDataFrame([(s,) for s in TRICKY_STRINGS], "s string")
    got = {
        r["s"]: r["out"]
        for r in df.select("s", fn_spark(F.col("s")).alias("out")).collect()
    }
    for s in TRICKY_STRINGS:
        assert got[s] == fn_ref(s), f"mismatch for {s!r}"


def test_ngrams_differential(spark):
    df = spark.createDataFrame([(s,) for s in TRICKY_STRINGS if s], "s string")
    got = {
        r["s"]: r["out"]
        for r in df.select("s", S.char_ngrams(F.col("s"), 4).alias("out")).collect()
    }
    for s, out in got.items():
        assert out == REF["string"].String.ngrams(s, 4)


# ---------------------------------------------------------------------------
# S1/S3: the BIO chunker, reference read_conll + DocumentPreparer vs Spark


class _FixedLang:
    def detect(self, filename, tokens):
        return "eng"


def _reference_documents(conll_rows):
    """Feed CONLL-schema rows to the reference preparer: build its Row
    namedtuples in file order (read_conll's per-doc grouping, io.py:71-93)
    and run DocumentPreparer.process per document."""
    by_doc_order = sorted(conll_rows, key=lambda r: (r["doc_id"], r["row_idx"]))
    docs = []
    preparer = _load_preparer()
    for doc_id, rows in itertools.groupby(by_doc_order, key=lambda r: r["doc_id"]):
        Row = REF["_io"].Row
        ref_rows = [
            Row(r["token"], r["tag"], r["doc_id"], (r["start"], r["stop"]),
                int(r["sent_id"].split("-")[1]))
            for r in rows
        ]
        d = preparer.process(ref_rows)
        if d is not None:
            docs.append(d)
    return docs


def _load_preparer():
    _ensure_io_loaded()
    return REF["_io"].DocumentPreparer(
        REF["utilities"].InProcessIncremental(), _FixedLang()
    )


def _ensure_io_loaded():
    if "_io" not in REF:
        import importlib.util
        import sys

        spec = importlib.util.spec_from_file_location(
            "hamerkop_ref.io", "/root/reference/hamerkop/io.py"
        )
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "hamerkop_ref"
        sys.modules["hamerkop_ref.io"] = mod
        spec.loader.exec_module(mod)
        REF["_io"] = mod


@pytest.fixture(scope="module")
def corpus(spark):
    return make_corpus(spark, n_docs=30, seed=11)


def test_chunker_differential(spark, corpus):
    conll_rows = [r.asDict() for r in corpus["conll"].collect()]
    ref_docs = _reference_documents(conll_rows)
    ref_mentions = {
        (m.doc_id, m.offsets[0], m.offsets[1], m.string, m.type,
         m.token_offsets[0], m.token_offsets[1])
        for d in ref_docs
        for m in d.mentions
    }
    ours = extract_mentions(corpus["conll"]).collect()
    our_mentions = {
        (r["doc_id"], r["char_start"], r["char_stop"], r["string"], r["type"],
         r["token_start"], r["token_stop"])
        for r in ours
    }
    assert our_mentions == ref_mentions
    assert len(our_mentions) > 50


# ---------------------------------------------------------------------------
# P1-P11: preprocessor cascade parity on reference Document objects


def test_preprocessor_differential(spark, corpus):
    conll_rows = [r.asDict() for r in corpus["conll"].collect()]
    ref_docs = _reference_documents(conll_rows)
    pre = REF["preprocessor"]
    cascade_ref = pre.CascadePreprocessor(
        [pre.TypeValidator(), pre.TextNormalizer(), pre.GarbageRemover(),
         pre.TooLongMentionRemover(3)]
    )
    for d in ref_docs:
        cascade_ref.process(d)
    ref_surviving = sorted(
        (m.doc_id, m.offsets[0], m.string) for d in ref_docs for m in d.mentions
    )

    ours = extract_mentions(corpus["conll"])
    ours = P.cascade(
        P.type_validator, P.text_normalizer, P.garbage_remover,
        P.too_long_mention_remover(3),
    )(ours)
    our_surviving = sorted(
        (r["doc_id"], r["char_start"], r["string"]) for r in ours.collect()
    )
    assert our_surviving == ref_surviving


# ---------------------------------------------------------------------------
# C1-C4: coref sieve parity — cluster agreement measured pairwise (the
# acceptance metric's own framing; reference merges are greedy/ordered,
# ours transitive — SURVEY.md §7(b))


def _pairs(clusterings):
    out = set()
    for cluster in clusterings:
        for a, b in itertools.combinations(sorted(cluster), 2):
            out.add((a, b))
    return out


def test_coref_differential(spark, corpus):
    conll_rows = [r.asDict() for r in corpus["conll"].collect()]
    ref_docs = _reference_documents(conll_rows)
    co = REF["coref"]
    sieve = co.CascadeCoref(
        [co.ExactMatchStage(), co.AcronymStage(3),
         co.TypeSpecificStage(co.SingleTokenMatchStage(-1), "PER")]
    )
    ref_clusters = []
    for d in ref_docs:
        sieve.coref(d)
        for chain in d.mention_chains:
            ref_clusters.append(
                [f"{m.doc_id}:{m.offsets[0]}-{m.offsets[1]}" for m in chain.mentions]
            )

    mentions = extract_mentions(corpus["conll"]).withColumn("lang", F.lit("eng"))
    chained = C.cascade_coref(
        mentions,
        [C.exact_match_stage, C.acronym_stage(3),
         C.type_specific(C.single_token_match_stage(-1), "PER")],
    )
    ours = {}
    for r in chained.collect():
        ours.setdefault(r["chain_id"], []).append(r["mention_id"])

    ref_pairs = _pairs(ref_clusters)
    our_pairs = _pairs(ours.values())
    tp = len(ref_pairs & our_pairs)
    fp = len(our_pairs - ref_pairs)
    fn = len(ref_pairs - our_pairs)
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 1.0
    assert tp + fn > 0
    assert f1 >= 0.99, f"coref pairwise F1 {f1} (p={p}, r={r}, tp={tp}, fp={fp}, fn={fn})"


# ---------------------------------------------------------------------------
# B3: ngram-IDF retrieval parity against the reference index itself


class _FakeKB:
    def __init__(self, entities):
        self.entities = {e.id: e for e in entities}

    def __iter__(self):
        return iter(self.entities.values())

    def get_entity(self, eid):
        return self.entities.get(eid)

    def get_entities(self, ids):
        return [self.entities[i] for i in ids if i in self.entities]


def test_ngram_index_differential(spark):
    core = REF["core"]
    kb_rows = [
        ("E1", "GPE", ["New York", "NYC", "New York City"]),
        ("E2", "GPE", ["York", "Yorks"]),
        ("E3", "GPE", ["Newark"]),
        ("E4", "PER", ["John Smith", "Jon Smith"]),
        ("E5", "PER", ["John Smythe"]),
        ("E6", "ORG", ["United Nations"]),
        ("E7", "GPE", ["Lake Solara"]),
    ]
    ref_entities = []
    for eid, t, names in kb_rows:
        e = core.Entity(eid, t, names[0], "GEO")
        for n in names[1:]:
            e.names.add(n)
        ref_entities.append(e)
    index = REF["kb"].NgramMemoryNameIndex(_FakeKB(ref_entities), ngram_size=4)

    kb_df = spark.createDataFrame(
        [
            dict(entity_id=eid, type=t, name=names[0], names=names,
                 origin="geonames", urls=[], geo_type=None, geo_country=None,
                 geo_latitude=None, geo_longitude=None, geo_population=None,
                 per_location=None, per_titles=None, per_orgs=None,
                 org_location=None)
            for (eid, t, names) in kb_rows
        ],
        KB_ENTITIES,
    )
    kb_names = B.build_kb_names(kb_df)
    postings, _ = B.build_ngram_postings(kb_names)

    queries = [
        ("New York", "GPE"), ("Newyork", "GPE"), ("york", "GPE"),
        ("Jon Smith", "PER"), ("Smythe", "PER"), ("Solara", "GPE"),
        ("United Nation", "ORG"), ("zzzz", "PER"),
    ]
    chains = spark.createDataFrame(
        [(f"d", f"c{i}", t, q) for i, (q, t) in enumerate(queries)],
        "doc_id string, chain_id string, type string, name string",
    )
    ours = B.ngram_candidates(chains, postings)
    got = {}
    for r in ours.collect():
        got.setdefault(r["chain_id"], set()).add(r["entity_id"])
    for i, (q, t) in enumerate(queries):
        expected = {e.id for e in index.find(q, t) if e is not None}
        assert got.get(f"c{i}", set()) == expected, f"query {q!r}/{t}"
