"""BIO chunker edge cases mirroring the reference's tests
(tests/test_io.py:35-86): consecutive B tags, mention ending the doc with
an I tag, no tags, I-run without a B."""

from pyspark.sql import functions as F

from hamerkop_spark.schemas import CONLL
from hamerkop_spark.sources.conll import (
    documents_table,
    extract_mentions,
    extract_mentions_from_gold,
)


def mk(spark, rows):
    """rows: (token, tag) per doc 'd1'; offsets auto-assigned."""
    data = []
    pos = 1
    for i, (token, tag) in enumerate(rows):
        data.append((token, tag, "IL5_NW_d1", pos, pos + len(token) - 1,
                     "segment-0", pos))
        pos += len(token) + 1
    return spark.createDataFrame(data, CONLL)


def got(spark, rows):
    df = extract_mentions(mk(spark, rows))
    return sorted(
        (r["string"], r["type"], r["token_start"], r["token_stop"])
        for r in df.collect()
    )


def test_simple_mention(spark):
    out = got(spark, [("John", "B-PER"), ("Smith", "I-PER"), ("ran", "O")])
    assert out == [("John Smith", "PER", 0, 2)]


def test_consecutive_b_tags(spark):
    out = got(spark, [("Paris", "B-GPE"), ("London", "B-GPE"), ("x", "O")])
    assert out == [("London", "GPE", 1, 2), ("Paris", "GPE", 0, 1)]


def test_mention_ending_doc_with_i(spark):
    out = got(spark, [("x", "O"), ("New", "B-GPE"), ("York", "I-GPE")])
    assert out == [("New York", "GPE", 1, 3)]


def test_no_tags_yields_nothing(spark):
    assert got(spark, [("a", "O"), ("b", "O")]) == []


def test_i_without_b_is_not_mention(spark):
    out = got(spark, [("orphan", "I-PER"), ("x", "O"), ("John", "B-PER")])
    assert out == [("John", "PER", 2, 3)]


def test_b_inside_mention_splits(spark):
    out = got(
        spark,
        [("John", "B-PER"), ("Smith", "I-PER"), ("Mary", "B-PER"), ("x", "O")],
    )
    assert out == [("John Smith", "PER", 0, 2), ("Mary", "PER", 2, 3)]


def test_o_breaks_i_run(spark):
    # B-PER, O, I-PER: the I after the O must not attach (io.py:122-129)
    out = got(spark, [("John", "B-PER"), ("x", "O"), ("bad", "I-PER")])
    assert out == [("John", "PER", 0, 1)]


def test_passes_all_tag_types(spark):
    # "B-DOG will end up as a mention" (io.py:99-100)
    out = got(spark, [("Rex", "B-DOG"), ("x", "O")])
    assert out == [("Rex", "DOG", 0, 1)]


def test_char_offsets_and_ids(spark):
    df = extract_mentions(
        mk(spark, [("John", "B-PER"), ("Smith", "I-PER"), ("ran", "O")])
    )
    r = df.collect()[0]
    assert (r["char_start"], r["char_stop"]) == (1, 10)  # 'John Smith'
    assert r["mention_id"] == "IL5_NW_d1:1-10"
    assert r["doc_type"] == "newswire"


def test_gold_span_extraction(spark):
    conll = mk(spark, [("New", "O"), ("York", "O"), ("City", "O"), ("x", "O")])
    gold = spark.createDataFrame(
        [("IL5_NW_d1", 1, 8, "GPE")],
        "doc_id string, gt_start int, gt_stop int, entity_type string",
    )
    out = extract_mentions_from_gold(conll, gold).collect()
    assert len(out) == 1
    assert out[0]["string"] == "New York"
    assert out[0]["type"] == "GPE"
    assert (out[0]["token_start"], out[0]["token_stop"]) == (0, 2)


def test_documents_table(spark):
    df = documents_table(mk(spark, [("a", "O"), ("b", "B-PER"), ("c", "O")]))
    r = df.collect()[0]
    assert r["tokens"] == ["a", "b", "c"]


def test_documents_table_sentence_order_ten_plus_segments(spark):
    """Review r4: sent_id is a STRING ('segment-10' < 'segment-2'
    lexicographically) — sent_tokens must follow document order via the
    numeric first-token key, not the id string."""
    data = []
    pos = 1
    toks = []
    for seg in range(12):
        tok = f"w{seg:02d}"
        toks.append(tok)
        data.append((tok, "O", "IL5_NW_d1", pos, pos + len(tok) - 1,
                     f"segment-{seg}", pos))
        pos += len(tok) + 1
    df = documents_table(spark.createDataFrame(data, CONLL))
    r = df.collect()[0]
    assert r["tokens"] == toks
    assert r["sent_tokens"] == toks  # document order, not 0,1,10,11,2,...
