"""Web ingest byte-identity invariant + multimodal plumbing."""

import datetime

from hamerkop_spark.operators.multimodal import extract_features, make_fake_media
from hamerkop_spark.schemas import PAGES
from hamerkop_spark.sources.web import (
    check_extraction_invariant,
    extract_text,
    ingest_pages,
    wrap_text_as_html,
)


def test_wrap_extract_roundtrip_bytes():
    for text in [
        "plain text",
        "with <angle> & ampersand",
        "unicode ሰላም мир 你好",
        "nested <article>fake</article> markers & more",
        "",
    ]:
        assert extract_text(wrap_text_as_html(text, "http://u")) == text


def test_ingest_invariant(spark):
    ts = datetime.datetime(2025, 1, 1)
    rows = [
        (f"http://x/{i}", ts, bytearray(wrap_text_as_html(f"doc {i} body & more", f"http://x/{i}")),
         f"doc {i} body & more", "eng")
        for i in range(5)
    ]
    pages = spark.createDataFrame(rows, PAGES)
    docs = ingest_pages(pages)
    assert check_extraction_invariant(docs) == 0
    assert docs.count() == 5


def test_ingest_detects_tamper(spark):
    ts = datetime.datetime(2025, 1, 1)
    rows = [("http://x/0", ts, bytearray(b"<html><body><article>other</article></body></html>"),
             "expected text", "eng")]
    pages = spark.createDataFrame(rows, PAGES)
    assert check_extraction_invariant(ingest_pages(pages)) == 1


def test_multimodal_features_deterministic(spark):
    media = make_fake_media(spark, n=12)
    f1 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    f2 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())
    nb = {r["media_id"]: r["n_bytes"] for r in extract_features(media).collect()}
    assert all(n > 0 for n in nb.values())


def test_multimodal_decode_stub_raises():
    import pytest

    from hamerkop_spark.operators.multimodal import DecodeUnavailable, decode_image

    with pytest.raises(DecodeUnavailable):
        decode_image(b"xxxx")
