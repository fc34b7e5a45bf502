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


def _png(w, h):
    import struct as st
    return b"\x89PNG\r\n\x1a\n" + st.pack(">I", 13) + b"IHDR" + st.pack(
        ">IIBBBBB", w, h, 8, 6, 0, 0, 0
    )


def _gif(w, h):
    import struct as st
    return b"GIF89a" + st.pack("<HH", w, h) + b"\x00" * 3


def _bmp(w, h):
    import struct as st
    return b"BM" + b"\x00" * 16 + st.pack("<ii", w, -h) + b"\x00" * 8


def _jpeg(w, h):
    import struct as st
    app0 = b"\xff\xe0" + st.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + st.pack(">H", 17) + b"\x08" + st.pack(">HH", h, w)
    return b"\xff\xd8" + app0 + sof0 + b"\x00" * 12


def test_probe_image_header_real_formats():
    """probe_image_header is REAL parsing, not a stub: actual PNG/GIF/
    BMP/JPEG byte layouts yield their dimensions; JPEG walks segments to
    SOF0; top-down BMP (negative height) is normalized."""
    from hamerkop_spark.operators.multimodal import probe_image_header

    assert probe_image_header(_png(640, 480)) == ("png", 640, 480)
    assert probe_image_header(_gif(13, 37)) == ("gif", 13, 37)
    assert probe_image_header(_bmp(320, 200)) == ("bmp", 320, 200)
    assert probe_image_header(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    assert probe_image_header(b"not an image") == (None, None, None)
    assert probe_image_header(b"") == (None, None, None)


def test_image_headers_dataframe(spark):
    from hamerkop_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_headers,
    )

    rows = [
        ("p1", "image", bytearray(_png(10, 20)), "image/png", None),
        ("j1", "image", bytearray(_jpeg(30, 40)), "image/jpeg", None),
        ("x1", "image", bytearray(b"garbage"), "application/octet-stream",
         None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: (r["format"], r["width"], r["height"])
           for r in image_headers(media).collect()}
    assert got == {
        "p1": ("png", 10, 20),
        "j1": ("jpeg", 30, 40),
        "x1": (None, None, None),
    }
