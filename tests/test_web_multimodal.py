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


def test_multimodal_decode_unrecognized_and_progressive_raise():
    import pytest

    from hamerkop_spark.operators.multimodal import DecodeUnavailable, decode_image

    with pytest.raises(DecodeUnavailable):
        decode_image(b"xxxx")
    # arithmetic-coded JPEG (SOF9) is honestly out of scope and must
    # surface as DecodeUnavailable, not a crash (progressive SOF2 is
    # SUPPORTED since round 4 — see the roundtrip test below)
    import struct as st

    sof9 = (b"\xff\xd8" + b"\xff\xc9" + st.pack(">H", 11)
            + st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(DecodeUnavailable):
        decode_image(sof9)


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


def test_png_roundtrip_every_filter_and_colortype():
    """Real PNG decode: encode seeded arrays with every spec filter type
    (0-4) across gray/gray+alpha/RGB/RGBA and assert exact pixel
    equality after decode."""
    import numpy as np

    from hamerkop_spark.operators.multimodal import decode_image, encode_png

    for ft in range(5):
        for ch in (1, 2, 3, 4):
            rng = np.random.RandomState(ft * 10 + ch)
            arr = rng.randint(0, 256, size=(11, 7, ch)).astype(np.uint8)
            out = decode_image(encode_png(arr, filter_type=ft))
            assert out.shape == arr.shape, (ft, ch)
            assert (out == arr).all(), (ft, ch)


def test_pnm_and_bmp_decode():
    import struct as st

    import numpy as np

    from hamerkop_spark.operators.multimodal import decode_image

    # P6 PPM with a comment line
    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    ppm = b"P6\n# c\n3 2\n255\n" + arr.tobytes()
    assert (decode_image(ppm) == arr).all()
    # P5 PGM
    g = np.arange(6, dtype=np.uint8).reshape(2, 3, 1)
    pgm = b"P5\n3 2\n255\n" + g.tobytes()
    assert (decode_image(pgm) == g).all()
    # 24-bit bottom-up BMP, rows padded to 4 bytes: 3px * 3B = 9 -> pad 12
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    bgr_rows = []
    for y in (1, 0):  # bottom-up storage
        row = rgb[y][:, ::-1].tobytes()
        bgr_rows.append(row + b"\x00" * (12 - len(row)))
    header = (
        b"BM" + st.pack("<I", 54 + 24) + b"\x00" * 4 + st.pack("<I", 54)
        + st.pack("<I", 40) + st.pack("<ii", 3, 2) + st.pack("<HH", 1, 24)
        + st.pack("<I", 0) + b"\x00" * 20
    )
    assert (decode_image(header + b"".join(bgr_rows)) == rgb).all()


def test_decode_image_stats_dataframe(spark):
    """The decode-stats operator returns pixel-true stats for the seeded
    PNG corpus and a decode_error row (not a crash) for junk."""
    import numpy as np

    from hamerkop_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_image, decode_image_stats, make_synthetic_pngs,
    )

    media = make_synthetic_pngs(spark, n=12)
    got = {r["media_id"]: r for r in decode_image_stats(media).collect()}
    for r in media.collect():
        arr = decode_image(bytes(r["payload"]))
        s = got[r["media_id"]]
        assert s["decode_error"] is None
        assert (s["width"], s["height"]) == (arr.shape[1], arr.shape[0])
        assert s["channels"] == arr.shape[2]
        assert s["px_checksum"] == int(np.int64(arr.sum()))
        assert abs(s["px_mean"] - float(arr.mean())) < 1e-5
    junk = spark.createDataFrame(
        [("bad0", "image", bytearray(b"not an image"), "image/jpeg",
          (None, None, None, None))],
        MEDIA_SCHEMA,
    )
    rows = decode_image_stats(junk).collect()
    assert len(rows) == 1 and rows[0]["decode_error"] is not None


def test_jpeg_roundtrip_psnr():
    """Baseline JPEG codec (operators/jpeg.py): encode seeded images,
    decode, assert fidelity (PSNR) across grayscale / RGB 4:4:4 /
    RGB 4:2:0 / odd dimensions / restart-friendly sizes."""
    import numpy as np

    from hamerkop_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from hamerkop_spark.operators.multimodal import decode_image

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255**2 / mse) if mse else float("inf")

    yy, xx = np.mgrid[0:41, 0:55]
    rgb = np.stack(
        [(yy * 3 + xx) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    gray = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    noise = np.random.RandomState(3).randint(
        0, 256, size=(17, 23, 3)
    ).astype(np.uint8)

    cases = [
        (encode_jpeg(rgb, quality=90), rgb, 45.0),
        (encode_jpeg(rgb, quality=90, subsampling="4:2:0"), rgb, 40.0),
        (encode_jpeg(gray, quality=90), gray[:, :, None], 40.0),
        (encode_jpeg(noise, quality=95), noise, 30.0),
    ]
    for enc, want, floor in cases:
        # both the direct codec and the multimodal dispatch path
        for dec in (decode_jpeg(enc), decode_image(enc)):
            assert dec.shape == want.shape
            assert psnr(want, dec) >= floor


def test_decode_image_stats_survives_corrupt_recognized_containers(spark):
    """Review fix: corrupt payloads inside RECOGNIZED containers
    (truncated BMP header -> struct.error, corrupt PNG IDAT ->
    zlib.error) must yield decode_error rows, never a stage failure."""
    from hamerkop_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_image_stats,
    )

    bad_bmp = b"BM" + b"\x00" * 18  # truncated: struct.error in header
    bad_png = (b"\x89PNG\r\n\x1a\n"
               + b"\x00\x00\x00\x0dIHDR"
               + b"\x00\x00\x00\x04\x00\x00\x00\x04\x08\x02\x00\x00\x00"
               + b"\x00\x00\x00\x00"
               + b"\x00\x00\x00\x04IDAT" + b"junk" + b"\x00\x00\x00\x00")
    media = spark.createDataFrame(
        [
            ("bmp0", "image", bytearray(bad_bmp), "image/bmp",
             (None, None, None, None)),
            ("png0", "image", bytearray(bad_png), "image/png",
             (None, None, None, None)),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in decode_image_stats(media).collect()}
    assert len(rows) == 2
    for r in rows.values():
        assert r["decode_error"] is not None and r["width"] is None

    # direct decode_image callers get ONE typed error for corrupt
    # recognized containers (advice r3): DecodeError, never a raw
    # struct.error / zlib.error / IndexError
    import pytest

    from hamerkop_spark.operators.multimodal import DecodeError, decode_image

    for payload in (bad_bmp, bad_png, b"\xff\xd8\xff\xdb\x00\x02"):
        with pytest.raises(DecodeError):
            decode_image(payload)


def test_jpeg_progressive_roundtrip_bit_identical():
    """Progressive JPEG (SOF2, spectral selection + successive
    approximation, libjpeg-style scan script): because the script ends
    at Al=0, the accumulated coefficients equal the baseline encode's,
    so the decoded image must be BIT-IDENTICAL to decoding the same
    image's baseline stream — a far stronger check than PSNR. Covers
    DC first/refine, banded AC first scans at Al=2/1, AC refinement
    with EOB-runs + correction bits, grayscale/4:4:4/4:2:0, and
    non-block-aligned dims."""
    import numpy as np

    from hamerkop_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from hamerkop_spark.operators.multimodal import decode_image

    yy, xx = np.mgrid[0:41, 0:55]
    rgb = np.stack(
        [(yy * 3 + xx) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    gray = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    noise = np.random.RandomState(3).randint(
        0, 256, size=(17, 23, 3)
    ).astype(np.uint8)
    rng = np.random.default_rng(7)
    big = np.clip(
        (128 + 90 * np.sin(np.mgrid[0:130, 0:170][1] / 17.0)
         + rng.normal(0, 15, (130, 170)))[..., None] * np.ones(3),
        0, 255,
    ).astype(np.uint8)

    for img, q, sub in [
        (rgb, 90, "4:4:4"),
        (rgb, 85, "4:2:0"),
        (gray, 90, "4:4:4"),
        (noise, 95, "4:4:4"),
        (big, 75, "4:2:0"),
    ]:
        base = encode_jpeg(img, quality=q, subsampling=sub)
        prog = encode_jpeg(
            img, quality=q, subsampling=sub, progressive=True
        )
        a = decode_jpeg(base)
        b = decode_jpeg(prog)
        assert a.shape == b.shape
        assert np.array_equal(a, b)
        # dispatch layer decodes progressive too (no DecodeUnavailable)
        assert np.array_equal(decode_image(prog), b)


def test_jpeg_progressive_header_probe():
    """SOF2 streams still classify as jpeg with correct dimensions."""
    import numpy as np

    from hamerkop_spark.operators.jpeg import encode_jpeg
    from hamerkop_spark.operators.multimodal import probe_image_header

    img = (np.arange(24 * 31 * 3) % 256).reshape(24, 31, 3).astype(
        np.uint8
    )
    prog = encode_jpeg(img, quality=80, progressive=True)
    assert probe_image_header(prog) == ("jpeg", 31, 24)


# --- pluggable codec registry (round 5) ------------------------------------


def _demo_png():
    import numpy as np

    from hamerkop_spark.operators.multimodal import encode_png

    arr = (np.arange(9 * 7 * 3) % 256).reshape(9, 7, 3).astype(np.uint8)
    return arr, encode_png(arr)


def test_codec_registry_routes_then_falls_back():
    """A registered native codec wins over the built-in; a failing one
    falls through to the built-in with no caller-visible error."""
    import numpy as np

    from hamerkop_spark.operators import multimodal as M

    arr, payload = _demo_png()
    sentinel = np.full((2, 2, 3), 7, dtype=np.uint8)
    try:
        M.register_codec("fake_native", lambda p: sentinel,
                         formats=("PNG",), priority=99)
        assert "fake_native" in M.registered_codecs()
        assert np.array_equal(M.decode_image(payload), sentinel)

        def _boom(p):
            raise RuntimeError("native codec rejected payload")

        M.register_codec("fake_native", _boom, formats=("PNG",), priority=99)
        # fallback chain: failing native -> built-in, pixel-exact
        assert np.array_equal(M.decode_image(payload), arr)
    finally:
        M.unregister_codec("fake_native")
    assert "fake_native" not in M.registered_codecs()


def test_codec_explicit_selection_env_and_errors(monkeypatch):
    import numpy as np

    from hamerkop_spark.operators import multimodal as M

    arr, payload = _demo_png()
    sentinel = np.zeros((1, 1, 1), dtype=np.uint8)
    try:
        M.register_codec("fake_native", lambda p: sentinel,
                         formats=("PNG",), priority=99)
        # explicit arg forces a specific entry / the built-in
        assert np.array_equal(M.decode_image(payload, codec="fake_native"),
                              sentinel)
        assert np.array_equal(M.decode_image(payload, codec="builtin"), arr)
        # env var steers the default path the same way
        monkeypatch.setenv("HK_IMAGE_CODEC", "builtin")
        assert np.array_equal(M.decode_image(payload), arr)
        monkeypatch.setenv("HK_IMAGE_CODEC", "fake_native")
        assert np.array_equal(M.decode_image(payload), sentinel)
        monkeypatch.delenv("HK_IMAGE_CODEC")
        # unknown forced codec -> DecodeUnavailable; forced codec that
        # raises -> DecodeError (explicit choice means no silent fallback)
        import pytest as _pytest

        with _pytest.raises(M.DecodeUnavailable):
            M.decode_image(payload, codec="no_such_codec")

        def _boom(p):
            raise RuntimeError("boom")

        M.register_codec("fake_native", _boom, formats=("PNG",), priority=99)
        with _pytest.raises(M.DecodeError):
            M.decode_image(payload, codec="fake_native")
    finally:
        M.unregister_codec("fake_native")


def test_codec_parity_builtin_is_the_oracle():
    """Pixel-parity harness between a registered codec and the built-in
    oracle — the contract any real native codec must pass (exercised
    here with a wrapper; Pillow/cv2/simplejpeg are not in this sandbox,
    so probe_native_codecs() legitimately finds nothing)."""
    import numpy as np

    from hamerkop_spark.operators import multimodal as M
    from hamerkop_spark.operators.jpeg import encode_jpeg

    img = (np.arange(16 * 24 * 3) % 256).reshape(16, 24, 3).astype(np.uint8)
    jpg = encode_jpeg(img, quality=90)
    _, png = _demo_png()
    probed = M.probe_native_codecs()
    assert isinstance(probed, list)
    try:
        # wrapper plays the native role; parity tolerance 0 by construction
        M.register_codec(
            "wrapped", lambda p: M.decode_image(p, codec="builtin"),
            formats=("PNG", "JPEG"), priority=99,
        )
        for payload in (jpg, png):
            native = M.decode_image(payload)  # routed through "wrapped"
            builtin = M.decode_image(payload, codec="builtin")
            assert native.shape == builtin.shape
            assert int(np.abs(native.astype(np.int16)
                              - builtin.astype(np.int16)).max()) == 0
    finally:
        M.unregister_codec("wrapped")


def test_codec_normalize_grayscale_and_dtype():
    import numpy as np

    from hamerkop_spark.operators import multimodal as M

    _, payload = _demo_png()
    try:
        # a native codec returning (H, W) float gets normalized to the
        # engine contract (H, W, 1) uint8
        M.register_codec(
            "gray2d", lambda p: np.ones((4, 5), dtype=np.float64) * 3.0,
            formats=("PNG",), priority=99,
        )
        out = M.decode_image(payload)
        assert out.shape == (4, 5, 1) and out.dtype == np.uint8
        assert (out == 3).all()
    finally:
        M.unregister_codec("gray2d")


def test_jpeg_unsupported_profiles_raise_typed(spark):
    """Decision record (OPERATORS.md round 5): every arithmetic /
    hierarchical SOF marker raises the typed DecodeUnavailable naming
    the profile, and through the DataFrame path becomes a decode_error
    ROW, never a stage failure. (Lossless SOF3 and 12-bit SOF1 are
    SUPPORTED since round 5 — see the roundtrip tests below.)"""
    import struct as st

    import pytest

    from hamerkop_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        DecodeUnavailable,
        decode_image,
        decode_image_stats,
    )

    def sof_stream(marker: int, precision: int = 8) -> bytes:
        return (b"\xff\xd8" + bytes([0xFF, marker]) + st.pack(">H", 11)
                + st.pack(">BHHB", precision, 8, 8, 1)
                + bytes([1, 0x11, 0]))

    # SOF5/6/7/13/14/15 hierarchical, SOF9/10/11 arithmetic
    unsupported = [0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF]
    payloads = []
    for m in unsupported:
        p = sof_stream(m)
        with pytest.raises(DecodeUnavailable):
            decode_image(p)
        payloads.append(p)
    # 12-bit PROGRESSIVE stays out of scope (sequential 12-bit works)
    p12 = sof_stream(0xC2, precision=12)
    with pytest.raises(DecodeUnavailable):
        decode_image(p12)
    payloads.append(p12)

    media = spark.createDataFrame(
        [(f"u{i:02d}", "image", bytearray(p), "image/jpeg",
          (None, None, None, None))
         for i, p in enumerate(payloads)],
        MEDIA_SCHEMA,
    )
    rows = decode_image_stats(media).collect()
    assert len(rows) == len(payloads)
    for r in rows:
        assert r["decode_error"] is not None
        assert r["width"] is None


def test_jpeg_lossless_roundtrip_exact():
    """Lossless JPEG (SOF3, T.81 Annex H) is EXACT by definition: every
    predictor, 8- and 16-bit precision, multi-component, restart
    markers, and the point transform all round-trip bit-identically
    through encode_jpeg_lossless -> decode_jpeg."""
    import numpy as np

    from hamerkop_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    for pred in range(1, 8):
        out = decode_jpeg(encode_jpeg_lossless(gray, predictor=pred))
        assert out.dtype == np.uint8 and out.shape == (23, 31, 1)
        assert np.array_equal(out[:, :, 0], gray), f"predictor {pred}"

    # full 16-bit dynamic range (mod-2^16 difference arithmetic)
    g16 = rng.integers(0, 65536, (17, 19), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_lossless(g16, predictor=4))
    assert out.dtype == np.uint16
    assert np.array_equal(out[:, :, 0], g16)

    # 3-component + restart markers resetting prediction mid-line
    rgb = rng.integers(0, 256, (20, 14, 3), dtype=np.uint8)
    out = decode_jpeg(
        encode_jpeg_lossless(rgb, predictor=7, restart_interval=37)
    )
    assert np.array_equal(out, rgb)

    # point transform Pt=2: decoder restores samples << Pt (H.1.2)
    out = decode_jpeg(encode_jpeg_lossless(rgb, predictor=2, point_transform=2))
    assert np.array_equal(out, (rgb >> 2) << 2)


def test_jpeg_lossless_through_decode_image():
    """The DataFrame-facing decode_image path routes SOF3 streams to
    the lossless decoder (no DecodeUnavailable) and the header probe
    reports the right geometry."""
    import numpy as np

    from hamerkop_spark.operators.jpeg import encode_jpeg_lossless
    from hamerkop_spark.operators.multimodal import (
        decode_image,
        probe_image_header,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (12, 9), dtype=np.uint8)
    payload = encode_jpeg_lossless(img, predictor=5)
    out = decode_image(payload, codec="builtin")
    assert np.array_equal(out[:, :, 0], img)
    assert probe_image_header(payload) == ("jpeg", 9, 12)


def test_jpeg_12bit_sequential_roundtrip():
    """12-bit extended sequential (SOF1) with 16-bit DQT tables:
    decodes to uint16, both decode paths are pixel-identical, and the
    reconstruction error stays within quantization bounds."""
    import numpy as np

    from hamerkop_spark.operators.jpeg import decode_jpeg, encode_jpeg

    # smooth 12-bit gradient (quantization error small and bounded)
    x = np.linspace(0, 4095, 32)
    g12 = np.tile(x, (24, 1)).astype(np.uint16)
    enc = encode_jpeg(g12, quality=95, precision=12)
    out = decode_jpeg(enc)
    assert out.dtype == np.uint16 and out.shape == (24, 32, 1)
    assert np.array_equal(out, decode_jpeg(enc, vectorized=False))
    err = np.abs(out[:, :, 0].astype(int) - g12.astype(int))
    assert err.max() <= 64, int(err.max())  # well under 2% of range

    # noisy content exercises the large DC/AC categories via the
    # extended flat Huffman tables (sizes beyond the 8-bit Annex-K max)
    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 4096, (16, 16), dtype=np.uint16)
    enc = encode_jpeg(noisy, quality=90, precision=12)
    out = decode_jpeg(enc)
    assert np.array_equal(out, decode_jpeg(enc, vectorized=False))

    # 3-channel, both samplings; 4:2:0 exercises chroma upsampling
    rgb = np.stack(
        [np.tile(x, (24, 1)), np.tile(x[::-1], (24, 1)),
         np.full((24, 32), 2048.0)],
        axis=-1,
    ).astype(np.uint16)
    for sub in ("4:4:4", "4:2:0"):
        out = decode_jpeg(encode_jpeg(rgb, quality=95, precision=12,
                                      subsampling=sub))
        assert out.dtype == np.uint16
        err = np.abs(out.astype(int) - rgb.astype(int)).max()
        assert err <= (96 if sub == "4:4:4" else 512), (sub, int(err))


def test_png_extended_depths_interlace_and_trns():
    """PNG coverage beyond 8-bit non-interlaced (round 5): bit depths
    1/2/4 (gray scaled to full range; palette as indices), 16 (uint16
    out), Adam7 interlace at every depth, palette alpha via tRNS —
    all exact round-trips through the extended encoder."""
    import numpy as np

    from hamerkop_spark.operators.multimodal import decode_image, encode_png

    rng = np.random.default_rng(5)

    # 16-bit gray/RGB/RGBA across every filter type
    for ft in range(5):
        for ch in (1, 3, 4):
            a = rng.integers(0, 65536, (9, 5, ch), dtype=np.uint16)
            out = decode_image(encode_png(a, filter_type=ft))
            assert out.dtype == np.uint16 and (out == a).all(), (ft, ch)

    # low-depth gray scales by 255/(2^d-1) (exact for 1/2/4)
    for d in (1, 2, 4):
        a = rng.integers(0, 1 << d, (13, 10), dtype=np.uint8)
        out = decode_image(encode_png(a, depth=d))
        assert (out == (a * (255 // ((1 << d) - 1)))[:, :, None]).all(), d

    # 4-bit palette, with and without tRNS alpha
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (8, 9), dtype=np.uint8)
    assert (decode_image(encode_png(idx, depth=4, palette=pal))
            == pal[idx]).all()
    tr = bytes(range(16))
    out = decode_image(encode_png(idx, depth=4, palette=pal, trns=tr))
    assert out.shape == (8, 9, 4)
    assert (out[:, :, :3] == pal[idx]).all()
    assert (out[:, :, 3] == np.frombuffer(tr, np.uint8)[idx]).all()

    # Adam7: every depth family, odd sizes, non-zero filters
    for d, ch, ft in [(8, 3, 4), (16, 3, 2), (1, 1, 0), (2, 1, 3),
                      (4, 1, 4)]:
        if d == 16:
            a = rng.integers(0, 65536, (13, 11, ch), dtype=np.uint16)
            exp = a
        elif d == 8:
            a = rng.integers(0, 256, (13, 11, ch), dtype=np.uint8)
            exp = a
        else:
            a = rng.integers(0, 1 << d, (13, 11, ch), dtype=np.uint8)
            exp = (a.astype(int) * (255 // ((1 << d) - 1))).astype(np.uint8)
        out = decode_image(encode_png(a, filter_type=ft, depth=d,
                                      interlace=1))
        assert (out == exp).all(), (d, ch, ft)

    # tiny interlaced images: several passes are empty
    for hw in [(1, 1), (2, 1), (1, 2), (3, 3)]:
        a = rng.integers(0, 256, hw + (3,), dtype=np.uint8)
        assert (decode_image(encode_png(a, interlace=1)) == a).all(), hw


def test_gif_roundtrip_lzw_interlace_transparency():
    """GIF decode (round 5): real LZW (table growth, CLEAR reset, the
    deferred-clear full-table mode, KwKwK), 4-pass interlace,
    transparency -> RGBA, first-frame contract — exact round-trips
    through the encoder, which emits real variable-width LZW."""
    import numpy as np

    from hamerkop_spark.operators.multimodal import (
        decode_image,
        detect_image_format,
        encode_gif,
    )

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (12, 3), dtype=np.uint8)
    idx = rng.integers(0, 12, (17, 23), dtype=np.uint8)
    rgb = pal[idx]

    payload = encode_gif(rgb)  # auto-palettized RGB
    assert detect_image_format(payload) == "GIF"
    assert (decode_image(payload) == rgb).all()

    # interlaced
    assert (decode_image(encode_gif(idx, palette=pal, interlace=True))
            == rgb).all()

    # transparency: RGBA with alpha 0 exactly at the transparent index
    out = decode_image(encode_gif(idx, palette=pal, transparent=3))
    assert out.shape == (17, 23, 4)
    assert (out[:, :, :3] == rgb).all()
    assert ((out[:, :, 3] == 0) == (idx == 3)).all()

    # table growth to 12-bit codes, then BOTH full-table behaviors:
    # standard CLEAR reset and deferred-clear (decoder must not grow
    # phantom entries past 4096)
    pal256 = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (200, 210), dtype=np.uint8)
    for deferred in (False, True):
        out = decode_image(
            encode_gif(big, palette=pal256, deferred_clear=deferred)
        )
        assert (out == pal256[big]).all(), deferred

    # incompressible + tiny edge cases
    g = (np.arange(64 * 64) % 251 % 256).astype(np.uint8).reshape(64, 64)
    palg = rng.integers(0, 256, (251, 3), dtype=np.uint8)
    assert (decode_image(encode_gif(g, palette=palg)) == palg[g]).all()
    one = np.zeros((1, 1), dtype=np.uint8)
    assert (decode_image(
        encode_gif(one, palette=np.array([[7, 8, 9]], np.uint8))
    ) == [7, 8, 9]).all()


def test_gif_through_stats_dataframe(spark):
    """GIF payloads flow through the mapInPandas stats operator with
    pixel-true values (they are real decoded frames, not headers)."""
    import numpy as np

    from hamerkop_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_stats,
        encode_gif,
    )

    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    rows = []
    expect = {}
    for i in range(4):
        idx = rng.integers(0, 8, (6 + i, 5 + i), dtype=np.uint8)
        payload = encode_gif(idx, palette=pal, interlace=bool(i % 2))
        arr = pal[idx]
        expect[f"g{i}"] = (arr.shape[1], arr.shape[0],
                           int(np.int64(arr.sum())))
        rows.append((f"g{i}", "image", bytearray(payload), "image/gif",
                     (None, None, None, None)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_image_stats(media).collect()}
    for mid, (w, h, checksum) in expect.items():
        r = got[mid]
        assert r["decode_error"] is None
        assert (r["width"], r["height"]) == (w, h)
        assert r["px_checksum"] == checksum


def test_webp_tiff_probe_and_registry_route():
    """WEBP / TIFF (round 5): sniffed and header-probed for real
    dimensions (VP8 lossy frame tag, VP8L packed bits, VP8X canvas;
    TIFF IFD walk in both byte orders), pixel decode registry-only —
    the typed DecodeUnavailable names the format, and a registered
    codec claiming it takes over."""
    import struct as st

    import numpy as np
    import pytest

    from hamerkop_spark.operators.multimodal import (
        DecodeUnavailable,
        decode_image,
        detect_image_format,
        probe_image_header,
        register_codec,
        unregister_codec,
    )

    def riff(cc: bytes, payload: bytes) -> bytes:
        chunk = cc + st.pack("<I", len(payload)) + payload
        return b"RIFF" + st.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    vp8 = riff(b"VP8 ", b"\x00\x00\x00\x9d\x01\x2a"
               + st.pack("<HH", 641, 353) + b"\x00" * 10)
    vp8l_bits = (641 - 1) | ((353 - 1) << 14)
    vp8l = riff(b"VP8L", b"\x2f" + st.pack("<I", vp8l_bits) + b"\x00" * 8)
    vp8x = riff(b"VP8X", b"\x00" * 4
                + (640).to_bytes(3, "little") + (352).to_bytes(3, "little")
                + b"\x00" * 4)
    assert probe_image_header(vp8) == ("webp", 641, 353)
    assert probe_image_header(vp8l) == ("webp", 641, 353)
    assert probe_image_header(vp8x) == ("webp", 641, 353)

    def tiff(end: str) -> bytes:
        head = (b"II*\x00" if end == "<" else b"MM\x00*") + st.pack(
            end + "I", 8
        )
        entries = (
            st.pack(end + "HHIHH", 0x0100, 3, 1, 123, 0)
            + st.pack(end + "HHII", 0x0101, 4, 1, 456)
        )
        return head + st.pack(end + "H", 2) + entries + st.pack(end + "I", 0)

    assert probe_image_header(tiff("<")) == ("tiff", 123, 456)
    assert probe_image_header(tiff(">")) == ("tiff", 123, 456)

    for payload, fmt in [(vp8, "WEBP"), (tiff("<"), "TIFF")]:
        assert detect_image_format(payload) == fmt
        with pytest.raises(DecodeUnavailable, match=fmt):
            decode_image(payload, codec="builtin")
        with pytest.raises(DecodeUnavailable):
            decode_image(payload)  # no registered codec claims it

    # a registered codec claiming WEBP takes the payload
    fake = np.full((2, 2, 3), 7, np.uint8)
    register_codec("fakewebp", lambda p: fake, formats=("WEBP",),
                   priority=99)
    try:
        assert (decode_image(vp8) == fake).all()
    finally:
        unregister_codec("fakewebp")
    with pytest.raises(DecodeUnavailable):
        decode_image(vp8)


def test_wav_roundtrip_and_media_probes():
    """Audio/video metadata path (round 5): real WAV PCM decode
    (16/32-bit, mono and stereo, sample-exact within quantization) and
    container-header probing for FLAC / OGG (Vorbis + Opus) / MP4 /
    MP3 built from the public byte layouts."""
    import struct as st

    import numpy as np

    from hamerkop_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        probe_media_header,
    )

    t = np.linspace(0, 1, 8000)
    sig = np.stack(
        [np.sin(2 * np.pi * 440 * t), 0.5 * np.cos(2 * np.pi * 220 * t)],
        axis=1,
    )
    for bits, tol in [(16, 1e-4), (32, 1e-9)]:
        out, rate = decode_wav(encode_wav(sig, 8000, bits=bits))
        assert rate == 8000 and out.shape == sig.shape
        assert np.abs(out - sig).max() < tol, bits
    mono, _ = decode_wav(encode_wav(sig[:, 0], 16000))
    assert mono.shape == (8000, 1)

    h = probe_media_header(encode_wav(sig, 8000))
    assert (h["format"], h["sample_rate"], h["channels"],
            h["duration_ms"]) == ("wav", 8000, 2, 1000)

    bits_ = (44100 << 44) | (1 << 41) | (15 << 36) | (44100 * 3)
    flac = (b"fLaC" + b"\x00\x00\x00\x22" + b"\x00" * 10
            + bits_.to_bytes(8, "big"))
    h = probe_media_header(flac)
    assert (h["format"], h["sample_rate"], h["channels"],
            h["duration_ms"]) == ("flac", 44100, 2, 3000)

    pkt = b"\x01vorbis" + b"\x00" * 4 + bytes([2]) + st.pack("<I", 44100)
    page1 = b"OggS" + b"\x00" * 22 + bytes([1, len(pkt)]) + pkt
    page2 = (b"OggS" + b"\x00\x00" + st.pack("<q", 44100 * 7)
             + b"\x00" * 13 + b"\x00")
    h = probe_media_header(page1 + page2)
    assert (h["format"], h["sample_rate"], h["channels"],
            h["duration_ms"]) == ("ogg", 44100, 2, 7000)
    opus = (b"OpusHead" + bytes([1, 2]) + st.pack("<H", 312)
            + st.pack("<I", 16000) + b"\x00" * 3)
    page1 = b"OggS" + b"\x00" * 22 + bytes([1, len(opus)]) + opus
    page2 = (b"OggS" + b"\x00\x00" + st.pack("<q", 48000 * 2)
             + b"\x00" * 13 + b"\x00")
    h = probe_media_header(page1 + page2)
    assert (h["sample_rate"], h["duration_ms"]) == (48000, 2000)

    def box(t4, payload):
        return st.pack(">I", 8 + len(payload)) + t4 + payload

    mvhd = box(b"mvhd", b"\x00" * 12 + st.pack(">II", 1000, 5500)
               + b"\x00" * 80)
    trak = box(b"trak", box(b"tkhd", b"\x00" * 76
                            + st.pack(">II", 640 << 16, 360 << 16)))
    mp4 = (box(b"ftyp", b"isom" + b"\x00" * 4)
           + box(b"moov", mvhd + trak))
    h = probe_media_header(mp4)
    assert (h["format"], h["duration_ms"], h["width"],
            h["height"]) == ("mp4", 5500, 640, 360)

    mp3 = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 4180
    h = probe_media_header(mp3)
    assert (h["format"], h["sample_rate"], h["channels"]) == (
        "mp3", 44100, 2)
    id3 = b"ID3" + b"\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    assert probe_media_header(id3 + mp3)["format"] == "mp3"

    assert probe_media_header(b"garbage")["format"] is None


def test_audio_stats_dataframe(spark):
    """audio_stats is sample-true through the mapInPandas path: rms and
    peak match numpy on the source signal; non-audio payloads become
    decode_error rows."""
    import numpy as np

    from hamerkop_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_stats,
        encode_wav,
    )

    rng = np.random.default_rng(17)
    rows = []
    expect = {}
    for i in range(3):
        sig = rng.uniform(-0.8, 0.8, (4000 + i * 100, 1 + i % 2))
        payload = encode_wav(sig, 8000, bits=32)
        expect[f"a{i}"] = (
            8000, sig.shape[1], int(sig.shape[0] * 1000 / 8000),
            float(np.sqrt(np.mean(sig ** 2))), float(np.abs(sig).max()),
        )
        rows.append((f"a{i}", "audio", bytearray(payload), "audio/wav",
                     (None, None, None, None)))
    rows.append(("bad", "audio", bytearray(b"not audio"), "audio/wav",
                 (None, None, None, None)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in audio_stats(media).collect()}
    for mid, (rate, ch, dur, rms, peak) in expect.items():
        r = got[mid]
        assert r["decode_error"] is None
        assert (r["sample_rate"], r["channels"], r["duration_ms"]) == (
            rate, ch, dur)
        assert abs(r["rms"] - rms) < 1e-6 and abs(r["peak"] - peak) < 1e-6
    assert got["bad"]["decode_error"] is not None


def test_media_probe_dataframe(spark):
    """media_probe unifies the audio/video and image header probes
    into one typed-metadata row per payload."""
    import numpy as np

    from hamerkop_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_gif,
        encode_wav,
        media_probe,
    )

    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, (4, 3), np.uint8)
    gif = encode_gif(rng.integers(0, 4, (15, 10), np.uint8), palette=pal)
    wav = encode_wav(rng.uniform(-1, 1, (8000, 2)), 16000)
    rows = [
        ("g", "image", bytearray(gif), "image/gif", (None,) * 4),
        ("w", "audio", bytearray(wav), "audio/wav", (None,) * 4),
        ("x", "video", bytearray(b"junk"), "video/mp4", (None,) * 4),
    ]
    got = {r["media_id"]: r for r in media_probe(
        spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    assert (got["g"]["format"], got["g"]["width"],
            got["g"]["height"]) == ("gif", 10, 15)
    assert (got["w"]["format"], got["w"]["sample_rate"],
            got["w"]["channels"], got["w"]["duration_ms"]) == (
        "wav", 16000, 2, 500)
    assert got["x"]["format"] is None


def test_review_fixes_round5():
    """Regression lock for the round-5 self-review findings:
    (1) native-codec uint16 output must NOT wrap mod 256,
    (2) WAVE_FORMAT_EXTENSIBLE float WAVs decode as float (the
        SubFormat GUID tag is honored, int-PCM misread produced
        garbage samples),
    (3) non-interleaved lossless JPEG (one scan per component)
        decodes every component — previously silently returned only
        the first scan's,
    (4) an 'OggS' byte pattern inside packet data does not hijack the
        duration probe."""
    import struct as st

    import numpy as np
    import pytest

    from hamerkop_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )
    from hamerkop_spark.operators.multimodal import (
        decode_image,
        decode_wav,
        encode_png,
        encode_wav,
        probe_media_header,
        register_codec,
        unregister_codec,
    )

    # (1) uint16 passes through the native-codec normalizer unwrapped
    rng = np.random.default_rng(41)
    a16 = rng.integers(0, 65536, (5, 4, 3), dtype=np.uint16)
    register_codec("fake16", lambda p: a16, formats=("PNG",), priority=99)
    try:
        out = decode_image(encode_png(a16))
        assert out.dtype == np.uint16 and (out == a16).all()
    finally:
        unregister_codec("fake16")

    # (2) extensible float + extensible int PCM round-trip exactly
    t = np.linspace(0, 1, 4000)
    sig = np.stack([np.sin(2 * np.pi * 440 * t)], axis=1)
    out, rate = decode_wav(encode_wav(sig, 8000, fmt_float=True,
                                      extensible=True))
    assert rate == 8000 and np.abs(out - sig).max() < 1e-6
    out, _ = decode_wav(encode_wav(sig, 8000, bits=16, extensible=True))
    assert np.abs(out - sig).max() < 1e-4
    # plain (non-extensible) float path too
    out, _ = decode_wav(encode_wav(sig, 8000, fmt_float=True))
    assert np.abs(out - sig).max() < 1e-6

    # (3) non-interleaved lossless: all components, exact; truncated
    # multi-scan stream raises instead of silently dropping data
    rgb = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    enc = encode_jpeg_lossless(rgb, predictor=4, interleaved=False)
    out = decode_jpeg(enc)
    assert out.shape == (12, 9, 3) and np.array_equal(out, rgb)
    last_sos = enc.rfind(b"\xff\xda")
    with pytest.raises(ValueError, match="missing"):
        decode_jpeg(enc[:last_sos] + b"\xff\xd9")

    # (4) 'OggS' inside packet data is skipped by the page-header
    # validity check (version byte must be 0, flags <= 0x07)
    pkt = b"\x01vorbis" + b"\x00" * 4 + bytes([2]) + st.pack("<I", 44100)
    page1 = b"OggS" + b"\x00" * 22 + bytes([1, len(pkt)]) + pkt
    page2 = (b"OggS" + b"\x00\x00" + st.pack("<q", 44100 * 7)
             + b"\x00" * 13 + b"\x00")
    # trailing garbage containing a fake capture pattern with an
    # invalid page header (version 0xFF) and a huge bogus granule
    fake = b"OggS" + b"\xff\xff" + st.pack("<q", 44100 * 9999) + b"\x00" * 5
    h = probe_media_header(page1 + page2 + fake)
    assert h["duration_ms"] == 7000, h
