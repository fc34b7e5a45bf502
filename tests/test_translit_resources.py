"""T9 romanizer, S10/S11 resource loaders, B4 type-group conflation."""

from pyspark.sql import functions as F

from hamerkop_spark.functions.translit import romanize, romanize_py
from hamerkop_spark.operators.blocking import with_type_groups
from hamerkop_spark.sources.resources import cached_lookup, read_dictionary, read_set


def test_romanize_py():
    assert romanize_py("Москва") == "Moskva"
    assert romanize_py("Αθήνα") == "Athina"
    assert romanize_py("café") == "cafe"
    assert romanize_py("ascii") == "ascii"


def test_romanize_py_lorehlt_scripts():
    """T9 script coverage for the LoReHLT corpora the reference's uroman
    handles (string.py:135-155): Arabic (incl. Persian/Urdu letters),
    Ge'ez, Sinhala, Odia — the scripts ScriptBasedNameFilter targets
    (io.py:604-637)."""
    # Arabic script
    assert romanize_py("محمد") == "mhmd"
    assert romanize_py("بغداد") == "bghdad"
    assert romanize_py("القاهرة") == "alqahrh"
    assert romanize_py("تهران") == "thran"  # Persian
    assert romanize_py("کراچی") == "krachy"  # Urdu
    # Ge'ez (Ethiopic syllabary)
    assert romanize_py("ሰላም") == "selam"
    assert romanize_py("አዲስ አበባ") == "adis abeba"
    assert romanize_py("ኢትዮጵያ") == "ityopya"
    # Sinhala (abugida: inherent vowel, virama, two-part signs, ZWJ)
    assert romanize_py("කොළඹ") == "kolamba"
    assert romanize_py("ශ්‍රී ලංකා") == "shri lanka"
    assert romanize_py("සිංහල") == "sinhala"
    # Odia (abugida with nukta between consonant and sign)
    assert romanize_py("ଭୁବନେଶ୍ୱର") == "bhubaneshwara"
    assert romanize_py("ଓଡ଼ିଶା") == "odisha"


def test_romanize_py_cjk_indic_scripts():
    """T9 extension: Devanagari/Bengali abugidas, kana (digraphs,
    sokuon gemination, chouon long vowels, katakana fold), and
    arithmetic Hangul syllable decomposition."""
    # Devanagari
    assert romanize_py("नमस्ते") == "namaste"
    assert romanize_py("दिल्ली") == "dilli"
    assert romanize_py("मुंबई") == "munbai"
    # Bengali
    assert romanize_py("ঢাকা") == "dhaka"
    assert romanize_py("কলকাতা") == "kalakata"
    assert romanize_py("বাংলা") == "banla"
    # Kana
    assert romanize_py("さくら") == "sakura"
    assert romanize_py("とうきょう") == "toukyou"
    assert romanize_py("カタカナ") == "katakana"
    assert romanize_py("しゃしん") == "shashin"
    assert romanize_py("にっぽん") == "nippon"
    assert romanize_py("ラーメン") == "raamen"
    # Hangul
    assert romanize_py("서울") == "seoul"
    assert romanize_py("부산") == "busan"
    assert romanize_py("한국") == "hanguk"
    assert romanize_py("평양") == "pyeongyang"


def test_translit_blocking_arabic_e2e(spark):
    """B6 drive on an Arabic-script corpus: every Arabic mention links to
    its KB entity through the exact_translit generator (the KB carries
    the romanized surface as an alt-name, as the reference's translit
    index does)."""
    from hamerkop_spark.operators.blocking import exact_match_candidates

    surfaces = ["محمد", "بغداد", "القاهرة", "تهران", "دمشق", "الرباط"]
    chains = spark.createDataFrame(
        [("d", f"c{i}", "GPE", s, romanize_py(s))
         for i, s in enumerate(surfaces)],
        "doc_id string, chain_id string, type string, name string, "
        "translit_name string",
    )
    kb_names = spark.createDataFrame(
        [(f"E{i}", "GPE", romanize_py(s), 0, romanize_py(s).lower())
         for i, s in enumerate(surfaces)],
        "entity_id string, type string, name string, name_idx int, "
        "exact_key string",
    )
    hits = exact_match_candidates(
        chains, kb_names, name_col="translit_name", source="exact_translit"
    ).collect()
    linked = {(r["chain_id"], r["entity_id"]) for r in hits}
    assert linked == {(f"c{i}", f"E{i}") for i in range(len(surfaces))}


def test_romanize_column_contract(spark):
    df = spark.createDataFrame(
        [("Москва", "rus"), ("plain ascii", "rus"), ("Москва", "eng")],
        "s string, lang string",
    )
    out = df.select("s", "lang", romanize(F.col("s"), F.col("lang")).alias("r"))
    got = {(r["s"], r["lang"]): r["r"] for r in out.collect()}
    # reference contract (string.py:145-150): None for English docs and
    # pure-ASCII strings
    assert got[("Москва", "rus")] == "Moskva"
    assert got[("plain ascii", "rus")] is None
    assert got[("Москва", "eng")] is None


def test_name_projector_with_romanizer(spark):
    from hamerkop_spark.operators.preprocess import name_projector

    df = spark.createDataFrame(
        [("m1", "d", "Москва", "GPE", "newswire", "rus")],
        "mention_id string, doc_id string, string string, type string, "
        "doc_type string, lang string",
    )
    out = name_projector(romanize)(df)
    assert out.collect()[0]["translit_string"] == "Moskva"


def test_read_dictionary_and_set(spark, tmp_path):
    d = tmp_path / "dict.tsv"
    d.write_text("Running\trun\nDogs\tdog\n")
    dic = read_dictionary(spark, str(d))
    assert sorted(map(tuple, dic.collect())) == [("dogs", "dog"), ("running", "run")]
    s = tmp_path / "set.txt"
    s.write_text("Alpha\n\nBeta\nalpha\n")
    st = read_set(spark, str(s))
    assert sorted(r["value"] for r in st.collect()) == ["alpha", "beta"]


def test_cached_lookup(spark, tmp_path):
    cache = str(tmp_path / "cache")
    reqs = spark.createDataFrame([("a",), ("b",), ("a",)], "k string")
    calls = []

    def compute(misses):
        rows = [(r["key"],) for r in misses.collect()]
        calls.append(rows)
        return spark.createDataFrame(
            [(k, k.upper()) for (k,) in rows], "key string, value string"
        )

    out1 = cached_lookup(spark, cache, reqs, "k", compute)
    assert sorted((r["k"], r["value"]) for r in out1.collect()) == [
        ("a", "A"), ("a", "A"), ("b", "B")]
    # second call: everything cached, compute not invoked again
    out2 = cached_lookup(spark, cache, reqs, "k", compute)
    assert out2.count() == 3
    assert len(calls) == 1


def test_with_type_groups(spark):
    df = spark.createDataFrame(
        [("GPE",), ("LOC",), ("PER",), ("ORG",)], "type string"
    )
    out = {r["type"]: r["type_group"] for r in
           with_type_groups(df, ["GPE", "LOC"]).collect()}
    assert out == {"GPE": "GPE|LOC", "LOC": "GPE|LOC", "PER": "PER", "ORG": "ORG"}


def test_type_group_blocking(spark):
    """GPE query retrieves a LOC entity when types are conflated (B4)."""
    from hamerkop_spark.operators.blocking import exact_match_candidates
    from hamerkop_spark.schemas import KB_ENTITIES

    kb = spark.createDataFrame(
        [dict(entity_id="E1", type="LOC", name="Blue River",
              names=["Blue River"], origin="geonames", urls=[], geo_type=None,
              geo_country=None, geo_latitude=None, geo_longitude=None,
              geo_population=None, per_location=None, per_titles=None,
              per_orgs=None, org_location=None)],
        KB_ENTITIES,
    )
    from hamerkop_spark.operators.blocking import build_kb_names

    kb_names = with_type_groups(build_kb_names(kb), ["GPE", "LOC"]).drop(
        "type"
    ).withColumnRenamed("type_group", "type")
    chains = with_type_groups(
        spark.createDataFrame(
            [("d1", "c1", "GPE", "blue river")],
            "doc_id string, chain_id string, type string, name string",
        ),
        ["GPE", "LOC"],
    ).drop("type").withColumnRenamed("type_group", "type")
    hits = exact_match_candidates(chains, kb_names).collect()
    assert [(r["chain_id"], r["entity_id"]) for r in hits] == [("c1", "E1")]


def test_romanize_py_southeast_dravidian_scripts():
    """Round-3 script extension: Tamil/Telugu/Kannada/Malayalam abugidas,
    Khmer (coeng-as-virama), Myanmar (asat), Thai/Lao letter maps —
    every script langid detects now romanizes (reference string.py:135-155
    romanizes everything via uroman)."""
    cases = {
        "தமிழ்": "tamizh",
        "சென்னை": "chennai",
        "తెలుగు": "telugu",
        "హైదరాబాదు": "haidarabadu",
        "కృష్ణ": "krushna",
        "ಕನ್ನಡ": "kannada",
        "ಬೆಂಗಳೂರು": "bengaluru",
        "മലയാളം": "malayalam",
        "കേരളം": "keralam",
        "ខ្មែរ": "khmaera",
        "မြန်မာ": "mranma",
        "ရန်ကုန်": "rankun",
        "ลาว": "law",
    }
    for src, want in cases.items():
        assert romanize_py(src) == want, (src, romanize_py(src))
    # no unmapped source chars may survive for these scripts
    for src in ["กรุงเทพมหานคร", "ភ្នំពេញ", "திருவனந்தபுரம்", "ວຽງຈັນ"]:
        out = romanize_py(src)
        assert out.isascii(), (src, out)


def test_translit_blocking_thai_tamil_e2e(spark):
    """B6 drive on Thai- and Tamil-script corpora: every mention links to
    its KB entity through the exact_translit generator (KB carries the
    romanized surface as an alt-name), F1 = 1.0 — the same E2E contract
    as the Arabic test, over the newly-covered scripts."""
    from hamerkop_spark.operators.blocking import exact_match_candidates

    surfaces = [
        "กรุงเทพ", "เชียงใหม่", "ภูเก็ต",  # Thai
        "சென்னை", "மதுரை", "திருச்சி",  # Tamil
        "ಬೆಂಗಳೂರು", "മലയാളം",  # Kannada, Malayalam
    ]
    chains = spark.createDataFrame(
        [("d", f"c{i}", "GPE", s, romanize_py(s))
         for i, s in enumerate(surfaces)],
        "doc_id string, chain_id string, type string, name string, "
        "translit_name string",
    )
    kb_names = spark.createDataFrame(
        [(f"E{i}", "GPE", romanize_py(s), 0, romanize_py(s).lower())
         for i, s in enumerate(surfaces)],
        "entity_id string, type string, name string, name_idx int, "
        "exact_key string",
    )
    hits = exact_match_candidates(
        chains, kb_names, name_col="translit_name", source="exact_translit"
    ).collect()
    linked = {(r["chain_id"], r["entity_id"]) for r in hits}
    assert linked == {(f"c{i}", f"E{i}") for i in range(len(surfaces))}


def test_add_romanized_real_short_circuit(spark):
    """Review fix: add_romanized routes ONLY non-ASCII rows through the
    pandas UDF (real short-circuit) and matches the expression-form
    romanize() semantics: NULL for eng/ASCII, romanized otherwise."""
    from hamerkop_spark.functions.translit import add_romanized

    df = spark.createDataFrame(
        [
            ("a", "London", "eng"),
            ("b", "plain ascii", "rus"),
            ("c", "Москва", "rus"),
            ("d", "القاهرة", "ara"),
        ],
        "id string, name string, lang string",
    )
    got = {r["id"]: r["translit_string"]
           for r in add_romanized(df, "name", "lang").collect()}
    assert got["a"] is None and got["b"] is None
    assert got["c"] == "Moskva"
    assert got["d"] == romanize_py("القاهرة")
