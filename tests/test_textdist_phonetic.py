"""Distance bundle + phonetic keys."""

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.functions import phonetic as PH
from hamerkop_spark.functions import textdist as TD


def pairs_df(spark, rows):
    return spark.createDataFrame(rows, "a string, b string")


def test_native_levenshtein_matches_python(spark):
    rows = [("kitten", "sitting"), ("abc", "abc"), ("", "xy"), ("flaw", "lawn")]
    df = pairs_df(spark, rows).select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    )
    for r in df.collect():
        assert r["d"] == TD.levenshtein_py(r["a"], r["b"])


def test_levenshtein_norm(spark):
    df = pairs_df(spark, [("abcd", "abcx")]).select(
        TD.levenshtein_norm(F.col("a"), F.col("b")).alias("v")
    )
    assert df.collect()[0]["v"] == pytest.approx(0.25)


def test_jaro_winkler_known_values(spark):
    # standard published values
    cases = {
        ("MARTHA", "MARHTA"): 0.9611,
        ("DIXON", "DICKSONX"): 0.8133,
        ("JELLYFISH", "SMELLYFISH"): 0.8963,
        ("same", "same"): 1.0,
        ("", "x"): 0.0,
    }
    df = pairs_df(spark, list(cases)).select(
        "a", "b", TD.jaro_winkler_udf(F.col("a"), F.col("b")).alias("v")
    )
    for r in df.collect():
        assert r["v"] == pytest.approx(cases[(r["a"], r["b"])], abs=1e-3)


def test_token_jaccard(spark):
    df = spark.createDataFrame(
        [(["a", "b"], ["b", "c"])], "a array<string>, b array<string>"
    ).select(TD.token_jaccard(F.col("a"), F.col("b")).alias("v"))
    assert df.collect()[0]["v"] == pytest.approx(1 / 3)


def test_cosine_native(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0]), ([0.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    ).select(TD.cosine_native(F.col("a"), F.col("b")).alias("v"))
    vals = [r["v"] for r in df.collect()]
    assert vals[0] == pytest.approx(0.0)
    assert vals[1] == pytest.approx(1.0)
    assert vals[2] == 0.0  # zero-norm guard


def test_soundex_groups_variants(spark):
    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("John Smith",), ("Jon Smith",)], "s string"
    ).select("s", PH.soundex_key(F.col("s")).alias("k"))
    got = {r["s"]: r["k"] for r in df.collect()}
    assert got["Robert"] == got["Rupert"] == "R163"
    assert got["John Smith"] == got["Jon Smith"]  # first token only


def test_nysiis_deterministic_and_groups():
    # standard NYSIIS reference values
    assert PH.nysiis_py("Smith") == "SNAT"
    assert PH.nysiis_py("Brown") == PH.nysiis_py("Braun") == "BRAN"
    assert PH.nysiis_py("") == ""
    assert PH.nysiis_py("MacDonald").startswith("MC")


def test_metaphone_groups_variants():
    assert PH.metaphone_py("Smith") == PH.metaphone_py("Smyth")
    assert PH.metaphone_py("Katherine") == PH.metaphone_py("Catherine")
    assert PH.metaphone_py("") == ""


def test_phonetic_udfs(spark):
    df = spark.createDataFrame([("Smith",), ("Smyth",)], "s string").select(
        "s", PH.nysiis_udf(F.col("s")).alias("n"), PH.metaphone_udf(F.col("s")).alias("m")
    )
    rows = {r["s"]: r for r in df.collect()}
    # UDFs agree with the pure-python functions
    assert rows["Smith"]["n"] == PH.nysiis_py("Smith")
    assert rows["Smyth"]["n"] == PH.nysiis_py("Smyth")
    # metaphone groups the spelling variants
    assert rows["Smith"]["m"] == rows["Smyth"]["m"]


def test_jaro_winkler_np_matches_scalar_exactly():
    """The batch-vectorized JW must be bit-identical to the scalar
    definition across random + classic + unicode cases."""
    import random

    import numpy as np

    from hamerkop_spark.functions.textdist import (
        jaro_winkler_np,
        jaro_winkler_py,
    )

    rng = random.Random(7)
    alpha = "abcdefgh "
    cases = [
        ("", ""), ("a", ""), ("", "a"), ("a", "a"), ("ab", "ba"),
        ("martha", "marhta"), ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"), ("абвгд", "абгвд"),
        ("x" * 40, "x" * 39 + "y"),
    ]
    for _ in range(2000):
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        cases.append(
            ("".join(rng.choice(alpha) for _ in range(n1)),
             "".join(rng.choice(alpha) for _ in range(n2)))
        )
    xs = np.array([c[0] for c in cases], dtype="U")
    ys = np.array([c[1] for c in cases], dtype="U")
    got = jaro_winkler_np(xs, ys)
    for i, (a, b) in enumerate(cases):
        assert abs(got[i] - jaro_winkler_py(a, b)) < 1e-12, (a, b)


def test_soundex_portable_vectors(spark):
    """Russell-variant soundex (no H/W collapse rule) against classic
    vectors; the H/W case documents the deliberate divergence from
    American Soundex."""
    from pyspark.sql import functions as F

    from hamerkop_spark.functions.phonetic import soundex_portable

    cases = {
        "Robert": "R163", "Rupert": "R163", "Tymczak": "T522",
        "Pfister": "P236", "Jackson": "J250", "Honeyman": "H555",
        "AB": "A100", "a": "A000", "": "", "123": "",
        "Ashcraft": "A226",  # American soundex says A261 (H/W rule)
        # ASCII-only case fold: Java upper('ß')='SS' vs DuckDB 'ẞ' would
        # diverge; both sides now strip it
        "straße": "S360", "Müller": "M460",
    }
    df = spark.createDataFrame([(k,) for k in cases], "name string")
    got = {r["name"]: r["sx"] for r in
           df.select("name", soundex_portable(F.col("name")).alias("sx")).collect()}
    assert got == cases


def test_double_metaphone_published_vectors():
    """Double Metaphone (Philips, C/C++ Users Journal 2000) against the
    widely-published vector set, incl. the ambiguous-reading pairs
    (anglicized vs continental) and the slavo-germanic branch."""
    from hamerkop_spark.functions.phonetic import double_metaphone_py as dm

    assert dm("Smith") == ("SM0", "XMT")
    assert dm("Schmidt") == ("XMT", "SMT")
    assert dm("Johnson") == ("JNSN", "ANSN")
    assert dm("Williams") == ("ALMS", "FLMS")
    assert dm("Jones") == ("JNS", "ANS")
    assert dm("Jackson") == ("JKSN", "AKSN")
    assert dm("Wilson") == ("ALSN", "FLSN")
    assert dm("White") == ("AT", "AT")
    assert dm("Garcia") == ("KRS", "KRX")
    assert dm("Wright") == ("RT", "RT")
    assert dm("Knight") == ("NT", "NT")
    assert dm("Philip") == ("FLP", "FLP")
    assert dm("Katherine") == ("K0RN", "KTRN")
    assert dm("Michael") == ("MKL", "MXL")
    assert dm("Jose") == ("HS", "HS")
    assert dm("San Jose") == ("SNHS", "SNHS")
    assert dm("Xavier") == ("SF", "SFR")
    assert dm("Young") == ("ANK", "ANK")
    assert dm("Mitchell") == ("MXL", "MXL")
    assert dm("Thomas") == ("TMS", "TMS")
    assert dm("Wasserman") == ("ASRMN", "FSRMN")
    assert dm("Vasserman") == ("FSRMN", "FSRMN")
    assert dm("Arnow") == ("ARN", "ARNF")
    assert dm("Arnoff") == ("ARNF", "ARNF")
    assert dm("filipowicz") == ("FLPTS", "FLPFX")
    assert dm("") == ("", "")
    assert dm("123") == ("", "")


def test_double_metaphone_groups_misspellings():
    """The blocking property: common misspellings / hearings of PER
    names share at least one DM key (primary OR secondary)."""
    from hamerkop_spark.functions.phonetic import double_metaphone_py as dm

    pairs = [
        ("Smith", "Smyth"), ("Catherine", "Katherine"),
        ("Jonson", "Johnson"), ("Phillip", "Filip"),
        ("Stephen", "Steven"), ("Meyer", "Maier"),
        ("Schwartz", "Shwartz"), ("Peterson", "Petersen"),
    ]
    for a, b in pairs:
        ka, kb = set(dm(a)), set(dm(b))
        assert ka & kb, (a, b, ka, kb)


def test_double_metaphone_blocking(spark):
    """double_metaphone key family in phonetic_candidates: misspelled
    probes retrieve their entity; recall on the misspelled PER set is
    >= the char-ngram path's on the same names."""
    from pyspark.sql import functions as F

    from hamerkop_spark.operators.blocking import (
        build_ngram_postings,
        ngram_candidates,
        phonetic_candidates,
    )

    gold = [
        ("E0", "Smith"), ("E1", "Johnson"), ("E2", "Katherine"),
        ("E3", "Steven"), ("E4", "Schwartz"), ("E5", "Peterson"),
        ("E6", "Meyer"), ("E7", "Phillip"),
    ]
    probes = [
        ("c0", "Smyth", "E0"), ("c1", "Jonson", "E1"),
        ("c2", "Catherine", "E2"), ("c3", "Stephen", "E3"),
        ("c4", "Shwartz", "E4"), ("c5", "Petersen", "E5"),
        ("c6", "Maier", "E6"), ("c7", "Filip", "E7"),
    ]
    kb_names = spark.createDataFrame(
        [(e, "PER", nm, 0, nm.lower()) for e, nm in gold],
        "entity_id string, type string, name string, name_idx int, "
        "exact_key string",
    )
    chains = spark.createDataFrame(
        [("d", c, "PER", nm) for c, nm, _ in probes],
        "doc_id string, chain_id string, type string, name string",
    )
    want = {(c, e) for c, _, e in probes}

    dm_hits = phonetic_candidates(chains, kb_names, key="double_metaphone")
    dm_got = {(r["chain_id"], r["entity_id"]) for r in dm_hits.collect()}
    dm_recall = len(dm_got & want) / len(want)

    postings, _ = build_ngram_postings(kb_names)
    ng_hits = ngram_candidates(chains, postings, limit=25)
    ng_got = {(r["chain_id"], r["entity_id"]) for r in ng_hits.collect()}
    ng_recall = len(ng_got & want) / len(want)

    assert dm_recall >= ng_recall
    assert dm_recall >= 0.75


def test_jaro_winkler_np_bucketing_invariant():
    """The adaptive length-bucketed dispatch (jaro_winkler_np) must be
    bit-identical to one unbucketed core call, on a batch big enough to
    produce MULTIPLE buckets (> _JW_BUCKET_MIN rows, heterogeneous
    lengths, long outliers, empties) — the 2,010-case scalar-parity test
    above stays below the flush threshold and only covers the
    single-bucket path."""
    import random

    import numpy as np

    from hamerkop_spark.functions.textdist import (
        _JW_BUCKET_MIN,
        _jaro_winkler_np_core,
        jaro_winkler_np,
        jaro_winkler_py,
    )

    rng = random.Random(11)
    alpha = "abcdefghij "
    n = _JW_BUCKET_MIN * 3 + 17
    def name():
        ln = rng.choice([0, 1, 3, 7, 12, 15, 22, 30, 64])
        return "".join(rng.choice(alpha) for _ in range(ln))
    xs = np.array([name() for _ in range(n)], dtype="U")
    ys = np.array([name() for _ in range(n)], dtype="U")
    got = jaro_winkler_np(xs, ys)
    ref = _jaro_winkler_np_core(xs, ys)
    assert np.array_equal(got, ref)  # bucketing is a pure reordering
    for i in rng.sample(range(n), 200):  # and both match the scalar law
        assert abs(got[i] - jaro_winkler_py(str(xs[i]), str(ys[i]))) < 1e-12


# --------------------------------------------------------- affine gap


def test_affine_gap_np_matches_scalar_exactly():
    """The batch-vectorized Gotoh DP (min-plus prefix-scan Y matrix)
    must be integer-identical to the scalar three-matrix definition."""
    import random

    import numpy as np

    from hamerkop_spark.functions.textdist import (
        affine_gap_np,
        affine_gap_py,
    )

    rng = random.Random(11)
    alpha = "abcdef "
    cases = [
        ("", ""), ("a", ""), ("", "abc"), ("abc", "abc"),
        ("john smith", "john q. smith"), ("абвгд", "абгвд"),
        ("x" * 40, "x" * 3), ("東京", "東京都"),
    ]
    for _ in range(2500):
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        cases.append(
            ("".join(rng.choice(alpha) for _ in range(n1)),
             "".join(rng.choice(alpha) for _ in range(n2)))
        )
    xs = np.array([c[0] for c in cases], dtype="U")
    ys = np.array([c[1] for c in cases], dtype="U")
    got = affine_gap_np(xs, ys)
    for i, (a, b) in enumerate(cases):
        assert got[i] == affine_gap_py(a, b), (a, b)


def test_affine_gap_hand_vectors():
    from hamerkop_spark.functions.textdist import (
        AFFINE_EXT,
        AFFINE_OPEN,
        affine_gap_py,
        affine_gap_sim_py,
    )

    # one contiguous 3-char insertion: open + 2*ext
    assert affine_gap_py("john smith", "john q. smith") \
        == AFFINE_OPEN + 2 * AFFINE_EXT
    # the SAME character count scattered as three isolated inserts
    # costs three opens — the affine property Levenshtein lacks
    assert affine_gap_py("abcdef", "aXbcYdeZf") == 3 * AFFINE_OPEN
    assert affine_gap_py("kitten", "kitten") == 0
    # pure substitution path
    assert affine_gap_py("kitten", "mitten") == 2
    # sim form: identical -> 1, empty-vs-nonempty -> 0, monotone
    assert affine_gap_sim_py("", "") == 1.0
    assert affine_gap_sim_py("", "abc") == 0.0
    block = affine_gap_sim_py("jonathan smith", "jonathan q smith")
    scattered = affine_gap_sim_py("jonathan smith", "jXonathan Ysmith")
    assert block > scattered


def test_affine_gap_udf_and_dedupe_scorer(spark):
    """affine_gap_sim_udf matches the scalar sim; dedupe_records
    scorer="affine_gap" links the middle-initial variant that
    whole-string JW at the same threshold misses."""
    from hamerkop_spark.functions.textdist import (
        affine_gap_sim_py,
        affine_gap_sim_udf,
    )
    from hamerkop_spark.plans.dedupe import dedupe_records

    df = spark.createDataFrame(
        [("anna maria lopez", "anna ml lopez"),
         ("john smith", "john quincy smith"),
         ("", "x")],
        "a string, b string",
    )
    rows = df.withColumn("s", affine_gap_sim_udf("a", "b")).collect()
    for r in rows:
        assert abs(r["s"] - affine_gap_sim_py(r["a"], r["b"])) < 1e-12

    recs = spark.createDataFrame(
        [(1, "jonathan smithfield"), (2, "jonathan q smithfield"),
         (3, "maria lopez"), (4, "unrelated name")],
        "record_id int, name string",
    )
    out = dedupe_records(
        recs, blocking=("token",), scorer="affine_gap", jw_threshold=0.8
    )
    cl = {r.record_id: r.cluster for r in out["clusters"].collect()}
    assert cl[1] == cl[2]
    assert cl[3] != cl[1] and cl[4] != cl[1]
    assert "affine_gap" in out["pairs"].columns
