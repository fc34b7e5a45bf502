"""PPRL: CLK position encodings, Dice matching, bottom-m LSH blocking."""

from pyspark.sql import functions as F

from hamerkop_spark.functions.strings import format_ngram_name
from hamerkop_spark.operators.pprl import (
    MICRO,
    clk_positions,
    dice_micro,
    pprl_candidates,
    pprl_match,
)


def _enc(col, **kw):
    return clk_positions(format_ngram_name(col), **kw)


def test_encoding_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [("jonathan smith",), ("jonathan smith",), ("maria garcia",)],
        "name string",
    ).select("name", _enc(F.col("name"), n_bits=512, k=10).alias("pos"))
    rows = df.collect()
    assert rows[0].pos == rows[1].pos           # deterministic
    assert rows[0].pos != rows[2].pos
    for r in rows:
        assert r.pos == sorted(set(r.pos))      # sorted distinct
        assert all(0 <= p < 512 for p in r.pos)
        assert len(r.pos) > 0


def test_salt_is_a_key(spark):
    df = spark.createDataFrame([("jonathan smith",)], "name string").select(
        _enc(F.col("name"), salt="").alias("p0"),
        _enc(F.col("name"), salt="secret").alias("p1"),
    )
    r = df.first()
    assert r.p0 != r.p1                         # keyed encodings differ


def test_dice_identity_and_similarity(spark):
    df = spark.createDataFrame(
        [("jonathan smith", "jonathan smith"),
         ("jonathan smith", "jonathan smyth"),
         ("jonathan smith", "xqzkv pblrwm")],
        "a string, b string",
    ).select(
        "a", "b",
        dice_micro(_enc(F.col("a")), _enc(F.col("b"))).alias("d"),
    )
    d = {(r.a, r.b): r.d for r in df.collect()}
    assert d[("jonathan smith", "jonathan smith")] == MICRO
    assert d[("jonathan smith", "jonathan smyth")] > 700_000
    assert d[("jonathan smith", "xqzkv pblrwm")] < 300_000


def test_match_end_to_end_on_perturbed_corpus(spark):
    names = [
        "jonathan smith", "maria garcia", "wei zhang", "fatima al sayed",
        "peter o brien", "ana souza", "ivan petrov", "keiko tanaka",
        "lars johansson", "amara okafor",
    ]
    a = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "a_id int, name string"
    ).select("a_id", _enc(F.col("name")).alias("a_pos"))
    # perturb: drop the last character (typo / truncation)
    b = spark.createDataFrame(
        [(i, n[:-1]) for i, n in enumerate(names)], "b_id int, name string"
    ).select("b_id", _enc(F.col("name")).alias("b_pos"))
    # bands=16: the default 8x4 LSH is tuned for ~19-char names at
    # scale and deterministically misses the shortest fixture name
    # ("keiko tanaka", 13 grams -> band survival 0.73^4); doubling the
    # bands is the documented short-name recall lever
    got = pprl_match(a, b, threshold_micro=700_000, bands=16).collect()
    matched = {(r.a_id, r.b_id) for r in got}
    assert {(i, i) for i in range(len(names))} <= matched
    # precision: no cross-name pair sneaks over the threshold
    assert all(x == y for x, y in matched)
    # and the default-bands miss is exactly the one short name
    dflt = {(r.a_id, r.b_id)
            for r in pprl_match(a, b, threshold_micro=700_000).collect()}
    assert {(i, i) for i in range(len(names))} - dflt <= {(7, 7)}


def test_candidates_blocked_not_all_pairs(spark):
    # 40 DIVERSE names (deterministic pseudorandom letters) vs their
    # perturbations: near-zero Jaccard between different names, so the
    # candidate count must sit far below the 1600 of all-pairs while
    # every true pair survives blocking
    import hashlib

    def pseudo_name(i):
        h = hashlib.sha1(f"name{i}".encode()).hexdigest()
        letters = "".join(chr(97 + int(c, 16) % 26) for c in h[:16])
        return letters[:8] + " " + letters[8:]

    names = [pseudo_name(i) for i in range(40)]
    a = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "a_id int, name string"
    ).select("a_id", _enc(F.col("name")).alias("a_pos"))
    b = spark.createDataFrame(
        [(i, n + "x") for i, n in enumerate(names)], "b_id int, name string"
    ).select("b_id", _enc(F.col("name")).alias("b_pos"))
    cand = {(r.a_id, r.b_id) for r in pprl_candidates(a, b).collect()}
    # bands=8/rows=2 is tuned for recall; short random names still share
    # enough bigram POSITIONS (small bigram space + boundary grams) for
    # ~30% background collision, so the bound is loose — the Dice
    # threshold downstream is what kills false candidates
    assert len(cand) < 40 * 40 / 2
    # recall: every true pair survives blocking
    assert {(i, i) for i in range(40)} <= cand


def test_empty_encoding_never_blocks(spark):
    a = spark.createDataFrame([(1, "")], "a_id int, name string").select(
        "a_id", _enc(F.col("name")).alias("a_pos")
    )
    b = spark.createDataFrame([(1, "")], "b_id int, name string").select(
        "b_id", _enc(F.col("name")).alias("b_pos")
    )
    # "" normalizes to "__" -> one bigram; an actually-empty position
    # array (ngram > padded length) is filtered, not joined on
    from hamerkop_spark.operators.pprl import clk_positions

    e = spark.createDataFrame([("x",)], "name string").select(
        clk_positions(F.lit(""), ngram=2).alias("p")
    )
    assert e.first().p == []
    assert pprl_candidates(
        a.select("a_id", F.array().cast("array<int>").alias("a_pos")), b
    ).count() == 0
