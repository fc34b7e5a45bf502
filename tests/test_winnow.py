"""Winnowing fingerprint tests: scalar differential (md5 path), the
shared-passage guarantee, and the overlap-pair story."""

import hashlib
import random
import string as _string

from hamerkop_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def rows(df, *cols):
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())


def _norm(s):
    s = s.lower()
    s = s.translate(str.maketrans("", "", _string.punctuation))
    return " ".join(s.split())


def _md5h(g, seed=17):
    return int(hashlib.md5(f"{seed}:{g}".encode()).hexdigest()[:15], 16)


def _scalar_winnow(text, k=8, window=4):
    s = _norm(text)
    grams = [s[i:i + k] for i in range(len(s) - k + 1)]
    if not grams:
        return set()
    h = [_md5h(g) for g in grams]
    if len(h) < window:
        return {min(h)}
    return {min(h[i:i + window]) for i in range(len(h) - window + 1)}


def test_differential_random_texts(spark):
    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "law", "court", "press", "mayor", "river", "bridge"]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 30))))
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {}
    for r in winnow_fingerprints(df, hash_fn="md5").collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, text in docs:
        assert got.get(i, set()) == _scalar_winnow(text), i


def test_shared_passage_guarantee(spark):
    """Any shared substring of length >= k + window - 1 (= 11 here)
    yields at least one shared fingerprint — the SIGMOD '03 theorem,
    checked across 20 random embeddings of a passage into unrelated
    noise."""
    rng = random.Random(9)
    passage = "thequickbrownfoxjumped"  # len 22 >= 11, no spaces/punct
    alpha = "bcdfghjklmnpqrstvwxyz"
    docs = []
    for i in range(20):
        noise1 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        noise2 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        docs.append((i, noise1 + passage + noise2))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fps = {}
    for r in winnow_fingerprints(df, k=8, window=4).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    shared = set.intersection(*fps.values())
    assert shared, "guaranteed shared fingerprint missing"


def test_overlap_pairs_story(spark):
    """Two docs sharing one long passage pair up; globally-different
    docs with no shared passage do not."""
    passage = "senate votes to approve the harbor bridge contract today"
    docs = [
        (0, "local news update " + passage + " more reporting follows"),
        (1, "opinion column why " + passage + " and what it means"),
        (2, "weather tomorrow sunny with light winds across the coast"),
        (3, "recipe for flatbread with rosemary and sea salt topping"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = rows(
        winnow_overlap_pairs(df, min_shared=2), "a_id", "b_id"
    )
    assert (0, 1) in pairs
    assert all({a, b} == {0, 1} for a, b in pairs)


def test_short_doc_conventions(spark):
    """len(norm) < k -> no fingerprints; k <= len < k+window-1 -> the
    single global min."""
    df = spark.createDataFrame(
        [(0, "tiny"), (1, "abcdefghij")], ["doc_id", "text"]
    )
    got = {}
    for r in winnow_fingerprints(df, k=8, window=4, hash_fn="md5").collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    assert 0 not in got
    assert got[1] == _scalar_winnow("abcdefghij")
    assert len(got[1]) == 1


def test_plan_is_udf_free(spark):
    df = spark.createDataFrame([(0, "some text here")], ["doc_id", "text"])
    plan = (
        winnow_fingerprints(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
