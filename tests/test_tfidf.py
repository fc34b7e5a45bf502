"""TF-IDF cosine and SoftTFIDF (functions/tfidf.py)."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows
from hamerkop_spark.functions.tfidf import (
    soft_tfidf_pairs,
    tfidf_cosine_pairs,
    tfidf_norms,
    tfidf_weights,
    token_idf,
)

CORPUS = [
    ("r1", ["acme", "corp"]),
    ("r2", ["acme", "corporation"]),
    ("r3", ["smith", "household", "goods"]),
    ("r4", ["acme", "corp", "intl"]),
    ("r5", ["smith", "corp"]),
]


@pytest.fixture(scope="module")
def vectors(spark):
    recs = spark.createDataFrame(CORPUS, "record_id string, tokens array<string>")
    idf = token_idf(recs, "tokens")
    w = tfidf_weights(recs, idf).localCheckpoint()
    n = tfidf_norms(w).localCheckpoint()
    return recs, idf, w, n


def _py_idf_fp(n, df):
    return math.floor(math.log1p(n / df) * 1e6)


def _py_weights():
    n = len(CORPUS)
    df = {}
    for _, toks in CORPUS:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = {}
    for rid, toks in CORPUS:
        v = {}
        for t in toks:
            v[t] = v.get(t, 0) + 1
        out[rid] = {t: c * _py_idf_fp(n, df[t]) for t, c in v.items()}
    return out


def _py_cosine_fp(a, b):
    w = _py_weights()
    dot = sum(w[a][t] * w[b][t] for t in w[a] if t in w[b])
    na = math.sqrt(sum(x * x for x in w[a].values()))
    nb = math.sqrt(sum(x * x for x in w[b].values()))
    return math.floor(dot / na / nb * 1e6 + 0.5)


def test_token_idf_values(spark, vectors):
    _, idf, _, _ = vectors
    got = dict((r.token, (r.df_cnt, r.idf_fp)) for r in idf.collect())
    assert got["acme"] == (3, _py_idf_fp(5, 3))
    assert got["goods"] == (1, _py_idf_fp(5, 1))
    assert got["corp"] == (3, _py_idf_fp(5, 3))


def test_tfidf_cosine_matches_hand_formula(spark, vectors):
    _, _, w, n = vectors
    pairs = spark.createDataFrame(
        [("r1", "r2"), ("r1", "r4"), ("r3", "r5"), ("r1", "r3")],
        "a_id string, b_id string",
    )
    out = {
        (r.a_id, r.b_id): r.tfidf_cosine_fp
        for r in tfidf_cosine_pairs(pairs, w, n).collect()
    }
    for a, b in [("r1", "r2"), ("r1", "r4"), ("r3", "r5")]:
        assert out[(a, b)] == _py_cosine_fp(a, b), (a, b)
    # r1 and r3 share no token
    assert out[("r1", "r3")] == 0


def test_tfidf_cosine_self_is_one(spark, vectors):
    _, _, w, n = vectors
    pairs = spark.createDataFrame([("r3", "r3")], "a_id string, b_id string")
    assert tfidf_cosine_pairs(pairs, w, n).collect()[0].tfidf_cosine_fp == 1000000


def test_soft_tfidf_theta_one_reduces_to_cosine(spark, vectors):
    _, _, w, n = vectors
    pairs = spark.createDataFrame(
        [("r1", "r2"), ("r1", "r4"), ("r3", "r5"), ("r1", "r3")],
        "a_id string, b_id string",
    )
    hard = {
        (r.a_id, r.b_id): r.tfidf_cosine_fp / 1e6
        for r in tfidf_cosine_pairs(pairs, w, n).collect()
    }
    soft = {
        (r.a_id, r.b_id): r.soft_tfidf
        for r in soft_tfidf_pairs(pairs, w, n, theta=1.0).collect()
    }
    for k in hard:
        assert abs(hard[k] - soft[k]) < 2e-6, k


def test_soft_tfidf_credits_close_tokens(spark, vectors):
    _, _, w, n = vectors
    # corp vs corporation: JW ~ 0.87 — invisible to hard cosine on the
    # non-acme component, credited by the soft kernel at theta 0.8
    pairs = spark.createDataFrame([("r1", "r2")], "a_id string, b_id string")
    hard = tfidf_cosine_pairs(pairs, w, n).collect()[0].tfidf_cosine_fp / 1e6
    soft = soft_tfidf_pairs(pairs, w, n, theta=0.8).collect()[0].soft_tfidf
    assert soft > hard + 0.05


def test_soft_tfidf_no_close_tokens_is_zero(spark, vectors):
    _, _, w, n = vectors
    pairs = spark.createDataFrame([("r1", "r3")], "a_id string, b_id string")
    assert soft_tfidf_pairs(pairs, w, n, theta=0.95).collect()[0].soft_tfidf == 0.0


def test_min_df_prunes_vocabulary(spark, vectors):
    recs, _, _, _ = vectors
    idf2 = token_idf(recs, "tokens", min_df=2)
    toks = {r.token for r in idf2.collect()}
    assert "goods" not in toks and "acme" in toks


def test_attach_tfidf_cosine_wrapper(spark, vectors):
    from hamerkop_spark.functions.tfidf import attach_tfidf_cosine

    recs, _, w, n = vectors
    pairs = spark.createDataFrame(
        [("r1", "r2"), ("r1", "r3")], "a_id string, b_id string"
    )
    out = attach_tfidf_cosine(pairs, recs, soft_theta=0.8)
    got = {(r.a_id, r.b_id): (r.tfidf_cosine_fp, r.soft_tfidf)
           for r in out.collect()}
    # matches the component-built result
    direct = {
        (r.a_id, r.b_id): r.tfidf_cosine_fp
        for r in tfidf_cosine_pairs(pairs, w, n).collect()
    }
    for k in got:
        assert got[k][0] == direct[k]
    assert got[("r1", "r2")][1] > 0.5
    assert got[("r1", "r3")][1] == 0.0


def test_pairs_with_empty_vectors_get_zero_not_dropped(spark, vectors):
    _, idf, _, _ = vectors
    # r_empty has no tokens -> no weights, no norms row
    recs2 = spark.createDataFrame(
        CORPUS + [("r_empty", [])], "record_id string, tokens array<string>"
    )
    from hamerkop_spark.functions.tfidf import attach_tfidf_cosine

    pairs = spark.createDataFrame(
        [("r1", "r_empty"), ("r_empty", "r2"), ("r1", "r2")],
        "a_id string, b_id string",
    )
    out = attach_tfidf_cosine(pairs, recs2, soft_theta=0.9)
    got = {(r.a_id, r.b_id): (r.tfidf_cosine_fp, r.soft_tfidf)
           for r in out.collect()}
    assert len(got) == 3                       # nothing dropped
    assert got[("r1", "r_empty")] == (0, 0.0)
    assert got[("r_empty", "r2")] == (0, 0.0)
    assert got[("r1", "r2")][0] > 0

def _py_soft_lev_fp(a, b, theta_micro):
    """Scalar oracle for soft_tfidf_lev_pairs' exact conventions."""
    def lev(x, y):
        dp = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            prev, dp[0] = dp[0], i
            for j, cy in enumerate(y, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (cx != cy)
                )
        return dp[len(y)]

    def sim(x, y):
        L = max(len(x), len(y))
        return ((L - lev(x, y)) * 1_000_000) // L

    w = _py_weights()
    num = 0
    for ta, wa in w[a].items():
        best = None
        for tb, wb in w[b].items():
            s = sim(ta, tb)
            if s < theta_micro:
                continue
            key = (-s, -wb, tb)
            if best is None or key < best[0]:
                best = (key, wb, s)
        if best is not None:
            num += ((wa * best[1]) // 1_000_000) * best[2]
    na = math.sqrt(sum(x * x for x in w[a].values()))
    nb = math.sqrt(sum(x * x for x in w[b].values()))
    return math.floor(num / na / nb * 1e6 + 0.5)

def test_soft_tfidf_lev_matches_scalar_oracle(spark, vectors):
    from hamerkop_spark.functions.tfidf import soft_tfidf_lev_pairs

    _, _, w, n = vectors
    pairs = spark.createDataFrame(
        [("r1", "r2"), ("r1", "r4"), ("r3", "r5"), ("r1", "r3")],
        "a_id string, b_id string",
    )
    for theta in (600_000, 900_000):
        out = {
            (r.a_id, r.b_id): r.soft_tfidf_lev_fp
            for r in soft_tfidf_lev_pairs(
                pairs, w, n, theta_micro=theta
            ).collect()
        }
        for k in out:
            assert out[k] == _py_soft_lev_fp(*k, theta), (k, theta)

def test_soft_tfidf_lev_theta_one_calibrates_to_cosine(spark, vectors):
    from hamerkop_spark.functions.tfidf import soft_tfidf_lev_pairs

    _, _, w, n = vectors
    pairs = spark.createDataFrame(
        [("r1", "r2"), ("r1", "r4"), ("r3", "r5")],
        "a_id string, b_id string",
    )
    hard = {
        (r.a_id, r.b_id): r.tfidf_cosine_fp
        for r in tfidf_cosine_pairs(pairs, w, n).collect()
    }
    soft = {
        (r.a_id, r.b_id): r.soft_tfidf_lev_fp
        for r in soft_tfidf_lev_pairs(pairs, w, n, theta_micro=1_000_000).collect()
    }
    # identical-token kernel only; gap bounded by the per-term
    # (w_a*w_b div 1e6) scale-down floor, normalized: allow 1 millionth
    # per shared token plus rounding
    for k in hard:
        assert 0 <= hard[k] - soft[k] <= 4, k

def test_soft_tfidf_lev_credits_corp_corporation(spark, vectors):
    from hamerkop_spark.functions.tfidf import soft_tfidf_lev_pairs

    _, _, w, n = vectors
    # corp vs corporation: lev 7, L 11 -> sim_micro 363636; visible at
    # theta 300k, invisible at 900k
    pairs = spark.createDataFrame([("r1", "r2")], "a_id string, b_id string")
    lo = soft_tfidf_lev_pairs(pairs, w, n, theta_micro=300_000).collect()[0]
    hi = soft_tfidf_lev_pairs(pairs, w, n, theta_micro=900_000).collect()[0]
    assert lo.soft_tfidf_lev_fp > hi.soft_tfidf_lev_fp
