"""CEAF (Luo 2005; operators/scoring.ceaf): Hungarian exactness vs
brute force, hand-computed phi3/phi4 examples, identity, and the
block-diagonal decomposition the scale path relies on."""

import itertools
import random

import math

from hamerkop_spark.operators.scoring import _hungarian_max, ceaf


def _brute_max(sim):
    n, m = len(sim), len(sim[0])
    best = 0.0
    if n <= m:
        for cols in itertools.permutations(range(m), n):
            best = max(best, sum(sim[i][cols[i]] for i in range(n)))
    else:
        for rows in itertools.permutations(range(n), m):
            best = max(best, sum(sim[rows[j]][j] for j in range(m)))
    return best


def test_hungarian_matches_brute_force():
    rng = random.Random(17)
    for trial in range(150):
        n = rng.randint(1, 5)
        m = rng.randint(1, 6)
        sim = [
            [round(rng.random() * rng.choice([0, 1, 1, 1]), 6)
             for _ in range(m)]
            for _ in range(n)
        ]
        got = _hungarian_max(sim)
        want = _brute_max(sim)
        assert math.isclose(got, want, abs_tol=1e-9), (trial, sim)


def _df(spark, chains):
    rows = [(k, c) for c, ks in chains.items() for k in ks]
    return spark.createDataFrame(rows, "mention_key int, cluster string")


def test_ceaf_hand_example(spark):
    gold = _df(spark, {"G1": [1, 2, 3, 4, 5], "G2": [6, 7]})
    pred = _df(spark, {"S1": [1, 2, 3, 4], "S2": [5, 6, 7]})
    e = ceaf(pred, gold, key="mention_key", phi="phi4")
    phi = 2 * 4 / (5 + 4) + 2 * 2 / (2 + 3)  # G1-S1 + G2-S2 optimal
    assert math.isclose(e["phi"], phi, abs_tol=1e-9)
    assert math.isclose(e["precision"], phi / 2, abs_tol=1e-9)
    assert math.isclose(e["recall"], phi / 2, abs_tol=1e-9)
    m = ceaf(pred, gold, key="mention_key", phi="phi3")
    assert math.isclose(m["phi"], 6.0, abs_tol=1e-9)  # 4 + 2 mentions
    assert math.isclose(m["precision"], 6 / 7, abs_tol=1e-9)
    assert math.isclose(m["recall"], 6 / 7, abs_tol=1e-9)


def test_ceaf_identity_and_disjoint(spark):
    chains = {"A": [1, 2, 3], "B": [4, 5], "C": [6]}
    df = _df(spark, chains)
    for phi in ("phi3", "phi4"):
        e = ceaf(df, df, key="mention_key", phi=phi)
        assert math.isclose(e["precision"], 1.0, abs_tol=1e-9)
        assert math.isclose(e["recall"], 1.0, abs_tol=1e-9)
        assert math.isclose(e["f1"], 1.0, abs_tol=1e-9)
    # fully disjoint mention universes: zero numerator, zero F1
    other = _df(spark, {"Z": [100, 101]})
    z = ceaf(other, df, key="mention_key", phi="phi4")
    assert z["phi"] == 0.0 and z["f1"] == 0.0


def test_ceaf_block_diagonal_decomposition(spark):
    # two independent "documents": CEAF phi of the union equals the
    # sum of per-document phis (the decomposition the scale path uses)
    g1 = {"G1": [1, 2, 3], "G2": [4, 5]}
    s1 = {"S1": [1, 2], "S2": [3, 4, 5]}
    g2 = {"H1": [11, 12, 13, 14]}
    s2 = {"T1": [11, 12], "T2": [13, 14]}
    for phi in ("phi3", "phi4"):
        pa = ceaf(_df(spark, s1), _df(spark, g1), "mention_key", phi)
        pb = ceaf(_df(spark, s2), _df(spark, g2), "mention_key", phi)
        both = ceaf(
            _df(spark, {**s1, **s2}), _df(spark, {**g1, **g2}),
            "mention_key", phi,
        )
        assert math.isclose(both["phi"], pa["phi"] + pb["phi"],
                            abs_tol=1e-9)


def test_ceaf_prefers_optimal_alignment_over_greedy(spark):
    # greedy phi4 matching (largest first) is suboptimal here: S1
    # overlaps both golds, and taking its best edge starves G2
    gold = _df(spark, {"G1": [1, 2, 3, 4], "G2": [5, 6]})
    pred = _df(spark, {"S1": [3, 4, 5, 6], "S2": [1, 2]})
    e = ceaf(pred, gold, key="mention_key", phi="phi3")
    # optimal: G1-S2 (2) + G2-S1 (2) = 4; greedy G1-S1 (2) leaves
    # G2-S1 blocked -> 2
    assert math.isclose(e["phi"], 4.0, abs_tol=1e-9)
