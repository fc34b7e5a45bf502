"""Adaptive blocking-scheme learning (operators/blocking_learn.py):
mask sufficient statistics vs a scalar oracle, exact scheme pricing,
greedy red-blue set cover behaviour, and the recall-target stop."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.operators.blocking_learn import (
    learn_blocking_scheme,
    predicate_pairs,
    scheme_mask_stats,
)

KEYERS = {
    "exact": lambda c: F.array(F.concat(F.lit("x:"), c)),
    "token": lambda c: F.transform(
        F.array_distinct(F.split(c, " ")),
        lambda t: F.concat(F.lit("t:"), t),
    ),
    "prefix3": lambda c: F.array(
        F.concat(F.lit("p:"), F.substring(c, 1, 3))
    ),
}


def _scalar_pairs(names, keyer_py, max_bs=100):
    blocks = {}
    for rid, nm in names:
        for k in keyer_py(nm):
            blocks.setdefault(k, set()).add(rid)
    pairs = set()
    for ids in blocks.values():
        if 2 <= len(ids) <= max_bs:
            pairs |= set(itertools.combinations(sorted(ids), 2))
    return pairs


_PY_KEYERS = {
    "exact": lambda nm: [f"x:{nm}"],
    "token": lambda nm: [f"t:{t}" for t in dict.fromkeys(nm.split(" "))],
    "prefix3": lambda nm: [f"p:{nm[:3]}"],
}


def _corpus(seed=5, n=60):
    rng = random.Random(seed)
    words = [f"w{j}" for j in range(25)]
    return [
        (i, f"{rng.choice(words)} {rng.choice(words)}") for i in range(n)
    ]


def _recs(spark, names):
    return spark.createDataFrame(names, "record_id int, name string")


def test_predicate_pairs_matches_scalar(spark):
    names = _corpus()
    df = _recs(spark, names)
    for kname in KEYERS:
        got = {
            (r["a_id"], r["b_id"])
            for r in predicate_pairs(
                df, KEYERS[kname], "record_id", "name"
            ).collect()
        }
        assert got == _scalar_pairs(names, _PY_KEYERS[kname]), kname


def test_mask_stats_match_scalar(spark):
    names = _corpus(seed=9)
    df = _recs(spark, names)
    # gold: a few true pairs plus one pair NO predicate covers
    gold = [(0, 1), (2, 3), (0, 59)]
    covered = {}
    for i, kname in enumerate(sorted(KEYERS)):
        for p in _scalar_pairs(names, _PY_KEYERS[kname]):
            covered[p] = covered.get(p, 0) | (1 << i)
    want_cand, want_gold = {}, {}
    for p, m in covered.items():
        want_cand[m] = want_cand.get(m, 0) + 1
    for g in gold:
        m = covered.get(g, 0)
        want_gold[m] = want_gold.get(m, 0) + 1
    rows = scheme_mask_stats(
        df, spark.createDataFrame(gold, "a_id int, b_id int"), KEYERS
    ).collect()
    got_cand = {r["mask"]: r["n_candidates"] for r in rows if r["n_candidates"]}
    got_gold = {r["mask"]: r["n_gold"] for r in rows if r["n_gold"]}
    assert got_cand == want_cand
    assert got_gold == want_gold


def test_learned_scheme_prefers_cheap_covering_predicate(spark):
    # corpus where "exact" covers all gold at minimal cost and "token"
    # adds a flood of candidates for no extra gold
    names = [(i, f"acme {i % 4}") for i in range(40)]
    df = _recs(spark, names)
    gold = [
        (a, b)
        for a in range(40)
        for b in range(a + 1, 40)
        if a % 4 == b % 4
    ][:30]
    res = learn_blocking_scheme(
        df,
        spark.createDataFrame(gold, "a_id int, b_id int"),
        KEYERS,
        target_recall=0.99,
    )
    assert res["scheme"][0] == "exact"
    # exact alone reaches every coverable gold pair here: greedy stops
    assert len(res["scheme"]) == 1
    assert res["steps"][0]["n_gold_covered"] == res["n_gold_coverable"]


def test_greedy_adds_second_predicate_for_remaining_gold(spark):
    # half the gold needs "exact", half needs "prefix3" (typo'd tail)
    names = []
    gold = []
    for i in range(20):
        names.append((i, f"alpha{i:02d} beta"))
        names.append((i + 100, f"alpha{i:02d} beta"))
        gold.append((i, i + 100))
    for i in range(20, 30):
        # no shared token, different exact key: only prefix3 ("del")
        # puts these in one block
        names.append((i, f"delta{i:02d}a one{i}"))
        names.append((i + 100, f"delta{i:02d}b two{i}"))
        gold.append((i, i + 100))
    df = _recs(spark, names)
    res = learn_blocking_scheme(
        df,
        spark.createDataFrame(gold, "a_id int, b_id int"),
        KEYERS,
        target_recall=1.0,
    )
    assert set(res["scheme"]) >= {"exact", "prefix3"}
    assert res["steps"][-1]["n_gold_covered"] == res["n_gold_coverable"] == 30


def test_max_predicates_and_uncoverable_gold(spark):
    names = _corpus(seed=4)
    df = _recs(spark, names)
    gold = spark.createDataFrame(
        [(0, 1), (1000, 2000)], "a_id int, b_id int"
    )  # (1000, 2000) not in corpus: uncoverable
    res = learn_blocking_scheme(
        df, gold, KEYERS, target_recall=1.0, max_predicates=1
    )
    assert len(res["scheme"]) <= 1
    assert res["n_gold"] == 2
    assert res["n_gold_coverable"] <= 1


def test_scheme_pricing_is_exact_union(spark):
    # cross-check: greedy step counts equal brute-force union pricing
    names = _corpus(seed=13, n=80)
    df = _recs(spark, names)
    gold_pairs = list(_scalar_pairs(names, _PY_KEYERS["token"]))[:12]
    res = learn_blocking_scheme(
        df,
        spark.createDataFrame(gold_pairs, "a_id int, b_id int"),
        KEYERS,
        target_recall=1.0,
    )
    chosen = res["scheme"]
    union_cand = set()
    union_gold = set()
    for kname in chosen:
        p = _scalar_pairs(names, _PY_KEYERS[kname])
        union_cand |= p
        union_gold |= p & set(gold_pairs)
    assert res["steps"][-1]["n_candidates"] == len(union_cand)
    assert res["steps"][-1]["n_gold_covered"] == len(union_gold)
