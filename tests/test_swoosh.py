"""Swoosh merge-closure ER (operators/swoosh.py) vs a scalar
sequential R-Swoosh oracle (Benjelloun et al., VLDB J 2009, Fig. 2).

The key property under test: the round-parallel DataFrame evaluation
returns EXACTLY the sequential R-Swoosh result (ICAR -> unique merge
closure, order-independent), including on corpora where a merge
ENABLES a match no base pair had.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.operators.swoosh import swoosh_merge


def rswoosh_scalar(recs: dict[str, set], min_shared: int):
    """Sequential R-Swoosh: records enter one at a time against the
    resolved buffer I; a match pops the partner, merges, and requeues.
    Returns {frozenset(member_ids): frozenset(values)}."""
    todo = [({rid}, frozenset(vals)) for rid, vals in sorted(recs.items())]
    done: list[tuple[set, frozenset]] = []
    while todo:
        members, vals = todo.pop(0)
        hit = None
        for i, (_, ivals) in enumerate(done):
            if len(vals & ivals) >= min_shared:
                hit = i
                break
        if hit is None:
            done.append((members, vals))
        else:
            om, ov = done.pop(hit)
            todo.append((members | om, vals | ov))
    return {frozenset(m): v for m, v in done}


def _run_spark(spark, recs: dict[str, set], min_shared: int, **kw):
    df = spark.createDataFrame(
        [(rid, sorted(vals)) for rid, vals in sorted(recs.items())],
        "record_id string, values array<string>",
    )
    entities, membership = swoosh_merge(
        df, min_shared=min_shared, **kw
    )
    ent = {
        r["entity_id"]: (tuple(r["values"]), r["n_members"])
        for r in entities.collect()
    }
    memb: dict[str, list] = {}
    for r in membership.collect():
        memb.setdefault(r["entity_id"], []).append(r["record_id"])
    return ent, memb


def _assert_parity(spark, recs, min_shared):
    ent, memb = _run_spark(spark, recs, min_shared)
    oracle = rswoosh_scalar(recs, min_shared)
    got = {frozenset(v): ent[k][0] for k, v in memb.items()}
    assert set(got) == set(oracle), "partitions differ"
    for members, vals in oracle.items():
        assert got[members] == tuple(sorted(vals)), "merged values differ"
    # entity label = min member id; n_members consistent
    for eid, members in memb.items():
        assert eid == min(members)
        assert ent[eid][1] == len(members)


def test_merge_enables_new_match(spark):
    """r3 matches NEITHER r1 nor r2 alone (1 shared value each) but
    matches their union on {A, B} — the two-round closure the decision
    -based operators cannot produce."""
    recs = {
        "r1": {"A", "X", "Y"},
        "r2": {"X", "Y", "B"},
        "r3": {"A", "B", "C"},
        "r4": {"Q", "R", "S"},
    }
    ent, memb = _run_spark(spark, recs, min_shared=2)
    assert sorted(memb["r1"]) == ["r1", "r2", "r3"]
    assert ent["r1"][0] == ("A", "B", "C", "X", "Y")
    assert memb["r4"] == ["r4"]
    _assert_parity(spark, recs, 2)


def test_cascade_three_rounds(spark):
    """A chain of merge-enabled matches: each composite unlocks the
    next record only after the previous merge."""
    recs = {
        "a": {"1", "2", "3"},
        "b": {"2", "3", "4"},   # matches a directly (2,3)
        "c": {"1", "4", "7"},   # matches a+b only ({1,4})
        "d": {"7", "9", "1"},   # matches a+b+c only ({1,7})
        "e": {"9", "8", "0"},   # never reaches 2 shared with the rest? 9 only
    }
    _assert_parity(spark, recs, 2)
    ent, memb = _run_spark(spark, recs, min_shared=2)
    assert sorted(memb["a"]) == ["a", "b", "c", "d"]
    assert memb["e"] == ["e"]


def test_min_shared_one_is_cc(spark):
    """min_shared=1: the closure equals connected components of the
    share-a-value graph (no second round can fire)."""
    recs = {
        "a": {"x"},
        "b": {"x", "y"},
        "c": {"y"},
        "d": {"z"},
    }
    ent, memb = _run_spark(spark, recs, min_shared=1)
    assert sorted(memb["a"]) == ["a", "b", "c"]
    assert memb["d"] == ["d"]
    _assert_parity(spark, recs, 1)


def test_empty_and_null_values_stay_singleton(spark):
    df = spark.createDataFrame(
        [("a", ["x", "y"]), ("b", ["x", "y"]), ("c", []), ("d", None)],
        "record_id string, values array<string>",
    )
    entities, membership = swoosh_merge(df, min_shared=2)
    memb = {r["record_id"]: r["entity_id"] for r in membership.collect()}
    assert memb["a"] == memb["b"] == "a"
    assert memb["c"] == "c" and memb["d"] == "d"
    ent = {r["entity_id"]: r["values"] for r in entities.collect()}
    assert ent["d"] == []


def test_duplicate_values_within_record_not_double_counted(spark):
    """values is a SET: ['x','x'] shares only 1 distinct value with
    ['x','q'], so min_shared=2 must not fire."""
    df = spark.createDataFrame(
        [("a", ["x", "x"]), ("b", ["x", "q"])],
        "record_id string, values array<string>",
    )
    _, membership = swoosh_merge(df, min_shared=2)
    assert membership.select("entity_id").distinct().count() == 2


def test_max_value_df_purges_hot_value(spark):
    """Every record shares the stop-value 's'; with the cap the only
    match evidence left is the clean pair."""
    recs = {
        "a": {"s", "p", "q"},
        "b": {"s", "p", "q"},
        "c": {"s", "m", "n"},
        "d": {"s", "u", "v"},
    }
    df = spark.createDataFrame(
        [(k, sorted(v)) for k, v in sorted(recs.items())],
        "record_id string, values array<string>",
    )
    _, memb_capped = swoosh_merge(df, min_shared=2, max_value_df=3)
    got = {
        r["record_id"]: r["entity_id"] for r in memb_capped.collect()
    }
    assert got["a"] == got["b"] == "a"
    assert got["c"] == "c" and got["d"] == "d"


@pytest.mark.parametrize("seed,n,vocab,k,min_shared", [
    (1, 40, 10, 3, 2),
    (2, 60, 14, 4, 2),
    (3, 60, 12, 4, 3),
    (7, 80, 18, 3, 2),
])
def test_randomized_parity_vs_sequential_rswoosh(
    spark, seed, n, vocab, k, min_shared
):
    rng = random.Random(seed)
    toks = [f"t{i}" for i in range(vocab)]
    recs = {
        f"r{i:03d}": set(rng.sample(toks, k)) for i in range(n)
    }
    _assert_parity(spark, recs, min_shared)


def test_entity_ids_are_transitive_min_and_values_sorted(spark):
    recs = {"z9": {"a", "b"}, "m5": {"a", "b"}, "c1": {"b", "a"}}
    ent, memb = _run_spark(spark, recs, min_shared=2)
    assert set(memb) == {"c1"}
    assert ent["c1"][0] == ("a", "b")


def test_convergence_guard_raises(spark):
    df = spark.createDataFrame(
        [("a", ["x", "y"]), ("b", ["x", "y"])],
        "record_id string, values array<string>",
    )
    with pytest.raises(RuntimeError, match="converge"):
        swoosh_merge(df, min_shared=2, max_rounds=0)
