"""Progressive (pay-as-you-go) ER (operators/progressive.py): ARCS
weight exactness vs a scalar oracle, sort-vs-threshold selection
parity (incl. boundary-tie semantics), the recall@budget curve, and
the dedupe_records budget knob."""

import math
import random

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.operators.progressive import (
    ARCS_SCALE,
    arcs_pair_weights,
    recall_at_budget,
    select_top_pairs,
)


def _blocks_df(spark, rows):
    return spark.createDataFrame(rows, "block_key string, record_id int")


def _scalar_arcs(rows, min_bs=2, max_bs=100):
    """Sequential oracle: the ARCS definition applied literally."""
    members: dict[str, set] = {}
    for bk, rid in set(rows):
        members.setdefault(bk, set()).add(rid)
    weights: dict[tuple, int] = {}
    shared: dict[tuple, int] = {}
    for bk, ids in members.items():
        if not (min_bs <= len(ids) <= max_bs):
            continue
        c2 = len(ids) * (len(ids) - 1) // 2
        contrib = ARCS_SCALE // c2
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                weights[(a, b)] = weights.get((a, b), 0) + contrib
                shared[(a, b)] = shared.get((a, b), 0) + 1
    return {k: (weights[k], shared[k]) for k in weights}


def _rand_blocks(seed, n_recs=40, n_keys=12, assignments=90):
    rng = random.Random(seed)
    return list({
        (f"k{rng.randrange(n_keys)}", rng.randrange(n_recs))
        for _ in range(assignments)
    })


@pytest.mark.parametrize("seed", [1, 7])
def test_arcs_weights_match_scalar_oracle(spark, seed):
    rows = _rand_blocks(seed)
    got = {
        (r["a_id"], r["b_id"]): (r["arcs_fp"], r["n_shared"])
        for r in arcs_pair_weights(_blocks_df(spark, rows)).collect()
    }
    assert got == _scalar_arcs(rows)


def test_arcs_block_purge_bounds_fanout(spark):
    # one hot key over 30 records is purged at max_block_size=10:
    # zero pairs may come from it
    rows = [("hot", i) for i in range(30)] + [("cold", 0), ("cold", 1)]
    out = arcs_pair_weights(
        _blocks_df(spark, rows), max_block_size=10
    ).collect()
    assert {(r["a_id"], r["b_id"]) for r in out} == {(0, 1)}
    assert out[0]["arcs_fp"] == ARCS_SCALE  # C(2,2 choose)=1


def _weighted_df(spark, triples):
    return spark.createDataFrame(
        triples, "a_id int, b_id int, arcs_fp long"
    )


def _top_oracle(triples, budget):
    return sorted(triples, key=lambda t: (-t[2], t[0], t[1]))[:budget]


@pytest.mark.parametrize("budget", [0, 1, 5, 17, 100])
def test_sort_and_threshold_modes_agree(spark, budget):
    rng = random.Random(3)
    # deliberately includes weight ties (small weight universe)
    triples = [
        (i, i + 1 + rng.randrange(5), rng.randrange(6) * 1000)
        for i in range(40)
    ]
    triples = list({(a, b): (a, b, w) for a, b, w in triples}.values())
    want = set(map(tuple, _top_oracle(triples, budget)))
    df = _weighted_df(spark, triples)
    got_sort = {
        tuple(r) for r in select_top_pairs(df, budget, mode="sort").collect()
    }
    got_thr = {
        tuple(r)
        for r in select_top_pairs(
            df, budget, mode="threshold", boundary="exact"
        ).collect()
    }
    assert got_sort == want
    assert got_thr == want


def test_threshold_boundary_all_and_drop(spark):
    triples = [(1, 2, 50), (1, 3, 30), (2, 3, 30), (2, 4, 30), (3, 4, 10)]
    df = _weighted_df(spark, triples)
    # budget 2 cuts inside the 30-weight tie group
    all_rows = select_top_pairs(
        df, 2, mode="threshold", boundary="all"
    ).collect()
    assert {tuple(r) for r in all_rows} == {
        (1, 2, 50), (1, 3, 30), (2, 3, 30), (2, 4, 30)
    }
    drop_rows = select_top_pairs(
        df, 2, mode="threshold", boundary="drop"
    ).collect()
    assert {tuple(r) for r in drop_rows} == {(1, 2, 50)}
    exact_rows = select_top_pairs(
        df, 2, mode="threshold", boundary="exact"
    ).collect()
    assert {tuple(r) for r in exact_rows} == {(1, 2, 50), (1, 3, 30)}


def test_threshold_budget_covers_everything(spark):
    triples = [(1, 2, 5), (1, 3, 4)]
    df = _weighted_df(spark, triples)
    got = select_top_pairs(df, 10, mode="threshold").collect()
    assert len(got) == 2


def test_recall_at_budget_curve(spark):
    # 10 pairs, truth = the top-2 and the bottom-1 by weight
    triples = [(i, i + 100, (10 - i) * 1000) for i in range(10)]
    df = _weighted_df(spark, triples)
    truth = spark.createDataFrame(
        [(0, 100), (1, 101), (9, 109)], "a_id int, b_id int"
    )
    rows = {
        r["frac"]: r
        for r in recall_at_budget(df, truth, [0.2, 0.5, 1.0]).collect()
    }
    assert rows[0.2]["budget"] == 2 and rows[0.2]["n_found"] == 2
    assert math.isclose(rows[0.2]["recall"], 2 / 3, abs_tol=1e-6)
    assert rows[0.5]["n_found"] == 2
    assert rows[1.0]["n_found"] == 3 and rows[1.0]["recall"] == 1.0


def _dup_corpus(spark, n=300, seed=11):
    """n base records plus a near-dup for every 5th one. The dup keeps
    the record's RARE token (its 2-member block is maximal ARCS
    evidence — the realistic shape: true near-dups share identifying
    tokens and differ in boilerplate) and typos the leading common
    token, so whole-string similarity still has to do the matching."""
    rng = random.Random(seed)
    rows, truth = [], []
    for i in range(n):
        name = f"acme {rng.randrange(40)} corp u{i:04d}"
        rows.append((i, name))
        if i % 5 == 0:
            rows.append((i + 10_000, "acmx" + name[4:]))
            truth.append((i, i + 10_000))
    return (
        spark.createDataFrame(rows, "record_id int, name string"),
        truth,
    )


def test_dedupe_records_budget_path(spark):
    from hamerkop_spark.plans.dedupe import dedupe_records

    recs, truth = _dup_corpus(spark)
    full = dedupe_records(recs, jw_threshold=0.9)
    budget = max(1, int(full["n_pairs"] * 0.4))
    budgeted = dedupe_records(
        recs, jw_threshold=0.9, budget=budget, budget_mode="threshold"
    )
    assert budgeted["n_pairs"] <= budget
    # ARCS front-loads the true dups: 40% of the comparisons must keep
    # >= 90% of the full run's true-dup recall
    cl = {
        r["record_id"]: r["cluster"]
        for r in budgeted["clusters"].collect()
    }
    found = sum(1 for a, b in truth if cl[a] == cl[b])
    full_cl = {
        r["record_id"]: r["cluster"] for r in full["clusters"].collect()
    }
    full_found = sum(1 for a, b in truth if full_cl[a] == full_cl[b])
    assert full_found > 0
    assert found >= 0.9 * full_found


def test_dedupe_budget_rejects_canopy(spark):
    from hamerkop_spark.plans.dedupe import dedupe_records

    recs, _ = _dup_corpus(spark, n=20)
    with pytest.raises(ValueError, match="canopy"):
        dedupe_records(
            recs, blocking=("token", "canopy"), budget=10
        )


def test_select_top_pairs_drops_null_weights(spark):
    df = spark.createDataFrame(
        [(1, 2, 50), (1, 3, None), (2, 3, 10)],
        "a_id int, b_id int, arcs_fp long",
    )
    for mode in ("sort", "threshold"):
        got = {tuple(r) for r in select_top_pairs(df, 3, mode=mode).collect()}
        assert got == {(1, 2, 50), (2, 3, 10)}, mode
