"""Weighted synchronous label propagation (operators/lpa.py): exact
parity vs a scalar reference round loop, weighted-vote splitting that
distinguishes it from CC, deterministic min-label tie-breaks,
duplicate-pair summing, fixpoint early-exit equivalence, string ids."""

import random

import pytest

from hamerkop_spark.operators.lpa import label_propagation


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _scalar_lpa(edges, rounds):
    """Sequential exact replay: synchronous rounds, integer vote
    sums plus the max-incident self-retention vote, argmax label
    with min-label tie-break, early fixpoint."""
    w = {}
    for a, b, s in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        w[k] = w.get(k, 0) + s
    adj = {}
    for (a, b), s in w.items():
        adj.setdefault(a, {})[b] = s
        adj.setdefault(b, {})[a] = s
    mw = {v: max(nbrs.values()) for v, nbrs in adj.items()}
    lab = {u: u for u in adj}
    for _ in range(rounds):
        new = {}
        for v, nbrs in adj.items():
            votes = {lab[v]: mw[v]}
            for u, s in nbrs.items():
                votes[lab[u]] = votes.get(lab[u], 0) + s
            new[v] = min(
                lb for lb, s in votes.items()
                if s == max(votes.values())
            )
        if new == lab:
            break
        lab = new
    return set(lab.items())


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "a_id int, b_id int, w_micro long")


def _rand_weighted(seed, n=40, m=110, wmax=1000):
    rng = random.Random(seed)
    seen = set()
    edges = []
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b or (min(a, b), max(a, b)) in seen:
            continue
        seen.add((min(a, b), max(a, b)))
        edges.append((min(a, b), max(a, b), rng.randrange(1, wmax)))
    return edges


def test_lpa_matches_scalar_reference(spark):
    for seed in (2, 9, 17, 31):
        edges = _rand_weighted(seed)
        for rounds in (1, 3):
            got = set(rows(label_propagation(_edges_df(spark, edges), rounds)))
            assert got == _scalar_lpa(edges, rounds), (seed, rounds)


def test_lpa_splits_weak_bridge_that_cc_chains(spark):
    # two 4-cliques at weight 100, one weight-1 bridge (3,10): CC
    # gives one 8-record cluster; LPA's weighted vote keeps each
    # side on its own label because the bridge vote (1) never beats
    # the intra-clique votes (>= 100).
    g1, g2 = [0, 1, 2, 3], [10, 11, 12, 13]
    edges = []
    for grp in (g1, g2):
        for i, a in enumerate(grp):
            for b in grp[i + 1:]:
                edges.append((a, b, 100))
    edges.append((3, 10, 1))
    got = set(rows(label_propagation(_edges_df(spark, edges), 5)))
    labels1 = {lab for u, lab in got if u in g1}
    labels2 = {lab for u, lab in got if u in g2}
    assert len(labels1) == 1 and len(labels2) == 1
    assert labels1 != labels2
    assert got == _scalar_lpa(edges, 5)


def test_lpa_tie_break_is_min_label(spark):
    # node 2 hears equal-weight votes for labels 1 and 3 (and its
    # own retention vote ties too): the deterministic rule picks 1.
    edges = [(1, 2, 50), (2, 3, 50)]
    got = dict(rows(label_propagation(_edges_df(spark, edges), 1)))
    assert got[2] == 1
    assert set(got.items()) == _scalar_lpa(edges, 1)


def test_lpa_isolated_pair_converges_to_min_label(spark):
    # THE entity-resolution base case: one duplicate pair. Pure
    # synchronous LPA swaps labels forever (4 takes 5's, 5 takes
    # 4's); the max-incident retention vote ties both sides and the
    # min-label rule lands them together on 4 — stably.
    got = dict(rows(label_propagation(_edges_df(spark, [(4, 5, 100)]), 6)))
    assert got == {4: 4, 5: 4}


def test_lpa_duplicate_pairs_are_summed(spark):
    # duplicate observations of (2,3) fold before voting and before
    # the retention max; parity with the scalar replay proves both
    edges = [(1, 2, 50), (2, 3, 30), (3, 2, 30), (1, 3, 20)]
    for rounds in (1, 2, 4):
        got = set(rows(label_propagation(_edges_df(spark, edges), rounds)))
        assert got == _scalar_lpa(edges, rounds), rounds


def test_lpa_fixpoint_early_exit_matches_fixed_rounds(spark):
    # a clique reaches its fixpoint in 2 rounds; 3 and 30 rounds must
    # agree exactly (the early exit is a no-op, not an approximation)
    edges = [(a, b, 10) for a in range(5) for b in range(a + 1, 5)]
    df = _edges_df(spark, edges)
    assert rows(label_propagation(df, 3)) == rows(label_propagation(df, 30))


def test_lpa_string_ids(spark):
    df = spark.createDataFrame(
        [("ann", "anne", 100), ("anne", "annie", 100), ("ann", "annie", 100)],
        "a_id string, b_id string, w_micro long",
    )
    got = set(rows(label_propagation(df, 4)))
    assert {u for u, _ in got} == {"ann", "anne", "annie"}
    assert len({lab for _, lab in got}) == 1


def test_lpa_rejects_zero_rounds(spark):
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(_edges_df(spark, [(1, 2, 5)]), 0)
