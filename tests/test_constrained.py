"""Cannot-link constrained greedy agglomeration
(operators/constrained.py): exact parity vs a scalar union-find
sweep, the split/keep behaviour weight order decides, hard labels
outranking scores, cross-component constraints, CC degeneration with
no constraints, string ids, and the component guard."""

import random

import pytest

from hamerkop_spark.operators.constrained import constrained_clusters


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _scalar_constrained(edges, constraints):
    """Sequential exact replay: sum duplicate pairs, sweep by
    (w desc, a asc, b asc), union unless a cannot-link pair would
    land in one cluster; labels = min member."""
    w = {}
    for a, b, s in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        w[k] = w.get(k, 0) + s
    nodes = sorted({u for k in w for u in k})
    rep = {u: u for u in nodes}

    def find(x):
        while rep[x] != x:
            rep[x] = rep[rep[x]]
            x = rep[x]
        return x

    cons = {(min(a, b), max(a, b)) for a, b in constraints
            if a != b and a in rep and b in rep}
    for (a, b), s in sorted(w.items(), key=lambda kv: (-kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if any(find(p) in (ra, rb) and find(q) in (ra, rb)
               and find(p) != find(q) for p, q in cons):
            continue
        rep[max(ra, rb)] = min(ra, rb)
    return {(u, find(u)) for u in nodes}


def _dfs(spark, edges, constraints):
    e = spark.createDataFrame(edges, "a_id int, b_id int, w_micro long")
    c = spark.createDataFrame(
        constraints or [(-1, -2)], "a_id int, b_id int"
    )
    return e, c


def _rand_case(seed, n=40, m=100, ncl=12):
    rng = random.Random(seed)
    seen = set()
    edges = []
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b or (min(a, b), max(a, b)) in seen:
            continue
        seen.add((min(a, b), max(a, b)))
        edges.append((min(a, b), max(a, b), rng.randrange(1, 1000)))
    cons = [(rng.randrange(n), rng.randrange(n)) for _ in range(ncl)]
    cons = [(a, b) for a, b in cons if a != b]
    return edges, cons


def test_constrained_matches_scalar_reference(spark):
    for seed in (4, 19, 27, 53):
        edges, cons = _rand_case(seed)
        e, c = _dfs(spark, edges, cons)
        got = set(rows(constrained_clusters(e, c)))
        assert got == _scalar_constrained(edges, cons), seed


def test_constraint_splits_what_cc_chains(spark):
    # (1,2) is the stronger edge, so it wins the sweep; the (2,3)
    # union would join the cannot-link (1,3) and is skipped.
    e, c = _dfs(spark, [(1, 2, 100), (2, 3, 90)], [(1, 3)])
    assert set(rows(constrained_clusters(e, c))) == {
        (1, 1), (2, 1), (3, 3)}


def test_weight_order_decides_which_side_wins(spark):
    # same graph, weights flipped: now (2,3) merges first and (1,2)
    # is the edge the constraint sacrifices.
    e, c = _dfs(spark, [(1, 2, 90), (2, 3, 100)], [(1, 3)])
    assert set(rows(constrained_clusters(e, c))) == {
        (1, 1), (2, 2), (3, 2)}


def test_hard_label_outranks_positive_edge(spark):
    e, c = _dfs(spark, [(1, 2, 999)], [(2, 1)])
    assert set(rows(constrained_clusters(e, c))) == {(1, 1), (2, 2)}


def test_cross_component_constraint_is_noop(spark):
    e, c = _dfs(spark, [(1, 2, 10), (5, 6, 10)], [(1, 5)])
    assert set(rows(constrained_clusters(e, c))) == {
        (1, 1), (2, 1), (5, 5), (6, 5)}


def test_no_constraints_degenerates_to_transitive_closure(spark):
    edges = [(1, 2, 5), (2, 3, 7), (3, 4, 1), (8, 9, 2)]
    e, c = _dfs(spark, edges, [])
    assert set(rows(constrained_clusters(e, c))) == {
        (1, 1), (2, 1), (3, 1), (4, 1), (8, 8), (9, 8)}


def test_duplicate_pairs_sum_and_change_sweep_order(spark):
    # (2,3) observed twice at 60 -> 120 outweighs (1,2) at 100, so
    # {2,3} forms first and the constraint (1,3) then blocks (1,2).
    e, c = _dfs(
        spark, [(1, 2, 100), (2, 3, 60), (3, 2, 60)], [(1, 3)])
    assert set(rows(constrained_clusters(e, c))) == {
        (1, 1), (2, 2), (3, 2)}


def test_constrained_string_ids(spark):
    e = spark.createDataFrame(
        [("ann", "anne", 100), ("anne", "annie", 90)],
        "a_id string, b_id string, w_micro long",
    )
    c = spark.createDataFrame([("ann", "annie")], "a_id string, b_id string")
    got = set(rows(constrained_clusters(e, c)))
    assert got == {("ann", "ann"), ("anne", "ann"), ("annie", "annie")}


def test_constrained_component_guard(spark):
    edges = [(i, i + 1, 10) for i in range(10)]
    e, c = _dfs(spark, edges, [])
    with pytest.raises(Exception, match="max_component"):
        constrained_clusters(e, c, max_component=5).collect()
