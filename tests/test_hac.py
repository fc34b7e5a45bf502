"""Threshold average-linkage HAC (operators/hac.py): exact parity vs
a scalar reference merge loop, the anti-chaining dilution behaviour
that distinguishes it from transitive CC, deterministic tie-breaks,
duplicate-pair aggregation, string ids, and the component-size guard."""

import random

import pytest

from hamerkop_spark.operators.hac import hac_clusters


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _scalar_hac(edges, threshold):
    """Sequential exact average-linkage cut: repeatedly merge the
    argmax-linkage cluster pair (exact integer cross-product compare,
    ties by ascending (min-member, min-member) key) while
    S_AB / (|A||B|) >= threshold, unscored cross pairs counting 0."""
    w = {}
    nodes = set()
    for a, b, s in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        w[k] = w.get(k, 0) + s
        nodes.update(k)
    members = {u: {u} for u in nodes}
    while True:
        # cluster-pair sums from the base edges under current members
        rep = {}
        for r, ms in members.items():
            for u in ms:
                rep[u] = r
        sums = {}
        for (a, b), s in w.items():
            ra, rb = rep[a], rep[b]
            if ra == rb:
                continue
            k = (min(ra, rb), max(ra, rb))
            sums[k] = sums.get(k, 0) + s
        best = None
        for (x, y), s in sums.items():
            n = len(members[x]) * len(members[y])
            if s < threshold * n:
                continue
            if best is None:
                best = (x, y, s, n)
                continue
            bx, by, bs, bn = best
            if s * bn > bs * n or (s * bn == bs * n and (x, y) < (bx, by)):
                best = (x, y, s, n)
        if best is None:
            break
        x, y, _, _ = best
        members[x] |= members.pop(y)
    out = set()
    for r, ms in members.items():
        lab = min(ms)
        for u in ms:
            out.add((u, lab))
    return out


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "a_id int, b_id int, w_micro long")


def _rand_weighted(seed, n=48, m=130, wmax=1_000_000):
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


def test_hac_matches_scalar_reference(spark):
    for seed in (5, 13, 29, 41):
        edges = _rand_weighted(seed)
        thr = 400_000
        got = set(rows(hac_clusters(_edges_df(spark, edges), thr)))
        assert got == _scalar_hac(edges, thr), f"seed {seed}"


def test_hac_threshold_sweep_matches_scalar(spark):
    edges = _rand_weighted(97, n=30, m=80)
    for thr in (100_000, 500_000, 900_000):
        got = set(rows(hac_clusters(_edges_df(spark, edges), thr)))
        assert got == _scalar_hac(edges, thr), f"thr {thr}"


def test_hac_does_not_chain_through_one_strong_bridge(spark):
    # two tight 4-cliques (all intra edges 0.9 = 900k micro) joined by
    # one spurious 0.85 bridge that is itself ABOVE the 0.8 cut: CC
    # would union all 8 records through it; average linkage merges
    # each clique first (900k edges dominate the argmax), after which
    # the bridge dilutes to 850_000/16 ~ 53k < threshold — apart.
    g1, g2 = [0, 1, 2, 3], [10, 11, 12, 13]
    edges = []
    for grp in (g1, g2):
        for i, a in enumerate(grp):
            for b in grp[i + 1:]:
                edges.append((a, b, 900_000))
    edges.append((3, 10, 850_000))
    got = set(rows(hac_clusters(_edges_df(spark, edges), 800_000)))
    assert got == {(u, 0) for u in g1} | {(u, 10) for u in g2}
    # sanity: the scalar oracle agrees on the same story
    assert got == _scalar_hac(edges, 800_000)


def test_hac_merges_when_cross_support_is_dense(spark):
    # same two cliques, but ALL 16 cross pairs at 0.85: the average
    # stays above an 0.8 cut, so average linkage merges them.
    g1, g2 = [0, 1, 2, 3], [10, 11, 12, 13]
    edges = []
    for grp in (g1, g2):
        for i, a in enumerate(grp):
            for b in grp[i + 1:]:
                edges.append((a, b, 900_000))
    for a in g1:
        for b in g2:
            edges.append((a, b, 850_000))
    got = set(rows(hac_clusters(_edges_df(spark, edges), 800_000)))
    assert got == {(u, 0) for u in g1 + g2}


def test_hac_below_threshold_yields_singletons(spark):
    got = set(rows(hac_clusters(_edges_df(spark, [(1, 2, 100)]), 200)))
    assert got == {(1, 1), (2, 2)}


def test_hac_duplicate_pairs_are_summed(spark):
    # two observations of the same unordered pair sum to 240 >= 200
    df = _edges_df(spark, [(1, 2, 120), (2, 1, 120)])
    assert set(rows(hac_clusters(df, 200))) == {(1, 1), (2, 1)}


def test_hac_exact_integer_tie_break(spark):
    # pairs (1,2) and (3,4) tie exactly at linkage 500; the ascending
    # pair key merges both (independent components), and within one
    # component (5,6) vs (5,7) at the same linkage must pick (5,6)
    # first — after that merge {5,6}-7 linkage is 500/2 < 500, so 7
    # stays out. A float-ordering implementation could merge 7 in.
    edges = [(1, 2, 500), (3, 4, 500), (5, 6, 500), (5, 7, 500)]
    got = set(rows(hac_clusters(_edges_df(spark, edges), 500)))
    assert got == {(1, 1), (2, 1), (3, 3), (4, 3), (5, 5), (6, 5), (7, 7)}
    assert got == _scalar_hac(edges, 500)


def test_hac_string_ids(spark):
    df = spark.createDataFrame(
        [("ann", "anne", 900_000), ("ann", "bob", 10)],
        "a_id string, b_id string, w_micro long",
    )
    got = set(rows(hac_clusters(df, 500_000)))
    assert got == {("ann", "ann"), ("anne", "ann"), ("bob", "bob")}


def test_hac_component_guard(spark):
    edges = [(i, i + 1, 1_000_000) for i in range(10)]
    with pytest.raises(Exception, match="max_component"):
        hac_clusters(_edges_df(spark, edges), 1, max_component=5).collect()


def test_hac_rejects_zero_threshold(spark):
    with pytest.raises(ValueError, match="threshold_micro"):
        hac_clusters(_edges_df(spark, [(1, 2, 5)]), 0)


def _scalar_hac_complete(edges, threshold):
    """Sequential exact complete-linkage cut: merge the argmax pair
    by MIN observed cross weight, valid only when every cross pair
    is observed; duplicates of one unordered pair fold by min."""
    w = {}
    nodes = set()
    for a, b, s in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        w[k] = min(w[k], s) if k in w else s
        nodes.update(k)
    members = {u: {u} for u in nodes}
    while True:
        rep = {u: r for r, ms in members.items() for u in ms}
        stats = {}
        for (a, b), s in w.items():
            ra, rb = rep[a], rep[b]
            if ra == rb:
                continue
            k = (min(ra, rb), max(ra, rb))
            c, m = stats.get(k, (0, None))
            stats[k] = (c + 1, s if m is None else min(m, s))
        best = None
        for (x, y), (c, m) in stats.items():
            if c != len(members[x]) * len(members[y]) or m < threshold:
                continue
            if best is None or m > best[2] or (
                m == best[2] and (x, y) < (best[0], best[1])
            ):
                best = (x, y, m)
        if best is None:
            break
        x, y, _ = best
        members[x] |= members.pop(y)
    return {(u, min(ms)) for r, ms in members.items() for u in ms}


def test_hac_complete_matches_scalar_reference(spark):
    for seed in (5, 13, 29, 41):
        edges = _rand_weighted(seed)
        thr = 400_000
        got = set(rows(hac_clusters(
            _edges_df(spark, edges), thr, linkage="complete")))
        assert got == _scalar_hac_complete(edges, thr), f"seed {seed}"


def test_hac_complete_vetoes_unscored_pair(spark):
    # (1,2) and (1,3) strong, (2,3) never scored: average linkage
    # would admit 3 ({1,2}-{3} = 900k/2 = 450k >= 400k), complete
    # linkage refuses the unscored (2,3) outright.
    edges = [(1, 2, 900_000), (1, 3, 900_000)]
    avg = set(rows(hac_clusters(_edges_df(spark, edges), 400_000)))
    comp = set(rows(hac_clusters(
        _edges_df(spark, edges), 400_000, linkage="complete")))
    assert avg == {(1, 1), (2, 1), (3, 1)}
    assert comp == {(1, 1), (2, 1), (3, 3)}


def test_hac_complete_merges_full_clique_on_weakest_edge(spark):
    # a triangle merges under complete linkage iff its WEAKEST edge
    # clears the cut
    tri = [(1, 2, 500_000), (1, 3, 450_000), (2, 3, 410_000)]
    got = set(rows(hac_clusters(
        _edges_df(spark, tri), 400_000, linkage="complete")))
    assert got == {(1, 1), (2, 1), (3, 1)}
    low = [(1, 2, 500_000), (1, 3, 450_000), (2, 3, 390_000)]
    got2 = set(rows(hac_clusters(
        _edges_df(spark, low), 400_000, linkage="complete")))
    # (1,2) merges; both cluster pairs to 3 then carry min < cut
    assert got2 == {(1, 1), (2, 1), (3, 3)}


def test_hac_complete_duplicates_fold_by_min(spark):
    df = _edges_df(spark, [(1, 2, 500), (2, 1, 100)])
    got = set(rows(hac_clusters(df, 200, linkage="complete")))
    assert got == {(1, 1), (2, 2)}


def test_hac_rejects_unknown_linkage(spark):
    with pytest.raises(ValueError, match="linkage"):
        hac_clusters(_edges_df(spark, [(1, 2, 5)]), 1, linkage="single")
