"""Star clustering (operators/star.py): exact greedy parity, one-shot
relaxation coverage/determinism, and the anti-chaining property the
algorithm exists for (vs transitive CC)."""

import random

from hamerkop_spark.operators.star import (
    star_assignments,
    star_clusters_exact,
)


def _scalar_greedy_star(edges):
    """The sequential sweep from the paper, static degrees, priority
    (deg DESC, id ASC): highest-priority unmarked vertex becomes a
    center, its neighbours become satellites; satellites then attach
    to every adjacent center."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    order = sorted(adj, key=lambda u: (-len(adj[u]), u))
    marked, centers = set(), set()
    for u in order:
        if u in marked:
            continue
        centers.add(u)
        marked.add(u)
        marked |= adj[u]
    out = {(c, c) for c in centers}
    for u in adj:
        for c in adj[u] & centers:
            out.add((u, c))
    return out


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "a_id int, b_id int")


def _rand_graph(seed, n=60, m=150):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def test_star_exact_matches_scalar_greedy(spark):
    for seed in (3, 7, 11):
        edges = _rand_graph(seed)
        got = {
            (r.record_id, r.center_id)
            for r in star_clusters_exact(_edges_df(spark, edges)).collect()
        }
        assert got == _scalar_greedy_star(edges), f"seed {seed}"


def test_star_exact_decreasing_priority_path(spark):
    # worst case for the fixpoint: a path whose priority strictly
    # decreases along it (degree ties broken by id) — one decision
    # cascades per round; greedy takes alternate vertices
    edges = [(i, i + 1) for i in range(12)]
    got = {
        (r.record_id, r.center_id)
        for r in star_clusters_exact(_edges_df(spark, edges)).collect()
    }
    assert got == _scalar_greedy_star(edges)


def test_star_relaxed_total_coverage_and_no_adjacent_centers(spark):
    edges = _rand_graph(19, n=50, m=120)
    rows = star_assignments(_edges_df(spark, edges)).collect()
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    assert {r.record_id for r in rows} == nodes
    centers = {r.center_id for r in rows}
    # dominance centers (those with satellites) are never adjacent;
    # singleton-fallback centers may be adjacent to anything
    dom = {
        r.center_id for r in rows if r.record_id != r.center_id
    }
    adj = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    assert not any((c, d) in adj for c in dom for d in dom)
    # every center stars itself
    self_rows = {r.record_id for r in rows if r.record_id == r.center_id}
    assert centers <= self_rows


def test_star_relaxed_deterministic_under_repartition(spark):
    edges = _rand_graph(29, n=40, m=90)
    df = _edges_df(spark, edges)
    one = {
        (r.record_id, r.center_id)
        for r in star_assignments(df).collect()
    }
    two = {
        (r.record_id, r.center_id)
        for r in star_assignments(df.repartition(7)).collect()
    }
    assert one == two


def test_star_bounds_chaining_where_cc_merges(spark):
    # two 6-cliques joined by one bridge edge: transitive closure
    # returns ONE component; every star cluster has diameter <= 2,
    # so no cluster can contain both cliques entirely
    from hamerkop_spark.operators.cc import connected_components

    k1 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    k2 = [(a, b) for a in range(10, 16) for b in range(a + 1, 16)]
    edges = k1 + k2 + [(5, 10)]
    df = _edges_df(spark, edges)
    cc = connected_components(
        df.selectExpr(
            "cast(a_id as string) src", "cast(b_id as string) dst"
        )
    )
    assert cc.select("component").distinct().count() == 1
    stars = star_clusters_exact(df).collect()
    by_center = {}
    for r in stars:
        by_center.setdefault(r.center_id, set()).add(r.record_id)
    assert all(
        not ({0, 1, 2, 3, 4} <= m and {11, 12, 13, 14, 15} <= m)
        for m in by_center.values()
    )
    # and still total: every vertex is in some star
    covered = {r.record_id for r in stars}
    assert covered == set(range(6)) | set(range(10, 16))
