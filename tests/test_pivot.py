"""Pivot correlation clustering (operators/pivot.py): exact sequential
KwikCluster parity, partition validity, and the negative-evidence
behaviour (chain splitting) that distinguishes it from transitive CC."""

import random

from hamerkop_spark.operators.pivot import (
    RANK_ID_MOD,
    RANK_MOD,
    RANK_MULT,
    pivot_clusters,
)

def _prio(u):
    return (((u % RANK_ID_MOD) * RANK_MULT) % RANK_MOD, u)

def _scalar_kwikcluster(edges):
    """The sequential sweep from Ailon et al. 2008: visit vertices in
    pi-order; an unclustered vertex becomes a pivot and grabs its
    unclustered neighbours."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cluster = {}
    for u in sorted(adj, key=_prio):
        if u in cluster:
            continue
        cluster[u] = u
        for v in adj[u]:
            if v not in cluster:
                cluster[v] = u
    return set(cluster.items())

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

def test_pivot_matches_scalar_kwikcluster(spark):
    for seed in (3, 7, 11, 23):
        edges = _rand_graph(seed)
        got = {
            (r.record_id, r.cluster_id)
            for r in pivot_clusters(_edges_df(spark, edges)).collect()
        }
        assert got == _scalar_kwikcluster(edges), f"seed {seed}"

def test_pivot_is_a_partition(spark):
    edges = _rand_graph(19, n=50, m=120)
    rows = pivot_clusters(_edges_df(spark, edges)).collect()
    nodes = {a for a, b in edges} | {b for _, b in edges}
    # exactly one row per vertex (partition, unlike star's overlap)
    assert sorted(r.record_id for r in rows) == sorted(nodes)
    by_id = {r.record_id: r.cluster_id for r in rows}
    # every cluster id is a pivot that owns itself, and every member
    # is adjacent to its pivot (diameter <= 2 within a cluster)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for u, c in by_id.items():
        assert by_id[c] == c
        if u != c:
            assert c in adj[u]

def test_pivot_splits_chains_unlike_cc(spark):
    # a 40-vertex path is one CC component but KwikCluster cuts it
    # into clusters of size <= 3 (a pivot plus at most two neighbours)
    edges = [(i, i + 1) for i in range(39)]
    rows = pivot_clusters(_edges_df(spark, edges)).collect()
    sizes = {}
    for r in rows:
        sizes[r.cluster_id] = sizes.get(r.cluster_id, 0) + 1
    assert max(sizes.values()) <= 3
    assert len(sizes) >= 13
    assert {(r.record_id, r.cluster_id) for r in rows} == (
        _scalar_kwikcluster(edges)
    )

def test_pivot_worst_case_decreasing_rank_path(spark):
    # force a long strictly-rank-decreasing dominance path so the
    # fixpoint needs many rounds: sort a vertex sample by rank and
    # chain them in descending rank order
    vs = sorted(range(200), key=_prio, reverse=True)[:24]
    edges = [(vs[i], vs[i + 1]) for i in range(len(vs) - 1)]
    got = {
        (r.record_id, r.cluster_id)
        for r in pivot_clusters(_edges_df(spark, edges)).collect()
    }
    assert got == _scalar_kwikcluster(edges)

def test_pivot_deterministic_rerun(spark):
    edges = _rand_graph(42, n=40, m=90)
    a = sorted(
        (r.record_id, r.cluster_id)
        for r in pivot_clusters(_edges_df(spark, edges)).collect()
    )
    b = sorted(
        (r.record_id, r.cluster_id)
        for r in pivot_clusters(_edges_df(spark, edges)).collect()
    )
    assert a == b

def test_pivot_huge_ids_no_overflow(spark):
    # ids beyond 2^40 (the rank multiply would overflow BIGINT without
    # the mod-2^31 reduction) — parity must still hold
    base = 1 << 40
    edges = [(base + a, base + b) for a, b in _rand_graph(5, n=30, m=60)]
    got = {
        (r.record_id, r.cluster_id)
        for r in pivot_clusters(
            spark.createDataFrame(edges, "a_id long, b_id long")
        ).collect()
    }
    assert got == _scalar_kwikcluster(edges)
