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

def test_pivot_ari_beats_cc_under_chain_noise(spark):
    # 40 gold entities, each a 3-record triangle; one bridge edge links
    # consecutive entities (the classic borderline-match chain). CC
    # collapses everything into one component (ARI ~ 0); pivot keeps
    # the partition close to gold. Measured with the engine's own
    # exact-integer ARI (operators/scoring.adjusted_rand_index).
    from pyspark.sql import functions as F

    from hamerkop_spark.operators.cc import connected_components
    from hamerkop_spark.operators.scoring import adjusted_rand_index

    K = 40
    edges = []
    for i in range(K):
        b = 10 * i
        edges += [(b, b + 1), (b, b + 2), (b + 1, b + 2)]
        if i:
            edges.append((10 * (i - 1), b))  # chain bridge
    gold = spark.createDataFrame(
        [(10 * i + j, i) for i in range(K) for j in range(3)],
        "mention_key int, cluster int",
    )
    edf = spark.createDataFrame(edges, "a_id int, b_id int")
    piv = pivot_clusters(edf).select(
        F.col("record_id").alias("mention_key"),
        F.col("cluster_id").alias("cluster"),
    )
    comps = connected_components(
        edf.select(
            F.col("a_id").cast("string").alias("src"),
            F.col("b_id").cast("string").alias("dst"),
        )
    )
    cc = comps.select(
        F.col("node").cast("int").alias("mention_key"),
        F.col("component").alias("cluster"),
    )
    ari_piv = adjusted_rand_index(piv, gold).collect()[0].ari_fp / 1e6
    ari_cc = adjusted_rand_index(cc, gold).collect()[0].ari_fp / 1e6
    assert ari_cc < 0.1            # one giant chained component
    assert ari_piv > 0.6           # partition stays near gold
    assert ari_piv > ari_cc + 0.5
