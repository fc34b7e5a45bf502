"""ANN: brute-force cosine top-k vs numpy oracle; LSH bucketed variant."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hamerkop_spark.operators import similarity as SIM


def mk_vectors(spark, n=40, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype("float32")
    rows = [(f"v{i:03d}", [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    return df, vecs


def test_brute_force_matches_numpy(spark):
    df, vecs = mk_vectors(spark)
    queries = df.limit(3).selectExpr("vec_id as query_id", "embedding")
    out = SIM.brute_force_topk(df, queries, k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    # numpy oracle
    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norms @ norms.T
    for qi in range(3):
        order = np.argsort(-sims[qi], kind="stable")[:5]
        expected = [f"v{j:03d}" for j in order]
        spark_order = [nid for _, nid in sorted(got[f"v{qi:03d}"])]
        # allow tie-order differences only when cosines are equal
        for e, s in zip(expected, spark_order):
            if e != s:
                ei, si = int(e[1:]), int(s[1:])
                assert sims[qi, ei] == pytest.approx(sims[qi, si], abs=1e-5)


def test_self_is_top1(spark):
    df, _ = mk_vectors(spark)
    queries = df.limit(2).selectExpr("vec_id as query_id", "embedding")
    out = SIM.brute_force_topk(df, queries, k=1)
    for r in out.collect():
        assert r["neighbor_id"] == r["query_id"]
        assert r["cosine"] == pytest.approx(1.0)


def test_lsh_topk_subset_of_bucket(spark):
    df, _ = mk_vectors(spark, n=60)
    queries = df.limit(4).selectExpr("vec_id as query_id", "embedding")
    out = SIM.lsh_topk(df, queries, dim=8, k=5, num_planes=4)
    rows = out.collect()
    assert len(rows) > 0
    # self always lands in its own bucket -> rank 1 is self
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        best = min(rs, key=lambda r: r["rank"])
        assert best["neighbor_id"] == q


def test_lsh_bucket_deterministic(spark):
    df, _ = mk_vectors(spark, n=10)
    from pyspark.sql import functions as F

    b1 = df.select(
        SIM.lsh_bucket(F.col("embedding").cast("array<double>"), 8, 6).alias("b")
    ).collect()
    b2 = df.select(
        SIM.lsh_bucket(F.col("embedding").cast("array<double>"), 8, 6).alias("b")
    ).collect()
    assert b1 == b2


def test_ivf_full_probe_equals_brute_force(spark):
    """n_probe == k_clusters probes every inverted list, so IVF must
    return exactly the brute-force result set (self-pairs kept on both
    paths — the variants are like-for-like comparable)."""
    df, _ = mk_vectors(spark)
    queries = df.limit(4).selectExpr("vec_id as query_id", "embedding")
    ivf = SIM.ivf_topk(df, queries, k=5, k_clusters=8, n_probe=8)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    want = {(r["query_id"], r["neighbor_id"])
            for r in SIM.brute_force_topk(df, queries, k=5).collect()}
    assert got == want


def test_ivf_self_is_top1(spark):
    """Queries drawn from the corpus rank themselves first (cosine 1.0),
    exactly like brute_force_topk — no silent self-exclusion."""
    df, _ = mk_vectors(spark)
    queries = df.limit(3).selectExpr("vec_id as query_id", "embedding")
    top1 = {r["query_id"]: r["neighbor_id"]
            for r in SIM.ivf_topk(df, queries, k=3, k_clusters=8,
                                  n_probe=2).collect() if r["rank"] == 1}
    assert all(q == n for q, n in top1.items())


def test_ivf_partial_probe_recall_and_determinism(spark):
    """n_probe < k_clusters: useful recall vs brute force, and the same
    call returns the same set (deterministic centroids/assignment)."""
    df, _ = mk_vectors(spark, n=60)
    queries = df.limit(5).selectExpr("vec_id as query_id", "embedding")
    ivf = SIM.ivf_topk(df, queries, k=10, k_clusters=8, n_probe=3)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    want = {(r["query_id"], r["neighbor_id"])
            for r in SIM.brute_force_topk(df, queries, k=10).collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.4, recall
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_topk(df, queries, k=10, k_clusters=8, n_probe=3).collect()
    }
    assert again == got


def test_kmeans_centroids_deterministic_and_converging(spark):
    """Lloyd iterations: byte-identical across runs; mean within-cluster
    similarity does not degrade vs the untrained hash draw."""
    import random

    from hamerkop_spark.operators.similarity import (
        ivf_centroids,
        kmeans_centroids,
    )
    from hamerkop_spark.functions.textdist import cosine_native

    rng = random.Random(7)
    # 4 natural clusters around orthogonal-ish axes in 8d
    rows = []
    for i in range(200):
        c = i % 4
        base = [0.0] * 8
        base[c * 2] = 1.0
        rows.append((i, [x + rng.gauss(0, 0.15) for x in base]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    k1 = kmeans_centroids(corpus, 4, iterations=3)
    k2 = kmeans_centroids(corpus, 4, iterations=3)
    assert sorted(map(tuple, (r["centroid"] for r in k1.collect()))) == sorted(
        map(tuple, (r["centroid"] for r in k2.collect()))
    )

    def mean_best_sim(cents):
        scored = corpus.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            cosine_native(
                F.col("embedding"), F.col("centroid")
            ).alias("sim"),
        )
        return (
            scored.groupBy("vec_id").agg(F.max("sim").alias("best"))
            .agg(F.avg("best")).collect()[0][0]
        )

    trained = mean_best_sim(k1)
    untrained = mean_best_sim(ivf_centroids(corpus, 4))
    assert trained >= untrained - 1e-9
    assert trained > 0.9  # found the 4 natural directions


def test_ivf_trained_recall_not_worse(spark):
    """ivf_topk(train_iterations>0) recall@5 vs brute force is >= the
    untrained variant on a clustered corpus."""
    import random

    from hamerkop_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = random.Random(11)
    rows = []
    for i in range(300):
        c = i % 5
        base = [0.0] * 8
        base[c] = 1.0
        rows.append((i, [x + rng.gauss(0, 0.2) for x in base]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def recall(res):
        truth = brute_force_topk(corpus, queries, k=5)
        t = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
        g = {(r["query_id"], r["neighbor_id"]) for r in res.collect()}
        return len(t & g) / len(t)

    r_trained = recall(
        ivf_topk(corpus, queries, k=5, k_clusters=5, n_probe=1,
                 train_iterations=3)
    )
    r_untrained = recall(
        ivf_topk(corpus, queries, k=5, k_clusters=5, n_probe=1)
    )
    assert r_trained >= r_untrained - 1e-9
    assert r_trained >= 0.8


def _clustered_vecs(n=1000, k=16, dim=32, seed=7):
    """Deterministic well-clustered corpus: k separated centers + small
    noise — the realistic embedding shape (the sf tables are near-uniform
    random, where recall necessarily tracks probe fraction)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1, size=(k, dim)) * 4.0
    rows = []
    for i in range(n):
        c = i % k
        v = centers[c] + rng.normal(0, 0.15, size=dim)
        rows.append((i, [float(x) for x in v]))
    return rows


def test_ivf_clustered_high_recall_at_low_probe_fraction(spark):
    """On clustered data, trained IVF reaches ~exact recall probing only
    2/16 lists (12.5% of the corpus) — routing works when the data has
    structure; see BASELINE.md for the near-uniform sf0.1 curve."""
    from hamerkop_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.createDataFrame(
        _clustered_vecs(), "vec_id long, embedding array<double>"
    )
    q = emb.where(F.col("vec_id") < 50).selectExpr(
        "vec_id as query_id", "embedding"
    )
    exact = brute_force_topk(emb, q, k=10).select("query_id", "neighbor_id")
    approx = ivf_topk(
        emb, q, k=10, k_clusters=16, n_probe=2, train_iterations=3
    ).select("query_id", "neighbor_id")
    n_exact = exact.count()
    hit = exact.join(approx, ["query_id", "neighbor_id"]).count()
    assert hit / n_exact >= 0.95, hit / n_exact


def test_ivf_probe_margin_adapts_on_clustered_data(spark):
    """Adaptive multi-probe: with a margin, decisive queries keep their
    few within-margin lists and recall stays high even though the
    n_probe CAP is generous — the margin, not the cap, sets the cost."""
    from hamerkop_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.createDataFrame(
        _clustered_vecs(), "vec_id long, embedding array<double>"
    )
    q = emb.where(F.col("vec_id") < 50).selectExpr(
        "vec_id as query_id", "embedding"
    )
    exact = brute_force_topk(emb, q, k=10).select("query_id", "neighbor_id")
    approx = ivf_topk(
        emb, q, k=10, k_clusters=16, n_probe=8, train_iterations=3,
        probe_margin=0.1,
    ).select("query_id", "neighbor_id")
    n_exact = exact.count()
    hit = exact.join(approx, ["query_id", "neighbor_id"]).count()
    assert hit / n_exact >= 0.95, hit / n_exact


def test_ivf_precomputed_centroids_match_trained_path(spark):
    """`centroids=` amortizes training: passing kmeans_centroids output
    must produce exactly the per-call train_iterations result."""
    from hamerkop_spark.operators.similarity import ivf_topk, kmeans_centroids

    emb = spark.createDataFrame(
        _clustered_vecs(n=400, k=8), "vec_id long, embedding array<double>"
    )
    q = emb.where(F.col("vec_id") < 20).selectExpr(
        "vec_id as query_id", "embedding"
    )
    cents = kmeans_centroids(emb, 8, 2)
    a = ivf_topk(emb, q, k=5, k_clusters=8, n_probe=2, centroids=cents)
    b = ivf_topk(emb, q, k=5, k_clusters=8, n_probe=2, train_iterations=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ivf_probe_candidates_measures_join_size(spark):
    """Advice r3: ivf_probe_candidates reports the MEASURED candidate
    count of the probes-to-lists join — equal to the full corpus per
    query at full probe, at or under the static cap at partial probe,
    and strictly lower again once probe_margin prunes lists."""
    from hamerkop_spark.operators.similarity import ivf_probe_candidates

    emb = spark.createDataFrame(
        _clustered_vecs(n=400, k=8), "vec_id long, embedding array<double>"
    )
    n = emb.count()
    q = emb.where(F.col("vec_id") < 20).selectExpr(
        "vec_id as query_id", "embedding"
    )
    n_q = q.count()

    full = ivf_probe_candidates(emb, q, k_clusters=8, n_probe=8)
    assert full == n * n_q  # probing every list == brute force

    cap = ivf_probe_candidates(emb, q, k_clusters=8, n_probe=2,
                               train_iterations=3)
    assert 0 < cap <= n * n_q * (2 / 8) * 2  # within 2x of the cap
    # (lists are not perfectly balanced, hence the slack)

    margin = ivf_probe_candidates(emb, q, k_clusters=8, n_probe=8,
                                  train_iterations=3, probe_margin=0.1)
    # clustered data routes decisively: margin must prune well below
    # the generous n_probe=8 (== full) cap
    assert margin < full
