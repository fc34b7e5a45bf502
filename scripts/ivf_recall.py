"""Measure IVF ANN recall@10 against the exact brute-force baseline on
the REAL sf embeddings table, at several (k_clusters, n_probe,
probe_margin) configs, plus the measured probe cost (candidate pairs
scored / brute-force pairs). Results are recorded in BASELINE.md.

Usage: python scripts/ivf_recall.py [sf_dir] [n_queries]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hamerkop_spark.session import get_spark  # noqa: E402
from hamerkop_spark.operators.similarity import (  # noqa: E402
    brute_force_topk, ivf_probe_candidates, ivf_topk,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark(cores=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_corpus = emb.count()
    q = emb.where(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = (
        brute_force_topk(emb, q, k=10)
        .select("query_id", "neighbor_id")
        .cache()
    )
    n_exact = exact.count()

    configs = [
        dict(k_clusters=16, n_probe=4, train_iterations=5),
        dict(k_clusters=16, n_probe=8, train_iterations=5),
        dict(k_clusters=32, n_probe=12, train_iterations=5),
        dict(k_clusters=32, n_probe=16, train_iterations=5),
        dict(k_clusters=32, n_probe=16, train_iterations=5,
             probe_margin=0.05),
    ]
    from hamerkop_spark.operators.similarity import kmeans_centroids

    for cfg in configs:
        # train the quantizer ONCE per config and hand the same
        # centroids to both halves: ivf_topk and ivf_probe_candidates
        # would otherwise each re-run k-means + full corpus assignment
        # (doubling the dominant cost), and the probe-cost measurement
        # would correspond to the same quantizer only via k-means
        # determinism rather than by construction
        cfg = dict(cfg)
        cents = kmeans_centroids(
            emb, cfg["k_clusters"],
            iterations=cfg.pop("train_iterations"),
        ).cache()
        cents.count()
        approx = ivf_topk(emb, q, k=10, centroids=cents, **cfg).select(
            "query_id", "neighbor_id"
        )
        hit = exact.join(approx, ["query_id", "neighbor_id"]).count()
        # MEASURED probe cost: candidates actually scored by the
        # probes-to-lists join / brute-force pairs (n_corpus * n_q);
        # the static n_probe/k_clusters cap is printed alongside
        cands = ivf_probe_candidates(emb, q, centroids=cents, **cfg)
        probe_frac = cands / (n_corpus * n_q)
        cap_frac = cfg["n_probe"] / cfg["k_clusters"]
        print(
            f"k={cfg['k_clusters']:3d} n_probe={cfg['n_probe']:3d} "
            f"margin={cfg.get('probe_margin')} "
            f"recall@10={hit / n_exact:.4f} "
            f"measured_probe_frac={probe_frac:.4f} "
            f"cap_frac={cap_frac:.3f} corpus={n_corpus}"
        )


if __name__ == "__main__":
    main()
