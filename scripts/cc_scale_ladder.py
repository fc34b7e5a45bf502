"""CC scale ladder: wall-clock + edges/s for the two-phase
large-star/small-star core at increasing graph sizes, with per-round
wall report (a round exceeding 2x the median indicates hot-component
skew). Graph = chains of 10 + n/4 random extra merges, the round-2
stress shape. Results recorded in BASELINE.md.

Usage: python scripts/cc_scale_ladder.py [n_edges_millions ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hamerkop_spark.session import get_spark  # noqa: E402
from hamerkop_spark.operators.cc import connected_components  # noqa: E402


def build_edges(spark, n_nodes: int):
    """Chains of 10 consecutive ids + n/4 deterministic pseudo-random
    merges (xxhash64-derived, no RNG)."""
    ids = spark.range(n_nodes).select(F.col("id"))
    chain = ids.where(F.col("id") % 10 != 9).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    extra = (
        spark.range(n_nodes // 4)
        .select(
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(n_nodes)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    return chain.unionByName(extra)


def main():
    sizes_m = [float(a) for a in sys.argv[1:]] or [2.3, 11.0, 22.0]
    spark = get_spark(cores=16, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    for m in sizes_m:
        # edges ~= 0.9*n + 0.25*n = 1.15*n  ->  n = edges/1.15
        n_nodes = int(m * 1e6 / 1.15)
        edges = build_edges(spark, n_nodes).localCheckpoint(eager=True)
        n_edges = edges.count()
        t0 = time.time()
        walls = []
        labels = connected_components(
            edges, max_iterations=50, round_walls=walls
        )
        n_comp = labels.select("component").distinct().count()
        wall = time.time() - t0
        med = sorted(walls)[len(walls) // 2] if walls else 0.0
        print(
            f"n_nodes={n_nodes} n_edges={n_edges} components={n_comp} "
            f"wall={wall:.1f}s edges_per_sec={n_edges / wall:,.0f} "
            f"rounds={len(walls)} round_walls={walls} "
            f"max_over_median={max(walls) / med if med else 0:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
