"""CC scale ladder: wall-clock + edges/s for the two-phase
large-star/small-star core at increasing graph sizes, with per-round
wall report (a round exceeding 2x the median indicates hot-component
skew). Results recorded in BASELINE.md.

Families (--family):
  chain (default) — chains of 10 + n/4 random extra merges, the
      round-2 stress shape (uniform component sizes).
  star — the adversarial-skew worst case (VERDICT r3 #8): ONE hub
      node carries 80% of all edges as direct spokes (a single
      component with 80% of the graph), the rest are chains of 10.
      The hub id sits mid-order so BOTH star phases touch it: the
      large-star groupBy sees its full degree, and the small-star
      canonical orientation keeps it as a hot `u` key. Survivable
      only because both phases aggregate with map-side partial min
      BEFORE any exchange and AQE splits the skewed joins.

Usage: python scripts/cc_scale_ladder.py [--family star] [n_edges_millions ...]
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


def build_star_edges(spark, n_edges: int):
    """80% of edges are spokes of one hub; 20% are chains of 10.

    Node id space: hub = n_spokes (so spoke ids 0..n_spokes-1 sort
    below it and chain ids above it — the hub is a max-end node for
    its own spokes, making it a hot canonical `u`, while chain nodes
    keep the background uniform)."""
    n_spokes = int(n_edges * 0.8)
    hub = n_spokes
    spokes = spark.range(n_spokes).select(
        F.lit(hub).alias("src"), F.col("id").alias("dst")
    )
    n_chain = n_edges - n_spokes
    chain_base = hub + 1
    # consecutive ids, skipping every 10th link -> chains of 10
    chain = (
        spark.range(int(n_chain / 0.9) + 2)
        .where(F.col("id") % 10 != 9)
        .limit(n_chain)
        .select(
            (F.col("id") + chain_base).alias("src"),
            (F.col("id") + chain_base + 1).alias("dst"),
        )
    )
    return spokes.unionByName(chain)


def main():
    args = sys.argv[1:]
    family = "chain"
    if "--family" in args:
        i = args.index("--family")
        family = args[i + 1]
        del args[i : i + 2]
    sizes_m = [float(a) for a in args] or [2.3, 11.0, 22.0]
    spark = get_spark(cores=16, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    for m in sizes_m:
        if family == "star":
            edges = build_star_edges(spark, int(m * 1e6)).localCheckpoint(
                eager=True
            )
        else:
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
            f"family={family} n_edges={n_edges} components={n_comp} "
            f"wall={wall:.1f}s edges_per_sec={n_edges / wall:,.0f} "
            f"rounds={len(walls)} round_walls={walls} "
            f"max_over_median={max(walls) / med if med else 0:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
