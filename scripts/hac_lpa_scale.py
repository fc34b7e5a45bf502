"""Scale measurement for threshold average-linkage HAC
(operators/hac.py) and weighted label propagation (operators/lpa.py)
on a deterministic weighted candidate-pair graph.

Graph: --nodes records in groups of --group keys; within a group,
edges at 75% density by a key hash, integer micro-unit weights
(a*2654435761 + b*40503) % 9000 + 1000 — the same family as the
er_hac_clusters / er_lpa_clusters oracle fixtures, scaled up. Group
size controls component size, so the HAC applyInPandas stage sees
many independent components (the shape the operator is designed for:
per-component quadratic loops, embarrassingly parallel across
components), while LPA's per-round cost is component-size-free.

Claims evidenced:

1. HAC wall is flat in --nodes at fixed --group (component count
   scales, per-component work doesn't), and grows with --group at
   fixed total edges (the documented quadratic-per-component cost).
2. LPA wall tracks total edges only (O(E) per round), regardless of
   --group — run --group 8 vs --group 4096 at the same edge count.
3. Cores scaling: run at two --cores levels for the two-parallelism
   scaling evidence (the sandbox stand-in for a two-cluster-size
   run); both operators are pure shuffle pipelines with no driver
   loop over components.

Usage: python scripts/hac_lpa_scale.py [--nodes 400000] [--group 8]
       [--cores 16] [--rounds 4] [--threshold 5500] [--skip-hac]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=400_000)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--threshold", type=int, default=5500)
    ap.add_argument("--skip-hac", action="store_true")
    ap.add_argument("--skip-lpa", action="store_true")
    args = ap.parse_args()

    from hamerkop_spark.operators.hac import hac_clusters
    from hamerkop_spark.operators.lpa import label_propagation
    from hamerkop_spark.session import get_spark

    spark = get_spark(
        app_name="hac-lpa-scale", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    g = args.group
    p = spark.range(1, args.nodes + 1).select(F.col("id").alias("r"))
    grp = p.select("r", (F.col("r") - F.col("r") % g).alias("g"))
    a = grp.select(F.col("r").alias("a_id"), "g")
    b = grp.select(F.col("r").alias("b_id"), "g")
    edges = (
        a.join(b, "g")
        .where(F.col("a_id") < F.col("b_id"))
        .where((F.col("a_id") * 7 + F.col("b_id") * 13) % 4 < 3)
        .select(
            "a_id",
            "b_id",
            (
                (F.col("a_id") * F.lit(2654435761) + F.col("b_id") * 40503)
                % 9000
                + 1000
            ).alias("w_micro"),
        )
        .localCheckpoint()  # pin the graph so build cost stays out of timings
    )
    n_edges = edges.count()
    out = {
        "nodes": args.nodes, "group": g, "cores": args.cores,
        "n_edges": n_edges,
    }

    if not args.skip_hac:
        t0 = time.time()
        hac = hac_clusters(
            edges, threshold_micro=args.threshold,
            max_component=max(2 * g, 1000),
        )
        n_clusters = hac.select("cluster_id").distinct().count()
        out["hac_seconds"] = round(time.time() - t0, 3)
        out["hac_clusters"] = n_clusters
        out["hac_edges_per_sec"] = round(n_edges / out["hac_seconds"], 1)

    if not args.skip_lpa:
        t0 = time.time()
        lpa = label_propagation(edges, rounds=args.rounds)
        n_labels = lpa.select("cluster_id").distinct().count()
        out["lpa_seconds"] = round(time.time() - t0, 3)
        out["lpa_labels"] = n_labels
        out["lpa_edges_per_sec"] = round(n_edges / out["lpa_seconds"], 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
