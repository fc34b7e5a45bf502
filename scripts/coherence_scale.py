"""Scale measurement for collective coherence disambiguation
(operators/collective.coherence_rerank).

Evidence for the scale-shape claims:

1. The message-passing edge set is bounded by Σ_doc (top_k ·
   chains_per_doc)² and is built ONCE — per-iteration cost is one
   equi-join + two aggregations over it, so wall grows linearly in
   edges and in iterations.
2. Everything shuffles on doc_id-prefixed keys; the largest partition
   tracks the largest document, not the corpus.

Synthetic corpus: D documents × C chains each × K candidates per
chain, entity ids drawn from a Zipf-ish hash so candidate sets
overlap across chains (otherwise relatedness sparsifies everything
away); entity links from a hash pool so relatedness is non-trivial.

Usage: python scripts/coherence_scale.py [--docs 20000] [--chains 6]
       [--cands 5] [--iterations 2] [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hamerkop_spark.operators.collective import coherence_rerank
from hamerkop_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--chains", type=int, default=6)
    ap.add_argument("--cands", type=int, default=5)
    ap.add_argument("--entities", type=int, default=50_000)
    ap.add_argument("--links-per-entity", type=int, default=8)
    ap.add_argument("--link-pool", type=int, default=20_000)
    ap.add_argument("--iterations", type=int, default=2)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark(
        app_name="coherence-scale", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # candidates: hash-drawn entities; same (doc,chain) hash base so
    # the draw is deterministic; score from another hash
    cand = (
        spark.range(args.docs)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(args.chains - 1)))
            .alias("chain_id"),
        )
        .select(
            "doc_id", "chain_id",
            F.explode(F.sequence(F.lit(0), F.lit(args.cands - 1)))
            .alias("slot"),
        )
        .select(
            "doc_id", "chain_id",
            (F.abs(F.xxhash64("doc_id", "chain_id", "slot"))
             % args.entities).alias("entity_id"),
            (F.abs(F.xxhash64("slot", "chain_id", "doc_id")) % 1000)
            .cast("double").alias("score"),
        )
    ).localCheckpoint()

    links = (
        spark.range(args.entities)
        .select(F.col("id").alias("entity_id"))
        .select(
            "entity_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(args.links_per_entity - 1))
            ).alias("j"),
        )
        .select(
            "entity_id",
            (F.abs(F.xxhash64("entity_id", "j")) % args.link_pool)
            .cast("string").alias("link"),
        )
    ).localCheckpoint()

    n_cand = cand.count()
    t0 = time.time()
    out = coherence_rerank(
        cand, links, lam_micro=600_000,
        iterations=args.iterations, top_k=args.cands,
    )
    n_out = out.count()
    wall = time.time() - t0

    edge_bound = args.docs * (args.cands * args.chains) ** 2
    print(json.dumps({
        "docs": args.docs,
        "chains_per_doc": args.chains,
        "cands_per_chain": args.cands,
        "candidates": n_cand,
        "iterations": args.iterations,
        "cores": args.cores,
        "wall_seconds": round(wall, 2),
        "cand_rows_per_sec": round(n_cand / wall, 1),
        "edge_bound": edge_bound,
        "out_rows": n_out,
    }))


if __name__ == "__main__":
    main()
