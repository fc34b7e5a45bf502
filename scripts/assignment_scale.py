"""Scale measurement for greedy one-to-one assignment
(operators/linkage.one_to_one_assignment).

Evidence for two docstring claims:

1. Round count stays ~O(log n) on pseudo-random score orders — the
   iterated locally-dominant loop converges in a handful of fully
   distributed passes, not the O(n) a sequential greedy sort implies.
2. Wall scales with the pair count, not the matching size: every round
   is two window passes + two anti-joins over a geometrically
   shrinking remainder.

The candidate table mirrors flagship blocking output: `lefts` records
with `cands` candidates each, scores from a multiplicative hash (so
the per-left argmax targets collide across lefts and the one-to-one
constraint actually binds).

Usage: python scripts/assignment_scale.py [--lefts 500000]
       [--cands 20] [--cores 16] [--max-rounds 0 (=fixpoint)]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hamerkop_spark.operators.linkage import one_to_one_assignment
from hamerkop_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lefts", type=int, default=500_000)
    ap.add_argument("--cands", type=int, default=20)
    ap.add_argument("--rights", type=int, default=0,
                    help="right-id universe; default lefts // 2 so the "
                         "constraint binds hard")
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--max-rounds", type=int, default=0)
    args = ap.parse_args()

    rights = args.rights or max(args.lefts // 2, 1)
    spark = get_spark(
        app_name="assignment-scale", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    pairs = (
        spark.range(args.lefts)
        .select(
            F.col("id").alias("chain_id"),
            F.explode(F.sequence(F.lit(0), F.lit(args.cands - 1))).alias("j"),
        )
        .select(
            "chain_id",
            ((F.col("chain_id") * 2654435761 + F.col("j") * 40503)
             % rights).alias("entity_id"),
            ((F.col("chain_id") * 48271 + F.col("j") * 16807)
             % 1000003).alias("match_score"),
        )
        # duplicate (chain, entity) pairs would break matching's
        # uniqueness assumption; the hash above collides rarely but
        # deterministically drop dupes the way a generator would
        .groupBy("chain_id", "entity_id")
        .agg(F.max("match_score").alias("match_score"))
        .repartition(2 * args.cores)
        .localCheckpoint()
    )
    n_pairs = pairs.count()

    t0 = time.time()
    matched = one_to_one_assignment(
        pairs, max_rounds=(args.max_rounds or None)
    )
    n_matched = matched.count()
    rounds = matched.agg(F.max("match_round")).collect()[0][0]
    wall = time.time() - t0

    print(json.dumps({
        "n_pairs": n_pairs,
        "n_lefts": args.lefts,
        "n_rights": rights,
        "n_matched": n_matched,
        "rounds": rounds,
        "wall_sec": round(wall, 2),
        "pairs_per_sec": round(n_pairs / wall),
        "cores": args.cores,
    }))


if __name__ == "__main__":
    main()
