"""Scale + quality measurement for canopy clustering
(operators/canopy.py), star clustering (operators/star.py) and pivot
correlation clustering (operators/pivot.py).

Corpus: records with 6 hash-derived tokens from a vocabulary sized to
the record count (average posting size ~6, so the inverted-index
self-join stays linear); 20% of records get a near-duplicate sharing
5 of the 6 tokens. Claims evidenced:

1. Canopy blocking recall: a dup pair shares 5 distinct tokens, so it
   sits at overlap 5 >= t2 and must be co-canopied whenever either
   member survives as a center; recall is measured, not assumed.
2. Cost is bounded by the posting purge: candidates/record measures
   the surviving background collision rate (should be O(1)).
3. No driver loops on the oracle path: canopy and one-shot star are
   pure join/agg pipelines; records/sec should scale with cores —
   run this at two --cores levels for the two-parallelism scaling
   evidence (the sandbox stand-in for a two-cluster-size run).

Usage: python scripts/star_canopy_scale.py [--records 500000]
       [--cores 16] [--t1 5] [--t2 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hamerkop_spark.operators.canopy import (
    canopy_assignments,
    canopy_candidates,
    token_overlap_pairs,
)
from hamerkop_spark.operators.pivot import pivot_clusters
from hamerkop_spark.operators.star import star_assignments

DUP_OFFSET = 1 << 40


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=500_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--t1", type=int, default=5)
    ap.add_argument("--t2", type=int, default=3)
    args = ap.parse_args()

    from hamerkop_spark.session import get_spark

    spark = get_spark(
        app_name="star-canopy-scale", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    vocab = max(1000, args.records)

    def tok(seed: int):
        return F.concat(
            F.lit("t"),
            F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(vocab)).cast(
                "string"
            ),
        )

    base = spark.range(args.records).select(
        F.col("id").alias("record_id"),
        F.array(*[tok(s) for s in range(1, 7)]).alias("tokens"),
    )
    # 20% near-duplicates sharing tokens 1-5, token 6 replaced
    dups = base.where(
        F.pmod(F.xxhash64("record_id", F.lit(9)), F.lit(5)) < 1
    ).select(
        (F.col("record_id") + F.lit(DUP_OFFSET)).alias("record_id"),
        F.concat(
            F.slice("tokens", 1, 5),
            F.array(
                F.concat(
                    F.lit("x"),
                    F.pmod(
                        F.xxhash64("record_id", F.lit(10)), F.lit(vocab)
                    ).cast("string"),
                )
            ),
        ).alias("tokens"),
    )
    recs = base.unionByName(dups).persist()
    n_gold = dups.count()
    n_recs = recs.count()

    # warm codegen on a slice
    canopy_assignments(
        recs.limit(20_000), t1_overlap=args.t1, t2_overlap=args.t2
    ).count()

    t0 = time.time()
    asn = canopy_assignments(
        recs, t1_overlap=args.t1, t2_overlap=args.t2
    )
    n_asn = asn.count()
    t_canopy = time.time() - t0

    t0 = time.time()
    cands = canopy_candidates(asn)
    n_pairs = cands.count()
    t_cands = time.time() - t0
    hits = cands.where(
        F.col("b_id") - F.col("a_id") == F.lit(DUP_OFFSET)
    ).count()

    t0 = time.time()
    edges = token_overlap_pairs(recs, min_overlap=args.t2)
    stars = star_assignments(edges)
    n_star = stars.count()
    t_star = time.time() - t0
    n_centers = stars.select("center_id").distinct().count()

    t0 = time.time()
    piv = pivot_clusters(edges)
    n_piv = piv.count()
    t_piv = time.time() - t0
    n_piv_clusters = piv.select("cluster_id").distinct().count()

    print(json.dumps({
        "records": n_recs,
        "cores": args.cores,
        "t1": args.t1,
        "t2": args.t2,
        "canopy_wall_sec": round(t_canopy, 2),
        "canopy_records_per_sec": int(n_recs / t_canopy),
        "canopy_rows": n_asn,
        "cand_pairs": n_pairs,
        "cand_per_record": round(n_pairs / n_recs, 2),
        "cand_wall_sec": round(t_cands, 2),
        "gold_pairs": n_gold,
        "recall": round(hits / n_gold, 4) if n_gold else None,
        "star_wall_sec": round(t_star, 2),
        "star_records_per_sec": int(n_recs / t_star),
        "star_rows": n_star,
        "star_centers": n_centers,
        "pivot_wall_sec": round(t_piv, 2),
        "pivot_records_per_sec": int(n_recs / t_piv),
        "pivot_rows": n_piv,
        "pivot_clusters": n_piv_clusters,
    }))


if __name__ == "__main__":
    main()
