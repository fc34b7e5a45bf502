"""Scale + quality measurement for suffix-array blocking
(operators/blocking_eval.suffix_array_candidates).

Evidence for the claims the docstring makes:

1. Head-damage recall: 20% of records get a duplicate whose first two
   characters are destroyed — the web-text failure sorted order cannot
   survive. Every suffix of the damaged form that reaches the unique
   digit tail is shared with its base record, so recall should be 1.0.
2. Frequent-suffix purge is what bounds the cost: 10% of names carry a
   shared 'corporation' ending, whose high-frequency suffixes would be
   quadratic; the cap drops them while digit-tail-bearing blocks (size
   <= cap) survive. Candidates/record measures the surviving background
   collision rate.
3. No driver loops / windows: wall is three shuffles (block sizes,
   within-block join, pair agg); records/sec should scale with cores.

Usage: python scripts/suffix_scale.py [--records 1000000] [--cores 16]
       [--explain]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hamerkop_spark.operators.blocking_eval import suffix_array_candidates
from hamerkop_spark.session import get_spark

SYL = ["kar", "mol", "vet", "san", "bor", "lim", "tos", "rud",
       "gan", "pel", "dur", "nov", "sta", "riv", "hal", "zem"]
MIN_SFX = 6
CAP = 50
DUP_OFFSET = 1 << 40


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()

    spark = get_spark(
        app_name="suffix-scale", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    syl = F.array(*[F.lit(s) for s in SYL])

    def pick(seed: int):
        return F.element_at(
            syl, (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(16)) + 1).cast("int")
        )

    base = spark.range(args.records).select(
        F.col("id").alias("rec_id"),
        F.concat(
            pick(1), pick(2), pick(3),
            F.lpad(F.col("id").cast("string"), 8, "0"),
            F.when(
                F.pmod(F.xxhash64("id", F.lit(4)), F.lit(10)) < 1,
                F.lit("corporation"),
            ).otherwise(F.lit("")),
        ).alias("nm"),
    )
    # 20% head-damaged duplicates: first two characters destroyed
    dups = base.where(F.pmod(F.xxhash64("rec_id", F.lit(5)), F.lit(5)) < 1).select(
        (F.col("rec_id") + F.lit(DUP_OFFSET)).alias("rec_id"),
        F.substring("nm", 3, 10_000).alias("nm"),
    )
    recs = base.unionByName(dups).persist()
    n_gold = dups.count()
    n_recs = recs.count()

    cands = suffix_array_candidates(
        recs, "nm", "rec_id", min_suffix_len=MIN_SFX, max_block_size=CAP
    )
    if args.explain:
        cands.explain("formatted")

    # warm codegen on a slice, then measure
    suffix_array_candidates(
        recs.limit(50_000), "nm", "rec_id",
        min_suffix_len=MIN_SFX, max_block_size=CAP,
    ).count()
    t0 = time.time()
    n_pairs = cands.count()
    wall = time.time() - t0

    hits = cands.where(
        F.col("b_id") - F.col("a_id") == F.lit(DUP_OFFSET)
    ).count()

    print(json.dumps({
        "records": n_recs,
        "cores": args.cores,
        "min_suffix_len": MIN_SFX,
        "max_block_size": CAP,
        "wall_sec": round(wall, 2),
        "records_per_sec": int(n_recs / wall),
        "pairs_out": n_pairs,
        "cand_per_record": round(n_pairs / n_recs, 2),
        "gold_pairs": n_gold,
        "recall": round(hits / n_gold, 4) if n_gold else None,
    }))


if __name__ == "__main__":
    main()
