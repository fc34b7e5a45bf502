"""Scale measurement for the adaptive blocking-scheme learner
(operators/blocking_learn.py) on the dedupe_scale corpus shape.

What it evidences: the mask sufficient-statistics pass prices every
predicate-subset scheme in ONE distributed job over millions of
records (the greedy loop then runs on <= 2^K collected rows), and the
learned scheme is the sensible one — predicates that cover the
near-dup gold pairs cheaply come first, flood predicates are skipped.

Usage: python scripts/blocking_learn_scale.py [--records 1000000]
       [--cores 16] [--target-recall 0.98]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hamerkop_spark.functions.phonetic import soundex_key
from hamerkop_spark.operators.blocking_learn import learn_blocking_scheme

DUP_OFFSET = 1 << 40

KEYERS = {
    "exact": lambda c: F.array(F.concat(F.lit("x:"), c)),
    "token": lambda c: F.transform(
        F.array_distinct(F.split(c, " ")),
        lambda t: F.concat(F.lit("t:"), t),
    ),
    "soundex": lambda c: F.transform(
        F.split(c, " "),
        lambda t: F.concat(F.lit("s:"), soundex_key(t)),
    ),
    "prefix4": lambda c: F.array(
        F.concat(F.lit("p:"), F.substring(c, 1, 4))
    ),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--target-recall", type=float, default=0.98)
    args = ap.parse_args()

    from hamerkop_spark.session import get_spark

    spark = get_spark(
        app_name="blocking-learn-scale", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    vocab = max(1000, args.records // 2)

    def tok(seed: int):
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64("record_id", F.lit(seed)), F.lit(vocab)).cast(
                "string"
            ),
        )

    base = spark.range(args.records).select(
        F.col("id").alias("record_id"),
        tok(1).alias("t1"), tok(2).alias("t2"), tok(3).alias("t3"),
    )
    dup_src = base.where(
        F.pmod(F.xxhash64("record_id", F.lit(9)), F.lit(5)) < 1
    )
    # three damage classes: exact copy (cheap for the "exact"
    # predicate), token reorder and last-char typo (need "token") —
    # so the learner has a real cost-effectiveness ordering to find
    kind = F.pmod(F.xxhash64("record_id", F.lit(11)), F.lit(3))
    dups = dup_src.select(
        (F.col("record_id") + F.lit(DUP_OFFSET)).alias("record_id"),
        F.when(kind == 1, F.col("t2")).when(
            kind == 2,
            F.expr("concat(substr(t1, 1, length(t1) - 1), 'q')"),
        ).otherwise(F.col("t1")).alias("t1"),
        F.when(kind == 1, F.col("t1")).otherwise(F.col("t2")).alias("t2"),
        F.col("t3"),
    )
    recs = (
        base.unionByName(dups)
        .select(
            "record_id",
            F.lower(F.concat_ws(" ", "t1", "t2", "t3")).alias("name"),
        )
        .persist()
    )
    n_recs = recs.count()
    gold = dups.select(
        (F.col("record_id") - F.lit(DUP_OFFSET)).alias("a_id"),
        F.col("record_id").alias("b_id"),
    ).persist()
    n_gold = gold.count()

    t0 = time.time()
    res = learn_blocking_scheme(
        recs, gold, KEYERS, target_recall=args.target_recall
    )
    wall = time.time() - t0
    print(json.dumps({
        "records": n_recs,
        "gold_pairs": n_gold,
        "cores": args.cores,
        "wall_sec": round(wall, 2),
        "n_mask_rows": len(res["masks"]),
        "scheme": res["scheme"],
        "steps": res["steps"],
        "n_gold_coverable": res["n_gold_coverable"],
    }))


if __name__ == "__main__":
    main()
