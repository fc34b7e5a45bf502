"""Scale + quality measurement for the one-call dedupe plan
(plans/dedupe.dedupe_records) across its scorer x clustering knobs.

Corpus: 3-token company-style names from a hash-derived vocabulary
(posting sizes ~O(1)); 20% of records get a near-duplicate — half
TOKEN-REORDERED (t2 t1 t3: invisible to whole-string JW, trivial for
SoftTFIDF), half TYPO'd (last char of t1 swapped: JW territory).
Claims evidenced:

1. Pair recall per configuration, split by damage type — the measured
   version of the scorer tradeoff (jw misses reorders, soft_tfidf
   catches both at one threshold).
2. Wall + records/sec per configuration at a chosen core count — run
   at two --cores levels for the two-parallelism scaling evidence.
3. The whole plan stays blocked (exact/soundex/token keys, max_block
   purge) and distributed end-to-end — no driver loops.

Usage: python scripts/dedupe_scale.py [--records 200000] [--cores 16]
       [--threshold 0.85] [--configs jw:cc,soft_tfidf:pivot]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hamerkop_spark.plans.dedupe import dedupe_records

DUP_OFFSET = 1 << 40


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument(
        "--configs", default="jw:cc,jw:pivot,soft_tfidf:cc,soft_tfidf:pivot"
    )
    args = ap.parse_args()

    from hamerkop_spark.session import get_spark

    spark = get_spark(
        app_name="dedupe-scale", cores=args.cores,
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
    # half reorder (t2 t1 t3), half typo (last char of t1 -> 'q')
    reorder = F.pmod(F.xxhash64("record_id", F.lit(11)), F.lit(2)) == 0
    dups = dup_src.select(
        (F.col("record_id") + F.lit(DUP_OFFSET)).alias("record_id"),
        F.when(reorder, F.col("t2")).otherwise(
            F.expr("concat(substr(t1, 1, length(t1) - 1), 'q')")
        ).alias("t1"),
        F.when(reorder, F.col("t1")).otherwise(F.col("t2")).alias("t2"),
        F.col("t3"),
        reorder.alias("is_reorder"),
    )
    recs = (
        base.withColumn("is_reorder", F.lit(None).cast("boolean"))
        .unionByName(dups)
        .select(
            "record_id",
            F.concat_ws(" ", "t1", "t2", "t3").alias("name"),
            "is_reorder",
        )
        .persist()
    )
    n_recs = recs.count()
    gold = dups.select(
        (F.col("record_id") - F.lit(DUP_OFFSET)).alias("a_id"),
        F.col("record_id").alias("b_id"),
        "is_reorder",
    ).persist()
    n_gold = gold.count()

    out = {
        "records": n_recs, "gold_pairs": n_gold, "cores": args.cores,
        "threshold": args.threshold, "configs": {},
    }
    for cfg in args.configs.split(","):
        scorer, clustering = cfg.split(":")
        t0 = time.time()
        res = dedupe_records(
            recs.select("record_id", "name"),
            jw_threshold=args.threshold,
            scorer=scorer,
            clustering=clustering,
        )
        n_clusters = res["n_clusters"]
        wall = time.time() - t0
        cl = res["clusters"].select(
            F.col("record_id").alias("_rid"), "cluster"
        )
        hit = (
            gold.join(cl.withColumnRenamed("_rid", "a_id"), "a_id")
            .withColumnRenamed("cluster", "ca")
            .join(cl.withColumnRenamed("_rid", "b_id"), "b_id")
            .withColumnRenamed("cluster", "cb")
            .where(F.col("ca") == F.col("cb"))
        )
        by_kind = {
            r.is_reorder: r.n
            for r in hit.groupBy("is_reorder").agg(
                F.count("*").alias("n")
            ).collect()
        }
        gold_kind = {
            r.is_reorder: r.n
            for r in gold.groupBy("is_reorder").agg(
                F.count("*").alias("n")
            ).collect()
        }
        # pairwise precision: predicted co-clustered pairs vs gold hits
        pred_pairs = (
            cl.groupBy("cluster")
            .agg(F.count("*").alias("sz"))
            .agg(
                F.sum(
                    F.shiftright(F.col("sz") * (F.col("sz") - 1), 1)
                ).alias("p")
            )
            .collect()[0].p
        ) or 0
        n_hit = sum(by_kind.values())
        out["configs"][cfg] = {
            "wall_sec": round(wall, 2),
            "records_per_sec": int(n_recs / wall),
            "n_pairs_scored": res["n_pairs"],
            "n_clusters": n_clusters,
            "recall_reorder": round(
                by_kind.get(True, 0) / gold_kind[True], 4
            ),
            "recall_typo": round(
                by_kind.get(False, 0) / gold_kind[False], 4
            ),
            "pairwise_precision": round(n_hit / pred_pairs, 4)
            if pred_pairs else None,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
