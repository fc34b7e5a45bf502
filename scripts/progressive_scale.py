"""Scale + quality measurement for progressive (pay-as-you-go) ER
(operators/progressive.py).

Corpus: the dedupe_scale generator shape — 3-token hash-vocabulary
names, 20% near-duplicates (half token-reordered, half typo'd) — but
the measured stage is candidate RANKING, not scoring: ARCS weights
over the dedupe plan's own blocking melt (exact + soundex + token
keys), then exact top-B selection at several budgets.

Claims evidenced:

1. ARCS front-loads true matches: recall@budget curve (what fraction
   of gold dup pairs rank inside the top f * n_pairs candidates).
2. Exact selection cost, sort path (TakeOrderedAndProject) vs
   threshold path (radix quickselect) at small and large budgets —
   the crossover that motivates having both.
3. The whole stage is distributed: one melt, one size agg, one capped
   self-join, one pair agg, <= 11 histogram rounds of <= 64 driver
   rows. Run at two --cores levels for two-parallelism evidence.

Usage: python scripts/progressive_scale.py [--records 2000000]
       [--cores 16] [--budget-fracs 0.01,0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hamerkop_spark.operators.progressive import (
    arcs_pair_weights,
    recall_at_budget,
    select_top_pairs,
)
from hamerkop_spark.plans.dedupe import _KEYERS

DUP_OFFSET = 1 << 40


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--budget-fracs", default="0.01,0.1")
    ap.add_argument(
        "--recall-fracs", default="0.01,0.02,0.05,0.1,0.25,0.5,1.0"
    )
    args = ap.parse_args()

    from hamerkop_spark.session import get_spark

    spark = get_spark(
        app_name="progressive-scale", cores=args.cores,
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
    reorder = F.pmod(F.xxhash64("record_id", F.lit(11)), F.lit(2)) == 0
    dups = dup_src.select(
        (F.col("record_id") + F.lit(DUP_OFFSET)).alias("record_id"),
        F.when(reorder, F.col("t2")).otherwise(
            F.expr("concat(substr(t1, 1, length(t1) - 1), 'q')")
        ).alias("t1"),
        F.when(reorder, F.col("t1")).otherwise(F.col("t2")).alias("t2"),
        F.col("t3"),
    )
    recs = (
        base.unionByName(dups)
        .select(
            "record_id",
            F.lower(F.concat_ws(" ", "t1", "t2", "t3")).alias("_norm"),
        )
        .persist()
    )
    n_recs = recs.count()
    gold = dups.select(
        (F.col("record_id") - F.lit(DUP_OFFSET)).alias("a_id"),
        F.col("record_id").alias("b_id"),
    ).persist()
    n_gold = gold.count()

    # the dedupe plan's own blocking melt (exact + soundex + token)
    melted = None
    for gen in ("exact", "soundex", "token"):
        part = recs.select(
            F.col("record_id").alias("_id"),
            F.explode(_KEYERS[gen](F.col("_norm"))).alias("_key"),
        ).where(F.col("_key").isNotNull() & (F.col("_key") != ""))
        melted = part if melted is None else melted.unionByName(part)

    t0 = time.time()
    weighted = arcs_pair_weights(
        melted, key_col="_key", id_col="_id", max_block_size=100
    ).persist()
    n_pairs = weighted.count()
    weight_wall = time.time() - t0

    out = {
        "records": n_recs, "gold_pairs": n_gold, "cores": args.cores,
        "n_candidate_pairs": n_pairs,
        "arcs_weight_wall_sec": round(weight_wall, 2),
        "pairs_weighted_per_sec": int(n_pairs / weight_wall),
        "selection": {},
    }
    for frac in (float(f) for f in args.budget_fracs.split(",")):
        budget = max(1, int(frac * n_pairs))
        walls = {}
        for mode in ("sort", "threshold"):
            t0 = time.time()
            got = select_top_pairs(
                weighted, budget, mode=mode, boundary="exact"
            ).count()
            walls[mode] = round(time.time() - t0, 2)
            assert got == budget, (mode, got, budget)
        out["selection"][f"{frac}"] = {"budget": budget, **walls}

    t0 = time.time()
    curve = recall_at_budget(
        weighted, gold,
        [float(f) for f in args.recall_fracs.split(",")],
    ).collect()
    out["recall_curve"] = {
        str(r["frac"]): {"budget": r["budget"], "recall": r["recall"]}
        for r in sorted(curve, key=lambda r: r["frac"])
    }
    out["recall_curve_wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
