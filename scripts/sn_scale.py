"""Scale measurement for sorted-neighborhood blocking
(operators/blocking_eval.sorted_neighborhood_candidates).

Evidence for two claims the docstrings make:

1. No single-partition global window: the rank comes from
   repartitionByRange + a per-partition Arrow index + offset map, so
   wall scales with cores instead of serializing on one task.
2. Key-skew independence: output is exactly (w-1)*n - w*(w-1)/2 rows
   whatever the key distribution — measured here with 30% of records
   sharing ONE hot key (the distribution that melts equality blocking).

Usage: python scripts/sn_scale.py [--records 2000000] [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hamerkop_spark.operators.blocking_eval import (
    sorted_neighborhood_candidates,
)
from hamerkop_spark.session import get_spark

WINDOW = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark(
        app_name="sn-scale", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 30% of records share one hot key; the rest draw from 1k keys
    recs = spark.range(args.records).select(
        F.col("id").alias("rec_id"),
        F.when(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10)) < 3, F.lit("HOT"))
        .otherwise(
            F.concat(
                F.lit("k"),
                F.lpad(
                    F.pmod(F.xxhash64("id", F.lit(9)), F.lit(1000)).cast(
                        "string"
                    ),
                    4,
                    "0",
                ),
            )
        )
        .alias("sn_key"),
    )

    # warm codegen on a slice, then measure
    sorted_neighborhood_candidates(
        recs.limit(50_000), "sn_key", "rec_id", window=WINDOW
    ).count()
    t0 = time.time()
    n_pairs = sorted_neighborhood_candidates(
        recs, "sn_key", "rec_id", window=WINDOW
    ).count()
    wall = time.time() - t0

    expected = (WINDOW - 1) * args.records - WINDOW * (WINDOW - 1) // 2
    print(json.dumps({
        "records": args.records,
        "cores": args.cores,
        "window": WINDOW,
        "wall_sec": round(wall, 2),
        "records_per_sec": int(args.records / wall),
        "pairs_out": n_pairs,
        "pairs_expected": expected,
        "skew_independent": n_pairs == expected,
    }))


if __name__ == "__main__":
    main()
