"""Scale measurement for Fellegi-Sunter EM (operators/linkage.fit_fs_em).

Generates N comparison pairs fully JVM-side (spark.range + xxhash64
bits — no Python in the data path), fits EM, and reports the wall and
throughput. The point being evidenced: the distributed cost is ONE
groupBy histogram pass over the pairs, so iteration count (default 100)
never touches the cluster — EM wall tracks the histogram scan, not the
E/M math.

Usage: python scripts/fs_em_scale.py [--pairs 5000000] [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hamerkop_spark.operators.linkage import fit_fs_em
from hamerkop_spark.session import get_spark

TRUE_P = 0.25
TRUE_M = {"g1": 0.92, "g2": 0.85, "g3": 0.95}
TRUE_U = {"g1": 0.08, "g2": 0.25, "g3": 0.04}


def _bit(h_col, prob):
    # xxhash64 output is a uniform signed 64-bit int; a pmod-10k slice
    # gives a deterministic Bernoulli(prob) draw
    return (F.pmod(h_col, F.lit(10_000)) < F.lit(int(prob * 10_000))).cast(
        "int"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=5_000_000)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark(
        app_name="fs-em-scale", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(args.pairs).withColumn(
        "is_match",
        F.pmod(F.xxhash64("id", F.lit(0)), F.lit(10_000))
        < F.lit(int(TRUE_P * 10_000)),
    )
    cols = []
    for i, f in enumerate(["g1", "g2", "g3"], start=1):
        h = F.xxhash64("id", F.lit(i))
        cols.append(
            F.when(F.col("is_match"), _bit(h, TRUE_M[f]))
            .otherwise(_bit(h, TRUE_U[f]))
            .alias(f)
        )
    pairs = base.select(*cols)

    # warm the JVM/codegen once on a slice, then measure
    fit_fs_em(pairs.limit(100_000), ["g1", "g2", "g3"], iterations=5)
    t0 = time.time()
    fit = fit_fs_em(pairs, ["g1", "g2", "g3"], iterations=100)
    wall = time.time() - t0

    err = max(
        abs(fit["p"] - TRUE_P),
        *(abs(fit["m"][f] - TRUE_M[f]) for f in TRUE_M),
        *(abs(fit["u"][f] - TRUE_U[f]) for f in TRUE_U),
    )
    print(json.dumps({
        "pairs": args.pairs,
        "cores": args.cores,
        "wall_sec": round(wall, 2),
        "pairs_per_sec": int(args.pairs / wall),
        "em_iterations": fit["iterations"],
        "converged": fit["converged"],
        "max_param_abs_error": round(err, 4),
    }))


if __name__ == "__main__":
    main()
