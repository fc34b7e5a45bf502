"""Scale measurement for privacy-preserving linkage
(operators/pprl: clk_positions -> pprl_candidates -> pprl_match).

Evidence for the scale-shape claims:

1. Encoding is embarrassingly parallel (one expression chain per
   record, no shuffle) — encode wall tracks record count linearly.
2. Blocking is minhash-LSH, so the candidate count tracks the true
   near-duplicate density, not N² — measured as candidates-per-record
   staying flat while N grows.
3. Matching cost is one array intersection per CANDIDATE.

The corpus is deterministic synthetic names: N records per side;
side B perturbs each name (char drop) so every record has exactly one
true match, plus hash-derived token reuse so blocks are non-trivial.

Usage: python scripts/pprl_scale.py [--n 100000] [--cores 16]
       [--bands 8] [--rows 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hamerkop_spark.operators.pprl import (
    clk_positions,
    pprl_candidates,
    pprl_match,
)
from hamerkop_spark.session import get_spark


def _names(spark, n, drop_last=False):
    """Deterministic synthetic full names: two 8-letter tokens derived
    from hash hex (digits remapped to letters), so the BIGRAM space is
    wide like real multilingual surname data — a syllable-pool
    generator was measured to inflate the blocking candidate count
    ~20x because every name shared the same ~40 bigrams."""
    base = spark.range(n).select(F.col("id"))
    tok = lambda h: F.translate(  # noqa: E731
        F.lower(F.hex(F.xxhash64(F.col("id"), F.lit(h)))),
        "0123456789", "ghijklmnop",
    ).substr(1, 8)
    name = F.concat(tok(1), F.lit(" "), tok(2))
    if drop_last:
        name = F.expr(
            "substring(nm, 1, length(nm) - 1)"
        )
        return base.withColumn("nm", F.concat(tok(1), F.lit(" "), tok(2))) \
            .select("id", name.alias("name"))
    return base.select("id", name.alias("name"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--n-bits", dest="n_bits", type=int, default=2048)
    args = ap.parse_args()

    spark = get_spark(
        app_name="pprl-scale", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    pad = lambda c: F.concat(  # noqa: E731
        F.lit("_"), F.translate(F.trim(F.lower(c)), " ", "_"), F.lit("_")
    )
    enc = lambda c: clk_positions(  # noqa: E731
        pad(c), n_bits=args.n_bits, salt="k1"
    )

    t0 = time.time()
    a = _names(spark, args.n).select(
        F.col("id").alias("a_id"), enc(F.col("name")).alias("a_pos")
    ).localCheckpoint()
    b = _names(spark, args.n, drop_last=True).select(
        F.col("id").alias("b_id"), enc(F.col("name")).alias("b_pos")
    ).localCheckpoint()
    encode_s = time.time() - t0

    t0 = time.time()
    cand = pprl_candidates(a, b, bands=args.bands, band_rows=args.rows)
    n_cand = cand.count()
    block_s = time.time() - t0

    t0 = time.time()
    matches = pprl_match(a, b, threshold_micro=700_000,
                         bands=args.bands, band_rows=args.rows)
    true_hits = matches.where(F.col("a_id") == F.col("b_id")).count()
    n_match = matches.count()
    match_s = time.time() - t0

    print(json.dumps({
        "n_per_side": args.n,
        "cores": args.cores,
        "encode_seconds": round(encode_s, 2),
        "encode_rows_per_sec": round(2 * args.n / encode_s, 1),
        "block_seconds": round(block_s, 2),
        "candidates": n_cand,
        "candidates_per_record": round(n_cand / args.n, 2),
        "match_seconds": round(match_s, 2),
        "matches": n_match,
        "true_pair_recall": round(true_hits / args.n, 4),
    }))


if __name__ == "__main__":
    main()
