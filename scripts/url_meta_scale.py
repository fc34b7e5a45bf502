"""Scale measurement for the round-5 web/meta additions:

* URL canonicalization (functions/url.py) — pure-projection throughput
  (rows/s) and the canonical-URL dedup groupBy, at two parallelism
  levels (the sandbox stand-in for two cluster sizes);
* WEP meta-blocking (operators/blocking_eval.meta_blocking_wep) —
  wall vs #block-assignments at fixed block-size cap (the claim: cost
  is the capped within-block self-join + one global bar, no windows);
* modularity (operators/scoring.modularity) — wall vs #edges (the
  claim: two keyed partial aggs, flat per-edge cost).

All inputs are Spark-generated and deterministic (id arithmetic, no
Python RNG). One JSON line per measurement.

Usage: python scripts/url_meta_scale.py [--urls 10000000]
       [--assignments 2000000] [--edges 4000000] [--cores 16]
       [--skip-url] [--skip-wep] [--skip-mod]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def force(df) -> int:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
    ).collect()[0]
    return row["n"]


def messy_urls(spark, n: int):
    """n messy URLs over n//4 pages (same variant family as the
    web_url_canonical oracle fixture, scaled)."""
    d = F.col("id")
    page = F.expr("id div 4")
    v = F.pmod(d, 4)
    ps = page.cast("string")
    host = F.concat(
        F.lit("h"), F.pmod(page, 50_000).cast("string"),
        F.when(F.pmod(page, 3) == 0, F.lit(".example.co.uk"))
        .otherwise(F.lit(".example.com")),
    )
    item = F.concat(F.lit("/item/"), ps)
    url = (
        F.when(v == 0, F.concat(F.lit("http://"), host, item,
                                F.lit("?b=2&a=1")))
        .when(v == 1, F.concat(F.lit("HTTP://"), F.upper(host),
                               F.lit(":80"), item,
                               F.lit("?a=1&utm_source=feed&b=2")))
        .when(v == 2, F.concat(F.lit("http://"), host, item,
                               F.lit("?b=2&a=1&gclid=g"), ps,
                               F.lit("#sec")))
        .otherwise(F.concat(F.lit("http://"), host, item,
                            F.lit("?a=1&b=2&ref=tw")))
    )
    return spark.range(n).select(d.alias("doc_id"), url.alias("url"))


def bench_url(spark, n: int) -> dict:
    from hamerkop_spark.functions.url import url_canonicalize

    base = messy_urls(spark, n).localCheckpoint()  # synthesis untimed
    t0 = time.time()
    force(base.select("doc_id", url_canonicalize("url").alias("c")))
    proj_dt = time.time() - t0
    t0 = time.time()
    groups = (
        base.select("doc_id", url_canonicalize("url").alias("c"))
        .groupBy("c")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("first"))
    )
    n_groups = force(groups)
    dedup_dt = time.time() - t0
    base.unpersist()
    return {
        "op": "url_canonicalize", "rows": n,
        "project_s": round(proj_dt, 2),
        "project_rows_per_s": round(n / proj_dt),
        "dedup_s": round(dedup_dt, 2), "groups": n_groups,
    }


def bench_wep(spark, n_assign: int) -> dict:
    from hamerkop_spark.operators.blocking_eval import meta_blocking_wep

    # ~4 block keys per record, block sizes ~8 via key arithmetic
    recs = n_assign // 4
    blocks = (
        spark.range(n_assign)
        .select(
            F.pmod(F.col("id"), recs).alias("record_id"),
            F.concat(
                F.lit("k"),
                F.pmod(
                    F.col("id") * 2654435761 + F.expr("id div 4") * 97,
                    F.lit(max(n_assign // 8, 1)),
                ).cast("string"),
            ).alias("block_key"),
        )
        .localCheckpoint()
    )
    out = {}
    for scheme in ("cbs", "ecbs"):
        t0 = time.time()
        n_pairs = force(meta_blocking_wep(blocks, scheme=scheme))
        out[scheme] = {
            "s": round(time.time() - t0, 2), "survivors": n_pairs,
        }
    blocks.unpersist()
    return {"op": "meta_blocking_wep", "assignments": n_assign, **out}


def bench_mod(spark, n_edges: int) -> dict:
    from hamerkop_spark.operators.scoring import modularity

    nodes = n_edges // 3
    edges = (
        spark.range(n_edges)
        .select(
            F.pmod(F.col("id") * 2654435761, nodes).alias("a_id"),
            F.pmod(F.col("id") * 40503 + 17, nodes).alias("b_id"),
            (F.pmod(F.col("id"), 9000) / 10000.0 + 0.1).alias("score"),
        )
        .localCheckpoint()
    )
    asg = (
        spark.range(nodes)
        .select(
            F.col("id").alias("mention_key"),
            F.concat(F.lit("c"), F.pmod(F.col("id"), 1000).cast("string"))
            .alias("cluster"),
        )
        .localCheckpoint()
    )
    t0 = time.time()
    n_rows = force(modularity(asg, edges))
    dt = time.time() - t0
    edges.unpersist(); asg.unpersist()
    return {
        "op": "modularity", "edges": n_edges, "s": round(dt, 2),
        "edges_per_s": round(n_edges / dt), "clusters": n_rows - 1,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=10_000_000)
    ap.add_argument("--assignments", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=4_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--skip-url", action="store_true")
    ap.add_argument("--skip-wep", action="store_true")
    ap.add_argument("--skip-mod", action="store_true")
    args = ap.parse_args()

    from hamerkop_spark.session import get_spark

    spark = get_spark(
        app_name="url-meta-scale", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    if not args.skip_url:
        print(json.dumps({"cores": args.cores, **bench_url(spark, args.urls)}))
    if not args.skip_wep:
        print(json.dumps(
            {"cores": args.cores, **bench_wep(spark, args.assignments)}
        ))
    if not args.skip_mod:
        print(json.dumps({"cores": args.cores, **bench_mod(spark, args.edges)}))
    print(json.dumps({"total_wall_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
