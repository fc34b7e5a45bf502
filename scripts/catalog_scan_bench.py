"""Measure manifest-based file skipping: a warc_ts range query over a
catalog table accumulated from many time-ordered append commits (the
shape a streaming crawl sink produces), read three ways:

  1. read().filter(...)  — full directory listing, Spark prunes row
     groups AFTER opening every footer
  2. scan(filters)       — manifest planning first: files that cannot
     match are never opened (Iceberg scan semantics)
  3. scan_plan only      — the pure planning cost (no Spark job)

At sandbox scale the parquet reads are page-cached, so wall-clock deltas
understate the win; the honest scale number is files-opened: at 10^12
documents the pruned files are network fetches that never happen.

Usage: python scripts/catalog_scan_bench.py [n_commits] [rows_per_commit]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hamerkop_spark.session import get_spark
from hamerkop_spark.sources.catalog import IcebergishCatalog

N_COMMITS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
BASE_TS = 1700000000  # 2023-11-14T22:13:20Z


def main():
    spark = get_spark(app_name="catalog-scan-bench", cores=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/hk_catalog_scan_bench"
    shutil.rmtree(root, ignore_errors=True)
    cat = IcebergishCatalog(spark, root)

    t0 = time.time()
    for day in range(N_COMMITS):
        df = spark.range(0, ROWS).select(
            F.concat(F.lit(f"https://day{day}.example.com/"),
                     F.col("id").cast("string")).alias("url"),
            F.timestamp_seconds(
                F.lit(BASE_TS + day * 86400)
                + (F.col("id") * 86400 / ROWS).cast("long")
            ).alias("warc_ts"),
            F.sha2(F.concat(F.lit(day), F.col("id").cast("string")), 256)
            .alias("text"),
            F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        )
        cat.commit("pages", df.repartition(4),
                   mode="append" if day else "overwrite")
    build_s = time.time() - t0
    m = cat.table_metrics("pages")
    print(f"built: {N_COMMITS} commits, {m['rows']} rows, {m['files']} files, "
          f"{m['bytes']/1e6:.1f} MB in {build_s:.1f}s")

    import datetime as dt
    mid = N_COMMITS // 2
    lo = dt.datetime.fromtimestamp(BASE_TS + mid * 86400, dt.timezone.utc)
    hi = dt.datetime.fromtimestamp(BASE_TS + (mid + 1) * 86400, dt.timezone.utc)
    filters = [("warc_ts", ">=", lo), ("warc_ts", "<", hi)]
    pred = (F.col("warc_ts") >= lo) & (F.col("warc_ts") < hi)

    # warm both paths once (JIT/codegen), then best-of-3
    cat.read("pages").filter(pred).count()
    cat.scan("pages", filters).count()

    def best_of(fn, n=3):
        best, out = None, None
        for _ in range(n):
            t = time.time()
            out = fn()
            best = min(best or 9e9, time.time() - t)
        return best, out

    t_plan, plan = best_of(lambda: cat.scan_plan("pages", filters))
    t_full, n_full = best_of(lambda: cat.read("pages").filter(pred).count())
    t_scan, n_scan = best_of(lambda: cat.scan("pages", filters).count())
    assert n_full == n_scan, (n_full, n_scan)
    print(f"1-day range over {N_COMMITS} days: {n_scan} rows")
    print(f"  read+filter : {t_full:.3f}s  (opens all {plan['files_total']} files)")
    print(f"  scan        : {t_scan:.3f}s  (opens {plan['files_scanned']} files, "
          f"pruned {plan['files_pruned']})")
    print(f"  plan only   : {t_plan*1000:.1f}ms  (opens 0 files)")

    # point lookup: url equality prunes on string bounds too
    url = f"https://day{mid}.example.com/{ROWS//2}"
    p2 = cat.scan_plan("pages", [("url", "=", url)])
    t_scan2, n2 = best_of(lambda: cat.scan("pages", [("url", "=", url)]).count())
    t_full2, _ = best_of(
        lambda: cat.read("pages").filter(F.col("url") == url).count())
    print(f"point lookup: {n2} row; scan {t_scan2:.3f}s over "
          f"{p2['files_scanned']}/{p2['files_total']} files vs "
          f"read+filter {t_full2:.3f}s")

    # -- bloom scenario: OVERLAPPING url ranges (round-robin hosts), the
    # append-stream shape where min/max bounds prune nothing ------------
    def build_rr(table, bloom_for):
        t = time.time()
        for b in range(N_COMMITS):
            df = spark.range(0, ROWS).select(
                F.concat(F.lit("https://h"),
                         (F.col("id") % 97).cast("string"),
                         F.lit(".ex/"), F.lit(b), F.lit("/"),
                         F.col("id").cast("string")).alias("url"),
                F.lit(b).alias("batch"),
                F.sha2(F.concat(F.lit(b), F.col("id").cast("string")), 256)
                .alias("text"),
            )
            cat.commit(table, df.repartition(4),
                       mode="append" if b else "overwrite",
                       bloom_for=bloom_for)
        return time.time() - t

    t_nobloom = build_rr("pages_rr", None)
    t_bloom = build_rr("pages_rr_b", ["url"])
    url = f"https://h{(ROWS // 2) % 97}.ex/{mid}/{ROWS // 2}"
    cat.scan("pages_rr", [("url", "=", url)]).count()  # warm
    cat.scan("pages_rr_b", [("url", "=", url)]).count()
    p_no = cat.scan_plan("pages_rr", [("url", "=", url)])
    p_bl = cat.scan_plan("pages_rr_b", [("url", "=", url)])
    t_no, n_no = best_of(
        lambda: cat.scan("pages_rr", [("url", "=", url)]).count())
    t_bl, n_bl = best_of(
        lambda: cat.scan("pages_rr_b", [("url", "=", url)]).count())
    assert n_no == n_bl == 1, (n_no, n_bl)
    print(f"bloom point lookup (overlapping ranges, {N_COMMITS} commits):")
    print(f"  stats only  : {t_no:.3f}s  opens {p_no['files_scanned']}"
          f"/{p_no['files_total']} (min/max cannot prune)")
    print(f"  bloom       : {t_bl:.3f}s  opens {p_bl['files_scanned']}"
          f"/{p_bl['files_total']}")
    print(f"  commit cost : {t_nobloom:.1f}s no-bloom vs {t_bloom:.1f}s "
          f"bloom (+{(t_bloom / t_nobloom - 1) * 100:.0f}%)")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
