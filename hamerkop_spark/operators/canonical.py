"""Cluster canonicalization / survivorship (the "golden record" stage).

After transitive clustering, downstream consumers want ONE record per
entity. Survivorship picks each attribute's canonical value per
cluster; the two classic policies (Talburt, "Entity Resolution and
Information Quality", ch. 6):

* ``mode``   — most frequent non-null value, ties broken by value
  (deterministic, order-free);
* ``latest`` — value from the row maximal under an ordering column
  (recency wins — e.g. ``warc_ts`` for web pages), ties broken by
  value.

The reference has no merge stage (it emits per-mention links,
resolver.py:106-137); this is the standard completion of the
blocking -> scoring -> clustering -> MERGE pipeline.

Scale shape: one melt (explode over the attribute map — width k, so
k·rows, no pair blowup), one groupBy count / max, one window argmax
per (cluster, attribute), then conditional aggregation back to one
row per cluster. All shuffles key on (cluster, attr [, value]) —
skew bounded by the largest cluster, no driver state, no UDFs.
Values travel as strings through the melt (a survivorship table is a
presentation artifact; keep typed columns in the source table).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def golden_record(
    records: DataFrame,
    attrs: list[str],
    cluster_col: str = "cluster",
    strategy: str = "mode",
    order_col: str | None = None,
) -> DataFrame:
    """One row per cluster: (cluster, cluster_size, <attr>...) with each
    attribute's surviving value under `strategy`.

    mode:   argmax by (count desc, value asc) over non-null values.
    latest: argmax by (order_col desc, value asc) — requires order_col.

    Null survives only when a cluster has NO non-null value for the
    attribute.
    """
    if strategy not in ("mode", "latest"):
        raise ValueError(f"unknown survivorship strategy: {strategy!r}")
    if strategy == "latest" and not order_col:
        raise ValueError("strategy='latest' requires order_col")

    sizes = records.groupBy(cluster_col).agg(
        F.count("*").alias("cluster_size")
    )
    melt_cols = list(
        chain.from_iterable(
            (F.lit(a), F.col(a).cast("string")) for a in attrs
        )
    )
    melted = records.select(
        cluster_col,
        *([F.col(order_col).alias("_ord")] if order_col else []),
        F.explode(F.create_map(*melt_cols)).alias("_attr", "_val"),
    ).where(F.col("_val").isNotNull())

    if strategy == "mode":
        counted = melted.groupBy(cluster_col, "_attr", "_val").agg(
            F.count("*").alias("_n")
        )
        w = Window.partitionBy(cluster_col, "_attr").orderBy(
            F.desc("_n"), F.asc("_val")
        )
        winners = (
            counted.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(cluster_col, "_attr", "_val")
        )
    else:
        w = Window.partitionBy(cluster_col, "_attr").orderBy(
            F.desc("_ord"), F.asc("_val")
        )
        winners = (
            melted.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(cluster_col, "_attr", "_val")
        )

    # conditional aggregation instead of pivot: the attr list is known,
    # winners are unique per (cluster, attr), so max(CASE) is exact and
    # any ANSI engine reproduces it
    agg_cols = [
        F.max(F.when(F.col("_attr") == a, F.col("_val"))).alias(a)
        for a in attrs
    ]
    wide = winners.groupBy(cluster_col).agg(*agg_cols)
    return sizes.join(wide, cluster_col, "left")


def representative_name(
    mentions: DataFrame,
    cluster_col: str = "cluster",
    name_col: str = "name",
) -> DataFrame:
    """(cluster, rep_name): the cluster's canonical surface form —
    most frequent name, ties to the LONGEST then lexicographically
    smallest (longer surface forms carry more signal than truncated
    variants; the deterministic tail keeps resume byte-stable)."""
    counted = mentions.where(F.col(name_col).isNotNull()).groupBy(
        cluster_col, name_col
    ).agg(F.count("*").alias("_n"))
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc("_n"), F.desc(F.length(name_col)), F.asc(name_col)
    )
    return (
        counted.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(cluster_col, F.col(name_col).alias("rep_name"))
    )
