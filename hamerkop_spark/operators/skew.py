"""Hot-key (skew) handling: salted joins and salted aggregations
(north_rule: "salted keys to defuse hot blocks"; SURVEY.md §4).

Web-scale blocking keys are Zipfian — a handful of keys ("john",
"smith", boilerplate shingles) carry a huge share of rows. A plain
hash-partitioned join or groupBy puts each key on ONE reducer: the hot
keys become stragglers no extra executors can help with. Remedies, in
order of preference:

1. broadcast the small side (blocking.ngram_candidates
   broadcast_postings) — no shuffle on the skewed key at all;
2. AQE skew-join splitting (on in session.py) — handles sort-merge
   skew at runtime;
3. explicit salting (this module) — when both sides are large and the
   hot keys are known or detectable: hot probe rows scatter over
   `num_salts` sub-keys (deterministic hash salt, never rand() — resume
   and retry safety), the build side replicates only for hot keys.

All salts are derived with xxhash64 over row content, so reruns are
byte-stable (SURVEY.md §2.8 T12 determinism convention).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame, keys: Sequence[str], threshold: int
) -> DataFrame:
    """Keys whose row count exceeds `threshold` (one cheap pre-pass
    aggregation — partial aggregation makes this map-side dominated)."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_key_cnt"))
        .where(F.col("_key_cnt") > threshold)
        .select(*keys)
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    num_salts: int = 16,
    hot_threshold: int = 100_000,
    hot_keys: DataFrame | None = None,
    salt_source: Sequence[str] | None = None,
) -> DataFrame:
    """Inner equi-join that splits hot keys across `num_salts` reducers.

    :param probe: large, skewed side.
    :param build: other side; replicated num_salts ways for hot keys only.
    :param hot_keys: optional precomputed hot-key DataFrame (columns =
        keys); detected from `probe` with `hot_threshold` otherwise.
    :param salt_source: probe columns the deterministic salt is hashed
        from (defaults to all probe columns).
    """
    keys = list(keys)
    if hot_keys is None:
        hot_keys = detect_hot_keys(probe, keys, hot_threshold)
    hot_keys = F.broadcast(hot_keys.select(*keys).distinct())

    salt_cols = [F.col(c) for c in (salt_source or probe.columns)]
    probe_marked = probe.join(
        hot_keys.withColumn("_hot", F.lit(True)), keys, "left"
    ).withColumn(
        "_salt",
        F.when(
            F.col("_hot").isNotNull(),
            F.pmod(F.xxhash64(*salt_cols), F.lit(num_salts)),
        ).otherwise(F.lit(0)),
    ).drop("_hot")

    build_hot = (
        build.join(hot_keys, keys)
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))
    )
    build_cold = build.join(hot_keys, keys, "left_anti").withColumn(
        "_salt", F.lit(0)
    )
    build_salted = build_hot.unionByName(build_cold)

    return probe_marked.join(build_salted, keys + ["_salt"]).drop("_salt")


def salted_count(
    df: DataFrame, keys: Sequence[str], num_salts: int = 16
) -> DataFrame:
    """Two-phase count for extremely hot group keys: pre-aggregate on
    (keys, salt), then combine. With Spark's map-side partial
    aggregation this is usually unnecessary for count/min/max — provided
    for aggregations whose partial state is wide (collect_set-like)."""
    keys = list(keys)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias("count"))


def salted_collect_set(
    df: DataFrame, keys: Sequence[str], value_col: str, num_salts: int = 16
) -> DataFrame:
    """collect_set with salted pre-aggregation: hot groups build their
    set in num_salts partial pieces (bounded reducer memory), then the
    pieces merge. Output: (keys..., values array)."""
    keys = list(keys)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(num_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.collect_set(value_col).alias("_vs")
    )
    return partial.groupBy(*keys).agg(
        F.array_distinct(F.flatten(F.collect_list("_vs"))).alias("values")
    )
