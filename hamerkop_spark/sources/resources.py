"""Small resource loaders (SURVEY.md §2.1 S10/S11).

The reference loads stemmer/blacklist/acronym dictionaries into python
dicts/sets (hamerkop/utilities.py:127-151) and caches translations in an
append-only TSV (utilities.py:154-200). Engine-native equivalents:
small broadcastable DataFrames, and a checkpointed lookup table joined
before any expensive recomputation (the batch analog of the KV cache —
"sync period" is meaningless in batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_dictionary(
    spark: SparkSession, path: str, lowercase_keys: bool = True
) -> DataFrame:
    """S11 DictionaryLoader (utilities.py:127-138): 2-column TSV ->
    (key, value), keys trimmed (and lowercased by default)."""
    df = spark.read.csv(path, sep="\t", header=False).select(
        F.trim(F.col("_c0")).alias("key"), F.trim(F.col("_c1")).alias("value")
    )
    if lowercase_keys:
        df = df.withColumn("key", F.lower("key"))
    return df


def read_set(spark: SparkSession, path: str, lowercase: bool = True) -> DataFrame:
    """S11 SetLoader (utilities.py:141-151): one value per line."""
    df = spark.read.text(path).select(F.trim(F.col("value")).alias("value"))
    if lowercase:
        df = df.withColumn("value", F.lower("value"))
    return df.where(F.col("value") != "").distinct()


def cached_lookup(
    spark: SparkSession,
    cache_path: str,
    requests: DataFrame,
    key_col: str,
    compute,
) -> DataFrame:
    """S10 TsvKeyValueCache analog (utilities.py:154-200): a persistent
    (key, value) parquet table consulted before computing; misses are
    computed (deduplicated first) and appended, then the union serves the
    requests. `compute` maps a DataFrame of distinct (key) rows to
    (key, value)."""
    have = (
        spark.read.parquet(cache_path)
        if os.path.exists(cache_path)
        else spark.createDataFrame([], "key string, value string")
    )
    keys = requests.select(F.col(key_col).alias("key")).distinct()
    misses = keys.join(have, "key", "left_anti")
    if not misses.isEmpty():
        new_values = compute(misses)
        new_values.write.mode("append").parquet(cache_path)
        have = spark.read.parquet(cache_path)
    return requests.join(
        have.withColumnRenamed("key", key_col), key_col, "left"
    )
