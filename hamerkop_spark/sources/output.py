"""LoReHLT submission-format writer/reader (SURVEY.md §2.1 S5/S6;
reference hamerkop/io.py:269-332)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_submission(
    mentions_with_chains: DataFrame,
    decisions: DataFrame,
    system: str = "hamerkop_spark",
    prob: float = 0.1,
) -> DataFrame:
    """S5 OutputWriter.write (io.py:286-297): one row per mention with its
    chain's entity id or 'NIL'; fixed confidence; extents doc:start-stop.
    Write with .write.csv(sep='\\t') for the on-disk format."""
    joined = mentions_with_chains.join(decisions, ["doc_id", "chain_id"], "left")
    return joined.select(
        F.lit(system).alias("system_run_id"),
        F.col("mention_id"),
        F.col("original_string").alias("mention_text"),
        F.concat_ws(
            ":",
            F.col("doc_id"),
            F.concat_ws("-", F.col("char_start"), F.col("char_stop")),
        ).alias("extents"),
        F.coalesce(F.col("entity_id"), F.lit("NIL")).alias("kb_id"),
        F.col("type").alias("entity_type"),
        F.lit("NAM").alias("mention_type"),
        F.lit(prob).alias("confidence"),
    )


def parse_ground_truth(gt: DataFrame) -> DataFrame:
    """S6 OutputReader.read (io.py:300-332): parse extents into
    (doc_id, char_start, char_stop); NIL detection by substring; '|'-split
    multi-gold links; NIL rows carry cluster_id instead."""
    # reference: doc_id = extents.split(':')[0] (io.py:318-320) — valid
    # because LoReHLT doc ids never contain ':'. This corpus uses urls as
    # doc ids (input_hint: doc_id := url), so anchor on the LAST colon;
    # for colon-free ids the two rules agree.
    rx = r"^(.*):([0-9]+)-([0-9]+)$"
    is_nil = F.col("kb_id").contains("NIL")
    return gt.select(
        F.regexp_extract("extents", rx, 1).alias("doc_id"),
        F.regexp_extract("extents", rx, 2).cast("int").alias("char_start"),
        F.regexp_extract("extents", rx, 3).cast("int").alias("char_stop"),
        F.col("entity_type"),
        F.when(is_nil, F.lit("NIL")).otherwise(F.lit("link")).alias("link_type"),
        F.when(is_nil, F.array().cast("array<string>"))
        .otherwise(F.split("kb_id", r"\|"))
        .alias("gold_links"),
        F.when(is_nil, F.col("kb_id")).alias("cluster_id"),
        F.col("mention_text").alias("name"),
    )


def gold_cluster_key(gt_parsed: DataFrame) -> DataFrame:
    """Gold cluster id per mention (CorefScorer._create_cluster_id,
    coref.py:179-183): NIL rows use cluster_id, linked rows the
    '|'-joined link set."""
    return gt_parsed.withColumn(
        "gold_cluster",
        F.when(F.col("link_type") == "NIL", F.col("cluster_id")).otherwise(
            F.array_join("gold_links", "|")
        ),
    )
