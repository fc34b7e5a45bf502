"""CoNLL token-stream ingest + BIO chunking (SURVEY.md §2.1, S1-S4).

The reference reads a tagged CoNLL TSV row-at-a-time and folds B-*/I-*
runs into mentions with a per-document Python loop (hamerkop/io.py:50-93,
96-164). Here the chunker is pure Catalyst: window functions assign
mention groups, groupBy folds each group into one mention — no UDF, no
per-document state, arbitrarily parallel.

Chunker semantics replicated exactly (io.py:110-147):
  * a mention starts at a B-* row;
  * it continues through consecutive I-* rows;
  * an I-* run without a preceding B is NOT a mention;
  * a B inside a mention closes it and opens a new one;
  * type comes from the B row's tag suffix (io.py:156 — "passes all tag
    types so B-DOG will end up as a mention", io.py:99-100);
  * char offsets: B row's start .. last row's stop (1-based inclusive);
  * token offsets: 0-based exclusive, counted over ALL rows of the doc.

Mention ids: the reference assigns sequential M<n> ids in reading order
(utilities.py:92-100, explicitly non-parallel). The engine's primary id
is the deterministic composite `<doc_id>:<char_start>-<char_stop>` —
stable under any parallelism and across resumes; sequential M<n>
numbering is available as a presentation projection (assign_m_ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hamerkop_spark.functions.strings import doc_type_from_id
from hamerkop_spark.schemas import CONLL


def read_conll(spark, path: str) -> DataFrame:
    """S1: read a CoNLL-ish TSV (token tag token doc_id start stop sent)
    into the CONLL schema. Sentence-break lines (< 6 cols) are dropped by
    the null filter, matching io.py:74-76."""
    raw = spark.read.csv(path, sep="\t", header=False, schema=None)
    cols = raw.columns
    df = raw.select(
        F.col(cols[2]).alias("token"),
        F.col(cols[1]).alias("tag"),
        F.col(cols[3]).alias("doc_id"),
        F.col(cols[4]).cast("int").alias("start"),
        F.col(cols[5]).cast("int").alias("stop"),
        F.col(cols[6]).alias("sent_id") if len(cols) > 6 else F.lit(None).alias("sent_id"),
    )
    # in-document order key: char offsets are strictly increasing within a
    # doc, so `start` is a deterministic row_idx (no
    # monotonically_increasing_id — nondeterministic across runs, breaks
    # resume/byte-parity; SURVEY.md §2.8 T12).
    df = df.withColumn("row_idx", F.col("start").cast("long"))
    return df.where(F.col("doc_id").isNotNull() & F.col("tag").isNotNull())


def extract_mentions(conll: DataFrame) -> DataFrame:
    """S3 DocumentPreparer.process as window + groupBy (no UDF).

    Input: CONLL-schema rows (row_idx gives in-document order).
    Output: MENTIONS-schema rows (minus translit/translate, doc_type).
    """
    w = Window.partitionBy("doc_id").orderBy("row_idx")
    tagged = (
        conll.withColumn("is_b", F.col("tag").startswith("B"))
        .withColumn("is_i", F.col("tag").startswith("I"))
        .withColumn("token_idx", F.row_number().over(w) - 1)
        .withColumn("grp", F.sum(F.col("is_b").cast("int")).over(w))
        .withColumn("broken", (~F.col("is_b") & ~F.col("is_i")).cast("int"))
    )
    wg = Window.partitionBy("doc_id", "grp").orderBy("row_idx")
    member = tagged.withColumn(
        "bad_before", F.sum("broken").over(wg)
    ).where(
        (F.col("grp") > 0) & ((F.col("is_b")) | (F.col("is_i") & (F.col("bad_before") == 0)))
    )
    mentions = member.groupBy("doc_id", "grp").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("row_idx", "token"))),
                lambda s: s["token"],
            ),
        ).alias("string"),
        F.min("start").alias("char_start"),
        F.max("stop").alias("char_stop"),
        F.min("token_idx").alias("token_start"),
        (F.max("token_idx") + 1).alias("token_stop"),
        F.min_by(F.expr("substring(tag, 3)"), "row_idx").alias("type"),
    )
    return (
        mentions.withColumn(
            "mention_id",
            F.concat_ws(
                ":",
                F.col("doc_id"),
                F.concat_ws("-", F.col("char_start"), F.col("char_stop")),
            ),
        )
        .withColumn("original_string", F.col("string"))
        .withColumn("translit_string", F.lit(None).cast("string"))
        .withColumn("translate_string", F.lit(None).cast("string"))
        .withColumn("doc_type", doc_type_from_id(F.col("doc_id")))
        .drop("grp")
    )


def extract_mentions_from_gold(conll: DataFrame, gold_spans: DataFrame) -> DataFrame:
    """S4 DocumentPreparerUsingGroundTruth (io.py:167-254): mention
    boundaries come from gold char spans instead of tags. Range-containment
    join of tokens to spans (offsets are monotonic within a doc, so
    containment == the reference's start-anchor/stop-terminator scan).

    gold_spans: (doc_id, gt_start, gt_stop, entity_type)."""
    w = Window.partitionBy("doc_id").orderBy("row_idx")
    toks = conll.withColumn("token_idx", F.row_number().over(w) - 1)
    j = toks.join(
        gold_spans,
        (toks.doc_id == gold_spans.doc_id)
        & (toks.start >= gold_spans.gt_start)
        & (toks.stop <= gold_spans.gt_stop),
    ).select(
        toks.doc_id.alias("doc_id"),
        "token",
        "row_idx",
        "token_idx",
        "start",
        "stop",
        "gt_start",
        "gt_stop",
        "entity_type",
    )
    mentions = j.groupBy("doc_id", "gt_start", "gt_stop", "entity_type").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("row_idx", "token"))),
                lambda s: s["token"],
            ),
        ).alias("string"),
        F.min("start").alias("char_start"),
        F.max("stop").alias("char_stop"),
        F.min("token_idx").alias("token_start"),
        (F.max("token_idx") + 1).alias("token_stop"),
    )
    return (
        mentions.withColumnRenamed("entity_type", "type")
        .withColumn(
            "mention_id",
            F.concat_ws(
                ":",
                F.col("doc_id"),
                F.concat_ws("-", F.col("char_start"), F.col("char_stop")),
            ),
        )
        .withColumn("original_string", F.col("string"))
        .withColumn("translit_string", F.lit(None).cast("string"))
        .withColumn("translate_string", F.lit(None).cast("string"))
        .withColumn("doc_type", doc_type_from_id(F.col("doc_id")))
        .drop("gt_start", "gt_stop")
    )


def assign_m_ids(mentions: DataFrame) -> DataFrame:
    """T12: presentation-order M<n> ids (utilities.py:92-100). Global
    window sort — use only for small final outputs, never mid-pipeline."""
    w = Window.orderBy("doc_id", "char_start", "char_stop")
    return mentions.withColumn(
        "m_id", F.concat(F.lit("M"), F.row_number().over(w).cast("string"))
    )


def documents_table(conll: DataFrame) -> DataFrame:
    """S2 side-product: per-document tokens + sentences arrays
    (Document, core.py:257-277)."""
    w = Window.partitionBy("doc_id").orderBy("row_idx")
    toks = conll.withColumn("token_idx", F.row_number().over(w) - 1)
    # sentence-major sort key = the sentence's FIRST token index, not
    # the sent_id string: ids like 'segment-10' sort lexicographically
    # before 'segment-2' (review r4), which would interleave sentence
    # blocks out of document order in any doc with 10+ sentences
    sent_w = Window.partitionBy("doc_id", "sent_id")
    toks = toks.withColumn("sent_first", F.min("token_idx").over(sent_w))
    return toks.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("token_idx", "token"))),
            lambda s: s["token"],
        ).alias("tokens"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("sent_first", "token_idx", "token"))
            ),
            lambda s: s["token"],
        ).alias("sent_tokens"),
    ).withColumn("doc_type", doc_type_from_id(F.col("doc_id")))
