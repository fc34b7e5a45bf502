"""Mention preprocessors (SURVEY.md §2.2, P1-P11).

Each reference preprocessor (hamerkop/preprocessor.py) mutates mention
objects in place inside a per-document loop; here each is a pure narrow
transformation on the `mentions` DataFrame — filters and withColumn only,
no shuffle, fully inside whole-stage codegen. Composition
(CascadePreprocessor, preprocessor.py:163-173) is function composition.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hamerkop_spark.functions import strings as S
from hamerkop_spark.schemas import ENTITY_TYPES

MentionOp = Callable[[DataFrame], DataFrame]


def cascade(*ops: MentionOp) -> MentionOp:
    """CascadePreprocessor (preprocessor.py:163-173): run ops in order."""

    def run(df: DataFrame) -> DataFrame:
        for op in ops:
            df = op(df)
        return df

    return run


def pass_thru(df: DataFrame) -> DataFrame:
    """PassThru (preprocessor.py:157-160)."""
    return df


def type_validator(df: DataFrame) -> DataFrame:
    """P1 TypeValidator (preprocessor.py:176-183): drop unknown types."""
    return df.where(F.col("type").isin(ENTITY_TYPES))


def text_normalizer(df: DataFrame) -> DataFrame:
    """P2 TextNormalizer (preprocessor.py:186-199): smart punct -> ASCII,
    strip emoji."""
    return df.withColumn(
        "string", S.remove_emojis(S.normalize_smart_punct(F.col("string")))
    )


def garbage_remover(df: DataFrame) -> DataFrame:
    """P3 GarbageRemover (preprocessor.py:202-213): drop urls + empties."""
    s = F.col("string")
    return df.where(
        ~s.contains("www.")
        & ~s.contains("http:")
        & ~s.contains("https:")
        & (s.isNotNull())
        & (s != "")
    )


def fix_type(type_map: Mapping[str, str]) -> MentionOp:
    """P4 FixType (preprocessor.py:216-227): lowercase-name -> type
    override via broadcast join."""

    def run(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        fixes = spark.createDataFrame(
            [(k.lower(), v) for k, v in type_map.items()],
            "fix_key string, fixed_type string",
        )
        return (
            df.withColumn("fix_key", F.lower(F.col("string")))
            .join(F.broadcast(fixes), "fix_key", "left")
            .withColumn("type", F.coalesce("fixed_type", "type"))
            .drop("fix_key", "fixed_type")
        )

    return run


def too_long_mention_remover(max_tokens: int = 6) -> MentionOp:
    """P5 TooLongMentionRemover (preprocessor.py:230-241). The reference
    counts spaces: keep iff string.count(' ') < max_tokens."""

    def run(df: DataFrame) -> DataFrame:
        spaces = F.length("string") - F.length(F.replace(F.col("string"), F.lit(" "), F.lit("")))
        return df.where(spaces < max_tokens)

    return run


def blacklist(names: Sequence[str]) -> MentionOp:
    """P6 Blacklist (preprocessor.py:244-254): CI anti-join."""

    def run(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        bl = spark.createDataFrame(
            [(n.lower(),) for n in names], "bl_key string"
        ).distinct()
        return (
            df.withColumn("bl_key", F.lower(F.col("string")))
            .join(F.broadcast(bl), "bl_key", "left_anti")
            .drop("bl_key")
        )

    return run


def acronym_replacer(acronym_map: Mapping[str, str], ci: bool = False) -> MentionOp:
    """P7 AcronymReplacer (preprocessor.py:257-275)."""

    def run(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        if ci:
            rows = [(k.lower(), v) for k, v in acronym_map.items()]
            key = F.lower(F.col("string"))
        else:
            rows = list(acronym_map.items())
            key = F.col("string")
        amap = spark.createDataFrame(rows, "acr_key string, acr_value string")
        return (
            df.withColumn("acr_key", key)
            .join(F.broadcast(amap), "acr_key", "left")
            .withColumn("string", F.coalesce("acr_value", "string"))
            .drop("acr_key", "acr_value")
        )

    return run


def name_projector(
    project: Callable[[F.Column, F.Column], F.Column],
    var_name: str = "translit_string",
) -> MentionOp:
    """P8 NameProjector (preprocessor.py:278-299): store projection in a
    side column when non-null and different from the string."""

    def run(df: DataFrame) -> DataFrame:
        proj = project(F.col("string"), F.col("lang"))
        return df.withColumn(
            var_name,
            F.when(proj.isNotNull() & (proj != F.col("string")), proj).otherwise(
                F.col(var_name) if var_name in df.columns else F.lit(None)
            ),
        )

    return run


def dict_translator(trans_map: Mapping[str, str], var_name: str = "translate_string") -> MentionOp:
    """P8/T7 DictTranslator as a projector (string.py:92-102): CI full-string
    dictionary translation via broadcast join."""

    def run(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        tmap = spark.createDataFrame(
            [(k.lower(), v) for k, v in trans_map.items()],
            "tr_key string, tr_value string",
        )
        return (
            df.withColumn("tr_key", F.lower(F.col("string")))
            .join(F.broadcast(tmap), "tr_key", "left")
            .withColumn(
                var_name,
                F.when(
                    F.col("tr_value").isNotNull()
                    & (F.col("tr_value") != F.col("string")),
                    F.col("tr_value"),
                ).otherwise(F.col(var_name) if var_name in df.columns else F.lit(None)),
            )
            .drop("tr_key", "tr_value")
        )

    return run


def name_stemmer(stem_map: Mapping[str, str]) -> MentionOp:
    """P9 NameStemmer + DictStemmer (preprocessor.py:302-318,
    string.py:171-181): per-token CI stem lookup, else identity. Native:
    transform over split + map literal lookup (stem dictionaries are
    small broadcast resources in the reference)."""

    def run(df: DataFrame) -> DataFrame:
        entries = [F.lit(x) for kv in stem_map.items() for x in (kv[0].lower(), kv[1])]
        m = F.create_map(*entries) if entries else F.create_map()
        toks = F.filter(F.split(F.col("string"), r"\s+"), lambda t: t != "")
        stemmed = F.transform(toks, lambda t: F.coalesce(m[F.lower(t)], t))
        return df.withColumn("string", F.array_join(stemmed, " "))

    return run


def twitter_username_replacer(username_map: Mapping[str, str]) -> MentionOp:
    """P10 TwitterUsernameReplacer (preprocessor.py:321-345): only for
    twitter docs; strip '@', strip emoji, chop one trailing non-word punct,
    then map username -> screen name (case-sensitive)."""

    def run(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        umap = spark.createDataFrame(
            list(username_map.items()), "tw_key string, tw_value string"
        )
        is_tweet = F.col("doc_type") == "twitter"
        at_name = F.col("string").startswith("@") & (F.length("string") > 0)
        s = S.remove_emojis(F.expr("substring(string, 2)"))
        s = F.regexp_replace(s, r"[^\p{L}\p{N}_]$", "")
        return (
            df.withColumn("tw_key", F.when(is_tweet & at_name, s))
            .join(F.broadcast(umap), "tw_key", "left")
            .withColumn("string", F.coalesce("tw_value", "string"))
            .drop("tw_key", "tw_value")
        )

    return run


def twitter_hashtag_processor(df: DataFrame) -> DataFrame:
    """P11 TwitterHashtagProcessor — NOT gated on doc_type, matching the
    reference exactly (preprocessor.py:347-368 processes every
    '#'-prefixed mention in every document type; only the username
    replacer checks for tweets) (preprocessor.py:348-368):
    '#CamelCase' -> 'Camel Case' via the reference's [A-Z]*[a-z]* findall.
    Parity: digits are dropped (the reference's own TODO); empty result
    keeps the de-hashed string."""
    starts_hash = F.col("string").startswith("#")
    dehashed = F.expr("substring(string, 2)")
    pieces = F.regexp_extract_all(dehashed, F.lit(r"[A-Z]*[a-z]*"), 0)
    pieces = F.filter(pieces, lambda p: p != "")
    joined = F.array_join(pieces, " ")
    return df.withColumn(
        "string",
        F.when(
            starts_hash,
            F.when(joined != "", joined).otherwise(dehashed),
        ).otherwise(F.col("string")),
    )
