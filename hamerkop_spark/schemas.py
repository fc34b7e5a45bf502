"""Explicit StructType schemas for every engine table.

The reference uses fixed positional TSV schemas (hamerkop/io.py:64-69,
io.py:257-266, io.py:339-386); we make them explicit Spark DDL and never
rely on inference. All enum-ish columns stay StringType validated against
literal sets (hamerkop/core.py:6-70).
"""

from __future__ import annotations

from pyspark.sql import types as T

ENTITY_TYPES = ["PER", "ORG", "GPE", "LOC"]  # core.py:6-12

# DocType.detect substrings (core.py:50-70)
DOC_TYPE_TOKENS = [
    ("_SN_", "twitter"),
    ("_WL_", "blog"),
    ("_RF_", "reference"),
    ("_DF_", "discussion forum"),
    ("_NW_", "newswire"),
]

# BASELINE.json input_hint: Common-Crawl-style pages table.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# CoNLL token stream (io.py:43, io.py:50-93); one row per token.
CONLL = T.StructType(
    [
        T.StructField("token", T.StringType(), True),
        T.StructField("tag", T.StringType(), True),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("start", T.IntegerType(), True),  # char, 1-based inclusive
        T.StructField("stop", T.IntegerType(), True),  # char, inclusive
        T.StructField("sent_id", T.StringType(), True),
        T.StructField("row_idx", T.LongType(), True),  # file order (for chunking)
    ]
)

# Extracted mentions (core.py:149-175).
MENTIONS = T.StructType(
    [
        T.StructField("mention_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("string", T.StringType(), True),
        T.StructField("original_string", T.StringType(), True),
        T.StructField("translit_string", T.StringType(), True),
        T.StructField("translate_string", T.StringType(), True),
        T.StructField("char_start", T.IntegerType(), True),
        T.StructField("char_stop", T.IntegerType(), True),
        T.StructField("token_start", T.IntegerType(), True),
        T.StructField("token_stop", T.IntegerType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("doc_type", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# LoReHLT KB: 47 positional columns, all strings at read (io.py:339-386).
KB_COLUMNS = [
    "origin", "entity_type", "entityid", "name", "asciiname", "latitude",
    "longitude", "feature_class", "feature_class_name", "feature_code",
    "feature_code_name", "feature_code_description", "country_code",
    "country_code_name", "cc2", "admin1_code", "admin1_code_name",
    "admin2_code", "admin2_code_name", "admin3_code", "admin4_code",
    "population", "elevation", "dem", "timezone", "modification_date",
    "per_gpe_loc_of_association", "per_title_or_position",
    "per_org_of_association", "per_role_in_incident", "per_year_of_birth",
    "per_year_of_death", "per_gender", "per_family_member", "note", "aim",
    "org_date_established", "date_established_note", "org_website",
    "org_gpe_loc_of_association", "org_members_employees_per",
    "org_parent_org", "executive_board_members", "jurisdiction",
    "trusteeship_council", "national_societies", "external_link",
]
KB_RAW = T.StructType([T.StructField(c, T.StringType(), True) for c in KB_COLUMNS])

KB_ALT_NAMES = T.StructType(
    [
        T.StructField("entityid", T.StringType(), False),
        T.StructField("alternatename", T.StringType(), True),
    ]
)

# Engine-facing entity table (Entity, core.py:122-146) after load+filters.
KB_ENTITIES = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("type", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("names", T.ArrayType(T.StringType()), True),
        T.StructField("origin", T.StringType(), True),
        T.StructField("urls", T.ArrayType(T.StringType()), True),
        T.StructField("geo_type", T.StringType(), True),
        T.StructField("geo_country", T.StringType(), True),
        T.StructField("geo_latitude", T.DoubleType(), True),
        T.StructField("geo_longitude", T.DoubleType(), True),
        T.StructField("geo_population", T.IntegerType(), True),
        T.StructField("per_location", T.StringType(), True),
        T.StructField("per_titles", T.ArrayType(T.StringType()), True),
        T.StructField("per_orgs", T.ArrayType(T.StringType()), True),
        T.StructField("org_location", T.StringType(), True),
    ]
)

# LoReHLT submission / ground-truth TSV (io.py:257-266, 300-332).
GROUND_TRUTH = T.StructType(
    [
        T.StructField("system_run_id", T.StringType(), True),
        T.StructField("mention_id", T.StringType(), True),
        T.StructField("mention_text", T.StringType(), True),
        T.StructField("extents", T.StringType(), True),  # doc:start-stop
        T.StructField("kb_id", T.StringType(), True),  # '1|2' multi, 'NILxxx'
        T.StructField("entity_type", T.StringType(), True),
        T.StructField("mention_type", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
    ]
)

LABELED_PAIRS = T.StructType(
    [
        T.StructField("doc_id_a", T.StringType(), False),
        T.StructField("mention_a", T.StringType(), False),
        T.StructField("doc_id_b", T.StringType(), False),
        T.StructField("mention_b", T.StringType(), False),
        T.StructField("block_key", T.StringType(), True),
        T.StructField("label", T.IntegerType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)
