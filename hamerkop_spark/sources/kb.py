"""KB load + entity/name filters (SURVEY.md §2.1 S7-S9, §2.2 P12-P17).

The reference streams two TSVs into a python dict (hamerkop/io.py:447-504)
— "~10 million entities … present a scaling challenge" (io.py:511-513),
"~23 million names" (io.py:577). Here both are DataFrames: filters are
predicates pushed to the scan, alt-name attachment is a join +
collect_set, and the loaded KB is a columnar table other stages join
against (broadcast when small).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hamerkop_spark.functions.strings import (
    entity_origin,
    replace_punct,
    replace_unicode_punct,
)
from hamerkop_spark.schemas import KB_COLUMNS, KB_RAW

# ---------------------------------------------------------------------------
# Entity filters (io.py:507-569): tri-state cascade — each filter returns
# True (keep), False (drop) or None (defer); all-None => drop
# (CascadeEntityFilter, io.py:525-537). Encoded as nullable boolean
# columns folded with coalesce(..., False) — exact truth-table parity
# (tests mirror tests/test_io.py:202-230).

EntityFilter = Callable[[], Column]


def origin_filter(*origins: str) -> EntityFilter:
    """P12 EntityOriginFilter (io.py:540-550): keep when origin prefix in
    set, else defer."""
    return lambda: F.when(
        F.substring(F.col("origin"), 1, 3).isin(list(origins)), F.lit(True)
    )


def link_filter() -> EntityFilter:
    """P13 EntityLinkFilter (io.py:553-557): keep when external_link
    non-empty, else defer."""
    return lambda: F.when(
        F.col("external_link").isNotNull() & (F.col("external_link") != ""),
        F.lit(True),
    )


def country_filter(*cc: str) -> EntityFilter:
    """P14 EntityCountryFilter (io.py:560-569): keep when country code in
    set (set upper-cased at build, row value compared as-is, io.py:566-569),
    else defer."""
    codes = [c.upper() for c in cc]
    return lambda: F.when(F.col("country_code").isin(codes), F.lit(True))


def cascade_filter(filters: Sequence[EntityFilter]) -> Column:
    """P15 CascadeEntityFilter (io.py:525-537): first non-null wins;
    all-null => False."""
    if not filters:
        return F.lit(True)
    return F.coalesce(*[f() for f in filters], F.lit(False))


# Name filters (io.py:573-672) — same tri-state shape over a name column.


def script_name_filter(*scripts: str) -> Callable[[Column], Column]:
    """P16 ScriptBasedNameFilter (io.py:604-637): strip unicode+ascii punct
    (to spaces); keep pure-ASCII names always; keep names fully in an
    allowed script range.

    Reference parity note: the regexes exclude the space character, so
    MULTI-WORD native-script names fail the full-match and are dropped —
    the reference behaves identically (io.py:622-627 re.match of
    ^[class]+$ over the space-joined string), so this is preserved, not
    fixed."""
    ranges = {
        "ge'ez": r"^[ሀ-፿]+$",
        "arabic": r"^[؀-ۿ]+$",
        "sinhala": r"^[඀-෿]+$",
        "odia": r"^[଀-୿]+$",
    }
    wanted = [ranges[s.lower()] for s in scripts]

    def run(name: Column) -> Column:
        s = replace_punct(replace_unicode_punct(name))
        cond = s.rlike(r"^[\x00-\x7F]*$")  # is_english: all ord<=127
        for rx in wanted:
            cond = cond | s.rlike(rx)
        return cond

    return run


def language_name_filter(
    geonames: DataFrame, lang: str
) -> Callable[[DataFrame, str], DataFrame]:
    """P17 LanguageBasedNameFilter (io.py:640-672): geonames alternateNames
    assigns each lowercased name a language with first-wins semantics
    except en/target never overwritten (io.py:662-665); names known to be
    in another language are dropped; en + target + unlabeled pass.

    geonames: (row_idx long, lang string, name string) — row_idx preserves
    file order for the first-wins rule.
    """
    allowed = {"en", lang.lower(), ""}

    def build_lookup() -> DataFrame:
        # first-wins with en/target priority: rank rows per name by
        # (is_allowed desc, row_idx asc) and keep the winner — a name seen
        # first with an allowed lang keeps it; otherwise first row wins.
        ranked = geonames.select(
            F.lower("name").alias("gname"),
            F.lower("lang").alias("glang"),
            "row_idx",
        ).withColumn(
            "pri",
            F.when(F.col("glang").isin(list(allowed)), 0).otherwise(1),
        )
        return (
            ranked.groupBy("gname")
            .agg(F.min_by("glang", F.struct("pri", "row_idx")).alias("glang"))
        )

    lookup = build_lookup()

    def run(names: DataFrame, name_col: str) -> DataFrame:
        j = names.join(
            lookup, F.lower(F.col(name_col)) == F.col("gname"), "left"
        )
        keep = F.col("glang").isNull() | F.col("glang").isin(list(allowed))
        return j.where(keep).drop("gname", "glang")

    return run


# ---------------------------------------------------------------------------
# Loader (S7/S8)


def read_kb_entities_raw(spark, path: str) -> DataFrame:
    """Read the 47-column entities TSV (header row skipped by name)."""
    df = spark.read.csv(path, sep="\t", header=True, schema=KB_RAW)
    return df


def load_kb(
    entities_raw: DataFrame,
    alt_names: DataFrame,
    entity_filters: Sequence[EntityFilter] | None = None,
    name_filter: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """S7 EntityLoader.load + S8 EntityCreator.create (io.py:390-444,
    465-504): filter entities (tri-state cascade), project the 5 entity
    keys + per-type context, split urls on '|', null-on-garbage numeric
    casts (try_cast parity with _float/_int io.py:432-444), then attach
    filtered alt names with a left join + collect_set.

    Output: KB_ENTITIES schema.
    """
    e = entities_raw
    if entity_filters is not None:
        e = e.where(cascade_filter(entity_filters))
    projected = e.select(
        F.col("entityid").alias("entity_id"),
        F.col("entity_type").alias("type"),
        F.col("name"),
        entity_origin(F.col("origin")).alias("origin"),
        F.when(
            F.col("external_link").isNull() | (F.col("external_link") == ""),
            F.array().cast("array<string>"),
        )
        .otherwise(F.split("external_link", r"\|"))
        .alias("urls"),
        # GeoContext (io.py:421-430)
        F.col("feature_code_name").alias("geo_type"),
        F.when(F.col("country_code") == "", None)
        .otherwise(F.col("country_code"))
        .alias("geo_country"),
        F.col("latitude").try_cast("double").alias("geo_latitude"),
        F.col("longitude").try_cast("double").alias("geo_longitude"),
        F.col("population").try_cast("int").alias("geo_population"),
        # PerContext (io.py:405-412): first '|' piece of locations
        F.element_at(F.split("per_gpe_loc_of_association", r"\|"), 1).alias(
            "_per_location"
        ),
        F.split("per_title_or_position", r"\|").alias("per_titles"),
        F.split("per_org_of_association", r"\|").alias("per_orgs"),
        # OrgContext (io.py:414-419)
        F.element_at(F.split("org_gpe_loc_of_association", r"\|"), 1).alias(
            "_org_location"
        ),
    ).withColumn(
        "per_location",
        F.when(F.col("type") == "PER", F.col("_per_location")),
    ).withColumn(
        "org_location",
        F.when(F.col("type") == "ORG", F.col("_org_location")),
    ).drop("_per_location", "_org_location")

    alts = alt_names.select(
        F.col("entityid").alias("entity_id"), F.col("alternatename").alias("alt")
    ).where(F.col("alt").isNotNull() & (F.col("alt") != ""))
    if name_filter is not None:
        alts = alts.where(name_filter(F.col("alt")))
    alt_sets = alts.groupBy("entity_id").agg(F.collect_set("alt").alias("alt_names"))

    return (
        projected.join(alt_sets, "entity_id", "left")
        .withColumn(
            "names",
            F.array_distinct(
                F.concat(
                    F.array("name"),
                    F.coalesce(F.col("alt_names"), F.array().cast("array<string>")),
                )
            ),
        )
        .drop("alt_names")
        .select(
            "entity_id", "type", "name", "names", "origin", "urls",
            "geo_type", "geo_country", "geo_latitude", "geo_longitude",
            "geo_population", "per_location", "per_titles", "per_orgs",
            "org_location",
        )
    )


def write_bucketed(
    df,
    table: str,
    bucket_cols: Sequence[str] = ("type", "exact_key"),
    buckets: int = 64,
    path: str | None = None,
    sort: bool = True,
):
    """Persist a DataFrame bucketed (and sorted) by `bucket_cols` as a
    parquet data-source table — no Hive metastore needed.

    The cluster payoff: a KB names table is built once and probed by
    every linking run. Bucketing by the blocking keys makes the scan
    come out hash-partitioned on them, so an equi-join on exactly those
    keys against another table bucketed to the SAME bucket count plans
    with NO shuffle Exchange on either side (verified in
    tests/test_kb.py). Spark requires ALL join keys covered by the
    bucket spec (`spark.sql.requireAllClusterKeysForCoPartition`), so
    bucket on the full blocking key — (type, exact_key) for the exact
    index. The reference's in-memory `ExactMatchMemoryNameIndex`
    (kb.py:158) rebuilds its dict per process — this is the persisted,
    cluster-wide equivalent of that one-time index cost."""
    cols = list(bucket_cols)
    writer = df.write.mode("overwrite").bucketBy(buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)
    return df.sparkSession.table(table)


__all__ = [
    "KB_COLUMNS",
    "origin_filter",
    "link_filter",
    "country_filter",
    "cascade_filter",
    "script_name_filter",
    "language_name_filter",
    "read_kb_entities_raw",
    "load_kb",
    "write_bucketed",
]
