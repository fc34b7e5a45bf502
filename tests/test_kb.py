"""KB loader + tri-state filter cascade (mirrors reference
tests/test_io.py:202-230 truth table and test_kb.py load semantics)."""

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.schemas import KB_COLUMNS, KB_RAW
from hamerkop_spark.sources import kb as KBL


def blank(**over):
    row = {c: "" for c in KB_COLUMNS}
    row.update(over)
    return [row[c] for c in KB_COLUMNS]


def mk_raw(spark, rows):
    return spark.createDataFrame(rows, KB_RAW)


def test_load_kb_projection_and_casts(spark):
    raw = mk_raw(spark, [
        blank(origin="GEO", entity_type="GPE", entityid="E1", name="Paris",
              latitude="48.85", longitude="garbage", population="2000000",
              country_code="FR", feature_code_name="capital",
              external_link="http://a|http://b"),
        blank(origin="WLL", entity_type="PER", entityid="E2", name="John",
              per_gpe_loc_of_association="US|FR",
              per_title_or_position="minister|envoy"),
    ])
    alts = spark.createDataFrame(
        [("E1", "Paree"), ("E1", "Paris"), ("EX", "Ghost")],
        "entityid string, alternatename string",
    )
    kb = KBL.load_kb(raw, alts)
    rows = {r["entity_id"]: r for r in kb.collect()}
    e1 = rows["E1"]
    assert e1["origin"] == "geonames"
    assert e1["geo_latitude"] == pytest.approx(48.85)
    assert e1["geo_longitude"] is None            # null-on-garbage (io.py:432-437)
    assert e1["geo_population"] == 2000000
    assert e1["geo_country"] == "FR"
    assert sorted(e1["urls"]) == ["http://a", "http://b"]
    assert sorted(e1["names"]) == ["Paree", "Paris"]  # canonical + alt, deduped
    e2 = rows["E2"]
    assert e2["origin"] == "cia world leaders"
    assert e2["per_location"] == "US"              # first '|' piece
    assert e2["per_titles"] == ["minister", "envoy"]
    assert e2["names"] == ["John"]                 # alt for absent id ignored
    assert e2["urls"] == []


def test_cascade_filter_truth_table(spark):
    # io.py:525-537: first non-None wins; all None -> exclude
    raw = mk_raw(spark, [
        blank(origin="WLL", entityid="K1", entity_type="PER", name="a"),                    # origin keeps
        blank(origin="GEO", entityid="K2", entity_type="GPE", name="b",
              external_link="http://x"),                                                    # link keeps
        blank(origin="GEO", entityid="K3", entity_type="GPE", name="c"),                    # all defer -> drop
    ])
    filters = [KBL.origin_filter("WLL", "APB"), KBL.link_filter()]
    kept = raw.where(KBL.cascade_filter(filters))
    assert sorted(r["entityid"] for r in kept.collect()) == ["K1", "K2"]


def test_country_filter(spark):
    raw = mk_raw(spark, [
        blank(origin="GEO", entityid="K1", entity_type="GPE", name="a", country_code="ET"),
        blank(origin="GEO", entityid="K2", entity_type="GPE", name="b", country_code="US"),
    ])
    kept = raw.where(KBL.cascade_filter([KBL.country_filter("et")]))
    assert [r["entityid"] for r in kept.collect()] == ["K1"]


def test_script_name_filter(spark):
    f = KBL.script_name_filter("ge'ez")
    df = spark.createDataFrame(
        [("ascii name",), ("ሰላም",), ("Привет",)], "n string"
    )
    kept = df.where(f(F.col("n"))).collect()
    assert sorted(r["n"] for r in kept) == sorted(["ascii name", "ሰላም"])


def test_language_name_filter(spark):
    geonames = spark.createDataFrame(
        [(1, "fr", "paris"), (2, "en", "paris"), (3, "ru", "moskva")],
        "row_idx long, lang string, name string",
    )
    # en priority: 'paris' labeled en (not first-row fr) -> allowed
    flt = KBL.language_name_filter(geonames, "am")
    names = spark.createDataFrame(
        [("Paris",), ("Moskva",), ("Unknown",)], "alt string"
    )
    kept = flt(names, "alt")
    assert sorted(r["alt"] for r in kept.collect()) == ["Paris", "Unknown"]


def test_write_bucketed_join_no_shuffle(spark, tmp_path):
    """Bucketing the KB names table (and the probe) on the full blocking
    key (type, exact_key) removes every shuffle Exchange from the
    blocking join — the persisted index that amortizes repeated linking
    runs. Unbucketed, the same sort-merge join needs two exchanges."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        kb = spark.range(500).select(
            F.concat(F.lit("E"), F.col("id")).alias("entity_id"),
            F.lit("GPE").alias("type"),
            F.concat(F.lit("name"), (F.col("id") % 97)).alias("name"),
        ).withColumn("exact_key", F.lower("name"))
        probe = spark.range(200).select(
            F.concat(F.lit("c"), F.col("id")).alias("chain_id"),
            F.lit("GPE").alias("type"),
            F.lower(F.concat(F.lit("name"), (F.col("id") % 97))).alias(
                "exact_key"
            ),
        )
        plain = probe.join(kb, ["type", "exact_key"])
        plan_plain = plain._jdf.queryExecution().executedPlan().toString()
        assert plan_plain.count("Exchange hashpartitioning") == 2

        bk = KBL.write_bucketed(
            kb, "kb_bucketed_t", buckets=8, path=str(tmp_path / "kb")
        )
        bp = KBL.write_bucketed(
            probe, "probe_bucketed_t", buckets=8, path=str(tmp_path / "probe")
        )
        j = bp.join(bk, ["type", "exact_key"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 0
        assert j.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS kb_bucketed_t")
        spark.sql("DROP TABLE IF EXISTS probe_bucketed_t")
