"""Survivorship / golden record (operators/canonical.py)."""

import pytest

from tests.conftest import rows
from hamerkop_spark.operators.canonical import golden_record, representative_name


@pytest.fixture(scope="module")
def recs(spark):
    return spark.createDataFrame(
        [
            # cluster c1: city mode = springfield (2 vs 1); zip ties
            # 11111 vs 22222 (1 each) -> value-asc tiebreak 11111
            ("c1", "springfield", "11111", 3),
            ("c1", "springfield", "22222", 1),
            ("c1", "shelbyville", None, 2),
            # cluster c2: all city null; zip from the latest row
            ("c2", None, "90210", 5),
            ("c2", None, "90211", 7),
        ],
        "cluster string, city string, zip string, ts int",
    )


def test_golden_record_mode(spark, recs):
    got = rows(
        golden_record(recs, ["city", "zip"]),
        "cluster", "cluster_size", "city", "zip",
    )
    assert got == [
        ("c1", 3, "springfield", "11111"),
        ("c2", 2, None, "90210"),
    ]


def test_golden_record_latest(spark, recs):
    got = rows(
        golden_record(recs, ["city", "zip"], strategy="latest", order_col="ts"),
        "cluster", "city", "zip",
    )
    # c1 latest row (ts=3) has city=springfield zip=11111; zip survives
    # from the latest NON-NULL row (ts=3 -> 11111)
    assert got == [("c1", "springfield", "11111"), ("c2", None, "90211")]


def test_golden_record_guards(spark, recs):
    with pytest.raises(ValueError):
        golden_record(recs, ["city"], strategy="best")
    with pytest.raises(ValueError):
        golden_record(recs, ["city"], strategy="latest")


def test_golden_record_all_null_cluster_survives_null(spark):
    df = spark.createDataFrame(
        [("c1", None), ("c1", None)], "cluster string, city string"
    )
    got = rows(golden_record(df, ["city"]), "cluster", "cluster_size", "city")
    assert got == [("c1", 2, None)]


def test_representative_name(spark):
    mentions = spark.createDataFrame(
        [
            ("c1", "ACME"), ("c1", "ACME"), ("c1", "ACME Corporation"),
            ("c2", "Jon Smith"), ("c2", "Jonathan Smith"),  # 1-1: longest
            ("c3", None),
        ],
        "cluster string, name string",
    )
    got = rows(representative_name(mentions), "cluster", "rep_name")
    assert got == [("c1", "ACME"), ("c2", "Jonathan Smith")]
