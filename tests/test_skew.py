"""Salted join / aggregation: results identical to unsalted, hot keys
actually split."""

from pyspark.sql import functions as F

from hamerkop_spark.operators import skew


def mk(spark):
    # key 'hot' has 200 rows, others 1-2
    rows = [("hot", i) for i in range(200)] + [("a", 0), ("a", 1), ("b", 0)]
    probe = spark.createDataFrame(rows, "k string, v int")
    build = spark.createDataFrame(
        [("hot", "H1"), ("hot", "H2"), ("a", "A"), ("c", "C")], "k string, w string"
    )
    return probe, build


def test_detect_hot_keys(spark):
    probe, _ = mk(spark)
    hot = [r["k"] for r in skew.detect_hot_keys(probe, ["k"], 50).collect()]
    assert hot == ["hot"]


def test_salted_join_matches_plain_join(spark):
    probe, build = mk(spark)
    plain = sorted(
        (r["k"], r["v"], r["w"]) for r in probe.join(build, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["w"])
        for r in skew.salted_join(
            probe, build, ["k"], num_salts=8, hot_threshold=50
        ).collect()
    )
    assert salted == plain
    assert len(salted) == 200 * 2 + 2  # hot x2 builds + 'a' x2 rows


def test_salted_join_deterministic(spark):
    probe, build = mk(spark)
    r1 = sorted(map(tuple, skew.salted_join(probe, build, ["k"], 8, 50).collect()))
    r2 = sorted(map(tuple, skew.salted_join(probe, build, ["k"], 8, 50).collect()))
    assert r1 == r2


def test_salted_join_actually_salts(spark):
    probe, build = mk(spark)
    hot = skew.detect_hot_keys(probe, ["k"], 50)
    salt_cols = [F.col(c) for c in probe.columns]
    salts = (
        probe.join(hot.withColumn("_hot", F.lit(True)), ["k"], "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64(*salt_cols), F.lit(8)),
            ).otherwise(F.lit(0)),
        )
        .where(F.col("k") == "hot")
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts > 4  # the 200 hot rows spread over most of the 8 salts


def test_salted_count(spark):
    probe, _ = mk(spark)
    got = {r["k"]: r["count"] for r in skew.salted_count(probe, ["k"], 8).collect()}
    assert got == {"hot": 200, "a": 2, "b": 1}


def test_salted_collect_set(spark):
    df = spark.createDataFrame(
        [("g", "x"), ("g", "y"), ("g", "x"), ("h", "z")], "k string, v string"
    )
    got = {
        r["k"]: sorted(r["values"])
        for r in skew.salted_collect_set(df, ["k"], "v", 4).collect()
    }
    assert got == {"g": ["x", "y"], "h": ["z"]}
