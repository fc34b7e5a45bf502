"""det_round must produce the bit-same double in Spark and DuckDB —
the invariant every oracle-compared rounded value rests on."""

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from hamerkop_spark.functions.num import det_round, det_round_sql


def test_det_round_cross_engine(spark):
    rng = random.Random(7)
    vals = (
        [rng.uniform(-2.0, 2.0) for _ in range(4000)]
        + [57 / 800, 0.07125, -0.07125, 0.5, -0.5, 0.00005, 1e-9, 0.0]
    )
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [
        r[0] for r in sdf.select(det_round(F.col("x"), 4).alias("r")).collect()
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {det_round_sql('x', 4)} FROM t"
        ).fetchall()
    ]
    # exact float equality — identical IEEE ops must give identical bits
    assert got_spark == got_duck


def test_det_round_known_divergence_case():
    """The motivating case: Spark round(57/800, 4) says 0.0713 (shortest
    decimal repr "0.07125" rounds up), DuckDB round says 0.0712 (scaled
    binary 712.4999... rounds down). det_round picks one answer — the
    binary one — on both engines."""
    con = duckdb.connect()
    (det_val, native_duck) = con.execute(
        f"SELECT {det_round_sql('57.0/800.0', 4)}, round(57.0/800.0, 4)"
    ).fetchone()
    assert det_val == 0.0712
    assert native_duck == 0.0712  # duckdb native agrees with det here
