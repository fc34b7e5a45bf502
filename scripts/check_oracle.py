"""Local emulation of the driver's CORRECTNESS check.

Runs each ``queries()`` entry Spark-side and its ``oracle_sql()``
DuckDB-side at the given SF dir, then compares row count, schema
(column names), and a value hash computed after sorting columns by
name and rows by value — the same comparison shape the driver uses.

Usage:
    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Dtype-strict canonical form: raw str() of every value, so an
    int64 123 and a float64 123.0 hash DIFFERENTLY — DuckDB's
    sum(int)→HUGEINT→float64 round-trip is exactly the mismatch the
    driver's value hash catches (round-1 lesson)."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {c: df[c].map(lambda v: "NULL" if v is None or v != v else str(v))
           for c in df.columns}
    norm = pd.DataFrame(out)
    return norm.sort_values(by=list(norm.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from hamerkop_spark.session import get_spark

    spark = get_spark(app_name="check-oracle", cores=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} SPARK ERROR: {e}")
            failures.append(name)
            continue
        if sql is None:
            print(f"{name:28s} rows-only: spark_rows={len(sdf)}")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ORACLE ERROR: {e}")
            failures.append(name)
            continue
        rows_ok = len(sdf) == len(odf)
        schema_ok = sorted(sdf.columns) == sorted(odf.columns)
        hash_ok = False
        if rows_ok and schema_ok:
            a, b = _canon(sdf), _canon(odf)
            hash_ok = a.equals(b)
            if not hash_ok:
                neq = a.compare(b) if a.shape == b.shape else None
                print(f"{name:28s} HASH MISMATCH rows={len(sdf)}")
                if neq is not None and len(neq):
                    print(neq.head(8).to_string())
                failures.append(name)
                continue
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{name:28s} {status} rows={len(sdf)}/{len(odf)} "
            f"schema={'ok' if schema_ok else sorted(sdf.columns)!r}"
        )
    print(f"\n{'ALL GREEN' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
