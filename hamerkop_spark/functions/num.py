"""Cross-engine deterministic numeric helpers.

`det_round` exists because Spark's round() and DuckDB's round() disagree
on doubles in the last ulp: Spark routes through BigDecimal.valueOf,
which rounds the SHORTEST DECIMAL REPRESENTATION of the double
(Double.toString(57/800.) == "0.07125" -> 0.0713 at scale 4), while
DuckDB rounds the scaled binary value (57/800. * 1e4 ==
712.49999999999997 -> 0.0712). Both are defensible; they differ whenever
the shortest repr sits on the .5 boundary the binary value misses —
rare per value, inevitable across a correctness suite that hashes tens
of thousands of rounded ratios (caught by the sf0.001 oracle sweep).

floor(x * 10^k + 0.5) / 10^k uses only IEEE-identical operations
(multiply, add, floor, divide) so both engines produce the bit-same
double. Half-up toward +infinity applies to negatives too — again,
identically on both sides, which is what the value-hash needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def det_round(c: Column, k: int) -> Column:
    m = F.lit(float(10**k))
    return F.floor(c * m + F.lit(0.5)) / m


def det_round_sql(expr: str, k: int) -> str:
    """The DuckDB twin — same constant, same op order."""
    m = float(10**k)
    return f"floor(({expr}) * {m!r} + 0.5) / {m!r}"
