"""hamerkop_spark — a PySpark-native record-linkage / entity-resolution engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference entity-linking framework (iscoe/hamerkop, see /root/reference) on
idiomatic Spark DataFrames:

    ingest -> mentions -> chains (in-doc coref) -> blocking -> pairs ->
    features -> decisions -> transitive clusters -> output

Every stage is a pure DataFrame -> DataFrame function; planning is delegated
to Catalyst; the scale-critical shapes are explode + hash-partitioned
self-joins (blocking), window top-k (candidate retrieval) and iterative
large-star/small-star connected components (clustering).
"""

__version__ = "0.1.0"

from hamerkop_spark.session import get_spark  # noqa: F401
