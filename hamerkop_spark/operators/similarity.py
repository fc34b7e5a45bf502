"""Approximate-nearest-neighbor search over an embedding column
(brief: first-class training-data-pipeline operator).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
side against the corpus, native zip_with dot products, window top-k.
Scale path: random-hyperplane LSH bucketing (deterministic hash-derived
hyperplane signs, no stored model) or IVF-style coarse quantization via
the same bucketing, then brute force within buckets. Everything native;
no Python in the scoring loop.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hamerkop_spark.functions.textdist import cosine_native


def hyperplanes(dim: int, num_planes: int, seed: int = 0) -> list[list[float]]:
    """Deterministic ±1 random-hyperplane matrix derived from md5 of
    (seed, plane, dim-index) — computed ONCE driver-side and shipped as
    literals, so (a) executors evaluate no per-row hashing for the plane
    components and (b) a SQL oracle can inline the identical matrix.
    Resume-safe: same seed -> same planes on every run."""
    return [
        [
            1.0
            if hashlib.md5(f"{seed}:{p}:{j}".encode()).digest()[0] & 1
            else -1.0
            for j in range(dim)
        ]
        for p in range(num_planes)
    ]


def lsh_bucket_lit(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id from a literal hyperplane matrix: concatenated sign bits
    of <vec, h_p>. All-native; the ±1 literals fold into codegen."""
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(h) for h in plane]),
                    lambda x, h: x * h,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0
        )
        .cast("int")
        .cast("string")
        for plane in planes
    ]
    return F.concat(*bits)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x corpus, native cosine,
    row_number window. Deterministic tie-break by neighbor id.

    Output: (query_id, neighbor_id, cosine, rank)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = F.broadcast(q).crossJoin(c).withColumn(
        "cosine",
        cosine_native(
            F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
        )
    )


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Sign bit of <vec, h_plane> where h_plane[j] = ±1 derived from
    xxhash64(plane, j) — deterministic, no stored model, identical on
    every executor and every run (resume-safe)."""
    dot = F.aggregate(
        F.zip_with(
            vec,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: (F.pmod(F.xxhash64(F.lit(plane), j), F.lit(2)) * 2 - 1).cast(
                    "double"
                ),
            ),
            lambda x, h: x * h,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (dot >= 0).cast("int")


def lsh_bucket(vec: Column, dim: int, num_planes: int = 12) -> Column:
    """Random-hyperplane LSH bucket id: the concatenated sign bits."""
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j: (
                        F.pmod(F.xxhash64(p, j), F.lit(2)) * 2 - 1
                    ).cast("double"),
                ),
                lambda x, h: x * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        >= 0,
    )
    return F.array_join(F.transform(bits, lambda b: b.cast("int").cast("string")), "")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """ANN top-k: bucket both sides by hyperplane signature, brute-force
    within buckets. Recall < 1 by construction (use multiple tables /
    fewer planes to trade recall for cost); candidates outside the
    query's bucket are never scored — that's the point at 100 TB.

    `planes`: pass a literal matrix (see `hyperplanes`) for zero per-row
    plane hashing and SQL-oracle reproducibility; default derives plane
    components from xxhash64 inside the expression."""
    def bucket(col: Column) -> Column:
        v = col.cast("array<double>")
        if planes is not None:
            return lsh_bucket_lit(v, planes)
        return lsh_bucket(v, dim, num_planes)

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("bucket", bucket(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("bucket", bucket(F.col("cv")))
    scored = q.join(c, "bucket").withColumn(
        "cosine",
        cosine_native(
            F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
        )
    )
