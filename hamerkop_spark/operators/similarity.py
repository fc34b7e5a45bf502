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

from hamerkop_spark.functions.num import det_round

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
            "query_id", "neighbor_id", det_round(F.col("cosine"), 6).alias("cosine"), "rank"
        )
    )


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
            "query_id", "neighbor_id", det_round(F.col("cosine"), 6).alias("cosine"), "rank"
        )
    )


def ivf_centroids(
    corpus: DataFrame,
    k_clusters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF-flat coarse centroids: the k corpus vectors
    whose md5(id) digests sort first. A hash-ordered draw is an unbiased
    sample of the corpus distribution, replaces a trained quantizer with
    zero iterations, is resume-safe (same ids -> same centroids), and a
    SQL oracle derives the identical set. k is small (<= ~2^12), so the
    orderBy+limit is a cheap TakeOrdered."""
    return (
        corpus.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(k_clusters)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("centroid"),
        )
    )


def _resolve_centroids(
    corpus: DataFrame,
    k_clusters: int,
    train_iterations: int,
    centroids: DataFrame | None,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    if centroids is not None:
        return centroids
    if train_iterations > 0:
        return kmeans_centroids(
            corpus, k_clusters, train_iterations, id_col, vec_col
        )
    return ivf_centroids(corpus, k_clusters, id_col, vec_col)


def _ivf_assign(df: DataFrame, cents: DataFrame, side_id: str, keep: int,
                margin: float | None = None) -> DataFrame:
    """Route each row to its `keep` nearest centroids (bounded broadcast
    crossJoin x k_clusters); with `margin`, keep only centroids within
    `margin` of the row's best similarity (adaptive multi-probe)."""
    scored = df.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", cosine_native(F.col("_v"), F.col("centroid"))
    )
    w = Window.partitionBy(side_id).orderBy(
        F.desc("_sim"), F.col("centroid_id")
    )
    out = scored.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= keep
    )
    if margin is not None:
        out = out.withColumn(
            "_best", F.max("_sim").over(Window.partitionBy(side_id))
        ).where(
            F.col("_sim") >= F.col("_best") - F.lit(float(margin))
        ).drop("_best")
    return out.drop("_sim", "_rn", "centroid")


def ivf_probe_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    k_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_iterations: int = 0,
    probe_margin: float | None = None,
    centroids: DataFrame | None = None,
) -> int:
    """MEASURED probe cost for an equivalent `ivf_topk` call: the exact
    number of candidate pairs its probes-to-lists equi-join scores
    (sum over probed (query, centroid) of that centroid's list size).
    With `probe_margin` set this is strictly below the static
    n_probe/k_clusters cap — telemetry for scripts/ivf_recall.py, so
    BASELINE.md records a measurement, not a configured ceiling."""
    cents = _resolve_centroids(
        corpus, k_clusters, train_iterations, centroids, id_col, vec_col
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    list_sizes = (
        _ivf_assign(c, cents, "neighbor_id", 1)
        .groupBy("centroid_id")
        .agg(F.count("*").alias("_n"))
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    probes = _ivf_assign(q, cents, "query_id", n_probe, margin=probe_margin)
    total = (
        probes.join(F.broadcast(list_sizes), "centroid_id")
        .agg(F.sum("_n"))
        .first()[0]
    )
    return int(total or 0)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_iterations: int = 0,
    probe_margin: float | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN top-k: assign every corpus vector to its nearest
    coarse centroid (inverted lists), route each query to its `n_probe`
    nearest centroids, brute-force cosine only within the probed lists.

    `train_iterations` > 0 replaces the hash-sampled centroids with
    `kmeans_centroids` Lloyd-trained ones (better-balanced lists,
    higher recall at the same n_probe); 0 keeps the zero-training
    oracle-derivable draw.

    `probe_margin` enables ADAPTIVE multi-probe: a query probes every
    list whose centroid similarity is within `probe_margin` of its best
    list (still capped at `n_probe`). Queries that land decisively in
    one cluster probe few lists; boundary queries probe more — recall
    concentrates probe cost where routing is genuinely ambiguous. On
    weakly-clustered corpora centroid sims flatten and the margin
    degrades to the n_probe cap (measured on the near-uniform sf0.1
    synthetic embeddings: recall tracks probe fraction ~linearly, see
    BASELINE.md; on clustered corpora the margin wins, see
    test_similarity.test_ivf_clustered_*).

    Scale shape: the centroid table is broadcast (k_clusters rows), so
    both assignment fan-outs are bounded broadcast crossJoins x
    k_clusters — NOT an unbounded cartesian — and the candidate join is
    an equi-join on centroid_id. Work per query is
    n_probe/k_clusters of the corpus on average; vectors outside probed
    lists are never scored. Recall < 1 by construction; raise n_probe
    to trade cost for recall (n_probe = k_clusters degrades to exact
    brute force).

    `centroids`: pass a precomputed (centroid_id, centroid) table to
    AMORTIZE training — the production shape: `kmeans_centroids` runs
    once per corpus snapshot (checkpoint it), every query batch reuses
    it (measured at 50k vectors: train-once turns a 61 s call into a
    ~13 s query-only call at the same 0.997 recall — BASELINE.md)."""
    cents = _resolve_centroids(
        corpus, k_clusters, train_iterations, centroids, id_col, vec_col
    )

    def assign(df: DataFrame, side_id: str, keep: int,
               margin: float | None = None) -> DataFrame:
        return _ivf_assign(df, cents, side_id, keep, margin)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    lists = assign(c, "neighbor_id", 1)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    probes = assign(
        q, "query_id", n_probe, margin=probe_margin
    ).withColumnRenamed("_v", "_qv")
    # self-pairs are KEPT, matching brute_force_topk/lsh_topk: when the
    # query table is drawn from the corpus, the identical vector ranks
    # first on every path, so recall comparisons across the three
    # variants stay like-for-like; callers exclude self if unwanted
    cands = probes.join(lists.withColumnRenamed("_v", "_cv"), "centroid_id")
    scored = cands.withColumn(
        "cosine", det_round(cosine_native(F.col("_qv"), F.col("_cv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def kmeans_centroids(
    corpus: DataFrame,
    k_clusters: int,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Trained IVF quantizer: Lloyd's k-means expressed Spark-first.

    Init = the deterministic hash-sampled draw (`ivf_centroids`), so
    the whole procedure is seed-free and resume-safe. Each iteration:

      1. centroids live as LITERAL arrays (k x dim doubles, collected
         to the driver — the same shape MLlib uses): assignment is a
         broadcast-free map over the corpus, one codegen'd expression
         per centroid, no join, no shuffle;
      2. new means via posexplode -> groupBy(cluster, pos).avg — a
         uniform (k x dim)-key shuffle with map-side partial
         aggregation, immune to cluster-size skew because the key
         carries the dimension index;
      3. empty clusters keep their previous centroid.

    Convergence in a handful of iterations is typical for IVF coarse
    quantizers; `iterations` bounds the cost deterministically (no
    data-dependent stopping; the means are rounded to 12 decimals so
    shuffle merge order — float addition is non-associative — cannot
    leak last-ulp differences into reruns)."""
    # one scan of the (possibly expensive) corpus lineage, reused by
    # every iteration — the same localCheckpoint pattern cc.py uses
    vecs = corpus.select(
        F.col(vec_col).cast("array<double>").alias("_v")
    ).localCheckpoint(eager=True)
    cents = [
        (int(i), [float(x) for x in c])
        for i, c in enumerate(
            r["centroid"]
            for r in ivf_centroids(corpus, k_clusters, id_col, vec_col)
            .orderBy("centroid_id")
            .collect()
        )
    ]

    def nearest(v: Column) -> Column:
        # argmax over literal centroids as array_max over (sim, -cid)
        # structs: a LINEAR expression tree. A when/otherwise fold that
        # references the running best twice per step is a ~2^k tree to
        # Catalyst and hangs planning beyond toy k. Negated cid makes
        # equal-sim ties resolve to the SMALLEST centroid id.
        sims = F.array(*[
            F.struct(
                cosine_native(v, F.array(*[F.lit(x) for x in cvec])).alias("s"),
                F.lit(-cid).alias("c"),
            )
            for cid, cvec in cents
        ])
        return -F.array_max(sims)["c"]

    for _ in range(iterations):
        assigned = vecs.withColumn("_c", nearest(F.col("_v")))
        means = (
            assigned.select("_c", F.posexplode("_v").alias("_p", "_x"))
            .groupBy("_c", "_p")
            .agg(F.avg("_x").alias("_m"))
            .groupBy("_c")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_p", "_m"))
                    ),
                    lambda s: s["_m"],
                ).alias("_centroid")
            )
            .collect()
        )
        updated = dict(cents)
        for r in means:
            updated[r["_c"]] = [round(float(x), 12) for x in r["_centroid"]]
        cents = sorted(updated.items())

    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in cents],
        "centroid_id int, centroid array<double>",
    )
