"""Token TF-IDF cosine and SoftTFIDF name similarity.

Cohen, Ravikumar & Fienberg (IIWeb 2003, "A Comparison of String
Distance Metrics for Name-Matching Tasks") found TF-IDF cosine and its
JW-kernel relaxation SoftTFIDF to be the strongest name-match measures
in the classic record-linkage evaluation. The reference scores names
with exact/Levenshtein features only (hamerkop/features.py:88-131);
this adds the corpus-weighted family on top of the same pair tables.

Design for scale:

* IDF is computed once over the record corpus (one explode + groupBy)
  and folded to fixed-point millionths with the same per-term
  ``floor(ln(1 + N/df) * 1e6)`` convention as the B3 n-gram index
  (operators/blocking.py:153) — per-pair arithmetic is then pure
  BIGINT products, so results hash-match any ANSI engine.
* Per-record weight vectors are built once on the DISTINCT record side
  and joined to pairs — the expensive explode never runs per pair.
* The pair dot product is an equi-join on (record, token): cost is
  bounded by shared tokens per pair, never a dense vector walk.
* SoftTFIDF's close-token kernel reuses the numpy-vectorized
  Jaro-Winkler pandas UDF (functions/textdist.py:252) — one Arrow
  crossing over the within-pair token cross product, which is bounded
  by name length, not corpus size.

BIGINT headroom: w_fp = tf * idf_fp where idf_fp <= ln(1+N)*1e6
(~2.4e7 at N = 10^12 web scale); norms sum w_fp^2 (~6e14/token), so a
record needs ~15k distinct tokens to threaten 2^63 — names and titles
are orders of magnitude below that. Document-length inputs should
pre-truncate tokens (as the fixture queries do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP_SCALE = 1_000_000


def token_idf(
    records: DataFrame, tokens_col: str = "tokens", min_df: int = 1
) -> DataFrame:
    """(token, df_cnt, idf_fp) over a record corpus. df = number of
    records containing the token (set semantics); idf_fp =
    floor(ln(1 + N/df) * 1e6) — the B3 fixed-point convention, smooth
    and positive for every observed token."""
    n = records.count()
    toks = records.select(
        F.explode(F.array_distinct(F.col(tokens_col))).alias("token")
    )
    df_tbl = toks.groupBy("token").agg(F.count("*").alias("df_cnt"))
    if min_df > 1:
        df_tbl = df_tbl.where(F.col("df_cnt") >= min_df)
    return df_tbl.withColumn(
        "idf_fp",
        F.floor(
            F.log1p(F.lit(float(n)) / F.col("df_cnt")) * F.lit(1e6)
        ).cast("bigint"),
    )


def tfidf_weights(
    records: DataFrame,
    idf: DataFrame,
    id_col: str = "record_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Sparse TF-IDF vectors: (id, token, w_fp = tf * idf_fp). Raw term
    counts (the Cohen et al. V(w,s) numerator before normalization);
    tokens absent from `idf` (min_df-pruned) drop out of the vector."""
    tf = (
        records.select(F.col(id_col), F.explode(tokens_col).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )
    return tf.join(idf.select("token", "idf_fp"), "token").select(
        id_col, "token", (F.col("tf") * F.col("idf_fp")).alias("w_fp")
    )


def tfidf_norms(weights: DataFrame, id_col: str = "record_id") -> DataFrame:
    """(id, norm2 = sum w_fp^2) — exact BIGINT squared L2 norms."""
    return weights.groupBy(id_col).agg(
        F.sum(F.col("w_fp") * F.col("w_fp")).cast("bigint").alias("norm2")
    )


def tfidf_cosine_pairs(
    pairs: DataFrame,
    weights: DataFrame,
    norms: DataFrame,
    a_id: str = "a_id",
    b_id: str = "b_id",
    id_col: str = "record_id",
    out_col: str = "tfidf_cosine_fp",
) -> DataFrame:
    """Append fixed-point TF-IDF cosine to a candidate-pair table.

    dot = sum over shared tokens of w_a * w_b (exact BIGINT);
    cosine = dot / sqrt(norm2_a) / sqrt(norm2_b), folded to millionths.
    IEEE sqrt and division are correctly rounded, and the operand order
    is fixed, so Spark and any ANSI oracle agree bit-for-bit.

    Pairs sharing no token get 0 (left join + coalesce). One shuffle
    for the (pair x a-token) join, one for the per-pair sum; hot tokens
    should already be min_df/max-df bounded upstream in `token_idf`.
    """
    wa = weights.select(
        F.col(id_col).alias(a_id), "token", F.col("w_fp").alias("_wa")
    )
    wb = weights.select(
        F.col(id_col).alias(b_id), "token", F.col("w_fp").alias("_wb")
    )
    dots = (
        pairs.select(a_id, b_id)
        .join(wa, a_id)
        .join(wb, [b_id, "token"])
        .groupBy(a_id, b_id)
        .agg(F.sum(F.col("_wa") * F.col("_wb")).cast("bigint").alias("_dot"))
    )
    na = norms.select(F.col(id_col).alias(a_id), F.col("norm2").alias("_na"))
    nb = norms.select(F.col(id_col).alias(b_id), F.col("norm2").alias("_nb"))
    cos = (
        F.col("_dot").cast("double")
        / F.sqrt(F.col("_na").cast("double"))
        / F.sqrt(F.col("_nb").cast("double"))
    )
    # norms joins are LEFT: a record whose every token was min_df-pruned
    # (or whose token array is empty) has no norms row, and the feature
    # contract is "append a 0", never "drop the candidate pair"
    return (
        pairs.join(dots, [a_id, b_id], "left")
        .join(na, a_id, "left")
        .join(nb, b_id, "left")
        .withColumn(
            out_col,
            F.coalesce(
                F.floor(cos * F.lit(1e6) + F.lit(0.5)).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
        )
        .drop("_dot", "_na", "_nb")
    )


def soft_tfidf_pairs(
    pairs: DataFrame,
    weights: DataFrame,
    norms: DataFrame,
    a_id: str = "a_id",
    b_id: str = "b_id",
    id_col: str = "record_id",
    theta: float = 0.9,
    out_col: str = "soft_tfidf",
) -> DataFrame:
    """SoftTFIDF (Cohen et al. 2003 §2.3): TF-IDF cosine relaxed so
    tokens need not match exactly — each a-token pairs with its
    JW-closest b-token when JW >= theta, contributing
    V(w,a) * V(v,b) * JW(w,v) with L2-normalized weights.

    At theta = 1.0 only identical tokens pair (JW == 1 iff equal), so
    the score reduces exactly to TF-IDF cosine — the calibration test.

    Shape: within-pair token cross product (bounded by name lengths)
    -> ONE vectorized JW Arrow crossing -> window argmax per (pair,
    a-token) -> weighted sum. Float output (the JW kernel is float);
    for hash-exact oracles use `tfidf_cosine_pairs`.
    """
    from pyspark.sql import Window

    from hamerkop_spark.functions.textdist import jaro_winkler_udf

    wa = weights.select(
        F.col(id_col).alias(a_id),
        F.col("token").alias("_ta"),
        F.col("w_fp").alias("_wa"),
    )
    wb = weights.select(
        F.col(id_col).alias(b_id),
        F.col("token").alias("_tb"),
        F.col("w_fp").alias("_wb"),
    )
    cross = pairs.select(a_id, b_id).join(wa, a_id).join(wb, b_id)
    scored = cross.withColumn("_jw", jaro_winkler_udf(F.col("_ta"), F.col("_tb")))
    close = scored.where(F.col("_jw") >= F.lit(float(theta)))
    w = Window.partitionBy(a_id, b_id, "_ta").orderBy(
        F.desc("_jw"), F.desc("_wb"), F.asc("_tb")
    )
    best = close.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    contrib = best.groupBy(a_id, b_id).agg(
        F.sum(
            F.col("_wa").cast("double")
            * F.col("_wb").cast("double")
            * F.col("_jw")
        ).alias("_num")
    )
    na = norms.select(F.col(id_col).alias(a_id), F.col("norm2").alias("_na"))
    nb = norms.select(F.col(id_col).alias(b_id), F.col("norm2").alias("_nb"))
    return (
        pairs.join(contrib, [a_id, b_id], "left")
        .join(na, a_id, "left")
        .join(nb, b_id, "left")
        .withColumn(
            out_col,
            F.coalesce(
                F.col("_num")
                / F.sqrt(F.col("_na").cast("double"))
                / F.sqrt(F.col("_nb").cast("double")),
                F.lit(0.0),
            ),
        )
        .drop("_num", "_na", "_nb")
    )


def soft_tfidf_lev_pairs(
    pairs: DataFrame,
    weights: DataFrame,
    norms: DataFrame,
    a_id: str = "a_id",
    b_id: str = "b_id",
    id_col: str = "record_id",
    theta_micro: int = 900_000,
    out_col: str = "soft_tfidf_lev_fp",
) -> DataFrame:
    """SoftTFIDF with an exact-integer normalized-Levenshtein kernel —
    the hash-exact scale-path twin of ``soft_tfidf_pairs`` (whose JW
    kernel is float and Arrow-crossed). Kernel per token pair, in
    micro-units, the same convention as Monge-Elkan
    (operators/features.py:359):

        sim_micro = ((L - lev(x,y)) * 1e6) div L,  L = max(len x, len y)

    Each a-token pairs with its best b-token when sim_micro >=
    theta_micro (argmax by sim, ties to the heavier then
    lexicographically-first b-token), contributing

        ((w_a * w_b) div 1e6) * sim_micro

    — the scale-down happens BEFORE the kernel product, so every term
    stays inside BIGINT (w_a*w_b < 2^63 needs w < 3e9; idf_fp tops out
    ~2.8e7 at N = 1e12, leaving tf headroom of 100x) and both engines
    floor identically. At theta_micro = 1e6 the kernel fires only on
    identical tokens with sim 1e6, so the numerator reduces to the
    TF-IDF dot product modulo the per-term scale-down floor (< 1e6
    absolute per shared token — the calibration test bounds the
    normalized gap). Final score =
    numerator / sqrt(norm2_a) / sqrt(norm2_b) folded to millionths —
    the exact tfidf_cosine_pairs convention, correctly-rounded IEEE in
    any engine.

    Everything — explode, levenshtein, window argmax, aggregates — is
    JVM-native whole-stage codegen; no Python crossing. The within-
    pair token cross product is bounded by name lengths, never corpus
    size; pairs must already be blocked upstream.
    """
    wa = weights.select(
        F.col(id_col).alias(a_id),
        F.col("token").alias("_ta"),
        F.col("w_fp").alias("_wa"),
    )
    wb = weights.select(
        F.col(id_col).alias(b_id),
        F.col("token").alias("_tb"),
        F.col("w_fp").alias("_wb"),
    )
    cross = pairs.select(a_id, b_id).join(wa, a_id).join(wb, b_id)
    scored = cross.withColumn(
        "_sim",
        F.expr(
            "((greatest(length(_ta), length(_tb)) - levenshtein(_ta, _tb))"
            " * cast(1000000 as bigint))"
            " div greatest(length(_ta), length(_tb))"
        ),
    )
    close = scored.where(F.col("_sim") >= F.lit(int(theta_micro)))
    from pyspark.sql import Window

    w = Window.partitionBy(a_id, b_id, "_ta").orderBy(
        F.desc("_sim"), F.desc("_wb"), F.asc("_tb")
    )
    best = close.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") == 1
    )
    contrib = best.groupBy(a_id, b_id).agg(
        F.sum(
            F.expr("((_wa * _wb) div 1000000)") * F.col("_sim")
        ).cast("bigint").alias("_num")
    )
    na = norms.select(F.col(id_col).alias(a_id), F.col("norm2").alias("_na"))
    nb = norms.select(F.col(id_col).alias(b_id), F.col("norm2").alias("_nb"))
    score = (
        F.col("_num").cast("double")
        / F.sqrt(F.col("_na").cast("double"))
        / F.sqrt(F.col("_nb").cast("double"))
    )
    return (
        pairs.join(contrib, [a_id, b_id], "left")
        .join(na, a_id, "left")
        .join(nb, b_id, "left")
        .withColumn(
            out_col,
            F.coalesce(
                F.floor(score * F.lit(1e6) + F.lit(0.5)).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
        )
        .drop("_num", "_na", "_nb")
    )

def attach_tfidf_cosine(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str = "record_id",
    tokens_col: str = "tokens",
    a_id: str = "a_id",
    b_id: str = "b_id",
    min_df: int = 1,
    soft_theta: float | None = None,
) -> DataFrame:
    """End-to-end feature attachment: build IDF/weights/norms from
    `records` ONCE and append `tfidf_cosine_fp` (and `soft_tfidf` when
    `soft_theta` is set) to the candidate-pair table.

    The weights/norms tables are localCheckpoint'd before use: Catalyst
    does not reuse the weights subtree across the two join branches of
    the dot product (observed two full builds in the plan audit —
    PLANS.md round-5 late addendum), and the soft kernel would add a
    third. The checkpoint pins one materialization for all consumers.

    This is the bundle-style entry point for corpus-weighted name
    similarity; the Column-expression features in operators/features.py
    can't carry corpus state, so this composes at the table level
    instead (join on the pair ids), like candidate generators do.
    """
    idf = token_idf(records, tokens_col, min_df=min_df)
    w = tfidf_weights(records, idf, id_col, tokens_col).localCheckpoint(
        eager=False
    )
    n = tfidf_norms(w, id_col).localCheckpoint(eager=False)
    out = tfidf_cosine_pairs(pairs, w, n, a_id, b_id, id_col)
    if soft_theta is not None:
        out = soft_tfidf_pairs(out, w, n, a_id, b_id, id_col, soft_theta)
    return out
