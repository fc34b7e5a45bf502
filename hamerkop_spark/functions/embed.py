"""Hashing-trick character-n-gram embeddings, fully native.

The north_rule's pairwise scorer includes "cosine over name/context
embedding features". No embedding model ships in this sandbox (or on
many clusters), so this provides the model-free baseline: a signed
feature-hashing embedding over character n-grams (Weinberger et al.,
"Feature Hashing for Large Scale Multitask Learning", ICML'09 — the
same construction as scikit-learn's HashingVectorizer). Deterministic,
vocabulary-free (no fit step, no dictionary to ship), and entirely
JVM-side: xxhash64 for bucket + sign, one higher-order aggregate for
the accumulation, so embedding 10^12 names is a narrow map with zero
Python crossings.

Expression layout (the lambda-CSE trap, see
functions/strings.char_ngrams): withColumn "materialization" does NOT
protect a subexpression from being inlined into a lambda —
CollapseProject folds adjacent projections, so a per-dimension
`transform(sequence(0, dim-1), i -> aggregate(signs, ...))` re-derives
`signs` (n-gramming + both hashes) dim times per row even when signs
"was" its own column. The safe shape used here inverts the loop: ONE
`aggregate` over the hashed-gram array — which sits in the aggregate's
*input* position, evaluated once per row — whose merge lambda updates a
dim-length accumulator via an indexed transform. Per row that costs
O(grams) hash evaluations + O(grams x dim) pure arithmetic, with no
re-hashing at any dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hamerkop_spark.functions.strings import char_ngrams

DEFAULT_DIM = 32


def ngram_hash_signs(col: Column, dim: int = DEFAULT_DIM, n: int = 3) -> Column:
    """array<struct<b:int, s:double>>: one (bucket, ±1 sign) per char
    n-gram of lower(col). One xxhash64 pair per gram."""
    grams = char_ngrams(F.lower(col), n)
    return F.transform(
        grams,
        lambda g: F.struct(
            F.pmod(F.xxhash64(g), F.lit(dim)).cast("int").alias("b"),
            F.when(F.pmod(F.xxhash64(g, F.lit(1)), F.lit(2)) == 0, F.lit(1.0))
            .otherwise(F.lit(-1.0))
            .alias("s"),
        ),
    )


def hashed_char_ngram_embedding(
    col: Column, dim: int = DEFAULT_DIM, n: int = 3
) -> Column:
    """array<double> of length `dim`: signed bucket counts of the char
    n-grams of lower(col). Single scan of the hashed grams (see module
    docstring for why the accumulate-into-array shape is mandatory).
    Not normalized — cosine_native normalizes, and unnormalized counts
    keep addition/averaging well-defined for callers that pool."""
    return F.aggregate(
        ngram_hash_signs(col, dim, n),
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, x: F.transform(
            acc,
            lambda v, i: v
            + F.when(x["b"] == i, x["s"]).otherwise(F.lit(0.0)),
        ),
    )


def add_hashed_embedding(
    df: DataFrame,
    src_col: str,
    out_col: str,
    dim: int = DEFAULT_DIM,
    n: int = 3,
) -> DataFrame:
    """df + `out_col`: hashing-trick embedding of `src_col`."""
    return df.withColumn(
        out_col, hashed_char_ngram_embedding(F.col(src_col), dim, n)
    )
