"""Hashing-trick character-n-gram embeddings, fully native.

The north_rule's pairwise scorer includes "cosine over name/context
embedding features". No embedding model ships in this sandbox (or on
many clusters), so this provides the model-free baseline: a signed
feature-hashing embedding over character n-grams (Weinberger et al.,
"Feature Hashing for Large Scale Multitask Learning", ICML'09 — the
same construction as scikit-learn's HashingVectorizer). Deterministic,
vocabulary-free (no fit step, no dictionary to ship), and entirely
JVM-side: xxhash64 for bucket + sign, higher-order aggregates for the
accumulation, so embedding 10^12 names is a narrow map with zero
Python crossings.

Layout matters (the transform-lambda CSE trap, see
functions/strings.char_ngrams): the bucket-accumulation step scans the
hashed-gram array once per output dimension, so the hashing step MUST
be materialized below a projection/join boundary first — otherwise
Catalyst inlines it into the per-dimension lambda and every gram is
re-hashed dim times. `ngram_hash_signs` (cheap, per gram) and
`embedding_from_signs` (per dimension, over a COLUMN REFERENCE) are
therefore separate expressions; `add_hashed_embedding` wires them
through two withColumn steps, and operators/features.DERIVED_COLS does
the same per join side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hamerkop_spark.functions.strings import char_ngrams

DEFAULT_DIM = 32


def ngram_hash_signs(col: Column, dim: int = DEFAULT_DIM, n: int = 3) -> Column:
    """array<struct<b:int, s:double>>: one (bucket, ±1 sign) per char
    n-gram of lower(col). One xxhash64 pair per gram. Materialize this
    as a column before feeding embedding_from_signs."""
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


def embedding_from_signs(signs: Column, dim: int = DEFAULT_DIM) -> Column:
    """array<double> of length `dim`: signed bucket counts. `signs`
    should be a materialized column reference (see module docstring).
    Not normalized — cosine_native normalizes, and unnormalized counts
    keep addition/averaging well-defined for callers that pool."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.aggregate(
            signs,
            F.lit(0.0),
            lambda acc, x: acc + F.when(x["b"] == i, x["s"]).otherwise(F.lit(0.0)),
        ),
    )


def add_hashed_embedding(
    df: DataFrame,
    src_col: str,
    out_col: str,
    dim: int = DEFAULT_DIM,
    n: int = 3,
) -> DataFrame:
    """df + `out_col`: hashing-trick embedding of `src_col`. Two
    projection steps so the hash work is evaluated once per gram (the
    per-dimension scan then reads the materialized structs). Note that
    without a join/exchange boundary below them, collapsed projections
    can still inline — per-side derivation before a join (as
    build_pairs does) is the safe placement on hot paths."""
    tmp = f"__{out_col}_signs"
    return (
        df.withColumn(tmp, ngram_hash_signs(F.col(src_col), dim, n))
        .withColumn(out_col, embedding_from_signs(F.col(tmp), dim))
        .drop(tmp)
    )
