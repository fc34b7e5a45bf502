"""Deduplication operators for the training-data pipeline (brief:
first-class alongside SURVEY.md §2): exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Input convention: a documents DataFrame with (doc_id, text). Every
operator returns either a flagged frame (is_duplicate / dup_of) or a
pairs frame — composable with the shared connected-components module for
cluster-level dedup. All group keys are hash keys, so the shuffles are
uniform except for pathological boilerplate, which the `max_cluster`
caps bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from hamerkop_spark.functions.quality import fingerprint, normalize_for_fingerprint
from hamerkop_spark.functions.strings import char_ngrams
from hamerkop_spark.operators.cc import connected_components


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on the normalized-content fingerprint (md5 of
    lower/strip-punct/collapse-space text). Keeps the min id per group as
    canonical; one shuffle on the fingerprint."""
    keyed = docs.withColumn("fp", fingerprint(F.col(text_col)))
    w = Window.partitionBy("fp")
    return (
        keyed.withColumn("dup_of", F.min(id_col).over(w))
        .withColumn("is_duplicate", (F.col("dup_of") != F.col(id_col)))
        .drop("fp")
    )


def _word_tokens(text_col: str) -> F.Column:
    return F.filter(
        F.split(normalize_for_fingerprint(F.col(text_col)), r"\s+"),
        lambda t: t != "",
    )


def _shingles_of(toks: F.Column, k: int = 3) -> F.Column:
    """Word k-shingles of a token array via k shifted slices + arrays_zip.

    Deliberately NOT `transform(sequence, i -> ...)` over positions:
    expressions referenced inside a transform lambda are re-evaluated
    per element (no CSE across lambda iterations — and CollapseProject
    re-inlines any 'materialized' token column), so a per-position
    formulation reruns the tokenizer O(n·k) times or copies O(n) slices
    per position. Here `toks` is evaluated exactly k times."""
    m = F.size(toks) - (k - 1)
    sliced = [F.slice(toks, j + 1, m).alias(f"t{j}") for j in range(k)]
    zipped = F.arrays_zip(*sliced)
    shingles = F.transform(
        zipped,
        lambda st: F.concat_ws(" ", *[st[f"t{j}"] for j in range(k)]),
    )
    return F.when(
        F.size(toks) < k, F.array(F.array_join(toks, " "))
    ).otherwise(shingles)


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    max_bucket: int = 200,
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs: word-shingle -> minhash ->
    band -> bucket self-join. Buckets larger than `max_bucket` are
    dropped (boilerplate bombs) — the documented block cap.

    Returns (src, dst) pairs with src < dst; feed to
    connected_components for cluster-level dedup."""
    from hamerkop_spark.operators.blocking import minhash_bands, minhash_signature

    rows_per_band = num_hashes // num_bands
    shingled = (
        docs.select(
            F.col(id_col).alias("_id"),
            _word_tokens(text_col).alias("toks"),
        )
        .select(
            "_id",
            F.array_distinct(_shingles_of(F.col("toks"), shingle_k)).alias("sh"),
        )
        .where(F.size("sh") > 0)
    )
    sig = minhash_signature(shingled, ["_id"], "sh", num_hashes)
    bands = minhash_bands(sig, ["_id"], num_bands, rows_per_band)
    wb = Window.partitionBy("band", "bucket")
    bounded = bands.withColumn("bsize", F.count("*").over(wb)).where(
        F.col("bsize") <= max_bucket
    )
    a = bounded.select("band", "bucket", F.col("_id").alias("src"))
    b = bounded.select("band", "bucket", F.col("_id").alias("dst"))
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def minhash_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", **kw
) -> DataFrame:
    """MinHash-LSH dedup end-to-end: candidate pairs -> connected
    components -> canonical representative (min id per component)."""
    pairs = minhash_dedup_pairs(docs, id_col, text_col, **kw)
    ids = docs.select(F.col(id_col).cast("string").alias("node"))
    comps = connected_components(
        pairs.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        ),
        nodes=ids,
    )
    return docs.join(
        comps.select(
            F.col("node").alias("_k"), F.col("component").alias("dup_cluster")
        ),
        docs[id_col].cast("string") == F.col("_k"),
        "left",
    ).drop("_k").withColumn(
        "is_duplicate", F.col("dup_cluster") != docs[id_col].cast("string")
    )


def _simhash64(tokens: list) -> int:
    """64-bit SimHash over a token list (driver/executor-side helper)."""
    if not tokens:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = np.uint64(hash_token(t))
        for b in range(64):
            votes[b] += 1 if (int(h) >> b) & 1 else -1
    out = 0
    for b in range(64):
        if votes[b] > 0:
            out |= 1 << b
    return out - (1 << 63)  # signed 64-bit for Spark LongType


def hash_token(t: str) -> int:
    """Deterministic 64-bit FNV-1a (stable across runs/processes —
    Python's builtin hash() is salted and would break resume)."""
    h = 0xCBF29CE484222325
    for ch in t.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@F.pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """Arrow-batched SimHash of whitespace tokens of normalized text."""
    out = np.empty(len(text), dtype=np.int64)
    for i, t in enumerate(text.fillna("")):
        toks = t.lower().split()
        out[i] = _simhash64(toks)
    return pd.Series(out)


def simhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signature, blocked on 4 x 16-bit
    chunks (pigeonhole: any pair within hamming distance 3 shares at
    least one exact chunk), verified by popcount on the full signature."""
    # empty/whitespace docs all hash to 0 — at web scale they would form
    # one quadratic mega-bucket, so they never enter pairing
    nonempty = docs.where(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    )
    sigs = nonempty.select(
        F.col(id_col).alias("_id"), simhash_udf(F.col(text_col)).alias("sig")
    )
    chunks = sigs.select(
        "_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), i * 16).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.select(
        "chunk_idx", "chunk", F.col("_id").alias("src"), F.col("sig").alias("sig_a")
    )
    b = chunks.select(
        "chunk_idx", "chunk", F.col("_id").alias("dst"), F.col("sig").alias("sig_b")
    )
    cand = (
        a.join(b, ["chunk_idx", "chunk"])
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.where(hamming <= max_hamming).select("src", "dst")


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_jaccard: float = 0.8,
    max_df: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted index:
    explode char-n-grams -> drop ultra-common grams (df > max_df) ->
    self-join postings -> |A∩B| per pair -> Jaccard with |A|,|B|.

    Correct (not approximate) but quadratic in bucket size; max_df is the
    block cap. Use minhash_dedup_pairs at full scale; this is the
    verifier/oracle-friendly variant."""
    grams = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(
                char_ngrams(normalize_for_fingerprint(F.col(text_col)), n)
            )
        ).alias("g"),
    )
    sizes = grams.groupBy("_id").agg(F.count("*").alias("sz"))
    wdf = Window.partitionBy("g")
    bounded = grams.withColumn("df", F.count("*").over(wdf)).where(
        F.col("df") <= max_df
    )
    a = bounded.select("g", F.col("_id").alias("src"))
    b = bounded.select("g", F.col("_id").alias("dst"))
    inter = (
        a.join(b, "g")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("src"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_id").alias("dst"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "src")
        .join(sb, "dst")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("src", "dst", F.round("jaccard", 6).alias("jaccard"))
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force, for modest corpora or
    within LSH buckets): self-join + native cosine. At 100 TB scale,
    pre-bucket with random-hyperplane LSH (similarity.py) and run this
    within buckets."""
    from hamerkop_spark.functions.textdist import cosine_native

    a = embeddings.select(
        F.col(id_col).alias("src"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("dst"), F.col(vec_col).alias("vb")
    )
    pairs = a.crossJoin(b).where(F.col("src") < F.col("dst"))
    sim = cosine_native(
        F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")
    )
    return (
        pairs.withColumn("cosine", sim)
        .where(F.col("cosine") >= min_cosine)
        .select("src", "dst", F.round("cosine", 6).alias("cosine"))
    )
