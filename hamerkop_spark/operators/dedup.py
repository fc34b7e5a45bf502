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

from hamerkop_spark.functions.num import det_round

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
    # groupBy+min+join-back, NOT Window.partitionBy("fp"): a window
    # colocates an entire fingerprint group on one partition, and the
    # exact case this operator exists for (thousands of byte-identical
    # boilerplate pages) is a mega-group that would straggle it. The
    # groupBy gets a map-side partial min before the exchange.
    #
    # NULL fingerprints (null text): each row stays its OWN canonical —
    # the left join misses the null key and dup_of falls back to the
    # row's id. Deliberate: "no content" is not "identical content"
    # (a null-grouping window would have merged every null-text doc
    # into one bogus duplicate cluster).
    canon = keyed.groupBy("fp").agg(F.min(id_col).alias("dup_of"))
    return (
        keyed.join(canon, "fp", "left")
        .withColumn("dup_of", F.coalesce("dup_of", F.col(id_col)))
        .withColumn("is_duplicate", (F.col("dup_of") != F.col(id_col)))
        .drop("fp")
    )


def _word_tokens(text_col: str) -> F.Column:
    return F.filter(
        F.split(normalize_for_fingerprint(F.col(text_col)), r"\s+"),
        lambda t: t != "",
    )


def _shingles_sql(cname: str, k: int = 3) -> str:
    """SQL-string form of _shingles_of over a NAMED token-array column —
    one py4j round-trip via F.expr instead of ~18 Column-operator
    round-trips (driver wall; see the r6 construct-split measurements).
    Same expression tree: arrays_zip's SQL field names are positional
    ('0','1',...) where the Column form aliased them t0..tk-1, but the
    zipped struct is consumed positionally by the same concat_ws, so
    values are bit-identical."""
    m = f"(size({cname}) - {k - 1})"
    slices = ", ".join(f"slice({cname}, {j + 1}, {m})" for j in range(k))
    fields = ", ".join(f"st.`{j}`" for j in range(k))
    grams = f"transform(arrays_zip({slices}), st -> concat_ws(' ', {fields}))"
    return (
        f"CASE WHEN size({cname}) < {k} "
        f"THEN array(array_join({cname}, ' ')) ELSE {grams} END"
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


def _drop_hot_keys(df: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Drop rows whose key group exceeds `cap` rows WITHOUT colocating hot
    groups first: groupBy (map-side partial aggregation — a hot key's
    partial counts combine before the shuffle, so the reducer sees at most
    one row per key per map partition) finds the over-cap keys, then an
    anti-join filters them. A `count() over (partition by key)` window
    here would shuffle every row of the hottest bucket onto one
    partition — the exact straggler the cap exists to prevent.

    No broadcast HINT on the hot side: for minhash bands the over-cap
    set is genuinely tiny (boilerplate bombs) and AQE broadcasts it
    anyway, but for char-ngram df caps over web text the over-cap set is
    EVERY common n-gram — millions of keys — and a forced broadcast
    would blow the driver/broadcast limit where a shuffled anti-join
    degrades gracefully. AQE picks per-run based on the measured size."""
    hot = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_ksize"))
        .where(F.col("_ksize") > cap)
        .select(*keys)
    )
    return df.join(hot, keys, "left_anti")


def minhash_doc_bands(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(_id, band, bucket) LSH band rows for a document table — the
    shared front half of batch minhash dedup and the incremental
    streaming store (streaming/incremental.foreach_batch_dedup)."""
    from hamerkop_spark.operators.blocking import minhash_bands, minhash_signature

    rows_per_band = num_hashes // num_bands
    shingled = (
        docs.select(
            F.col(id_col).alias("_id"),
            _word_tokens(text_col).alias("toks"),
        )
        .select(
            "_id",
            F.expr(
                f"array_distinct({_shingles_sql('toks', shingle_k)})"
            ).alias("sh"),
        )
        # deliberately NO `.where(size(sh) > 0)`: the downstream
        # minhash_signature explodes `sh`, and explode() of an empty or
        # null array already yields zero rows — while an explicit filter
        # gets pushed below the repartition exchange, where it inlines
        # the ENTIRE tokenize+shingle tree into the single-task scan
        # stage (evaluated twice: size + isnotnull) and serializes the
        # hottest compute of the whole job
    )
    sig = minhash_signature(shingled, ["_id"], "sh", num_hashes, hash_fn)
    return minhash_bands(sig, ["_id"], num_bands, rows_per_band, hash_fn)


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    max_bucket: int = 200,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs: word-shingle -> minhash ->
    band -> bucket self-join. Buckets larger than `max_bucket` are
    dropped (boilerplate bombs) — the documented block cap.

    `hash_fn='md5'` derives the hashes from md5 hex digests instead of
    xxhash64 — DuckDB-reproducible (oracle-checkable) at ~2x the hash
    cost; same LSH semantics.

    Returns (src, dst) pairs with src < dst; feed to
    connected_components for cluster-level dedup.

    r6 restructure (byte-identical output): the bucket self-join +
    ``_drop_hot_keys`` anti-join referenced the band DataFrame three
    times, and Catalyst does not CSE across self-join branches — the
    whole tokenize→shingle→hash→min-agg signature pipeline executed
    4x per run (measured in the sf1.0 plan: two full signature subtrees
    under the join plus one per anti-join side). One
    ``groupBy(band, bucket).collect_list`` computes the pipeline ONCE,
    the ``size(ids) <= max_bucket`` filter IS the hot-bucket cap
    (same keep/drop set as the count-then-anti-join), and in-bucket
    ordered pairs come from a sorted-array index fan-out — the exact
    pair set the self-join's ``src < dst`` produced, each pair emitted
    once per bucket. collect_list is bounded: oversized buckets are
    dropped afterwards, but the list itself never exceeds the bucket's
    band-row count, the same rows the self-join would have streamed."""
    bands = minhash_doc_bands(
        docs, id_col, text_col, shingle_k, num_hashes, num_bands, hash_fn
    )
    grouped = (
        bands.groupBy("band", "bucket")
        .agg(F.collect_list("_id").alias("ids"))
        .where((F.size("ids") <= max_bucket) & (F.size("ids") > 1))
        .select(F.sort_array("ids").alias("ids"))
    )
    # ordered index pairs (i < j) over the value-sorted ids == the
    # self-join's src < dst pairs (ids are distinct within a bucket:
    # one band row per (_id, band)); single F.expr (named_struct ==
    # the Column struct(src, dst), same fields same order)
    pair_structs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "y -> named_struct('src', x, 'dst', y))))"
    )
    return (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.src", "p.dst")
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
    # two's-complement reinterpretation into a signed 64-bit long (NOT
    # an unconditional bit-63 flip — that stored a value that is not
    # the computed SimHash and broke parity with any external
    # implementation; review fix). Pairwise hamming is unaffected.
    return out - (1 << 64) if out >= (1 << 63) else out


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


def simhash_native(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 60,
) -> DataFrame:
    """Pure-Catalyst SimHash: 60-bit signature whose per-token hash is
    md5-derived (15 hex chars -> bigint), so a SQL oracle computes the
    identical value. Tokens are the lowercased whitespace tokens
    (multiset — repeats vote repeatedly, like the UDF variant). Shape:
    explode tokens -> one conditional-sum vote aggregate per bit
    (map-side partial aggregation; one shuffled row per doc).

    Output: (_id, sig)."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    hashed = toks.select("_id", h.alias("h"))
    votes = hashed.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)) == 1,
                       1).otherwise(-1)
            ).alias(f"_v{b}")
            for b in range(num_bits)
        ]
    )
    sig = None
    for b in range(num_bits):
        term = F.when(F.col(f"_v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return votes.select("_id", sig.cast("bigint").alias("sig"))


def _chunk_bounds(num_bits: int, num_chunks: int) -> list[tuple[int, int]]:
    """Split [0, num_bits) into num_chunks contiguous (start, width)
    spans, remainder spread across the leading chunks."""
    return [
        (i * num_bits // num_chunks,
         (i + 1) * num_bits // num_chunks - i * num_bits // num_chunks)
        for i in range(num_chunks)
    ]


def simhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """SimHash near-dup pairs, blocked on (max_hamming + 1) signature
    chunks — the pigeonhole guarantee holds for ANY max_hamming by
    construction: a pair within hamming distance h differs in at most h
    chunks, so with h+1 chunks at least one matches exactly. Verified by
    popcount on the full signature.

    hash_fn='md5': native 60-bit signature, oracle-checkable (default).
    hash_fn='fnv': the 64-bit FNV pandas-UDF variant (kept for parity
    with the python reference implementation in tests)."""
    # empty/whitespace docs all hash to 0 — at web scale they would form
    # one quadratic mega-bucket, so they never enter pairing
    nonempty = docs.where(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    )
    if hash_fn == "md5":
        num_bits = 60
        sigs = simhash_native(nonempty, id_col, text_col, num_bits)
    elif hash_fn == "fnv":
        num_bits = 64
        sigs = nonempty.select(
            F.col(id_col).alias("_id"), simhash_udf(F.col(text_col)).alias("sig")
        )
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    bounds = _chunk_bounds(num_bits, max_hamming + 1)
    chunks = sigs.select(
        "_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), start).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for start, width in bounds
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    # r6: the chunk-bucket self-join referenced `chunks` twice, and
    # Catalyst does not CSE across self-join branches — the whole
    # tokenize+md5+vote signature pipeline executed twice per run. One
    # groupBy collect_list computes it once; sorted-index fan-out over
    # (_id, sig) structs emits the identical src < dst pair set. The
    # per-bucket list is bounded by the bucket's population (the same
    # rows the self-join streamed; empty-doc mega-buckets are already
    # excluded above).
    grouped = (
        chunks.groupBy("chunk_idx", "chunk")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_id"), F.col("sig")))
            ).alias("mem")
        )
        .where(F.size("mem") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("mem"),
            lambda x, i: F.transform(
                F.slice(F.col("mem"), i + 2, F.size(F.col("mem"))),
                lambda y: F.struct(
                    x["_id"].alias("src"),
                    y["_id"].alias("dst"),
                    x["sig"].alias("sig_a"),
                    y["sig"].alias("sig_b"),
                ),
            ),
        )
    )
    cand = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.src", "p.dst", "p.sig_a", "p.sig_b")
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

    Jaccard is computed over the POST-DROP gram universe on BOTH sides
    of the ratio: set sizes come from the bounded postings, the same
    rows the intersection counts. Mixing universes (full-set sizes,
    bounded intersection — review r4) depressed the score of genuinely
    identical boilerplate-heavy docs below min_jaccard (shared hot
    grams counted in |A|+|B| but never in |A∩B|), while the consistent
    universe keeps identical docs at 1.0 AND still suppresses
    boilerplate-only pairs (their shared grams are exactly the dropped
    ones, so they produce no intersection row at all).

    Exact Jaccard over that universe (not approximate) but quadratic in
    bucket size; max_df is the block cap. Use minhash_dedup_pairs at
    full scale; this is the verifier/oracle-friendly variant."""
    grams = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(
                char_ngrams(normalize_for_fingerprint(F.col(text_col)), n)
            )
        ).alias("g"),
    )
    # r6: this plan references `grams` four times (hot-key count, its
    # anti-join probe, sizes, both self-join sides) and Catalyst does
    # not CSE across those branches — the normalize+ngram pipeline ran
    # 4x. A lazy local checkpoint materializes it once on first use;
    # every branch then reads the checkpointed rows.
    grams = grams.localCheckpoint(eager=False)
    bounded = _drop_hot_keys(grams, ["g"], max_df)
    sizes = bounded.groupBy("_id").agg(F.count("*").alias("sz"))
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
        .select("src", "dst", det_round(F.col("jaccard"), 6).alias("jaccard"))
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    dim: int | None = None,
    num_planes: int = 8,
    brute_force: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pairs. DEFAULT = LSH-bucketed: both sides
    keyed by a deterministic random-hyperplane signature
    (similarity.hyperplanes literals), pairs generated ONLY within
    buckets — the O(n²/2^planes) scale path; near-identical vectors land
    in the same bucket with probability (1 - theta/pi)^planes, ~0.97 for
    cosine 0.95 at 8 planes. `dim` (vector length) is required.

    `brute_force=True` is the exact all-pairs variant — O(n²), for small
    corpora and recall audits only; never the default reachable path."""
    from hamerkop_spark.functions.textdist import cosine_native
    from hamerkop_spark.operators.similarity import hyperplanes, lsh_bucket_lit

    sim = cosine_native(
        F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")
    )
    if brute_force:
        a = embeddings.select(F.col(id_col).alias("src"), F.col(vec_col).alias("va"))
        b = embeddings.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("vb"))
        pairs = a.crossJoin(b).where(F.col("src") < F.col("dst"))
    else:
        if dim is None:
            raise ValueError("dim is required for the LSH-bucketed path")
        planes = hyperplanes(dim, num_planes)
        keyed = embeddings.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("v"),
            lsh_bucket_lit(F.col(vec_col).cast("array<double>"), planes).alias(
                "bucket"
            ),
        )
        a = keyed.select("bucket", F.col("_id").alias("src"), F.col("v").alias("va"))
        b = keyed.select("bucket", F.col("_id").alias("dst"), F.col("v").alias("vb"))
        pairs = a.join(b, "bucket").where(F.col("src") < F.col("dst"))
    return (
        pairs.withColumn("cosine", sim)
        .where(F.col("cosine") >= min_cosine)
        .select("src", "dst", det_round(F.col("cosine"), 6).alias("cosine"))
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    hash_fn: str = "xxhash64",
    seed: int = 17,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003) — the LOCAL-overlap member of the dedup family: where
    MinHash/SimHash answer "are these documents globally similar?",
    winnowing answers "do they SHARE A PASSAGE?" (quotation, template
    reuse, partial scrape), with the paper's guarantee: any shared
    substring of length >= k + window - 1 produces at least one shared
    fingerprint, because it spans a full window of k-grams whose
    minimum hash is selected on both sides.

    Pipeline (one Catalyst projection, zero shuffles, zero UDFs):
    normalize (lowercase/strip-punct/collapse-ws) -> char k-grams
    (CSE-safe zip-of-slices) -> 64-bit gram hashes -> per-window
    minima over every window of `window` consecutive gram hashes ->
    distinct minima per document. The classic algorithm additionally
    records positions and breaks window ties rightmost; the selected
    HASH SET is what overlap detection consumes, and taking distinct
    window minima preserves both the density bound (>= 1 fingerprint
    per window) and the guarantee above, so positions are deliberately
    dropped. Documents shorter than k normalize to zero fingerprints;
    docs with fewer than `window` grams contribute their global min
    (the paper's short-document convention).

    ``hash_fn``: 'xxhash64' (JVM-fast default) or 'md5' (60-bit md5
    prefix, bit-identical in DuckDB — the oracle-checkable path, same
    convention as minhash/simhash in blocking.py).

    Output: (id_col, fp) — one row per selected fingerprint.
    """
    if hash_fn == "xxhash64":
        def hfn(g):
            return F.xxhash64(g, F.lit(seed))
    elif hash_fn == "md5":
        def hfn(g):
            return F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(str(seed)), g)), 1, 15
                ),
                16, 10,
            ).cast("bigint")
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    base = docs.select(
        F.col(id_col).alias("_wid"),
        F.transform(
            char_ngrams(normalize_for_fingerprint(F.col(text_col)), k),
            hfn,
        ).alias("_h"),
    )
    m = F.size("_h") - (window - 1)
    winmins = (
        F.when(F.size("_h") <= 0, F.array().cast("array<bigint>"))
        .when(m < 1, F.array(F.array_min("_h")))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), m),
                lambda i: F.array_min(F.slice(F.col("_h"), i, window)),
            )
        )
    )
    return base.select(
        F.col("_wid").alias(id_col),
        F.explode(F.array_distinct(winmins)).alias("fp"),
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    max_df: int = 200,
    min_shared: int = 2,
    hash_fn: str = "xxhash64",
    seed: int = 17,
) -> DataFrame:
    """Shared-passage candidate pairs from winnowing fingerprints:
    inverted index on the fingerprint, hot fingerprints purged at
    ``max_df`` (boilerplate passages shared by everything discriminate
    nothing and would contribute quadratic pairs), pairs scored by the
    number of distinct shared fingerprints and kept at
    ``n_shared >= min_shared`` (one shared fingerprint ~ one shared
    window-length passage; require `min_shared` of them to suppress
    chance hash collisions and trivial short overlaps).

    Output: (a_id, b_id, n_shared), a < b. Plan: the fingerprint
    projection above (shuffle-free), one partial-agg shuffle for df,
    one bounded self-join on fp (every surviving fp has df <=
    max_df), one pair-keyed partial-agg shuffle — the same cost
    envelope as the ngram-jaccard blocker (dedup.py) with the
    winnowing guarantee instead of whole-document similarity.
    """
    fps = winnow_fingerprints(
        docs, id_col=id_col, text_col=text_col, k=k, window=window,
        hash_fn=hash_fn, seed=seed,
    )
    dfc = fps.groupBy("fp").agg(F.count("*").alias("_df"))
    kept = fps.join(
        dfc.where((F.col("_df") >= 2) & (F.col("_df") <= max_df)).select(
            "fp"
        ),
        "fp",
    ).localCheckpoint(eager=False)
    a = kept.select("fp", F.col(id_col).alias("a_id"))
    b = kept.select("fp", F.col(id_col).alias("b_id"))
    return (
        a.join(b, "fp")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
