"""Blocking / candidate generation (SURVEY.md §2.4, B1-B9).

The reference's name indexes (hamerkop/kb.py:132-305) are driver-side
dict lookups queried per mention chain; here every index is a *blocking
join*: build side = exploded KB name keys, probe side = distinct chain
keys, hash-partitioned on the key. CachingGenerator's memoization
(candidates.py:144-166) falls out of deduplicating the probe side to
distinct (name, type) before the join and re-joining to chains after.

Key families (north_rule): exact normalized name, char-4-gram IDF
retrieval, phonetic (Soundex / metaphone), and MinHash-LSH bands over the
same n-gram sets. All native DataFrame ops; the only UDF is the metaphone
key (Arrow-batched).

Scale notes: probe and build sides repartition on the block key; ultra-
hot keys can be capped (`max_df`) with dropped volume logged; AQE skew
join handles residual skew; the KB side is broadcast when small.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hamerkop_spark.functions.phonetic import metaphone_udf, soundex_key
from hamerkop_spark.functions.strings import char_ngrams, format_ngram_name

# A candidate set is a DataFrame: (doc_id, chain_id, entity_id, source,
# retrieval_rank) — retrieval_rank preserves generator ordering for
# FirstResolver (resolver.py:245-250) and cascade semantics.
CandidateGen = Callable[[DataFrame], DataFrame]


def build_kb_names(kb_entities: DataFrame) -> DataFrame:
    """Explode the entity name sets into the blocking build side
    (ExactMatchMemoryNameIndex._build_index, kb.py:173-182).

    Output: (entity_id, type, name, name_idx, exact_key).
    name_idx mirrors the reference's per-entity name enumeration
    (kb.py:250-256) used as the ngram-index name id.
    """
    return (
        kb_entities.select(
            "entity_id",
            "type",
            F.posexplode("names").alias("name_idx", "name"),
        )
        .withColumn("exact_key", F.lower(F.col("name")))
    )


def exact_match_candidates(
    chains: DataFrame,
    kb_names: DataFrame,
    name_col: str = "name",
    source: str = "exact",
) -> DataFrame:
    """B2+B5: equi-join chains' best name to KB names on
    (type, lower(name)) — ExactMatchMemoryNameIndex.find (kb.py:167-171).
    The exact index applies no limit. Retrieval rank is deterministic:
    by entity_id within a chain."""
    probe = (
        chains.select("doc_id", "chain_id", "type", F.col(name_col).alias("qname"))
        .where(F.col(name_col).isNotNull())
        .withColumn("exact_key", F.lower(F.col("qname")))
    )
    # memoize: dedupe probe keys before the join (CachingGenerator analog)
    keys = probe.select("type", "exact_key").distinct()
    hits = (
        keys.join(
            kb_names.select("type", "exact_key", "entity_id").distinct(),
            ["type", "exact_key"],
        )
    )
    out = probe.join(hits, ["type", "exact_key"]).select(
        "doc_id", "chain_id", "entity_id"
    ).distinct()
    w = Window.partitionBy("doc_id", "chain_id").orderBy("entity_id")
    return out.withColumn("retrieval_rank", F.row_number().over(w)).withColumn(
        "source", F.lit(source)
    )


def with_type_groups(
    df: DataFrame, *type_sets: Sequence[str], type_col: str = "type"
) -> DataFrame:
    """B4 TypeIgnoringIndex (kb.py:278-305): conflate entity types into
    group keys so e.g. GPE and LOC block together. Applied to BOTH sides
    of a blocking join, the equi-join on `type_group` reproduces the
    reference's query-all-conflated-types behavior; dedupe by
    (chain, entity) afterwards (the combine step already does).

    Types not in any set keep themselves as the group key."""
    expr = F.col(type_col)
    mapped = None
    for ts in type_sets:
        group_key = "|".join(sorted(ts))
        cond = expr.isin(list(ts))
        mapped = (
            F.when(cond, F.lit(group_key))
            if mapped is None
            else mapped.when(cond, F.lit(group_key))
        )
    group = mapped.otherwise(expr) if mapped is not None else expr
    return df.withColumn("type_group", group)


def build_ngram_postings(
    kb_names: DataFrame, ngram_size: int = 4
) -> tuple[DataFrame, int]:
    """B3 build: invert formatted KB names into char-n-gram postings with
    occurrence counts (NgramMemoryNameIndex._build_index, kb.py:244-258).

    Returns (postings, num_unique_names) where postings =
    (type, ngram, entity_id, name_idx, n_cnt, df_cnt, idf):
      * n_cnt  — occurrences of the ngram in this name (the reference
        appends one posting per occurrence, kb.py:254-256)
      * df_cnt — total occurrences across all names of the type (the
        reference's len(name_ids), kb.py:228)
      * idf    — log1p(num_unique_names / df_cnt) (kb.py:228)
    num_unique_names counts distinct lowercased names across ALL types
    (kb.py:250-251, a single global set).
    """
    num_unique = (
        kb_names.select(F.lower("name").alias("n")).distinct().count()
    )
    grams = kb_names.select(
        "type",
        "entity_id",
        "name_idx",
        F.explode(char_ngrams(format_ngram_name(F.col("name")), ngram_size)).alias(
            "ngram"
        ),
    )
    per_name = grams.groupBy("type", "ngram", "entity_id", "name_idx").agg(
        F.count("*").alias("n_cnt")
    )
    # df per ngram via groupBy (map-side partial agg on the uniform
    # composite key feeds it) + broadcast join-back: a window over
    # (type, ngram) would colocate every posting of a hot ngram on one
    # partition before computing the same sum. The distinct-ngram table
    # is small by construction (bounded by the corpus character set).
    df_tbl = per_name.groupBy("type", "ngram").agg(
        F.sum("n_cnt").alias("df_cnt")
    )
    # No forced broadcast hint: the distinct-ngram table is usually tiny,
    # but a large multilingual KB (CJK trigrams) can push it to millions
    # of keys — let AQE pick broadcast vs shuffled join from the MEASURED
    # size instead of bypassing the autoBroadcastJoinThreshold check.
    postings = per_name.join(df_tbl, ["type", "ngram"]).withColumn(
        "idf", F.log1p(F.lit(float(num_unique)) / F.col("df_cnt"))
    )
    return postings, num_unique


def ngram_candidates(
    chains: DataFrame,
    postings: DataFrame,
    name_col: str = "name",
    ngram_size: int = 4,
    limit: int = 25,
    max_df: int | None = None,
    source: str = "ngram",
    broadcast_postings: bool = False,
) -> DataFrame:
    """B3 query (NgramMemoryNameIndex.find, kb.py:219-242), set-oriented:

    explode query n-grams -> join postings on (type, ngram) ->
    mass = sum(q_cnt * n_cnt * idf) per (query, name) ->
    keep mass > max(mass)/2 -> top `limit` by mass desc.

    `max_df` optionally skips ultra-hot n-grams (df_cnt above the cap) —
    the documented block-size bound for 100 TB runs; the reference has no
    such cap because it never meets web-scale key skew.

    `broadcast_postings`: the (type, ngram) key is intrinsically skewed
    (common ngrams post to many names) — a shuffle join on it serializes
    into the hot-key partitions. When the postings table fits in memory
    (pruned KB, or per-bucket postings at full scale), broadcasting it
    turns the retrieval into a map-side hash join: the probe side never
    shuffles on the skewed key and the only shuffle left is the uniform
    per-query aggregation. This is the scale-path default for KBs that
    passed the reference's load filters (~10M entities prune to far
    less, io.py:511-513).
    """
    probe_names = (
        chains.select("type", F.col(name_col).alias("qname"))
        .where(F.col(name_col).isNotNull())
        .distinct()
    )
    qgrams = (
        probe_names.select(
            "type",
            "qname",
            F.explode(
                char_ngrams(format_ngram_name(F.col("qname")), ngram_size)
            ).alias("ngram"),
        )
        .groupBy("type", "qname", "ngram")
        .agg(F.count("*").alias("q_cnt"))
    )
    post = postings
    if max_df is not None:
        post = post.where(F.col("df_cnt") <= max_df)
    if broadcast_postings:
        post = F.broadcast(post)
    scored = (
        qgrams.join(post, ["type", "ngram"])
        .groupBy("type", "qname", "entity_id", "name_idx")
        .agg(F.sum(F.col("q_cnt") * F.col("n_cnt") * F.col("idf")).alias("mass"))
    )
    wq = Window.partitionBy("type", "qname")
    thresholded = scored.withColumn("max_mass", F.max("mass").over(wq)).where(
        F.col("mass") > F.col("max_mass") / 2
    )
    wrank = wq.orderBy(F.desc("mass"), "entity_id", "name_idx")
    top_names = (
        thresholded.withColumn("rk", F.row_number().over(wrank))
        .where(F.col("rk") <= limit)
    )
    # name_id -> entity hydration dedupes by entity keeping best rank
    # (kb.py:242 + CombiningGenerator id-dedup, candidates.py:112-118)
    top_entities = top_names.groupBy("type", "qname", "entity_id").agg(
        F.min("rk").alias("retrieval_rank")
    )
    return (
        chains.select("doc_id", "chain_id", "type", F.col(name_col).alias("qname"))
        .where(F.col(name_col).isNotNull())
        .join(top_entities, ["type", "qname"])
        .select("doc_id", "chain_id", "entity_id", "retrieval_rank")
        .withColumn("source", F.lit(source))
    )


def phonetic_candidates(
    chains: DataFrame,
    kb_names: DataFrame,
    name_col: str = "name",
    key: str = "soundex",
    limit: int = 25,
    source: str | None = None,
) -> DataFrame:
    """Phonetic blocking (north_rule): equi-join on Soundex (native),
    metaphone (Arrow UDF), or double_metaphone (Arrow UDF; both readings
    exploded, so a probe links through EITHER the anglicized or the
    continental key) of the name, within type. Deterministic top-k per
    chain by entity_id."""
    if key == "soundex":
        keyfn = lambda c: F.array(soundex_key(c))  # noqa: E731
    elif key == "metaphone":
        keyfn = lambda c: F.array(metaphone_udf(c))  # noqa: E731
    elif key == "double_metaphone":
        from hamerkop_spark.functions.phonetic import double_metaphone_udf

        keyfn = double_metaphone_udf
    else:
        raise ValueError(f"unknown phonetic key: {key}")
    probe = (
        chains.select("doc_id", "chain_id", "type", F.col(name_col).alias("qname"))
        .where(F.col(name_col).isNotNull())
        .select(
            "doc_id", "chain_id", "type", "qname",
            F.explode(keyfn(F.col("qname"))).alias("pkey"),
        )
        .where(F.col("pkey").isNotNull() & (F.col("pkey") != ""))
    )
    build = (
        kb_names.select(
            "type", "entity_id",
            F.explode(keyfn(F.col("name"))).alias("pkey"),
        )
        .where(F.col("pkey").isNotNull() & (F.col("pkey") != ""))
        .select("type", "pkey", "entity_id")
        .distinct()
    )
    hits = probe.join(build, ["type", "pkey"]).select(
        "doc_id", "chain_id", "entity_id"
    ).distinct()
    w = Window.partitionBy("doc_id", "chain_id").orderBy("entity_id")
    return (
        hits.withColumn("retrieval_rank", F.row_number().over(w))
        .where(F.col("retrieval_rank") <= limit)
        .withColumn("source", F.lit(source or f"phonetic_{key}"))
    )


PERM_MOD = 1 << 32


def perm_coeffs(s: int) -> tuple[int, int]:
    """Deterministic universal-hash coefficients for permutation `s`.
    Shared by the Spark operators and the generated DuckDB oracle SQL so
    the two cannot drift. The multiplier is ODD, so x -> (a*x + b) mod
    2^32 is a bijection of the 32-bit base-hash domain that wraps ~2^30
    times — proper mixing. (A modulus much larger than a*max(h0), e.g.
    2^61-1, would wrap only a handful of times, leaving the 'permutation'
    piecewise-monotone in h0 and the minima of all num_hashes functions
    correlated — inflating LSH false-positive bands.) 31-bit a times a
    32-bit h0 stays under 2^63: no BIGINT overflow in either engine."""
    a = ((0x9E3779B1 * (s + 1)) & 0x7FFFFFFF) | 1
    b = (0x85EBCA77 * (s + 1)) & 0x7FFFFFFF
    return a, b


def md5_base32(col) -> Column:
    """32-bit base hash from the md5 hex digest — one digest per element,
    identical in DuckDB as ('0x' || substr(md5(e), 1, 8))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def seeded_hash64(col, seed: int, hash_fn: str = "xxhash64"):
    """Seeded 64-bit element hash. 'xxhash64' is the fast JVM default;
    'md5' derives 60 bits from the md5 hex digest — slower, but DuckDB
    computes the identical value (('0x' || substr(md5(..), 1, 15))::BIGINT),
    which makes every minhash/simhash query oracle-checkable."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    if hash_fn == "md5":
        return F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), col)), 1, 15),
            16,
            10,
        ).cast("bigint")
    raise ValueError(f"unknown hash_fn: {hash_fn}")


def minhash_signature(
    df: DataFrame,
    id_cols: Sequence[str],
    set_col: str,
    num_hashes: int = 32,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash signatures, fully native and shuffle-lean: one row per set
    element (not element x hash — a k-way posexplode would multiply the
    shuffle volume k times), `num_hashes` seeded hash values as
    separate `min` aggregates so map-side partial aggregation reduces
    each partition to one row per id before the shuffle.

    Output: (id_cols..., sig: array<bigint>) with sig[i] = min over
    elements of seeded_hash64(elem, i+1).

    hash_fn='md5perm' hashes each element ONCE (md5 -> 32-bit base) and
    derives the num_hashes values as universal-hash permutations
    (a_s * h0 + b_s) mod 2^32 with odd a_s (see perm_coeffs for why the
    modulus must NOT exceed a*max(h0)) — native integer arithmetic, so
    the oracle-checkable variant costs one digest per element instead of
    num_hashes digests."""
    # NO .distinct() on the exploded rows: duplicate elements cannot
    # change a min, and distinct would cost a full (id, elem) shuffle
    # BEFORE the aggregation — the partial agg then reduces each
    # partition to one row per id anyway, so the only shuffle left is
    # the tiny one-row-per-id exchange
    # The per-seed aggregate expressions are built as F.expr SQL
    # strings, ONE py4j round-trip each, not Column-operator chains: a
    # Python loop of Column ops costs ~4 py4j round-trips per operator
    # (~0.3 s of driver wall per invocation at num_hashes=32, measured
    # in the bench construct split). The parsed trees are the same
    # expressions — int literals below 2^31 parse as INT exactly like
    # F.lit, the 2^32-1 mask parses as BIGINT — so plans and values
    # are bit-identical.
    elems = df.select(*id_cols, F.explode(set_col).alias("elem"))
    if hash_fn == "md5perm":
        elems = elems.withColumn("_h0", md5_base32(F.col("elem")))
        # r6: & (2^32-1) == % 2^32 exactly for the non-negative
        # a*h0+b (< 2^62); the AND is cheaper in the 32-expression
        # per-element hot loop and values are bit-identical, so the
        # md5perm oracle SQL (which keeps %) stays green
        mins = [
            F.expr(f"min(({a} * _h0 + {b}) & {PERM_MOD - 1}) AS _mh{s}")
            for s, (a, b) in ((s, perm_coeffs(s)) for s in range(num_hashes))
        ]
    elif hash_fn == "xxhash64":
        mins = [
            F.expr(f"min(xxhash64(elem, {s + 1})) AS _mh{s}")
            for s in range(num_hashes)
        ]
    else:
        mins = [
            F.min(seeded_hash64(F.col("elem"), s + 1, hash_fn)).alias(f"_mh{s}")
            for s in range(num_hashes)
        ]
    agg = elems.groupBy(*id_cols).agg(*mins)
    sig = F.expr(
        "array(" + ", ".join(f"_mh{s}" for s in range(num_hashes)) + ")"
    )
    return agg.select(*id_cols, sig.alias("sig"))


def minhash_bands(
    signatures: DataFrame,
    id_cols: Sequence[str],
    num_bands: int = 8,
    rows_per_band: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """LSH banding: hash each band's signature slice to a bucket key.
    Narrow transform (posexplode of num_bands per row, no shuffle).
    Output: (id_cols..., band, bucket)."""
    # single F.expr for the whole band array (one py4j round-trip; the
    # parsed tree matches the former Column-built one, only the lambda
    # variable NAME differs, which resolution renames anyway)
    def bucket_of(b):
        joined = (
            "array_join(transform(slice(sig, "
            f"{b * rows_per_band + 1}, {rows_per_band}), "
            "v -> cast(v as string)), ',')"
        )
        if hash_fn == "xxhash64":
            return f"xxhash64({joined})"
        return f"md5({joined})"  # md5 and md5perm band identically

    bands = F.expr(
        "array(" + ", ".join(bucket_of(b) for b in range(num_bands)) + ")"
    )
    return signatures.select(
        *id_cols, F.posexplode(bands).alias("band", "bucket")
    )


def minhash_lsh_candidates(
    chains: DataFrame,
    kb_names: DataFrame,
    name_col: str = "name",
    ngram_size: int = 4,
    num_hashes: int = 32,
    num_bands: int = 8,
    limit: int = 25,
    source: str = "minhash_lsh",
) -> DataFrame:
    """MinHash-LSH blocking over char-n-gram sets of formatted names: two
    names land in the same bucket for some band iff their n-gram Jaccard
    is likely high. Pure native (xxhash64 + groupBy min + band join)."""
    rows_per_band = num_hashes // num_bands
    probe_names = (
        chains.select("type", F.col(name_col).alias("qname"))
        .where(F.col(name_col).isNotNull())
        .distinct()
        .withColumn(
            "grams",
            F.array_distinct(
                char_ngrams(format_ngram_name(F.col("qname")), ngram_size)
            ),
        )
        # no size(grams)>0 filter: minhash_signature's explode drops
        # empty/null gram sets for free; a filter here would be pushed
        # into the pre-project stage and re-evaluate char_ngrams per row
    )
    build_names = (
        kb_names.select("type", "entity_id", "name")
        .distinct()
        .withColumn(
            "grams",
            F.array_distinct(
                char_ngrams(format_ngram_name(F.col("name")), ngram_size)
            ),
        )
        # same: explode-in-signature is the filter
    )
    psig = minhash_signature(probe_names, ["type", "qname"], "grams", num_hashes)
    bsig = minhash_signature(
        build_names, ["type", "entity_id", "name"], "grams", num_hashes
    )
    pband = minhash_bands(psig, ["type", "qname"], num_bands, rows_per_band)
    bband = minhash_bands(
        bsig, ["type", "entity_id", "name"], num_bands, rows_per_band
    )
    hits = (
        pband.join(bband, ["type", "band", "bucket"])
        .select("type", "qname", "entity_id")
        .distinct()
    )
    out = (
        chains.select("doc_id", "chain_id", "type", F.col(name_col).alias("qname"))
        .where(F.col(name_col).isNotNull())
        .join(hits, ["type", "qname"])
        .select("doc_id", "chain_id", "entity_id")
        .distinct()
    )
    w = Window.partitionBy("doc_id", "chain_id").orderBy("entity_id")
    return (
        out.withColumn("retrieval_rank", F.row_number().over(w))
        .where(F.col("retrieval_rank") <= limit)
        .withColumn("source", F.lit(source))
    )


def combine_candidates(*candidate_sets: DataFrame) -> DataFrame:
    """B7 CombiningGenerator (candidates.py:102-118): union all, dedupe by
    (chain, entity) keeping the earliest (source order, rank)."""
    if not candidate_sets:
        raise ValueError("combine_candidates: no candidate sets given")
    union = None
    for i, cs in enumerate(candidate_sets):
        cs = cs.withColumn("source_rank", F.lit(i))
        union = cs if i == 0 else union.unionByName(cs)
    best = union.groupBy("doc_id", "chain_id", "entity_id").agg(
        F.min(F.struct("source_rank", "retrieval_rank", "source")).alias("best")
    )
    return best.select(
        "doc_id",
        "chain_id",
        "entity_id",
        F.col("best.source").alias("source"),
        F.col("best.source_rank").alias("source_rank"),
        F.col("best.retrieval_rank").alias("retrieval_rank"),
    )


def cascade_candidates(
    candidate_sets: Sequence[DataFrame], num_candidates: int = 25
) -> DataFrame:
    """B8 CascadeGenerator (candidates.py:121-141): take generators in
    priority order; a chain stops accepting new sources once the distinct
    candidate count from earlier sources reaches `num_candidates`.

    Set-oriented replication: a source s contributes to a chain iff the
    cumulative distinct-entity count from sources < s is below the
    threshold (the reference checks AFTER adding each generator, so the
    generator that crosses the line is still fully included)."""
    if not candidate_sets:
        raise ValueError("cascade_candidates: no candidate sets given")
    union = None
    for i, cs in enumerate(candidate_sets):
        cs = cs.withColumn("source_rank", F.lit(i))
        union = cs if union is None else union.unionByName(cs)
    dedup = union.groupBy("doc_id", "chain_id", "entity_id").agg(
        F.min(F.struct("source_rank", "retrieval_rank", "source")).alias("best")
    )
    flat = dedup.select(
        "doc_id",
        "chain_id",
        "entity_id",
        F.col("best.source_rank").alias("source_rank"),
        F.col("best.retrieval_rank").alias("retrieval_rank"),
        F.col("best.source").alias("source"),
    )
    w = Window.partitionBy("doc_id", "chain_id").orderBy("source_rank")
    counts = flat.groupBy("doc_id", "chain_id", "source_rank").agg(
        F.count("*").alias("cnt")
    )
    cum = counts.withColumn(
        "prior",
        F.coalesce(
            F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).where(F.col("prior") < num_candidates)
    return flat.join(
        cum.select("doc_id", "chain_id", "source_rank"),
        ["doc_id", "chain_id", "source_rank"],
    )
