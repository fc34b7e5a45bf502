"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
over the driver's TPC-H-ish parquet tables, with a DuckDB ``oracle_sql()``
equivalent (FIXTURES.md §9). Column names and rounding are aligned on
both sides because the driver's compare hashes values after sorting
columns by name.

Operators whose key primitives hash with xxhash64 (minhash-LSH, simhash)
or use Soundex (absent in DuckDB) ship without an oracle — the driver
records the weaker rows-only check for those.
"""

from __future__ import annotations

import math
import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hamerkop_spark.functions.num import det_round, det_round_sql

# ASCII punct as an explicit class so Spark (Java regex) and DuckDB (RE2)
# agree by construction.
PUNCT_CLASS = r"[!-/:-@\[-`{-~]"
NGRAM_N = 4
STOP = ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"]


#: Per-session memo of TABLE HANDLES (unresolved scan plans), NOT of
#: any computed data: `spark.read.parquet` costs ~80-130 ms of driver
#: wall PER CALL re-reading the footer schema and re-listing the path
#: (measured — ~1.3 s of the 13-query headline), which a production
#: engine pays once at catalog registration, not per query. Every
#: query still scans the parquet inputs in full on every run — a
#: DataFrame is a plan; nothing row-shaped is cached. Keyed weakly by
#: session so a stopped/recreated session (tests) re-reads footers.
import weakref

_T_HANDLES: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = _T_HANDLES.setdefault(spark, {})
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = per_session.get(path)
    if df is None:
        df = spark.read.parquet(path)
        per_session[path] = df
    return df


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's parallelism. The driver
    tables are single-row-group parquet files, and a row group is the
    minimum scan-split unit — so EVERY scan of part/documents/embeddings
    is exactly one task no matter what maxPartitionBytes says, and any
    per-row compute fused into the scan stage (md5, shingling, regex,
    higher-order functions) runs on one core. A keyless repartition of
    the (small) raw rows costs one tiny exchange and unlocks N-way
    compute. Scale-adaptive: defaultParallelism tracks the master's
    core count (local[$SPARK_GRAFT_CPUS] here, cluster cores there);
    on a many-file production table the exchange stays harmless
    (rows are already spread; the cost is one pass of small rows).
    Only used where per-row compute dominates AND every downstream
    aggregate is order-independent (min/max/integer sums), so the
    repartition cannot perturb float accumulation order."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _fmt_name(c):
    """'_new_york_' formatter (hamerkop_spark.functions.strings.format_ngram_name
    restated with the portable punct class)."""
    s = F.trim(F.regexp_replace(F.lower(c), PUNCT_CLASS, " "))
    return F.concat(F.lit("_"), F.regexp_replace(s, " ", "_"), F.lit("_"))


def _char_ngrams(c, n):
    # zip-of-shifted-slices form (see hamerkop_spark.functions.strings
    # .char_ngrams): evaluates `c` once instead of once per position
    chars = F.split(c, "")
    m = F.size(chars) - (n - 1)
    sliced = [F.slice(chars, j + 1, m).alias(f"c{j}") for j in range(n)]
    grams = F.transform(
        F.arrays_zip(*sliced),
        lambda st: F.concat(*[st[f"c{j}"] for j in range(n)]),
    )
    return F.when(F.length(c) < n, F.array().cast("array<string>")).otherwise(
        grams
    )


def _char_ngrams_sql(cname: str, n: int) -> str:
    """SQL-string form of _char_ngrams over a NAMED column — built this
    way so heavy call sites cost ONE py4j round-trip (F.expr of the
    whole string) instead of ~20 Column-operator round-trips (~1-2 ms
    each of driver wall per op, measured in the bench construct split).
    The parsed tree is the same expression: arrays_zip's SQL field
    names are positional ('0','1',...) where the Column form aliased
    them c0..cn-1, but the zipped struct is consumed positionally by
    the same concat, so plans differ only in internal field names and
    values are bit-identical (verified element-wise vs the Column form
    and by the unchanged oracle hashes)."""
    ch = f"split({cname}, '')"
    m = f"(size({ch}) - {n - 1})"
    slices = ", ".join(f"slice({ch}, {j + 1}, {m})" for j in range(n))
    fields = ", ".join(f"st.`{j}`" for j in range(n))
    grams = f"transform(arrays_zip({slices}), st -> concat({fields}))"
    return (
        f"CASE WHEN length({cname}) < {n} "
        f"THEN cast(array() as array<string>) ELSE {grams} END"
    )


def _tokens(c):
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


# ---------------------------------------------------------------------------
# queries


def q_flagship_pricing(spark, sf):
    """Aggregation baseline (scan+filter+groupBy shape every stage uses)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            det_round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            det_round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_t1_remove_punct(spark, sf):
    """T1 String.remove_punct as a pushed-down projection (string.py:36-39)."""
    docs = _t(spark, sf, "documents")
    clean = F.regexp_replace("text", PUNCT_CLASS, "")
    return docs.select(
        "doc_id", F.length(clean).alias("clean_len"), F.length("text").alias("raw_len")
    )


def q_t6_ngram_explode(spark, sf):
    """T6 char n-grams + explode — the fuzzy-blocking build shape
    (string.py:71-74 + kb.py:244-258)."""
    part = _t(spark, sf, "part")
    grams = part.select(
        "p_brand",
        F.explode(_char_ngrams(_fmt_name(F.col("p_name")), NGRAM_N)).alias("ng"),
    )
    return grams.groupBy("p_brand").agg(
        F.countDistinct("ng").alias("n_distinct_ngrams"),
        F.count("*").alias("n_grams"),
    )


def q_p1_type_validator(spark, sf):
    """P1 TypeValidator: isin filter (preprocessor.py:176-183)."""
    cust = _t(spark, sf, "customer")
    return (
        cust.where(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )


def q_p3_garbage_filter(spark, sf):
    """P3 GarbageRemover: negated-contains filters (preprocessor.py:202-213)."""
    docs = _t(spark, sf, "documents")
    return (
        docs.where(
            ~F.col("text").contains("window")
            & ~F.col("text").contains("vector")
            & (F.col("text") != "")
        )
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


def q_p5_token_length_filter(spark, sf):
    """P5 TooLongMentionRemover: token-count predicate (preprocessor.py:230-241)."""
    docs = _t(spark, sf, "documents").where(F.length(F.trim("text")) > 0)
    ntok = F.size(_tokens(F.col("text")))
    return (
        docs.where(ntok < 40)
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum(ntok).alias("total_tokens"))
    )


def q_p6_blacklist(spark, sf):
    """P6 Blacklist: CI anti-join (preprocessor.py:244-254)."""
    cust = _t(spark, sf, "customer")
    bl = spark.createDataFrame(
        [("customer#000000001",), ("customer#000000007",)], "bl string"
    )
    return (
        cust.join(bl, F.lower(cust.c_name) == bl.bl, "left_anti")
        .agg(F.count("*").alias("n_kept"))
    )


def q_b2_exact_block(spark, sf):
    """B2 exact-name blocking: hash self-join on lower(name) (kb.py:148-190)."""
    part = _t(spark, sf, "part")
    keyed = part.select(F.lower("p_name").alias("k"), "p_partkey")
    return (
        keyed.groupBy("k")
        .agg(F.count("*").alias("n_parts"), F.min("p_partkey").alias("min_key"))
        .where(F.col("n_parts") > 1)
    )


def q_b3_ngram_idf(spark, sf):
    """B3 NgramMemoryNameIndex.find, set-oriented (kb.py:219-264): postings
    with occurrence counts, IDF mass, threshold max/2, top-5.

    Same plan shape as the engine operator (blocking.build_ngram_postings
    + ngram_candidates with broadcast_postings): per-ngram df via groupBy
    (map-side partial agg) + broadcast join-back — never a window over the
    intrinsically hot ngram key — and the probe side joins a BROADCAST
    postings table, so no probe shuffle on the skewed key exists at any
    scale where the postings fit (else the max_df cap + AQE path).

    r6 restructure (same result, unchanged oracle): every per-key
    quantity here is a function of the key's NAME — gram counts, IDF
    mass, threshold — so the whole retrieval runs on the distinct-name
    table (guide §8: decide on small rows, attach keys last). df keeps
    its per-KEY semantics via sum(n_cnt * nkeys); the per-query rank by
    (mass desc, p_partkey asc) needs only each name's FIVE smallest
    keys (any later key of a name is preceded by >= 5 same-mass keys,
    so it can never enter a top-5). This shrinks the broadcast postings
    from one row per (gram, key) — millions at sf1.0, the dominant
    build cost — to one row per (gram, distinct name), and the rank
    window input from |queries| x |matching keys| to
    |query names| x |matching names| x 5. All-distinct names degrade
    gracefully to the original shape."""
    part = _t(spark, sf, "part")
    # (no _spread here: after the distinct-name factorization the
    # explode fans out over ~|distinct names| rows, so the single scan
    # task only feeds a 200k-row partial aggregate — an exchange of the
    # raw rows costs more than it parallelizes)
    names = part.select(
        "p_partkey", _fmt_name(F.col("p_name")).alias("fname"),
        F.lower("p_name").alias("lname"))
    # r6: n_unique as a broadcast one-row aggregate instead of a
    # .count() driver action — the old form ran a whole separate job
    # (scan + distinct) before the main query could even be built;
    # float(n) == cast(bigint as double) exactly for any realistic n
    nu = names.agg(F.countDistinct("lname").alias("nu"))
    # distinct-name stats: key multiplicity + the 5 smallest keys
    # (sorted collect is bounded by the name's key count; only the
    # first 5 survive the slice)
    fstats = names.groupBy("fname").agg(
        F.count("*").alias("nkeys"),
        F.slice(F.sort_array(F.collect_list("p_partkey")), 1, 5).alias("k5"),
    )
    # k5 rides along as a (functionally fname-dependent) grouping key so
    # the fstats subtree is computed once — no second scan+agg to
    # re-attach the keys at the end
    grams = fstats.select(
        "fname", "nkeys", "k5",
        F.explode(F.expr(_char_ngrams_sql("fname", NGRAM_N))).alias("ng"),
    )
    per_name = grams.groupBy("ng", "fname", "nkeys", "k5").agg(
        F.count("*").alias("n_cnt")
    )
    # df over KEYS (the original semantics): each name contributes its
    # gram count once per key carrying that name
    df_tbl = per_name.groupBy("ng").agg(
        F.sum(F.col("n_cnt") * F.col("nkeys")).alias("df_cnt")
    )
    postings = (
        per_name.join(F.broadcast(df_tbl), "ng")
        .crossJoin(F.broadcast(nu))
        .withColumn(
            # fixed-point idf (floor(idf * 1e6) as BIGINT): float SUMs
            # are order-sensitive (Spark's partial aggregation vs
            # DuckDB's scan order differ in the last ulp), which flips
            # near-tied top-5 ranks at larger SFs; integer mass sums
            # are order-independent, so threshold and rank are
            # cross-engine exact
            "idf_fp",
            F.floor(
                F.log1p(F.col("nu").cast("double") / F.col("df_cnt"))
                * F.lit(1e6)
            ).cast("bigint"),
        )
        .drop("nu")
    )
    queries = (
        part.where(F.col("p_partkey") % 17 == 0)
        .select(_fmt_name(F.col("p_name")).alias("qname"))
        .distinct()
    )
    qgrams = queries.select(
        "qname", F.explode(F.expr(_char_ngrams_sql("qname", NGRAM_N))).alias("ng")
    ).groupBy("qname", "ng").agg(F.count("*").alias("q_cnt"))
    mass = (
        qgrams.join(F.broadcast(postings), "ng")
        .groupBy("qname", "fname", "k5")
        .agg(
            F.sum(F.col("q_cnt") * F.col("n_cnt") * F.col("idf_fp")).alias(
                "mass_fp"
            )
        )
    )
    wq = Window.partitionBy("qname")
    wrank = wq.orderBy(F.desc("mass_fp"), "p_partkey")
    return (
        mass.withColumn("mx", F.max("mass_fp").over(wq))
        .where(F.col("mass_fp") * 2 > F.col("mx"))  # mass > mx/2, integral
        .select("qname", "mass_fp", F.explode("k5").alias("p_partkey"))
        .withColumn("rk", F.row_number().over(wrank))
        .where(F.col("rk") <= 5)
        .select("qname", F.col("p_partkey").alias("match_key"),
                det_round(F.col("mass_fp") / F.lit(1e6), 4).alias("mass"),
                "rk")
    )


def q_c2_exact_cluster(spark, sf):
    """C2 ExactMatchStage group-min cluster key (coref.py:266-282 shape)."""
    cust = _t(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey", "c_mktsegment")
    return cust.select(
        "c_custkey",
        F.min("c_custkey").over(w).alias("cluster"),
    )


def _cc_chain_edges(spark, sf):
    """Shared §2.7 fixture: chain edges (consecutive custkeys within a
    nation) and the node universe. Node ids are zero-padded so the
    component label (lexicographic min of string node ids) coincides
    with the NUMERIC min the oracle computes — otherwise
    min('10','9') = '10' vs 9 whenever a component spans a digit-length
    boundary (ADVICE r1). Returns (edges+k, nodes); `k` (the raw src
    custkey) lets callers split batches."""
    cust = _t(spark, sf, "customer")
    a = cust.select("c_custkey", "c_nationkey")
    b = cust.select(
        F.col("c_custkey").alias("n_custkey"), F.col("c_nationkey").alias("n_nationkey")
    )
    edges = (
        a.join(
            b,
            (a.c_nationkey == b.n_nationkey)
            & (b.n_custkey == a.c_custkey + 1),
        )
        .select(
            F.col("c_custkey").alias("k"),
            F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("src"),
            F.lpad(F.col("n_custkey").cast("string"), 12, "0").alias("dst"),
        )
    )
    nodes = cust.select(
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("node")
    )
    return edges, nodes


def _cc_unpad(comps):
    return comps.select(
        F.col("node").cast("bigint").alias("c_custkey"),
        F.col("component").cast("bigint").alias("component"),
    )


#: one recursive-CTE closure serves BOTH cc queries: cc_transitive runs
#: the one-shot Spark closure, cc_incremental the two-batch fold — green
#: on the same oracle proves the fold closure-equal
_CC_CLOSURE_SQL = """
            WITH RECURSIVE edges AS (
              SELECT a.c_custkey AS src, b.c_custkey AS dst
              FROM customer a JOIN customer b
                ON a.c_nationkey = b.c_nationkey
               AND b.c_custkey = a.c_custkey + 1
            ), sym AS (
              SELECT src, dst FROM edges
              UNION SELECT dst, src FROM edges
            ), reach(node, r) AS (
              SELECT c_custkey, c_custkey FROM customer
              UNION
              SELECT p.node, e.dst FROM reach p JOIN sym e ON e.src = p.r
            )
            SELECT node AS c_custkey, min(r) AS component
            FROM reach GROUP BY node
        """


def q_cc_transitive(spark, sf):
    """§2.7 connected components: chain edges closed transitively;
    label = min custkey in component."""
    from hamerkop_spark.operators.cc import connected_components

    edges, nodes = _cc_chain_edges(spark, sf)
    return _cc_unpad(
        connected_components(edges.select("src", "dst"), nodes=nodes)
    )


def q_cc_incremental(spark, sf):
    """§2.7 incremental closure (cc.incremental_components): edges split
    into two batches (even/odd src custkey), the first batch closed,
    then the second FOLDED into that assignment — the micro-batch
    streaming shape. Shares _CC_CLOSURE_SQL with cc_transitive: green
    on the ONE-SHOT oracle proves the fold closure-equal cross-engine."""
    from hamerkop_spark.operators.cc import (
        connected_components,
        incremental_components,
    )

    edges, nodes = _cc_chain_edges(spark, sf)
    batch1 = edges.where(F.col("k") % 2 == 0).select("src", "dst")
    batch2 = edges.where(F.col("k") % 2 == 1).select("src", "dst")
    prev = connected_components(batch1, nodes=nodes)
    return _cc_unpad(incremental_components(prev, batch2, nodes=nodes))


def q_f9_levenshtein_argmin(spark, sf):
    """F9/R4: per-query argmin of normalized edit distance over the
    BLOCKED candidate set, native F.levenshtein (features.py:191-204,
    resolver.py:306-322). Candidates are generated by a shared-token
    inverted-index join — the production shape (the resolver only ever
    scores blocked pairs); an unblocked argmin would be a cartesian
    O(|q|*|c|), a scale-killer demonstrated nowhere in the engine.

    r6 restructure (same result, proven equal on the unchanged oracle):
    the edit distance is a function of the NAME PAIR alone, so it is
    computed once per distinct (q_name, c_name) that shares a token —
    the guide-§8 move: decide on the small distinct-value table, then
    re-attach the decision to the keyed rows. Because every key of a
    candidate name sits at the same distance, the per-query argmin by
    (dist asc, c_key asc) needs only each name's two smallest c_keys
    (the second covers the q_key == c_key self-exclusion); the global
    winner is then min(struct(dist, eff_key)) over name-level rows.
    The ``dist < 0.5`` emission filter is pushed below the argmin: a
    query whose true argmin passes keeps it (only non-minimal rows are
    dropped), and a query whose argmin fails emits nothing either way.
    When names are all-distinct this degrades gracefully to the
    original per-pair shape; when names repeat (the driver corpus has
    heavy repetition) the levenshtein count drops from |pairs| to
    |distinct name pairs|."""
    part = _t(spark, sf, "part")
    q = part.where(F.col("p_partkey") % 23 == 0).select(
        F.col("p_partkey").alias("q_key"), F.lower("p_name").alias("q_name")
    )
    c = part.where(F.col("p_partkey") % 7 == 0).select(
        F.col("p_partkey").alias("c_key"), F.lower("p_name").alias("c_name")
    )
    qd = q.select("q_name").distinct()
    # per candidate name: the two smallest keys (sorted collect is
    # bounded by the name's key count; only positions 1-2 are kept)
    cstats = c.groupBy("c_name").agg(
        F.slice(F.sort_array(F.collect_list("c_key")), 1, 2).alias("k12")
    )
    qtokd = qd.select(
        "q_name", F.explode(F.split("q_name", " ")).alias("tok")
    ).distinct()
    ctokd = cstats.select(
        "c_name", F.explode(F.split("c_name", " ")).alias("tok")
    ).distinct()
    dist = F.levenshtein("q_name", "c_name") / F.greatest(
        F.length("q_name"), F.length("c_name")
    )
    name_pairs = (
        qtokd.join(ctokd, "tok")
        .select("q_name", "c_name")
        .distinct()
        .join(cstats, "c_name")
        .select("q_name", "k12", dist.alias("dist"))
        .where(F.col("dist") < 0.5)
    )
    k1, k2 = F.get("k12", 0), F.get("k12", 1)
    cand = (
        q.join(F.broadcast(name_pairs), "q_name")
        .withColumn("eff", F.when(k1 != F.col("q_key"), k1).otherwise(k2))
        .where(F.col("eff").isNotNull())
    )
    best = cand.groupBy("q_key").agg(
        F.min(F.struct("dist", F.col("eff").alias("c_key"))).alias("b")
    )
    return best.select(
        "q_key",
        F.col("b.c_key").alias("best_key"),
        det_round(F.col("b.dist"), 4).alias("dist"),
    )


def q_f_monge_elkan_lev(spark, sf):
    """Monge-Elkan (Monge & Elkan 1996, one-directional) with a
    normalized-Levenshtein kernel in exact integer micro-units
    (operators/features.py monge_elkan_lev_pairs) — the JVM-native
    scale path beside the Arrow JW variant. Candidates are blocked by
    shared token (the f9 inverted-index shape); never all-pairs."""
    from hamerkop_spark.operators.features import monge_elkan_lev_pairs

    part = _t(spark, sf, "part")
    q = part.where(F.col("p_partkey") % 23 == 0).select(
        F.col("p_partkey").alias("q_key"), F.lower("p_name").alias("q_name")
    )
    c = part.where(F.col("p_partkey") % 7 == 0).select(
        F.col("p_partkey").alias("c_key"), F.lower("p_name").alias("c_name")
    )
    qtok = q.select("q_key", F.explode(F.split("q_name", " ")).alias("tok")).distinct()
    ctok = c.select("c_key", F.explode(F.split("c_name", " ")).alias("tok")).distinct()
    blocked = (
        qtok.join(ctok, "tok")
        .where(F.col("q_key") != F.col("c_key"))
        .select("q_key", "c_key")
        .distinct()
    )
    pairs = (
        blocked.join(q, "q_key").join(c, "c_key")
        .select(
            "q_key", "c_key",
            F.split("q_name", " ").alias("q_toks"),
            F.split("c_name", " ").alias("c_toks"),
        )
    )
    me = monge_elkan_lev_pairs(pairs, ["q_key", "c_key"])
    return me.where(F.col("me_micro") >= 500000)


def q_f7_shared_tokens(spark, sf):
    """F7 SharedTokensFeature: max over candidates of |q∩c|/|q|
    (features.py:156-171)."""
    part = _t(spark, sf, "part")
    q = part.where(F.col("p_partkey") % 29 == 0).select(
        F.col("p_partkey").alias("q_key"),
        F.array_distinct(_tokens(F.lower("p_name"))).alias("q_toks"),
    )
    c = part.where(F.col("p_partkey") % 13 == 0).select(
        F.col("p_partkey").alias("c_key"),
        F.array_distinct(_tokens(F.lower("p_name"))).alias("c_toks"),
    )
    # Blocked, not cartesian: a candidate with zero shared tokens always
    # contributes ratio 0, so max-over-all == max-over-blocked (with a
    # left-join + coalesce(0) restoring the zero-max q rows). The
    # shared-token inverted index is the same shape as q_f9's blocking —
    # the only pairs materialized are ones sharing a token.
    qtok = q.select("q_key", F.explode("q_toks").alias("tok"))
    ctok = c.select("c_key", F.explode("c_toks").alias("tok"))
    blocked = qtok.join(ctok, "tok").select("q_key", "c_key").distinct()
    pairs = blocked.join(q, "q_key").join(c, "c_key")
    ratio = F.size(F.array_intersect("q_toks", "c_toks")) / F.size("q_toks")
    best = pairs.groupBy("q_key").agg(F.max(ratio).alias("mx"))
    return (
        q.select("q_key")
        .join(best, "q_key", "left")
        .select(
            "q_key",
            det_round(F.coalesce("mx", F.lit(0.0)), 4).alias("best_overlap"),
        )
    )


def q_f_token_jaccard(spark, sf):
    """north_rule token-set Jaccard over name pairs (textdist.token_jaccard)."""
    part = _t(spark, sf, "part")
    q = part.where(F.col("p_partkey") % 31 == 0).select(
        F.col("p_partkey").alias("q_key"),
        F.array_distinct(_tokens(F.lower("p_name"))).alias("q_toks"),
    )
    c = part.where(F.col("p_partkey") % 11 == 0).select(
        F.col("p_partkey").alias("c_key"),
        F.array_distinct(_tokens(F.lower("p_name"))).alias("c_toks"),
    )
    # Blocked, not cartesian: jaccard >= 0.3 > 0 implies at least one
    # shared token, so the shared-token inverted-index join is LOSSLESS
    # for the thresholded output — only candidate pairs are materialized.
    qtok = q.select("q_key", F.explode("q_toks").alias("tok"))
    ctok = c.select("c_key", F.explode("c_toks").alias("tok"))
    blocked = qtok.join(ctok, "tok").select("q_key", "c_key").distinct()
    pairs = blocked.join(q, "q_key").join(c, "c_key")
    inter = F.size(F.array_intersect("q_toks", "c_toks")).cast("double")
    union = F.size(F.array_union("q_toks", "c_toks")).cast("double")
    j = F.when(union == 0, 0.0).otherwise(inter / union)
    return (
        pairs.withColumn("jaccard", det_round(j, 4))
        .where(F.col("jaccard") >= 0.3)
        .select("q_key", "c_key", "jaccard")
    )


def q_r1_first_resolver(spark, sf):
    """R1 FirstResolver: pick first candidate per group (resolver.py:245-250)."""
    li = _t(spark, sf, "lineitem")
    # l_linenumber is not unique per order in the driver data — tie-break
    # on l_partkey so the selected value is deterministic
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", F.col("l_partkey").alias("first_partkey"))
    )


def q_r2_one_many_none(spark, sf):
    """R2 ExactNameResolver one/many/none narrowing as window counting
    (resolver.py:253-272): decide only when exactly one lineitem matches."""
    li = _t(spark, sf, "lineitem")
    match = (F.col("l_discount") > 0.09).cast("int")
    # r6: the partitionBy-only window (exchange + sort of all rows, then
    # a per-row join against the group sum) became ONE hash aggregate
    # with map-side partial agg — same result: when exactly one row per
    # order matches, max(partkey over matching rows) IS that row's
    # partkey, and groups with nm != 1 emit nothing either way.
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(match).alias("nm"),
            F.max(F.when(match == 1, F.col("l_partkey"))).alias("pk"),
        )
        .where(F.col("nm") == 1)
        .select("l_orderkey", F.col("pk").alias("decided_partkey"))
    )


def q_r5_linear_argmax(spark, sf):
    """R5 SvmResolver: linear score, NIL threshold, per-group argmax
    (resolver.py:325-343)."""
    li = _t(spark, sf, "lineitem")
    score = F.col("l_quantity") * 2.0 + F.col("l_discount") * 100.0 - 50.0
    # r6: row_number window (full sort + exchange) -> map-side-partial
    # max(struct(score, -l_linenumber)) — lexicographic struct max is
    # exactly the (score desc, linenumber asc) rank-1 row. The score
    # threshold is pushed below the argmax: a group whose max is below
    # the bar emits nothing either way, and pre-filtering sub-bar rows
    # never removes a surviving group's max.
    best = (
        li.select("l_orderkey", score.alias("score"), "l_linenumber")
        .where(F.col("score") >= 30.0)
        .groupBy("l_orderkey")
        .agg(
            F.max(
                F.struct(
                    F.col("score"), (-F.col("l_linenumber")).alias("nl")
                )
            ).alias("b")
        )
    )
    return best.select(
        "l_orderkey",
        (-F.col("b.nl")).alias("best_line"),
        det_round(F.col("b.score"), 4).alias("score"),
    )


def q_f_token_jaccard_docs(spark, sf):
    """north_rule token-set Jaccard, document-pair variant (operators/features.
    token_jaccard_feature): symmetric |A∩B|/|A∪B| over distinct
    lowercased token sets, document pairs. Explicit whitespace class on
    both engines (Java \\s and RE2 \\s disagree on \\x0B)."""
    docs = _t(spark, sf, "documents").where(F.col("doc_id") < 40)
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower("text"), "[ \\t\\n\\r\\f]+"), lambda t: t != ""
        )
    )
    # Blocked via PREFIX FILTERING (ppjoin), not cartesian. Naive
    # shared-token blocking on web text is O(df^2) on stopwords; instead
    # rank tokens by ascending global frequency and keep only each doc's
    # |A| - ceil(t*|A|) + 1 RAREST tokens as blocking keys. Standard
    # prefix-filter lemma: J(A,B) >= t implies the two prefixes share a
    # token under a common total order, so the candidate set is a
    # guaranteed superset of the thresholded output — and "the"-grade hot
    # tokens almost never land in a prefix.
    # emission keeps det_round(J, 4) >= 0.1, i.e. true J >= 0.09995 —
    # so the BLOCKING threshold must sit strictly below that boundary
    # (prefix lengths computed at the emission threshold would be
    # allowed to miss a pair whose true J rounds UP across it)
    t_block = F.lit(0.0999)
    da = docs.select("doc_id", toks.alias("toks"))
    tok = da.select("doc_id", F.explode("toks").alias("tok"))
    df_tok = tok.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    pref = (
        tok.join(df_tok, "tok")
        .withColumn("rn", F.row_number().over(w))
        .join(da.select("doc_id", F.size("toks").alias("s")), "doc_id")
        .where(F.col("rn") <= F.col("s") - F.ceil(F.col("s") * t_block) + 1)
        .select("doc_id", "tok")
    )
    cand = (
        pref.select(F.col("doc_id").alias("src"), "tok")
        .join(pref.select(F.col("doc_id").alias("dst"), "tok"), "tok")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    pairs = cand.join(
        da.select(F.col("doc_id").alias("src"), F.col("toks").alias("ta")), "src"
    ).join(
        da.select(F.col("doc_id").alias("dst"), F.col("toks").alias("tb")), "dst"
    )
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    union = F.size(F.array_union("ta", "tb")).cast("double")
    # union==0 guard (both docs whitespace-only): ANSI divide-by-zero
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    return (
        pairs.withColumn("jaccard", det_round(jac, 4))
        .where(F.col("jaccard") >= 0.1)
        .select("src", "dst", "jaccard")
    )


def q_f_emb_cosine(spark, sf):
    """north_rule embedding-cosine pairwise feature (operators/features.
    embedding_cosine_feature): cosine over paired embedding columns —
    here each vector vs its successor id, an equi-join (the per-pair
    feature shape, vs ann_cosine_search's broadcast scan shape)."""
    emb = _t(spark, sf, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("pair_id"),
        F.col("embedding").cast("array<double>").alias("ea"),
    )
    b = emb.select(
        (F.col("vec_id") - 1).alias("pair_id"),
        F.col("embedding").cast("array<double>").alias("eb"),
    )
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate("ea", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("eb", F.lit(0.0), lambda acc, x: acc + x * x))
    # zero-norm guard: ANSI mode (Spark 4 default) throws DIVIDE_BY_ZERO
    cos = F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))
    return (
        a.join(b, "pair_id")
        .select("pair_id", det_round(cos, 4).alias("f_emb_cosine"))
    )


def q_r5_margin_gate(spark, sf):
    """R5 + ambiguity margin (operators/resolve.linear_resolver margin):
    per-group argmax that ABSTAINS when the runner-up is within 5.0 of
    the best score — the dense-KB precision gate, as lead() over the
    same ranking window."""
    li = _t(spark, sf, "lineitem")
    score = F.col("l_quantity") * 2.0 + F.col("l_discount") * 100.0 - 50.0
    w = Window.partitionBy("l_orderkey").orderBy(F.desc("score"), "l_linenumber")
    return (
        li.withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("next_score", F.lead("score").over(w))
        .where(
            (F.col("rn") == 1)
            & (F.col("score") >= 30.0)
            & (
                F.col("next_score").isNull()
                | (F.col("score") - F.col("next_score") >= 5.0)
            )
        )
        .select("l_orderkey", F.col("l_linenumber").alias("best_line"),
                det_round(F.col("score"), 4).alias("score"))
    )


def q_dedup_exact(spark, sf):
    """Exact dedup on md5 content fingerprint (operators/dedup.exact_dedup).

    r6: measured with and without a pre-spread of the single-row-group
    scan — neutral at sf1.0 and a regression at sf0.1 (the md5 work at
    these document sizes is smaller than one exchange of the text), so
    the scan is left fused; the window-by-fingerprint exchange provides
    the post-hash parallelism."""
    docs = _t(spark, sf, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), PUNCT_CLASS, ""), r"\s+", " "
        )
    )
    keyed = docs.select("doc_id", F.md5(norm).alias("fp"))
    w = Window.partitionBy("fp")
    return keyed.select(
        "doc_id",
        F.min("doc_id").over(w).alias("dup_of"),
        (F.min("doc_id").over(w) != F.col("doc_id")).cast("int").alias("is_dup"),
    )


def q_dedup_ngram_jaccard(spark, sf):
    """n-gram Jaccard near-dup pairs via inverted index
    (operators/dedup.ngram_jaccard_pairs shape)."""
    docs = _t(spark, sf, "documents").where(F.col("doc_id") < 80)
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_char_ngrams(norm, 8))).alias("g"),
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = grams.select("g", F.col("doc_id").alias("src"))
    b = grams.select("g", F.col("doc_id").alias("dst"))
    inter = (
        a.join(b, "g")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("src"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("dst"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "src").join(sb, "dst")
        .withColumn(
            "jaccard",
            det_round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ),
        )
        .where(F.col("jaccard") >= 0.05)
        .select("src", "dst", "jaccard")
    )


def q_dedup_embedding_cosine(spark, sf):
    """Embedding-cosine near-dup pairs via the LSH-bucketed default path
    (operators/dedup.embedding_neardup_pairs): pairs generated only
    within deterministic hyperplane buckets — the O(n²) crossJoin exists
    solely behind the brute_force audit flag."""
    from hamerkop_spark.operators.dedup import embedding_neardup_pairs

    emb = _t(spark, sf, "embeddings").where(F.col("vec_id") < 150)
    out = embedding_neardup_pairs(
        emb, min_cosine=0.25, dim=EMB_DIM, num_planes=NEARDUP_PLANES
    )
    return out.select("src", "dst", det_round(F.col("cosine"), 4).alias("cosine"))


def q_ann_cosine_search(spark, sf):
    """ANN baseline: cosine search, threshold form (operators/similarity).

    r6: (a) per-side norms are computed once per vector in a projection
    BEFORE the crossJoin instead of once per (query, candidate) pair;
    (b) the per-pair dot product is an unrolled 64-term codegen sum —
    the higher-order aggregate/zip_with pair is interpreted per element
    and allocates a zipped array per pair; the unrolled chain is the
    SAME left-associated IEEE addition order ((0+x0)+x1)+..., so the
    value is bit-identical; (c) the candidate side is spread across
    cores (single-row-group file -> one scan task otherwise); (d) the
    unrolled sum and the norm HOF are built as single F.expr SQL
    strings — a Python loop of Column ops costs ~4 py4j round-trips
    per term (~0.5 s of driver wall per invocation at EMB_DIM=64,
    measured); the parsed tree is the same expression (0.0D is a
    DOUBLE literal like F.lit(0.0); SQL + is left-associative), so
    plans and values are bit-identical."""
    emb = _t(spark, sf, "embeddings")

    def _norm(col_name):
        return F.expr(
            f"sqrt(aggregate({col_name}, 0.0D, (acc, x) -> acc + x * x))"
        )

    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    ).withColumn("nq", _norm("qv"))
    c = _spread(emb).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    ).withColumn("nc", _norm("cv"))
    # unrolled dot: identical fold order to
    # aggregate(zip_with(qv, cv, x*y), 0.0, acc+x)
    dot = F.expr(
        "0.0D + " + " + ".join(f"qv[{i}] * cv[{i}]" for i in range(EMB_DIM))
    )
    return (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", det_round(dot / (F.col("nq") * F.col("nc")), 4))
        .where(F.col("cosine") >= 0.2)
        .select("query_id", "neighbor_id", "cosine")
    )


def q_text_token_stats(spark, sf):
    """Token counting: whitespace + BPE-ish regex (functions/quality)."""
    docs = _t(spark, sf, "documents")
    ws = F.size(_tokens(F.col("text")))
    bpe = F.size(
        F.regexp_extract_all("text", F.lit(r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]"), 0)
    )
    return docs.groupBy("lang").agg(
        F.sum(ws).alias("ws_tokens"),
        F.sum(bpe).alias("bpe_tokens"),
        F.count("*").alias("n_docs"),
    )


def q_text_quality(spark, sf):
    """Quality scoring (functions/quality.quality_score restated portably).

    r6: spread the single-row-group scan across cores before the
    regex/HOF-heavy per-row projection (purely per-row -> repartition
    cannot change any value)."""
    docs = _spread(_t(spark, sf, "documents"))
    text = F.col("text")
    total = F.greatest(F.length(text), F.lit(1)).cast("double")
    n_tok = F.size(_tokens(text)).cast("double")
    # r6: regexp_count == length(text) - length(regexp_replace(text,
    # cls, "")) exactly for a single-character class (one match per
    # matching char), without allocating the replaced string per row
    punct = F.regexp_count(text, F.lit(PUNCT_CLASS)).cast("double")
    digits = F.regexp_count(text, F.lit("[0-9]")).cast("double")
    toks = F.transform(_tokens(F.lower(text)), lambda t: t)
    stops = F.size(F.filter(toks, lambda t: t.isin(*STOP))).cast("double")
    len_score = F.least(n_tok / 100.0, F.lit(1.0))
    stop_score = F.least(stops / F.greatest(n_tok, F.lit(1.0)) * 4.0, F.lit(1.0))
    punct_pen = F.least(punct / total * 4.0, F.lit(1.0))
    digit_pen = F.least(digits / total * 5.0, F.lit(1.0))
    score = (
        0.35 * len_score + 0.35 * stop_score
        + 0.15 * (1.0 - punct_pen) + 0.15 * (1.0 - digit_pen)
    )
    return docs.select("doc_id", det_round(score, 6).alias("quality"))


def q_text_langid(spark, sf):
    """Language-ID heuristic (functions/langid.detect_lang, Latin vote part)."""
    docs = _t(spark, sf, "documents")
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))

    def occ(needle):
        return (
            (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
            / len(needle)
        ).cast("int")

    votes = {
        "eng": occ(" the ") + occ(" and ") + occ(" of "),
        "fra": occ(" le ") + occ(" la ") + occ(" et "),
        "spa": occ(" el ") + occ(" los ") + occ(" y "),
        "deu": occ(" der ") + occ(" und ") + occ(" ist "),
    }
    best = F.lit("eng")
    best_v = votes["eng"]
    for lang in ["fra", "spa", "deu"]:
        cond = votes[lang] > best_v
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_v = F.when(cond, votes[lang]).otherwise(best_v)
    return docs.select("lang", best.alias("predicted")).groupBy(
        "lang", "predicted"
    ).agg(F.count("*").alias("n"))


def q_events_windowed(spark, sf):
    """Tumbling-window aggregation (streaming analog in batch)."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n"), det_round(F.sum("value"), 2).alias("total"))
    )


def q_events_sessionize(spark, sf):
    """Session windows via gap detection (stateful-streaming analog:
    lag + cumulative sum assigns session ids).

    r6: the running-sum window is gone — every session-start marker is
    non-negative and the cumulative sum ends at their total, so
    max(cumsum) == sum(markers); one lag window (the unavoidable
    per-user ordering) plus a hash aggregate replaces two window
    passes."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    newsess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("ns", newsess)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"), F.count("*").alias("n_events"))
    )


def q_kb_altname_attach(spark, sf):
    """S7 alt-name attach shape: left join + grouped distinct-count
    (io.py:488-504)."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    return j.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
    )


def q_s6_extents_parse(spark, sf):
    """S6 OutputReader extents parsing shape (io.py:318-320): split
    composite keys, exercised on the events props column via doc refs."""
    docs = _t(spark, sf, "documents")
    composite = F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"),
                         F.lit("-"), F.col("n_chars").cast("string"))
    parsed = docs.select(composite.alias("extents"))
    ext = F.split("extents", ":")
    offs = F.split(F.element_at(ext, 2), "-")
    return parsed.select(
        F.element_at(ext, 1).alias("src_id"),
        F.element_at(offs, 1).cast("bigint").alias("ref_doc"),
        F.element_at(offs, 2).cast("bigint").alias("ref_len"),
    )


def q_c3_acronym_key(spark, sf):
    """C3 AcronymStage initials key (coref.py:330-335 shape): uppercased
    first letters of each name's words, grouped."""
    from hamerkop_spark.functions.strings import acronym_initials

    part = _t(spark, sf, "part")
    return (
        part.select(acronym_initials(F.col("p_name")).alias("akey"))
        .groupBy("akey")
        .agg(F.count("*").alias("n"))
    )


def q_chains_agg(spark, sf):
    """MentionChain aggregation shape (core.py:192-206): longest-string
    name via argmax + distinct-name set size, per group. Expressed with a
    deterministic window argmax (ties broken by key) so Spark max_by and
    DuckDB arg_max tie-handling differences can't flip results."""
    li = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.col("l_partkey")
    )
    best = (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", F.col("l_partkey").alias("best_part"))
    )
    counts = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_lines"),
    )
    return best.join(counts, "l_orderkey")


def q_f5_wikipedia_link(spark, sf):
    """F5 WikipediaFeature link construction (features.py:137-141):
    space->underscore wiki urls (part names are ASCII, so percent-
    encoding is a no-op — the unicode path is covered by unit tests)."""
    part = _t(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.concat(
            F.lit("http://en.wikipedia.org/wiki/"),
            F.regexp_replace("p_name", " ", "_"),
        ).alias("wiki_url"),
    )


# --- preprocessors / coref / candidate-combination / resolver cascade ------

ACRONYM_MAP = {
    "customer#000000001": "First Customer",
    "customer#000000010": "Tenth Customer",
}
STEM_MAP = {"lemon": "citrus", "navy": "blue", "metallic": "metal"}
USERNAME_MAP = {"user1": "Alice Example", "user3": "Bob Sample"}


def q_p7_acronym_replace(spark, sf):
    """P7 AcronymReplacer (preprocessor.py:257-275): CI broadcast-join
    replacement of full mention strings."""
    from hamerkop_spark.operators.preprocess import acronym_replacer

    cust = _t(spark, sf, "customer")
    m = cust.select("c_custkey", F.col("c_name").alias("string"))
    out = acronym_replacer(ACRONYM_MAP, ci=True)(m)
    return out.select("c_custkey", F.col("string").alias("resolved"))


def q_p9_name_stemmer(spark, sf):
    """P9 NameStemmer / T10 DictStemmer (preprocessor.py:302-318): per-token
    CI stem lookup, identity otherwise."""
    from hamerkop_spark.operators.preprocess import name_stemmer

    part = _t(spark, sf, "part")
    m = part.select("p_partkey", F.lower("p_name").alias("string"))
    out = name_stemmer(STEM_MAP)(m)
    return out.select("p_partkey", F.col("string").alias("stemmed"))


def q_p10_twitter_username(spark, sf):
    """P10 TwitterUsernameReplacer (preprocessor.py:321-345): twitter docs
    only, strip '@', chop one trailing non-word char, map to screen name."""
    from hamerkop_spark.operators.preprocess import twitter_username_replacer

    docs = _t(spark, sf, "documents")
    m = docs.select(
        "doc_id",
        F.concat(
            F.lit("@user"), (F.col("doc_id") % 7).cast("string"), F.lit(".")
        ).alias("string"),
        F.when(F.col("doc_id") % 2 == 0, "twitter")
        .otherwise("newswire")
        .alias("doc_type"),
    )
    out = twitter_username_replacer(USERNAME_MAP)(m)
    return out.select("doc_id", F.col("string").alias("resolved"))


def q_p11_hashtag_split(spark, sf):
    """P11 TwitterHashtagProcessor (preprocessor.py:348-368): '#CamelCase'
    -> 'Camel Case' via the reference's [A-Z]*[a-z]* findall."""
    from hamerkop_spark.operators.preprocess import twitter_hashtag_processor

    part = _t(spark, sf, "part")
    camel = F.array_join(
        F.transform(
            F.split("p_name", " "),
            lambda w: F.concat(F.upper(F.substring(w, 1, 1)), F.substring(w, 2, 1 << 30)),
        ),
        "",
    )
    m = part.select(
        "p_partkey", F.concat(F.lit("#"), camel).alias("string")
    )
    out = twitter_hashtag_processor(m)
    return out.select("p_partkey", F.col("string").alias("split_name"))


def q_c4_single_token_merge(spark, sf):
    """C4 SingleTokenMatchStage (coref.py:338-382): single-token chains
    merge with chains whose multi-token name ends with that token, CI,
    same doc + type. Chains here: parts within a brand."""
    from hamerkop_spark.operators.coref import single_token_match_stage

    part = _t(spark, sf, "part")
    m = part.select(
        F.col("p_brand").alias("doc_id"),
        F.col("p_partkey").cast("string").alias("chain_id"),
        F.lit("PER").alias("type"),
        F.when(
            F.col("p_partkey") % 13 == 0,
            F.element_at(F.split("p_name", " "), -1),
        )
        .otherwise(F.col("p_name"))
        .alias("string"),
        F.lit(0).alias("char_start"),
        F.col("p_partkey").cast("string").alias("mention_id"),
    )
    return single_token_match_stage(-1)(m)


def _demo_candidate_sets(spark, sf):
    """Two blocking generators over part (exact lowered-name key, then the
    portable-soundex first-token key) — the inputs for B7/B8."""
    from hamerkop_spark.functions.phonetic import soundex_portable
    from hamerkop_spark.operators.blocking import exact_match_candidates

    part = _t(spark, sf, "part")
    chains = part.where(F.col("p_partkey") % 17 == 0).select(
        F.lit("d").alias("doc_id"),
        F.col("p_partkey").cast("string").alias("chain_id"),
        F.lit("T").alias("type"),
        F.col("p_name").alias("name"),
    )
    kb_names = part.select(
        F.col("p_partkey").cast("string").alias("entity_id"),
        F.lit("T").alias("type"),
        F.col("p_name").alias("name"),
        F.lit(0).alias("name_idx"),
        F.lower("p_name").alias("exact_key"),
    )
    set1 = exact_match_candidates(chains, kb_names)
    probe = chains.withColumn(
        "pkey", soundex_portable(F.element_at(F.split("name", " "), 1))
    )
    build = kb_names.select(
        "type",
        soundex_portable(F.element_at(F.split("name", " "), 1)).alias("pkey"),
        "entity_id",
    ).distinct()
    hits = probe.join(build, ["type", "pkey"]).select(
        "doc_id", "chain_id", "entity_id"
    ).distinct()
    w = Window.partitionBy("doc_id", "chain_id").orderBy("entity_id")
    set2 = (
        hits.withColumn("retrieval_rank", F.row_number().over(w))
        .where(F.col("retrieval_rank") <= 25)
        .withColumn("source", F.lit("phonetic"))
    )
    return set1, set2


def q_b7_combine_candidates(spark, sf):
    """B7 CombiningGenerator (candidates.py:102-118): union generator
    outputs, dedupe per (chain, entity) keeping the earliest
    (source order, rank)."""
    from hamerkop_spark.operators.blocking import combine_candidates

    set1, set2 = _demo_candidate_sets(spark, sf)
    return combine_candidates(set1, set2)


def q_b8_cascade_candidates(spark, sf):
    """B8 CascadeGenerator (candidates.py:121-141): a chain stops accepting
    later generators once earlier ones supplied num_candidates."""
    from hamerkop_spark.operators.blocking import cascade_candidates

    set1, set2 = _demo_candidate_sets(spark, sf)
    return cascade_candidates([set1, set2], num_candidates=3)


def q_r3_wikipedia_resolver(spark, sf):
    """R3 WikipediaResolver (resolver.py:275-303): one/many/none narrowing
    keyed on the wikipedia-link match, over brand-blocked part pairs."""
    from hamerkop_spark.operators.resolve import wikipedia_resolver

    part = _t(spark, sf, "part")
    chains = part.where(F.col("p_partkey") % 17 == 0).select(
        F.lit("d").alias("doc_id"),
        F.col("p_partkey").cast("string").alias("chain_id"),
        F.array("p_name").alias("chain_names"),
        F.col("p_brand").alias("brand"),
    )
    cands = part.select(
        F.col("p_partkey").cast("string").alias("entity_id"),
        F.col("p_brand").alias("brand"),
        F.when(
            F.col("p_partkey") % 2 == 0,
            F.array(
                F.concat(
                    F.lit("http://en.wikipedia.org/wiki/"),
                    F.regexp_replace("p_name", " ", "_"),
                )
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("entity_urls"),
    )
    pairs = chains.join(cands, "brand").drop("brand")
    decisions, _rem = wikipedia_resolver(pairs)
    return decisions.select("chain_id", F.col("entity_id").alias("decided"))


def q_r6_cascade_resolver(spark, sf):
    """R6 CascadeResolver (resolver.py:192-213): exact-name one/many/none
    first, then a thresholded linear argmax over the narrowed residue —
    resolved chains leave the pool between stages."""
    from hamerkop_spark.operators.resolve import (
        cascade_resolver,
        exact_name_resolver,
        linear_resolver,
    )

    li = _t(spark, sf, "lineitem")
    pairs = li.select(
        F.lit("d").alias("doc_id"),
        F.col("l_orderkey").cast("string").alias("chain_id"),
        F.concat_ws(
            "#",
            F.col("l_partkey").cast("string"),
            F.col("l_suppkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("entity_id"),
        F.array((F.col("l_orderkey") % 50).cast("string")).alias("chain_names"),
        F.array((F.col("l_partkey") % 50).cast("string")).alias("entity_names"),
        F.col("l_quantity").cast("double").alias("f_q"),
    )
    decisions = cascade_resolver(
        pairs,
        [exact_name_resolver, linear_resolver({"f_q": 1.0}, 0.0, 30.0)],
    )
    return decisions.select("chain_id", F.col("entity_id").alias("decided"))


def q_t14_doc_type(spark, sf):
    """T14 DocType.detect by doc-id substring (core.py:50-70)."""
    from hamerkop_spark.functions.strings import doc_type_from_id

    docs = _t(spark, sf, "documents")
    tag = (
        F.when(F.col("doc_id") % 5 == 0, "_SN_")
        .when(F.col("doc_id") % 5 == 1, "_WL_")
        .when(F.col("doc_id") % 5 == 2, "_RF_")
        .when(F.col("doc_id") % 5 == 3, "_DF_")
        .otherwise("_XX_")
    )
    ids = F.concat(F.lit("doc"), tag, F.col("doc_id").cast("string"))
    return (
        docs.select(doc_type_from_id(ids).alias("doc_type"))
        .groupBy("doc_type")
        .agg(F.count("*").alias("n"))
    )


def q_t15_entity_origin(spark, sf):
    """T15 EntityOrigin.create normalization (core.py:27-47)."""
    from hamerkop_spark.functions.strings import entity_origin

    cust = _t(spark, sf, "customer")
    code = (
        F.when(F.col("c_custkey") % 6 == 0, "GEO")
        .when(F.col("c_custkey") % 6 == 1, "WLL")
        .when(F.col("c_custkey") % 6 == 2, "APB")
        .when(F.col("c_custkey") % 6 == 3, "AUG-geo")
        .when(F.col("c_custkey") % 6 == 4, "geonames")
        .otherwise("junk")
    )
    return (
        cust.select(entity_origin(code).alias("origin"))
        .groupBy("origin")
        .agg(F.count("*").alias("n"))
    )


def q_t5_remove_double_letter(spark, sf):
    """T5 remove_double_letter (string.py:66-69): ([a-zA-Z])\\1+ -> \\1."""
    from hamerkop_spark.functions.strings import remove_double_letter

    part = _t(spark, sf, "part")
    return part.select(
        "p_partkey", remove_double_letter(F.col("p_name")).alias("dedoubled")
    )


def q_t2_unicode_punct(spark, sf):
    """T2 remove_unicode_punct (string.py:46-49): category-P strip."""
    from hamerkop_spark.functions.strings import remove_unicode_punct

    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id", F.length(remove_unicode_punct(F.col("text"))).alias("clean_len")
    )


# --- hash-keyed operators, md5-derived variants so DuckDB can oracle them --

MINHASH_HASHES = 32
MINHASH_BANDS = 8
MINHASH_MAX_BUCKET = 200
SIMHASH_BITS = 60
SIMHASH_MAX_HAMMING = 3
ANN_PLANES = 6
NEARDUP_PLANES = 4
EMB_DIM = 64


def q_dedup_minhash_lsh(spark, sf):
    """MinHash-LSH dedup pairs over word-3-shingles, md5perm hashes
    (operators/dedup.minhash_dedup_pairs hash_fn='md5perm': ONE md5 per
    shingle + universal-hash permutations — same LSH semantics as the
    xxhash64 engine default, DuckDB-reproducible at ~1/32 the digest
    cost of the old per-seed md5 variant)."""
    from hamerkop_spark.operators.dedup import minhash_dedup_pairs

    # r6: spread the single-row-group scan so the shingle+md5+perm-min
    # pipeline (the dominant cost) runs N-wide; every downstream
    # aggregate (min per id, collect per bucket) is order-independent.
    # HASH-partitioned on the post-cast doc_id (not round-robin): the
    # signature groupBy(_id) is then already clustered, so its partial
    # rows (33 bigint columns per doc per map partition) never shuffle
    # — one exchange of the raw docs replaces raw-exchange + 42 MB
    # partial-agg exchange (measured at sf0.1), same distribution of
    # the per-row compute, and doc_id is unique so no skew.
    docs = (
        _t(spark, sf, "documents")
        .selectExpr("cast(doc_id as string) doc_id", "text")
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
    )
    return minhash_dedup_pairs(
        docs, num_hashes=MINHASH_HASHES, num_bands=MINHASH_BANDS,
        max_bucket=MINHASH_MAX_BUCKET, hash_fn="md5perm",
    )


def q_dedup_simhash(spark, sf):
    """SimHash near-dup pairs: native md5-derived 60-bit signature,
    blocked on max_hamming+1 chunks (pigeonhole guarantee holds by
    construction; the round-1 query's max_hamming=12 over 4 fixed chunks
    violated it)."""
    from hamerkop_spark.operators.dedup import simhash_dedup_pairs

    docs = _t(spark, sf, "documents").where(F.col("doc_id") < 200).selectExpr(
        "cast(doc_id as string) doc_id", "text"
    )
    return simhash_dedup_pairs(docs, max_hamming=SIMHASH_MAX_HAMMING, hash_fn="md5")


def q_b_phonetic_soundex(spark, sf):
    """Phonetic blocking keys: portable Russell-variant soundex of the
    first name token (functions/phonetic.soundex_portable; its SQL twin
    is generated from the same constants)."""
    from hamerkop_spark.functions.phonetic import soundex_portable

    part = _t(spark, sf, "part")
    first = F.element_at(F.split("p_name", " "), 1)
    return (
        part.select(soundex_portable(first).alias("skey"), "p_partkey")
        .groupBy("skey")
        .agg(F.count("*").alias("n"))
    )


def q_ann_lsh_topk(spark, sf):
    """LSH-bucketed ANN top-k: literal ±1 hyperplanes (deterministic
    md5-derived matrix shipped to both engines; out-of-bucket candidates
    never scored)."""
    from hamerkop_spark.operators.similarity import hyperplanes, lsh_topk

    emb = _t(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(
        emb, q, dim=EMB_DIM, k=5, planes=hyperplanes(EMB_DIM, ANN_PLANES)
    )


IVF_CLUSTERS = 16
IVF_PROBE = 4


def q_ann_ivf_topk(spark, sf):
    """IVF-style ANN top-k: deterministic hash-sampled coarse centroids,
    corpus assigned to inverted lists, queries probe the 4 nearest of 16
    lists — vectors outside probed lists are never scored
    (operators/similarity.ivf_topk)."""
    from hamerkop_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(
        emb, q, k=10, k_clusters=IVF_CLUSTERS, n_probe=IVF_PROBE
    )


# --- round-3 coverage rows: §2 IDs previously verified only by pytest ------


def q_p15_tristate_cascade(spark, sf):
    """P15 CascadeEntityFilter (io.py:525-537): tri-state keep/defer
    cascade — first non-null filter verdict wins, all-null => drop.
    Exercises every truth-table branch over synthesized origin /
    external_link / country_code columns (sources/kb.cascade_filter)."""
    from hamerkop_spark.sources.kb import (
        cascade_filter, country_filter, link_filter, origin_filter,
    )

    cust = _t(spark, sf, "customer")
    k = F.col("c_custkey")
    ent = cust.select(
        "c_custkey",
        F.lower("c_mktsegment").alias("origin"),
        F.when(k % 3 == 0, F.lit(None).cast("string"))
        .when(k % 3 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("http://ex/"), k.cast("string")))
        .alias("external_link"),
        F.when(k % 5 < 2, F.lit("US"))
        .when(k % 5 < 4, F.lit("FR"))
        .otherwise(F.lit(None).cast("string"))
        .alias("country_code"),
    )
    kept = cascade_filter(
        [origin_filter("aut", "bui"), link_filter(), country_filter("us")]
    )
    return ent.select("c_custkey", kept.cast("int").alias("kept"))


def q_p2_text_normalizer(spark, sf):
    """P2 TextNormalizer (preprocessor.py:186-199): smart punct -> ASCII
    then emoji strip, via the engine operator. Smart quotes/dash/ellipsis
    and one pictograph are injected identically on both engines so the
    normalization is observable on ASCII-only driver data."""
    from hamerkop_spark.operators.preprocess import text_normalizer

    docs = _t(spark, sf, "documents")
    m = docs.select(
        "doc_id",
        F.concat(
            F.lit("“Q—"),
            F.substring("text", 1, 30),
            F.lit("…’ \U0001F600"),
        ).alias("string"),
    )
    return text_normalizer(m).select(
        "doc_id", F.col("string").alias("normalized")
    )


def q_p4_fix_type(spark, sf):
    """P4 FixType (preprocessor.py:216-227): lowercase-name -> type
    override via broadcast join (operators/preprocess.fix_type)."""
    from hamerkop_spark.operators.preprocess import fix_type

    cust = _t(spark, sf, "customer")
    m = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("string"),
        F.lit("ORG").alias("type"),
    )
    out = fix_type({"building": "LOC", "automobile": "GPE"})(m)
    return out.select("c_custkey", "type")


def q_p8_name_projector(spark, sf):
    """P8 NameProjector (preprocessor.py:278-299): store the projection in
    a side column only when non-null and different from the string
    (operators/preprocess.name_projector, projection = upper)."""
    from hamerkop_spark.operators.preprocess import name_projector

    cust = _t(spark, sf, "customer")
    k = F.col("c_custkey")
    m = cust.select(
        "c_custkey",
        F.when(k % 4 == 0, F.lower("c_name"))
        .otherwise(F.upper("c_name"))
        .alias("string"),
        F.lit("eng").alias("lang"),
    )
    out = name_projector(lambda s, lang: F.upper(s))(m)
    return out.select("c_custkey", "translit_string")


def q_t7_dict_translator(spark, sf):
    """T7 DictTranslator (string.py:92-102): CI full-string dictionary
    translation into a side column (operators/preprocess.dict_translator)
    over part-name first tokens."""
    from hamerkop_spark.operators.preprocess import dict_translator

    part = _t(spark, sf, "part")
    m = part.select(
        "p_partkey", F.element_at(F.split("p_name", " "), 1).alias("string")
    )
    out = dict_translator(
        {"lemon": "limon", "navy": "marina", "metallic": "metalico"}
    )(m)
    return out.select("p_partkey", "translate_string")


def q_t4_single_space(spark, sf):
    """T4 single_space (string.py:61-64): collapse whitespace runs
    (functions/strings.single_space). Driver docs carry no \\x0B, the one
    char where Java and RE2 \\s disagree."""
    from hamerkop_spark.functions.strings import single_space

    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id", single_space(F.col("text")).alias("squeezed")
    )


def q_b4_type_conflation(spark, sf):
    """B4 TypeIgnoringIndex (kb.py:278-305): conflate {GPE, LOC} into one
    blocking group on BOTH sides, equi-join on (type_group, block key)
    (operators/blocking.with_type_groups)."""
    from hamerkop_spark.operators.blocking import with_type_groups

    cust = _t(spark, sf, "customer")
    supp = _t(spark, sf, "supplier")
    ck, sk = F.col("c_custkey"), F.col("s_suppkey")
    chains = cust.select(
        "c_custkey",
        F.when(ck % 4 == 0, "GPE").when(ck % 4 == 1, "LOC")
        .when(ck % 4 == 2, "PER").otherwise("ORG").alias("type"),
        (ck % 25).alias("bkey"),
    )
    ents = supp.select(
        "s_suppkey",
        F.when(sk % 3 == 0, "LOC").when(sk % 3 == 1, "PER")
        .otherwise("ORG").alias("type"),
        (sk % 25).alias("bkey"),
    )
    gc = with_type_groups(chains, ["GPE", "LOC"])
    ge = with_type_groups(ents, ["GPE", "LOC"])
    return (
        gc.join(ge, ["type_group", "bkey"])
        .groupBy("type_group")
        .agg(F.count("*").alias("n_pairs"))
    )


def q_f_bundle_native(spark, sf):
    """F1-F4 + F6 + F8 in one row: origin / in-country / #names / #links /
    exact-match / last-name features via operators/features.extract_features
    with the native (no-UDF) subset of the STANDARD bundle, over blocked
    customer x supplier analog pairs (reference features.py:69-188)."""
    from hamerkop_spark.operators import features as FT

    cust = _t(spark, sf, "customer")
    supp = _t(spark, sf, "supplier")
    ck, sk = F.col("c_custkey"), F.col("s_suppkey")
    chains = cust.where(ck % 9 == 0).select(
        F.lit("d").alias("doc_id"),
        ck.alias("chain_id"),
        (ck % 25).alias("bkey"),
        F.array(
            F.concat(F.lit("acct "), (ck % 50).cast("string")),
            F.lower("c_name"),
        ).alias("chain_all_strings"),
        F.array(F.lower("c_name")).alias("chain_names"),
    )
    ents = supp.select(
        sk.alias("entity_id"),
        (sk % 25).alias("bkey"),
        F.when(
            sk % 5 == 0,
            F.array(F.concat(F.lit("acct "), (sk % 50).cast("string"))),
        ).otherwise(
            F.array(
                F.concat(F.lit("acct "), (sk % 50).cast("string")),
                F.lower("s_name"),
            )
        ).alias("entity_names"),
        F.when(
            sk % 3 == 0, F.array(F.lit("http://en.wikipedia.org/wiki/x"))
        ).otherwise(F.lit(None).cast("array<string>")).alias("entity_urls"),
        F.when(sk % 2 == 0, F.lit("geonames")).otherwise(F.lit("web"))
        .alias("origin"),
        F.when(sk % 7 == 0, F.lit("US")).otherwise(F.lit(None).cast("string"))
        .alias("per_location"),
        F.lit(None).cast("string").alias("org_location"),
        F.when(sk % 7 == 1, F.lit("GB")).otherwise(F.lit(None).cast("string"))
        .alias("geo_country"),
    )
    pairs = chains.join(ents, "bkey")
    feats = {
        "f_origin": FT.origin_feature,
        "f_in_country": lambda: FT.in_country_feature("US", "GB"),
        "f_num_names": FT.number_of_names_feature,
        "f_num_links": FT.number_of_links_feature,
        "f_exact_match": FT.exact_match_feature,
        "f_last_name": FT.last_name_feature,
    }
    out = FT.extract_features(pairs, features=feats)
    return out.select(
        "chain_id",
        "entity_id",
        det_round(F.col("f_origin"), 4).alias("f_origin"),
        det_round(F.col("f_in_country"), 4).alias("f_in_country"),
        det_round(F.col("f_num_names"), 4).alias("f_num_names"),
        det_round(F.col("f_num_links"), 4).alias("f_num_links"),
        det_round(F.col("f_exact_match"), 4).alias("f_exact_match"),
        det_round(F.col("f_last_name"), 4).alias("f_last_name"),
    )


def q_r8_labeled_pairs(spark, sf):
    """R8 FeatureRecorder (resolver.py:157-189): label candidate pairs 1
    iff the entity is among the chain's gold links and the mention is a
    link (not NIL) (operators/features.record_labeled_pairs)."""
    from hamerkop_spark.operators.features import record_labeled_pairs

    li = _t(spark, sf, "lineitem")
    sp = li.select(
        F.col("l_orderkey").alias("doc_id"),
        F.col("l_linenumber").alias("chain_id"),
        F.col("l_partkey").alias("entity_id"),
    )
    gold = (
        li.groupBy(
            F.col("l_orderkey").alias("doc_id"),
            F.col("l_linenumber").alias("chain_id"),
        )
        .agg(F.array(F.min("l_partkey")).alias("gold_links"))
        .withColumn(
            "link_type",
            F.when(F.col("doc_id") % 4 == 0, "NIL").otherwise("link"),
        )
    )
    out = record_labeled_pairs(sp, gold)
    return out.select("doc_id", "chain_id", "entity_id", "label")


def q_s3_bio_chunker(spark, sf):
    """S3 BIO chunker (DocumentPreparer.process): window + groupBy span
    assembly over an events-derived tag stream — B starts a span, I
    extends it until the first O, span type = first tag's suffix
    (sources/conll.extract_mentions)."""
    from hamerkop_spark.sources.conll import extract_mentions

    ev = _t(spark, sf, "events")
    e = F.col("event_id")
    tag = (
        F.when(e % 5 == 0, F.lit("B-PER"))
        .when(e % 5 == 1, F.lit("I-PER"))
        .when(e % 5 == 2, F.lit("O"))
        .when(e % 5 == 3, F.lit("B-ORG"))
        .otherwise(F.lit("I-ORG"))
    )
    conll = ev.select(
        F.concat(F.lit("doc"), (F.col("user_id") % 20).cast("string"))
        .alias("doc_id"),
        F.col("event_type").alias("token"),
        tag.alias("tag"),
        e.alias("row_idx"),
        (e * 10).cast("int").alias("start"),
        (e * 10 + 5).cast("int").alias("stop"),
    )
    out = extract_mentions(conll)
    return out.select(
        "doc_id", "mention_id", "string", "type",
        "char_start", "char_stop", "token_start", "token_stop",
    )


def q_b10_candidate_recall(spark, sf):
    """B10 CandidatesScorer (candidates.py:54-75): per-type fraction of
    linked gold mentions whose gold entity is in the candidate set
    (operators/scoring.candidate_recall)."""
    from hamerkop_spark.operators.scoring import candidate_recall

    li = _t(spark, sf, "lineitem")
    cands = li.select(
        F.col("l_orderkey").alias("doc_id"),
        F.lit(1).alias("chain_id"),
        F.col("l_partkey").alias("entity_id"),
    )
    gold = (
        li.groupBy(F.col("l_orderkey").alias("doc_id"))
        .agg(
            F.array(F.min("l_partkey") + (F.min("l_orderkey") % 2))
            .alias("gold_links")
        )
        .withColumn("chain_id", F.lit(1))
        .withColumn(
            "entity_type",
            F.when(F.col("doc_id") % 3 == 0, "PER")
            .when(F.col("doc_id") % 3 == 1, "ORG")
            .otherwise("GPE"),
        )
    )
    return candidate_recall(cands, gold)


def q_b11_kb_recall(spark, sf):
    """B11 KBLoadingScorer (kb.py:59-81): fraction of gold entity ids
    present in the loaded KB (operators/scoring.kb_loading_recall —
    scalar Row, surfaced as a one-row DataFrame)."""
    import math

    from hamerkop_spark.operators.scoring import kb_loading_recall

    part = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem")
    kbe = part.where(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("entity_id")
    )
    gold = li.where(F.col("l_orderkey") % 97 == 0).select(
        F.col("l_partkey").alias("entity_id")
    )
    row = kb_loading_recall(kbe, gold)
    r6 = math.floor(row.recall * 1e6 + 0.5) / 1e6
    return spark.createDataFrame(
        [(r6, row.total, row.missed)], "recall double, total long, missed long"
    )


def q_c7_muc_b3(spark, sf):
    """C7 MUC + B³ coref scorers (CorefScorer.muc/.b3, coref.py:116-147):
    both metrics over a synthetic pred-vs-gold clustering with controlled
    disagreement (operators/scoring.muc / .b3 — scalar Rows surfaced as
    one row)."""
    import math

    from hamerkop_spark.operators.scoring import b3, muc

    cust = _t(spark, sf, "customer")
    m = cust.select(F.col("c_custkey").alias("mention_key"))
    pred = m.withColumn(
        "cluster", (F.col("mention_key") % 40).cast("string")
    )
    gold = m.withColumn(
        "cluster",
        (
            (
                F.col("mention_key")
                + F.when(F.col("mention_key") % 7 == 0, 1).otherwise(0)
            )
            % 40
        ).cast("string"),
    )
    mr = muc(pred, gold)
    br = b3(pred, gold)

    def d6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    return spark.createDataFrame(
        [(d6(mr.precision), d6(mr.recall), d6(mr.f1),
          d6(br.precision), d6(br.recall), d6(br.f1))],
        "muc_p double, muc_r double, muc_f1 double, "
        "b3_p double, b3_r double, b3_f1 double",
    )


def q_r7_type_gate(spark, sf):
    """R7 TypeSpecificResolver (resolver.py:229-242): the linear resolver
    runs only on PER-typed chains; others pass through undecided
    (operators/resolve.type_specific + linear_resolver)."""
    from hamerkop_spark.operators.resolve import linear_resolver, type_specific

    li = _t(spark, sf, "lineitem")
    pairs = li.select(
        F.col("l_orderkey").alias("doc_id"),
        F.col("l_linenumber").alias("chain_id"),
        F.col("l_partkey").alias("entity_id"),
        F.when(F.col("l_orderkey") % 3 == 0, "PER").otherwise("ORG")
        .alias("chain_type"),
        (
            F.col("l_quantity") * 2.0 + F.col("l_discount") * 100.0 - 50.0
        ).alias("f_score"),
    )
    gated = type_specific(
        linear_resolver({"f_score": 1.0}, bias=0.0, threshold=30.0), "PER"
    )
    decisions, _remaining = gated(pairs)
    return decisions


def q_c5_lang_gate(spark, sf):
    """C5 LanguageSpecificStage (coref.py:237-247): the exact-match sieve
    stage sees only eng-tagged mentions; merges never cross the gate
    (operators/coref.language_specific + exact_match_stage)."""
    from hamerkop_spark.operators.coref import (
        exact_match_stage, language_specific,
    )

    cust = _t(spark, sf, "customer")
    k = F.col("c_custkey")
    mentions = cust.select(
        (k % 20).cast("string").alias("doc_id"),
        k.alias("chain_id"),
        F.col("c_mktsegment").alias("string"),
        F.lit("ORG").alias("type"),
        F.when(k % 2 == 0, "eng").otherwise("rus").alias("lang"),
    )
    stage = language_specific(exact_match_stage, "eng")
    return stage(mentions)


def q_c6_type_gate(spark, sf):
    """C6 TypeSpecificStage (coref.py:250-263): chain type = FIRST
    mention's type in document order; the stage runs only over chains
    typed PER (operators/coref.type_specific + exact_match_stage)."""
    from hamerkop_spark.operators.coref import exact_match_stage, type_specific

    cust = _t(spark, sf, "customer")
    k = F.col("c_custkey")
    mentions = cust.select(
        (k % 10).cast("string").alias("doc_id"),
        k.alias("mention_id"),
        (k % 500).alias("chain_id"),
        k.alias("char_start"),
        F.col("c_mktsegment").alias("string"),
        F.when(k % 3 == 0, "PER").otherwise("ORG").alias("type"),
    )
    stage = type_specific(exact_match_stage, "PER")
    return stage(mentions)


def q_t3_emoji_strip(spark, sf):
    """T3 remove_emojis (string.py:56-59): emoji ranges stripped; two
    pictographs injected identically on both engines (driver text is
    ASCII)."""
    from hamerkop_spark.functions.strings import remove_emojis

    docs = _t(spark, sf, "documents")
    m = docs.select(
        "doc_id",
        F.concat(
            F.lit("\U0001F680 go "),
            F.substring("text", 1, 25),
            F.lit(" \U0001F600!"),
        ).alias("string"),
    )
    return m.select(
        "doc_id", remove_emojis(F.col("string")).alias("no_emoji")
    )


def q_r9_resolver_report(spark, sf):
    """R9 ResolverScorer (resolver.py:106-137): per-type
    selected/recallable/correct/false-alarm counts over decisions,
    candidate sets, and gold links (operators/scoring.resolver_report)."""
    from hamerkop_spark.operators.scoring import resolver_report

    li = _t(spark, sf, "lineitem")
    cands = li.select(
        F.col("l_orderkey").alias("doc_id"),
        F.lit(1).alias("chain_id"),
        F.col("l_partkey").alias("entity_id"),
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("doc_id")).agg(
        F.min("l_partkey").alias("mn")
    )
    decisions = per_order.where(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.lit(1).alias("chain_id"),
        (F.col("mn") + F.col("doc_id") % 3).alias("entity_id"),
    )
    gold = per_order.select(
        "doc_id",
        F.lit(1).alias("chain_id"),
        F.array(F.col("mn")).alias("gold_links"),
        F.when(F.col("doc_id") % 5 == 0, "NIL").otherwise("link")
        .alias("link_type"),
        F.when(F.col("doc_id") % 3 == 0, "PER")
        .when(F.col("doc_id") % 3 == 1, "ORG")
        .otherwise("GPE").alias("entity_type"),
    )
    return resolver_report(decisions, cands, gold)


def q_p16_script_filter(spark, sf):
    """P16 ScriptBasedNameFilter (io.py:604-637): keep pure-ASCII names
    always, keep allowed-script (Arabic) names, drop the rest — over a
    modulo-chosen pool of Arabic/Greek/ASCII/Ge'ez surfaces. The oracle
    hardcodes the pool's known truth, so the engine's script regexes are
    genuinely differentially checked."""
    from hamerkop_spark.sources.kb import script_name_filter

    cust = _t(spark, sf, "customer")
    k = F.col("c_custkey")
    name = (
        F.when(k % 4 == 0, F.lit("محمد"))
        .when(k % 4 == 1, F.lit("Αθήνα"))
        .when(k % 4 == 2, F.lit("london"))
        .otherwise(F.lit("ሀገር"))
    )
    keep = script_name_filter("arabic")(name)
    return cust.select("c_custkey", keep.cast("int").alias("keep"))


def q_p17_language_name_filter(spark, sf):
    """P17 LanguageBasedNameFilter (io.py:640-672): geonames alternateNames
    assign each lowercased name a language, FIRST-WINS except en/target
    take priority; names labeled another language drop, en/target/
    unlabeled pass (sources/kb.language_name_filter, target=fr). The
    geonames side carries duplicate names with conflicting langs to
    exercise the priority rule."""
    from hamerkop_spark.sources.kb import language_name_filter

    nat = _t(spark, sf, "nation")
    cust = _t(spark, sf, "customer")
    nk = F.col("n_nationkey")
    g1 = nat.select(
        nk.cast("long").alias("row_idx"),
        F.when(nk % 3 == 0, "en").when(nk % 3 == 1, "fr").otherwise("de")
        .alias("lang"),
        F.col("n_name").alias("name"),
    )
    g2 = nat.select(
        (nk + 100).cast("long").alias("row_idx"),
        F.lit("de").alias("lang"),
        F.col("n_name").alias("name"),
    )
    geonames = g1.unionByName(g2)
    names = cust.join(
        nat.select("n_nationkey", "n_name"),
        cust.c_nationkey == nat.n_nationkey,
    ).select("c_custkey", F.col("n_name").alias("name"))
    out = language_name_filter(geonames, "fr")(names, "name")
    return out.select("c_custkey", "name")


def q_f11_feature_vector(spark, sf):
    """F11 EntityFeatureExtractor / FeatureVector assembly
    (features.py:58-66): the per-feature columns are assembled into one
    `features` array, emitted as a comma-joined string so both engines
    hash identically (operators/features.extract_features)."""
    from hamerkop_spark.operators import features as FT

    cust = _t(spark, sf, "customer")
    supp = _t(spark, sf, "supplier")
    ck, sk = F.col("c_custkey"), F.col("s_suppkey")
    chains = cust.where(ck % 9 == 0).select(
        F.lit("d").alias("doc_id"),
        ck.alias("chain_id"),
        (ck % 25).alias("bkey"),
        F.array(
            F.concat(F.lit("acct "), (ck % 50).cast("string"))
        ).alias("chain_all_strings"),
        F.array().cast("array<string>").alias("chain_names"),
    )
    ents = supp.select(
        sk.alias("entity_id"),
        (sk % 25).alias("bkey"),
        F.array(
            F.concat(F.lit("acct "), (sk % 50).cast("string"))
        ).alias("entity_names"),
        F.when(
            sk % 3 == 0, F.array(F.lit("http://en.wikipedia.org/wiki/x"))
        ).otherwise(F.lit(None).cast("array<string>")).alias("entity_urls"),
        F.when(sk % 2 == 0, F.lit("geonames")).otherwise(F.lit("web"))
        .alias("origin"),
    )
    pairs = chains.join(ents, "bkey")
    feats = {
        "f_origin": FT.origin_feature,
        "f_num_names": FT.number_of_names_feature,
        "f_num_links": FT.number_of_links_feature,
        "f_exact_match": FT.exact_match_feature,
    }
    out = FT.extract_features(pairs, features=feats)
    vec = F.concat_ws(
        ",",
        F.transform(
            "features", lambda x: det_round(x, 4).cast("string")
        ),
    )
    return out.select("chain_id", "entity_id", vec.alias("feature_vector"))


def q_c1_cascade_coref(spark, sf):
    """C1 CascadeCoref (coref.py:197-211): singleton init + one
    exact-match sieve stage + connected-components relabel — the full
    cascade loop (operators/coref.cascade_coref). With one stage the
    closure is exactly the key group, so the oracle is a window min
    over (doc, type, lower(string))."""
    from hamerkop_spark.operators.coref import cascade_coref, exact_match_stage

    cust = _t(spark, sf, "customer")
    k = F.col("c_custkey")
    mentions = cust.select(
        (k % 20).cast("string").alias("doc_id"),
        k.cast("string").alias("mention_id"),
        F.col("c_mktsegment").alias("string"),
        F.when(k % 3 == 0, "PER").otherwise("ORG").alias("type"),
    )
    out = cascade_coref(mentions, [exact_match_stage])
    return out.select("doc_id", "mention_id", "chain_id")


def q_block_sorted_neighborhood(spark, sf):
    """Sorted-neighborhood blocking (Hernández & Stolfo '95,
    operators/blocking_eval.sorted_neighborhood_candidates): global
    range-partitioned rank + window-w rank equi-join. Key = phone
    country code (25 ties per key) so the rank's tiebreaker matters."""
    from hamerkop_spark.operators.blocking_eval import (
        sorted_neighborhood_candidates,
    )

    cust = _t(spark, sf, "customer").select(
        "c_custkey",
        F.concat_ws(
            "-", "c_mktsegment", F.lpad(F.col("c_nationkey").cast("string"), 2, "0")
        ).alias("cc"),
    )
    return sorted_neighborhood_candidates(
        cust, key_col="cc", id_col="c_custkey", window=4
    )


def q_block_meta_cnp(spark, sf):
    """Graph meta-blocking, CBS + cardinality node pruning (Papadakis
    TKDE '14, operators/blocking_eval.meta_blocking_cnp) over token
    blocking of part names."""
    from hamerkop_spark.operators.blocking_eval import meta_blocking_cnp

    # bounded record set (deterministic, SF-stable): keeps token-block
    # sizes under the purge cap so the CNP stage stays non-degenerate
    # at every SF instead of purging everything at sf0.1+
    part = _t(spark, sf, "part").where(
        (F.col("p_partkey") % 10 == 0) & (F.col("p_partkey") < 5000)
    )
    blocks = part.select(
        F.explode(F.split(F.lower("p_name"), " ")).alias("block_key"),
        F.col("p_partkey").alias("record_id"),
    )
    return meta_blocking_cnp(blocks, top_k=3, max_block_size=100)


def q_block_suffix_array(spark, sf):
    """Suffix-array blocking (Aizawa & Oyama WIRI '05,
    operators/blocking_eval.suffix_array_candidates): share-any-suffix
    (len >= 5) pairing with frequent-suffix purge. Bounded record set
    mirrors q_block_meta_cnp so block sizes stay non-degenerate across
    SFs."""
    from hamerkop_spark.operators.blocking_eval import (
        suffix_array_candidates,
    )

    part = _t(spark, sf, "part").where(
        (F.col("p_partkey") % 10 == 0) & (F.col("p_partkey") < 5000)
    )
    recs = part.select("p_partkey", F.lower(F.col("p_name")).alias("nm"))
    return suffix_array_candidates(
        recs,
        key_col="nm",
        id_col="p_partkey",
        min_suffix_len=5,
        max_block_size=50,
    )


def q_block_canopy(spark, sf):
    """Canopy clustering (McCallum, Nigam & Ungar KDD '00,
    operators/canopy.canopy_assignments): overlapping token-overlap
    canopies under the deterministic min-id dominance center rule —
    inverted index with posting purge, tight t1=4 kills later centers,
    loose t2=3 sets canopy reach, singleton fallback makes coverage
    total. All-integer cheap similarity, so any ANSI engine reproduces
    it bit-exactly. Record = part with name/brand/type/size-bucket
    tokens; % 3 subsample keeps the sf0.01 result well-sized (5,171
    rows) while posting sizes stay non-degenerate."""
    from hamerkop_spark.operators.canopy import canopy_assignments

    recs = (
        _t(spark, sf, "part")
        .where(F.col("p_partkey") % 3 == 0)
        .select(
            F.col("p_partkey").alias("record_id"),
            F.array_distinct(
                F.concat(
                    F.split(F.lower(F.col("p_name")), " "),
                    F.array(
                        F.lower(F.col("p_brand")),
                        F.lower(F.col("p_type")),
                        F.concat(
                            F.lit("s"),
                            (F.col("p_size") % 8).cast("string"),
                        ),
                    ),
                )
            ).alias("tokens"),
        )
    )
    return canopy_assignments(
        recs, t1_overlap=4, t2_overlap=3, max_posting=500
    )


def q_er_star_clusters(spark, sf):
    """Star clustering (Aslam, Pelekhov & Rus 1998,
    operators/star.star_assignments): overlapping diameter-<=2 star
    clusters over a token-overlap similarity graph, one-shot min-id
    degree-dominance relaxation (static degrees, singleton fallback,
    total coverage). Edges reuse the canopy cheap-similarity kernel
    (shared distinct-token count >= 3) over the same part-token
    records as block_canopy, so the two queries differ only in the
    clustering rule on top. All-integer arithmetic -> bit-exact
    DuckDB twin (702 rows at sf0.01)."""
    from hamerkop_spark.operators.canopy import token_overlap_pairs
    from hamerkop_spark.operators.star import star_assignments

    recs = (
        _t(spark, sf, "part")
        .where(F.col("p_partkey") % 3 == 0)
        .select(
            F.col("p_partkey").alias("record_id"),
            F.array_distinct(
                F.concat(
                    F.split(F.lower(F.col("p_name")), " "),
                    F.array(
                        F.lower(F.col("p_brand")),
                        F.lower(F.col("p_type")),
                        F.concat(
                            F.lit("s"),
                            (F.col("p_size") % 8).cast("string"),
                        ),
                    ),
                )
            ).alias("tokens"),
        )
    )
    edges = token_overlap_pairs(recs, min_overlap=3, max_posting=500)
    return star_assignments(edges)


def q_er_pivot_clusters(spark, sf):
    """Pivot correlation clustering / KwikCluster (Ailon, Charikar &
    Newman JACM 2008; parallel form Chierichetti et al. KDD 2014;
    operators/pivot.pivot_clusters): exact sequential parity via the
    greedy hash-rank MIS fixpoint + min-rank pivot assignment —
    PARTITIONS the same part-token overlap graph that cc_transitive
    unions and er_star_clusters overlaps, completing the clustering
    triptych. All-integer Knuth-hash ranks, so the DuckDB twin (a
    recursive CTE running the same monotone decision rules to the
    same least fixpoint) is bit-exact (667 rows at sf0.01)."""
    from hamerkop_spark.operators.canopy import token_overlap_pairs
    from hamerkop_spark.operators.pivot import pivot_clusters

    recs = (
        _t(spark, sf, "part")
        .where(F.col("p_partkey") % 3 == 0)
        .select(
            F.col("p_partkey").alias("record_id"),
            F.array_distinct(
                F.concat(
                    F.split(F.lower(F.col("p_name")), " "),
                    F.array(
                        F.lower(F.col("p_brand")),
                        F.lower(F.col("p_type")),
                        F.concat(
                            F.lit("s"),
                            (F.col("p_size") % 8).cast("string"),
                        ),
                    ),
                )
            ).alias("tokens"),
        )
    )
    edges = token_overlap_pairs(recs, min_overlap=3, max_posting=500)
    return pivot_clusters(edges)


def q_f_soft_tfidf_lev(spark, sf):
    """SoftTFIDF with the exact-integer normalized-Levenshtein kernel
    (Cohen et al. 2003 §2.3 relaxation; functions/tfidf.
    soft_tfidf_lev_pairs) — the hash-exact JVM-native twin of the
    float JW-kernel soft_tfidf_pairs. Same corpus IDF / weights /
    norms / pair blocking as f_tfidf_cosine; each a-token credits its
    best b-token at sim >= 0.5 in micro-units, per-term scale-down
    floor keeps every product inside BIGINT."""
    from hamerkop_spark.functions.tfidf import (
        soft_tfidf_lev_pairs,
        tfidf_norms,
        tfidf_weights,
        token_idf,
    )

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("record_id"),
        F.slice(F.split(F.col("text"), " "), 1, 10).alias("tokens"),
    )
    idf = token_idf(docs, "tokens")
    w = tfidf_weights(docs, idf).localCheckpoint(eager=False)
    n = tfidf_norms(w).localCheckpoint(eager=False)
    a = docs.where(F.col("record_id") % 10 == 0).select(
        F.col("record_id").alias("a_id"), (F.col("record_id") % 5).alias("bk")
    )
    b = docs.where(F.col("record_id") % 7 == 3).select(
        F.col("record_id").alias("b_id"), (F.col("record_id") % 5).alias("bk")
    )
    pairs = a.join(b, "bk").select("a_id", "b_id")
    return soft_tfidf_lev_pairs(pairs, w, n, theta_micro=500_000)


def q_er_progressive(spark, sf):
    """Progressive (pay-as-you-go) ER: ARCS-weighted candidate ranking
    (Papadakis TKDE '14 weighting; Whang TKDE '13 / Papenbrock TKDE '15
    budgeting; operators/progressive.py) — top-200 token-blocked pairs
    of part names by exact integer ARCS weight, selected through the
    radix-quickselect threshold path (the scale path: no global sort,
    <= 11 histogram rounds of <= 64 driver rows). Bounded record set
    mirrors q_block_meta_cnp."""
    from hamerkop_spark.operators.progressive import (
        arcs_pair_weights,
        select_top_pairs,
    )

    part = _t(spark, sf, "part").where(
        (F.col("p_partkey") % 10 == 0) & (F.col("p_partkey") < 5000)
    )
    blocks = part.select(
        F.explode(F.split(F.lower("p_name"), " ")).alias("block_key"),
        F.col("p_partkey").alias("record_id"),
    )
    weighted = arcs_pair_weights(blocks, max_block_size=100)
    return select_top_pairs(
        weighted, 200, mode="threshold", boundary="exact"
    )


def q_er_scheme_masks(spark, sf):
    """Adaptive-blocking sufficient statistics (Bilenko ICDM '06 /
    Michelson & Knoblock AAAI '06; operators/blocking_learn.
    scheme_mask_stats): every candidate/gold pair reduced to the
    bitmask of blocking predicates covering it, histogrammed — one
    pass prices EVERY predicate-set scheme exactly (the greedy learner
    is then driver-side arithmetic over <= 2^K rows). Predicates
    (sorted-name bit order): exact=1, prefix4=2, token=4; gold =
    partkey pairs (k, k+1000). Bounded record set mirrors
    q_block_meta_cnp."""
    from hamerkop_spark.operators.blocking_learn import scheme_mask_stats

    part = _t(spark, sf, "part").where(
        (F.col("p_partkey") % 10 == 0) & (F.col("p_partkey") < 5000)
    )
    recs = part.select(
        F.col("p_partkey").alias("record_id"),
        F.lower("p_name").alias("name"),
    )
    gold = recs.alias("a").join(
        recs.alias("b"),
        F.col("b.record_id") == F.col("a.record_id") + 1000,
    ).select(
        F.col("a.record_id").alias("a_id"),
        F.col("b.record_id").alias("b_id"),
    )
    keyers = {
        "exact": lambda c: F.array(F.concat(F.lit("x:"), c)),
        "prefix4": lambda c: F.array(
            F.concat(F.lit("p:"), F.substring(c, 1, 4))
        ),
        "token": lambda c: F.transform(
            F.array_distinct(F.split(c, " ")),
            lambda t: F.concat(F.lit("t:"), t),
        ),
    }
    return scheme_mask_stats(recs, gold, keyers)


def q_block_quality(spark, sf):
    """Blocking quality metrics (Christen 2012 ch.7,
    operators/blocking_eval.blocking_quality): PC / PQ / RR per
    candidate source + '__all__', fixed-point millionths."""
    from hamerkop_spark.operators.blocking_eval import (
        blocking_quality,
        sorted_neighborhood_candidates,
    )

    recs = (
        _t(spark, sf, "customer")
        .where(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            "c_nationkey",
            F.concat_ws(
                "-",
                "c_mktsegment",
                F.lpad(F.col("c_nationkey").cast("string"), 2, "0"),
            ).alias("cc"),
        )
    )
    n = recs.count()
    sn = sorted_neighborhood_candidates(
        recs, key_col="cc", id_col="c_custkey", window=3, source="sn"
    ).select("a_id", "b_id", "source")
    a = recs.select(
        F.col("c_custkey").alias("a_id"), F.col("c_nationkey").alias("nk")
    )
    b = recs.select(
        F.col("c_custkey").alias("b_id"), F.col("c_nationkey").alias("nk")
    )
    nation_block = (
        a.join(b, "nk")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.lit("nation_block").alias("source"))
    )
    gold = recs.select(
        F.col("c_custkey").alias("a_id"),
        (F.col("c_custkey") + 10).alias("b_id"),
    ).join(recs.select(F.col("c_custkey").alias("b_id")), "b_id")
    return blocking_quality(
        sn.unionByName(nation_block),
        gold,
        total_possible_pairs=n * (n - 1) // 2,
    )


def q_calibration_bins(spark, sf):
    """Reliability-diagram bins (operators/train.calibration_bins):
    fixed-point probabilities -> equal-width bins -> per-bin mean
    prediction vs observed positive rate, all integer-exact."""
    from hamerkop_spark.operators.train import calibration_bins

    li = _t(spark, sf, "lineitem")
    scored = li.select(
        ((F.col("l_partkey") % 997) / F.lit(996.0)).alias("prob"),
        (F.col("l_orderkey") % 3 == 0).cast("int").alias("label"),
    )
    return calibration_bins(scored, n_bins=10)


def q_er_uncertainty_queue(spark, sf):
    """Active-learning labeling queue (Lewis & Gale SIGIR '94;
    Sarawagi & Bhamidipaty KDD '02; operators/linkage.
    uncertainty_queue): top-50 scored pairs by closeness to the
    decision boundary, uncertainty = 1e6 - |2p-1| in exact millionth
    fixed point, selection via progressive.select_top_pairs."""
    from hamerkop_spark.operators.linkage import uncertainty_queue

    cust = _t(spark, sf, "customer").where(
        F.col("c_custkey") % 5 == 0
    ).select(F.col("c_custkey").alias("a_id"))
    supp = _t(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("b_id")
    )
    pairs = cust.join(
        supp, F.col("a_id") % 25 == F.col("b_id") % 25
    ).select(
        "a_id", "b_id",
        (
            ((F.col("a_id") * 31 + F.col("b_id") * 17) % 1009)
            / F.lit(1008.0)
        ).alias("match_prob"),
    )
    return uncertainty_queue(pairs, 50)


FS_M = {"g1": 0.95, "g2": 0.9, "g3": 0.8}
FS_U = {"g1": 0.5, "g2": 0.33, "g3": 0.14}
FS_TF_M = {"g_nat": 0.9, "g2": 0.9, "g3": 0.8}
FS_TF_U = {"g_nat": 0.04, "g2": 0.33, "g3": 0.14}


def q_fs_match_weight(spark, sf):
    """Fellegi-Sunter composite match weight (operators/linkage
    .fs_match_weight): per-field agreement indicators -> fixed-point
    integer log2 likelihood-ratio sum (no UDF, no float per row)."""
    from hamerkop_spark.operators.linkage import fs_match_weight

    cust = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("chain_id"),
        (F.col("c_custkey") % 25).alias("bkey"),
    )
    supp = _t(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        (F.col("s_suppkey") % 25).alias("bkey"),
    )
    cmp_df = cust.join(supp, "bkey").select(
        "chain_id",
        "entity_id",
        (F.col("chain_id") % 2 == F.col("entity_id") % 2).cast("int").alias("g1"),
        (F.col("chain_id") % 3 == F.col("entity_id") % 3).cast("int").alias("g2"),
        (F.col("chain_id") % 7 == F.col("entity_id") % 7).cast("int").alias("g3"),
    )
    return fs_match_weight(cmp_df, ["g1", "g2", "g3"], FS_M, FS_U)


def q_fs_tf_weight(spark, sf):
    """Term-frequency-adjusted Fellegi-Sunter weight (operators/
    linkage.fs_tf_match_weight, Winkler 1995 value-specific weights):
    the nation field's agreement weight is re-priced per agreeing
    VALUE from a corpus rarity table (tf_table — log2(N/n_v) in
    fixed-point), clamped to [dw, aw+8 bits]; the other two fields
    score as plain fs_match_weight."""
    from hamerkop_spark.operators.linkage import fs_tf_match_weight, tf_table

    cust = _t(spark, sf, "customer")
    tf = tf_table(cust.select(F.col("c_nationkey").alias("nat")), "nat")
    c = cust.select(
        F.col("c_custkey").alias("chain_id"),
        (F.col("c_custkey") % 25).alias("bkey"),
        F.col("c_nationkey").alias("a_nat"),
    )
    s = _t(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        (F.col("s_suppkey") % 25).alias("bkey"),
        F.col("s_nationkey").alias("b_nat"),
    )
    cmp_df = c.join(s, "bkey").select(
        "chain_id",
        "entity_id",
        "a_nat",
        (F.col("a_nat") == F.col("b_nat")).cast("int").alias("g_nat"),
        (F.col("chain_id") % 3 == F.col("entity_id") % 3).cast("int").alias("g2"),
        (F.col("chain_id") % 7 == F.col("entity_id") % 7).cast("int").alias("g3"),
    )
    out = fs_tf_match_weight(
        cmp_df, ["g_nat", "g2", "g3"], FS_TF_M, FS_TF_U,
        {"g_nat": ("a_nat", tf)},
    )
    return out.select(
        "chain_id", "entity_id", "g_nat", "g2", "g3", "a_nat", "fs_weight_fp"
    )


def _assignment_pairs(spark, sf, cap_chain=None, cap_ent=None):
    """Shared bipartite fixture for the assignment queries: block
    customers x suppliers on key%25, deterministic integer score."""
    cust = _t(spark, sf, "customer")
    if cap_chain:
        cust = cust.where(F.col("c_custkey") < cap_chain)
    supp = _t(spark, sf, "supplier")
    if cap_ent:
        supp = supp.where(F.col("s_suppkey") < cap_ent)
    c = cust.select(
        F.col("c_custkey").alias("chain_id"), (F.col("c_custkey") % 25).alias("bkey")
    )
    s = supp.select(
        F.col("s_suppkey").alias("entity_id"), (F.col("s_suppkey") % 25).alias("bkey")
    )
    return c.join(s, "bkey").select(
        "chain_id",
        "entity_id",
        ((F.col("chain_id") * 7 + F.col("entity_id") * 13) % 97).alias(
            "match_score"
        ),
    )


def q_r10_mutual_best(spark, sf):
    """Mutual-best (locally dominant) one-to-one filter
    (operators/linkage.mutual_best_match): keep (chain, entity) iff
    each is the other's argmax under (score desc, id asc) — two window
    row_numbers, no driver state."""
    from hamerkop_spark.operators.linkage import mutual_best_match

    return mutual_best_match(_assignment_pairs(spark, sf))


def q_r11_one_to_one(spark, sf):
    """Greedy one-to-one assignment via iterated locally-dominant
    extraction (operators/linkage.one_to_one_assignment), first 3
    rounds — the oracle unrolls the same 3 rounds, so the row set AND
    per-pair match_round must agree exactly."""
    from hamerkop_spark.operators.linkage import one_to_one_assignment

    pairs = _assignment_pairs(spark, sf, cap_chain=2000, cap_ent=500)
    return one_to_one_assignment(pairs, max_rounds=3)


def q_c8_cluster_ari(spark, sf):
    """Adjusted Rand Index between two clusterings of the customer set
    (operators/scoring.adjusted_rand_index): exact BIGINT pair counts
    from the contingency cells, chance-corrected in one fixed float
    evaluation order."""
    from hamerkop_spark.operators.scoring import adjusted_rand_index

    cust = _t(spark, sf, "customer")
    pred = cust.select(
        F.col("c_custkey").alias("mention_key"),
        F.col("c_mktsegment").alias("cluster"),
    )
    gold = cust.select(
        F.col("c_custkey").alias("mention_key"),
        (F.col("c_nationkey") % 7).cast("string").alias("cluster"),
    )
    return adjusted_rand_index(pred, gold)


def q_c9_pairwise_prf(spark, sf):
    """Pairwise precision/recall/F1 between two clusterings
    (operators/scoring.pairwise_cluster_prf) — the north-rule metric in
    cluster-vs-cluster form, pair counts exact, ratios fixed-point."""
    from hamerkop_spark.operators.scoring import pairwise_cluster_prf

    cust = _t(spark, sf, "customer")
    pred = cust.select(
        F.col("c_custkey").alias("mention_key"),
        F.col("c_mktsegment").alias("cluster"),
    )
    gold = cust.select(
        F.col("c_custkey").alias("mention_key"),
        F.concat(
            F.col("c_mktsegment"), F.lit("-"), (F.col("c_nationkey") % 3).cast("string")
        ).alias("cluster"),
    )
    return pairwise_cluster_prf(pred, gold)


def q_c10_blanc(spark, sf):
    """BLANC (Recasens & Hovy 2011) between two clusterings of the
    customer set (operators/scoring.blanc): Rand-index-style average of
    the coref-link F and the non-coref-link F — exact BIGINT link
    counts from the contingency cells, division-only fixed-point
    ratios. Completes the coref-metric set (MUC/B³ scoring.py:63,94,
    CEAF scoring.py:502)."""
    from hamerkop_spark.operators.scoring import blanc

    cust = _t(spark, sf, "customer")
    pred = cust.select(
        F.col("c_custkey").alias("mention_key"),
        F.col("c_mktsegment").alias("cluster"),
    )
    gold = cust.select(
        F.col("c_custkey").alias("mention_key"),
        (F.col("c_nationkey") % 5).cast("string").alias("cluster"),
    )
    return blanc(pred, gold)


def q_cluster_audit(spark, sf):
    """Transitive-closure integrity audit (operators/scoring.
    cluster_audit): per-cluster density / weakest-edge metrics that
    flag chaining. Clusters = segment-nation buckets; edges = +7
    custkey neighbors with a deterministic score."""
    from hamerkop_spark.operators.scoring import cluster_audit

    cust = _t(spark, sf, "customer")
    asg = cust.select(
        F.col("c_custkey").alias("mention_key"),
        F.concat_ws(
            "-", "c_mktsegment", (F.col("c_nationkey") % 5).cast("string")
        ).alias("cluster"),
    )
    a = cust.select(F.col("c_custkey").alias("a_id"))
    edges = (
        a.select("a_id", (F.col("a_id") + 7).alias("b_id"))
        .join(cust.select(F.col("c_custkey").alias("b_id")), "b_id")
        .withColumn(
            "score",
            ((F.col("a_id") + F.col("b_id")) % 97).cast("double") / 100.0,
        )
    )
    return cluster_audit(asg, edges)


def q_f_tfidf_cosine(spark, sf):
    """TF-IDF cosine name/document similarity (functions/tfidf):
    corpus IDF fixed-pointed per token (the B3 convention), per-record
    sparse vectors built once, pair dot via (record, token) equi-join.
    Cohen et al. 2003's strongest exact-kernel name measure."""
    from hamerkop_spark.functions.tfidf import (
        tfidf_cosine_pairs,
        tfidf_norms,
        tfidf_weights,
        token_idf,
    )

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("record_id"),
        F.slice(F.split(F.col("text"), " "), 1, 10).alias("tokens"),
    )
    idf = token_idf(docs, "tokens")
    w = tfidf_weights(docs, idf)
    n = tfidf_norms(w)
    a = docs.where(F.col("record_id") % 10 == 0).select(
        F.col("record_id").alias("a_id"), (F.col("record_id") % 5).alias("bk")
    )
    b = docs.where(F.col("record_id") % 7 == 3).select(
        F.col("record_id").alias("b_id"), (F.col("record_id") % 5).alias("bk")
    )
    pairs = a.join(b, "bk").select("a_id", "b_id")
    return tfidf_cosine_pairs(pairs, w, n)


def q_fs_three_band(spark, sf):
    """Fellegi-Sunter three-way decision (F-S 1969 §3): match /
    clerical-review / non-match bands at error-bounded thresholds
    (operators/linkage.fs_three_band + fs_model_thresholds). The
    thresholds come from the model-enumerated sweep, so the oracle
    embeds the identical literals."""
    from hamerkop_spark.operators.linkage import (
        fs_model_thresholds,
        fs_three_band,
    )

    cust = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("chain_id"),
        (F.col("c_custkey") % 25).alias("bkey"),
    )
    supp = _t(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        (F.col("s_suppkey") % 25).alias("bkey"),
    )
    cmp_df = cust.join(supp, "bkey").select(
        "chain_id",
        "entity_id",
        (F.col("chain_id") % 2 == F.col("entity_id") % 2).cast("int").alias("g1"),
        (F.col("chain_id") % 3 == F.col("entity_id") % 3).cast("int").alias("g2"),
        (F.col("chain_id") % 7 == F.col("entity_id") % 7).cast("int").alias("g3"),
    )
    th = fs_model_thresholds(
        ["g1", "g2", "g3"], FS_M, FS_U, mu=0.05, lam=0.05
    )
    return fs_three_band(
        cmp_df, ["g1", "g2", "g3"], FS_M, FS_U,
        th["upper_fp"], th["lower_fp"],
    )


FS_LVL_M = {"s1": [0.05, 0.15, 0.80], "s2": [0.2, 0.8]}
FS_LVL_U = {"s1": [0.70, 0.20, 0.10], "s2": [0.8, 0.2]}


def q_fs_level_weight(spark, sf):
    """Winkler multi-level Fellegi-Sunter weight (operators/linkage
    .fs_match_weight_levels + field_agreement_levels): a 3-level
    ordinal agreement from a similarity column plus a binary field,
    scored as a fixed-point integer CASE-sum."""
    from hamerkop_spark.operators.linkage import (
        field_agreement_levels,
        fs_match_weight_levels,
    )

    pairs = _assignment_pairs(spark, sf)
    sim = ((F.col("chain_id") * 11 + F.col("entity_id") * 3) % 100) / F.lit(
        100.0
    )
    cmp_df = pairs.select(
        "chain_id",
        "entity_id",
        field_agreement_levels(sim, cuts=(0.5, 0.9)).alias("s1"),
        (F.col("chain_id") % 5 == F.col("entity_id") % 5).cast("int").alias(
            "s2"
        ),
    )
    return fs_match_weight_levels(cmp_df, ["s1", "s2"], FS_LVL_M, FS_LVL_U)


def q_fs_review_sample(spark, sf):
    """Deterministic stratified clerical-review sample over the
    three-band output (operators/linkage.sample_for_review): md5-range
    pre-filter per stratum, then exact top-n by hash order — same rows
    from any engine, any resume."""
    from hamerkop_spark.operators.linkage import sample_for_review

    return sample_for_review(q_fs_three_band(spark, sf), 20)


def q_er_dedupe_plan(spark, sf):
    """One-call self-dedup plan end to end (plans/dedupe.dedupe_records):
    blocking self-join -> vectorized JW -> threshold -> CC -> cluster
    mapping. Exact blocking at threshold 1.0 makes every name group a
    clique, so the CC component is the group's string-min id — exactly
    expressible in SQL while still executing the full plan machinery."""
    from hamerkop_spark.plans.dedupe import dedupe_records

    recs = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("record_id"),
        F.concat(F.lit("cust "), (F.col("c_custkey") % 400).cast("string"))
        .alias("name"),
    )
    out = dedupe_records(
        recs, blocking=("exact",), jw_threshold=1.0, max_block=200
    )
    return out["clusters"]


def q_er_golden_record(spark, sf):
    """Survivorship: modal non-null value per (cluster, attribute) with
    deterministic tie-breaks (operators/canonical.golden_record) —
    melt, count, window argmax, conditional re-widen. `grade` is
    nullable so the null-survives-only-when-all-null rule is covered."""
    from hamerkop_spark.operators.canonical import golden_record

    cust = _t(spark, sf, "customer")
    recs = cust.select(
        (F.col("c_nationkey") % 5).cast("string").alias("cluster"),
        F.col("c_mktsegment").alias("segment"),
        F.when(
            F.col("c_custkey") % 7 != 0, (F.col("c_custkey") % 3).cast("string")
        ).alias("grade"),
    )
    return golden_record(recs, ["segment", "grade"])


def q_er_rep_name(spark, sf):
    """Canonical surface form per cluster
    (operators/canonical.representative_name): most frequent name,
    ties to longest then lexicographically smallest."""
    from hamerkop_spark.operators.canonical import representative_name

    part = _t(spark, sf, "part")
    mentions = part.select(
        F.col("p_brand").alias("cluster"), F.col("p_name").alias("name")
    )
    return representative_name(mentions)


def q_r12_coherence(spark, sf):
    """Collective (document-level) coherence disambiguation
    (operators/collective.coherence_rerank): candidates related in the
    KB support each other across a document's chains — fixed-point
    Milne-Witten-style link-Jaccard relatedness, two message-passing
    rounds, λ=0.6 blend, top-3 prune. Entities are parts (links = the
    p_type tokens + p_brand), documents are orders, chains the
    lineitems; candidates are the ±2 partkey neighborhood with a
    distance-decayed local score. Everything after the per-chain
    min-max is exact bigint micro-unit arithmetic, so the two engines
    hash-match bit for bit."""
    from hamerkop_spark.operators.collective import coherence_rerank

    part = _t(spark, sf, "part").where(F.col("p_partkey") <= 200)
    links = part.select(
        F.col("p_partkey").alias("entity_id"),
        F.explode(
            F.array_distinct(
                F.concat(F.split("p_type", " "), F.array(F.col("p_brand")))
            )
        ).alias("link"),
    )
    chains = (
        _t(spark, sf, "lineitem")
        .where(
            (F.col("l_orderkey") <= 6000)
            & F.col("l_partkey").between(3, 198)
        )
        .select(
            F.col("l_orderkey").alias("doc_id"),
            F.concat(
                F.col("l_linenumber").cast("string"),
                F.lit("-"),
                F.col("l_partkey").cast("string"),
            ).alias("chain_id"),
            F.col("l_partkey").alias("base"),
        )
        .distinct()
    )
    cand = chains.select(
        "doc_id",
        "chain_id",
        "base",
        F.explode(F.sequence(F.lit(-2), F.lit(2))).alias("off"),
    ).select(
        "doc_id",
        "chain_id",
        (F.col("base") + F.col("off")).alias("entity_id"),
        (F.lit(10.0) - F.abs(F.col("off"))).alias("score"),
    )
    # inner join to the entity table: only real entities are candidates
    # (and it pins the partkey universe identically to the SQL mirror)
    cand = cand.join(
        part.select(F.col("p_partkey").alias("entity_id")), "entity_id"
    )
    return coherence_rerank(
        cand, links, lam_micro=600_000, iterations=2, top_k=3
    )


def q_pprl_dice(spark, sf):
    """Privacy-preserving linkage (operators/pprl): Bloom-filter CLK
    position encodings (keyed double-hash of padded bigrams, Schnell
    2009 / Kirsch-Mitzenmacher) + fixed-point Dice matching. Two
    "parties" derive from part: A = p_name, B = p_name truncated by
    one char. The oracle blocks on the minimum set bit (SQL-exact in
    both engines); the production path's minhash-LSH blocking is
    xxhash64-based and pytest-gated instead (test_pprl)."""
    from hamerkop_spark.operators.pprl import clk_positions, dice_micro

    part = _t(spark, sf, "part").where(F.col("p_partkey") <= 300)
    pad = lambda c: F.concat(  # noqa: E731 — t6-style padding
        F.lit("_"), F.translate(F.trim(F.lower(c)), " ", "_"), F.lit("_")
    )
    enc = lambda c: clk_positions(  # noqa: E731
        pad(c), n_bits=512, k=10, salt="s1"
    )
    a = part.select(
        F.col("p_partkey").alias("a_key"),
        enc(F.col("p_name")).alias("a_pos"),
    ).where(F.size("a_pos") >= 1)
    b = part.select(
        F.col("p_partkey").alias("b_key"),
        enc(
            F.expr("substring(p_name, 1, length(p_name) - 1)")
        ).alias("b_pos"),
    ).where(F.size("b_pos") >= 1)
    a = a.withColumn("blk", F.element_at("a_pos", 1))
    b = b.withColumn("blk", F.element_at("b_pos", 1))
    return (
        a.join(b, "blk")
        .select(
            "a_key", "b_key",
            dice_micro(F.col("a_pos"), F.col("b_pos")).alias("dice_micro"),
        )
        .where(F.col("dice_micro") >= 500000)
    )


def q_er_group_linkage(spark, sf):
    """Group (household) linkage (operators/linkage.group_linkage, On
    et al. 2007): per-(group pair) greedy one-to-one matching of
    scored member pairs, normalized by the larger group size. Groups
    are customers/suppliers bucketed mod 40; candidate group pairs are
    the diagonal and its +1 shift; 3 assignment rounds capped
    identically on both engines (the SQL unrolls them QUALIFY-style
    like r11_one_to_one, with composite partition keys)."""
    from hamerkop_spark.operators.linkage import group_linkage

    cust = (
        _t(spark, sf, "customer")
        .where(F.col("c_custkey") <= 600)
        .select(
            (F.col("c_custkey") % 40).alias("ga_key"),
            F.col("c_custkey").alias("a_id"),
        )
    )
    supp = (
        _t(spark, sf, "supplier")
        .where(F.col("s_suppkey") <= 300)
        .select(
            (F.col("s_suppkey") % 40).alias("gb_key"),
            F.col("s_suppkey").alias("b_id"),
        )
    )
    mp = None
    for shift in (0, 1):
        part = (
            cust.withColumn("gb_key", (F.col("ga_key") + F.lit(shift)) % 40)
            .join(supp, "gb_key")
        )
        mp = part if mp is None else mp.unionByName(part)
    mp = mp.select(
        F.col("ga_key").alias("group_a"),
        F.col("gb_key").alias("group_b"),
        "a_id", "b_id",
        ((F.col("a_id") * 3 + F.col("b_id") * 7) % 100).alias("score"),
    )
    sizes_a = cust.groupBy(F.col("ga_key").alias("group_a")).agg(
        F.count("*").alias("n_a")
    )
    sizes_b = supp.groupBy(F.col("gb_key").alias("group_b")).agg(
        F.count("*").alias("n_b")
    )
    out = group_linkage(mp, sizes_a, sizes_b, max_rounds=3)
    return out.select(
        "group_a", "group_b", "n_matched", "sum_score", "n_a", "n_b",
        F.floor(
            F.lit(1000000) * F.col("sum_score")
            / (F.lit(100) * F.greatest("n_a", "n_b"))
        ).cast("long").alias("sim_micro"),
    )


def q_er_pr_curve(spark, sf):
    """Threshold sweep (operators/scoring.pr_curve): exact cumulative
    tp/fp/fn per distinct score via one histogram + one ordered
    window; precision/recall/F1 as floor(1e6·ratio) of exact integer
    counts (f1 = 2tp/(2tp+fp+fn))."""
    from hamerkop_spark.operators.scoring import pr_curve

    li = _t(spark, sf, "lineitem").where(F.col("l_orderkey") <= 8000)
    scored = li.select(
        ((F.col("l_partkey") * 13 + F.col("l_suppkey") * 7) % 50)
        .cast("double").alias("score"),
        ((F.col("l_orderkey") + F.col("l_partkey")) % 3 == 0)
        .alias("is_match"),
    )
    return pr_curve(scored)


def q_er_swoosh(spark, sf):
    """Swoosh merge-closure ER (operators/swoosh.py; Benjelloun et al.
    VLDB J 2009): records = first-5 word sets of documents.text, match
    = >=4 shared distinct tokens, union merge, re-matched on the
    composites to the fixpoint. At sf0.01 this takes 4 merge rounds
    (500 records -> 15 entities) where single-pass CC over the BASE
    pair graph leaves 411 — the merge-enabled cascade is what the
    decision-based operators cannot produce. Oracle: the identical
    round algebra unrolled 6x in SQL (rounds past the fixpoint are
    exact no-ops: empty pair set -> identity components)."""
    from hamerkop_spark.operators.swoosh import swoosh_merge

    docs = _t(spark, sf, "documents")
    recs = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("record_id"),
        F.array_remove(
            F.slice(F.split(F.col("text"), " "), 1, 5), ""
        ).alias("values"),
    )
    entities, membership = swoosh_merge(recs, min_shared=4)
    ent = entities.select(
        "entity_id",
        F.size("values").cast("bigint").alias("entity_tokens"),
        "n_members",
    )
    return membership.join(ent, "entity_id").select(
        F.col("record_id").cast("bigint").alias("record_id"),
        F.col("entity_id").cast("bigint").alias("entity_id"),
        "entity_tokens",
        "n_members",
    )


def _swoosh_oracle_sql(rounds: int = 6, min_shared: int = 4,
                       k: int = 5) -> str:
    """Unrolled merge-closure SQL twin of q_er_swoosh: `rounds` copies
    of (pair-match >= min_shared, recursive-CTE transitive closure,
    min-id relabel). Any round past the data's fixpoint is an exact
    no-op (no pairs -> identity closure -> identity relabel), so the
    unroll depth only needs to be >= the true round count (measured: 4
    at sf0.001/sf0.01, 2 at sf0.1; 6 leaves margin)."""
    parts = [f"""rec0 AS MATERIALIZED (
          SELECT DISTINCT doc_id AS rid, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')[1:{k}]) AS tok
            FROM documents) WHERE tok <> ''
        ), map0 AS MATERIALIZED (
          SELECT doc_id AS record_id, doc_id AS rid FROM documents
        )"""]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f"""pairs{i} AS MATERIALIZED (
          SELECT a.rid AS s, b.rid AS d
          FROM rec{p} a JOIN rec{p} b ON a.tok = b.tok AND a.rid < b.rid
          GROUP BY 1, 2 HAVING count(*) >= {min_shared}
        ), sym{i} AS MATERIALIZED (
          SELECT s, d FROM pairs{i} UNION SELECT d, s FROM pairs{i}
        ), reach{i}(node, r) AS (
          SELECT rid, rid FROM (SELECT DISTINCT rid FROM map{p})
          UNION
          SELECT q.node, e.d FROM reach{i} q JOIN sym{i} e ON e.s = q.r
        ), comp{i} AS MATERIALIZED (
          SELECT node, min(r) AS c FROM reach{i} GROUP BY node
        ), rec{i} AS MATERIALIZED (
          SELECT DISTINCT c.c AS rid, t.tok
          FROM rec{p} t JOIN comp{i} c ON t.rid = c.node
        ), map{i} AS MATERIALIZED (
          SELECT m.record_id, c.c AS rid
          FROM map{p} m JOIN comp{i} c ON m.rid = c.node
        )""")
    n = rounds
    return (
        "WITH RECURSIVE " + ",\n".join(parts) + f"""
        , ent AS (
          SELECT rid, count(*) AS entity_tokens FROM rec{n} GROUP BY rid
        ), mem AS (
          SELECT rid, count(*) AS n_members FROM map{n} GROUP BY rid
        )
        SELECT m.record_id, m.rid AS entity_id,
               coalesce(e.entity_tokens, 0) AS entity_tokens,
               mm.n_members
        FROM map{n} m
        LEFT JOIN ent e ON e.rid = m.rid
        JOIN mem mm ON mm.rid = m.rid"""
    )


def q_er_hac_clusters(spark, sf):
    """Threshold average-linkage HAC (operators/hac.py; the `dedupe`
    toolchain's cut-threshold agglomeration, Bilenko & Mooney KDD
    2003) over a deterministic weighted pair graph derived from
    part keys: nodes = p_partkey, edges within 8-key groups kept at
    75% density by a key hash, integer micro-unit weights
    (a*2654435761 + b*40503) % 9000 + 1000, cut at 5500. Exercises
    the full operator path: CC component tagging -> per-component
    applyInPandas exact integer merge loop. Oracle: the identical
    per-group argmax merge algebra unrolled 7x in SQL (one merge per
    group per round; 8-node groups need <= 7 merges, and within a
    group the group-argmax sequence executes exactly the
    per-component argmax sequences, so rounds past the fixpoint are
    exact no-ops)."""
    from hamerkop_spark.operators.hac import hac_clusters

    p = _t(spark, sf, "part").select(
        F.col("p_partkey").cast("bigint").alias("r")
    )
    g = p.select("r", (F.col("r") - F.col("r") % 8).alias("g"))
    a = g.select(F.col("r").alias("a_id"), "g")
    b = g.select(F.col("r").alias("b_id"), "g")
    edges = (
        a.join(b, "g")
        .where(F.col("a_id") < F.col("b_id"))
        .where((F.col("a_id") * 7 + F.col("b_id") * 13) % 4 < 3)
        .select(
            "a_id",
            "b_id",
            (
                (
                    F.col("a_id") * F.lit(2654435761)
                    + F.col("b_id") * 40503
                ) % 9000
                + 1000
            ).alias("w_micro"),
        )
    )
    return hac_clusters(edges, threshold_micro=5500)


def _hac_oracle_sql(rounds: int = 7, thr: int = 5500) -> str:
    """Unrolled HAC SQL twin of q_er_hac_clusters: `rounds` copies of
    (cluster-pair linkage sums over the base edges, per-group argmax
    among pairs passing the cut — exact integer cross-product compare
    s1*n2 vs s2*n1 with the ascending (px,py) tie-break — one merge
    per group). Groups hold <= 8 nodes so <= 7 merges ever happen in
    one group; each productive round performs exactly one, and rounds
    past a group's fixpoint are exact no-ops (no passing pair -> no
    best row -> identity relabel)."""
    parts = [f"""nodes AS (
          SELECT CAST(p_partkey AS BIGINT) AS r FROM part
        ), base AS MATERIALIZED (
          SELECT a.r AS a, b.r AS b,
                 (a.r * 2654435761 + b.r * 40503) % 9000 + 1000 AS w
          FROM nodes a JOIN nodes b
            ON a.r - a.r % 8 = b.r - b.r % 8 AND a.r < b.r
          WHERE (a.r * 7 + b.r * 13) % 4 < 3
        ), m0 AS MATERIALIZED (
          SELECT DISTINCT node, node AS rep FROM (
            SELECT a AS node FROM base UNION ALL SELECT b FROM base)
        )"""]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f"""cl{i} AS (
          SELECT least(ma.rep, mb.rep) AS px,
                 greatest(ma.rep, mb.rep) AS py, sum(e.w) AS s
          FROM base e
          JOIN m{p} ma ON e.a = ma.node
          JOIN m{p} mb ON e.b = mb.node
          WHERE ma.rep <> mb.rep GROUP BY 1, 2
        ), sz{i} AS (
          SELECT rep, count(*) AS n FROM m{p} GROUP BY rep
        ), ok{i} AS MATERIALIZED (
          SELECT c.px, c.py, c.s, nx.n * ny.n AS nxy
          FROM cl{i} c
          JOIN sz{i} nx ON c.px = nx.rep
          JOIN sz{i} ny ON c.py = ny.rep
          WHERE c.s >= {thr} * nx.n * ny.n
        ), best{i} AS MATERIALIZED (
          SELECT p.px, p.py FROM ok{i} p WHERE NOT EXISTS (
            SELECT 1 FROM ok{i} q
            WHERE q.px - q.px % 8 = p.px - p.px % 8
              AND (q.px <> p.px OR q.py <> p.py)
              AND (q.s * p.nxy > p.s * q.nxy
                   OR (q.s * p.nxy = p.s * q.nxy
                       AND (q.px < p.px
                            OR (q.px = p.px AND q.py < p.py))))
          )
        ), m{i} AS MATERIALIZED (
          SELECT m.node, coalesce(b.px, m.rep) AS rep
          FROM m{p} m LEFT JOIN best{i} b ON m.rep = b.py
        )""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node AS record_id, rep AS cluster_id FROM m{rounds}"
    )


def q_er_lpa_clusters(spark, sf):
    """Weighted synchronous label propagation (operators/lpa.py;
    Raghavan et al. 2007, weighted votes per Barber & Clark 2009)
    over a deterministic weighted pair graph on 16-key p_partkey
    groups (60% edge density by key hash, integer micro-unit
    weights) for exactly 4 synchronous rounds — the O(E)-per-round
    weighted partitioner of the clustering matrix. Oracle: the
    identical round algebra unrolled 4x in SQL (neighbour-label
    vote sums plus the max-incident self-retention vote of Leung
    et al. 2009, per-node argmax with the min-label tie-break — all
    integer, so bit-exact; the operator's fixpoint early-exit is a
    provable no-op vs the fixed-round unroll)."""
    from hamerkop_spark.operators.lpa import label_propagation

    p = _t(spark, sf, "part").select(
        F.col("p_partkey").cast("bigint").alias("r")
    )
    g = p.select("r", (F.col("r") - F.col("r") % 16).alias("g"))
    a = g.select(F.col("r").alias("a_id"), "g")
    b = g.select(F.col("r").alias("b_id"), "g")
    edges = (
        a.join(b, "g")
        .where(F.col("a_id") < F.col("b_id"))
        .where((F.col("a_id") * 11 + F.col("b_id") * 3) % 5 < 3)
        .select(
            "a_id",
            "b_id",
            (
                (
                    F.col("a_id") * F.lit(2654435761)
                    + F.col("b_id") * 40503
                ) % 9000
                + 1000
            ).alias("w_micro"),
        )
    )
    return label_propagation(edges, rounds=4)


def _lpa_oracle_sql(rounds: int = 4) -> str:
    """Unrolled LPA SQL twin of q_er_lpa_clusters: `rounds` copies of
    (neighbour-label vote sum UNION the static max-incident
    self-retention vote, per-node argmax with exact integer compare
    and the min-label tie-break). Synchronous and deterministic, so
    the unroll replays the operator bit-exactly; rounds past a
    fixpoint reproduce the same labels (no-op)."""
    parts = ["""nodes AS (
          SELECT CAST(p_partkey AS BIGINT) AS r FROM part
        ), e AS MATERIALIZED (
          SELECT a.r AS a, b.r AS b,
                 (a.r * 2654435761 + b.r * 40503) % 9000 + 1000 AS w
          FROM nodes a JOIN nodes b
            ON a.r - a.r % 16 = b.r - b.r % 16 AND a.r < b.r
          WHERE (a.r * 11 + b.r * 3) % 5 < 3
        ), sym AS MATERIALIZED (
          SELECT a AS v, b AS u, w FROM e
          UNION ALL SELECT b AS v, a AS u, w FROM e
        ), mw AS MATERIALIZED (
          SELECT v, max(w) AS mw FROM sym GROUP BY v
        ), lab0 AS MATERIALIZED (
          SELECT DISTINCT v AS node, v AS lab FROM sym
        )"""]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f"""nb{i} AS (
          SELECT v, lab, sum(w) AS s FROM (
            SELECT sy.v AS v, l.lab AS lab, sy.w AS w
            FROM sym sy JOIN lab{p} l ON sy.u = l.node
            UNION ALL
            SELECT l.node AS v, l.lab AS lab, m.mw AS w
            FROM lab{p} l JOIN mw m ON l.node = m.v
          ) GROUP BY 1, 2
        ), lab{i} AS MATERIALIZED (
          SELECT p.v AS node, p.lab FROM nb{i} p WHERE NOT EXISTS (
            SELECT 1 FROM nb{i} q WHERE q.v = p.v
              AND (q.s > p.s OR (q.s = p.s AND q.lab < p.lab))
          )
        )""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node AS record_id, lab AS cluster_id FROM lab{rounds}"
    )


def q_er_constrained_clusters(spark, sf):
    """Cannot-link constrained greedy agglomeration
    (operators/constrained.py; Wagstaff & Cardie ICML 2000
    COP-constraints) over the same deterministic 8-key-group weighted
    pair graph as er_hac_clusters, with cannot-link pairs at
    (a*5 + b*7) % 11 == 0 — the clerical-review enforcement rule:
    descending-weight union-find sweep that skips any union joining a
    constrained pair. Oracle: 'repeatedly merge the max-weight VALID
    cross edge' unrolled 7x in SQL (equivalent to the one-pass sweep
    because constraint violations are monotone under cluster growth;
    per-group argmax executes the per-component sequences exactly, as
    in the HAC oracle)."""
    from hamerkop_spark.operators.constrained import constrained_clusters

    p = _t(spark, sf, "part").select(
        F.col("p_partkey").cast("bigint").alias("r")
    )
    g = p.select("r", (F.col("r") - F.col("r") % 8).alias("g"))
    a = g.select(F.col("r").alias("a_id"), "g")
    b = g.select(F.col("r").alias("b_id"), "g")
    pairs = a.join(b, "g").where(F.col("a_id") < F.col("b_id"))
    edges = pairs.where(
        (F.col("a_id") * 7 + F.col("b_id") * 13) % 4 < 3
    ).select(
        "a_id",
        "b_id",
        (
            (F.col("a_id") * F.lit(2654435761) + F.col("b_id") * 40503)
            % 9000
            + 1000
        ).alias("w_micro"),
    )
    cons = pairs.where(
        (F.col("a_id") * 5 + F.col("b_id") * 7) % 11 == 0
    ).select("a_id", "b_id")
    return constrained_clusters(edges, cons)


def _constrained_oracle_sql(rounds: int = 7) -> str:
    """Unrolled constrained-agglomeration SQL twin of
    q_er_constrained_clusters: `rounds` copies of (cross-cluster
    edges under current membership, validity = no cannot-link pair
    whose endpoint reps are exactly the edge's two cluster reps,
    per-group argmax by (w DESC, a ASC, b ASC), one merge per
    group). Violations are monotone under cluster growth, so the
    repeated-argmax form equals the operator's one-pass descending
    sweep; 8-node groups need <= 7 merges and later rounds are
    exact no-ops."""
    parts = ["""nodes AS (
          SELECT CAST(p_partkey AS BIGINT) AS r FROM part
        ), base AS MATERIALIZED (
          SELECT a.r AS a, b.r AS b,
                 (a.r * 2654435761 + b.r * 40503) % 9000 + 1000 AS w
          FROM nodes a JOIN nodes b
            ON a.r - a.r % 8 = b.r - b.r % 8 AND a.r < b.r
          WHERE (a.r * 7 + b.r * 13) % 4 < 3
        ), cons AS MATERIALIZED (
          SELECT a.r AS a, b.r AS b
          FROM nodes a JOIN nodes b
            ON a.r - a.r % 8 = b.r - b.r % 8 AND a.r < b.r
          WHERE (a.r * 5 + b.r * 7) % 11 = 0
        ), m0 AS MATERIALIZED (
          SELECT DISTINCT node, node AS rep FROM (
            SELECT a AS node FROM base UNION ALL SELECT b FROM base)
        )"""]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f"""xe{i} AS (
          SELECT e.a, e.b, e.w,
                 least(ma.rep, mb.rep) AS px,
                 greatest(ma.rep, mb.rep) AS py
          FROM base e
          JOIN m{p} ma ON e.a = ma.node
          JOIN m{p} mb ON e.b = mb.node
          WHERE ma.rep <> mb.rep
        ), valid{i} AS MATERIALIZED (
          SELECT * FROM xe{i} c WHERE NOT EXISTS (
            SELECT 1 FROM cons k
            JOIN m{p} mp ON k.a = mp.node
            JOIN m{p} mq ON k.b = mq.node
            WHERE (mp.rep = c.px AND mq.rep = c.py)
               OR (mp.rep = c.py AND mq.rep = c.px)
          )
        ), best{i} AS MATERIALIZED (
          SELECT p.px, p.py FROM valid{i} p WHERE NOT EXISTS (
            SELECT 1 FROM valid{i} q
            WHERE q.px - q.px % 8 = p.px - p.px % 8
              AND (q.a <> p.a OR q.b <> p.b)
              AND (q.w > p.w
                   OR (q.w = p.w
                       AND (q.a < p.a OR (q.a = p.a AND q.b < p.b))))
          )
        ), m{i} AS MATERIALIZED (
          SELECT m.node, coalesce(b.px, m.rep) AS rep
          FROM m{p} m LEFT JOIN best{i} b ON m.rep = b.py
        )""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node AS record_id, rep AS cluster_id FROM m{rounds}"
    )


def q_er_hac_complete(spark, sf):
    """Complete-linkage HAC (operators/hac.py, linkage='complete'):
    the strict clique-style cut — a cluster pair merges only when
    EVERY cross pair is observed and its weakest cross weight clears
    the threshold — over the same deterministic 8-key-group weighted
    pair graph as er_hac_clusters, cut at 3000. Oracle: the
    (count, min) merge algebra unrolled 7x in SQL with a plain
    integer argmax on the min weight (same per-group-argmax
    equivalence as the average-linkage oracle)."""
    from hamerkop_spark.operators.hac import hac_clusters

    p = _t(spark, sf, "part").select(
        F.col("p_partkey").cast("bigint").alias("r")
    )
    g = p.select("r", (F.col("r") - F.col("r") % 8).alias("g"))
    a = g.select(F.col("r").alias("a_id"), "g")
    b = g.select(F.col("r").alias("b_id"), "g")
    edges = (
        a.join(b, "g")
        .where(F.col("a_id") < F.col("b_id"))
        .where((F.col("a_id") * 7 + F.col("b_id") * 13) % 4 < 3)
        .select(
            "a_id",
            "b_id",
            (
                (
                    F.col("a_id") * F.lit(2654435761)
                    + F.col("b_id") * 40503
                ) % 9000
                + 1000
            ).alias("w_micro"),
        )
    )
    return hac_clusters(edges, threshold_micro=3000, linkage="complete")


def _hac_complete_oracle_sql(rounds: int = 7, thr: int = 3000) -> str:
    """Unrolled complete-linkage SQL twin of q_er_hac_complete:
    cluster-pair state is (count(*), min(w)) over the base edges
    under current membership; a pair is mergeable when count equals
    |A|*|B| (no unscored cross pair) and min(w) >= thr; per-group
    argmax on min(w) with the ascending (px,py) tie-break. Same
    one-merge-per-group-per-round unroll and no-op-past-fixpoint
    argument as _hac_oracle_sql."""
    parts = ["""nodes AS (
          SELECT CAST(p_partkey AS BIGINT) AS r FROM part
        ), base AS MATERIALIZED (
          SELECT a.r AS a, b.r AS b,
                 (a.r * 2654435761 + b.r * 40503) % 9000 + 1000 AS w
          FROM nodes a JOIN nodes b
            ON a.r - a.r % 8 = b.r - b.r % 8 AND a.r < b.r
          WHERE (a.r * 7 + b.r * 13) % 4 < 3
        ), m0 AS MATERIALIZED (
          SELECT DISTINCT node, node AS rep FROM (
            SELECT a AS node FROM base UNION ALL SELECT b FROM base)
        )"""]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f"""cl{i} AS (
          SELECT least(ma.rep, mb.rep) AS px,
                 greatest(ma.rep, mb.rep) AS py,
                 count(*) AS c, min(e.w) AS mn
          FROM base e
          JOIN m{p} ma ON e.a = ma.node
          JOIN m{p} mb ON e.b = mb.node
          WHERE ma.rep <> mb.rep GROUP BY 1, 2
        ), sz{i} AS (
          SELECT rep, count(*) AS n FROM m{p} GROUP BY rep
        ), ok{i} AS MATERIALIZED (
          SELECT c.px, c.py, c.mn
          FROM cl{i} c
          JOIN sz{i} nx ON c.px = nx.rep
          JOIN sz{i} ny ON c.py = ny.rep
          WHERE c.c = nx.n * ny.n AND c.mn >= {thr}
        ), best{i} AS MATERIALIZED (
          SELECT p.px, p.py FROM ok{i} p WHERE NOT EXISTS (
            SELECT 1 FROM ok{i} q
            WHERE q.px - q.px % 8 = p.px - p.px % 8
              AND (q.px <> p.px OR q.py <> p.py)
              AND (q.mn > p.mn
                   OR (q.mn = p.mn
                       AND (q.px < p.px
                            OR (q.px = p.px AND q.py < p.py))))
          )
        ), m{i} AS MATERIALIZED (
          SELECT m.node, coalesce(b.px, m.rep) AS rep
          FROM m{p} m LEFT JOIN best{i} b ON m.rep = b.py
        )""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node AS record_id, rep AS cluster_id FROM m{rounds}"
    )


def q_block_meta_wep(spark, sf):
    """Weighted Edge Pruning meta-blocking with ECBS weights (Papadakis
    TKDE '14, operators/blocking_eval.meta_blocking_wep): the global
    mean-weight bar over the same token-blocking graph block_meta_cnp
    prunes per-node."""
    from hamerkop_spark.operators.blocking_eval import meta_blocking_wep

    part = _t(spark, sf, "part").where(
        (F.col("p_partkey") % 10 == 0) & (F.col("p_partkey") < 5000)
    )
    blocks = part.select(
        F.explode(F.split(F.lower("p_name"), " ")).alias("block_key"),
        F.col("p_partkey").alias("record_id"),
    )
    return meta_blocking_wep(blocks, max_block_size=100, scheme="ecbs")


def q_dedup_winnow(spark, sf):
    """Winnowing shared-passage detection (Schleimer et al. SIGMOD '03,
    operators/dedup.winnow_fingerprints/winnow_overlap_pairs): k=8
    grams, window 4, md5-60bit hashes (the oracle-checkable path),
    hot-fingerprint purge at df 50, pairs at >= 3 shared
    fingerprints."""
    from hamerkop_spark.operators.dedup import winnow_overlap_pairs

    docs = _t(spark, sf, "documents").where(F.col("doc_id") % 5 == 0)
    return winnow_overlap_pairs(
        docs, k=8, window=4, max_df=50, min_shared=3, hash_fn="md5"
    )


def q_block_adaptive_sn(spark, sf):
    """Adaptive sorted-neighborhood blocking (Yan et al. JCDL '07,
    operators/blocking_eval.adaptive_sorted_neighborhood): cut the
    sort order where adjacent keys jump (lev > 6), pair within the
    variable blocks. Same bounded record set as the other blocking
    queries."""
    from hamerkop_spark.operators.blocking_eval import (
        adaptive_sorted_neighborhood,
    )

    part = _t(spark, sf, "part").where(
        (F.col("p_partkey") % 10 == 0) & (F.col("p_partkey") < 5000)
    )
    recs = part.select("p_partkey", F.lower(F.col("p_name")).alias("nm"))
    return adaptive_sorted_neighborhood(
        recs, key_col="nm", id_col="p_partkey",
        max_key_dist=6, max_block_size=50,
    )


def q_block_meta_rcnp(spark, sf):
    """Reciprocal CNP meta-blocking (Papadakis TKDE '14,
    meta_blocking_cnp(reciprocal=True)): an edge survives only in
    BOTH endpoints' CBS top-k — the precision-sharpened CNP over the
    same token-blocking graph."""
    from hamerkop_spark.operators.blocking_eval import meta_blocking_cnp

    part = _t(spark, sf, "part").where(
        (F.col("p_partkey") % 10 == 0) & (F.col("p_partkey") < 5000)
    )
    blocks = part.select(
        F.explode(F.split(F.lower("p_name"), " ")).alias("block_key"),
        F.col("p_partkey").alias("record_id"),
    )
    return meta_blocking_cnp(
        blocks, top_k=3, max_block_size=100, reciprocal=True
    )


def q_block_meta_wnp(spark, sf):
    """Weighted Node Pruning meta-blocking (Papadakis TKDE '14,
    operators/blocking_eval.meta_blocking_wnp): per-node LOCAL
    mean-weight bar (exact integer test) over the same token-blocking
    graph as the other meta queries."""
    from hamerkop_spark.operators.blocking_eval import meta_blocking_wnp

    part = _t(spark, sf, "part").where(
        (F.col("p_partkey") % 10 == 0) & (F.col("p_partkey") < 5000)
    )
    blocks = part.select(
        F.explode(F.split(F.lower("p_name"), " ")).alias("block_key"),
        F.col("p_partkey").alias("record_id"),
    )
    return meta_blocking_wnp(blocks, max_block_size=100)


def q_c11_modularity(spark, sf):
    """Newman weighted modularity of a partition vs the scored pair
    graph (operators/scoring.modularity) — same synthesized
    clusters/edges as q_cluster_audit, so the two audits read
    side-by-side."""
    from hamerkop_spark.operators.scoring import modularity

    cust = _t(spark, sf, "customer")
    asg = cust.select(
        F.col("c_custkey").alias("mention_key"),
        F.concat_ws(
            "-", "c_mktsegment", (F.col("c_nationkey") % 5).cast("string")
        ).alias("cluster"),
    )
    a = cust.select(F.col("c_custkey").alias("a_id"))
    edges = (
        a.select("a_id", (F.col("a_id") + 7).alias("b_id"))
        .join(cust.select(F.col("c_custkey").alias("b_id")), "b_id")
        .withColumn(
            "score",
            ((F.col("a_id") + F.col("b_id")) % 97).cast("double") / 100.0,
        )
    )
    return modularity(asg, edges)


def _web_urls(spark, sf):
    """Deterministic messy-URL synthesis over `documents` (the twin SQL
    builds the identical strings): crawl variants of one page — scheme/
    host casing, explicit default port, tracking params, fragments —
    plus root-URL variants, a userinfo+non-default-port carve-out, and
    non-URL garbage rows. page = doc_id div 4; the four doc_id%4
    variants of a page canonicalize to ONE url."""
    docs = _t(spark, sf, "documents").select("doc_id")
    d = F.col("doc_id")
    page = F.expr("doc_id div 4")
    v = F.pmod(d, 4)
    ds = d.cast("string")
    ps = page.cast("string")
    host = (
        F.when(F.pmod(page, 3) == 0, F.lit("shop.Example.co.uk"))
        .when(F.pmod(page, 3) == 1, F.lit("news.example.com"))
        .otherwise(F.lit("example.com"))
    )
    item = F.concat(F.lit("/item/"), ps)
    url_item = (
        F.when(v == 0, F.concat(F.lit("http://"), host, item,
                                F.lit("?b=2&a=1")))
        .when(v == 1, F.concat(F.lit("HTTP://"), F.upper(host),
                               F.lit(":80"), item,
                               F.lit("?a=1&utm_source=feed&b=2")))
        .when(v == 2, F.concat(F.lit("http://"), host, item,
                               F.lit("?b=2&a=1&gclid=g"), ps,
                               F.lit("#sec")))
        .otherwise(F.concat(F.lit("http://"), host, item,
                            F.lit("?a=1&b=2&ref=tw")))
    )
    url_root = (
        F.when(v == 0, F.concat(F.lit("https://"), host))
        .when(v == 1, F.concat(F.lit("https://"), host, F.lit(":443/")))
        .when(v == 2, F.concat(F.lit("https://"), host,
                               F.lit("/?utm_campaign=x")))
        .otherwise(F.concat(F.lit("https://"), F.upper(host),
                            F.lit("/#top")))
    )
    url = (
        F.when(F.pmod(d, 101) == 0, F.concat(F.lit("not a url "), ds))
        .when(F.pmod(d, 97) == 0,
              F.concat(F.lit("http://u:p@Host"), ds,
                       F.lit(".com:8080/x?z=1&utm_x=1")))
        .when(F.pmod(page, 7) == 0, url_root)
        .otherwise(url_item)
    )
    return docs.select("doc_id", url.alias("url"))


def q_web_url_canonical(spark, sf):
    """Native-column URL parse + RFC 3986 §6 canonicalization +
    registrable domain (functions/url.py) over the synthesized crawl
    URLs. Non-URLs surface as NULLs (never a merged garbage group)."""
    from hamerkop_spark.functions.url import (
        registrable_domain,
        url_canonicalize,
        url_parts,
    )

    base = _web_urls(spark, sf)
    p = url_parts("url")
    return base.select(
        "doc_id",
        "url",
        url_canonicalize("url").alias("canon_url"),
        F.lower(p["host"]).alias("host"),
        registrable_domain(p["host"]).alias("domain"),
    )


def q_web_dedup_url(spark, sf):
    """Crawl-frontier dedup: group fetches by canonical URL, keep the
    duplicate sets with their first-seen doc. The cheapest dedup tier —
    one string expression + one groupBy, no content pass."""
    from hamerkop_spark.functions.url import url_canonicalize

    base = _web_urls(spark, sf)
    return (
        base.select("doc_id", url_canonicalize("url").alias("canon_url"))
        .where(F.col("canon_url").isNotNull())
        .groupBy("canon_url")
        .agg(
            F.count("*").alias("n_fetches"),
            F.min("doc_id").alias("first_doc"),
        )
        .where(F.col("n_fetches") >= 2)
    )


def _winnow_oracle_sql() -> str:
    """DuckDB twin of q_dedup_winnow: the winnowing algebra restated
    with list comprehensions (DuckDB list slices are INCLUSIVE, so a
    4-gram window is hs[i:i+3])."""
    import string as _string

    punct = _string.punctuation.replace("'", "''")
    return f"""
        WITH d AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        ), n AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   translate(lower(text), '{punct}', ''),
                   '\\s+', ' ', 'g')) AS s
          FROM d
        ), g AS (
          SELECT doc_id,
                 [substr(s, i, 8)
                  FOR i IN generate_series(1, greatest(length(s) - 7, 0))]
                   AS grams
          FROM n
        ), h AS (
          SELECT doc_id,
                 [('0x' || substr(md5('17:' || g), 1, 15))::BIGINT
                  FOR g IN grams] AS hs
          FROM g
        ), w AS (
          SELECT doc_id,
                 CASE WHEN len(hs) = 0 THEN []::BIGINT[]
                      WHEN len(hs) < 4 THEN [list_min(hs)]
                      ELSE [list_min(hs[i:i+3])
                            FOR i IN generate_series(1, len(hs) - 3)]
                 END AS wm
          FROM h
        ), f AS (
          SELECT DISTINCT doc_id, unnest(wm) AS fp FROM w
        ), dfc AS (
          SELECT fp, count(*) AS c FROM f GROUP BY fp
        ), kept AS (
          SELECT f.doc_id, f.fp FROM f
          JOIN dfc USING (fp) WHERE c >= 2 AND c <= 50
        )
        SELECT x.doc_id AS a_id, y.doc_id AS b_id,
               count(*) AS n_shared
        FROM kept x JOIN kept y USING (fp)
        WHERE x.doc_id < y.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 3
    """


def _web_urls_sql() -> str:
    """DuckDB twin of _web_urls (string-identical synthesis)."""
    return """
      SELECT doc_id,
        CASE
          WHEN doc_id % 101 = 0 THEN 'not a url ' || doc_id::VARCHAR
          WHEN doc_id % 97 = 0 THEN
            'http://u:p@Host' || doc_id::VARCHAR || '.com:8080/x?z=1&utm_x=1'
          WHEN (doc_id // 4) % 7 = 0 THEN
            CASE doc_id % 4
              WHEN 0 THEN 'https://' || host
              WHEN 1 THEN 'https://' || host || ':443/'
              WHEN 2 THEN 'https://' || host || '/?utm_campaign=x'
              ELSE 'https://' || upper(host) || '/#top'
            END
          ELSE
            CASE doc_id % 4
              WHEN 0 THEN 'http://' || host || item || '?b=2&a=1'
              WHEN 1 THEN 'HTTP://' || upper(host) || ':80' || item
                          || '?a=1&utm_source=feed&b=2'
              WHEN 2 THEN 'http://' || host || item || '?b=2&a=1&gclid=g'
                          || (doc_id // 4)::VARCHAR || '#sec'
              ELSE 'http://' || host || item || '?a=1&b=2&ref=tw'
            END
        END AS url
      FROM (
        SELECT doc_id,
          CASE (doc_id // 4) % 3
            WHEN 0 THEN 'shop.Example.co.uk'
            WHEN 1 THEN 'news.example.com'
            ELSE 'example.com' END AS host,
          '/item/' || (doc_id // 4)::VARCHAR AS item
        FROM documents
      )
    """


def _web_canon_sql() -> str:
    """DuckDB re-implementation of functions/url.py canonicalization
    (independent SQL twin, same documented rules): yields
    canon(doc_id, url, host, domain, canon_url)."""
    from hamerkop_spark.functions.url import (
        MULTI_SUFFIXES,
        TRACKING_PARAM_RE,
        URL_RE,
    )

    suffixes = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    return f"""
      urls AS ({_web_urls_sql()}),
      parsed AS (
        SELECT doc_id, url,
          regexp_extract(url, '{URL_RE}', 1) AS scheme,
          regexp_extract(url, '{URL_RE}', 2) AS auth,
          regexp_extract(url, '{URL_RE}', 3) AS path,
          regexp_extract(url, '{URL_RE}', 4) AS query
        FROM urls
      ),
      hp AS (
        SELECT *,
          list_extract(string_split(auth, '@'), -1) AS hostport,
          CASE WHEN contains(auth, '@')
               THEN regexp_replace(auth, '@[^@]*$', '') ELSE '' END
            AS userinfo
        FROM parsed
      ),
      fields AS (
        SELECT *,
          regexp_extract(hostport, ':([0-9]*)$', 1) AS port,
          regexp_replace(hostport, ':[0-9]*$', '') AS rawhost,
          -- array_to_string on an EMPTY list is NULL in DuckDB (Spark's
          -- array_join gives ''): coalesce to keep the engines aligned
          coalesce(array_to_string(list_sort(list_filter(
            string_split(query, '&'),
            x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')
          )), '&'), '') AS cq
        FROM hp
      ),
      dom AS (
        SELECT *, string_split(lower(rawhost), '.') AS labels
        FROM fields
      ),
      canon AS (
        SELECT doc_id, url,
          CASE WHEN scheme = '' THEN NULL ELSE lower(rawhost) END AS host,
          CASE
            WHEN scheme = '' THEN NULL
            WHEN regexp_matches(lower(rawhost), '^[0-9]+(\\.[0-9]+){{3}}$')
                 OR len(labels) <= 1 THEN lower(rawhost)
            WHEN len(labels) >= 3
                 AND array_to_string(labels[-2:], '.') IN ({suffixes})
              THEN array_to_string(labels[-3:], '.')
            ELSE array_to_string(labels[-2:], '.')
          END AS domain,
          CASE WHEN scheme = '' THEN NULL ELSE
            lower(scheme) || '://'
            || CASE WHEN userinfo = '' THEN '' ELSE userinfo || '@' END
            || lower(rawhost)
            || CASE WHEN port = ''
                    OR (lower(scheme) = 'http' AND port = '80')
                    OR (lower(scheme) = 'https' AND port = '443')
                 THEN '' ELSE ':' || port END
            || CASE WHEN path = '' THEN '/' ELSE path END
            || CASE WHEN cq = '' THEN '' ELSE '?' || cq END
          END AS canon_url
        FROM dom
      )
    """


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the B3 ngram-IDF fuzzy-blocking retrieval at sf0.001."""
    return q_b3_ngram_idf(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # Rotation (round 5): the driver records the FIRST 50 registry
        # entries per round; no row may go 2 consecutive rounds
        # unrecorded (VERDICT r3 #3 / r4 missing #1). These 25 were
        # last recorded in round 3 (they tailed the round-4 registry),
        # so they MUST lead this round.
        "flagship_pricing": q_flagship_pricing,
        "t1_remove_punct": q_t1_remove_punct,
        "t6_ngram_explode": q_t6_ngram_explode,
        "p1_type_validator": q_p1_type_validator,
        "p3_garbage_filter": q_p3_garbage_filter,
        "p5_token_length_filter": q_p5_token_length_filter,
        "p6_blacklist": q_p6_blacklist,
        "b2_exact_block": q_b2_exact_block,
        "b3_ngram_idf": q_b3_ngram_idf,
        "c2_exact_cluster": q_c2_exact_cluster,
        "cc_transitive": q_cc_transitive,
        "cc_incremental": q_cc_incremental,
        "f9_levenshtein_argmin": q_f9_levenshtein_argmin,
        "f7_shared_tokens": q_f7_shared_tokens,
        "f_token_jaccard": q_f_token_jaccard,
        "r1_first_resolver": q_r1_first_resolver,
        "r2_one_many_none": q_r2_one_many_none,
        "r5_linear_argmax": q_r5_linear_argmax,
        "r5_margin_gate": q_r5_margin_gate,
        "f_token_jaccard_docs": q_f_token_jaccard_docs,
        "f_emb_cosine": q_f_emb_cosine,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "ann_cosine_search": q_ann_cosine_search,
        # --- new in round 5 (blocking_eval / linkage / calibration):
        # recorded immediately so they never start life stale ---
        "block_sorted_neighborhood": q_block_sorted_neighborhood,
        "block_meta_cnp": q_block_meta_cnp,
        "block_quality": q_block_quality,
        "calibration_bins": q_calibration_bins,
        "fs_match_weight": q_fs_match_weight,
        # --- new in round 5, late session (assignment / cluster
        # metrics / tfidf): recorded immediately ---
        "r10_mutual_best": q_r10_mutual_best,
        "r11_one_to_one": q_r11_one_to_one,
        "c8_cluster_ari": q_c8_cluster_ari,
        "c9_pairwise_prf": q_c9_pairwise_prf,
        "f_tfidf_cosine": q_f_tfidf_cosine,
        "er_golden_record": q_er_golden_record,
        "er_rep_name": q_er_rep_name,
        "fs_three_band": q_fs_three_band,
        "fs_review_sample": q_fs_review_sample,
        "fs_level_weight": q_fs_level_weight,
        "er_dedupe_plan": q_er_dedupe_plan,
        # --- new in round 5, final session (canopy blocking):
        # recorded immediately ---
        "block_canopy": q_block_canopy,
        # --- new in round 5, last sessions (coherence / PPRL / group
        # linkage / PR curve / suffix blocking / cluster audit / star
        # and pivot clustering): this is the FINAL round, so anything
        # past position 50 is never driver-recorded at all — these 8
        # never-recorded queries therefore outrank rows already green
        # in CORRECTNESS_r04.json. Every registry entry (positions
        # 1-102) stays covered by scripts/check_oracle.py's full
        # sweep either way. ---
        "r12_coherence": q_r12_coherence,
        "pprl_dice": q_pprl_dice,
        "er_group_linkage": q_er_group_linkage,
        "er_pr_curve": q_er_pr_curve,
        "block_suffix_array": q_block_suffix_array,
        "cluster_audit": q_cluster_audit,
        "er_star_clusters": q_er_star_clusters,
        "er_pivot_clusters": q_er_pivot_clusters,
        # --- position 51 onward: NOT driver-recorded this (final)
        # round. Everything below is green in CORRECTNESS_r04.json,
        # except f_monge_elkan_lev / f_soft_tfidf_lev (new scorer
        # variants whose kernels are property-tested in pytest and
        # green in the full local sweep) — with 52 round-4 rows + 27
        # round-5 rows and 50 slots, two rows had to sit out; the two
        # scorer variants lose to whole-operator queries. ---
        "text_token_stats": q_text_token_stats,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "events_windowed": q_events_windowed,
        "events_sessionize": q_events_sessionize,
        "kb_altname_attach": q_kb_altname_attach,
        "s6_extents_parse": q_s6_extents_parse,
        "c3_acronym_key": q_c3_acronym_key,
        "chains_agg": q_chains_agg,
        "f5_wikipedia_link": q_f5_wikipedia_link,
        "p7_acronym_replace": q_p7_acronym_replace,
        "p9_name_stemmer": q_p9_name_stemmer,
        "p10_twitter_username": q_p10_twitter_username,
        "p11_hashtag_split": q_p11_hashtag_split,
        "c4_single_token_merge": q_c4_single_token_merge,
        "b7_combine_candidates": q_b7_combine_candidates,
        "b8_cascade_candidates": q_b8_cascade_candidates,
        "r3_wikipedia_resolver": q_r3_wikipedia_resolver,
        "r6_cascade_resolver": q_r6_cascade_resolver,
        "t14_doc_type": q_t14_doc_type,
        "t15_entity_origin": q_t15_entity_origin,
        "t5_remove_double_letter": q_t5_remove_double_letter,
        "t2_unicode_punct": q_t2_unicode_punct,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "b_phonetic_soundex": q_b_phonetic_soundex,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "p15_tristate_cascade": q_p15_tristate_cascade,
        "p2_text_normalizer": q_p2_text_normalizer,
        "p4_fix_type": q_p4_fix_type,
        "p8_name_projector": q_p8_name_projector,
        "t7_dict_translator": q_t7_dict_translator,
        "t4_single_space": q_t4_single_space,
        "b4_type_conflation": q_b4_type_conflation,
        "f_bundle_native": q_f_bundle_native,
        "r8_labeled_pairs": q_r8_labeled_pairs,
        "s3_bio_chunker": q_s3_bio_chunker,
        "b10_candidate_recall": q_b10_candidate_recall,
        "b11_kb_recall": q_b11_kb_recall,
        "c7_muc_b3": q_c7_muc_b3,
        "r7_type_gate": q_r7_type_gate,
        "c5_lang_gate": q_c5_lang_gate,
        "c6_type_gate": q_c6_type_gate,
        "t3_emoji_strip": q_t3_emoji_strip,
        "r9_resolver_report": q_r9_resolver_report,
        "p16_script_filter": q_p16_script_filter,
        "p17_language_name_filter": q_p17_language_name_filter,
        "f11_feature_vector": q_f11_feature_vector,
        "c1_cascade_coref": q_c1_cascade_coref,
        "f_monge_elkan_lev": q_f_monge_elkan_lev,
        "f_soft_tfidf_lev": q_f_soft_tfidf_lev,
        "er_progressive": q_er_progressive,
        "er_scheme_masks": q_er_scheme_masks,
        "er_uncertainty_queue": q_er_uncertainty_queue,
        "c10_blanc": q_c10_blanc,
        "fs_tf_weight": q_fs_tf_weight,
        "er_swoosh": q_er_swoosh,
        "er_hac_clusters": q_er_hac_clusters,
        "er_lpa_clusters": q_er_lpa_clusters,
        "er_constrained_clusters": q_er_constrained_clusters,
        "er_hac_complete": q_er_hac_complete,
        "web_url_canonical": q_web_url_canonical,
        "web_dedup_url": q_web_dedup_url,
        "block_meta_wep": q_block_meta_wep,
        "c11_modularity": q_c11_modularity,
        "block_adaptive_sn": q_block_adaptive_sn,
        "dedup_winnow": q_dedup_winnow,
        "block_meta_rcnp": q_block_meta_rcnp,
        "block_meta_wnp": q_block_meta_wnp,
    }


def _hexparse(e: str) -> str:
    """md5-derived 60-bit hash, DuckDB side (Spark: conv(substr(md5,1,15)))."""
    return f"('0x' || substr(md5({e}), 1, 15))::BIGINT"


def _minhash_lsh_sql() -> str:
    """DuckDB twin of q_dedup_minhash_lsh (md5perm minhash_dedup_pairs):
    normalize -> word-3-shingles -> one 32-bit md5 base hash -> 32
    universal-hash min aggregates (same perm_coeffs constants as the
    Spark side) -> 8 md5 band buckets -> bucket cap -> pairs."""
    import string as _string

    from hamerkop_spark.operators.blocking import PERM_MOD, perm_coeffs

    punct_lit = _string.punctuation.replace("'", "''")
    mins = ",\n         ".join(
        "min(({a} * h0 + {b}) % {p}) AS mh{s}".format(
            a=perm_coeffs(s)[0], b=perm_coeffs(s)[1], p=PERM_MOD, s=s
        )
        for s in range(MINHASH_HASHES)
    )
    rpb = MINHASH_HASHES // MINHASH_BANDS
    band_selects = "\n      UNION ALL ".join(
        "SELECT id, {b} AS band, md5({key}) AS bucket FROM sigs".format(
            b=b,
            key=" || ',' || ".join(
                f"mh{b * rpb + j}::VARCHAR" for j in range(rpb)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
        WITH d AS (
          SELECT doc_id::VARCHAR AS id,
                 trim(regexp_replace(translate(lower(text), '{punct_lit}', ''),
                                     '\\s+', ' ', 'g')) AS t
          FROM documents
        ), tokd AS (
          SELECT id, list_filter(string_split(t, ' '), x -> x <> '') AS toks
          FROM d
        ), shingled AS (
          SELECT id, list_distinct(
            CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(generate_series(1, len(toks) - 2),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            END) AS sh
          FROM tokd
        ), elems AS (
          SELECT DISTINCT id, unnest(sh) AS e FROM shingled WHERE len(sh) > 0
        ), hashed AS (
          SELECT id, ('0x' || substr(md5(e), 1, 8))::BIGINT AS h0 FROM elems
        ), sigs AS (
          SELECT id, {mins}
          FROM hashed GROUP BY id
        ), bands AS (
          {band_selects}
        ), sized AS (
          SELECT band, bucket, count(*) AS bs FROM bands GROUP BY band, bucket
        ), bb AS (
          SELECT b.id, b.band, b.bucket FROM bands b
          JOIN sized USING (band, bucket) WHERE sized.bs <= {MINHASH_MAX_BUCKET}
        )
        SELECT DISTINCT a.id AS src, b.id AS dst
        FROM bb a JOIN bb b USING (band, bucket) WHERE a.id < b.id
    """


def _simhash_sql() -> str:
    """DuckDB twin of q_dedup_simhash (md5-native 60-bit simhash)."""
    from hamerkop_spark.operators.dedup import _chunk_bounds

    votes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    sig_terms = " + ".join(
        f"CASE WHEN v{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END"
        for b in range(SIMHASH_BITS)
    )
    bounds = _chunk_bounds(SIMHASH_BITS, SIMHASH_MAX_HAMMING + 1)
    chunk_selects = "\n      UNION ALL ".join(
        f"SELECT id, sig, {i} AS ci, (sig >> {start}) & {(1 << width) - 1} AS ch"
        " FROM sigs"
        for i, (start, width) in enumerate(bounds)
    )
    return f"""
        WITH d AS (
          SELECT doc_id::VARCHAR AS id, text FROM documents
          WHERE doc_id < 200 AND text IS NOT NULL AND length(trim(text)) > 0
        ), toks AS (
          SELECT id, unnest(list_filter(
            regexp_split_to_array(lower(trim(text)), '\\s+'),
            x -> x <> '')) AS tok
          FROM d
        ), hashed AS (
          SELECT id, {_hexparse('tok')} AS h FROM toks
        ), votes AS (
          SELECT id, {votes}
          FROM hashed GROUP BY id
        ), sigs AS (
          SELECT id, ({sig_terms}) AS sig FROM votes
        ), chunks AS (
          {chunk_selects}
        ), cand AS (
          SELECT DISTINCT a.id AS src, b.id AS dst, a.sig AS sa, b.sig AS sb
          FROM chunks a JOIN chunks b ON a.ci = b.ci AND a.ch = b.ch
          WHERE a.id < b.id
        )
        SELECT src, dst FROM cand
        WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAX_HAMMING}
    """


def _plane_list_sql(plane: list) -> str:
    return "[" + ", ".join(f"{v:.1f}" for v in plane) + "]"


def _bucket_sql(vec_expr: str, planes: list) -> str:
    """Concatenated hyperplane sign bits over an inlined literal matrix —
    identical values to similarity.lsh_bucket_lit by construction."""
    bits = " || ".join(
        f"(CASE WHEN list_dot_product({vec_expr}, {_plane_list_sql(p)}) >= 0"
        " THEN '1' ELSE '0' END)"
        for p in planes
    )
    return f"({bits})"


def _ann_lsh_sql() -> str:
    from hamerkop_spark.operators.similarity import hyperplanes

    planes = hyperplanes(EMB_DIM, ANN_PLANES)
    cos = (
        "CASE WHEN sqrt(list_dot_product(qv, qv)) = 0"
        " OR sqrt(list_dot_product(cv, cv)) = 0 THEN 0.0"
        " ELSE list_dot_product(qv, cv)"
        " / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
        " END"
    )
    return f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                 {_bucket_sql('embedding::DOUBLE[]', planes)} AS bucket
          FROM embeddings WHERE vec_id < 8
        ), c AS (
          SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
                 {_bucket_sql('embedding::DOUBLE[]', planes)} AS bucket
          FROM embeddings
        ), scored AS (
          SELECT query_id, neighbor_id, {cos} AS cosine
          FROM q JOIN c USING (bucket)
        ), ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, floor((cosine) * 1000000.0 + 0.5) / 1000000.0 AS cosine, rank
        FROM ranked WHERE rank <= 5
    """


def _embedding_neardup_sql() -> str:
    from hamerkop_spark.operators.similarity import hyperplanes

    planes = hyperplanes(EMB_DIM, NEARDUP_PLANES)
    cos = (
        "CASE WHEN sqrt(list_dot_product(va, va)) = 0"
        " OR sqrt(list_dot_product(vb, vb)) = 0 THEN 0.0"
        " ELSE list_dot_product(va, vb)"
        " / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))"
        " END"
    )
    return f"""
        WITH e AS (
          SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                 {_bucket_sql('embedding::DOUBLE[]', planes)} AS bucket
          FROM embeddings WHERE vec_id < 150
        ), pairs AS (
          SELECT a.id AS src, b.id AS dst, a.v AS va, b.v AS vb
          FROM e a JOIN e b ON a.bucket = b.bucket AND a.id < b.id
        ), scored AS (
          SELECT src, dst, {cos} AS cosine FROM pairs
        )
        SELECT src, dst, floor((floor((cosine) * 1000000.0 + 0.5) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS cosine
        FROM scored WHERE cosine >= 0.25
    """


def _case_arms(mapping: dict[str, str]) -> str:
    """CASE WHEN arms generated from the same dict the Spark query uses,
    so the oracle cannot drift from the query's replacement map."""
    return "\n                     ".join(
        "WHEN '{k}' THEN '{v}'".format(k=k.replace("'", "''"), v=v.replace("'", "''"))
        for k, v in mapping.items()
    )


def _candidate_sets_sql() -> str:
    """Shared CTE prefix for the B7/B8 oracles: the same two candidate
    generators q_b7/q_b8 build Spark-side (exact lowered-name key, then
    the portable-soundex first-token key over part)."""
    from hamerkop_spark.functions.phonetic import soundex_portable_sql

    sx = soundex_portable_sql("string_split(name, ' ')[1]")
    return f"""
            WITH chains AS (
              SELECT 'd' AS doc_id, p_partkey::VARCHAR AS chain_id,
                     p_name AS name
              FROM part WHERE p_partkey % 17 = 0
            ), kb AS (
              SELECT p_partkey::VARCHAR AS entity_id,
                     lower(p_name) AS exact_key, p_name AS name
              FROM part
            ), set1 AS (
              SELECT doc_id, chain_id, entity_id, 'exact' AS source,
                     0 AS source_rank,
                     row_number() OVER (PARTITION BY doc_id, chain_id
                       ORDER BY entity_id) AS retrieval_rank
              FROM (SELECT DISTINCT c.doc_id, c.chain_id, k.entity_id
                    FROM chains c JOIN kb k ON lower(c.name) = k.exact_key)
            ), pr AS (
              SELECT doc_id, chain_id, {sx} AS pkey FROM chains
            ), bd AS (
              SELECT DISTINCT {sx} AS pkey, entity_id FROM kb
            ), set2 AS (
              SELECT doc_id, chain_id, entity_id, 'phonetic' AS source,
                     1 AS source_rank, rr AS retrieval_rank
              FROM (SELECT doc_id, chain_id, entity_id,
                           row_number() OVER (PARTITION BY doc_id, chain_id
                             ORDER BY entity_id) AS rr
                    FROM (SELECT DISTINCT p.doc_id, p.chain_id, b.entity_id
                          FROM pr p JOIN bd b ON p.pkey = b.pkey))
              WHERE rr <= 25
            ), u AS (
              SELECT * FROM set1 UNION ALL SELECT * FROM set2
            )
    """


def oracle_sql() -> dict[str, str]:
    from hamerkop_spark.functions.phonetic import soundex_portable_sql
    from hamerkop_spark.operators.linkage import fs_weight_constants

    from hamerkop_spark.operators.linkage import (
        fs_level_weight_constants,
        fs_model_thresholds,
    )

    lvl_c = fs_level_weight_constants(FS_LVL_M, FS_LVL_U)
    lvl_terms = (
        f"(CASE s1 WHEN 2 THEN {lvl_c['s1'][2]} WHEN 1 THEN {lvl_c['s1'][1]}"
        f" ELSE {lvl_c['s1'][0]} END"
        f" + CASE s2 WHEN 1 THEN {lvl_c['s2'][1]}"
        f" ELSE {lvl_c['s2'][0]} END)"
    )

    punct = PUNCT_CLASS.replace("'", "''")
    fsw = fs_weight_constants(FS_M, FS_U)
    fs_band = fs_model_thresholds(
        ["g1", "g2", "g3"], FS_M, FS_U, mu=0.05, lam=0.05
    )
    fs_terms = " + ".join(
        f"CASE WHEN g{i} = 1 THEN {fsw[f'g{i}'][0]} ELSE {fsw[f'g{i}'][1]} END"
        for i in (1, 2, 3)
    )

    # TF-adjusted FS twin (q_fs_tf_weight): same driver-computed
    # constants embedded in both engines' expressions
    from hamerkop_spark.operators.linkage import LOG2E_FP, _EPS

    tfw = fs_weight_constants(FS_TF_M, FS_TF_U)
    _tf_u = min(max(FS_TF_U["g_nat"], _EPS), 1.0 - _EPS)
    tf_log2u_fp = math.floor(math.log2(_tf_u) * 1_000_000 + 0.5)
    tf_cap_fp = 8_000_000  # default cap_bits=8.0
    aw_nat, dw_nat = tfw["g_nat"]
    fs_tf_terms = (
        f"(CASE WHEN g_nat = 1 THEN greatest({dw_nat}, least({aw_nat}"
        f" + CASE WHEN tf_log2_fp IS NULL THEN 0"
        f" ELSE tf_log2_fp + ({tf_log2u_fp}) END,"
        f" {aw_nat + tf_cap_fp})) ELSE {dw_nat} END"
        f" + CASE WHEN g2 = 1 THEN {tfw['g2'][0]} ELSE {tfw['g2'][1]} END"
        f" + CASE WHEN g3 = 1 THEN {tfw['g3'][0]} ELSE {tfw['g3'][1]} END)"
    )

    # Bipartite fixture shared by the assignment oracles (mirrors
    # _assignment_pairs): customers x suppliers blocked on key%25.
    def _pairs_cte(cap_chain=None, cap_ent=None):
        wc = f"WHERE c_custkey < {cap_chain}" if cap_chain else ""
        ws = f"WHERE s_suppkey < {cap_ent}" if cap_ent else ""
        return f"""pairs AS (
              SELECT c_custkey AS chain_id, s_suppkey AS entity_id,
                     (c_custkey * 7 + s_suppkey * 13) % 97 AS match_score
              FROM (SELECT c_custkey FROM customer {wc}) c
              JOIN (SELECT s_suppkey FROM supplier {ws}) s
                ON c_custkey % 25 = s_suppkey % 25
            )"""

    _MUTUAL_QUALIFY = """
              QUALIFY row_number() OVER (PARTITION BY chain_id
                        ORDER BY match_score DESC, entity_id) = 1
                 AND row_number() OVER (PARTITION BY entity_id
                        ORDER BY match_score DESC, chain_id) = 1"""

    def _one_to_one_sql(rounds, cap_chain, cap_ent):
        """Unrolled iterated locally-dominant matching: each round is a
        mutual-best QUALIFY over the previous remainder, then both
        matched endpoints leave the pool."""
        ctes = [
            _pairs_cte(cap_chain, cap_ent),
            "rem0 AS (SELECT chain_id, entity_id, match_score FROM pairs)",
        ]
        sel = []
        for k in range(1, rounds + 1):
            ctes.append(f"""r{k} AS (
              SELECT chain_id, entity_id, match_score FROM rem{k - 1}
              {_MUTUAL_QUALIFY}
            )""")
            ctes.append(f"""rem{k} AS (
              SELECT e.* FROM rem{k - 1} e
              WHERE NOT EXISTS (SELECT 1 FROM r{k} m
                                WHERE m.chain_id = e.chain_id)
                AND NOT EXISTS (SELECT 1 FROM r{k} m
                                WHERE m.entity_id = e.entity_id)
            )""")
            sel.append(
                f"SELECT chain_id, entity_id, match_score, "
                f"{k} AS match_round FROM r{k}"
            )
        return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sel)

    # Pair-counting cluster-metric core (mirrors cluster_pair_counts):
    # contingency cells -> exact BIGINT C(n,2) sums via integer shift.
    def _pair_counts_sql(pred_expr, gold_expr):
        return f"""j AS (
              SELECT c_custkey AS k, {pred_expr} AS pc, {gold_expr} AS gc
              FROM customer
            ), cells AS (
              SELECT pc, gc, count(*) AS nij FROM j GROUP BY pc, gc
            ), tot AS (
              SELECT sum(nij)::BIGINT AS n,
                     (sum(nij * (nij - 1))::BIGINT >> 1) AS both_pairs
              FROM cells
            ), pa AS (
              SELECT (sum(ai * (ai - 1))::BIGINT >> 1) AS pred_pairs
              FROM (SELECT sum(nij) AS ai FROM cells GROUP BY pc)
            ), ga AS (
              SELECT (sum(bj * (bj - 1))::BIGINT >> 1) AS gold_pairs
              FROM (SELECT sum(nij) AS bj FROM cells GROUP BY gc)
            )"""

    return {
        "block_sorted_neighborhood": """
            WITH r AS (
              SELECT c_custkey AS rec_id,
                     c_mktsegment || '-' || lpad(c_nationkey::VARCHAR, 2, '0')
                       AS k
              FROM customer
            ), ranked AS (
              SELECT rec_id, k,
                     row_number() OVER (ORDER BY k, rec_id) AS rnk
              FROM r
            )
            SELECT a.rec_id AS a_id, b.rec_id AS b_id,
                   a.k AS a_key, b.k AS b_key,
                   (b.rnk - a.rnk)::INT AS rank_dist,
                   'sorted_neighborhood' AS source
            FROM ranked a
            JOIN ranked b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3
        """,
        "cluster_audit": """
            WITH asg AS (
              SELECT c_custkey AS node,
                     c_mktsegment || '-' || (c_nationkey % 5)::VARCHAR AS cl
              FROM customer
            ), e0 AS (
              SELECT a.c_custkey AS ea, a.c_custkey + 7 AS eb,
                     ((a.c_custkey + a.c_custkey + 7) % 97)::DOUBLE / 100.0
                       AS score
              FROM customer a
              JOIN customer b ON b.c_custkey = a.c_custkey + 7
            ), e AS (
              SELECT least(ea, eb) AS ea2, greatest(ea, eb) AS eb2,
                     min(floor(score * 1e6 + 0.5)::BIGINT) AS s_fp
              FROM e0 WHERE ea <> eb GROUP BY 1, 2
            ), intra AS (
              SELECT x.cl, e.s_fp FROM e
              JOIN asg x ON x.node = e.ea2
              JOIN asg y ON y.node = e.eb2 AND y.cl = x.cl
            ), es AS (
              SELECT cl, count(*) AS n_edges, min(s_fp) AS min_fp,
                     sum(s_fp) AS sum_fp
              FROM intra GROUP BY cl
            ), ns AS (
              SELECT cl, count(*) AS n_nodes FROM asg GROUP BY cl
            ), j AS (
              SELECT ns.cl, n_nodes,
                     coalesce(n_edges, 0)::BIGINT AS n_edges,
                     (n_nodes * (n_nodes - 1) / 2)::BIGINT AS possible_pairs,
                     min_fp, sum_fp
              FROM ns LEFT JOIN es USING (cl)
            )
            SELECT cl AS cluster, n_nodes, n_edges, possible_pairs,
                   CASE WHEN possible_pairs > 0 THEN
                     floor(n_edges * 1000000 / possible_pairs)::BIGINT
                   END AS density_fp,
                   min_fp AS min_score_fp,
                   CASE WHEN n_edges > 0 THEN
                     floor(sum_fp / n_edges)::BIGINT
                   END AS mean_score_fp,
                   (n_nodes >= 3 AND coalesce(
                     CASE WHEN possible_pairs > 0 THEN
                       floor(n_edges * 1000000 / possible_pairs)::BIGINT
                     END, 0) < 500000) AS chaining_suspect
            FROM j
        """,
        "block_canopy": """
            WITH recs AS (
              SELECT p_partkey AS rid,
                     list_distinct(list_concat(
                       string_split(lower(p_name), ' '),
                       [lower(p_brand), lower(p_type),
                        's' || (p_size % 8)::VARCHAR])) AS toks
              FROM part WHERE p_partkey % 3 = 0
            ), tok AS (
              SELECT rid, unnest(toks) AS tok FROM recs
            ), kept AS (
              SELECT tok FROM tok GROUP BY tok
              HAVING count(*) BETWEEN 2 AND 500
            ), post AS (
              SELECT rid, tok FROM tok JOIN kept USING (tok)
            ), ov AS (
              SELECT a.rid AS a_id, b.rid AS b_id, count(*) AS ov
              FROM post a JOIN post b ON a.tok = b.tok AND a.rid < b.rid
              GROUP BY 1, 2 HAVING count(*) >= 3
            ), dominated AS (
              SELECT DISTINCT b_id AS rid FROM ov WHERE ov >= 4
            ), centers AS (
              SELECT rid AS center_id FROM recs
              ANTI JOIN dominated USING (rid)
            ), memb AS (
              SELECT b_id AS record_id, center_id
              FROM ov JOIN centers ON a_id = center_id
              UNION
              SELECT a_id AS record_id, center_id
              FROM ov JOIN centers ON b_id = center_id
            ), covered AS (
              SELECT record_id, center_id FROM memb
              UNION ALL
              SELECT center_id AS record_id, center_id FROM centers
            ), orphans AS (
              SELECT rid AS record_id, rid AS center_id FROM recs
              ANTI JOIN (SELECT DISTINCT record_id AS rid
                         FROM covered) USING (rid)
            )
            SELECT record_id, center_id FROM covered
            UNION ALL
            SELECT record_id, center_id FROM orphans
        """,
        "er_star_clusters": """
            WITH recs AS (
              SELECT p_partkey AS rid,
                     list_distinct(list_concat(
                       string_split(lower(p_name), ' '),
                       [lower(p_brand), lower(p_type),
                        's' || (p_size % 8)::VARCHAR])) AS toks
              FROM part WHERE p_partkey % 3 = 0
            ), tok AS (
              SELECT rid, unnest(toks) AS tok FROM recs
            ), kept AS (
              SELECT tok FROM tok GROUP BY tok
              HAVING count(*) BETWEEN 2 AND 500
            ), post AS (
              SELECT rid, tok FROM tok JOIN kept USING (tok)
            ), ov AS (
              SELECT a.rid AS a_id, b.rid AS b_id, count(*) AS ov
              FROM post a JOIN post b ON a.tok = b.tok AND a.rid < b.rid
              GROUP BY 1, 2 HAVING count(*) >= 3
            ), sym AS (
              SELECT a_id AS node, b_id AS nbr FROM ov
              UNION
              SELECT b_id AS node, a_id AS nbr FROM ov
            ), deg AS (
              SELECT node, count(*) AS d FROM sym GROUP BY node
            ), dd AS (
              SELECT s.node, s.nbr, dn.d AS deg_n, db.d AS deg_b
              FROM sym s JOIN deg dn ON s.node = dn.node
              JOIN deg db ON s.nbr = db.node
            ), dominated AS (
              SELECT DISTINCT node FROM dd
              WHERE deg_b > deg_n OR (deg_b = deg_n AND nbr < node)
            ), nodes AS (
              SELECT DISTINCT node FROM sym
            ), centers AS (
              SELECT node AS center_id FROM nodes
              ANTI JOIN dominated USING (node)
            ), memb AS (
              SELECT s.node AS record_id, c.center_id
              FROM sym s JOIN centers c ON s.nbr = c.center_id
            ), covered AS (
              SELECT record_id, center_id FROM memb
              UNION ALL
              SELECT center_id AS record_id, center_id FROM centers
            ), orphans AS (
              SELECT node AS record_id, node AS center_id FROM nodes
              ANTI JOIN (SELECT DISTINCT record_id AS node
                         FROM covered) USING (node)
            )
            SELECT record_id, center_id FROM covered
            UNION ALL
            SELECT record_id, center_id FROM orphans
        """,
        "er_pivot_clusters": """
            WITH RECURSIVE recs AS (
              SELECT p_partkey AS rid,
                     list_distinct(list_concat(
                       string_split(lower(p_name), ' '),
                       [lower(p_brand), lower(p_type),
                        's' || (p_size % 8)::VARCHAR])) AS toks
              FROM part WHERE p_partkey % 3 = 0
            ), tok AS (
              SELECT rid, unnest(toks) AS tok FROM recs
            ), kept AS (
              SELECT tok FROM tok GROUP BY tok
              HAVING count(*) BETWEEN 2 AND 500
            ), post AS (
              SELECT rid, tok FROM tok JOIN kept USING (tok)
            ), ov AS (
              SELECT a.rid AS a_id, b.rid AS b_id, count(*) AS ov
              FROM post a JOIN post b ON a.tok = b.tok AND a.rid < b.rid
              GROUP BY 1, 2 HAVING count(*) >= 3
            ), sym AS (
              SELECT a_id AS node, b_id AS nbr FROM ov
              UNION
              SELECT b_id AS node, a_id AS nbr FROM ov
            ), dd AS (
              -- dominance DAG: edges to the pi-earlier endpoint,
              -- pi = (Knuth multiplicative hash, id)
              SELECT node, nbr FROM sym
              WHERE ((nbr % 2147483648) * 2654435761) % 4294967296
                    < ((node % 2147483648) * 2654435761) % 4294967296
                 OR (((nbr % 2147483648) * 2654435761) % 4294967296
                     = ((node % 2147483648) * 2654435761) % 4294967296 AND nbr < node)
            ), nodes AS (
              SELECT DISTINCT node FROM sym
            ), roots AS (
              SELECT node FROM nodes
              ANTI JOIN (SELECT DISTINCT node FROM dd) USING (node)
            ), st AS (
              -- greedy pi-order MIS as a monotone fixpoint:
              -- IN when all dominating nbrs OUT, OUT when any IN.
              -- kind: 'adj' live adjacency, 'carry' statuses carried
              -- into the next iteration, 'final' emitted once.
              SELECT node, nbr, NULL::BOOLEAN AS is_in, 'adj' AS kind
              FROM dd
              UNION ALL
              SELECT node, NULL::BIGINT, TRUE, 'final' FROM roots
              UNION ALL
              SELECT node, NULL::BIGINT, TRUE, 'carry' FROM roots
              UNION ALL
              (
                WITH cur AS (SELECT * FROM st),
                und AS (SELECT node, nbr FROM cur WHERE kind = 'adj'),
                dec AS (SELECT node, is_in FROM cur WHERE kind = 'carry'),
                new_non AS (
                  SELECT DISTINCT u.node FROM und u
                  JOIN dec d ON u.nbr = d.node AND d.is_in
                ), blocked AS (
                  SELECT DISTINCT u.node FROM und u
                  ANTI JOIN (SELECT node FROM dec WHERE NOT is_in) o
                    ON u.nbr = o.node
                ), newly AS (
                  SELECT node, TRUE AS is_in
                  FROM (SELECT DISTINCT node FROM und) x
                  ANTI JOIN blocked USING (node)
                  UNION ALL
                  SELECT node, FALSE FROM new_non
                ), surv AS (
                  SELECT u.node, u.nbr FROM und u
                  ANTI JOIN newly nw ON u.node = nw.node
                )
                SELECT node, NULL::BIGINT AS nbr, is_in, 'final' AS kind
                FROM newly
                UNION ALL
                SELECT node, nbr, NULL::BOOLEAN, 'adj' FROM surv
                UNION ALL
                SELECT node, NULL::BIGINT, is_in, 'carry'
                FROM (SELECT node, is_in FROM dec
                      UNION ALL SELECT node, is_in FROM newly) dn
                WHERE EXISTS (SELECT 1 FROM surv)
              )
            ), pivots AS (
              SELECT node FROM st WHERE kind = 'final' AND is_in
            ), asg AS (
              -- a non-pivot's grabber is its pi-first dominating pivot
              SELECT d.node AS record_id, d.nbr AS cluster_id
              FROM dd d JOIN pivots p ON d.nbr = p.node
              QUALIFY row_number() OVER (
                PARTITION BY d.node
                ORDER BY ((d.nbr % 2147483648) * 2654435761) % 4294967296, d.nbr) = 1
            )
            SELECT node AS record_id, node AS cluster_id FROM pivots
            UNION ALL
            SELECT record_id, cluster_id FROM asg
        """,
        "f_soft_tfidf_lev": """
            WITH docs AS (
              SELECT doc_id AS record_id,
                     (string_split(text, ' '))[1:10] AS tokens
              FROM documents
            ), nrec AS (SELECT count(*)::DOUBLE AS n FROM docs),
            tok AS (
              SELECT record_id, unnest(tokens) AS token FROM docs
            ), idf AS (
              SELECT token,
                     floor(ln(1 + (SELECT n FROM nrec)
                              / count(DISTINCT record_id))
                           * 1000000.0)::BIGINT AS idf_fp
              FROM tok GROUP BY token
            ), wts AS (
              SELECT t.record_id, t.token, t.tf * i.idf_fp AS w_fp
              FROM (SELECT record_id, token, count(*) AS tf
                    FROM tok GROUP BY record_id, token) t
              JOIN idf i USING (token)
            ), nrm AS (
              SELECT record_id, sum(w_fp * w_fp)::BIGINT AS norm2
              FROM wts GROUP BY record_id
            ), a AS (
              SELECT record_id AS a_id, record_id % 5 AS bk
              FROM docs WHERE record_id % 10 = 0
            ), b AS (
              SELECT record_id AS b_id, record_id % 5 AS bk
              FROM docs WHERE record_id % 7 = 3
            ), p AS (SELECT a_id, b_id FROM a JOIN b USING (bk)),
            cr AS (
              SELECT p.a_id, p.b_id, wa.token AS ta, wa.w_fp AS wa,
                     wb.token AS tb, wb.w_fp AS wb
              FROM p
              JOIN wts wa ON wa.record_id = p.a_id
              JOIN wts wb ON wb.record_id = p.b_id
            ), best AS (
              SELECT a_id, b_id, ta, wa, wb,
                     ((greatest(length(ta), length(tb))
                       - levenshtein(ta, tb)) * 1000000)
                     // greatest(length(ta), length(tb)) AS sim_micro
              FROM cr
              WHERE ((greatest(length(ta), length(tb))
                      - levenshtein(ta, tb)) * 1000000)
                    // greatest(length(ta), length(tb)) >= 500000
              QUALIFY row_number() OVER (
                PARTITION BY a_id, b_id, ta
                ORDER BY sim_micro DESC, wb DESC, tb ASC) = 1
            ), contrib AS (
              SELECT a_id, b_id,
                     sum(((wa * wb) // 1000000) * sim_micro)::BIGINT
                       AS numer
              FROM best GROUP BY a_id, b_id
            )
            SELECT p.a_id, p.b_id,
                   COALESCE(
                     floor(c.numer::DOUBLE / sqrt(na.norm2::DOUBLE)
                           / sqrt(nb.norm2::DOUBLE)
                           * 1000000.0 + 0.5)::BIGINT,
                     0) AS soft_tfidf_lev_fp
            FROM p
            LEFT JOIN contrib c USING (a_id, b_id)
            JOIN nrm na ON na.record_id = p.a_id
            JOIN nrm nb ON nb.record_id = p.b_id
        """,
        "er_progressive": """
            WITH recs AS (
              SELECT p_partkey AS rid, lower(p_name) AS nm FROM part
              WHERE p_partkey % 10 = 0 AND p_partkey < 5000
            ), b AS (
              SELECT DISTINCT unnest(string_split(nm, ' ')) AS bk, rid
              FROM recs
            ), contrib AS (
              SELECT bk,
                     1000000000000::BIGINT // ((bsz * (bsz - 1)) // 2)
                       AS contrib
              FROM (SELECT bk, count(*) AS bsz FROM b GROUP BY bk)
              WHERE bsz BETWEEN 2 AND 100
            ), kept AS (
              SELECT b.rid, b.bk, c.contrib FROM b JOIN contrib c USING (bk)
            ), agg AS (
              SELECT a.rid AS a_id, bb.rid AS b_id,
                     sum(a.contrib)::BIGINT AS arcs_fp,
                     count(*)::BIGINT AS n_shared
              FROM kept a JOIN kept bb USING (bk)
              WHERE a.rid < bb.rid
              GROUP BY a.rid, bb.rid
            ), ranked AS (
              SELECT *, row_number() OVER (ORDER BY arcs_fp DESC, a_id,
                                           b_id) AS rn
              FROM agg
            )
            SELECT a_id, b_id, arcs_fp, n_shared
            FROM ranked WHERE rn <= 200
        """,
        "er_scheme_masks": """
            WITH recs AS (
              SELECT p_partkey AS rid, lower(p_name) AS nm FROM part
              WHERE p_partkey % 10 = 0 AND p_partkey < 5000
            ), m_exact AS (
              SELECT DISTINCT rid, 'x:' || nm AS k FROM recs
            ), m_prefix AS (
              SELECT DISTINCT rid, 'p:' || substr(nm, 1, 4) AS k FROM recs
            ), m_token AS (
              SELECT DISTINCT rid, 't:' || t AS k
              FROM (SELECT rid,
                           unnest(list_distinct(string_split(nm, ' '))) AS t
                    FROM recs)
            ), tagged AS (
                SELECT a.rid AS a_id, b.rid AS b_id, 1::BIGINT AS bit
                FROM m_exact a JOIN m_exact b USING (k)
                JOIN (SELECT k FROM m_exact GROUP BY k
                      HAVING count(*) BETWEEN 2 AND 100) ok USING (k)
                WHERE a.rid < b.rid
              UNION
                SELECT a.rid, b.rid, 2::BIGINT
                FROM m_prefix a JOIN m_prefix b USING (k)
                JOIN (SELECT k FROM m_prefix GROUP BY k
                      HAVING count(*) BETWEEN 2 AND 100) ok USING (k)
                WHERE a.rid < b.rid
              UNION
                SELECT a.rid, b.rid, 4::BIGINT
                FROM m_token a JOIN m_token b USING (k)
                JOIN (SELECT k FROM m_token GROUP BY k
                      HAVING count(*) BETWEEN 2 AND 100) ok USING (k)
                WHERE a.rid < b.rid
            ), pair_masks AS (
              SELECT a_id, b_id, bit_or(bit)::BIGINT AS mask
              FROM tagged GROUP BY a_id, b_id
            ), cand_hist AS (
              SELECT mask, count(*)::BIGINT AS n_candidates
              FROM pair_masks GROUP BY mask
            ), gold AS (
              SELECT a.rid AS a_id, b.rid AS b_id
              FROM recs a JOIN recs b ON b.rid = a.rid + 1000
            ), gold_hist AS (
              SELECT coalesce(pm.mask, 0)::BIGINT AS mask,
                     count(*)::BIGINT AS n_gold
              FROM gold g LEFT JOIN pair_masks pm USING (a_id, b_id)
              GROUP BY coalesce(pm.mask, 0)
            )
            SELECT coalesce(c.mask, g.mask) AS mask,
                   coalesce(c.n_candidates, 0)::BIGINT AS n_candidates,
                   coalesce(g.n_gold, 0)::BIGINT AS n_gold
            FROM cand_hist c FULL JOIN gold_hist g ON c.mask = g.mask
        """,
        "er_uncertainty_queue": """
            WITH c AS (
              SELECT c_custkey AS a_id FROM customer
              WHERE c_custkey % 5 = 0
            ), s AS (
              SELECT s_suppkey AS b_id FROM supplier
            ), pairs AS (
              SELECT a_id, b_id,
                     ((a_id * 31 + b_id * 17) % 1009) / 1008.0
                       AS match_prob
              FROM c JOIN s ON a_id % 25 = b_id % 25
            ), u AS (
              SELECT a_id, b_id, match_prob,
                     1000000::BIGINT
                       - abs(floor((2 * match_prob - 1) * 1000000.0
                                   + 0.5)::BIGINT) AS uncertainty_fp
              FROM pairs
            ), ranked AS (
              SELECT *, row_number() OVER (ORDER BY uncertainty_fp DESC,
                                           a_id, b_id) AS rn
              FROM u
            )
            SELECT a_id, b_id, match_prob, uncertainty_fp
            FROM ranked WHERE rn <= 50
        """,
        "block_suffix_array": """
            WITH r AS (
              SELECT p_partkey AS rid, lower(p_name) AS k
              FROM part WHERE p_partkey % 10 = 0 AND p_partkey < 5000
            ), ex AS (
              SELECT DISTINCT rid, sfx FROM (
                SELECT rid,
                       unnest(list_transform(
                         generate_series(1, greatest(1, length(k) - 5 + 1)),
                         i -> substr(k, i))) AS sfx
                FROM r)
            ), sizes AS (
              SELECT sfx, count(*) AS bsz FROM ex GROUP BY sfx
            ), kept AS (
              SELECT ex.rid, ex.sfx FROM ex JOIN sizes USING (sfx)
              WHERE bsz BETWEEN 2 AND 50
            )
            SELECT a.rid AS a_id, b.rid AS b_id, count(*) AS n_shared,
                   'suffix_array' AS source
            FROM kept a JOIN kept b ON a.sfx = b.sfx AND a.rid < b.rid
            GROUP BY a.rid, b.rid
        """,
        "block_meta_cnp": """
            WITH b AS (
              SELECT DISTINCT tok AS bk, p_partkey AS rid
              FROM (SELECT p_partkey,
                           unnest(string_split(lower(p_name), ' ')) AS tok
                    FROM part
                    WHERE p_partkey % 10 = 0 AND p_partkey < 5000)
            ), sizes AS (
              SELECT bk, count(*) AS bsz FROM b GROUP BY bk
            ), kept AS (
              SELECT b.bk, b.rid FROM b JOIN sizes USING (bk)
              WHERE bsz >= 2 AND bsz <= 100
            ), pairs AS (
              SELECT x.bk, x.rid AS a_id, y.rid AS b_id
              FROM kept x JOIN kept y ON x.bk = y.bk AND x.rid < y.rid
            ), edges AS (
              SELECT a_id, b_id, count(*) AS cbs FROM pairs
              GROUP BY a_id, b_id
            ), directed AS (
              SELECT a_id AS node, b_id AS nbr, cbs FROM edges
              UNION ALL
              SELECT b_id AS node, a_id AS nbr, cbs FROM edges
            ), rk AS (
              SELECT node, nbr,
                     row_number() OVER (
                       PARTITION BY node ORDER BY cbs DESC, nbr) AS rn
              FROM directed
            ), surv AS (
              SELECT DISTINCT least(node, nbr) AS a_id,
                              greatest(node, nbr) AS b_id
              FROM rk WHERE rn <= 3
            )
            SELECT s.a_id, s.b_id, e.cbs
            FROM surv s JOIN edges e USING (a_id, b_id)
        """,
        "block_quality": """
            WITH recs AS (
              SELECT c_custkey, c_nationkey,
                     c_mktsegment || '-' || lpad(c_nationkey::VARCHAR, 2, '0')
                       AS cc
              FROM customer WHERE c_custkey % 10 = 0
            ), ranked AS (
              SELECT c_custkey AS rec_id, cc,
                     row_number() OVER (ORDER BY cc, c_custkey) AS rnk
              FROM recs
            ), sn AS (
              SELECT 'sn' AS src,
                     least(a.rec_id, b.rec_id) AS a,
                     greatest(a.rec_id, b.rec_id) AS b
              FROM ranked a
              JOIN ranked b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 2
            ), nb AS (
              SELECT 'nation_block' AS src, x.c_custkey AS a, y.c_custkey AS b
              FROM recs x JOIN recs y
                ON x.c_nationkey = y.c_nationkey
               AND x.c_custkey < y.c_custkey
            ), canon0 AS (
              SELECT DISTINCT src, a, b
              FROM (SELECT * FROM sn UNION ALL SELECT * FROM nb)
            ), canon AS (
              SELECT src, a, b FROM canon0
              UNION
              SELECT '__all__' AS src, a, b FROM canon0
            ), gold AS (
              SELECT x.c_custkey AS a, x.c_custkey + 10 AS b
              FROM recs x JOIN recs y ON y.c_custkey = x.c_custkey + 10
            ), tot AS (
              SELECT count(*)::DOUBLE AS nn FROM recs
            ), g AS (
              SELECT count(*) AS n_gold FROM gold
            ), agg AS (
              SELECT c.src, count(*) AS n_candidates,
                     sum(CASE WHEN gd.a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                       AS n_true_positives
              FROM canon c
              LEFT JOIN gold gd ON c.a = gd.a AND c.b = gd.b
              GROUP BY c.src
            )
            SELECT src AS source, n_candidates, n_true_positives,
                   (SELECT n_gold FROM g) AS n_gold,
                   floor(n_true_positives::DOUBLE
                         / (SELECT n_gold FROM g)::DOUBLE
                         * 1000000.0 + 0.5)::BIGINT AS pc_fp,
                   floor(n_true_positives::DOUBLE / n_candidates::DOUBLE
                         * 1000000.0 + 0.5)::BIGINT AS pq_fp,
                   floor((1.0 - n_candidates::DOUBLE
                          / (SELECT floor(nn * (nn - 1) / 2) FROM tot))
                         * 1000000.0 + 0.5)::BIGINT AS rr_fp
            FROM agg
        """,
        "calibration_bins": """
            WITH s AS (
              SELECT (l_partkey % 997)::DOUBLE / 996.0 AS prob,
                     CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE 0 END AS label
              FROM lineitem
            ), b AS (
              SELECT least(9, floor(
                       floor(prob * 1000000.0 + 0.5) / 100000)::INT) AS bin,
                     floor(prob * 1000000.0 + 0.5)::BIGINT AS p_fp,
                     label
              FROM s
            )
            SELECT bin, count(*) AS n, sum(label)::BIGINT AS n_pos,
                   floor(sum(p_fp)::DOUBLE / count(*))::BIGINT
                     AS mean_prob_fp,
                   floor((sum(label) * 1000000)::DOUBLE / count(*))::BIGINT
                     AS pos_rate_fp
            FROM b GROUP BY bin
        """,
        "fs_match_weight": f"""
            WITH cmp AS (
              SELECT c_custkey AS chain_id, s_suppkey AS entity_id,
                     CASE WHEN c_custkey % 2 = s_suppkey % 2
                          THEN 1 ELSE 0 END AS g1,
                     CASE WHEN c_custkey % 3 = s_suppkey % 3
                          THEN 1 ELSE 0 END AS g2,
                     CASE WHEN c_custkey % 7 = s_suppkey % 7
                          THEN 1 ELSE 0 END AS g3
              FROM customer
              JOIN supplier ON c_custkey % 25 = s_suppkey % 25
            )
            SELECT chain_id, entity_id, g1, g2, g3,
                   ({fs_terms})::BIGINT AS fs_weight_fp
            FROM cmp
        """,
        "fs_tf_weight": f"""
            WITH tfreq AS (
              SELECT c_nationkey AS nat, count(*) AS n_v
              FROM customer WHERE c_nationkey IS NOT NULL
              GROUP BY c_nationkey
            ), tft AS (
              SELECT nat,
                     floor(ln((SELECT sum(n_v) FROM tfreq)::DOUBLE
                              / n_v::DOUBLE)
                           * {LOG2E_FP!r} + 0.5)::BIGINT AS tf_log2_fp
              FROM tfreq
            ), cmp AS (
              SELECT c_custkey AS chain_id, s_suppkey AS entity_id,
                     c_nationkey AS a_nat,
                     CASE WHEN c_nationkey = s_nationkey
                          THEN 1 ELSE 0 END AS g_nat,
                     CASE WHEN c_custkey % 3 = s_suppkey % 3
                          THEN 1 ELSE 0 END AS g2,
                     CASE WHEN c_custkey % 7 = s_suppkey % 7
                          THEN 1 ELSE 0 END AS g3
              FROM customer
              JOIN supplier ON c_custkey % 25 = s_suppkey % 25
            ), wt AS (
              SELECT cmp.*, t.tf_log2_fp
              FROM cmp LEFT JOIN tft t ON cmp.a_nat = t.nat
            )
            SELECT chain_id, entity_id, g_nat, g2, g3, a_nat,
                   ({fs_tf_terms})::BIGINT AS fs_weight_fp
            FROM wt
        """,
        "r10_mutual_best": f"""
            WITH {_pairs_cte()}
            SELECT chain_id, entity_id, match_score FROM pairs
            {_MUTUAL_QUALIFY}
        """,
        "r11_one_to_one": _one_to_one_sql(3, 2000, 500),
        "c8_cluster_ari": f"""
            WITH {_pair_counts_sql(
                "c_mktsegment", "(c_nationkey % 7)::VARCHAR")}
            SELECT n, both_pairs, pred_pairs, gold_pairs,
                   CASE WHEN (pred_pairs::DOUBLE + gold_pairs::DOUBLE) / 2.0
                             - pred_pairs::DOUBLE * gold_pairs::DOUBLE
                               / (((n * (n - 1)) >> 1)::DOUBLE) <> 0
                        THEN floor(
                          (both_pairs::DOUBLE
                           - pred_pairs::DOUBLE * gold_pairs::DOUBLE
                             / (((n * (n - 1)) >> 1)::DOUBLE))
                          / ((pred_pairs::DOUBLE + gold_pairs::DOUBLE) / 2.0
                             - pred_pairs::DOUBLE * gold_pairs::DOUBLE
                               / (((n * (n - 1)) >> 1)::DOUBLE))
                          * 1000000.0 + 0.5)::BIGINT
                   END AS ari_fp
            FROM tot, pa, ga
        """,
        "c9_pairwise_prf": f"""
            WITH {_pair_counts_sql(
                "c_mktsegment",
                "c_mktsegment || '-' || (c_nationkey % 3)::VARCHAR")}
            SELECT n, both_pairs, pred_pairs, gold_pairs,
                   floor(both_pairs::DOUBLE / pred_pairs::DOUBLE
                         * 1000000.0 + 0.5)::BIGINT AS p_fp,
                   floor(both_pairs::DOUBLE / gold_pairs::DOUBLE
                         * 1000000.0 + 0.5)::BIGINT AS r_fp,
                   floor(2.0 * (both_pairs::DOUBLE / pred_pairs::DOUBLE)
                             * (both_pairs::DOUBLE / gold_pairs::DOUBLE)
                         / (both_pairs::DOUBLE / pred_pairs::DOUBLE
                            + both_pairs::DOUBLE / gold_pairs::DOUBLE)
                         * 1000000.0 + 0.5)::BIGINT AS f1_fp
            FROM tot, pa, ga
        """,
        "c10_blanc": f"""
            WITH {_pair_counts_sql(
                "c_mktsegment", "(c_nationkey % 5)::VARCHAR")},
            base AS (
              SELECT n, both_pairs, pred_pairs, gold_pairs,
                     ((n * (n - 1)) >> 1) AS t
              FROM tot, pa, ga
            ), r AS (
              SELECT *,
                     t - pred_pairs - gold_pairs + both_pairs AS rn,
                     t - pred_pairs AS np, t - gold_pairs AS ng
              FROM base
            ), g AS (
              SELECT *,
                CASE WHEN pred_pairs > 0 AND gold_pairs > 0
                          AND both_pairs > 0 THEN
                  2.0 * (both_pairs::DOUBLE / pred_pairs::DOUBLE)
                      * (both_pairs::DOUBLE / gold_pairs::DOUBLE)
                  / (both_pairs::DOUBLE / pred_pairs::DOUBLE
                     + both_pairs::DOUBLE / gold_pairs::DOUBLE)
                ELSE 0.0 END AS f_c,
                CASE WHEN np > 0 AND ng > 0 AND rn > 0 THEN
                  2.0 * (rn::DOUBLE / np::DOUBLE)
                      * (rn::DOUBLE / ng::DOUBLE)
                  / (rn::DOUBLE / np::DOUBLE + rn::DOUBLE / ng::DOUBLE)
                ELSE 0.0 END AS f_n
              FROM r
            )
            SELECT n, both_pairs, pred_pairs, gold_pairs, rn,
                   t AS total_links,
                   CASE WHEN pred_pairs > 0 THEN
                     floor(both_pairs::DOUBLE / pred_pairs::DOUBLE
                           * 1000000.0 + 0.5)::BIGINT ELSE 0 END AS p_c_fp,
                   CASE WHEN gold_pairs > 0 THEN
                     floor(both_pairs::DOUBLE / gold_pairs::DOUBLE
                           * 1000000.0 + 0.5)::BIGINT ELSE 0 END AS r_c_fp,
                   floor(f_c * 1000000.0 + 0.5)::BIGINT AS f_c_fp,
                   CASE WHEN np > 0 THEN
                     floor(rn::DOUBLE / np::DOUBLE
                           * 1000000.0 + 0.5)::BIGINT ELSE 0 END AS p_n_fp,
                   CASE WHEN ng > 0 THEN
                     floor(rn::DOUBLE / ng::DOUBLE
                           * 1000000.0 + 0.5)::BIGINT ELSE 0 END AS r_n_fp,
                   floor(f_n * 1000000.0 + 0.5)::BIGINT AS f_n_fp,
                   floor(
                     CASE WHEN pred_pairs = 0 AND gold_pairs = 0 THEN f_n
                          WHEN np = 0 AND ng = 0 THEN f_c
                          ELSE (f_c + f_n) / 2.0 END
                     * 1000000.0 + 0.5)::BIGINT AS blanc_fp
            FROM g
        """,
        "er_swoosh": _swoosh_oracle_sql(),
        "er_hac_clusters": _hac_oracle_sql(),
        "er_lpa_clusters": _lpa_oracle_sql(),
        "er_constrained_clusters": _constrained_oracle_sql(),
        "er_hac_complete": _hac_complete_oracle_sql(),
        "web_url_canonical": f"""
            WITH {_web_canon_sql()}
            SELECT doc_id, url, canon_url, host, domain FROM canon
        """,
        "web_dedup_url": f"""
            WITH {_web_canon_sql()}
            SELECT canon_url, count(*) AS n_fetches,
                   min(doc_id) AS first_doc
            FROM canon WHERE canon_url IS NOT NULL
            GROUP BY canon_url HAVING count(*) >= 2
        """,
        "block_meta_wep": """
            WITH b AS (
              SELECT DISTINCT tok AS bk, p_partkey AS rid
              FROM (SELECT p_partkey,
                           unnest(string_split(lower(p_name), ' ')) AS tok
                    FROM part
                    WHERE p_partkey % 10 = 0 AND p_partkey < 5000)
            ), sizes AS (
              SELECT bk, count(*) AS bsz FROM b GROUP BY bk
            ), kept AS (
              SELECT b.bk, b.rid FROM b JOIN sizes USING (bk)
              WHERE bsz >= 2 AND bsz <= 100
            ), pairs AS (
              SELECT x.bk, x.rid AS a_id, y.rid AS b_id
              FROM kept x JOIN kept y ON x.bk = y.bk AND x.rid < y.rid
            ), edges AS (
              SELECT a_id, b_id, count(*) AS cbs FROM pairs
              GROUP BY a_id, b_id
            ), nb AS (
              SELECT rid, count(DISTINCT bk) AS nbl FROM kept GROUP BY rid
            ), bt AS (
              SELECT count(DISTINCT bk)::DOUBLE AS nb_total FROM kept
            ), w AS (
              SELECT a_id, b_id,
                     floor(cbs::DOUBLE
                           * ln(nb_total / na.nbl::DOUBLE)
                           * ln(nb_total / nbb.nbl::DOUBLE)
                           * 1e6)::BIGINT AS w_micro
              FROM edges
              JOIN nb na ON na.rid = a_id
              JOIN nb nbb ON nbb.rid = b_id, bt
            ), s AS (
              SELECT sum(w_micro)::BIGINT AS ws, count(*)::BIGINT AS n
              FROM w
            )
            SELECT a_id, b_id, w_micro FROM w, s
            WHERE w_micro * n >= ws
        """,
        "dedup_winnow": _winnow_oracle_sql(),
        "block_meta_wnp": """
            WITH b AS (
              SELECT DISTINCT tok AS bk, p_partkey AS rid
              FROM (SELECT p_partkey,
                           unnest(string_split(lower(p_name), ' ')) AS tok
                    FROM part
                    WHERE p_partkey % 10 = 0 AND p_partkey < 5000)
            ), sizes AS (
              SELECT bk, count(*) AS bsz FROM b GROUP BY bk
            ), kept AS (
              SELECT b.bk, b.rid FROM b JOIN sizes USING (bk)
              WHERE bsz >= 2 AND bsz <= 100
            ), pairs AS (
              SELECT x.bk, x.rid AS a_id, y.rid AS b_id
              FROM kept x JOIN kept y ON x.bk = y.bk AND x.rid < y.rid
            ), edges AS (
              SELECT a_id, b_id, count(*) AS cbs FROM pairs
              GROUP BY a_id, b_id
            ), directed AS (
              SELECT a_id AS node, b_id AS nbr, cbs FROM edges
              UNION ALL
              SELECT b_id AS node, a_id AS nbr, cbs FROM edges
            ), ns AS (
              SELECT node, sum(cbs) AS ws, count(*) AS wn
              FROM directed GROUP BY node
            ), kd AS (
              SELECT least(d.node, d.nbr) AS a_id,
                     greatest(d.node, d.nbr) AS b_id
              FROM directed d JOIN ns USING (node)
              WHERE d.cbs * wn >= ws
            ), surv AS (
              SELECT a_id, b_id FROM kd
              GROUP BY a_id, b_id HAVING count(*) >= 1
            )
            SELECT s.a_id, s.b_id, e.cbs
            FROM surv s JOIN edges e USING (a_id, b_id)
        """,
        "block_meta_rcnp": """
            WITH b AS (
              SELECT DISTINCT tok AS bk, p_partkey AS rid
              FROM (SELECT p_partkey,
                           unnest(string_split(lower(p_name), ' ')) AS tok
                    FROM part
                    WHERE p_partkey % 10 = 0 AND p_partkey < 5000)
            ), sizes AS (
              SELECT bk, count(*) AS bsz FROM b GROUP BY bk
            ), kept AS (
              SELECT b.bk, b.rid FROM b JOIN sizes USING (bk)
              WHERE bsz >= 2 AND bsz <= 100
            ), pairs AS (
              SELECT x.bk, x.rid AS a_id, y.rid AS b_id
              FROM kept x JOIN kept y ON x.bk = y.bk AND x.rid < y.rid
            ), edges AS (
              SELECT a_id, b_id, count(*) AS cbs FROM pairs
              GROUP BY a_id, b_id
            ), directed AS (
              SELECT a_id AS node, b_id AS nbr, cbs FROM edges
              UNION ALL
              SELECT b_id AS node, a_id AS nbr, cbs FROM edges
            ), rk AS (
              SELECT node, nbr,
                     row_number() OVER (
                       PARTITION BY node ORDER BY cbs DESC, nbr) AS rn
              FROM directed
            ), surv AS (
              SELECT least(node, nbr) AS a_id,
                     greatest(node, nbr) AS b_id
              FROM rk WHERE rn <= 3
              GROUP BY 1, 2 HAVING count(*) = 2
            )
            SELECT s.a_id, s.b_id, e.cbs
            FROM surv s JOIN edges e USING (a_id, b_id)
        """,
        "block_adaptive_sn": """
            WITH recs AS (
              SELECT p_partkey AS rid, lower(p_name) AS k FROM part
              WHERE p_partkey % 10 = 0 AND p_partkey < 5000
            ), r AS (
              SELECT rid, k, row_number() OVER (ORDER BY k, rid) AS rnk
              FROM recs
            ), f AS (
              SELECT rid, rnk,
                     CASE WHEN lag(k) OVER (ORDER BY rnk) IS NULL
                          OR levenshtein(lag(k) OVER (ORDER BY rnk), k) <= 6
                       THEN 0 ELSE 1 END AS cut
              FROM r
            ), b AS (
              SELECT rid, rnk,
                     (sum(cut) OVER (ORDER BY rnk) + 1)::BIGINT AS block_id
              FROM f
            ), sz AS (
              SELECT block_id, count(*) AS c FROM b GROUP BY block_id
            ), kept AS (
              SELECT b.rid, b.rnk, b.block_id FROM b
              JOIN sz USING (block_id) WHERE c >= 2 AND c <= 50
            )
            SELECT x.rid AS a_id, y.rid AS b_id, x.block_id
            FROM kept x JOIN kept y
              ON x.block_id = y.block_id AND x.rnk < y.rnk
        """,
        "c11_modularity": """
            WITH asg AS (
              SELECT c_custkey AS node,
                     c_mktsegment || '-' || (c_nationkey % 5)::VARCHAR AS cl
              FROM customer
            ), e0 AS (
              SELECT a.c_custkey AS ea, a.c_custkey + 7 AS eb,
                     ((a.c_custkey + a.c_custkey + 7) % 97)::DOUBLE / 100.0
                       AS score
              FROM customer a
              JOIN customer b ON b.c_custkey = a.c_custkey + 7
            ), e AS (
              SELECT least(ea, eb) AS ea2, greatest(ea, eb) AS eb2,
                     min(floor(score * 1e6 + 0.5)::BIGINT) AS w
              FROM e0 WHERE ea <> eb GROUP BY 1, 2
            ), bo AS (
              SELECT x.cl AS cla, y.cl AS clb, e.w FROM e
              JOIN asg x ON x.node = e.ea2
              JOIN asg y ON y.node = e.eb2
            ), deg AS (
              SELECT cl, sum(w)::BIGINT AS deg_fp FROM (
                SELECT cla AS cl, w FROM bo
                UNION ALL SELECT clb AS cl, w FROM bo
              ) GROUP BY cl
            ), win AS (
              SELECT cla AS cl, sum(w)::BIGINT AS w_in_fp FROM bo
              WHERE cla = clb GROUP BY cla
            ), ns AS (
              SELECT cl, count(*) AS n_nodes FROM asg GROUP BY cl
            ), m AS (
              SELECT coalesce(sum(w), 0)::BIGINT AS mv FROM bo
            ), per AS (
              SELECT ns.cl AS cluster, n_nodes,
                     coalesce(w_in_fp, 0)::BIGINT AS w_in_fp,
                     coalesce(deg_fp, 0)::BIGINT AS deg_fp
              FROM ns LEFT JOIN deg ON deg.cl = ns.cl
              LEFT JOIN win ON win.cl = ns.cl
            ), perc AS (
              SELECT cluster, n_nodes, w_in_fp, deg_fp,
                     CASE WHEN mv > 0 THEN
                       (floor(w_in_fp::DOUBLE * 1e9 / mv::DOUBLE)
                        - floor(deg_fp::DOUBLE * deg_fp::DOUBLE * 1e9
                                / (4.0 * mv::DOUBLE * mv::DOUBLE)))::BIGINT
                     ELSE 0 END AS contrib_nano
              FROM per, m
            )
            SELECT cluster::VARCHAR AS cluster, n_nodes, w_in_fp, deg_fp,
                   contrib_nano
            FROM perc
            UNION ALL
            SELECT '__total__', sum(n_nodes)::BIGINT, sum(w_in_fp)::BIGINT,
                   sum(deg_fp)::BIGINT, sum(contrib_nano)::BIGINT
            FROM perc
        """,
        "f_tfidf_cosine": """
            WITH docs AS (
              SELECT doc_id AS record_id,
                     (string_split(text, ' '))[1:10] AS tokens
              FROM documents
            ), nrec AS (SELECT count(*)::DOUBLE AS n FROM docs),
            tok AS (
              SELECT record_id, unnest(tokens) AS token FROM docs
            ), idf AS (
              SELECT token,
                     floor(ln(1 + (SELECT n FROM nrec) / count(DISTINCT record_id))
                           * 1000000.0)::BIGINT AS idf_fp
              FROM tok GROUP BY token
            ), wts AS (
              SELECT t.record_id, t.token, t.tf * i.idf_fp AS w_fp
              FROM (SELECT record_id, token, count(*) AS tf
                    FROM tok GROUP BY record_id, token) t
              JOIN idf i USING (token)
            ), nrm AS (
              SELECT record_id, sum(w_fp * w_fp)::BIGINT AS norm2
              FROM wts GROUP BY record_id
            ), a AS (
              SELECT record_id AS a_id, record_id % 5 AS bk
              FROM docs WHERE record_id % 10 = 0
            ), b AS (
              SELECT record_id AS b_id, record_id % 5 AS bk
              FROM docs WHERE record_id % 7 = 3
            ), p AS (SELECT a_id, b_id FROM a JOIN b USING (bk)),
            dots AS (
              SELECT p.a_id, p.b_id,
                     sum(wa.w_fp * wb.w_fp)::BIGINT AS dot
              FROM p
              JOIN wts wa ON wa.record_id = p.a_id
              JOIN wts wb ON wb.record_id = p.b_id AND wb.token = wa.token
              GROUP BY p.a_id, p.b_id
            )
            SELECT p.a_id, p.b_id,
                   COALESCE(
                     floor(d.dot::DOUBLE / sqrt(na.norm2::DOUBLE)
                           / sqrt(nb.norm2::DOUBLE)
                           * 1000000.0 + 0.5)::BIGINT,
                     0) AS tfidf_cosine_fp
            FROM p
            LEFT JOIN dots d USING (a_id, b_id)
            JOIN nrm na ON na.record_id = p.a_id
            JOIN nrm nb ON nb.record_id = p.b_id
        """,
        "fs_three_band": f"""
            WITH cmp AS (
              SELECT c_custkey AS chain_id, s_suppkey AS entity_id,
                     CASE WHEN c_custkey % 2 = s_suppkey % 2
                          THEN 1 ELSE 0 END AS g1,
                     CASE WHEN c_custkey % 3 = s_suppkey % 3
                          THEN 1 ELSE 0 END AS g2,
                     CASE WHEN c_custkey % 7 = s_suppkey % 7
                          THEN 1 ELSE 0 END AS g3
              FROM customer
              JOIN supplier ON c_custkey % 25 = s_suppkey % 25
            ), scored AS (
              SELECT chain_id, entity_id, g1, g2, g3,
                     ({fs_terms})::BIGINT AS fs_weight_fp
              FROM cmp
            )
            SELECT chain_id, entity_id, g1, g2, g3, fs_weight_fp,
                   CASE WHEN fs_weight_fp >= {fs_band['upper_fp']}
                          THEN 'match'
                        WHEN fs_weight_fp <= {fs_band['lower_fp']}
                          THEN 'non_match'
                        ELSE 'possible' END AS fs_band
            FROM scored
        """,
        "er_dedupe_plan": """
            WITH recs AS (
              SELECT c_custkey AS record_id,
                     'cust ' || (c_custkey % 400)::VARCHAR AS name
              FROM customer
            )
            SELECT record_id,
                   min(record_id::VARCHAR) OVER (PARTITION BY name)
                     AS cluster
            FROM recs
        """,
        "fs_level_weight": f"""
            WITH {_pairs_cte()}, lv AS (
              SELECT chain_id, entity_id,
                     CASE WHEN ((chain_id * 11 + entity_id * 3) % 100)
                               / 100.0 >= 0.9 THEN 2
                          WHEN ((chain_id * 11 + entity_id * 3) % 100)
                               / 100.0 >= 0.5 THEN 1
                          ELSE 0 END AS s1,
                     CASE WHEN chain_id % 5 = entity_id % 5
                          THEN 1 ELSE 0 END AS s2
              FROM pairs
            )
            SELECT chain_id, entity_id, s1, s2,
                   {lvl_terms}::BIGINT AS fs_weight_fp
            FROM lv
        """,
        "fs_review_sample": f"""
            WITH cmp AS (
              SELECT c_custkey AS chain_id, s_suppkey AS entity_id,
                     CASE WHEN c_custkey % 2 = s_suppkey % 2
                          THEN 1 ELSE 0 END AS g1,
                     CASE WHEN c_custkey % 3 = s_suppkey % 3
                          THEN 1 ELSE 0 END AS g2,
                     CASE WHEN c_custkey % 7 = s_suppkey % 7
                          THEN 1 ELSE 0 END AS g3
              FROM customer
              JOIN supplier ON c_custkey % 25 = s_suppkey % 25
            ), banded AS (
              SELECT chain_id, entity_id, g1, g2, g3, fs_weight_fp,
                     CASE WHEN fs_weight_fp >= {fs_band['upper_fp']}
                            THEN 'match'
                          WHEN fs_weight_fp <= {fs_band['lower_fp']}
                            THEN 'non_match'
                          ELSE 'possible' END AS fs_band
              FROM (SELECT *, ({fs_terms})::BIGINT AS fs_weight_fp
                    FROM cmp)
            ), counts AS (
              SELECT fs_band, count(*) AS sn FROM banded GROUP BY fs_band
            ), pre AS (
              SELECT b.*,
                     ('0x' || substr(md5(b.chain_id::VARCHAR || chr(31)
                        || b.entity_id::VARCHAR), 1, 8))::BIGINT AS hv,
                     least(1.0, 4.0 * 20.0 / c.sn) AS p
              FROM banded b JOIN counts c USING (fs_band)
            )
            SELECT chain_id, entity_id, g1, g2, g3, fs_weight_fp, fs_band
            FROM pre
            WHERE hv::DOUBLE / 4294967296.0 < p
            QUALIFY row_number() OVER (
              PARTITION BY fs_band
              ORDER BY hv, chain_id::VARCHAR || chr(31)
                           || entity_id::VARCHAR) <= 20
        """,
        "er_golden_record": """
            WITH recs AS (
              SELECT (c_nationkey % 5)::VARCHAR AS cluster,
                     c_mktsegment AS segment,
                     CASE WHEN c_custkey % 7 <> 0
                          THEN (c_custkey % 3)::VARCHAR END AS grade
              FROM customer
            ), sizes AS (
              SELECT cluster, count(*) AS cluster_size
              FROM recs GROUP BY cluster
            ), melted AS (
              SELECT cluster, 'segment' AS attr, segment AS val
              FROM recs WHERE segment IS NOT NULL
              UNION ALL
              SELECT cluster, 'grade', grade
              FROM recs WHERE grade IS NOT NULL
            ), counted AS (
              SELECT cluster, attr, val, count(*) AS n
              FROM melted GROUP BY cluster, attr, val
            ), winners AS (
              SELECT cluster, attr, val FROM counted
              QUALIFY row_number() OVER (PARTITION BY cluster, attr
                        ORDER BY n DESC, val) = 1
            ), wide AS (
              SELECT cluster,
                     max(CASE WHEN attr = 'segment' THEN val END) AS segment,
                     max(CASE WHEN attr = 'grade' THEN val END) AS grade
              FROM winners GROUP BY cluster
            )
            SELECT s.cluster, s.cluster_size, w.segment, w.grade
            FROM sizes s LEFT JOIN wide w USING (cluster)
        """,
        "er_rep_name": """
            WITH counted AS (
              SELECT p_brand AS cluster, p_name AS name, count(*) AS n
              FROM part WHERE p_name IS NOT NULL
              GROUP BY p_brand, p_name
            )
            SELECT cluster, name AS rep_name FROM counted
            QUALIFY row_number() OVER (PARTITION BY cluster
                      ORDER BY n DESC, length(name) DESC, name) = 1
        """,
        "p15_tristate_cascade": """
            WITH ent AS (
              SELECT c_custkey, lower(c_mktsegment) AS origin,
                     CASE WHEN c_custkey % 3 = 0 THEN NULL
                          WHEN c_custkey % 3 = 1 THEN ''
                          ELSE 'http://ex/' || c_custkey END AS el,
                     CASE WHEN c_custkey % 5 < 2 THEN 'US'
                          WHEN c_custkey % 5 < 4 THEN 'FR'
                          ELSE NULL END AS cc
              FROM customer
            )
            SELECT c_custkey,
                   COALESCE(
                     CASE WHEN substr(origin, 1, 3) IN ('aut', 'bui')
                          THEN 1 END,
                     CASE WHEN el IS NOT NULL AND el <> '' THEN 1 END,
                     CASE WHEN cc = 'US' THEN 1 END,
                     0) AS kept
            FROM ent
        """,
        "p2_text_normalizer": """
            SELECT doc_id,
                   regexp_replace(
                     translate('“Q—' || substr(text, 1, 30) || '…’ 😀',
                               '‘’“”—…', $$''""-.$$),
                     '😀', '', 'g') AS normalized
            FROM documents
        """,
        "p4_fix_type": """
            SELECT c_custkey,
                   CASE lower(c_mktsegment)
                     WHEN 'building' THEN 'LOC'
                     WHEN 'automobile' THEN 'GPE'
                     ELSE 'ORG' END AS type
            FROM customer
        """,
        "p8_name_projector": """
            SELECT c_custkey,
                   CASE WHEN c_custkey % 4 = 0 THEN upper(c_name)
                        ELSE NULL END AS translit_string
            FROM customer
        """,
        "t7_dict_translator": """
            WITH m AS (
              SELECT p_partkey, string_split(p_name, ' ')[1] AS s
              FROM part
            )
            SELECT p_partkey,
                   CASE lower(s)
                     WHEN 'lemon' THEN 'limon'
                     WHEN 'navy' THEN 'marina'
                     WHEN 'metallic' THEN 'metalico'
                     ELSE NULL END AS translate_string
            FROM m
        """,
        "t4_single_space": r"""
            SELECT doc_id,
                   regexp_replace(text, '\s+', ' ', 'g') AS squeezed
            FROM documents
        """,
        "b4_type_conflation": """
            WITH gc AS (
              SELECT c_custkey % 25 AS bkey,
                     CASE WHEN (CASE WHEN c_custkey % 4 = 0 THEN 'GPE'
                                     WHEN c_custkey % 4 = 1 THEN 'LOC'
                                     WHEN c_custkey % 4 = 2 THEN 'PER'
                                     ELSE 'ORG' END) IN ('GPE', 'LOC')
                          THEN 'GPE|LOC'
                          ELSE (CASE WHEN c_custkey % 4 = 2 THEN 'PER'
                                     ELSE 'ORG' END) END AS type_group
              FROM customer
            ), ge AS (
              SELECT s_suppkey % 25 AS bkey,
                     CASE WHEN s_suppkey % 3 = 0 THEN 'GPE|LOC'
                          WHEN s_suppkey % 3 = 1 THEN 'PER'
                          ELSE 'ORG' END AS type_group
              FROM supplier
            )
            SELECT type_group, count(*) AS n_pairs
            FROM gc JOIN ge USING (type_group, bkey)
            GROUP BY type_group
        """,
        "f_bundle_native": """
            WITH c AS (
              SELECT c_custkey AS chain_id, c_custkey % 25 AS bkey,
                     c_custkey % 50 AS ck50
              FROM customer WHERE c_custkey % 9 = 0
            ), e AS (
              SELECT s_suppkey AS entity_id, s_suppkey % 25 AS bkey,
                     s_suppkey % 50 AS sk50,
                     CASE WHEN s_suppkey % 5 = 0 THEN 1 ELSE 2 END AS n_names,
                     CASE WHEN s_suppkey % 3 = 0 THEN 1 ELSE 0 END AS n_urls,
                     CASE WHEN s_suppkey % 2 = 0 THEN 1.0 ELSE 0.0 END
                       AS f_origin,
                     CASE WHEN s_suppkey % 7 IN (0, 1) THEN 1.0 ELSE 0.0 END
                       AS f_in_country
              FROM supplier
            )
            SELECT chain_id, entity_id,
                   f_origin,
                   f_in_country,
                   floor((1.0 - 1.0 / (1 + n_names)) * 10000.0 + 0.5)
                     / 10000.0 AS f_num_names,
                   floor((1.0 - 1.0 / (1 + n_urls)) * 10000.0 + 0.5)
                     / 10000.0 AS f_num_links,
                   CASE WHEN ck50 = sk50 THEN 1.0 ELSE 0.0 END
                     AS f_exact_match,
                   CASE WHEN ck50 = sk50 THEN 1.0 ELSE 0.0 END
                     AS f_last_name
            FROM c JOIN e USING (bkey)
        """,
        "r8_labeled_pairs": """
            WITH g AS (
              SELECT l_orderkey, l_linenumber, min(l_partkey) AS mn
              FROM lineitem GROUP BY 1, 2
            )
            SELECT l.l_orderkey AS doc_id, l.l_linenumber AS chain_id,
                   l.l_partkey AS entity_id,
                   CASE WHEN l.l_orderkey % 4 <> 0 AND l.l_partkey = g.mn
                        THEN 1 ELSE 0 END AS label
            FROM lineitem l
            JOIN g ON l.l_orderkey = g.l_orderkey
                  AND l.l_linenumber = g.l_linenumber
        """,
        "s3_bio_chunker": """
            WITH t AS (
              SELECT 'doc' || (user_id % 20) AS doc_id,
                     event_type AS token,
                     CASE event_id % 5 WHEN 0 THEN 'B-PER'
                                       WHEN 1 THEN 'I-PER'
                                       WHEN 2 THEN 'O'
                                       WHEN 3 THEN 'B-ORG'
                                       ELSE 'I-ORG' END AS tag,
                     event_id AS row_idx,
                     (event_id * 10)::INT AS start,
                     (event_id * 10 + 5)::INT AS stop
              FROM events
            ), w AS (
              SELECT *,
                     (tag LIKE 'B%') AS is_b, (tag LIKE 'I%') AS is_i,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY row_idx) - 1 AS token_idx,
                     sum(CASE WHEN tag LIKE 'B%' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY row_idx) AS grp,
                     CASE WHEN tag NOT LIKE 'B%' AND tag NOT LIKE 'I%'
                          THEN 1 ELSE 0 END AS broken
              FROM t
            ), m AS (
              SELECT *, sum(broken) OVER (PARTITION BY doc_id, grp
                                          ORDER BY row_idx) AS bad_before
              FROM w
            ), mem AS (
              SELECT * FROM m
              WHERE grp > 0 AND (is_b OR (is_i AND bad_before = 0))
            )
            SELECT doc_id,
                   doc_id || ':' || min(start) || '-' || max(stop)
                     AS mention_id,
                   string_agg(token, ' ' ORDER BY row_idx) AS string,
                   arg_min(substr(tag, 3), row_idx) AS type,
                   min(start) AS char_start, max(stop) AS char_stop,
                   min(token_idx) AS token_start,
                   max(token_idx) + 1 AS token_stop
            FROM mem GROUP BY doc_id, grp
        """,
        "b10_candidate_recall": """
            WITH g AS (
              SELECT l_orderkey,
                     min(l_partkey) + (l_orderkey % 2) AS tgt
              FROM lineitem GROUP BY l_orderkey
            ), h AS (
              SELECT g.l_orderkey,
                     max(CASE WHEN l.l_partkey = g.tgt THEN 1 ELSE 0 END)
                       AS hit
              FROM g JOIN lineitem l ON g.l_orderkey = l.l_orderkey
              GROUP BY g.l_orderkey
            )
            SELECT CASE WHEN l_orderkey % 3 = 0 THEN 'PER'
                        WHEN l_orderkey % 3 = 1 THEN 'ORG'
                        ELSE 'GPE' END AS entity_type,
                   count(*) AS n_gold,
                   sum(hit)::BIGINT AS n_hit,
                   round(sum(hit)::DOUBLE / count(*), 6) AS recall
            FROM h GROUP BY 1
        """,
        "b11_kb_recall": """
            WITH gold AS (
              SELECT DISTINCT l_partkey AS entity_id
              FROM lineitem WHERE l_orderkey % 97 = 0
            ), kb AS (
              SELECT p_partkey AS entity_id FROM part
              WHERE p_partkey % 2 = 0
            ), s AS (
              SELECT count(*) AS total,
                     sum(CASE WHEN kb.entity_id IS NULL THEN 1 ELSE 0
                         END)::BIGINT AS missed
              FROM gold LEFT JOIN kb ON gold.entity_id = kb.entity_id
            )
            SELECT floor((total - missed)::DOUBLE / total * 1000000.0 + 0.5)
                     / 1000000.0 AS recall,
                   total, missed
            FROM s
        """,
        "c7_muc_b3": """
            WITH m AS (
              SELECT c_custkey AS k,
                     (c_custkey % 40)::VARCHAR AS pc,
                     ((c_custkey + CASE WHEN c_custkey % 7 = 0 THEN 1
                                        ELSE 0 END) % 40)::VARCHAR AS gc
              FROM customer
            ),
            pp AS (SELECT pc, count(*) AS n,
                          count(DISTINCT gc) AS linked FROM m GROUP BY pc),
            gg AS (SELECT gc, count(*) AS n,
                          count(DISTINCT pc) AS linked FROM m GROUP BY gc),
            muc AS (
              SELECT (SELECT sum(n - linked)::DOUBLE / sum(n - 1) FROM pp)
                       AS p,
                     (SELECT sum(n - linked)::DOUBLE / sum(n - 1) FROM gg)
                       AS r
            ),
            bp AS (
              SELECT sum(correct / n) AS num,
                     (SELECT sum(n) FROM pp WHERE n > 1) AS den
              FROM (
                SELECT pc, max(nn) AS n, sum(cnt * cnt)::DOUBLE
                         AS correct
                FROM (
                  SELECT m.pc, pp.n AS nn, m.gc, count(*) AS cnt
                  FROM m JOIN pp ON m.pc = pp.pc WHERE pp.n > 1
                  GROUP BY m.pc, pp.n, m.gc
                ) GROUP BY pc
              )
            ),
            br AS (
              SELECT sum(correct / n) AS num,
                     (SELECT sum(n) FROM gg WHERE n > 1) AS den
              FROM (
                SELECT gc, max(nn) AS n, sum(cnt * cnt)::DOUBLE
                         AS correct
                FROM (
                  SELECT m.gc, gg.n AS nn, m.pc, count(*) AS cnt
                  FROM m JOIN gg ON m.gc = gg.gc WHERE gg.n > 1
                  GROUP BY m.gc, gg.n, m.pc
                ) GROUP BY gc
              )
            ),
            vals AS (
              SELECT muc.p AS muc_p, muc.r AS muc_r,
                     bp.num / bp.den AS b3_p, br.num / br.den AS b3_r
              FROM muc, bp, br
            )
            SELECT floor(muc_p * 1e6 + 0.5) / 1e6 AS muc_p,
                   floor(muc_r * 1e6 + 0.5) / 1e6 AS muc_r,
                   floor((CASE WHEN muc_p + muc_r = 0 THEN 0
                          ELSE 2 * muc_p * muc_r / (muc_p + muc_r) END)
                         * 1e6 + 0.5) / 1e6 AS muc_f1,
                   floor(b3_p * 1e6 + 0.5) / 1e6 AS b3_p,
                   floor(b3_r * 1e6 + 0.5) / 1e6 AS b3_r,
                   floor((CASE WHEN b3_p + b3_r = 0 THEN 0
                          ELSE 2 * b3_p * b3_r / (b3_p + b3_r) END)
                         * 1e6 + 0.5) / 1e6 AS b3_f1
            FROM vals
        """,
        "r7_type_gate": """
            WITH scored AS (
              SELECT l_orderkey AS doc_id, l_linenumber AS chain_id,
                     l_partkey AS entity_id,
                     l_quantity * 2.0 + l_discount * 100.0 - 50.0 AS score
              FROM lineitem WHERE l_orderkey % 3 = 0
            ), ranked AS (
              SELECT *, row_number() OVER (
                          PARTITION BY doc_id, chain_id
                          ORDER BY score DESC, entity_id) AS rn
              FROM scored
            )
            SELECT doc_id, chain_id, entity_id
            FROM ranked WHERE rn = 1 AND score >= 30.0
        """,
        "c5_lang_gate": """
            WITH m AS (
              SELECT (c_custkey % 20)::VARCHAR AS doc_id,
                     c_custkey AS chain_id,
                     'ORG' AS type, lower(c_mktsegment) AS xkey
              FROM customer WHERE c_custkey % 2 = 0
            ), g AS (
              SELECT DISTINCT doc_id, type, xkey, chain_id FROM m
            ), r AS (
              SELECT *, min(chain_id) OVER (PARTITION BY doc_id, type, xkey)
                       AS root
              FROM g
            )
            SELECT DISTINCT chain_id AS src, root AS dst
            FROM r WHERE chain_id <> root
        """,
        "t3_emoji_strip": """
            SELECT doc_id,
                   replace(replace('🚀 go ' || substr(text, 1, 25) || ' 😀!',
                                   '🚀', ''), '😀', '') AS no_emoji
            FROM documents
        """,
        "r9_resolver_report": """
            WITH per AS (
              SELECT l_orderkey AS doc_id, min(l_partkey) AS mn
              FROM lineitem GROUP BY 1
            ), g AS (
              SELECT doc_id, mn,
                     CASE WHEN doc_id % 5 = 0 THEN 'NIL' ELSE 'link' END
                       AS link_type,
                     CASE WHEN doc_id % 3 = 0 THEN 'PER'
                          WHEN doc_id % 3 = 1 THEN 'ORG'
                          ELSE 'GPE' END AS entity_type,
                     CASE WHEN doc_id % 2 = 0 THEN mn + doc_id % 3 END
                       AS sel
              FROM per
            )
            SELECT entity_type,
                   sum(CASE WHEN sel IS NOT NULL THEN 1 ELSE 0
                       END)::BIGINT AS n_selected,
                   sum(CASE WHEN link_type = 'link' THEN 1 ELSE 0
                       END)::BIGINT AS n_recallable,
                   sum(CASE WHEN link_type = 'link' AND sel = mn THEN 1
                       ELSE 0 END)::BIGINT AS n_correct,
                   sum(CASE WHEN link_type = 'NIL' AND sel IS NOT NULL
                       THEN 1 ELSE 0 END)::BIGINT AS n_false_alarm
            FROM g GROUP BY 1
        """,
        "p16_script_filter": """
            SELECT c_custkey,
                   CASE c_custkey % 4 WHEN 0 THEN 1  -- Arabic: allowed
                                      WHEN 1 THEN 0  -- Greek: dropped
                                      WHEN 2 THEN 1  -- ASCII: always kept
                                      ELSE 0 END AS keep  -- Ge'ez: dropped
            FROM customer
        """,
        "p17_language_name_filter": """
            SELECT c_custkey, n_name AS name
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE n_nationkey % 3 IN (0, 1)
        """,
        "f11_feature_vector": """
            WITH c AS (
              SELECT c_custkey AS chain_id, c_custkey % 25 AS bkey,
                     c_custkey % 50 AS ck50
              FROM customer WHERE c_custkey % 9 = 0
            ), e AS (
              SELECT s_suppkey AS entity_id, s_suppkey % 25 AS bkey,
                     s_suppkey % 50 AS sk50,
                     CASE WHEN s_suppkey % 2 = 0 THEN '1.0' ELSE '0.0' END
                       AS f_origin,
                     CASE WHEN s_suppkey % 3 = 0 THEN '0.5' ELSE '0.0' END
                       AS f_links
              FROM supplier
            )
            SELECT chain_id, entity_id,
                   f_origin || ',0.5,' || f_links || ',' ||
                     (CASE WHEN ck50 = sk50 THEN '1.0' ELSE '0.0' END)
                     AS feature_vector
            FROM c JOIN e USING (bkey)
        """,
        "c1_cascade_coref": """
            WITH m AS (
              SELECT (c_custkey % 20)::VARCHAR AS doc_id,
                     c_custkey::VARCHAR AS mention_id,
                     c_mktsegment AS string,
                     CASE WHEN c_custkey % 3 = 0 THEN 'PER' ELSE 'ORG' END
                       AS type
              FROM customer
            )
            SELECT doc_id, mention_id,
                   min(mention_id) OVER (
                     PARTITION BY doc_id, type, lower(string)) AS chain_id
            FROM m
        """,
        "c6_type_gate": """
            WITH m AS (
              SELECT (c_custkey % 10)::VARCHAR AS doc_id,
                     c_custkey AS mention_id, c_custkey % 500 AS chain_id,
                     c_custkey AS char_start, c_mktsegment AS string,
                     CASE WHEN c_custkey % 3 = 0 THEN 'PER' ELSE 'ORG' END
                       AS type
              FROM customer
            ), ct AS (
              SELECT chain_id,
                     arg_min(type, char_start) AS chain_type
              FROM m GROUP BY chain_id
            ), kept AS (
              SELECT m.* FROM m JOIN ct USING (chain_id)
              WHERE ct.chain_type = 'PER'
            ), g AS (
              SELECT DISTINCT doc_id, type, lower(string) AS xkey, chain_id
              FROM kept
            ), r AS (
              SELECT *, min(chain_id) OVER (PARTITION BY doc_id, type, xkey)
                       AS root
              FROM g
            )
            SELECT DISTINCT chain_id AS src, root AS dst
            FROM r WHERE chain_id <> root
        """,
        "flagship_pricing": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
                   floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "t1_remove_punct": f"""
            SELECT doc_id,
                   length(regexp_replace(text, '{punct}', '', 'g')) AS clean_len,
                   length(text) AS raw_len
            FROM documents
        """,
        "t6_ngram_explode": """
            WITH names AS (
              SELECT p_brand,
                     '_' || replace(trim(lower(p_name)), ' ', '_') || '_' AS fname
              FROM part
            ), grams AS (
              SELECT p_brand, substr(fname, i, 4) AS ng
              FROM (SELECT p_brand, fname,
                           unnest(generate_series(1, length(fname) - 3)) AS i
                    FROM names) t
            )
            SELECT p_brand,
                   count(DISTINCT ng) AS n_distinct_ngrams,
                   count(*) AS n_grams
            FROM grams GROUP BY p_brand
        """,
        "p1_type_validator": """
            SELECT c_mktsegment, count(*) AS n FROM customer
            WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
            GROUP BY c_mktsegment
        """,
        "p3_garbage_filter": """
            SELECT lang, count(*) AS n FROM documents
            WHERE text NOT LIKE '%window%' AND text NOT LIKE '%vector%'
              AND text <> ''
            GROUP BY lang
        """,
        "p5_token_length_filter": """
            WITH t AS (
              SELECT lang,
                     len(regexp_split_to_array(trim(text), '\\s+')) AS ntok
              FROM documents WHERE length(trim(text)) > 0
            )
            SELECT lang, count(*) AS n, sum(ntok)::BIGINT AS total_tokens
            FROM t WHERE ntok < 40 GROUP BY lang
        """,
        "p6_blacklist": """
            SELECT count(*) AS n_kept FROM customer
            WHERE lower(c_name) NOT IN
              ('customer#000000001', 'customer#000000007')
        """,
        "b2_exact_block": """
            SELECT lower(p_name) AS k, count(*) AS n_parts,
                   min(p_partkey) AS min_key
            FROM part GROUP BY lower(p_name) HAVING count(*) > 1
        """,
        "b3_ngram_idf": """
            WITH names AS (
              SELECT p_partkey,
                     '_' || replace(trim(lower(p_name)), ' ', '_') || '_' AS fname,
                     lower(p_name) AS lname
              FROM part
            ), uniq AS (SELECT count(DISTINCT lname) AS n FROM names),
            grams AS (
              SELECT p_partkey, substr(fname, i, 4) AS ng
              FROM (SELECT p_partkey, fname,
                           unnest(generate_series(1, length(fname) - 3)) AS i
                    FROM names) t
            ), per_name AS (
              SELECT ng, p_partkey, count(*) AS n_cnt
              FROM grams GROUP BY ng, p_partkey
            ), postings AS (
              SELECT ng, p_partkey, n_cnt,
                     sum(n_cnt) OVER (PARTITION BY ng) AS df_cnt
              FROM per_name
            ), queries AS (
              SELECT DISTINCT
                     '_' || replace(trim(lower(p_name)), ' ', '_') || '_' AS qname
              FROM part WHERE p_partkey % 17 = 0
            ), qgrams AS (
              SELECT qname, substr(qname, i, 4) AS ng, count(*) AS q_cnt
              FROM (SELECT qname,
                           unnest(generate_series(1, length(qname) - 3)) AS i
                    FROM queries) t
              GROUP BY qname, substr(qname, i, 4)
            ), mass AS (
              SELECT q.qname, p.p_partkey,
                     sum(q.q_cnt * p.n_cnt
                         * floor(ln(1 + (SELECT n FROM uniq)::DOUBLE
                                    / p.df_cnt) * 1000000.0)::BIGINT)
                       AS mass_fp
              FROM qgrams q JOIN postings p USING (ng)
              GROUP BY q.qname, p.p_partkey
            ), thresh AS (
              SELECT qname, p_partkey, mass_fp,
                     max(mass_fp) OVER (PARTITION BY qname) AS mx
              FROM mass
            ), ranked AS (
              SELECT qname, p_partkey, mass_fp,
                     row_number() OVER (PARTITION BY qname
                                        ORDER BY mass_fp DESC, p_partkey) AS rk
              FROM thresh WHERE mass_fp * 2 > mx
            )
            SELECT qname, p_partkey AS match_key,
                   floor((mass_fp::DOUBLE / 1000000.0) * 10000.0 + 0.5)
                     / 10000.0 AS mass,
                   rk
            FROM ranked WHERE rk <= 5
        """,
        "c2_exact_cluster": """
            SELECT c_custkey,
                   min(c_custkey) OVER (PARTITION BY c_nationkey, c_mktsegment)
                     AS cluster
            FROM customer
        """,
        "cc_transitive": _CC_CLOSURE_SQL,
        "cc_incremental": _CC_CLOSURE_SQL,
        "f9_levenshtein_argmin": """
            WITH q AS (
              SELECT p_partkey AS q_key, lower(p_name) AS q_name
              FROM part WHERE p_partkey % 23 = 0
            ), c AS (
              SELECT p_partkey AS c_key, lower(p_name) AS c_name
              FROM part WHERE p_partkey % 7 = 0
            ), qtok AS (
              SELECT DISTINCT q_key, unnest(string_split(q_name, ' ')) AS tok
              FROM q
            ), ctok AS (
              SELECT DISTINCT c_key, unnest(string_split(c_name, ' ')) AS tok
              FROM c
            ), blocked AS (
              SELECT DISTINCT q_key, c_key FROM qtok JOIN ctok USING (tok)
            ), pairs AS (
              SELECT b.q_key, b.c_key,
                     levenshtein(q_name, c_name)::DOUBLE
                       / greatest(length(q_name), length(c_name)) AS dist
              FROM blocked b JOIN q USING (q_key) JOIN c USING (c_key)
              WHERE b.q_key <> b.c_key
            ), ranked AS (
              SELECT q_key, c_key, dist,
                     row_number() OVER (PARTITION BY q_key
                                        ORDER BY dist, c_key) AS rn
              FROM pairs
            )
            SELECT q_key, c_key AS best_key, floor((dist) * 10000.0 + 0.5) / 10000.0 AS dist
            FROM ranked WHERE rn = 1 AND dist < 0.5
        """,
        "f_monge_elkan_lev": """
            WITH q AS (
              SELECT p_partkey AS q_key, lower(p_name) AS q_name
              FROM part WHERE p_partkey % 23 = 0
            ), c AS (
              SELECT p_partkey AS c_key, lower(p_name) AS c_name
              FROM part WHERE p_partkey % 7 = 0
            ), qtok AS (
              SELECT DISTINCT q_key, unnest(string_split(q_name, ' ')) AS tok
              FROM q
            ), ctok AS (
              SELECT DISTINCT c_key, unnest(string_split(c_name, ' ')) AS tok
              FROM c
            ), blocked AS (
              SELECT DISTINCT q_key, c_key FROM qtok JOIN ctok USING (tok)
              WHERE q_key <> c_key
            ), tok_pairs AS (
              SELECT b.q_key, b.c_key, qt.tok AS tok_a, ct.tok AS tok_b
              FROM blocked b
              JOIN qtok qt USING (q_key)
              JOIN ctok ct USING (c_key)
              WHERE length(qt.tok) > 0 AND length(ct.tok) > 0
            ), best AS (
              SELECT q_key, c_key, tok_a,
                     max(((greatest(length(tok_a), length(tok_b))
                           - levenshtein(tok_a, tok_b)) * 1000000)
                         // greatest(length(tok_a), length(tok_b))) AS best
              FROM tok_pairs GROUP BY q_key, c_key, tok_a
            )
            SELECT q_key, c_key,
                   (sum(best) // count(*))::BIGINT AS me_micro
            FROM best GROUP BY q_key, c_key
            HAVING (sum(best) // count(*))::BIGINT >= 500000
        """,
        "f7_shared_tokens": """
            WITH q AS (
              SELECT p_partkey AS q_key,
                     list_distinct(string_split(lower(p_name), ' ')) AS q_toks
              FROM part WHERE p_partkey % 29 = 0
            ), c AS (
              SELECT p_partkey AS c_key,
                     list_distinct(string_split(lower(p_name), ' ')) AS c_toks
              FROM part WHERE p_partkey % 13 = 0
            )
            SELECT q_key,
                   floor((max(len(list_intersect(q_toks, c_toks))::DOUBLE
                             / len(q_toks))) * 10000.0 + 0.5) / 10000.0 AS best_overlap
            FROM q CROSS JOIN c GROUP BY q_key
        """,
        "f_token_jaccard": """
            WITH q AS (
              SELECT p_partkey AS q_key,
                     list_distinct(string_split(lower(p_name), ' ')) AS q_toks
              FROM part WHERE p_partkey % 31 = 0
            ), c AS (
              SELECT p_partkey AS c_key,
                     list_distinct(string_split(lower(p_name), ' ')) AS c_toks
              FROM part WHERE p_partkey % 11 = 0
            ), j AS (
              SELECT q_key, c_key,
                     floor((len(list_intersect(q_toks, c_toks))::DOUBLE
                       / len(list_distinct(list_concat(q_toks, c_toks)))) * 10000.0 + 0.5) / 10000.0
                       AS jaccard
              FROM q CROSS JOIN c
            )
            SELECT q_key, c_key, jaccard FROM j WHERE jaccard >= 0.3
        """,
        "r1_first_resolver": """
            WITH ranked AS (
              SELECT l_orderkey, l_partkey,
                     row_number() OVER (PARTITION BY l_orderkey
                                        ORDER BY l_linenumber, l_partkey) AS rn
              FROM lineitem
            )
            SELECT l_orderkey, l_partkey AS first_partkey
            FROM ranked WHERE rn = 1
        """,
        "r2_one_many_none": """
            WITH flagged AS (
              SELECT l_orderkey, l_partkey,
                     CASE WHEN l_discount > 0.09 THEN 1 ELSE 0 END AS m,
                     sum(CASE WHEN l_discount > 0.09 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY l_orderkey) AS nm
              FROM lineitem
            )
            SELECT l_orderkey, l_partkey AS decided_partkey
            FROM flagged WHERE nm = 1 AND m = 1
        """,
        "r5_linear_argmax": """
            WITH scored AS (
              SELECT l_orderkey, l_linenumber,
                     l_quantity * 2.0 + l_discount * 100.0 - 50.0 AS score
              FROM lineitem
            ), ranked AS (
              SELECT l_orderkey, l_linenumber, score,
                     row_number() OVER (PARTITION BY l_orderkey
                                        ORDER BY score DESC, l_linenumber) AS rn
              FROM scored
            )
            SELECT l_orderkey, l_linenumber AS best_line,
                   floor((score) * 10000.0 + 0.5) / 10000.0 AS score
            FROM ranked WHERE rn = 1 AND score >= 30.0
        """,
        "r5_margin_gate": """
            WITH scored AS (
              SELECT l_orderkey, l_linenumber,
                     l_quantity * 2.0 + l_discount * 100.0 - 50.0 AS score
              FROM lineitem
            ), ranked AS (
              SELECT l_orderkey, l_linenumber, score,
                     row_number() OVER (PARTITION BY l_orderkey
                                        ORDER BY score DESC, l_linenumber) AS rn,
                     lead(score) OVER (PARTITION BY l_orderkey
                                       ORDER BY score DESC, l_linenumber)
                       AS next_score
              FROM scored
            )
            SELECT l_orderkey, l_linenumber AS best_line,
                   floor((score) * 10000.0 + 0.5) / 10000.0 AS score
            FROM ranked
            WHERE rn = 1 AND score >= 30.0
              AND (next_score IS NULL OR score - next_score >= 5.0)
        """,
        "f_emb_cosine": """
            WITH a AS (
              SELECT vec_id AS pair_id, embedding::DOUBLE[] AS ea
              FROM embeddings
            ), b AS (
              SELECT vec_id - 1 AS pair_id, embedding::DOUBLE[] AS eb
              FROM embeddings
            )
            SELECT a.pair_id,
                   floor((list_dot_product(ea, eb)
                     / (sqrt(list_dot_product(ea, ea))
                        * sqrt(list_dot_product(eb, eb)))) * 10000.0 + 0.5)
                     / 10000.0 AS f_emb_cosine
            FROM a JOIN b ON a.pair_id = b.pair_id
        """,
        "f_token_jaccard_docs": """
            WITH d AS (
              SELECT doc_id,
                     list_distinct(list_filter(
                       string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'),
                       t -> t <> '')) AS toks
              FROM documents WHERE doc_id < 40
            ), t AS (
              SELECT doc_id, unnest(toks) AS tok FROM d
            ), sz AS (
              SELECT doc_id, count(*) AS s FROM t GROUP BY doc_id
            ), i AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS n
              FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT src, dst,
                   floor((n / (sa.s + sb.s - n)) * 10000.0 + 0.5) / 10000.0
                     AS jaccard
            FROM i JOIN sz sa ON i.src = sa.doc_id
                   JOIN sz sb ON i.dst = sb.doc_id
            WHERE floor((n / (sa.s + sb.s - n)) * 10000.0 + 0.5) / 10000.0
                    >= 0.1
        """,
        "dedup_exact": f"""
            WITH keyed AS (
              SELECT doc_id,
                     md5(trim(regexp_replace(
                       regexp_replace(lower(text), '{punct}', '', 'g'),
                       '\\s+', ' ', 'g'))) AS fp
              FROM documents
            )
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY fp) AS dup_of,
                   CASE WHEN min(doc_id) OVER (PARTITION BY fp) <> doc_id
                        THEN 1 ELSE 0 END AS is_dup
            FROM keyed
        """,
        "dedup_ngram_jaccard": """
            WITH d AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
              FROM documents WHERE doc_id < 80
            ), grams AS (
              SELECT DISTINCT doc_id, substr(t, i, 8) AS g
              FROM (SELECT doc_id, t,
                           unnest(generate_series(1, length(t) - 7)) AS i
                    FROM d) u
            ), sizes AS (
              SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS inter
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            ), j AS (
              SELECT src, dst,
                     floor((inter::DOUBLE / (sa.sz + sb.sz - inter)) * 10000.0 + 0.5) / 10000.0 AS jaccard
              FROM inter
              JOIN sizes sa ON sa.doc_id = src
              JOIN sizes sb ON sb.doc_id = dst
            )
            SELECT src, dst, jaccard FROM j WHERE jaccard >= 0.05
        """,
        "dedup_embedding_cosine": _embedding_neardup_sql(),
        "dedup_minhash_lsh": _minhash_lsh_sql(),
        "dedup_simhash": _simhash_sql(),
        "ann_lsh_topk": _ann_lsh_sql(),
        "b_phonetic_soundex": f"""
            SELECT {soundex_portable_sql("string_split(p_name, ' ')[1]")} AS skey,
                   count(*) AS n
            FROM part GROUP BY 1
        """,
        "ann_cosine_search": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 5
            ), c AS (
              SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
              FROM embeddings
            ), scored AS (
              SELECT query_id, neighbor_id,
                     floor((list_dot_product(qv, cv)
                       / (sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(cv, cv)))) * 10000.0 + 0.5) / 10000.0 AS cosine
              FROM q CROSS JOIN c WHERE query_id <> neighbor_id
            )
            SELECT query_id, neighbor_id, cosine
            FROM scored WHERE cosine >= 0.2
        """,
        "text_token_stats": """
            SELECT lang,
                   sum(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)::BIGINT
                     AS ws_tokens,
                   sum(len(regexp_extract_all(text,
                     '\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]')))::BIGINT AS bpe_tokens,
                   count(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "text_quality": f"""
            WITH t AS (
              SELECT doc_id, text,
                     greatest(length(text), 1)::DOUBLE AS total,
                     (CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)::DOUBLE
                       AS n_tok,
                     (length(text) - length(regexp_replace(text, '{punct}', '', 'g')))::DOUBLE
                       AS punct,
                     (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                       AS digits,
                     len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                        x -> x IN ('the','and','of','to','a','in','is','that','it','for')))::DOUBLE
                       AS stops
              FROM documents
            )
            SELECT doc_id,
                   floor((0.35 * least(n_tok / 100.0, 1.0)
                       + 0.35 * least(stops / greatest(n_tok, 1.0) * 4.0, 1.0)
                       + 0.15 * (1.0 - least(punct / total * 4.0, 1.0))
                       + 0.15 * (1.0 - least(digits / total * 5.0, 1.0))) * 1000000.0 + 0.5) / 1000000.0
                     AS quality
            FROM t
        """,
        "text_langid": """
            WITH t AS (
              SELECT lang, ' ' || lower(text) || ' ' AS p FROM documents
            ), votes AS (
              SELECT lang,
                ((length(p) - length(replace(p, ' the ', ''))) / 5
                 + (length(p) - length(replace(p, ' and ', ''))) / 5
                 + (length(p) - length(replace(p, ' of ', ''))) / 4)::INT AS v_eng,
                ((length(p) - length(replace(p, ' le ', ''))) / 4
                 + (length(p) - length(replace(p, ' la ', ''))) / 4
                 + (length(p) - length(replace(p, ' et ', ''))) / 4)::INT AS v_fra,
                ((length(p) - length(replace(p, ' el ', ''))) / 4
                 + (length(p) - length(replace(p, ' los ', ''))) / 5
                 + (length(p) - length(replace(p, ' y ', ''))) / 3)::INT AS v_spa,
                ((length(p) - length(replace(p, ' der ', ''))) / 5
                 + (length(p) - length(replace(p, ' und ', ''))) / 5
                 + (length(p) - length(replace(p, ' ist ', ''))) / 5)::INT AS v_deu
              FROM t
            ), best AS (
              SELECT lang,
                CASE
                  WHEN v_deu > greatest(v_eng, v_fra, v_spa) THEN 'deu'
                  WHEN v_spa > greatest(v_eng, v_fra) THEN 'spa'
                  WHEN v_fra > v_eng THEN 'fra'
                  ELSE 'eng' END AS predicted
              FROM votes
            )
            SELECT lang, predicted, count(*) AS n
            FROM best GROUP BY lang, predicted
        """,
        "events_windowed": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, floor((sum(value)) * 100.0 + 0.5) / 100.0 AS total
            FROM events GROUP BY date_trunc('hour', ts), event_type
        """,
        "events_sessionize": """
            WITH g AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS newsess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
              SELECT user_id,
                     sum(newsess) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sess
              FROM g
            )
            SELECT user_id, max(sess)::BIGINT AS n_sessions, count(*) AS n_events
            FROM s GROUP BY user_id
        """,
        "kb_altname_attach": """
            SELECT c_custkey,
                   count(o_orderkey) AS n_orders,
                   count(DISTINCT o_orderpriority) AS n_prios
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        """,
        "c3_acronym_key": """
            SELECT array_to_string(
                     list_transform(string_split(p_name, ' '),
                                    x -> upper(x[1])), '') AS akey,
                   count(*) AS n
            FROM part GROUP BY 1
        """,
        "chains_agg": """
            WITH best AS (
              SELECT l_orderkey, l_partkey AS best_part,
                     row_number() OVER (PARTITION BY l_orderkey
                       ORDER BY l_extendedprice DESC, l_partkey) AS rn
              FROM lineitem
            ), counts AS (
              SELECT l_orderkey,
                     count(DISTINCT l_suppkey) AS n_supps,
                     count(*) AS n_lines
              FROM lineitem GROUP BY l_orderkey
            )
            SELECT b.l_orderkey, b.best_part, c.n_supps, c.n_lines
            FROM best b JOIN counts c USING (l_orderkey)
            WHERE b.rn = 1
        """,
        "f5_wikipedia_link": """
            SELECT p_partkey,
                   'http://en.wikipedia.org/wiki/' || replace(p_name, ' ', '_')
                     AS wiki_url
            FROM part
        """,
        "s6_extents_parse": """
            WITH p AS (
              SELECT source || ':' || doc_id || '-' || n_chars AS extents
              FROM documents
            )
            SELECT string_split(extents, ':')[1] AS src_id,
                   string_split(string_split(extents, ':')[2], '-')[1]::BIGINT
                     AS ref_doc,
                   string_split(string_split(extents, ':')[2], '-')[2]::BIGINT
                     AS ref_len
            FROM p
        """,
        "p7_acronym_replace": f"""
            SELECT c_custkey,
                   CASE lower(c_name)
                     {_case_arms(ACRONYM_MAP)}
                     ELSE c_name END AS resolved
            FROM customer
        """,
        "p9_name_stemmer": f"""
            SELECT p_partkey,
                   array_to_string(list_transform(
                     string_split(lower(p_name), ' '),
                     t -> CASE t {_case_arms(STEM_MAP)} ELSE t END), ' ')
                     AS stemmed
            FROM part
        """,
        "p10_twitter_username": f"""
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN
                     CASE 'user' || (doc_id % 7)::VARCHAR
                       {_case_arms(USERNAME_MAP)}
                       ELSE '@user' || (doc_id % 7)::VARCHAR || '.' END
                   ELSE '@user' || (doc_id % 7)::VARCHAR || '.' END AS resolved
            FROM documents
        """,
        "p11_hashtag_split": """
            SELECT p_partkey,
                   array_to_string(list_transform(string_split(p_name, ' '),
                     w -> upper(substring(w, 1, 1)) || substring(w, 2)), ' ')
                     AS split_name
            FROM part
        """,
        "c4_single_token_merge": """
            WITH m AS (
              SELECT p_brand AS doc_id, p_partkey::VARCHAR AS chain_id,
                     CASE WHEN p_partkey % 13 = 0
                          THEN (string_split(p_name, ' '))[-1]
                          ELSE p_name END AS s
              FROM part
            ), singles AS (
              SELECT DISTINCT doc_id, chain_id AS single_chain, lower(s) AS tok
              FROM m WHERE NOT contains(s, ' ')
            ), multis AS (
              SELECT DISTINCT doc_id, chain_id AS multi_chain,
                     lower((string_split(s, ' '))[-1]) AS tok
              FROM m WHERE contains(s, ' ')
            )
            SELECT DISTINCT si.single_chain AS src, mu.multi_chain AS dst
            FROM singles si
            JOIN multis mu ON si.doc_id = mu.doc_id AND si.tok = mu.tok
            WHERE si.single_chain <> mu.multi_chain
        """,
        "b7_combine_candidates": _candidate_sets_sql() + """
            SELECT doc_id, chain_id, entity_id, source, source_rank,
                   retrieval_rank
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY doc_id, chain_id, entity_id
                    ORDER BY source_rank, retrieval_rank, source) AS rn
                  FROM u)
            WHERE rn = 1
        """,
        "b8_cascade_candidates": _candidate_sets_sql() + """
            , flat AS (
              SELECT doc_id, chain_id, entity_id, source_rank,
                     retrieval_rank, source
              FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id, chain_id, entity_id
                      ORDER BY source_rank, retrieval_rank, source) AS rn
                    FROM u)
              WHERE rn = 1
            ), counts AS (
              SELECT doc_id, chain_id, source_rank, count(*) AS cnt
              FROM flat GROUP BY 1, 2, 3
            ), cum AS (
              SELECT doc_id, chain_id, source_rank,
                     coalesce(sum(cnt) OVER (PARTITION BY doc_id, chain_id
                       ORDER BY source_rank
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS prior
              FROM counts
            )
            SELECT f.doc_id, f.chain_id, f.entity_id, f.source_rank,
                   f.retrieval_rank, f.source
            FROM flat f
            JOIN cum c ON f.doc_id = c.doc_id AND f.chain_id = c.chain_id
              AND f.source_rank = c.source_rank
            WHERE c.prior < 3
        """,
        "r3_wikipedia_resolver": """
            WITH chains AS (
              SELECT p_partkey::VARCHAR AS chain_id, p_name, p_brand
              FROM part WHERE p_partkey % 17 = 0
            ), cands AS (
              SELECT p_partkey::VARCHAR AS entity_id, p_brand,
                     p_name AS ename, (p_partkey % 2 = 0) AS has_url
              FROM part
            ), pairs AS (
              SELECT c.chain_id, e.entity_id,
                     CASE WHEN e.has_url AND lower(e.ename) = lower(c.p_name)
                          THEN 1 ELSE 0 END AS m
              FROM chains c JOIN cands e ON c.p_brand = e.p_brand
            ), s AS (
              SELECT chain_id, entity_id, m,
                     sum(m) OVER (PARTITION BY chain_id) AS n_match
              FROM pairs
            )
            SELECT chain_id, entity_id AS decided
            FROM s WHERE n_match = 1 AND m = 1
        """,
        "r6_cascade_resolver": """
            WITH pairs AS (
              SELECT l_orderkey::VARCHAR AS chain_id,
                     l_partkey::VARCHAR || '#' || l_suppkey::VARCHAR || '#'
                       || l_linenumber::VARCHAR AS entity_id,
                     CASE WHEN (l_orderkey % 50) = (l_partkey % 50)
                          THEN 1 ELSE 0 END AS m,
                     l_quantity::DOUBLE AS f_q
              FROM lineitem
            ), s1 AS (
              SELECT *, sum(m) OVER (PARTITION BY chain_id) AS n_match
              FROM pairs
            ), d1 AS (
              SELECT chain_id, entity_id FROM s1 WHERE n_match = 1 AND m = 1
            ), rem AS (
              SELECT chain_id, entity_id, f_q
              FROM s1 WHERE n_match <> 1 AND (n_match = 0 OR m = 1)
            ), r2 AS (
              SELECT chain_id, entity_id, f_q,
                     row_number() OVER (PARTITION BY chain_id
                       ORDER BY f_q DESC, entity_id) AS rn
              FROM rem
            ), d2 AS (
              SELECT chain_id, entity_id FROM r2 WHERE rn = 1 AND f_q >= 30.0
            )
            SELECT chain_id, entity_id AS decided FROM d1
            UNION ALL
            SELECT chain_id, entity_id FROM d2
        """,
        "t14_doc_type": """
            SELECT CASE doc_id % 5
                     WHEN 0 THEN 'twitter' WHEN 1 THEN 'blog'
                     WHEN 2 THEN 'reference' WHEN 3 THEN 'discussion forum'
                   END AS doc_type,
                   count(*) AS n
            FROM documents GROUP BY 1
        """,
        "t15_entity_origin": """
            SELECT CASE c_custkey % 6
                     WHEN 0 THEN 'geonames' WHEN 1 THEN 'cia world leaders'
                     WHEN 2 THEN 'cia world orgs' WHEN 3 THEN 'augmentation'
                     WHEN 4 THEN 'geonames'
                   END AS origin,
                   count(*) AS n
            FROM customer GROUP BY 1
        """,
        "t5_remove_double_letter": """
            WITH c AS (
              SELECT p_partkey, string_split(p_name, '') AS chars FROM part
            )
            SELECT p_partkey,
                   array_to_string(list_filter(chars,
                     (ch, i) -> i = 1 OR ch <> chars[i-1]
                       OR NOT (ch BETWEEN 'a' AND 'z'
                               OR ch BETWEEN 'A' AND 'Z')), '') AS dedoubled
            FROM c
        """,
        "t2_unicode_punct": r"""
            SELECT doc_id,
                   length(regexp_replace(text, '\p{P}', '', 'g')) AS clean_len
            FROM documents
        """,
        "ann_ivf_topk": f"""
            WITH c AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ), cents AS (
              SELECT vec_id AS centroid_id, v AS centroid
              FROM c ORDER BY md5(vec_id::VARCHAR), vec_id
              LIMIT {IVF_CLUSTERS}
            ), ca AS (
              SELECT neighbor_id, v, centroid_id FROM (
                SELECT cc.vec_id AS neighbor_id, cc.v, ct.centroid_id,
                       row_number() OVER (PARTITION BY cc.vec_id ORDER BY
                         list_dot_product(cc.v, ct.centroid)
                           / (sqrt(list_dot_product(cc.v, cc.v))
                              * sqrt(list_dot_product(ct.centroid,
                                                      ct.centroid))) DESC,
                         ct.centroid_id) AS rn
                FROM c cc CROSS JOIN cents ct
              ) WHERE rn = 1
            ), qa AS (
              SELECT query_id, qv, centroid_id FROM (
                SELECT q.vec_id AS query_id, q.v AS qv, ct.centroid_id,
                       row_number() OVER (PARTITION BY q.vec_id ORDER BY
                         list_dot_product(q.v, ct.centroid)
                           / (sqrt(list_dot_product(q.v, q.v))
                              * sqrt(list_dot_product(ct.centroid,
                                                      ct.centroid))) DESC,
                         ct.centroid_id) AS rn
                FROM (SELECT * FROM c WHERE vec_id < 5) q
                CROSS JOIN cents ct
              ) WHERE rn <= {IVF_PROBE}
            ), scored AS (
              SELECT qa.query_id, ca.neighbor_id,
                     floor((list_dot_product(qa.qv, ca.v)
                       / (sqrt(list_dot_product(qa.qv, qa.qv))
                          * sqrt(list_dot_product(ca.v, ca.v)))) * 1000000.0 + 0.5) / 1000000.0 AS cosine
              FROM qa JOIN ca USING (centroid_id)
            )
            SELECT query_id, neighbor_id, cosine, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored
            ) WHERE rank <= 10
        """,
        # two message-passing iterations unrolled; every floor() mirrors
        # the engine's fixed-point association EXACTLY (ratio first in
        # the min-max norms; (1e6*num)/den in the relatedness)
        "r12_coherence": """
            WITH ents AS (
              SELECT p_partkey AS entity_id,
                     list_distinct(list_append(
                       string_split(p_type, ' '), p_brand)) AS lk
              FROM part WHERE p_partkey <= 200
            ), links AS (
              SELECT DISTINCT entity_id, link FROM (
                SELECT entity_id, unnest(lk) AS link FROM ents)
            ), sizes AS (
              SELECT entity_id, COUNT(*) AS n_links FROM links GROUP BY 1
            ), chains AS (
              SELECT DISTINCT l_orderkey AS doc_id,
                     CAST(l_linenumber AS VARCHAR) || '-'
                       || CAST(l_partkey AS VARCHAR) AS chain_id,
                     l_partkey AS base
              FROM lineitem
              WHERE l_orderkey <= 6000 AND l_partkey BETWEEN 3 AND 198
            ), cand AS (
              SELECT c.doc_id, c.chain_id, p.p_partkey AS entity_id,
                     10.0 - abs(p.p_partkey - c.base) AS score
              FROM chains c
              JOIN (SELECT p_partkey FROM part WHERE p_partkey <= 200) p
                ON p.p_partkey BETWEEN c.base - 2 AND c.base + 2
            ), pruned AS (
              SELECT doc_id, chain_id, entity_id, score FROM (
                SELECT cand.*, ROW_NUMBER() OVER (
                  PARTITION BY doc_id, chain_id
                  ORDER BY score DESC, entity_id) AS rn
                FROM cand) t
              WHERE rn <= 3
            ), s0 AS (
              SELECT doc_id, chain_id, entity_id,
                     CASE WHEN mx = mn THEN CAST(1000000 AS BIGINT)
                          ELSE CAST(FLOOR(1000000 *
                            ((score - mn) / (mx - mn))) AS BIGINT)
                     END AS s0m
              FROM (SELECT pruned.*,
                      MIN(score) OVER (PARTITION BY doc_id, chain_id) AS mn,
                      MAX(score) OVER (PARTITION BY doc_id, chain_id) AS mx
                    FROM pruned) t
            ), edges0 AS (
              SELECT a.doc_id, a.chain_id, a.entity_id,
                     b.chain_id AS o_chain, b.entity_id AS o_entity
              FROM s0 a JOIN s0 b
                ON a.doc_id = b.doc_id AND a.chain_id <> b.chain_id
            ), epairs AS (
              SELECT DISTINCT entity_id AS a_entity, o_entity AS b_entity
              FROM edges0
            ), rel AS (
              SELECT a_entity, b_entity, relm FROM (
                SELECT t.a_entity, t.b_entity,
                       CAST(FLOOR(1000000 * t.n_inter /
                         (sa.n_links + sb.n_links - t.n_inter)) AS BIGINT)
                         AS relm
                FROM (SELECT e.a_entity, e.b_entity, COUNT(*) AS n_inter
                      FROM epairs e
                      JOIN links la ON la.entity_id = e.a_entity
                      JOIN links lb ON lb.entity_id = e.b_entity
                                   AND lb.link = la.link
                      GROUP BY 1, 2) t
                JOIN sizes sa ON sa.entity_id = t.a_entity
                JOIN sizes sb ON sb.entity_id = t.b_entity) r
              WHERE relm > 0
            ), edges AS (
              SELECT e.doc_id, e.chain_id, e.entity_id, e.o_chain,
                     e.o_entity, r.relm
              FROM edges0 e
              JOIN rel r ON r.a_entity = e.entity_id
                        AND r.b_entity = e.o_entity
            ), msg1 AS (
              SELECT doc_id, chain_id, entity_id, SUM(best) AS coh FROM (
                SELECT e.doc_id, e.chain_id, e.entity_id, e.o_chain,
                       MAX(CAST(FLOOR(e.relm * s.s0m / 1000000) AS BIGINT))
                         AS best
                FROM edges e
                JOIN s0 s ON s.doc_id = e.doc_id AND s.chain_id = e.o_chain
                         AND s.entity_id = e.o_entity
                GROUP BY 1, 2, 3, 4) t
              GROUP BY 1, 2, 3
            ), b1 AS (
              SELECT s0.doc_id, s0.chain_id, s0.entity_id, s0.s0m,
                     COALESCE(m.coh, 0) AS coh
              FROM s0 LEFT JOIN msg1 m
                ON m.doc_id = s0.doc_id AND m.chain_id = s0.chain_id
               AND m.entity_id = s0.entity_id
            ), s1 AS (
              SELECT doc_id, chain_id, entity_id,
                     CAST(FLOOR((400000 * s0m + 600000 * cohm) / 1000000)
                       AS BIGINT) AS sm
              FROM (
                SELECT doc_id, chain_id, entity_id, s0m,
                       CASE WHEN mx = mn THEN CAST(1000000 AS BIGINT)
                            ELSE CAST(FLOOR(1000000 *
                              ((coh - mn) / (mx - mn))) AS BIGINT)
                       END AS cohm
                FROM (SELECT b1.*,
                        MIN(coh) OVER (PARTITION BY doc_id, chain_id) AS mn,
                        MAX(coh) OVER (PARTITION BY doc_id, chain_id) AS mx
                      FROM b1) t) n
            ), msg2 AS (
              SELECT doc_id, chain_id, entity_id, SUM(best) AS coh FROM (
                SELECT e.doc_id, e.chain_id, e.entity_id, e.o_chain,
                       MAX(CAST(FLOOR(e.relm * s.sm / 1000000) AS BIGINT))
                         AS best
                FROM edges e
                JOIN s1 s ON s.doc_id = e.doc_id AND s.chain_id = e.o_chain
                         AND s.entity_id = e.o_entity
                GROUP BY 1, 2, 3, 4) t
              GROUP BY 1, 2, 3
            ), b2 AS (
              SELECT s0.doc_id, s0.chain_id, s0.entity_id, s0.s0m,
                     COALESCE(m.coh, 0) AS coh
              FROM s0 LEFT JOIN msg2 m
                ON m.doc_id = s0.doc_id AND m.chain_id = s0.chain_id
               AND m.entity_id = s0.entity_id
            )
            SELECT doc_id, chain_id, entity_id,
                   CAST(FLOOR((400000 * s0m + 600000 * cohm) / 1000000)
                     AS BIGINT) AS score_micro
            FROM (
              SELECT doc_id, chain_id, entity_id, s0m,
                     CASE WHEN mx = mn THEN CAST(1000000 AS BIGINT)
                          ELSE CAST(FLOOR(1000000 *
                            ((coh - mn) / (mx - mn))) AS BIGINT)
                     END AS cohm
              FROM (SELECT b2.*,
                      MIN(coh) OVER (PARTITION BY doc_id, chain_id) AS mn,
                      MAX(coh) OVER (PARTITION BY doc_id, chain_id) AS mx
                    FROM b2) t) n
        """,
        # CLK encoding: padded bigrams -> k=10 double-hashed positions
        # (md5 hex halves, verified bit-identical to Spark's
        # conv(substring(md5),16,10)) in 512 bits; block on the minimum
        # set bit; fixed-point Dice with the engine's association
        "pprl_dice": """
            WITH src AS (
              SELECT p_partkey,
                     '_' || replace(trim(lower(p_name)), ' ', '_')
                         || '_' AS fa,
                     '_' || replace(trim(lower(
                         substring(p_name, 1, length(p_name) - 1))),
                         ' ', '_') || '_' AS fb
              FROM part WHERE p_partkey <= 300
            ), enc AS (
              SELECT p_partkey,
                list_sort(list_distinct(flatten(list_transform(
                  list_transform(generate_series(1, length(fa) - 1),
                                 i -> substr(fa, i, 2)),
                  g -> list_transform(range(0, 10), j -> CAST(
                    (CAST(('0x' || substring(md5(g || 's1'), 1, 8))
                          AS BIGINT)
                     + j * CAST(('0x' || substring(md5(g || 's1'), 9, 8))
                          AS BIGINT)) % 512 AS INTEGER)))))) AS a_pos,
                list_sort(list_distinct(flatten(list_transform(
                  list_transform(generate_series(1, length(fb) - 1),
                                 i -> substr(fb, i, 2)),
                  g -> list_transform(range(0, 10), j -> CAST(
                    (CAST(('0x' || substring(md5(g || 's1'), 1, 8))
                          AS BIGINT)
                     + j * CAST(('0x' || substring(md5(g || 's1'), 9, 8))
                          AS BIGINT)) % 512 AS INTEGER)))))) AS b_pos
              FROM src
            ), A AS (
              SELECT p_partkey AS a_key, a_pos, a_pos[1] AS blk
              FROM enc WHERE len(a_pos) >= 1
            ), B AS (
              SELECT p_partkey AS b_key, b_pos, b_pos[1] AS blk
              FROM enc WHERE len(b_pos) >= 1
            )
            SELECT a_key, b_key, dice_micro FROM (
              SELECT a_key, b_key,
                     CAST(FLOOR(1000000 *
                       (2 * CAST(len(list_intersect(a_pos, b_pos))
                            AS BIGINT))
                       / (len(a_pos) + len(b_pos))) AS BIGINT)
                       AS dice_micro
              FROM A JOIN B USING (blk)) t
            WHERE dice_micro >= 500000
        """,
        # 3 assignment rounds unrolled QUALIFY-style (r11 pattern) with
        # COMPOSITE partition/removal keys (group_a, group_b, member)
        "er_group_linkage": """
            WITH a_side AS (
              SELECT c_custkey % 40 AS ga, c_custkey AS a_id
              FROM customer WHERE c_custkey <= 600
            ), b_side AS (
              SELECT s_suppkey % 40 AS gb, s_suppkey AS b_id
              FROM supplier WHERE s_suppkey <= 300
            ), mp AS (
              SELECT a.ga AS group_a, b.gb AS group_b, a.a_id, b.b_id,
                     (a.a_id * 3 + b.b_id * 7) % 100 AS score
              FROM a_side a JOIN b_side b ON b.gb = a.ga
              UNION ALL
              SELECT a.ga, b.gb, a.a_id, b.b_id,
                     (a.a_id * 3 + b.b_id * 7) % 100
              FROM a_side a JOIN b_side b ON b.gb = (a.ga + 1) % 40
            ),
            rem0 AS (SELECT * FROM mp),
            r1 AS (
              SELECT * FROM rem0
              QUALIFY row_number() OVER (
                        PARTITION BY group_a, group_b, a_id
                        ORDER BY score DESC, b_id) = 1
                 AND row_number() OVER (
                        PARTITION BY group_a, group_b, b_id
                        ORDER BY score DESC, a_id) = 1
            ),
            rem1 AS (
              SELECT e.* FROM rem0 e
              WHERE NOT EXISTS (SELECT 1 FROM r1 m
                      WHERE m.group_a = e.group_a
                        AND m.group_b = e.group_b AND m.a_id = e.a_id)
                AND NOT EXISTS (SELECT 1 FROM r1 m
                      WHERE m.group_a = e.group_a
                        AND m.group_b = e.group_b AND m.b_id = e.b_id)
            ),
            r2 AS (
              SELECT * FROM rem1
              QUALIFY row_number() OVER (
                        PARTITION BY group_a, group_b, a_id
                        ORDER BY score DESC, b_id) = 1
                 AND row_number() OVER (
                        PARTITION BY group_a, group_b, b_id
                        ORDER BY score DESC, a_id) = 1
            ),
            rem2 AS (
              SELECT e.* FROM rem1 e
              WHERE NOT EXISTS (SELECT 1 FROM r2 m
                      WHERE m.group_a = e.group_a
                        AND m.group_b = e.group_b AND m.a_id = e.a_id)
                AND NOT EXISTS (SELECT 1 FROM r2 m
                      WHERE m.group_a = e.group_a
                        AND m.group_b = e.group_b AND m.b_id = e.b_id)
            ),
            r3 AS (
              SELECT * FROM rem2
              QUALIFY row_number() OVER (
                        PARTITION BY group_a, group_b, a_id
                        ORDER BY score DESC, b_id) = 1
                 AND row_number() OVER (
                        PARTITION BY group_a, group_b, b_id
                        ORDER BY score DESC, a_id) = 1
            ),
            matched AS (
              SELECT * FROM r1 UNION ALL SELECT * FROM r2
              UNION ALL SELECT * FROM r3
            ),
            agg AS (
              SELECT group_a, group_b, COUNT(*) AS n_matched,
                     CAST(SUM(score) AS BIGINT) AS sum_score
              FROM matched GROUP BY 1, 2
            ),
            sa AS (SELECT ga AS group_a, COUNT(*) AS n_a
                   FROM a_side GROUP BY 1),
            sb AS (SELECT gb AS group_b, COUNT(*) AS n_b
                   FROM b_side GROUP BY 1)
            SELECT agg.group_a, agg.group_b, n_matched, sum_score,
                   n_a, n_b,
                   CAST(FLOOR(1000000 * sum_score
                     / (100 * GREATEST(n_a, n_b))) AS BIGINT) AS sim_micro
            FROM agg
            JOIN sa USING (group_a)
            JOIN sb USING (group_b)
        """,
        "er_pr_curve": """
            WITH scored AS (
              SELECT CAST((l_partkey * 13 + l_suppkey * 7) % 50
                          AS DOUBLE) AS threshold,
                     CASE WHEN (l_orderkey + l_partkey) % 3 = 0
                          THEN 1 ELSE 0 END AS y
              FROM lineitem WHERE l_orderkey <= 8000
            ), hist AS (
              SELECT threshold, SUM(y) AS pos, COUNT(*) - SUM(y) AS neg
              FROM scored GROUP BY 1
            ), cum AS (
              SELECT threshold,
                     CAST(SUM(pos) OVER w AS BIGINT) AS tp,
                     CAST(SUM(neg) OVER w AS BIGINT) AS fp,
                     CAST(SUM(pos) OVER ()
                          - SUM(pos) OVER w AS BIGINT) AS fn
              FROM hist
              WINDOW w AS (ORDER BY threshold DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)
            )
            SELECT threshold, tp, fp, fn,
                   CASE WHEN tp + fp = 0 THEN 0
                        ELSE CAST(FLOOR(1000000 * tp / (tp + fp))
                                  AS BIGINT) END AS precision_micro,
                   CASE WHEN tp + fn = 0 THEN 0
                        ELSE CAST(FLOOR(1000000 * tp / (tp + fn))
                                  AS BIGINT) END AS recall_micro,
                   CASE WHEN 2 * tp + fp + fn = 0 THEN 0
                        ELSE CAST(FLOOR(1000000 * (2 * tp)
                                  / (2 * tp + fp + fn))
                                  AS BIGINT) END AS f1_micro
            FROM cum
        """,
    }
