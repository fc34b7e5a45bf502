"""Blocking-scheme construction and auditing beyond the reference's
index families (SURVEY.md §2.4 is fully covered by operators/blocking.py;
this module adds the classic alternatives a web-scale linkage run
chooses between, plus the metrics used to make that choice).

* Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD '95): total-
  order the records on a sorting key and emit every pair within a
  sliding window of `w` ranks. Here the global rank is computed
  scalably — range-repartition + per-partition Arrow-batched local
  index + tiny per-partition base offsets — never a single-partition
  window; the window pairing itself is an equi-join on a uniform
  integer key (rank), so it is skew-free by construction.
* Suffix-array blocking (Aizawa & Oyama, WIRI '05): block two records
  whenever they share any key suffix of length >= `min_suffix_len`,
  with frequent suffixes purged by a block-size cap. Complements the
  prefix-anchored families (sorted-neighborhood sorts on the key HEAD;
  Soundex keys the head phonetically): an error in the FIRST
  characters of a name — truncation, dropped honorific, OCR damage at
  line starts, the classic web-text failure — moves a record
  arbitrarily far in sort order but leaves every suffix that starts
  after the error intact.
* Graph meta-blocking (Papadakis et al., TKDE '14): re-weight the
  implicit comparison graph of an existing block collection (CBS =
  common-blocks count) after size-purging the hot blocks, then prune
  to each node's top-k neighbours (Cardinality Node Pruning). This is
  the standard recipe for taming redundancy-positive block collections
  (token blocking over web text) whose raw pair count is quadratic in
  hot-block sizes.
* Blocking quality metrics (Christen, "Data Matching", 2012 — public
  textbook definitions): reduction ratio, pairs completeness, pairs
  quality per candidate source — the numbers that justify a blocking
  key at 10^12 documents, where re-running a bad scheme is the cost of
  a small country.

The reference has no blocking evaluator and blocks only through
driver-side dict indexes (hamerkop/kb.py:132-305); both operators here
are therefore new capability, expressed as native DataFrame plans (the
only Python is the Arrow-batched partition indexer, which touches each
row once and carries no per-row logic).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def global_sorted_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Dense 1-based global rank of `df` under the total order
    `order_cols` — the DataFrame form of zipWithIndex, without ever
    collapsing to one partition.

    Plan: repartitionByRange on the order columns (contiguous,
    non-overlapping ranges) -> sortWithinPartitions -> one
    mapInPandas pass that stamps (partition id, local index) — Arrow
    batches arrive in partition order, so the local index is a
    vectorized arange per batch -> per-partition row counts (one tiny
    job, #partitions rows to the driver) give each partition's base
    offset; rank = base[pid] + local index + 1.

    The rank is invariant to where the range sampler places partition
    boundaries as long as `order_cols` is a total order — callers must
    include a unique tiebreaker column. `persist=True` caches the
    indexed table so the counts job doesn't re-run the sort.
    """
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    rp = df.repartitionByRange(n_part, *order_cols).sortWithinPartitions(
        *order_cols
    )
    out_schema = StructType(
        list(rp.schema.fields)
        + [StructField("_pid", LongType()), StructField("_lrk", LongType())]
    )

    def add_index(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        off = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_pid"] = np.int64(pid)
            pdf["_lrk"] = np.arange(off, off + len(pdf), dtype="int64")
            off += len(pdf)
            yield pdf

    indexed = rp.mapInPandas(add_index, out_schema)
    if persist:
        indexed = indexed.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in indexed.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    if not counts:
        return indexed.withColumn(
            rank_col, (F.col("_lrk") + F.lit(1)).cast("bigint")
        ).drop("_pid", "_lrk")
    bases, acc = {}, 0
    for pid in sorted(counts):
        bases[pid] = acc
        acc += counts[pid]
    base_map = F.create_map(
        *[F.lit(v) for kv in sorted(bases.items()) for v in kv]
    )
    return indexed.withColumn(
        rank_col,
        (base_map[F.col("_pid")] + F.col("_lrk") + F.lit(1)).cast("bigint"),
    ).drop("_pid", "_lrk")


def sorted_neighborhood_candidates(
    records: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 5,
    source: str = "sorted_neighborhood",
    strategy: str = "local",
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking: pair every two records whose global
    ranks under (key, id) differ by less than `window`.

    Output: (a_id, b_id, a_key, b_key, rank_dist, source) with a before
    b in the sort order and rank_dist in [1, window-1].

    Key-independence: total output is exactly (window-1) * n minus the
    tail, whatever the key distribution — SN's classic advantage over
    equality blocking on skewed web-text keys (measured with a 30%-hot
    key in scripts/sn_scale.py).

    Two physical strategies, identical output:

    * ``local`` (default) — range-partition + sortWithinPartitions,
      then pair INSIDE each sorted partition with vectorized shifted
      slices; the only cross-partition data is each partition's first
      (window-1) rows, collected once (#partitions * (window-1) rows)
      and broadcast so every partition can pair its tail against its
      true global successors, walking forward across empty/short
      partitions. Beyond the sort — which any SN implementation needs —
      total extra movement is that boundary sliver: no (window-1)-fold
      row expansion, no second shuffle.

    * ``join`` — global rank (``global_sorted_rank``) + explode of
      rank distances + equi-join on the probe rank. Kept as the
      all-DataFrame cross-check path; it shuffles (window-1)*n rows.
    """
    slim = records.select(
        F.col(id_col).alias("rec_id"), F.col(key_col).alias("sn_key")
    ).where(F.col(key_col).isNotNull())
    if strategy == "join":
        ranked = global_sorted_rank(slim, ["sn_key", "rec_id"])
        left = ranked.select(
            F.col("rec_id").alias("a_id"),
            F.col("sn_key").alias("a_key"),
            F.col("rank"),
        ).withColumn(
            "rank_dist", F.explode(F.sequence(F.lit(1), F.lit(window - 1)))
        ).withColumn("probe_rank", F.col("rank") + F.col("rank_dist"))
        right = ranked.select(
            F.col("rec_id").alias("b_id"),
            F.col("sn_key").alias("b_key"),
            F.col("rank").alias("probe_rank"),
        )
        return (
            left.join(right, "probe_rank")
            .select("a_id", "b_id", "a_key", "b_key", "rank_dist")
            .withColumn("source", F.lit(source))
        )
    if strategy != "local":
        raise ValueError(f"unknown strategy {strategy!r}")

    spark = slim.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    # persist is CORRECTNESS-critical, not just a cache: the heads pass
    # and the pairing pass must see the SAME partition boundaries, and
    # RangePartitioner's sample seed folds in the RDD id, so two
    # separate executions of this plan can draw different boundaries
    # (observed: 186/45k pairs crossing into the wrong neighborhood).
    # Persisting pins one materialized partitioning — and sorts once
    # instead of once per pass.
    rp = (
        slim.repartitionByRange(n_part, "sn_key", "rec_id")
        .sortWithinPartitions("sn_key", "rec_id")
        .persist()
    )

    # Boundary sliver: the first (window-1) rows of every partition, in
    # global order. Tiny by construction; collected once, broadcast to
    # all tasks. Partitions are identified by their FIRST ROW's sort
    # key, NOT TaskContext.partitionId(): the task partition id is
    # stage-local, so when this subtree is embedded under a union the
    # second branch's tasks see offset ids and would walk the wrong
    # successors (observed: 69 broken boundary pairs via the __all__
    # union branch in blocking_quality). First rows are unique and
    # range-ordered, so they index the partition sequence exactly.
    head_schema = StructType(
        [StructField("_pid", LongType())] + list(rp.schema.fields)
    )
    w1 = window - 1

    def take_heads(batches):
        from pyspark import TaskContext

        # pid here is safe: this runs as its own collect action, where
        # the stage IS the cache scan — but it is only used to GROUP
        # rows per partition, never carried into the pairing pass
        pid = TaskContext.get().partitionId()
        left = w1
        for pdf in batches:
            if left <= 0:
                break
            chunk = pdf.iloc[:left].copy()
            chunk.insert(0, "_pid", np.int64(pid))
            left -= len(chunk)
            yield chunk

    heads_rows = rp.mapInPandas(take_heads, head_schema).collect()
    by_pid: dict[int, list] = {}
    for r in heads_rows:
        by_pid.setdefault(r["_pid"], []).append((r["rec_id"], r["sn_key"]))
    # partition sequence in global order, keyed by first-row sort key
    entries = [by_pid[p] for p in sorted(by_pid)]
    first_keys = [(rows[0][1], rows[0][0]) for rows in entries]  # (key, id)
    heads_bc = spark.sparkContext.broadcast((first_keys, entries))

    out_schema = StructType(
        [
            StructField("a_id", rp.schema["rec_id"].dataType),
            StructField("b_id", rp.schema["rec_id"].dataType),
            StructField("a_key", rp.schema["sn_key"].dataType),
            StructField("b_key", rp.schema["sn_key"].dataType),
            StructField("rank_dist", IntegerType()),
        ]
    )

    def pair_local(batches):
        import pandas as pd

        def emit(ids, keys, m):
            # pairs whose a-side is ids[:m]; successors are in-array
            for d in range(1, window):
                hi = min(m, len(ids) - d)
                if hi <= 0:
                    continue
                yield pd.DataFrame(
                    {
                        "a_id": ids[:hi],
                        "b_id": ids[d : d + hi],
                        "a_key": keys[:hi],
                        "b_key": keys[d : d + hi],
                        "rank_dist": np.full(hi, d, dtype="int32"),
                    }
                )

        my_first = None
        pend_ids = pend_keys = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["rec_id"].to_numpy()
            keys = pdf["sn_key"].to_numpy()
            if my_first is None:
                my_first = (keys[0], ids[0])
            if pend_ids is not None:
                ids = np.concatenate([pend_ids, ids])
                keys = np.concatenate([pend_keys, keys])
            # every row except the last (window-1) has its full
            # successor window in hand — emit those, carry the rest
            m = len(ids) - w1
            if m > 0:
                yield from emit(ids, keys, m)
                pend_ids, pend_keys = ids[m:], keys[m:]
            else:
                pend_ids, pend_keys = ids, keys
        if pend_ids is None:
            return
        # flush the carried tail against the true global successors:
        # locate THIS partition in the global sequence by its first
        # row's sort key, then walk forward through later partitions'
        # head slivers (short or empty partitions contribute what they
        # have)
        import bisect

        first_keys, entries = heads_bc.value
        i = bisect.bisect_left(first_keys, my_first)
        assert i < len(first_keys) and first_keys[i] == my_first, (
            "sorted-neighborhood boundary map out of sync with the "
            "persisted partitioning"
        )
        succ: list = []
        q = i + 1
        while len(succ) < w1 and q < len(entries):
            succ.extend(entries[q])
            q += 1
        succ = succ[:w1]
        n_pend = len(pend_ids)
        if succ:
            pend_ids = np.concatenate(
                [pend_ids, np.array([s[0] for s in succ], dtype=pend_ids.dtype)]
            )
            pend_keys = np.concatenate(
                [pend_keys, np.array([s[1] for s in succ], dtype=object)]
            )
        yield from emit(pend_ids, pend_keys, n_pend)

    return rp.mapInPandas(pair_local, out_schema).withColumn(
        "source", F.lit(source)
    )


def suffix_array_candidates(
    records: DataFrame,
    key_col: str,
    id_col: str,
    min_suffix_len: int = 4,
    max_block_size: int = 50,
    source: str = "suffix_array",
) -> DataFrame:
    """Suffix-array blocking (Aizawa & Oyama, WIRI 2005): two records
    become a candidate pair when they share ANY suffix of the blocking
    key with length >= ``min_suffix_len``; suffixes whose block exceeds
    ``max_block_size`` records are purged (the standard frequent-suffix
    cap — common endings like 'corporation'/'...ovic' would otherwise
    contribute quadratic pairs while discriminating nothing).

    Output: (a_id, b_id, n_shared, source), one row per pair with
    a < b and n_shared = number of surviving suffixes the pair shares
    (a CBS-style weight, directly feedable to ``meta_blocking_cnp``'s
    pruning idea or a cheap-confidence sort).

    Keys shorter than ``min_suffix_len`` contribute their whole key as
    the single suffix (the sequence lower bound is clamped to one
    position), so short names still block instead of silently dropping
    out.

    Why this family at web scale: the key HEAD is the most fragile
    part of crawled names (truncated titles, dropped honorifics,
    boilerplate prefixes), and every head-anchored scheme — sort-order
    neighborhoods, Soundex of the first syllable, key prefixes — moves
    a head-damaged record arbitrarily far away. Suffixes that begin
    after the damage are untouched, so recall degrades gracefully.

    Plan shape at 10^12 rows: one explode bounded by key length (web
    names are short strings, ~L suffixes per record), one partial-agg
    shuffle for block sizes, one size-capped self-join (every block
    <= max_block_size, so the join fan-out per key is bounded and AQE
    has nothing to split), one pair-keyed partial-agg shuffle for the
    dedup/weight. No window functions, no driver collection.

    The reference blocks only through driver-side dict indexes
    (hamerkop/kb.py:132-305) and has no suffix family; new capability.
    """
    slim = records.select(
        F.col(id_col).alias("rec_id"), F.col(key_col).alias("sa_key")
    ).where(F.col(key_col).isNotNull() & (F.length(key_col) > 0))
    # all suffixes of length >= min_suffix_len; clamp to >= 1 start so
    # short keys emit the whole key. array_distinct: a key like 'abab'
    # repeats suffixes only when the key itself repeats, but pathological
    # repeats must not double-count a record inside its own block.
    exploded = slim.select(
        "rec_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(1, length(sa_key)"
                    f" - {int(min_suffix_len)} + 1)), i -> substr(sa_key, i))"
                )
            )
        ).alias("sfx"),
    )
    sizes = exploded.groupBy("sfx").agg(F.count("*").alias("bsz"))
    # pin the surviving postings once: the self-join below would
    # otherwise re-run the explode AND the size aggregation on both
    # sides (plan-audited: 4 parquet scans without the pin, 1 with) —
    # same Catalyst CSE gap the TF-IDF weights hit (functions/tfidf.py)
    kept = exploded.join(
        sizes.where(
            (F.col("bsz") >= 2) & (F.col("bsz") <= int(max_block_size))
        ).select("sfx"),
        "sfx",
    ).localCheckpoint(eager=False)
    a = kept.select(F.col("sfx"), F.col("rec_id").alias("a_id"))
    b = kept.select(F.col("sfx"), F.col("rec_id").alias("b_id"))
    pairs = a.join(b, "sfx").where(F.col("a_id") < F.col("b_id"))
    return (
        pairs.groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_shared"))
        .withColumn("source", F.lit(source))
    )


def meta_blocking_cnp(
    blocks: DataFrame,
    key_col: str = "block_key",
    id_col: str = "record_id",
    top_k: int = 5,
    max_block_size: int = 100,
    reciprocal: bool = False,
) -> DataFrame:
    """Graph meta-blocking with CBS weighting and Cardinality Node
    Pruning over an existing block collection (one row per
    (block key, record) assignment).

    Stages (each a bounded DataFrame op):
      1. block purging — drop singleton blocks (no pairs) and blocks
         larger than `max_block_size` (the standard guard that keeps
         the within-block self-join quadratic term bounded: cost <=
         #blocks * max_block_size^2, regardless of key skew);
      2. edge weighting — within-block self-join (a < b), then CBS =
         number of shared blocks per pair (groupBy count: map-side
         combinable, integer weight — deterministic across engines);
      3. CNP — keep an edge iff it ranks in the top `top_k` neighbours
         of EITHER endpoint by (CBS desc, neighbour id asc). The
         per-node window is bounded: a node's degree after purging is
         at most (#blocks it appears in) * (max_block_size - 1).
         With ``reciprocal=True`` (Reciprocal CNP, Papadakis et al.
         TKDE '14 §redefined-pruning): keep an edge iff it ranks in
         the top `top_k` of BOTH endpoints — the precision-sharpened
         variant that drops one-sided affinities (a sparse record's
         best neighbour that the neighbour itself would never pick).

    Output: (a_id, b_id, cbs). Integer weights and deterministic
    tie-breaks make the result hash-stable for the oracle gate.
    """
    b = (
        blocks.select(
            F.col(key_col).alias("bk"), F.col(id_col).alias("rid")
        )
        .where(F.col(key_col).isNotNull() & F.col(id_col).isNotNull())
        .distinct()
    )
    sizes = b.groupBy("bk").agg(F.count("*").alias("bsz"))
    kept = b.join(
        sizes.where(
            (F.col("bsz") >= 2) & (F.col("bsz") <= max_block_size)
        ).select("bk"),
        "bk",
    )
    pairs = (
        kept.select("bk", F.col("rid").alias("a_id"))
        .join(kept.select("bk", F.col("rid").alias("b_id")), "bk")
        .where(F.col("a_id") < F.col("b_id"))
    )
    # edges fans out three ways (both union branches + the final weight
    # re-attach); materialize the post-aggregation table — it is the
    # SMALL side (pairs collapsed to weights, bounded by the purge cap)
    # — so the quadratic within-block self-join runs once, not per
    # branch. r6: lazy localCheckpoint like the sibling WNP/WEP paths;
    # the old .persist() was never unpersisted and leaked executor
    # cache across repeated calls in one session (ADVICE r5).
    edges = (
        pairs.groupBy("a_id", "b_id")
        .agg(F.count("*").alias("cbs"))
        .localCheckpoint(eager=False)
    )
    directed = edges.select(
        F.col("a_id").alias("node"), F.col("b_id").alias("nbr"), "cbs"
    ).unionByName(
        edges.select(
            F.col("b_id").alias("node"), F.col("a_id").alias("nbr"), "cbs"
        )
    )
    w = Window.partitionBy("node").orderBy(F.desc("cbs"), "nbr")
    ranked = (
        directed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .select(
            F.least("node", "nbr").alias("a_id"),
            F.greatest("node", "nbr").alias("b_id"),
        )
    )
    if reciprocal:
        # each canonical pair appears once per endpoint whose top-k
        # kept it; both directions <=> count == 2
        survivors = (
            ranked.groupBy("a_id", "b_id")
            .agg(F.count("*").alias("_nd"))
            .where(F.col("_nd") == 2)
            .select("a_id", "b_id")
        )
    else:
        survivors = ranked.distinct()
    return survivors.join(edges, ["a_id", "b_id"]).select(
        "a_id", "b_id", "cbs"
    )


def meta_blocking_wnp(
    blocks: DataFrame,
    key_col: str = "block_key",
    id_col: str = "record_id",
    max_block_size: int = 100,
    reciprocal: bool = False,
) -> DataFrame:
    """Weighted Node Pruning meta-blocking (Papadakis et al., TKDE
    2014): each node keeps its incident edges whose CBS weight is >=
    the node's OWN mean incident weight; an edge survives when kept by
    EITHER endpoint (``reciprocal=True``: BOTH). Completes the pruning
    quartet — CNP/RCNP bound each node's degree (cardinality), WEP
    applies one corpus-global weight bar, WNP applies a LOCAL bar: a
    moderately-weighted edge in a weak neighbourhood survives WNP but
    not WEP, and a hub's mediocre edges die under WNP even when they
    clear the global mean.

    The local mean test is the exact integer compare
    ``cbs * n_incident >= sum_incident`` — no division, so the
    survivor set is hash-stable on any engine.

    Output: (a_id, b_id, cbs). Plan shape: the same purge + capped
    within-block self-join + CBS partial-agg as CNP, one per-node
    (sum, count) aggregate joined back on the node key, a groupBy
    count over canonical pairs. No windows at all (vs CNP's per-node
    rank) — the pruning stage is two keyed partial aggs.
    """
    b = (
        blocks.select(
            F.col(key_col).alias("bk"), F.col(id_col).alias("rid")
        )
        .where(F.col(key_col).isNotNull() & F.col(id_col).isNotNull())
        .distinct()
    )
    sizes = b.groupBy("bk").agg(F.count("*").alias("bsz"))
    kept = b.join(
        sizes.where(
            (F.col("bsz") >= 2) & (F.col("bsz") <= max_block_size)
        ).select("bk"),
        "bk",
    )
    pairs = (
        kept.select("bk", F.col("rid").alias("a_id"))
        .join(kept.select("bk", F.col("rid").alias("b_id")), "bk")
        .where(F.col("a_id") < F.col("b_id"))
    )
    edges = (
        pairs.groupBy("a_id", "b_id")
        .agg(F.count("*").alias("cbs"))
        .localCheckpoint(eager=False)
    )
    directed = edges.select(
        F.col("a_id").alias("node"), F.col("b_id").alias("nbr"), "cbs"
    ).unionByName(
        edges.select(
            F.col("b_id").alias("node"), F.col("a_id").alias("nbr"), "cbs"
        )
    )
    node_stats = directed.groupBy("node").agg(
        F.sum("cbs").alias("_ws"), F.count("*").alias("_wn")
    )
    kept_dir = (
        directed.join(node_stats, "node")
        .where(F.col("cbs") * F.col("_wn") >= F.col("_ws"))
        .select(
            F.least("node", "nbr").alias("a_id"),
            F.greatest("node", "nbr").alias("b_id"),
        )
    )
    need = 2 if reciprocal else 1
    survivors = (
        kept_dir.groupBy("a_id", "b_id")
        .agg(F.count("*").alias("_nd"))
        .where(F.col("_nd") >= need)
        .select("a_id", "b_id")
    )
    return survivors.join(edges, ["a_id", "b_id"]).select(
        "a_id", "b_id", "cbs"
    )


def meta_blocking_wep(
    blocks: DataFrame,
    key_col: str = "block_key",
    id_col: str = "record_id",
    max_block_size: int = 100,
    scheme: str = "cbs",
) -> DataFrame:
    """Weighted Edge Pruning meta-blocking (Papadakis et al., TKDE
    2014): keep every comparison whose weight is >= the MEAN edge
    weight of the blocking graph. The global-threshold complement to
    ``meta_blocking_cnp`` — CNP guarantees each record keeps its
    best-k neighbours (recall-shaped, bounded output per node); WEP
    applies one corpus-level evidence bar (precision-shaped: sparse
    records keep nothing rather than their least-bad neighbours).

    Weighting schemes (both integer/fixed-point so the survivor set is
    hash-stable across engines):
      * ``cbs``  — common-blocks count; the mean test is the EXACT
        integer compare ``cbs * n_edges >= sum_cbs`` (no division);
      * ``ecbs`` — Enhanced CBS, ``cbs * ln(|B|/|B_a|) * ln(|B|/|B_b|)``
        (|B| = #blocks after purging, |B_x| = #blocks containing x),
        floored to micro-units before the same integer mean test —
        down-weights records that appear in many blocks (stopword-ish
        keys) exactly like IDF.

    Output: (a_id, b_id, w_micro) — CBS edges report ``cbs * 1e6``
    so both schemes share one schema.

    Plan shape: the same purge + bounded within-block self-join + CBS
    partial-agg as CNP, one tiny global aggregate (2 scalars, crossed
    back via broadcast-of-1-row), and for ecbs one broadcast-sized
    per-record block-count join per endpoint. No windows; the only
    quadratic term is capped by ``max_block_size``.
    """
    if scheme not in ("cbs", "ecbs"):
        raise ValueError(f"unknown WEP scheme: {scheme!r}")
    b = (
        blocks.select(
            F.col(key_col).alias("bk"), F.col(id_col).alias("rid")
        )
        .where(F.col(key_col).isNotNull() & F.col(id_col).isNotNull())
        .distinct()
    )
    sizes = b.groupBy("bk").agg(F.count("*").alias("bsz"))
    kept = b.join(
        sizes.where(
            (F.col("bsz") >= 2) & (F.col("bsz") <= max_block_size)
        ).select("bk"),
        "bk",
    ).localCheckpoint(eager=False)
    pairs = (
        kept.select("bk", F.col("rid").alias("a_id"))
        .join(kept.select("bk", F.col("rid").alias("b_id")), "bk")
        .where(F.col("a_id") < F.col("b_id"))
    )
    edges = pairs.groupBy("a_id", "b_id").agg(F.count("*").alias("cbs"))
    if scheme == "cbs":
        weighted = edges.select(
            "a_id", "b_id",
            (F.col("cbs") * F.lit(1_000_000)).cast("bigint").alias(
                "w_micro"
            ),
        )
    else:
        n_blocks = kept.select("bk").distinct().count()
        per_rec = kept.groupBy("rid").agg(
            F.countDistinct("bk").alias("nb")
        )
        weighted = (
            edges.join(
                F.broadcast(per_rec.withColumnsRenamed(
                    {"rid": "a_id", "nb": "nb_a"}
                )),
                "a_id",
            )
            .join(
                F.broadcast(per_rec.withColumnsRenamed(
                    {"rid": "b_id", "nb": "nb_b"}
                )),
                "b_id",
            )
            .select(
                "a_id", "b_id",
                F.floor(
                    F.col("cbs").cast("double")
                    * F.log(F.lit(float(n_blocks)) / F.col("nb_a"))
                    * F.log(F.lit(float(n_blocks)) / F.col("nb_b"))
                    * F.lit(1e6)
                ).cast("bigint").alias("w_micro"),
            )
        )
    weighted = weighted.localCheckpoint(eager=False)
    stats = weighted.agg(
        F.sum("w_micro").alias("w_sum"), F.count("*").alias("n_e")
    )
    return (
        weighted.crossJoin(F.broadcast(stats))
        .where(F.col("w_micro") * F.col("n_e") >= F.col("w_sum"))
        .select("a_id", "b_id", "w_micro")
    )


def blocking_quality(
    candidates: DataFrame,
    gold_pairs: DataFrame,
    total_possible_pairs: int | None = None,
    source_col: str | None = "source",
) -> DataFrame:
    """Blocking quality metrics per candidate source plus an '__all__'
    union row (definitions: Christen 2012, ch. 7):

      pairs completeness  PC = |C ∩ M| / |M|   (blocking recall)
      pairs quality       PQ = |C ∩ M| / |C|   (blocking precision)
      reduction ratio     RR = 1 - |C| / total_possible_pairs

    `candidates` needs (a_id, b_id[, source]); `gold_pairs` needs
    (a_id, b_id). Pairs are canonicalized (least/greatest) and
    deduplicated per source before counting, so generators that emit
    both orientations aren't double-counted. Ratios are emitted as
    fixed-point millionths (BIGINT) — floor(x*1e6 + 0.5) uses only
    IEEE-identical ops, so the row hashes match any ANSI oracle.

    One shuffle per metric table (groupBy source after a broadcast-or-
    hash join against the gold set, which is small by definition —
    labeled pairs are human-produced).
    """
    canon = candidates.select(
        (
            F.lit("__all__")
            if source_col is None
            else F.col(source_col)
        ).alias("src"),
        F.least("a_id", "b_id").alias("a"),
        F.greatest("a_id", "b_id").alias("b"),
    )
    if source_col is not None:
        canon = canon.unionByName(
            canon.select(F.lit("__all__").alias("src"), "a", "b")
        )
    canon = canon.distinct()
    gold = (
        gold_pairs.select(
            F.least("a_id", "b_id").alias("a"),
            F.greatest("a_id", "b_id").alias("b"),
        )
        .distinct()
        .withColumn("is_match", F.lit(1).cast("bigint"))
    )
    n_gold = gold.count()
    joined = canon.join(gold, ["a", "b"], "left")
    agg = joined.groupBy("src").agg(
        F.count("*").alias("n_candidates"),
        F.coalesce(F.sum("is_match"), F.lit(0)).alias("n_true_positives"),
    )

    def _fp(x):
        return F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("bigint")

    out = agg.withColumn("n_gold", F.lit(n_gold).cast("bigint")).withColumn(
        "pc_fp",
        F.when(
            F.lit(n_gold) > 0,
            _fp(F.col("n_true_positives").cast("double") / F.lit(float(n_gold))),
        ).otherwise(F.lit(None).cast("bigint")),
    ).withColumn(
        "pq_fp",
        _fp(
            F.col("n_true_positives").cast("double")
            / F.col("n_candidates").cast("double")
        ),
    )
    if total_possible_pairs:
        out = out.withColumn(
            "rr_fp",
            _fp(
                F.lit(1.0)
                - F.col("n_candidates").cast("double")
                / F.lit(float(total_possible_pairs))
            ),
        )
    else:
        out = out.withColumn("rr_fp", F.lit(None).cast("bigint"))
    return out.select(
        F.col("src").alias("source"),
        "n_candidates",
        "n_true_positives",
        "n_gold",
        "pc_fp",
        "pq_fp",
        "rr_fp",
    )


def adaptive_sorted_neighborhood(
    records: DataFrame,
    key_col: str,
    id_col: str,
    max_key_dist: int = 2,
    max_block_size: int = 50,
    bucket: int = 8192,
    source: str = "adaptive_sn",
) -> DataFrame:
    """Adaptive sorted-neighborhood blocking (Yan, Lee, Kan & Giles,
    JCDL 2007): instead of a FIXED window over the sort order, cut the
    sorted sequence wherever adjacent sorting keys jump apart
    (levenshtein distance > ``max_key_dist``) and pair records within
    the resulting variable-size blocks. Fixes both failure modes of
    fixed-window SN: a duplicate family larger than the window loses
    pairs (here the block grows until the keys change), and sparse key
    regions waste comparisons on sort-neighbours that share nothing
    (here a key jump closes the block immediately).

    Output: (a_id, b_id, block_id) — a before b in sort order,
    block_id = 1-based index of the adaptive block in key order
    (deterministic, so the result is hash-stable for the oracle gate).
    Blocks larger than ``max_block_size`` are purged whole (the same
    guard as every capped family here: a run of identical keys is
    equality-blocking's job, and quadratic pair cost inside one block
    must stay bounded).

    Scale shape: rank via ``global_sorted_rank`` (range partition +
    Arrow local index + tiny offsets job — never one partition);
    boundary detection is an equi-join on adjacent ranks (uniform
    integer key, skew-free); the running block counter is a TWO-LEVEL
    cumulative sum — within-bucket window (bounded partitions of
    ``bucket`` rows) plus a bucket-offset cumsum over #rows/bucket
    rows — so no global single-partition window ever materializes.
    The final within-block self-join is capped by the purge.
    """
    slim = records.select(
        F.col(id_col).alias("rec_id"), F.col(key_col).alias("sn_key")
    ).where(F.col(key_col).isNotNull())
    ranked = global_sorted_rank(slim, ["sn_key", "rec_id"])
    prev = ranked.select(
        (F.col("rank") + 1).alias("rank"),
        F.col("sn_key").alias("prev_key"),
    )
    flagged = ranked.join(prev, "rank", "left").select(
        "rec_id", "sn_key", "rank",
        F.when(
            F.col("prev_key").isNull()
            | (F.levenshtein("prev_key", "sn_key") <= max_key_dist),
            F.lit(0),
        ).otherwise(F.lit(1)).alias("cut"),
    )
    bkt = ((F.col("rank") - 1) / bucket).cast("bigint")
    flagged = flagged.withColumn("bkt", bkt)
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # bucket offsets: #rows/bucket rows — tiny; its own cumsum window
    # is over that tiny table (re-bucketable the same way if it ever
    # isn't)
    w_off = (
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        flagged.groupBy("bkt")
        .agg(F.sum("cut").alias("bsum"))
        .withColumn(
            "base", F.coalesce(F.sum("bsum").over(w_off), F.lit(0))
        )
        .select("bkt", "base")
    )
    blocks = (
        flagged.withColumn("run", F.sum("cut").over(w_in))
        .join(offsets, "bkt")
        .select(
            "rec_id", "rank",
            (F.col("base") + F.col("run") + 1).alias("block_id"),
        )
        .localCheckpoint(eager=False)
    )
    sizes = blocks.groupBy("block_id").agg(F.count("*").alias("bsz"))
    kept = blocks.join(
        sizes.where(
            (F.col("bsz") >= 2) & (F.col("bsz") <= max_block_size)
        ).select("block_id"),
        "block_id",
    )
    a = kept.select("block_id", F.col("rec_id").alias("a_id"),
                    F.col("rank").alias("a_rank"))
    b = kept.select("block_id", F.col("rec_id").alias("b_id"),
                    F.col("rank").alias("b_rank"))
    return (
        a.join(b, "block_id")
        .where(F.col("a_rank") < F.col("b_rank"))
        .select("a_id", "b_id", "block_id")
    )
