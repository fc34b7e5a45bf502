"""Incremental ingest with Structured Streaming.

The batch pipeline's stages are pure DataFrame functions, so the
stateless ones lift directly onto streaming DataFrames:

* `stream_pages` — file-source stream over the pages table (new parquet
  files = newly crawled WARC batches); the same pinned extraction
  (sources/web.py) runs per micro-batch, preserving the byte-identity
  invariant.
* `windowed_mention_counts` — watermarked tumbling-window aggregation
  (late crawl records tolerated up to the watermark).
* `sessionize_events` — custom stateful operator via
  applyInPandasWithState: per-user session assembly with a gap timeout,
  the Structured-Streaming analog of the batch lag/cumsum sessionizer
  (__spark_entry__.q_events_sessionize).
* `foreach_batch_linker` — per-micro-batch entity linking: each batch of
  pages runs the batch blocking+resolve stages against the (static) KB
  and appends decisions; exactly-once via checkpointed sink.
* `catalog_stream_sink` — foreachBatch writer committing each
  micro-batch as an append snapshot to an IcebergishCatalog table, with
  replayed batches filtered by a `last_batch_id` high-water mark:
  atomic batch visibility + idempotent appends = exactly-once into the
  table.
* `catalog_cluster_sink` — streaming transitive clustering: each batch's
  merge edges fold into the prior assignment via incremental_components
  and overwrite the assignment table as a new snapshot (old cluster
  states stay time-travelable).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hamerkop_spark.schemas import PAGES
from hamerkop_spark.sources.web import ingest_pages


def stream_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    """File-source stream of PAGES-schema parquet; one file per
    micro-batch by default (maxFilesPerTrigger tunable by caller)."""
    return spark.readStream.schema(PAGES).parquet(pages_dir)


def stream_documents(spark: SparkSession, pages_dir: str) -> DataFrame:
    """Streaming ingest: extraction runs per micro-batch (stateless
    mapInPandas lifts unchanged onto the stream)."""
    return ingest_pages(stream_pages(spark, pages_dir))


def windowed_mention_counts(
    documents: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-language document counts with late-data
    tolerance (watermark on warc_ts)."""
    return (
        documents.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "lang")
        .agg(F.count("*").alias("n_docs"))
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_ts", T.LongType()),  # epoch nanos
        T.StructField("last_ts", T.LongType()),
    ]
)


def _sessionize_fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    """Per-user session state: events extend the open session unless the
    gap exceeds 30 min; a processing-time timeout flushes the final
    session."""
    gap_ns = 30 * 60 * 1_000_000_000  # pandas datetime64[ns].astype(int64) is epoch ns
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            sid, n, start, last = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_id": sid,
                        "n_events": n,
                        "session_start": pd.Timestamp(start, unit="ns"),
                        "session_end": pd.Timestamp(last, unit="ns"),
                    }
                ]
            )
        return

    if state.exists:
        sid, n, start, last = state.get
    else:
        sid, n, start, last = 0, 0, None, None

    closed = []
    # Gather EVERY Arrow chunk before sorting: a group larger than
    # arrow.maxRecordsPerBatch arrives as several pandas chunks in
    # unspecified order, and a per-chunk sort would feed the gap logic
    # timestamps that go backwards across chunk boundaries — merging
    # events that straddle a real gap and corrupting session_start
    # (review r4). Memory is bounded by the group's events in this
    # micro-batch (the same bound the per-chunk path already implied
    # for a single chunk).
    parts = [pdf["ts"].astype("int64") for pdf in pdf_iter]
    if parts:
        all_ts = pd.concat(parts).sort_values()
        for t in all_ts:
            t = int(t)
            # session_id = session START in epoch millis: unique per
            # (user, session) BY CONSTRUCTION even across state-timeout
            # flushes — a per-state counter restarted at 1 after the
            # timeout removed the state, so a user's later sessions
            # reused already-emitted (user_id, session_id) keys
            # (review fix); start-derived ids are also deterministic
            # under replay.
            if last is None:
                sid, n, start, last = t // 1_000_000, 1, t, t
            elif t - last > gap_ns:
                closed.append((sid, n, start, last))
                sid, n, start, last = t // 1_000_000, 1, t, t
            else:
                n += 1
                last = max(last, t)
    state.update((sid, n, start, last))
    state.setTimeoutDuration(60 * 1000)
    if closed:
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_id": s,
                    "n_events": c,
                    "session_start": pd.Timestamp(a, unit="ns"),
                    "session_end": pd.Timestamp(b, unit="ns"),
                }
                for (s, c, a, b) in closed
            ]
        )


def sessionize_events(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (SURVEY.md brief: stateful
    streaming via applyInPandasWithState): per-user 30-min-gap sessions,
    emitted when closed by a newer event or by state timeout."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def foreach_batch_linker(
    documents_stream: DataFrame,
    kb_names: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
):
    """Per-micro-batch entity linking: run the batch exact-blocking stage
    on each arriving document batch against the static KB and write
    decisions. The KB side is a static DataFrame — stream-static joins
    are the supported shape. Replay safety: foreachBatch is
    at-least-once, so the sink is written with dynamic partition
    overwrite on batch_id (like foreach_batch_dedup) — a replayed
    batch REWRITES its own partition instead of appending duplicate
    decision rows (review r4)."""
    from hamerkop_spark.operators.blocking import exact_match_candidates

    def process(batch_df: DataFrame, batch_id: int) -> None:
        chains = batch_df.select(
            F.col("url").alias("doc_id"),
            F.col("url").alias("chain_id"),
            F.lit("PER").alias("type"),
            F.col("text").alias("name"),
        )
        hits = exact_match_candidates(chains, kb_names)
        (
            hits.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sink_dir)
        )

    return (
        documents_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def foreach_batch_one_to_one_linker(
    documents_stream: DataFrame,
    kb_names: DataFrame,
    state_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    score_fn=None,
    max_rounds: int | None = None,
):
    """Streaming ONE-TO-ONE entity linking: like foreach_batch_linker,
    but across the whole stream each KB entity is claimed by at most
    one chain. Within a batch, candidates are matched greedily
    (operators/linkage.one_to_one_assignment — best score wins, both
    endpoints leave); entities claimed by PRIOR batches are excluded
    up front via an accumulated claimed-entity store, so the stream
    implements first-batch-first, best-within-batch assignment — the
    incremental reading of the Fellegi-Sunter one-to-one restriction.

    `score_fn(candidates) -> candidates + match_score` customizes
    ranking (defaults to -retrieval_rank, i.e. each chain prefers its
    deterministic first candidate, FirstResolver semantics).

    Replay safety (same contract as foreach_batch_dedup): the
    decisions sink AND the claimed store are written with dynamic
    partition overwrite on batch_id, and the store read excludes rows
    with batch_id >= the current batch — a replayed batch re-derives
    the identical pool (its own partial claims are invisible to it)
    and REWRITES its own partitions. Store growth is one tiny
    (entity_id) partition per batch, bounded by the matching size,
    not the candidate volume.
    """
    from hamerkop_spark.operators.blocking import exact_match_candidates
    from hamerkop_spark.operators.linkage import one_to_one_assignment

    # the claimed store's schema is pinned at stream definition from
    # the KB's entity_id type (not inferred from store files — see the
    # empty-batch note in process())
    _eid_type = kb_names.schema["entity_id"].dataType.simpleString()
    _store_schema = f"entity_id {_eid_type}, batch_id int"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        par = spark.sparkContext.defaultParallelism
        if batch_df.rdd.getNumPartitions() < par:
            batch_df = batch_df.repartition(par)
        chains = batch_df.select(
            F.col("url").alias("doc_id"),
            F.col("url").alias("chain_id"),
            F.lit("PER").alias("type"),
            F.col("text").alias("name"),
        )
        cands = exact_match_candidates(chains, kb_names)
        if score_fn is not None:
            scored = score_fn(cands)
        else:
            scored = cands.withColumn(
                "match_score", (-F.col("retrieval_rank")).cast("double")
            )
        if _fs_exists(spark, state_dir):
            # explicit schema: a batch that matched NOTHING leaves the
            # store directory with a _SUCCESS marker but no parquet
            # footers, and schema inference would throw on the next
            # batch, killing the stream permanently (review finding)
            claimed = (
                spark.read.schema(_store_schema)
                .parquet(state_dir)
                .where(F.col("batch_id") < batch_id)
                .select("entity_id")
            )
            pool = scored.join(claimed, "entity_id", "left_anti")
        else:
            pool = scored  # first batch
        matched = one_to_one_assignment(
            pool,
            left_col="chain_id",
            right_col="entity_id",
            score_col="match_score",
            max_rounds=max_rounds,
        ).withColumn("batch_id", F.lit(batch_id))
        (
            matched.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sink_dir)
        )
        (
            matched.select("entity_id", "batch_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    return (
        documents_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def foreach_batch_dedup(
    documents_stream: DataFrame,
    state_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    id_col: str = "url",
    text_col: str = "text",
    num_hashes: int = 32,
    num_bands: int = 8,
    max_bucket: int = 200,
    compact_every: int | None = None,
):
    """Incremental MinHash-LSH dedup over a document stream.

    Each micro-batch is shingled/banded once (`dedup.minhash_doc_bands`)
    and joined against the ACCUMULATED (id, band, bucket) store of every
    prior batch: new-vs-new pairs via a bounded self-join, new-vs-old via
    a bucket equi-join against the store — never new-vs-corpus-text.

    The `max_bucket` cap is enforced on the TOTAL bucket size (store +
    batch), matching the batch twin's global-drop semantics: a
    boilerplate bucket that accumulates past the cap over many batches
    stops producing pairs from then on (pairs it emitted while still
    under the cap stand — the incremental reading of the same rule), so
    per-batch join cost stays O(|batch bands| x max_bucket), not
    O(corpus hot-bucket size).

    Replay safety: both the pairs sink and the band store are written
    with dynamic partition overwrite on batch_id — a foreachBatch replay
    after a crash REWRITES its own partition instead of appending a
    duplicate, and the store read excludes rows with batch_id >= the
    current batch (a partial write from the crashed attempt). Writes are
    idempotent per batch; no consumer-side dedup needed.

    `compact_every=N` folds the store's committed batch partitions into
    one merged batch_id=-1 partition after every Nth batch (inside the
    foreachBatch body, i.e. between triggers, which is exactly when
    `compact_band_store` is safe to run): without it a long stream
    accumulates one parquet directory per micro-batch and the store
    scan degrades into a many-small-files listing. The fold rewrites
    the whole store, so amortized per-batch compaction cost is
    O(store/N) — pick N so that is small next to the batch's own join
    work (16-32 for 20k-doc batches). Replay stays safe: the current
    batch's partition is kept as-is by the fold, and a crash anywhere
    inside the swap is repaired by `_recover_band_store` on the next
    store read.

    The batch twin is `operators/dedup.minhash_dedup_pairs`; this is the
    continuous-ingest path a 100 TB training-data pipeline needs — dedup
    keeps up with arrival instead of recomputing over the corpus."""
    from hamerkop_spark.operators.dedup import minhash_doc_bands

    if compact_every is not None:
        if compact_every < 2:
            raise ValueError("compact_every must be >= 2")
        if not _is_local_path(state_dir):
            # fail at stream-definition time, not N batches in
            raise NotImplementedError(
                "compact_every uses compact_band_store, which swaps "
                "directories locally; for a remote store run periodic "
                "rewrites into a new state_dir instead"
            )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # a micro-batch typically arrives as a handful of files (often
        # one), so the expensive shingle+minhash projection would run
        # on that few partitions; spread it across the cluster first —
        # this alone took the 20k-docs/batch bench from ~1.4k to >2k
        # docs/s on local[16]
        par = spark.sparkContext.defaultParallelism
        if batch_df.rdd.getNumPartitions() < par:
            batch_df = batch_df.repartition(par)
        bands = (
            minhash_doc_bands(
                batch_df, id_col=id_col, text_col=text_col,
                num_hashes=num_hashes, num_bands=num_bands,
            )
            .withColumn("batch_id", F.lit(batch_id))
            .cache()
        )
        # "No store yet" is detected by PATH ABSENCE only — a genuine
        # read error (corrupt files, transient FS failure) must propagate
        # so the batch retries instead of silently dropping every
        # new-vs-old pair and then committing the under-emitted result.
        # Existence goes through the Hadoop FileSystem API so remote
        # stores (hdfs://, s3a://) are checked for real — os.path.exists
        # would be constant-False there and every batch would look like
        # the first.
        if _is_local_path(state_dir):
            _recover_band_store(state_dir)
        if _fs_exists(spark, state_dir):
            store = spark.read.parquet(state_dir).where(
                F.col("batch_id") < batch_id
            )
        else:
            store = None  # first batch
        batch_counts = bands.groupBy("band", "bucket").agg(
            F.count("*").alias("bc")
        )
        relevant = None
        if store is not None:
            # ONE store scan per batch: restrict the store to the buckets
            # this batch touches (AQE broadcasts the small key set) and
            # cache the slice — both the cap aggregation and the
            # new-vs-old join read the same InMemoryRelation instead of
            # scanning the (corpus-sized, ever-growing) store twice. The
            # slice is bounded by |batch bands| x bucket size, not by
            # corpus size, so per-batch memory stays flat as the stream
            # ages; this is what keeps batch cost from growing O(corpus)
            # at 100 TB (modulo the unavoidable single scan).
            batch_keys = bands.select("band", "bucket").distinct()
            relevant = store.join(batch_keys, ["band", "bucket"]).cache()
            store_counts = relevant.groupBy("band", "bucket").agg(
                F.count("*").alias("sc")
            )
            totals = batch_counts.join(
                store_counts, ["band", "bucket"], "left"
            ).select(
                "band", "bucket",
                (F.col("bc") + F.coalesce("sc", F.lit(0))).alias("tot"),
            )
        else:
            totals = batch_counts.select(
                "band", "bucket", F.col("bc").alias("tot")
            )
        ok = totals.where(F.col("tot") <= max_bucket).select("band", "bucket")
        nb = bands.join(ok, ["band", "bucket"])
        a = nb.select("band", "bucket", F.col("_id").alias("src"))
        b = nb.select("band", "bucket", F.col("_id").alias("dst"))
        pairs = (
            a.join(b, ["band", "bucket"])
            .where(F.col("src") < F.col("dst"))
            .select("src", "dst")
        )
        if store is not None:
            old = relevant.join(ok, ["band", "bucket"]).select(
                "band", "bucket", F.col("_id").alias("dst")
            )
            cross = (
                a.join(old, ["band", "bucket"])
                .where(F.col("src") != F.col("dst"))
                .select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                )
            )
            pairs = pairs.unionByName(cross)
        (
            pairs.distinct()
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sink_dir)
        )
        (
            bands.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )
        bands.unpersist()
        if relevant is not None:
            relevant.unpersist()
        # auto-compaction: this point is between triggers for this
        # stream (foreachBatch is synchronous), and the batch's own
        # partition was just written, so the fold keeps it as the
        # replayable latest partition
        if (
            compact_every is not None
            and batch_id > 0
            and batch_id % compact_every == 0
        ):
            compact_band_store(spark, state_dir)

    return (
        documents_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def _is_local_path(path: str) -> bool:
    scheme = path.split("://", 1)[0] if "://" in path else ""
    return scheme in ("", "file") or path.startswith("file:/")


def _strip_file_scheme(path: str) -> str:
    """Bare local path for os.path/shutil from any authority-less file
    URI form — 'file:/p', 'file://p', and 'file:///p' all mean '/p'.
    Handling only the double-slash form would leave 'file:/p' intact,
    and os.path.exists on that string is constant-False: the store
    would silently read as 'first batch' forever (every new-vs-old
    pair dropped). URIs with a non-empty authority (file://host/p)
    are not local and are not supported here."""
    if not path.startswith("file:"):
        return path
    return "/" + path[len("file:"):].lstrip("/")


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Path existence via the session's Hadoop FileSystem — correct for
    hdfs:// / s3a:// / file:// alike (os.path.exists is silently False
    for any non-local store)."""
    if _is_local_path(path):
        return os.path.exists(_strip_file_scheme(path))
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs.exists(jpath)


def _recover_band_store(state_dir: str) -> None:
    """Finish an interrupted compact_band_store swap, if one is pending.

    The swap is write-aside (`.compact`) -> move(store, `.old`) ->
    move(`.compact`, store) -> rmtree(`.old`). A crash between the moves
    leaves the store dir absent with the finished `.compact` (and/or the
    `.old` copy) on disk; completing the swap here makes the sequence
    effectively atomic for any later reader. Called by foreach_batch_dedup
    before every store read, so a crashed compaction can never be
    mistaken for 'first batch' (which would silently drop every
    new-vs-old pair)."""
    # os.path/shutil need the bare local path — a file:// URI (accepted
    # by _is_local_path) would make every exists() here silently False
    state_dir = _strip_file_scheme(state_dir)
    tmp = state_dir.rstrip("/") + ".compact"
    old = state_dir.rstrip("/") + ".old"
    if not os.path.exists(state_dir):
        if os.path.exists(tmp):
            shutil.move(tmp, state_dir)  # swap had finished writing aside
        elif os.path.exists(old):
            shutil.move(old, state_dir)  # crashed before write-aside move
    if os.path.exists(state_dir) and os.path.exists(old):
        shutil.rmtree(old)  # crashed after the swap, before cleanup


def compact_band_store(
    spark: SparkSession, state_dir: str, files_per_partition: int = 8
):
    """Compact the accumulated LSH band store: foreach_batch_dedup writes
    one batch_id partition per micro-batch, so a long-running stream
    degrades the new-vs-old equi-join into a many-small-files scan.
    Fold every COMMITTED batch (batch_id < latest) into a single merged
    partition (batch_id = -1), hash-distributed on the (band, bucket)
    join key. The LATEST partition is kept as-is: it is the only batch
    foreachBatch can replay, and a replay must still overwrite exactly
    its own partition.

    Run with the stream STOPPED (or between triggers): the swap is
    write-aside + two directory moves, and a crash at any point is
    repaired by `_recover_band_store`, which foreach_batch_dedup invokes
    before every store read — so a reader never observes the mid-swap
    missing-dir state as an empty store.

    Local filesystems only (the swap/recovery use directory renames):
    on hdfs://s3a:// stores, compact by rewriting to a NEW state_dir and
    repointing the stream instead."""
    if not _is_local_path(state_dir):
        raise NotImplementedError(
            "compact_band_store swaps directories locally; for a remote "
            "store, rewrite into a new state_dir and repoint the stream"
        )
    state_dir = _strip_file_scheme(state_dir)  # bare path for shutil
    _recover_band_store(state_dir)
    store = spark.read.parquet(state_dir)
    latest = store.agg(F.max("batch_id")).first()[0]
    folded = store.where(F.col("batch_id") < latest).withColumn(
        "batch_id", F.lit(-1)
    )
    keep = store.where(F.col("batch_id") == latest)
    n_files = max(1, folded.rdd.getNumPartitions() // files_per_partition)
    merged = folded.repartition(
        n_files, F.col("band"), F.col("bucket")
    ).unionByName(keep)
    tmp = state_dir.rstrip("/") + ".compact"
    merged.write.mode("overwrite").partitionBy("batch_id").parquet(tmp)
    old = state_dir.rstrip("/") + ".old"
    shutil.move(state_dir, old)
    shutil.move(tmp, state_dir)
    shutil.rmtree(old)
    return spark.read.parquet(state_dir)


def catalog_stream_sink(catalog, table: str, transform=None,
                        stream_id: str = "stream"):
    """foreachBatch process function committing each micro-batch as an
    append SNAPSHOT to an IcebergishCatalog table — the streaming side
    of the north_rule's Iceberg checkpointing.

    Strictly better than `.write.mode("append").parquet(...)` under
    failure: a batch that crashes mid-write leaves only an unreferenced
    data dir (never partial rows visible), and a batch REPLAYED after a
    restart is detected via the per-stream high-water mark in snapshot
    properties and skipped — append becomes idempotent, i.e.
    end-to-end exactly-once into the table.

    Robustness of the watermark:

    - it is keyed ``last_batch_id:<stream_id>``, so maintenance commits
      to the same table (compaction, backfills) or OTHER streams can
      never clobber it;
    - it is read as the max over ALL retained snapshots, not just the
      current one — an interleaved non-sink commit between batch N and
      a replay of batch N still dedups;
    - only ``batch_id == watermark`` is treated as a replay (Spark can
      only re-deliver the last uncommitted batch). ``batch_id <
      watermark`` means the stream was restarted with a FRESH
      checkpointLocation against an old table — that raises instead of
      silently dropping every new batch; pass a new `stream_id` (or a
      new table) for a genuinely new stream.

    :param transform: optional batch_df -> DataFrame stage (e.g. the
        blocking+resolve lift in foreach_batch_linker) applied before
        the commit.
    """
    prop = f"last_batch_id:{stream_id}"

    def watermark() -> int | None:
        if not catalog.exists(table):
            return None
        vals = [
            int(s["properties"][prop])
            for s in catalog._load_metadata(table)["snapshots"]
            if prop in s.get("properties", {})
        ]
        return max(vals) if vals else None

    def process(batch_df: DataFrame, batch_id: int) -> None:
        last = watermark()
        if last is not None:
            if batch_id == last:
                return  # replay of the already-committed batch
            if batch_id < last:
                raise ValueError(
                    f"catalog_stream_sink[{stream_id}] on {table!r}: "
                    f"batch {batch_id} < committed watermark {last} — "
                    "the stream checkpoint was reset against an "
                    "existing table; use a fresh stream_id or table"
                )
        out = transform(batch_df) if transform is not None else batch_df
        catalog.commit(
            table, out, mode="append", properties={prop: str(batch_id)},
        )

    return process


def catalog_cluster_sink(catalog, table: str, edges_of,
                         stream_id: str = "cc"):
    """foreachBatch process function maintaining a RUNNING connected-
    components assignment in a catalog table — streaming transitive
    clustering (north_rule §2.7, micro-batch form).

    Per batch: `edges_of(batch_df) -> (src, dst)` merge edges;
    `incremental_components` folds them into the previous assignment
    (star-shaped history + new edges, closure-equal to full CC over
    everything ever seen); the result OVERWRITES the table as a new
    snapshot. Replays dedup via the same per-stream watermark as
    catalog_stream_sink — and because the assignment commit is a whole
    snapshot (not an append), a replayed batch recomputing the same
    closure is idempotent by value as well. Old assignments stay
    time-travelable until expired.
    """
    from hamerkop_spark.operators.cc import incremental_components

    prop = f"last_batch_id:{stream_id}"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists(table):
            snaps = catalog._load_metadata(table)["snapshots"]
            marks = [
                int(s["properties"][prop])
                for s in snaps
                if prop in s.get("properties", {})
            ]
            last = max(marks) if marks else None
            if last is not None:
                if batch_id == last:
                    return  # replay of the already-committed batch
                if batch_id < last:
                    # same semantics as catalog_stream_sink: a reset
                    # checkpoint must ERROR, not silently drop edges
                    raise ValueError(
                        f"catalog_cluster_sink[{stream_id}] on {table!r}: "
                        f"batch {batch_id} < committed watermark {last} — "
                        "the stream checkpoint was reset against an "
                        "existing table; use a fresh stream_id or table"
                    )
            prev = catalog.read(table)
        else:
            prev = None
        edges = edges_of(batch_df)
        if prev is not None:
            assign = incremental_components(prev, edges)
        else:
            from hamerkop_spark.operators.cc import connected_components

            assign = connected_components(edges)
        catalog.commit(
            table, assign, mode="overwrite", properties={prop: str(batch_id)},
        )

    return process
