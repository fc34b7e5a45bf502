"""Structured Streaming paths: streaming ingest preserves the extraction
invariant; watermarked windows aggregate; stateful sessionization."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.schemas import PAGES
from hamerkop_spark.sources.web import wrap_text_as_html
from hamerkop_spark.streaming import incremental as S


@pytest.fixture()
def pages_dir(spark, tmp_path):
    ts = datetime.datetime(2025, 1, 1)
    rows = [
        (
            f"http://x/{i}",
            ts + datetime.timedelta(minutes=30 * i),
            bytearray(wrap_text_as_html(f"doc {i} body", f"http://x/{i}")),
            f"doc {i} body",
            "eng",
        )
        for i in range(6)
    ]
    d = str(tmp_path / "pages")
    spark.createDataFrame(rows, PAGES).write.parquet(d)
    return d


def run_stream(df, spark, name, output_mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_documents_invariant(spark, pages_dir):
    docs = S.stream_documents(spark, pages_dir)
    out = run_stream(docs, spark, "docs_stream")
    rows = out.collect()
    assert len(rows) == 6
    assert all(r["extracted_text"] == r["text"] for r in rows)


def test_windowed_counts(spark, pages_dir):
    docs = S.stream_documents(spark, pages_dir)
    win = S.windowed_mention_counts(docs, window="1 hour", watermark="2 hours")
    # complete mode for the memory sink: append-mode window results only
    # emit on the batch AFTER the watermark passes, and availableNow runs
    # a single batch
    out = run_stream(win, spark, "win_stream", output_mode="complete")
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == 6
    # 6 pages at 30-min spacing span three 1-hour windows
    assert len(rows) == 3


def test_sessionize_events(spark, tmp_path):
    base = datetime.datetime(2025, 3, 1, 12, 0, 0)
    rows = []
    # user 1: two sessions separated by a 2-hour gap
    for m in (0, 5, 10):
        rows.append((1, base + datetime.timedelta(minutes=m)))
    for m in (180, 185):
        rows.append((1, base + datetime.timedelta(minutes=m)))
    # user 2: one session
    rows.append((2, base,))
    d = str(tmp_path / "events")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(d)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(d)
    sessions = S.sessionize_events(stream)
    out = run_stream(sessions, spark, "sess_stream")
    rows = out.collect()
    # the closed session (user 1, first 3 events) must be emitted; the
    # still-open sessions are held in state awaiting timeout
    closed = [(r["user_id"], r["n_events"]) for r in rows]
    assert (1, 3) in closed


def test_foreach_batch_linker(spark, tmp_path):
    ts = datetime.datetime(2025, 1, 1)
    # pages whose full text equals a KB name -> exact block hit
    rows = [
        ("http://x/1", ts, bytearray(wrap_text_as_html("John Smith", "u")),
         "John Smith", "eng"),
        ("http://x/2", ts, bytearray(wrap_text_as_html("nobody here", "u")),
         "nobody here", "eng"),
    ]
    pages_d = str(tmp_path / "p")
    spark.createDataFrame(rows, PAGES).write.parquet(pages_d)
    kb_names = spark.createDataFrame(
        [("E1", "PER", "john smith", 0, "john smith")],
        "entity_id string, type string, name string, name_idx int, exact_key string",
    )
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    docs = S.stream_documents(spark, pages_d)
    q = S.foreach_batch_linker(docs, kb_names, sink, ckpt).start()
    q.awaitTermination(120)
    got = spark.read.parquet(sink).collect()
    assert [(r["doc_id"], r["entity_id"]) for r in got] == [("http://x/1", "E1")]
    # exactly-once: restarting with the same checkpoint adds nothing
    q2 = S.foreach_batch_linker(
        S.stream_documents(spark, pages_d), kb_names, sink, ckpt
    ).start()
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 1


def test_foreach_batch_dedup_incremental(spark, tmp_path):
    """Incremental MinHash dedup: batch 2 documents pair with near-dups
    from batch 1 through the accumulated band store — without re-reading
    batch 1's text."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the quiet green forest tonight")
    ts = datetime.datetime(2025, 1, 1)

    def page(i, text):
        return (
            f"http://x/{i}", ts, bytearray(wrap_text_as_html(text, f"http://x/{i}")),
            text, "eng",
        )

    d = str(tmp_path / "stream_in")
    os.makedirs(d)
    state = str(tmp_path / "state")
    sink = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = S.stream_documents(spark, d)
        q = S.foreach_batch_dedup(
            stream, state, sink, ckpt, max_bucket=50
        ).start()
        q.awaitTermination(120)

    # batch 1: two near-dups + one unrelated
    spark.createDataFrame(
        [page(0, base), page(1, base + " extra"), page(2, "completely different text " * 6)],
        PAGES,
    ).write.mode("append").parquet(d)
    run_once()
    got1 = {tuple(sorted((r["src"], r["dst"])))
            for r in spark.read.parquet(sink).collect()}
    assert ("http://x/0", "http://x/1") in got1
    assert not any("http://x/2" in p for pair in got1 for p in pair)

    # batch 2: a near-dup of batch 1's docs arrives later
    spark.createDataFrame([page(3, base + " again")], PAGES).write.mode(
        "append"
    ).parquet(d)
    run_once()
    got2 = {tuple(sorted((r["src"], r["dst"])))
            for r in spark.read.parquet(sink).collect()}
    assert ("http://x/0", "http://x/3") in got2 or (
        "http://x/1", "http://x/3"
    ) in got2


def test_compact_band_store_preserves_dedup(spark, tmp_path):
    """Compaction rewrites the band store into fewer files without
    changing its content: a post-compaction batch still pairs with
    pre-compaction documents."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the quiet green forest tonight")
    ts = datetime.datetime(2025, 1, 1)

    def page(i, text):
        return (
            f"http://y/{i}", ts, bytearray(wrap_text_as_html(text, f"http://y/{i}")),
            text, "eng",
        )

    d = str(tmp_path / "in")
    os.makedirs(d)
    state = str(tmp_path / "state")
    sink = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = S.foreach_batch_dedup(
            S.stream_documents(spark, d), state, sink, ckpt, max_bucket=50
        ).start()
        q.awaitTermination(120)

    spark.createDataFrame([page(0, base)], PAGES).write.mode("append").parquet(d)
    run_once()
    before = spark.read.parquet(state).count()
    S.compact_band_store(spark, state, files_per_partition=64)
    assert spark.read.parquet(state).count() == before

    spark.createDataFrame([page(1, base + " tail")], PAGES).write.mode(
        "append"
    ).parquet(d)
    run_once()
    got = {tuple(sorted((r["src"], r["dst"])))
           for r in spark.read.parquet(sink).collect()}
    assert ("http://y/0", "http://y/1") in got


def test_foreach_batch_dedup_global_bucket_cap(spark, tmp_path):
    """The max_bucket cap counts store + batch: a boilerplate bucket that
    crosses the cap across batches stops producing pairs (the batch
    twin's global-drop rule, read incrementally)."""
    boiler = "exact same boilerplate text repeated for every page " * 3
    ts = datetime.datetime(2025, 1, 1)

    def page(i):
        return (
            f"http://z/{i}", ts, bytearray(wrap_text_as_html(boiler, f"http://z/{i}")),
            boiler, "eng",
        )

    d = str(tmp_path / "in")
    os.makedirs(d)
    state, sink, ckpt = (str(tmp_path / x) for x in ("state", "pairs", "ckpt"))

    def run_once():
        q = S.foreach_batch_dedup(
            S.stream_documents(spark, d), state, sink, ckpt, max_bucket=3
        ).start()
        q.awaitTermination(120)

    # batch 1: 3 identical docs -> bucket size 3 <= cap -> 3 pairs
    spark.createDataFrame([page(i) for i in range(3)], PAGES).write.mode(
        "append"
    ).parquet(d)
    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 == 3

    # batch 2: 2 more of the same template -> total 5 > cap -> bucket
    # dropped, NO new pairs (neither new-new nor new-old)
    spark.createDataFrame([page(i) for i in (3, 4)], PAGES).write.mode(
        "append"
    ).parquet(d)
    run_once()
    assert spark.read.parquet(sink).count() == n1


def test_catalog_stream_sink_exactly_once(spark, tmp_path, pages_dir):
    """Each micro-batch becomes an append snapshot; a replayed batch id
    is skipped (idempotent), and mid-write crashes can never leave
    partial rows visible (atomic snapshot commit)."""
    from hamerkop_spark.sources.catalog import IcebergishCatalog

    cat = IcebergishCatalog(spark, str(tmp_path / "wh"))
    process = S.catalog_stream_sink(
        cat, "docs", transform=lambda b: b.select("url", "text")
    )
    docs = S.stream_documents(spark, pages_dir)
    q = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert cat.read("docs").count() == 6
    n_snaps = len(cat.history("docs"))
    last_bid = int(
        cat.current_snapshot("docs")["properties"]["last_batch_id:stream"]
    )

    # simulate a foreachBatch REPLAY of the last committed batch
    replay = spark.createDataFrame(
        [("http://x/999", "dup body")], "url string, text string"
    )
    process(replay, last_bid)
    assert cat.read("docs").count() == 6  # skipped, no duplicates
    assert len(cat.history("docs")) == n_snaps

    # an interleaved maintenance commit must not clobber the watermark
    cat.commit(
        "docs",
        spark.createDataFrame([("http://x/m", "maint")], "url string, text string"),
        mode="append",
    )
    process(replay, last_bid)
    assert cat.read("docs").count() == 7  # still deduped (6 + maint row)

    # a genuinely NEW batch appends one snapshot
    process(replay, last_bid + 1)
    assert cat.read("docs").count() == 8

    # a RESET checkpoint (batch ids restart below the watermark) raises
    # instead of silently dropping data
    with pytest.raises(ValueError, match="watermark"):
        process(replay, 0 if last_bid > 0 else -1)

    # ...but a different stream_id is a fresh watermark namespace
    p2 = S.catalog_stream_sink(
        cat, "docs", transform=lambda b: b.select("url", "text"),
        stream_id="s2",
    )
    p2(replay, 0)
    assert cat.read("docs").count() == 9


def test_catalog_cluster_sink_running_assignment(spark, tmp_path):
    """Micro-batched edges accumulate into one closure-correct running
    assignment snapshot; replays are no-ops."""
    from hamerkop_spark.operators.cc import connected_components
    from hamerkop_spark.sources.catalog import IcebergishCatalog

    cat = IcebergishCatalog(spark, str(tmp_path / "wh"))

    def edges_of(batch_df):
        return batch_df.select("src", "dst")

    process = S.catalog_cluster_sink(cat, "clusters", edges_of)
    b0 = spark.createDataFrame([("a", "b"), ("c", "d")], "src string, dst string")
    b1 = spark.createDataFrame([("b", "c"), ("e", "f")], "src string, dst string")
    process(b0, 0)
    process(b1, 1)
    got = {r["node"]: r["component"] for r in cat.read("clusters").collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "e"}
    # replay of batch 1: assignment snapshot count unchanged
    n = len(cat.history("clusters"))
    process(b1, 1)
    assert len(cat.history("clusters")) == n
    # equals one-shot closure over everything
    full = connected_components(
        b0.unionByName(b1)
    )
    assert {r["node"]: r["component"] for r in full.collect()} == got


def test_recover_band_store_finishes_interrupted_swap(spark, tmp_path):
    """ADVICE r2: a crash between compact_band_store's two directory
    moves must not be read as 'first batch' — _recover_band_store
    completes the swap from any crash point."""
    import shutil

    import hamerkop_spark.streaming.incremental as S

    state = str(tmp_path / "state")
    df = spark.createDataFrame(
        [(0, 1, "d1", 0), (0, 1, "d2", 1)],
        "band int, bucket long, _id string, batch_id int",
    )
    df.write.partitionBy("batch_id").parquet(state)
    expect = sorted(map(tuple, spark.read.parquet(state).collect()))

    # crash point A: after move(state, .old), before move(.compact, state)
    shutil.copytree(state, state + ".compact")
    shutil.move(state, state + ".old")
    S._recover_band_store(state)
    assert sorted(map(tuple, spark.read.parquet(state).collect())) == expect
    assert not os.path.exists(state + ".old")
    assert not os.path.exists(state + ".compact")

    # crash point B: .old moved away but write-aside never finished
    shutil.move(state, state + ".old")
    S._recover_band_store(state)
    assert sorted(map(tuple, spark.read.parquet(state).collect())) == expect

    # crash point C: swap done, cleanup of .old missed
    shutil.copytree(state, state + ".old")
    S._recover_band_store(state)
    assert os.path.exists(state) and not os.path.exists(state + ".old")


def test_fs_exists_and_remote_compact_guard(spark, tmp_path):
    """Review fix: store existence goes through the Hadoop FS API (so
    remote stores resolve truthfully); directory-rename compaction
    refuses non-local stores instead of silently misbehaving."""
    import pytest

    import hamerkop_spark.streaming.incremental as S

    p = str(tmp_path / "x")
    assert not S._fs_exists(spark, p)
    os.makedirs(p)
    assert S._fs_exists(spark, p)
    assert S._fs_exists(spark, "file://" + p)
    with pytest.raises(NotImplementedError):
        S.compact_band_store(spark, "hdfs://nn/some/store")


def test_strip_file_scheme_all_local_uri_forms(spark, tmp_path):
    """Review r4: 'file:/p' (single slash) is as valid as 'file://p' and
    'file:///p' — all three must resolve to the bare path, and
    _fs_exists must see a real directory through every form (a missed
    form reads as 'first batch' forever and silently drops every
    new-vs-old pair)."""
    from hamerkop_spark.streaming.incremental import (
        _fs_exists, _is_local_path, _strip_file_scheme,
    )

    d = str(tmp_path / "store")
    import os
    os.makedirs(d)
    for form in (d, f"file:{d}", f"file://{d}", f"file:///{d.lstrip('/')}"):
        assert _is_local_path(form), form
        assert _strip_file_scheme(form) == d, form
        assert _fs_exists(spark, form), form
    assert _strip_file_scheme("s3a://bucket/x") == "s3a://bucket/x"
    assert not _is_local_path("s3a://bucket/x")


def test_sessionize_multi_chunk_out_of_order(spark, tmp_path):
    """Review r4: a group spanning several Arrow chunks must be sorted
    ACROSS chunks — with maxRecordsPerBatch=1 and events written in the
    order [60min, 0min, 120min], a per-chunk sort feeds the gap logic a
    backwards timestamp and merges the first two events into one
    session; the global sort yields two CLOSED single-event sessions."""
    import datetime

    base = datetime.datetime(2025, 3, 1, 12, 0, 0)
    rows = [(1, base + datetime.timedelta(minutes=m)) for m in (60, 0, 120)]
    d = str(tmp_path / "events")
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1) \
        .write.parquet(d)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(d)
        out = run_stream(S.sessionize_events(stream), spark, "sess_chunk")
        got = sorted(
            (r["session_start"], r["n_events"]) for r in out.collect()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    # events at 0 and 60 min must close as SEPARATE single-event
    # sessions (the per-chunk-sort bug merged them into one n=2
    # session starting at 60min); the 120-min session may or may not
    # have been flushed by the processing-time timeout
    assert (base, 1) in got
    assert (base + datetime.timedelta(minutes=60), 1) in got
    assert all(n == 1 for _, n in got)


def test_foreach_batch_linker_replay_idempotent(spark, tmp_path):
    """Review r4: foreachBatch is at-least-once — re-delivering batch 0
    (fresh checkpoint, same sink) must REWRITE its batch_id partition,
    not append duplicate decision rows."""
    import datetime

    ts = datetime.datetime(2025, 1, 1)
    rows = [("http://x/1", ts,
             bytearray(wrap_text_as_html("John Smith", "u")),
             "John Smith", "eng")]
    pages_d = str(tmp_path / "p")
    spark.createDataFrame(rows, PAGES).write.parquet(pages_d)
    kb_names = spark.createDataFrame(
        [("E1", "PER", "john smith", 0, "john smith")],
        "entity_id string, type string, name string, name_idx int, "
        "exact_key string",
    )
    sink = str(tmp_path / "sink")
    for attempt in ("ckpt_a", "ckpt_b"):  # second run replays batch 0
        docs = S.stream_documents(spark, pages_d)
        q = S.foreach_batch_linker(
            docs, kb_names, sink, str(tmp_path / attempt)
        ).start()
        q.awaitTermination(120)
    got = spark.read.parquet(sink).collect()
    assert [(r["doc_id"], r["entity_id"]) for r in got] == [
        ("http://x/1", "E1")
    ]


def test_foreach_batch_dedup_auto_compaction(spark, tmp_path):
    """compact_every=2 folds the store inside the stream: after batch 2
    the committed batches live in one batch_id=-1 partition, the latest
    batch keeps its own partition (replay contract), and cross-batch
    pairs keep landing exactly as without compaction."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the quiet green forest tonight")
    ts = datetime.datetime(2025, 1, 1)

    def page(i, text):
        return (
            f"http://z/{i}", ts,
            bytearray(wrap_text_as_html(text, f"http://z/{i}")),
            text, "eng",
        )

    d = str(tmp_path / "in")
    os.makedirs(d)
    state = str(tmp_path / "state")
    sink = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = S.foreach_batch_dedup(
            S.stream_documents(spark, d), state, sink, ckpt,
            max_bucket=50, compact_every=2,
        ).start()
        q.awaitTermination(120)

    # batches 0,1,2: one doc each, all near-dups of the first
    for i, text in enumerate([base, base + " tail", base + " again"]):
        spark.createDataFrame([page(i, text)], PAGES).write.mode(
            "append"
        ).parquet(d)
        run_once()

    import pyspark.sql.functions as F
    batch_ids = sorted(
        r["batch_id"]
        for r in spark.read.parquet(state).select("batch_id")
        .distinct().collect()
    )
    # compaction fired at batch_id=2: batches 0,1 folded into -1,
    # batch 2 kept as the replayable latest
    assert batch_ids == [-1, 2]

    got = {tuple(sorted((r["src"], r["dst"])))
           for r in spark.read.parquet(sink).collect()}
    assert ("http://z/0", "http://z/1") in got
    assert ("http://z/0", "http://z/2") in got or (
        "http://z/1", "http://z/2") in got

    # a post-compaction batch still pairs against the folded store
    spark.createDataFrame([page(3, base + " more")], PAGES).write.mode(
        "append"
    ).parquet(d)
    run_once()
    got2 = {tuple(sorted((r["src"], r["dst"])))
            for r in spark.read.parquet(sink).collect()}
    assert any(
        "http://z/3" in pair and any(f"http://z/{i}" in pair
                                     for i in (0, 1, 2))
        for pair in got2
    )


def test_foreach_batch_dedup_compact_every_guards(spark, tmp_path):
    import pytest

    d = str(tmp_path / "nothing")
    os.makedirs(d)
    stream = S.stream_documents(spark, d)
    with pytest.raises(ValueError):
        S.foreach_batch_dedup(stream, str(tmp_path / "s"),
                              str(tmp_path / "p"), str(tmp_path / "c"),
                              compact_every=1)
    with pytest.raises(NotImplementedError):
        S.foreach_batch_dedup(stream, "hdfs://nn/store",
                              str(tmp_path / "p2"), str(tmp_path / "c2"),
                              compact_every=4)


def test_foreach_batch_one_to_one_linker(spark, tmp_path):
    """Across the stream each KB entity links at most once: within a
    batch the better chain wins; later batches cannot re-claim."""
    ts = datetime.datetime(2025, 1, 1)

    def page(i, text):
        return (
            f"http://x/{i}", ts,
            bytearray(wrap_text_as_html(text, f"http://x/{i}")), text, "eng",
        )

    kb_names = spark.createDataFrame(
        [
            ("E1", "PER", "John Smith", 0, "john smith"),
            ("E2", "PER", "Mary Jones", 0, "mary jones"),
            ("E3", "PER", "Bob Brown", 0, "bob brown"),
        ],
        "entity_id string, type string, name string, name_idx int, exact_key string",
    )
    d = str(tmp_path / "in")
    os.makedirs(d)
    state = str(tmp_path / "claimed")
    sink = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = S.foreach_batch_one_to_one_linker(
            S.stream_documents(spark, d), kb_names, state, sink, ckpt
        ).start()
        q.awaitTermination(120)

    # batch 1: docs 1 and 2 both name E1 (tie -> chain_id asc wins),
    # doc 3 names E2
    spark.createDataFrame(
        [page(1, "John Smith"), page(2, "John Smith"), page(3, "Mary Jones")],
        PAGES,
    ).write.mode("append").parquet(d)
    run_once()
    got1 = {(r["chain_id"], r["entity_id"])
            for r in spark.read.parquet(sink).collect()}
    assert got1 == {("http://x/1", "E1"), ("http://x/3", "E2")}

    # batch 2: E1 is already claimed -> doc 4 stays NIL; doc 5 takes E3
    spark.createDataFrame(
        [page(4, "John Smith"), page(5, "Bob Brown")], PAGES
    ).write.mode("append").parquet(d)
    run_once()
    got2 = {(r["chain_id"], r["entity_id"])
            for r in spark.read.parquet(sink).collect()}
    assert got2 == got1 | {("http://x/5", "E3")}
    # the claimed store holds exactly the three assigned entities
    claimed = {r["entity_id"] for r in spark.read.parquet(state).collect()}
    assert claimed == {"E1", "E2", "E3"}

    # exactly-once: restart with the same checkpoint adds nothing
    run_once()
    assert spark.read.parquet(sink).count() == 3


def test_one_to_one_linker_replay_idempotent(spark, tmp_path):
    """Replaying batch 0 (fresh checkpoint, same sink AND claimed
    store) must re-derive the same pool — its own prior claims are
    invisible (store read excludes batch_id >= current) — and rewrite
    identical partitions rather than NIL-ing everything or duplicating."""
    import datetime

    ts = datetime.datetime(2025, 1, 1)
    rows = [("http://x/1", ts,
             bytearray(wrap_text_as_html("John Smith", "u")),
             "John Smith", "eng")]
    pages_d = str(tmp_path / "p")
    spark.createDataFrame(rows, PAGES).write.parquet(pages_d)
    kb_names = spark.createDataFrame(
        [("E1", "PER", "john smith", 0, "john smith")],
        "entity_id string, type string, name string, name_idx int, "
        "exact_key string",
    )
    state = str(tmp_path / "claimed")
    sink = str(tmp_path / "sink")
    for attempt in ("ckpt_a", "ckpt_b"):  # second run replays batch 0
        q = S.foreach_batch_one_to_one_linker(
            S.stream_documents(spark, pages_d), kb_names, state, sink,
            str(tmp_path / attempt),
        ).start()
        q.awaitTermination(120)
    got = spark.read.parquet(sink).collect()
    # the replay must NOT see batch 0's own claim and emit nothing
    assert [(r["chain_id"], r["entity_id"]) for r in got] == [
        ("http://x/1", "E1")
    ]
    assert spark.read.parquet(state).count() == 1


def test_one_to_one_linker_survives_empty_batch(spark, tmp_path):
    """A batch with zero KB hits writes an empty (footer-less) store
    partition; the NEXT batch must still read the store (explicit
    schema, not inference) and link normally."""
    import datetime

    ts = datetime.datetime(2025, 1, 1)

    def page(i, text):
        return (
            f"http://x/{i}", ts,
            bytearray(wrap_text_as_html(text, f"http://x/{i}")), text, "eng",
        )

    kb_names = spark.createDataFrame(
        [("E1", "PER", "John Smith", 0, "john smith")],
        "entity_id string, type string, name string, name_idx int, "
        "exact_key string",
    )
    d = str(tmp_path / "in")
    os.makedirs(d)
    state = str(tmp_path / "claimed")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = S.foreach_batch_one_to_one_linker(
            S.stream_documents(spark, d), kb_names, state, sink, ckpt
        ).start()
        q.awaitTermination(120)

    # batch 0: nothing matches the KB -> empty store partition
    spark.createDataFrame([page(1, "nobody here")], PAGES).write.mode(
        "append"
    ).parquet(d)
    run_once()
    # batch 1: must not crash on the footer-less store and must link
    spark.createDataFrame([page(2, "John Smith")], PAGES).write.mode(
        "append"
    ).parquet(d)
    run_once()
    got = {(r["chain_id"], r["entity_id"])
           for r in spark.read.parquet(sink).collect()}
    assert got == {("http://x/2", "E1")}
