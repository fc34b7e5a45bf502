"""IcebergishCatalog: snapshot commits, atomic visibility, time travel,
rollback, expiry, schema checks, partition pruning, and the StageRunner
catalog backend (resume + fingerprint invalidation through snapshots)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.sources.catalog import (
    IcebergishCatalog,
    SchemaMismatch,
    SnapshotNotFound,
)


def rows(df, *cols):
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def cat(spark, tmp_path):
    return IcebergishCatalog(spark, str(tmp_path / "warehouse"))


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "k int, v string")


def test_commit_read_roundtrip(spark, cat):
    cat.commit("t", _df(spark, [(1, "a"), (2, "b")]))
    assert rows(cat.read("t")) == [(1, "a"), (2, "b")]
    assert cat.tables() == ["t"]
    assert cat.exists("t") and not cat.exists("nope")


def test_append_is_metadata_only_and_overwrite_replaces(spark, cat):
    s1 = cat.commit("t", _df(spark, [(1, "a")]))
    s2 = cat.commit("t", _df(spark, [(2, "b")]), mode="append")
    assert rows(cat.read("t")) == [(1, "a"), (2, "b")]
    # append reuses snapshot 1's data dir by reference
    snap = cat.current_snapshot("t")
    assert len(snap["data_dirs"]) == 2
    assert f"snap-{s1:06d}" in snap["data_dirs"][0]
    s3 = cat.commit("t", _df(spark, [(9, "z")]))
    assert rows(cat.read("t")) == [(9, "z")]
    assert [h["snapshot_id"] for h in cat.history("t")] == [s1, s2, s3]


def test_time_travel_and_rollback(spark, cat):
    s1 = cat.commit("t", _df(spark, [(1, "a")]))
    s2 = cat.commit("t", _df(spark, [(2, "b")]), mode="append")
    assert rows(cat.read("t", snapshot_id=s1)) == [(1, "a")]
    assert rows(cat.read("t", snapshot_id=s2)) == [(1, "a"), (2, "b")]
    cat.rollback("t", s1)
    assert rows(cat.read("t")) == [(1, "a")]
    # rollback is pure metadata: s2 still time-travelable
    assert rows(cat.read("t", snapshot_id=s2)) == [(1, "a"), (2, "b")]
    with pytest.raises(SnapshotNotFound):
        cat.rollback("t", 99)


def test_atomic_visibility_crash_before_hint_flip(spark, cat):
    """A writer that dies after writing data+metadata but before the
    hint flip leaves the old snapshot fully intact and visible."""
    cat.commit("t", _df(spark, [(1, "a")]))
    # simulate the crash: write orphan data dir + orphan metadata json,
    # but never touch version-hint.text
    tpath = os.path.join(cat.warehouse, "t")
    _df(spark, [(666, "evil")]).write.parquet(
        os.path.join(tpath, "data", "snap-000666")
    )
    with open(os.path.join(tpath, "metadata", "v99.metadata.json"), "w") as fh:
        json.dump({"garbage": True}, fh)
    assert rows(cat.read("t")) == [(1, "a")]
    # and the next real commit still works
    cat.commit("t", _df(spark, [(2, "b")]), mode="append")
    assert rows(cat.read("t")) == [(1, "a"), (2, "b")]


def test_append_schema_mismatch_raises(spark, cat):
    cat.commit("t", _df(spark, [(1, "a")]))
    bad = spark.createDataFrame([(1.5, "a")], "k double, v string")
    with pytest.raises(SchemaMismatch):
        cat.commit("t", bad, mode="append")
    # overwrite may change the schema
    cat.commit("t", bad)
    assert cat._load_metadata("t")["schema"]["fields"][0]["type"] == "double"


def test_expire_snapshots_keeps_current_and_deletes_orphans(spark, cat):
    import glob

    s1 = cat.commit("t", _df(spark, [(1, "a")]))
    s2 = cat.commit("t", _df(spark, [(2, "b")]))  # overwrite: s1 dir now orphanable
    s3 = cat.commit("t", _df(spark, [(3, "c")]), mode="append")
    expired = cat.expire_snapshots("t", keep_last=2)
    assert expired == [s1]
    assert [h["snapshot_id"] for h in cat.history("t")] == [s2, s3]
    # s1's data dir is gone, s2's survives (referenced by s3 via append)
    tpath = os.path.join(cat.warehouse, "t", "data")
    assert glob.glob(os.path.join(tpath, f"snap-{s1:06d}-*")) == []
    assert glob.glob(os.path.join(tpath, f"snap-{s2:06d}-*"))
    assert rows(cat.read("t")) == [(2, "b"), (3, "c")]
    with pytest.raises(SnapshotNotFound):
        cat.read("t", snapshot_id=s1)
    # keep_last=0 keeps only the current snapshot (not a silent no-op)
    assert cat.expire_snapshots("t", keep_last=0) == [s2]
    assert [h["snapshot_id"] for h in cat.history("t")] == [s3]
    # s2's dir survives because current s3 references it via append
    assert rows(cat.read("t")) == [(2, "b"), (3, "c")]


def test_snapshot_summary_is_table_total_after_append(spark, cat):
    cat.commit("t", _df(spark, [(i, "x") for i in range(100)]))
    cat.commit("t", _df(spark, [(100, "y")]), mode="append")
    snap = cat.current_snapshot("t")
    assert snap["summary"]["rows"] == 101  # table total, not the delta
    assert snap["added"]["rows"] == 1
    assert cat.read("t").count() == 101


def test_commit_conflict_detected_and_loser_never_clobbers(spark, cat):
    from hamerkop_spark.sources.catalog import CommitConflict

    cat.commit("t", _df(spark, [(1, "a")]))
    # simulate a concurrent winner: somebody flipped v2 between our
    # metadata read and our write
    meta = cat._load_metadata("t")
    cat._write_metadata("t", meta)  # v2 now taken
    # rewind the hint so our commit targets v2 too
    with open(cat._hint_path("t"), "w") as fh:
        fh.write("1")
    with pytest.raises(CommitConflict):
        cat.commit("t", _df(spark, [(2, "b")]))
    # the winner's table is untouched
    with open(cat._hint_path("t"), "w") as fh:
        fh.write("2")
    assert rows(cat.read("t")) == [(1, "a")]


def test_append_nested_nullability_is_ignored(spark, cat):
    a = spark.createDataFrame([(1, "x")], "k int, v string").select(
        "k", F.struct(F.col("v").alias("s")).alias("nested")
    )
    cat.commit("t", a)
    # outer join makes the nested field nullable=true; append must accept
    b = (
        spark.createDataFrame([(2,)], "k int")
        .join(a.select("k", "nested"), "k", "left")
    )
    cat.commit("t", b, mode="append")
    assert cat.read("t").count() == 2


def test_partitioned_table_prunes(spark, cat):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "ru") for i in range(10)], "k int, lang string"
    )
    cat.commit("t", df, partition_by=["lang"])
    # append inherits the partition spec without restating it
    cat.commit(
        "t", spark.createDataFrame([(100, "en")], "k int, lang string"),
        mode="append",
    )
    got = cat.read("t").where(F.col("lang") == "en")
    assert got.count() == 6
    plan = got._jdf.queryExecution().executedPlan().toString()
    # partition column reached the scan as a partition filter, not a
    # post-scan Filter over data rows
    assert "PartitionFilters: [" in plan and "lang" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_stage_runner_catalog_backend(spark, tmp_path):
    from hamerkop_spark.plans.pipeline import StageRunner

    cat = IcebergishCatalog(spark, str(tmp_path / "wh"))
    calls = {"n": 0}

    def stage():
        calls["n"] += 1
        return _df(spark, [(1, "a")])

    r1 = StageRunner(spark, str(tmp_path / "wd"), resume=True, catalog=cat)
    out = r1.run("s", stage, params={"p": 1})
    assert rows(out) == [(1, "a")] and calls["n"] == 1
    tbl = r1._catalog_table("s")
    assert cat.current_snapshot(tbl)["properties"]["fingerprint"]

    # same params -> resume from snapshot, fn not called
    r2 = StageRunner(spark, str(tmp_path / "wd"), resume=True, catalog=cat)
    out = r2.run("s", stage, params={"p": 1})
    assert rows(out) == [(1, "a")] and calls["n"] == 1
    assert r2.metrics[0]["resumed"] is True

    # changed params -> fingerprint mismatch -> recompute as NEW snapshot,
    # the stale checkpoint stays time-travelable
    r3 = StageRunner(spark, str(tmp_path / "wd"), resume=True, catalog=cat)
    r3.run("s", stage, params={"p": 2})
    assert calls["n"] == 2
    assert len(cat.history(tbl)) == 2

    # a DIFFERENT workdir on the same warehouse is a different namespace:
    # it must not resume this workdir's checkpoint even with equal params
    r4 = StageRunner(spark, str(tmp_path / "wd2"), resume=True, catalog=cat)
    r4.run("s", stage, params={"p": 2})
    assert calls["n"] == 3
    assert r4._catalog_table("s") != tbl


def test_pipeline_end_to_end_on_catalog(spark, tmp_path):
    """The flagship pipeline runs unchanged on the catalog backend and
    resumes all stages from snapshots on the second run."""
    from hamerkop_spark.plans.pipeline import run_pipeline
    from hamerkop_spark.synth import make_corpus

    tables = make_corpus(spark, n_docs=20, seed=7)
    cat = IcebergishCatalog(spark, str(tmp_path / "wh"))
    res = run_pipeline(spark, tables, str(tmp_path / "wd"), catalog=cat)
    assert res["clusters"].count() > 0
    assert all(not m["resumed"] for m in res["metrics"])
    res2 = run_pipeline(spark, tables, str(tmp_path / "wd"), catalog=cat)
    assert all(m["resumed"] for m in res2["metrics"])
    assert rows(res2["clusters"]) == rows(res["clusters"])


def test_cleanup_orphans(spark, cat):
    cat.commit("t", _df(spark, [(1, "a")]))
    # a crashed/losing writer's dir: data written, never referenced
    _df(spark, [(9, "z")]).write.parquet(
        os.path.join(cat.warehouse, "t", "data", "snap-000099-deadbeef")
    )
    orphans = cat.cleanup_orphans("t")
    assert orphans == [os.path.join("data", "snap-000099-deadbeef")]
    assert rows(cat.read("t")) == [(1, "a")]
    assert cat.cleanup_orphans("t") == []


def test_streaming_linker_into_catalog(spark, tmp_path):
    """Composition: the micro-batch entity-linking lift (the
    foreach_batch_linker stage) as a catalog_stream_sink transform —
    streaming blocking+linking with exactly-once snapshot appends."""
    import datetime

    from hamerkop_spark.schemas import PAGES
    from hamerkop_spark.operators.blocking import exact_match_candidates
    from hamerkop_spark.sources.web import wrap_text_as_html
    from hamerkop_spark.streaming import incremental as S

    ts = datetime.datetime(2025, 1, 1)
    rows_in = [
        ("http://x/1", ts, bytearray(wrap_text_as_html("John Smith", "u")),
         "John Smith", "eng"),
        ("http://x/2", ts, bytearray(wrap_text_as_html("nobody here", "u")),
         "nobody here", "eng"),
    ]
    pages_d = str(tmp_path / "p")
    spark.createDataFrame(rows_in, PAGES).write.parquet(pages_d)
    kb_names = spark.createDataFrame(
        [("E1", "PER", "john smith", 0, "john smith")],
        "entity_id string, type string, name string, name_idx int, "
        "exact_key string",
    )

    def link(batch_df):
        chains = batch_df.select(
            F.col("url").alias("doc_id"), F.col("url").alias("chain_id"),
            F.lit("PER").alias("type"), F.col("text").alias("name"),
        )
        return exact_match_candidates(chains, kb_names)

    cat = IcebergishCatalog(spark, str(tmp_path / "wh"))
    process = S.catalog_stream_sink(cat, "decisions", transform=link)
    q = (
        S.stream_documents(spark, pages_d)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in 120s"
    got = cat.read("decisions").collect()
    assert [(r["doc_id"], r["entity_id"]) for r in got] == [("http://x/1", "E1")]


def test_tags_pin_snapshots_and_resolve_reads(spark, cat):
    s1 = cat.commit("t", _df(spark, [(1, "a")]))
    cat.tag("t", "blessed")  # defaults to current (s1)
    s2 = cat.commit("t", _df(spark, [(2, "b")]))
    s3 = cat.commit("t", _df(spark, [(3, "c")]))
    assert cat.tags("t") == {"blessed": s1}
    assert rows(cat.read("t", tag="blessed")) == [(1, "a")]
    # tagged snapshot survives expiry that would otherwise drop it
    expired = cat.expire_snapshots("t", keep_last=1)
    assert s1 not in expired and s2 in expired
    assert rows(cat.read("t", tag="blessed")) == [(1, "a")]
    # dropping the tag releases it
    cat.drop_tag("t", "blessed")
    assert cat.expire_snapshots("t", keep_last=1) == [s1]
    with pytest.raises(SnapshotNotFound):
        cat.read("t", tag="blessed")
    with pytest.raises(SnapshotNotFound):
        cat.tag("t", "x", snapshot_id=99)


def test_stream_watermark_survives_maintenance_and_expiry(spark, cat):
    """ADVICE r2: last_batch_id:* properties are inherited by every new
    snapshot, so a maintenance commit + expire_snapshots(keep_last=1)
    cannot erase the stream high-water mark (which would make a replayed
    micro-batch re-append as a duplicate)."""
    cat.commit("t", _df(spark, [(1, "a")]), mode="append",
               properties={"last_batch_id:s1": "7"})
    # maintenance commit with no properties of its own
    cat.commit("t", _df(spark, [(2, "b")]), mode="append")
    cat.expire_snapshots("t", keep_last=1)
    meta = cat._load_metadata("t")
    vals = [
        int(s["properties"]["last_batch_id:s1"])
        for s in meta["snapshots"]
        if "last_batch_id:s1" in s.get("properties", {})
    ]
    assert vals and max(vals) == 7
    # explicit property still overrides the inherited one
    cat.commit("t", _df(spark, [(3, "c")]), mode="append",
               properties={"last_batch_id:s1": "9"})
    cur = cat._snapshot(cat._load_metadata("t"), None)
    assert cur["properties"]["last_batch_id:s1"] == "9"


def test_compact_after_many_stream_batches(spark, cat):
    """VERDICT r2 item 10: 100 micro-batch appends (the stream-sink
    commit shape, each carrying its watermark) degrade the table into
    100 tiny data dirs; compact() folds the current snapshot into one
    dir with <= 1/10th the files, reads back identically, keeps the
    watermark, and older snapshots stay time-travelable until expiry."""
    for b in range(100):
        cat.commit(
            "t", _df(spark, [(b, "a"), (b, "b")]), mode="append",
            properties={"last_batch_id:s": str(b)},
        )
    before = cat.table_metrics("t")
    assert before["dirs"] == 100 and before["files"] >= 100
    expect = rows(cat.read("t"))
    stats = cat.compact("t")
    after = stats["after"]
    assert after["dirs"] == 1
    assert after["files"] <= before["files"] / 10
    assert rows(cat.read("t")) == expect
    assert after["rows"] == before["rows"] == 200
    # watermark survives the compaction commit
    cur = cat.current_snapshot("t")
    assert cur["properties"]["last_batch_id:s"] == "99"
    # pre-compaction snapshot still time-travelable
    assert len(rows(cat.read("t", snapshot_id=before["snapshot_id"]))) == 200
    # expiry reclaims the small dirs
    cat.expire_snapshots("t", keep_last=1)
    assert cat.table_metrics("t")["dirs"] == 1


def test_commit_from_stale_prior_conflicts_instead_of_clobbering(spark, cat):
    """Review fix: the commit CAS targets the version the writer's prior
    metadata was READ at — a writer racing an already-finished commit
    must get CommitConflict, not silently erase the other snapshot."""
    from hamerkop_spark.sources.catalog import CommitConflict

    cat.commit("t", _df(spark, [(1, "a")]))
    # simulate two writers loading the same prior: writer A commits...
    meta_before = cat._load_metadata("t")
    cat.commit("t", _df(spark, [(2, "b")]), mode="append")
    # ...writer B (stale prior from before A) must conflict
    with pytest.raises(CommitConflict):
        cat._write_metadata("t", meta_before)
    # and A's snapshot survives
    assert rows(cat.read("t")) == [(1, "a"), (2, "b")]


# -- manifest stats + scan-time file skipping ------------------------------


def _crawlish(spark, day, n=400):
    return spark.range(0, n).select(
        F.concat(F.lit(f"https://d{day}.ex/"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000 + day * 86400) + F.col("id")).alias("warc_ts"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        (F.col("id") + day * 1000).alias("seq"),
    )


@pytest.fixture()
def pages(spark, cat):
    for day in range(4):
        cat.commit("pages", _crawlish(spark, day).repartition(4),
                   mode="append" if day else "overwrite")
    return cat


def _scan_equals_filtered_read(cat, table, filters, col_expr):
    got = sorted(tuple(r) for r in cat.scan(table, filters).collect())
    want = sorted(tuple(r) for r in cat.read(table).filter(col_expr).collect())
    assert got == want
    return got


def test_scan_prunes_timestamp_ranges_from_metadata(spark, pages):
    import datetime as dt

    # day-2 only: every other commit dir's 4 files pruned without any
    # parquet footer being opened at plan time
    lo = dt.datetime(2023, 11, 16, 20, 0, 0)
    hi = dt.datetime(2023, 11, 17, 6, 0, 0)
    plan = pages.scan_plan("pages", [("warc_ts", ">=", lo), ("warc_ts", "<", hi)])
    assert plan["files_total"] == 16
    assert plan["files_scanned"] == 4 and plan["files_pruned"] == 12
    got = _scan_equals_filtered_read(
        pages, "pages", [("warc_ts", ">=", lo), ("warc_ts", "<", hi)],
        (F.col("warc_ts") >= lo) & (F.col("warc_ts") < hi))
    assert len(got) == 400  # the whole of day 2


def test_scan_long_range_and_string_equality(spark, pages):
    plan = pages.scan_plan("pages", [("seq", "<=", 500)])
    assert plan["files_scanned"] == 4  # day-0 commit only
    _scan_equals_filtered_read(pages, "pages", [("seq", "<=", 500)],
                               F.col("seq") <= 500)
    plan = pages.scan_plan("pages", [("url", "=", "https://d2.ex/55")])
    assert plan["files_scanned"] <= 4
    got = _scan_equals_filtered_read(
        pages, "pages", [("url", "=", "https://d2.ex/55")],
        F.col("url") == "https://d2.ex/55")
    assert len(got) == 1


def test_scan_in_isnull_notnull(spark, pages):
    got = _scan_equals_filtered_read(
        pages, "pages", [("lang", "in", ["en", "fr"])],
        F.col("lang").isin("en", "fr"))
    assert len(got) == 800
    # no column is null anywhere -> isnull prunes EVERY file, result empty
    plan = pages.scan_plan("pages", [("lang", "isnull")])
    assert plan["files_scanned"] == 0
    assert pages.scan("pages", [("lang", "isnull")]).count() == 0
    assert pages.scan("pages", [("lang", "notnull")]).count() == 1600


def test_scan_all_null_file_pruned_for_comparisons(spark, cat):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    b = spark.createDataFrame([(3, None), (4, None)], "k int, v string")
    cat.commit("t", a.coalesce(1))
    cat.commit("t", b.coalesce(1), mode="append")
    plan = cat.scan_plan("t", [("v", "=", "x")])
    assert plan["files_scanned"] == 1  # the all-null file can't match =
    assert rows(cat.scan("t", [("v", "=", "x")])) == [(1, "x")]
    plan = cat.scan_plan("t", [("v", "isnull")])
    assert plan["files_scanned"] == 1  # only the all-null file kept
    assert rows(cat.scan("t", [("v", "isnull")]), "k") == [(3,), (4,)]


def test_scan_truncated_string_bounds_stay_sound(spark, cat):
    from hamerkop_spark.sources.catalog import _STR_STAT_CAP

    long_lo = "m" * (_STR_STAT_CAP + 40)
    long_hi = "t" * (_STR_STAT_CAP + 40)
    cat.commit("t", spark.createDataFrame(
        [(long_lo,), (long_hi,)], "s string").coalesce(1))
    man = cat._load_manifest("t", cat.current_snapshot("t")["data_dirs"][0])
    ent = man["files"][0]["columns"]["s"]
    # min stored as a (valid lower-bound) prefix; max dropped entirely
    assert ent["min_trunc"] and ent["min"] == "m" * _STR_STAT_CAP
    assert ent["max_trunc"] and ent["max"] is None
    # v < truncated min -> provably no match -> pruned
    assert cat.scan_plan("t", [("s", "<", "a")])["files_scanned"] == 0
    # v > (dropped) max must NOT prune: upper bound is unknown
    assert cat.scan_plan("t", [("s", ">", "z")])["files_scanned"] == 1
    assert cat.scan("t", [("s", ">", "z")]).count() == 0
    assert cat.scan("t", [("s", ">=", long_hi)]).count() == 1


def test_scan_nan_double_semantics(spark, cat):
    from hamerkop_spark.sources.catalog import _prunable_on_stats

    df = spark.createDataFrame(
        [(1, float("nan")), (2, 5.0), (3, 7.5)], "k int, w double")
    cat.commit("t", df.coalesce(1))
    # Spark orders NaN above every double: w > 6.0 MATCHES the NaN row.
    # scan must agree with read().filter() exactly.
    got = rows(cat.scan("t", [("w", ">", 6.0)]), "k")
    want = rows(cat.read("t").filter(F.col("w") > 6.0), "k")
    assert got == want == [(1,), (3,)]
    # a foreign writer (pyarrow) writes NaN-EXCLUDING bounds; upper-bound
    # pruning on doubles must refuse even when max < v
    ent = {"tag": "double", "min": 5.0, "max": 7.5, "min_trunc": False,
           "max_trunc": False, "null_count": 0, "num_values": 3}
    assert not _prunable_on_stats(ent, ">", [100.0])
    assert not _prunable_on_stats(ent, ">=", [100.0])
    assert not _prunable_on_stats(ent, "!=", [5.0])
    # NaN never satisfies these -> NaN-free bounds stay usable
    assert _prunable_on_stats(ent, "<", [5.0])
    assert _prunable_on_stats(ent, "=", [4.0])


def test_scan_partition_values_prune_typed(spark, cat):
    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(30)], "k int, bucket int, v string")
    cat.commit("t", df, partition_by=["bucket"])
    plan = cat.scan_plan("t", [("bucket", "=", 1)])
    assert 0 < plan["files_scanned"] < plan["files_total"]
    got = _scan_equals_filtered_read(cat, "t",
                                     [("bucket", "=", 1)], F.col("bucket") == 1)
    assert len(got) == 10
    # range on an int partition value compares as int, not as string:
    # "2" < "10" lexicographically would wrongly prune bucket 2
    assert cat.scan("t", [("bucket", ">=", 2)]).count() == 10


def test_scan_null_partition_and_residual_exactness(spark, cat):
    df = spark.createDataFrame(
        [("a", "g1"), ("b", None), ("c", "g2")], "v string, g string")
    cat.commit("t", df, partition_by=["g"])
    assert rows(cat.scan("t", [("g", "isnull")]), "v") == [("b",)]
    assert rows(cat.scan("t", [("g", "=", "g2")]), "v") == [("c",)]
    assert rows(cat.scan("t", [("g", "notnull")]), "v") == [("a",), ("c",)]


def test_scan_falls_back_without_manifest(spark, cat):
    cat.commit("t", spark.createDataFrame([(1,), (2,)], "k int").coalesce(1))
    snap = cat.current_snapshot("t")
    os.remove(os.path.join(cat._table_path("t"), snap["data_dirs"][0],
                           "_manifest.json"))
    plan = cat.scan_plan("t", [("k", "=", 1)])
    assert plan["files_unknown"] == 1 and plan["files_scanned"] == 1
    assert rows(cat.scan("t", [("k", "=", 1)])) == [(1,)]


def test_scan_after_compaction_and_time_travel(spark, pages):
    pages.compact("pages")
    plan = pages.scan_plan("pages", [("seq", "<=", 500)])
    assert plan["files_unknown"] == 0  # compaction commit wrote a manifest
    _scan_equals_filtered_read(pages, "pages", [("seq", "<=", 500)],
                               F.col("seq") <= 500)
    # time-travel scan to the pre-compaction snapshot still prunes
    first = pages.history("pages")[0]["snapshot_id"]
    plan = pages.scan_plan("pages", [("seq", "<=", 500)], snapshot_id=first)
    assert plan["files_scanned"] == plan["files_total"] == 4
    assert pages.scan("pages", [("seq", "<=", 500)],
                      snapshot_id=first).count() == 400


def test_commit_row_counts_come_from_footers(spark, cat):
    cat.commit("t", spark.createDataFrame([(i,) for i in range(123)], "k int"))
    assert cat.table_metrics("t")["rows"] == 123
    cat.commit("t", spark.createDataFrame([(i,) for i in range(77)], "k int"),
               mode="append")
    assert cat.table_metrics("t")["rows"] == 200


def test_scan_rejects_bad_ops(spark, pages):
    with pytest.raises(ValueError):
        pages.scan_plan("pages", [("seq", "like", "x")])
    # empty scan result keeps the table schema (incl. partition columns)
    e = pages.scan("pages", [("seq", ">", 10**12)])
    assert e.count() == 0
    assert [c for c, _ in e.dtypes] == ["url", "warc_ts", "lang", "seq"]


def test_commit_order_by_gives_disjoint_file_ranges(spark, cat):
    df = spark.createDataFrame(
        [(f"https://s{i % 97}.ex/{i}", i, "p" * 300) for i in range(30000)],
        "url string, seq int, pad string")
    # unordered write: every file spans ~the whole url range
    cat.commit("t", df.repartition(8))
    url = "https://s42.ex/2758"  # 2758 % 97 == 42
    before = cat.scan_plan("t", [("url", "=", url)])["files_scanned"]
    # ordered rewrite: point lookups prune to ~one file. Pin AQE
    # coalescing off so the range exchange keeps shuffle.partitions
    # files — the pad column compresses so well that the 4m advisory
    # size can otherwise collapse the write to ONE file, which makes
    # the files_scanned < files_total assertion below vacuous/flaky.
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        cat.commit("t", df, order_by=["url"])
    finally:
        spark.conf.set(key, old)
    plan = cat.scan_plan("t", [("url", "=", url)])
    assert plan["files_scanned"] <= 1 < before
    assert rows(cat.scan("t", [("url", "=", url)]), "seq") == [(2758,)]
    # range on the sort key touches a contiguous file subset only
    plan = cat.scan_plan("t", [("url", ">=", "https://s42.ex/"),
                               ("url", "<", "https://s42.ex0")])
    assert 0 < plan["files_scanned"] < plan["files_total"]
    got = cat.scan("t", [("url", ">=", "https://s42.ex/"),
                         ("url", "<", "https://s42.ex0")])
    assert got.count() == df.filter(
        (F.col("url") >= "https://s42.ex/") & (F.col("url") < "https://s42.ex0")
    ).count()


# -- bloom-filter file skipping (commit(bloom_for=...)) -------------------

def _overlapping_appends(spark, cat, n_batches=6, rows_per=400):
    """Append batches whose url ranges ALL overlap (worst case for
    min/max pruning): urls are round-robin across hosts in every batch."""
    for b in range(n_batches):
        df = spark.createDataFrame(
            [(f"https://h{i % 23}.ex/{b}/{i}", b, i) for i in range(rows_per)],
            "url string, batch int, seq int",
        )
        cat.commit("pages_b", df.coalesce(1),
                   mode="append" if b else "overwrite", bloom_for=["url"])


def test_bloom_prunes_point_lookup_where_ranges_cannot(spark, cat):
    _overlapping_appends(spark, cat)
    url = "https://h4.ex/3/188"  # lives only in batch 3's file
    plan = cat.scan_plan("pages_b", [("url", "=", url)])
    assert plan["files_total"] == 6
    assert plan["files_scanned"] < 6  # min/max alone could never prune these
    got = rows(cat.scan("pages_b", [("url", "=", url)]), "batch", "seq")
    assert got == [(3, 188)]


def test_bloom_never_false_negative_over_every_key(spark, cat):
    _overlapping_appends(spark, cat, n_batches=3, rows_per=120)
    for b in range(3):
        for i in (0, 57, 119):
            url = f"https://h{i % 23}.ex/{b}/{i}"
            got = rows(cat.scan("pages_b", [("url", "=", url)]), "batch", "seq")
            assert got == [(b, i)], url


def test_bloom_in_filter_and_equality_to_read_filter(spark, cat):
    _overlapping_appends(spark, cat)
    urls = ["https://h4.ex/0/4", "https://h1.ex/5/24", "https://no.ex/x/0"]
    scan = cat.scan("pages_b", [("url", "in", urls)])
    ref = cat.read("pages_b").filter(F.col("url").isin(urls))
    assert rows(scan) == rows(ref)
    plan = cat.scan_plan("pages_b", [("url", "in", urls)])
    assert plan["files_scanned"] < plan["files_total"]


def test_bloom_on_int_column(spark, cat):
    df1 = spark.createDataFrame([(i, i % 5) for i in range(0, 1000, 2)],
                                "id long, g int")
    df2 = spark.createDataFrame([(i, i % 5) for i in range(1, 1000, 2)],
                                "id long, g int")
    cat.commit("t_int", df1.coalesce(1), bloom_for=["id"])
    cat.commit("t_int", df2.coalesce(1), mode="append", bloom_for=["id"])
    # both files span [0..999] so min/max keeps both; bloom drops one
    plan = cat.scan_plan("t_int", [("id", "=", 501)])
    assert plan["files_total"] == 2 and plan["files_scanned"] == 1
    assert rows(cat.scan("t_int", [("id", "=", 501)]), "g") == [(1,)]


def test_bloom_missing_sidecar_degrades_to_keep(spark, cat, tmp_path):
    _overlapping_appends(spark, cat, n_batches=2, rows_per=50)
    root = cat._table_path("pages_b")
    removed = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".bf"):
                os.remove(os.path.join(dirpath, f))
                removed += 1
    assert removed == 2
    url = "https://h3.ex/1/26"
    plan = cat.scan_plan("pages_b", [("url", "=", url)])
    assert plan["files_scanned"] == plan["files_total"]  # kept, not dropped
    assert rows(cat.scan("pages_b", [("url", "=", url)]), "batch", "seq") \
        == [(1, 26)]


def test_bloom_skips_all_null_and_float_columns(spark, cat):
    df = spark.createDataFrame(
        [(None, 1.5, "a"), (None, 2.5, "b")],
        "u string, x double, v string")
    cat.commit("t_nb", df.coalesce(1), bloom_for=["u", "x", "v"])
    man = cat._load_manifest(
        "t_nb", cat.current_snapshot("t_nb")["data_dirs"][0])
    blooms = man["files"][0].get("bloom", {})
    assert set(blooms) == {"v"}  # all-null u and double x: no bloom
    assert rows(cat.scan("t_nb", [("v", "=", "b")]), "x") == [(2.5,)]


def test_compact_carries_blooms_through(spark, cat):
    _overlapping_appends(spark, cat, n_batches=4, rows_per=200)
    cat.compact("pages_b")
    snap = cat.current_snapshot("pages_b")
    assert len(snap["data_dirs"]) == 1
    man = cat._load_manifest("pages_b", snap["data_dirs"][0])
    assert all("url" in e.get("bloom", {}) for e in man["files"])
    url = "https://h2.ex/2/48"
    assert rows(cat.scan("pages_b", [("url", "=", url)]), "batch", "seq") \
        == [(2, 48)]


def test_bloom_ignores_range_ops_and_unbloooms_stay_unpruned(spark, cat):
    _overlapping_appends(spark, cat, n_batches=2, rows_per=50)
    # range op on the bloomed column: bloom must not participate
    scan = cat.scan("pages_b", [("url", ">=", "https://h9")])
    ref = cat.read("pages_b").filter(F.col("url") >= "https://h9")
    assert scan.count() == ref.count() > 0
    # equality on a NON-bloomed column still works via stats only
    assert rows(cat.scan("pages_b", [("seq", "=", 7)]), "url") == rows(
        cat.read("pages_b").filter(F.col("seq") == 7), "url")


def test_bloom_mistyped_literal_never_false_negative(spark, cat):
    """Review repro: int column bloomed, probed with a STRING literal
    that Spark implicitly casts ('0501' -> 501). The bloom must refuse
    to prune (vtag mismatch), keeping scan() == read().filter()."""
    df1 = spark.createDataFrame([(i, "a") for i in range(0, 1000, 2)],
                                "id long, g string")
    df2 = spark.createDataFrame([(i, "b") for i in range(1, 1000, 2)],
                                "id long, g string")
    cat.commit("t_cast", df1.coalesce(1), bloom_for=["id"])
    cat.commit("t_cast", df2.coalesce(1), mode="append", bloom_for=["id"])
    got = rows(cat.scan("t_cast", [("id", "=", "0501")]), "g")
    ref = rows(cat.read("t_cast").filter(F.col("id") == "0501"), "g")
    assert got == ref == [("b",)]
    # and the plan shows it kept both files (nothing provable)
    plan = cat.scan_plan("t_cast", [("id", "=", "0501")])
    assert plan["files_scanned"] == plan["files_total"] == 2
    # properly typed literal still prunes to one file
    plan = cat.scan_plan("t_cast", [("id", "=", 501)])
    assert plan["files_scanned"] == 1


def test_bloom_sidecar_names_unique_across_partition_dirs(spark, cat):
    """Sidecar filenames are digest-keyed on (relative path, column):
    files in different partition dirs (which share Spark's part-file
    basenames) must never map onto one another's blooms."""
    df = spark.createDataFrame(
        [(f"u{i}", f"g__h={i % 3}", i % 2) for i in range(300)],
        "url string, g string, h int")
    cat.commit("t_pd", df.repartition(2), partition_by=["g", "h"],
               bloom_for=["url"])
    snap = cat.current_snapshot("t_pd")
    man = cat._load_manifest("t_pd", snap["data_dirs"][0])
    paths = [e["bloom"]["url"]["path"] for e in man["files"]
             if "bloom" in e]
    assert len(paths) == len(set(paths)) > 1
    # and every lookup still finds its row through the right bloom
    got = rows(cat.scan("t_pd", [("url", "=", "u123")]), "h")
    assert got == [(1,)]
