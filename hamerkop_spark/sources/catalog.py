"""Iceberg-style table catalog over parquet (north_rule: "checkpoints
each stage ... to Iceberg").

No Iceberg jars ship in this sandbox, so this is a from-scratch
implementation of the *format's load-bearing ideas* at directory
granularity, not a binding to the Iceberg library:

- **Snapshot isolation / atomic visibility.** Every commit writes its
  data files to a fresh ``data/snap-NNNNNN/`` directory, then writes a
  new ``metadata/vN.metadata.json`` describing the full snapshot list,
  and finally flips ``metadata/version-hint.text`` with an atomic
  ``os.replace``. Readers resolve hint -> metadata -> data dirs, so a
  crashed or concurrent writer is never partially visible (the classic
  parquet-directory failure mode that ``_SUCCESS`` markers only
  approximate).
- **Append as metadata.** ``mode="append"`` reuses every prior data
  dir by reference — no rewrite of existing data, exactly Iceberg's
  manifest-reuse behavior.
- **Time travel + rollback.** Every snapshot stays addressable
  (``read(table, snapshot_id=...)``); ``rollback`` is a pure metadata
  commit pointing ``current_snapshot_id`` at an older snapshot.
- **Stats in metadata.** Per-snapshot row/file/byte counts let
  planners (and the StageRunner's lineage rows) answer "how big" without
  touching data files.
- **Schema tracking.** The table schema is recorded at create time and
  appends are checked against it (field names + value types at every
  nesting level; nullability and field metadata are ignored).
- **Conflict detection.** Commits race on an exclusive-create of the
  next metadata version (``open(..., "x")``): of two concurrent
  writers, exactly one wins and the loser gets ``CommitConflict`` —
  data dirs carry a per-attempt unique suffix so the loser never
  clobbers the winner's files, it only leaves an unreferenced dir.

The reference has no table format at all — it re-reads its TSV/JSON
inputs every run (``/root/reference/hamerkop/io.py``); this catalog is
the scale-path replacement for that, and the optional backend for
``plans.pipeline.StageRunner`` checkpoints.

Scale notes: metadata is O(snapshots x dirs), kilobytes — never
row-proportional. Reads are plain parquet directory scans, so partition
pruning and predicate pushdown behave exactly as a direct
``spark.read.parquet`` would (asserted in tests/test_catalog.py).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

FORMAT_VERSION = 1


class SnapshotNotFound(KeyError):
    pass


class SchemaMismatch(ValueError):
    pass


class CommitConflict(RuntimeError):
    pass


def _normalize_type(t):
    """Strip nullability and field metadata at every nesting level so
    the append schema check compares names + value types only."""
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "struct":
            return {
                "type": "struct",
                "fields": [
                    {"name": f["name"], "type": _normalize_type(f["type"])}
                    for f in t["fields"]
                ],
            }
        if kind == "array":
            return {"type": "array", "elementType": _normalize_type(t["elementType"])}
        if kind == "map":
            return {
                "type": "map",
                "keyType": _normalize_type(t["keyType"]),
                "valueType": _normalize_type(t["valueType"]),
            }
    return t


def _types_of(schema_json: dict) -> list[tuple[str, object]]:
    return [(f["name"], _normalize_type(f["type"])) for f in schema_json["fields"]]


class IcebergishCatalog:
    """A warehouse of snapshot-versioned parquet tables."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def _table_path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _meta_dir(self, table: str) -> str:
        return os.path.join(self._table_path(table), "metadata")

    def _hint_path(self, table: str) -> str:
        return os.path.join(self._meta_dir(table), "version-hint.text")

    # -- metadata --------------------------------------------------------
    def _current_version(self, table: str) -> int | None:
        hint = self._hint_path(table)
        if not os.path.exists(hint):
            return None
        with open(hint) as fh:
            return int(fh.read().strip())

    def _load_metadata(self, table: str, version: int | None = None) -> dict:
        version = version if version is not None else self._current_version(table)
        if version is None:
            raise SnapshotNotFound(f"table {table!r} does not exist")
        path = os.path.join(self._meta_dir(table), f"v{version}.metadata.json")
        with open(path) as fh:
            meta = json.load(fh)
        # CAS token for load-modify-write callers: _write_metadata targets
        # exactly loaded_version + 1, so a commit built from a stale read
        # CONFLICTS instead of silently erasing an interleaved commit
        meta["_loaded_version"] = version
        return meta

    def _write_metadata(self, table: str, meta: dict) -> int:
        """Write v(loaded+1).metadata.json then atomically flip the hint.

        The data files and the metadata json are invisible until the
        ``os.replace`` — a writer that dies before it leaves only
        unreferenced garbage, never a half-committed table. The
        exclusive create (``"x"``) is the optimistic-concurrency check,
        COMPARE-AND-SWAP against the version this writer's metadata was
        READ at (not the current hint — recomputing from the hint would
        let a writer racing an already-finished commit win with a stale
        snapshot list and silently drop the other writer's snapshot):
        of two writers that loaded the same version, exactly one wins,
        the other raises CommitConflict (and must re-read + retry), the
        same protocol as Iceberg's rename-without-overwrite commit.
        """
        meta = dict(meta)
        loaded = meta.pop("_loaded_version", None)
        if loaded is None:
            loaded = self._current_version(table) or 0  # fresh table create
        meta_dir = self._meta_dir(table)
        os.makedirs(meta_dir, exist_ok=True)
        version = loaded + 1
        meta_path = os.path.join(meta_dir, f"v{version}.metadata.json")
        try:
            with open(meta_path, "x") as fh:
                json.dump(meta, fh, sort_keys=True)
        except FileExistsError:
            raise CommitConflict(
                f"table {table!r}: metadata v{version} was committed by a "
                "concurrent writer; re-read and retry"
            ) from None
        tmp = self._hint_path(table) + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._hint_path(table))
        return version

    def _snapshot(self, meta: dict, snapshot_id: int | None) -> dict:
        sid = snapshot_id if snapshot_id is not None else meta["current_snapshot_id"]
        for snap in meta["snapshots"]:
            if snap["snapshot_id"] == sid:
                return snap
        raise SnapshotNotFound(f"snapshot {sid} not in table {meta['table']!r}")

    # -- public API ------------------------------------------------------
    def exists(self, table: str) -> bool:
        return self._current_version(table) is not None

    def tables(self) -> list[str]:
        return sorted(
            t
            for t in os.listdir(self.warehouse)
            if os.path.exists(self._hint_path(t))
        )

    def commit(
        self,
        table: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list | None = None,
        properties: dict | None = None,
    ) -> int:
        """Write `df` as a new snapshot; returns the snapshot id."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        prior = self._load_metadata(table) if self.exists(table) else None
        schema_json = df.schema.jsonValue()
        if prior is not None:
            if mode == "append" and _types_of(prior["schema"]) != _types_of(schema_json):
                raise SchemaMismatch(
                    f"append to {table!r}: schema {_types_of(schema_json)} != "
                    f"table schema {_types_of(prior['schema'])}"
                )
            if partition_by is None:
                partition_by = prior.get("partition_spec") or None

        snapshot_id = (
            max((s["snapshot_id"] for s in prior["snapshots"]), default=0) + 1
            if prior
            else 1
        )
        # per-attempt unique dir: a committer that loses the metadata
        # race (CommitConflict) leaves an unreferenced dir behind — it
        # can never clobber the winner's files
        attempt = uuid.uuid4().hex[:8]
        rel_dir = os.path.join("data", f"snap-{snapshot_id:06d}-{attempt}")
        abs_dir = os.path.join(self._table_path(table), rel_dir)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(abs_dir)

        files = [
            os.path.join(root, f)
            for root, _, fs in os.walk(abs_dir)
            for f in fs
            if f.endswith(".parquet")
        ]
        dir_stats = dict(prior.get("dir_stats", {})) if prior else {}
        dir_stats[rel_dir] = {
            "rows": self.spark.read.parquet(abs_dir).count(),
            "files": len(files),
            "bytes": sum(os.path.getsize(f) for f in files),
        }
        inherited = (
            self._snapshot(prior, None)["data_dirs"]
            if (prior and mode == "append")
            else []
        )
        data_dirs = inherited + [rel_dir]
        # summary = TABLE totals at this snapshot (sum over its dirs),
        # not just the appended delta
        summary = {
            k: sum(dir_stats[d][k] for d in data_dirs)
            for k in ("rows", "files", "bytes")
        }
        # Stream watermarks (`last_batch_id:<stream>`) are carried forward
        # onto EVERY new snapshot: without this, a maintenance commit
        # followed by expire_snapshots(keep_last=1) could erase the
        # high-water mark and a replayed micro-batch would re-append as a
        # duplicate. Per-key max over all retained prior snapshots, then
        # explicit properties override.
        inherited_props: dict = {}
        if prior is not None:
            for s in prior["snapshots"]:
                for k, v in s.get("properties", {}).items():
                    if k.startswith("last_batch_id:") and (
                        k not in inherited_props
                        or int(v) > int(inherited_props[k])
                    ):
                        inherited_props[k] = v
        snap = {
            "snapshot_id": snapshot_id,
            "timestamp_ms": int(time.time() * 1000),
            "operation": mode,
            "data_dirs": data_dirs,
            "summary": summary,
            "added": dir_stats[rel_dir],
            "properties": {**inherited_props, **(properties or {})},
        }
        meta = {
            "format_version": FORMAT_VERSION,
            "table": table,
            "schema": schema_json if mode == "overwrite" or prior is None
            else prior["schema"],
            "partition_spec": list(partition_by or []),
            "current_snapshot_id": snapshot_id,
            "dir_stats": dir_stats,
            "refs": dict(prior.get("refs", {})) if prior else {},
            "snapshots": (prior["snapshots"] if prior else []) + [snap],
            # CAS against the version `prior` was READ at (see
            # _write_metadata) — a commit built from a stale prior must
            # conflict, not clobber an interleaved commit
            "_loaded_version": prior["_loaded_version"] if prior else 0,
        }
        self._write_metadata(table, meta)
        return snapshot_id

    def read(
        self,
        table: str,
        snapshot_id: int | None = None,
        tag: str | None = None,
    ) -> DataFrame:
        """Read the current snapshot, time-travel to `snapshot_id`, or
        resolve a named `tag` (Iceberg ref)."""
        meta = self._load_metadata(table)
        if tag is not None:
            if snapshot_id is not None:
                raise ValueError("pass snapshot_id or tag, not both")
            refs = meta.get("refs", {})
            if tag not in refs:
                raise SnapshotNotFound(
                    f"tag {tag!r} not in table {table!r}"
                )
            snapshot_id = refs[tag]
        snap = self._snapshot(meta, snapshot_id)
        dirs = [
            os.path.join(self._table_path(table), d) for d in snap["data_dirs"]
        ]
        # One read per commit dir (each is its own partition-discovery
        # root), unioned by name: partition pruning/pushdown still reach
        # every underlying scan, and mixed snap-* path components never
        # confuse Spark's partition inference.
        out = self.spark.read.parquet(dirs[0])
        for d in dirs[1:]:
            out = out.unionByName(self.spark.read.parquet(d))
        return out

    def history(self, table: str) -> list[dict]:
        meta = self._load_metadata(table)
        return [
            {k: s[k] for k in ("snapshot_id", "timestamp_ms", "operation", "summary")}
            for s in meta["snapshots"]
        ]

    def current_snapshot(self, table: str) -> dict:
        meta = self._load_metadata(table)
        return self._snapshot(meta, None)

    def rollback(self, table: str, snapshot_id: int) -> None:
        """Point the table back at an older snapshot (pure metadata)."""
        meta = self._load_metadata(table)
        self._snapshot(meta, snapshot_id)  # validate it exists
        meta["current_snapshot_id"] = snapshot_id
        self._write_metadata(table, meta)

    def tag(self, table: str, name: str, snapshot_id: int | None = None) -> int:
        """Name a snapshot (Iceberg tag/ref): a pure-metadata pointer —
        e.g. the blessed KB build a linking run was scored against.
        Defaults to the current snapshot; tagged snapshots survive
        expire_snapshots until the tag is dropped."""
        meta = self._load_metadata(table)
        snap = self._snapshot(meta, snapshot_id)
        meta.setdefault("refs", {})[name] = snap["snapshot_id"]
        self._write_metadata(table, meta)
        return snap["snapshot_id"]

    def tags(self, table: str) -> dict[str, int]:
        return dict(self._load_metadata(table).get("refs", {}))

    def drop_tag(self, table: str, name: str) -> None:
        meta = self._load_metadata(table)
        refs = meta.get("refs", {})
        if name in refs:
            del refs[name]
            self._write_metadata(table, meta)

    def expire_snapshots(self, table: str, keep_last: int = 1) -> list[int]:
        """Drop all but the newest `keep_last` snapshots (the current one
        is always kept) and delete data dirs no retained snapshot
        references. Returns the expired snapshot ids."""
        import shutil

        meta = self._load_metadata(table)
        snaps = sorted(meta["snapshots"], key=lambda s: s["snapshot_id"])
        keep = {s["snapshot_id"] for s in snaps[-keep_last:]} if keep_last > 0 else set()
        keep.add(meta["current_snapshot_id"])
        keep |= set(meta.get("refs", {}).values())  # tagged snapshots pinned
        kept = [s for s in snaps if s["snapshot_id"] in keep]
        expired = [s["snapshot_id"] for s in snaps if s["snapshot_id"] not in keep]
        if not expired:
            return []
        live_dirs = {d for s in kept for d in s["data_dirs"]}
        dead_dirs = {
            d for s in snaps if s["snapshot_id"] not in keep for d in s["data_dirs"]
        } - live_dirs
        meta["snapshots"] = kept
        meta["dir_stats"] = {
            d: st for d, st in meta.get("dir_stats", {}).items() if d in live_dirs
        }
        self._write_metadata(table, meta)
        # Deletion happens only after the new metadata is visible: a
        # reader that resolves the hint after the flip gets a clean
        # SnapshotNotFound for expired ids. (A reader still holding a
        # lazy DataFrame over an expiring snapshot can fail mid-scan —
        # the same read/expire race real Iceberg has; retention policy
        # is the operator's job.)
        for d in dead_dirs:
            shutil.rmtree(os.path.join(self._table_path(table), d), ignore_errors=True)
        return expired

    def compact(
        self, table: str, target_file_mb: int = 64
    ) -> dict:
        """Rewrite the CURRENT snapshot's data — accumulated across
        O(snapshots) append dirs by a long-running stream sink — into one
        fresh data dir with ~`target_file_mb` files, committed as a new
        snapshot. Pure addition to the snapshot list: older snapshots
        stay time-travelable (and keep their dirs) until
        expire_snapshots; stream watermark properties are inherited onto
        the compaction commit like any other, so a replayed micro-batch
        is still detected afterwards.

        Returns {"before": {...}, "after": {...}} file/dir/row metrics.
        """
        before = self.table_metrics(table)
        meta = self._load_metadata(table)
        df = self.read(table)
        n_files = max(
            1, -(-before["bytes"] // (target_file_mb * 1024 * 1024))
        )
        self.commit(
            table,
            df.coalesce(int(n_files)),
            mode="overwrite",
            partition_by=meta.get("partition_spec") or None,
        )
        after = self.table_metrics(table)
        return {"before": before, "after": after}

    def table_metrics(self, table: str) -> dict:
        """Files-per-table health row for the CURRENT snapshot: data
        dirs referenced, parquet files, bytes, rows — all from metadata
        (no data scan)."""
        meta = self._load_metadata(table)
        snap = self._snapshot(meta, None)
        return {
            "table": table,
            "snapshot_id": snap["snapshot_id"],
            "dirs": len(snap["data_dirs"]),
            "files": snap["summary"]["files"],
            "bytes": snap["summary"]["bytes"],
            "rows": snap["summary"]["rows"],
        }

    def cleanup_orphans(self, table: str) -> list[str]:
        """Delete data dirs referenced by NO snapshot — the debris of
        crashed writers and CommitConflict losers (their per-attempt
        dirs are invisible but occupy space). Metadata is untouched;
        safe to run any time after in-flight commits have settled (an
        in-flight commit's dir is an orphan until its hint flip, so
        don't run concurrently with active writers)."""
        import shutil

        meta = self._load_metadata(table)
        live = {d for s in meta["snapshots"] for d in s["data_dirs"]}
        data_root = os.path.join(self._table_path(table), "data")
        if not os.path.isdir(data_root):
            return []
        orphans = [
            os.path.join("data", d)
            for d in sorted(os.listdir(data_root))
            if os.path.join("data", d) not in live
        ]
        for d in orphans:
            shutil.rmtree(os.path.join(self._table_path(table), d),
                          ignore_errors=True)
        return orphans

    def drop(self, table: str) -> None:
        import shutil

        shutil.rmtree(self._table_path(table), ignore_errors=True)
