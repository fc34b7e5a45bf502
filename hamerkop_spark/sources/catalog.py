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
- **Manifests + scan-time file skipping.** Every commit dir carries a
  ``_manifest.json`` of per-file row counts, Hive partition values, and
  per-column min/max/null-count aggregated from the parquet footers at
  write time. ``scan(table, filters)`` prunes files a predicate provably
  cannot match — planning never opens a data file — then applies the
  same filters to the surviving rows, so the result is exactly
  ``read().filter()``. This is the catalog feature that matters most at
  crawl scale: a ``warc_ts`` range query over years of appended batches
  reads only the overlapping commits' files instead of listing and
  footer-probing millions of parquet files.
- **Bloom-filter file skipping.** ``commit(bloom_for=["url"])`` builds
  a per-file Bloom filter sidecar (Iceberg's puffin idea, see
  sources/bloom.py) so ``=`` / ``in`` point lookups on high-cardinality
  keys prune files even when every file's min/max range overlaps — the
  append-only stream case ``order_by`` cannot sort away. ``compact``
  re-blooms the same columns automatically.
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


# -- file-level column stats (manifest) -----------------------------------
#
# Iceberg's second load-bearing idea (after snapshot isolation) is that
# scan PLANNING never opens data files: per-file column bounds live in
# manifests, and a filtered read prunes files from metadata alone. Here
# each commit dir carries a ``_manifest.json`` (the leading underscore
# hides it from Spark's parquet directory listing) with per-file
# row counts, Hive partition values parsed from the path, and per-column
# min/max/null-count aggregated over the parquet footer's row groups.
#
# Conservatism rules (pruning must never drop a matching file):
#   * a column with no stats in ANY row group is unknown -> keep;
#   * string bounds longer than _STR_STAT_CAP are stored truncated: a
#     truncated min is still a valid LOWER bound (a prefix sorts <= the
#     full string) so min-side pruning stays sound, but a truncated max
#     is NOT a valid upper bound, so max is dropped entirely;
#   * non-finite float bounds (NaN never satisfies a comparison, but a
#     NaN bound poisons every test) drop the column's stats;
#   * decimals/binary/nested columns are skipped (pyarrow cannot extract
#     or ranges are meaningless for blobs).

_STR_STAT_CAP = 120


def _stat_encode(v):
    """JSON-encode one min/max bound, returning (tag, value) or None."""
    import datetime as _dt
    import math

    if isinstance(v, bool):
        return "bool", v
    if isinstance(v, int):
        return "long", v
    if isinstance(v, float):
        if not math.isfinite(v):
            return None
        return "double", v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        return "ts", (v - epoch) // _dt.timedelta(microseconds=1)
    if isinstance(v, _dt.date):
        return "date", (v - _dt.date(1970, 1, 1)).days
    if isinstance(v, str):
        return "string", v
    return None  # bytes, Decimal, anything exotic


def _norm_lit(v, tag):
    """Normalize a filter literal to the stored stat representation."""
    import datetime as _dt

    if tag == "ts":
        if isinstance(v, str):
            v = _dt.datetime.fromisoformat(v)
        if hasattr(v, "to_pydatetime"):  # pandas.Timestamp
            v = v.to_pydatetime()
        if isinstance(v, _dt.datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=_dt.timezone.utc)
            epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
            return (v - epoch) // _dt.timedelta(microseconds=1)
        return v  # already numeric micros
    if tag == "date":
        if isinstance(v, str):
            v = _dt.date.fromisoformat(v)
        if isinstance(v, _dt.datetime):
            v = v.date()
        if isinstance(v, _dt.date):
            return (v - _dt.date(1970, 1, 1)).days
        return v
    return v


def _file_column_stats(md) -> dict:
    """Aggregate one parquet footer's row-group stats into per-column
    {tag, min, max, min_trunc, max_trunc, null_count, num_values}.

    A column missing stats in any row group, mixing value tags, or
    failing pyarrow's stat extraction (decimals) is omitted = unknown.
    """
    cols: dict = {}
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        for ci in range(rg.num_columns):
            c = rg.column(ci)
            name = c.path_in_schema
            if "." in name:
                continue  # nested leaf (list/map/struct) — file-level ranges meaningless
            try:
                st = c.statistics
                ok = st is not None and st.has_min_max
                mn = _stat_encode(st.min) if ok else None
                mx = _stat_encode(st.max) if ok else None
                # null_count is OPTIONAL in the footer — trusting an
                # unset one as 0 would let isnull prune files that do
                # contain nulls
                counts_ok = st is not None and st.has_null_count
                nulls = st.null_count if counts_ok else None
                nvals = st.num_values if counts_ok else None
            except Exception:
                mn = mx = nulls = nvals = None
            ent = cols.setdefault(
                name,
                {"tag": None, "min": None, "max": None, "min_trunc": False,
                 "max_trunc": False, "null_count": 0, "num_values": 0,
                 "_broken": False},
            )
            # null/value counts: exact only if every row group reports them
            if nulls is None or nvals is None or ent["null_count"] is None:
                ent["null_count"] = ent["num_values"] = None
            else:
                ent["null_count"] += nulls
                ent["num_values"] += nvals
            if ent["_broken"]:
                continue
            if nulls is not None and nvals == 0:
                continue  # all-null row group: legitimately no min/max
            if mn is None or mx is None:
                ent["_broken"] = True  # values present but no usable bounds
                continue
            tag, mnv = mn
            tag2, mxv = mx
            if tag != tag2 or (ent["tag"] is not None and ent["tag"] != tag):
                ent["_broken"] = True
                continue
            ent["tag"] = tag
            # min: a truncated string is a PREFIX of the row-group min,
            # so it sorts <= it — still a valid lower bound; the file
            # bound is the minimum over all row-group lower bounds
            trunc_min = tag == "string" and len(mnv) > _STR_STAT_CAP
            if trunc_min:
                mnv = mnv[:_STR_STAT_CAP]
            if ent["min"] is None or mnv < ent["min"]:
                ent["min"] = mnv
            ent["min_trunc"] = ent["min_trunc"] or trunc_min
            # max: a truncated value is NOT an upper bound — one bad row
            # group voids the file's max
            if tag == "string" and len(mxv) > _STR_STAT_CAP:
                ent["max_trunc"] = True
            elif not ent["max_trunc"] and (ent["max"] is None or mxv > ent["max"]):
                ent["max"] = mxv
    out = {}
    for name, ent in cols.items():
        broken = ent.pop("_broken")
        if ent["max_trunc"]:
            ent["max"] = None
        if broken:
            # counts may still be exact even when bounds are unusable
            if ent["null_count"] is not None:
                out[name] = {"tag": None, "min": None, "max": None,
                             "min_trunc": False, "max_trunc": True,
                             "null_count": ent["null_count"],
                             "num_values": ent["num_values"]}
            continue
        if ent["tag"] is None and ent["null_count"] is None:
            continue
        out[name] = ent
    return out


def _parse_partition(rel_path: str) -> dict:
    """Hive-style key=value path segments -> {col: str_value_or_None}."""
    from urllib.parse import unquote

    part = {}
    for seg in rel_path.split(os.sep)[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            part[unquote(k)] = (
                None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
            )
    return part


def _build_manifest(
    abs_dir: str, files: list[str], bloom_for: list | None = None
) -> dict:
    """Read every parquet footer under a freshly written commit dir and
    assemble the manifest. Footer reads are driver-side metadata-only
    I/O (a few KB per file), parallelized over a thread pool — at real
    cluster scale this is the one step Iceberg instead does inside the
    write tasks; the manifest FORMAT is the same either way.

    ``bloom_for``: additionally build a per-file Bloom filter over each
    named column (sidecar files under ``<dir>/_blooms/``, entries under
    the manifest's ``bloom`` key) so ``scan()`` point lookups prune
    files whose key ranges overlap — the append-stream case ``order_by``
    cannot fix (see sources/bloom.py). This pass reads the bloomed
    COLUMNS, not just footers; keep the list short (the point-lookup
    keys, e.g. ``url``)."""
    import concurrent.futures as cf

    import pyarrow.parquet as pq

    from . import bloom as _bloom

    def one(f):
        pf = pq.ParquetFile(f)
        md = pf.metadata
        rel = os.path.relpath(f, abs_dir)
        entry = {
            "path": rel,
            "rows": md.num_rows,
            "bytes": os.path.getsize(f),
            "partition": _parse_partition(rel),
            "columns": _file_column_stats(md),
        }
        want = [c for c in (bloom_for or [])
                if c in set(pf.schema_arrow.names)]
        if want:
            import hashlib

            data = pf.read(columns=want)
            blooms = {}
            for c in want:
                built = _bloom.build(data.column(c).to_pylist())
                if built is None:
                    continue  # all-null or unsupported type: no bloom
                m, k, n, packed, vtag = built
                # sidecar name keyed by a digest of (rel path, column):
                # flattening rel with separator substitution can collide
                # across partition dirs (values may themselves contain
                # the substitute), and a collision points a file at
                # another file's bloom = silent false negatives
                key = hashlib.sha1(
                    f"{rel}\x00{c}".encode()
                ).hexdigest()[:16]
                side_rel = os.path.join(
                    "_blooms", f"{key}-{os.path.basename(rel)}.{c}.bf"
                )
                _bloom.write_sidecar(os.path.join(abs_dir, side_rel), packed)
                blooms[c] = {"m": m, "k": k, "n": n, "path": side_rel,
                             "vtag": vtag}
            if blooms:
                entry["bloom"] = blooms
        return entry

    if not files:
        entries = []
    elif len(files) == 1:
        entries = [one(files[0])]
    else:
        with cf.ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
            entries = list(ex.map(one, sorted(files)))
    return {"manifest_version": 1, "files": entries}


_PRUNE_OPS = {"=", "==", "!=", "<", "<=", ">", ">=", "in", "isnull", "notnull"}


def _prunable_on_stats(ent: dict, op: str, vals: list) -> bool:
    """True when the column's stats PROVE no row in the file matches.

    min may be truncated (valid lower bound: every prune test on min is
    of the form min-compare-v where truncation only weakens it toward
    keeping); max participates only when untruncated.
    """
    all_null = ent["num_values"] == 0 and ent["num_values"] is not None
    if op == "isnull":
        return ent["null_count"] == 0 and ent["null_count"] is not None
    if op == "notnull":
        return all_null
    if all_null:
        return True  # no comparison or (in)equality matches a null
    if ent["tag"] == "double" and op in (">", ">=", "!="):
        # Spark orders NaN ABOVE every value (NaN > v and NaN != v are
        # TRUE), but writers exclude NaN from min/max (parquet-mr omits
        # the stats, pyarrow writes NaN-free bounds — both probed), so
        # an upper bound can never prove the absence of matching NaN
        # rows. =, in, <, <= stay prunable: NaN never satisfies those.
        return False
    mn, mx = ent["min"], ent["max"]
    max_ok = mx is not None and not ent["max_trunc"]
    try:
        nvals = [_norm_lit(v, ent["tag"]) for v in vals]
    except (ValueError, TypeError):
        return False
    if op in ("=", "==", "in"):
        def outside(v):
            try:
                return (mn is not None and v < mn) or (max_ok and v > mx)
            except TypeError:
                return False
        return bool(nvals) and all(outside(v) for v in nvals)
    if op == "!=":
        v = nvals[0]
        try:
            return (
                max_ok and not ent["min_trunc"] and mn == mx == v
                and ent["null_count"] == 0
            )
        except TypeError:
            return False
    v = nvals[0]
    try:
        if op == "<":
            return mn is not None and mn >= v
        if op == "<=":
            return mn is not None and mn > v
        if op == ">":
            return max_ok and mx <= v
        if op == ">=":
            return max_ok and mx < v
    except TypeError:
        return False
    return False


def _prunable_on_partition(pv, op: str, vals: list) -> bool:
    """True when the file's Hive partition value proves no match.
    Values are compared in the literal's own type (int('5') etc.);
    any conversion failure keeps the file."""
    if op == "isnull":
        return pv is not None
    if op == "notnull":
        return pv is None
    if pv is None:
        return True  # comparisons and (in)equality never match null

    def conv(v):
        if isinstance(v, str):
            return pv
        if isinstance(v, bool):
            return pv.lower() in ("true", "1")
        return type(v)(pv)

    try:
        if op in ("=", "==", "in"):
            return all(conv(v) != v for v in vals) and bool(vals)
        v = vals[0]
        c = conv(v)
        if op == "!=":
            return c == v
        if op == "<":
            return c >= v
        if op == "<=":
            return c > v
        if op == ">":
            return c <= v
        if op == ">=":
            return c < v
    except (ValueError, TypeError):
        return False
    return False


def _file_survives(entry: dict, filters: list, bloom_probe=None) -> bool:
    for col, op, *rest in filters:
        vals = rest[0] if rest else None
        vals = list(vals) if op == "in" else ([vals] if rest else [])
        if col in entry.get("partition", {}):
            if _prunable_on_partition(entry["partition"][col], op, vals):
                return False
        ent = entry.get("columns", {}).get(col)
        if ent is not None and _prunable_on_stats(ent, op, vals):
            return False
        # Bloom: prune when the filter's literals are PROVABLY all
        # absent from the file (=/in only; bloom knows nothing about
        # ranges or nulls). False positives keep the file — harmless.
        if bloom_probe is not None and op in ("=", "==", "in") and vals:
            bl = entry.get("bloom", {}).get(col)
            if bl is not None and not bloom_probe(bl, vals):
                return False
    return True


def _filters_to_column(filters: list):
    """The residual row filter: scan() applies the SAME predicate the
    planner pruned with, so the result is exactly read().filter(...)."""
    from pyspark.sql import functions as F

    out = F.lit(True)
    for col, op, *rest in filters:
        c = F.col(col)
        if op in ("=", "=="):
            term = c == F.lit(rest[0])
        elif op == "!=":
            term = c != F.lit(rest[0])
        elif op == "<":
            term = c < F.lit(rest[0])
        elif op == "<=":
            term = c <= F.lit(rest[0])
        elif op == ">":
            term = c > F.lit(rest[0])
        elif op == ">=":
            term = c >= F.lit(rest[0])
        elif op == "in":
            term = c.isin(list(rest[0]))
        elif op == "isnull":
            term = c.isNull()
        elif op == "notnull":
            term = c.isNotNull()
        else:  # pragma: no cover — scan_plan validated ops already
            raise ValueError(f"unsupported op {op!r}")
        out = out & term
    return out


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
        order_by: list | None = None,
        bloom_for: list | None = None,
    ) -> int:
        """Write `df` as a new snapshot; returns the snapshot id.

        ``order_by``: range-repartition + sort the data on these columns
        before writing, so each file covers a DISJOINT range of the key
        and ``scan()`` prunes point/range queries on it to ~one file.
        This is the write-side half of data skipping (Iceberg's
        sort-order spec): append-time order gives warc_ts locality for
        free, ``order_by`` buys the same for any other key. Costs one
        range-exchange at write; never changes row content.

        ``bloom_for``: build per-file Bloom filters over these columns
        (manifest sidecars) so ``scan()`` prunes ``=`` / ``in`` lookups
        even when files' min/max ranges all overlap — the unsortable
        append-stream case. See sources/bloom.py.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        missing = [c for c in (bloom_for or []) if c not in df.columns]
        if missing:
            raise ValueError(f"bloom_for columns not in df: {missing}")
        if order_by:
            df = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)
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
        # Manifest (per-file rows + column bounds) from the parquet
        # footers — also supplies the exact row count, so a commit no
        # longer costs a full Spark count() job over what it just wrote
        # (one job less per streaming micro-batch).
        manifest = _build_manifest(abs_dir, files, bloom_for=bloom_for)
        with open(os.path.join(abs_dir, "_manifest.json"), "w") as fh:
            json.dump(manifest, fh)
        dir_stats = dict(prior.get("dir_stats", {})) if prior else {}
        dir_stats[rel_dir] = {
            "rows": sum(e["rows"] for e in manifest["files"]),
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

    # -- filtered scans with manifest file pruning -------------------------
    def _load_manifest(self, table: str, rel_dir: str) -> dict | None:
        p = os.path.join(self._table_path(table), rel_dir, "_manifest.json")
        if not os.path.exists(p):
            return None  # pre-manifest commit: scan falls back to full dir
        with open(p) as fh:
            return json.load(fh)

    def scan_plan(
        self,
        table: str,
        filters: list | None = None,
        snapshot_id: int | None = None,
        tag: str | None = None,
    ) -> dict:
        """Plan a filtered read WITHOUT touching any data file: prune the
        snapshot's file list against manifest column bounds + partition
        values. Returns per-dir surviving files and counters.

        ``filters``: ANDed tuples ``(col, op, value)`` with op one of
        ``= == != < <= > >= in isnull notnull`` (isnull/notnull take no
        value; in takes an iterable). Unknown columns or missing stats
        keep the file — pruning is an optimization, never a filter.
        """
        filters = list(filters or [])
        for f in filters:
            if len(f) < 2 or f[1] not in _PRUNE_OPS:
                raise ValueError(f"bad filter {f!r}; ops: {sorted(_PRUNE_OPS)}")
        meta = self._load_metadata(table)
        if tag is not None:
            snapshot_id = meta.get("refs", {}).get(tag)
            if snapshot_id is None:
                raise SnapshotNotFound(f"tag {tag!r} not in table {table!r}")
        snap = self._snapshot(meta, snapshot_id)
        plan = {"dirs": [], "files_total": 0, "files_scanned": 0,
                "files_pruned": 0, "files_unknown": 0, "rows_possible": 0}
        bloom_cache: dict = {}

        def _probe_for(abs_dir):
            # closure binding the commit dir; sidecars cache per path.
            # Any sidecar problem (deleted, corrupt) keeps the file —
            # blooms are an optimization, never a filter.
            from . import bloom as _bloom

            def probe(bl, vals):
                p = os.path.join(abs_dir, bl["path"])
                try:
                    packed = bloom_cache.get(p)
                    if packed is None:
                        packed = bloom_cache[p] = _bloom.read_sidecar(p)
                    # vtag gates mistyped literals (Spark compares those
                    # through implicit casts the hash cannot mirror); a
                    # manifest without one (pre-tag writer) never prunes
                    vtag = bl.get("vtag")
                    if vtag is None:
                        return True
                    return _bloom.any_might_contain(
                        packed, bl["m"], bl["k"], vals, vtag=vtag
                    )
                except Exception:
                    return True
            return probe

        for rel_dir in snap["data_dirs"]:
            man = self._load_manifest(table, rel_dir)
            abs_dir = os.path.join(self._table_path(table), rel_dir)
            if man is None:
                n = meta.get("dir_stats", {}).get(rel_dir, {}).get("files", 0)
                plan["dirs"].append(
                    {"dir": rel_dir, "whole_dir": True, "files": None}
                )
                plan["files_total"] += n
                plan["files_scanned"] += n
                plan["files_unknown"] += n
                continue
            bloom_probe = _probe_for(abs_dir)
            kept = [e for e in man["files"]
                    if _file_survives(e, filters, bloom_probe)]
            plan["files_total"] += len(man["files"])
            plan["files_scanned"] += len(kept)
            plan["files_pruned"] += len(man["files"]) - len(kept)
            plan["rows_possible"] += sum(e["rows"] for e in kept)
            plan["dirs"].append({
                "dir": rel_dir,
                "whole_dir": len(kept) == len(man["files"]),
                "files": [os.path.join(abs_dir, e["path"]) for e in kept],
                "base_path": abs_dir,
            })
        return plan

    def scan(
        self,
        table: str,
        filters: list | None = None,
        snapshot_id: int | None = None,
        tag: str | None = None,
    ) -> DataFrame:
        """Filtered read with manifest-level file skipping (Iceberg scan
        semantics): files whose column bounds / partition values cannot
        contain a match are never opened, and the filters are ALSO
        applied to the surviving rows, so the result is exactly
        ``read(...).filter(...)`` — pruning can only make it cheaper.
        """
        plan = self.scan_plan(table, filters, snapshot_id=snapshot_id, tag=tag)
        parts = []
        for d in plan["dirs"]:
            abs_dir = os.path.join(self._table_path(table), d["dir"])
            if d.get("whole_dir"):
                parts.append(self.spark.read.parquet(abs_dir))
            elif d["files"]:
                # basePath keeps Hive partition columns inferred when
                # reading an explicit file subset inside a partitioned dir
                parts.append(
                    self.spark.read.option("basePath", d["base_path"])
                    .parquet(*d["files"])
                )
        if not parts:
            from pyspark.sql.types import StructType

            meta = self._load_metadata(table)
            empty = self.spark.createDataFrame(
                [], StructType.fromJson(meta["schema"])
            )
            parts = [empty]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.filter(_filters_to_column(filters or []))

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
        # carry bloom coverage through the rewrite: any column bloomed
        # in the current snapshot's manifests stays bloomed after
        bloom_cols = sorted({
            c
            for d in self._snapshot(meta, None)["data_dirs"]
            for man in (self._load_manifest(table, d),)
            if man
            for e in man["files"]
            for c in e.get("bloom", {})
        })
        self.commit(
            table,
            df.coalesce(int(n_files)),
            mode="overwrite",
            partition_by=meta.get("partition_spec") or None,
            bloom_for=bloom_cols or None,
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
