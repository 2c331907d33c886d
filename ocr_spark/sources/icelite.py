"""icelite — a minimal snapshot-isolated, bucket-partitioned table format.

Semantics modeled on Apache Iceberg (public spec), scoped to what the
engine needs (SURVEY.md §2 K1-K8, §7 M4):

- **Atomic commits**: a snapshot is a JSON manifest listing every live data
  file.  The commit point is a single ``os.replace`` of the HEAD pointer —
  readers see the old or the new snapshot, never a half-written mix.  This
  replaces the reference's 5 non-atomic Sheets API calls
  (reference: src/ai/flows/save-to-google-sheet.ts:146-240, which can
  corrupt the sheet if it dies between delete and append).
- **Idempotent keyed MERGE** (reference K3 delete-then-append upsert):
  copy-on-write at bucket granularity — only buckets present in the
  incoming batch are rewritten (old rows anti-joined on the key, new rows
  appended); untouched buckets carry over by file reference.
- **Bucket partitioning**: rows are hashed on the key column into N buckets
  (``bucket(N, url)`` layout per BASELINE.json:6); readers can prune to a
  bucket subset via the manifest without listing directories.
- **Lineage + resume**: every snapshot records operation metadata (e.g. the
  bucket-group a pipeline commit covered) and per-file row counts (read
  from parquet footers — no extra Spark job).  A resumed run asks the table
  which groups are already committed and skips them.

Layout::

    <root>/
      _HEAD                      # text file: current snapshot id (atomic)
      _snapshots/<id>.json       # manifest chain (parent_id links)
      data/snap-<id>/bucket=<k>/part-*.parquet
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


class IceliteError(RuntimeError):
    """Base of the sink error taxonomy (reference maps failures to specific
    user-facing messages, save-to-mongodb route.ts:135-148; the CLI maps
    these to distinct exit codes)."""


class CommitConflictError(IceliteError):
    """A concurrent writer rewrote one of this commit's buckets: the
    anti-join read stale state, so committing would silently lose their
    update.  Retry the merge from the new head."""


class SchemaMismatchError(IceliteError):
    """K6 validated insert: the incoming batch's columns/types don't match
    the table schema — rejected BEFORE any data file lands (the reference
    zod-safeParses every insert and 400s mismatches, route.ts:106-114)."""


def bucket_expr(key_col: str, n_buckets: int):
    """Deterministic url-hash bucket: non-negative xxhash64 mod N (JVM-side)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    operation: str
    files: dict[str, list[str]]  # bucket(str) -> relative file paths
    file_rows: dict[str, int]  # relative path -> row count
    metadata: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "snapshot_id": self.snapshot_id,
                "parent_id": self.parent_id,
                "operation": self.operation,
                "files": self.files,
                "file_rows": self.file_rows,
                "metadata": self.metadata,
            },
            indent=1,
        )

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        d = json.loads(s)
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            parent_id=d["parent_id"],
            operation=d["operation"],
            files=d["files"],
            file_rows=d["file_rows"],
            metadata=d.get("metadata", {}),
        )


class IceliteTable:
    """Single-process writer model: concurrent commits from one process are
    serialized on a per-object lock and validated for bucket-disjointness
    (the Iceberg concurrent-append pattern); cross-process concurrent
    writers are out of scope (real Iceberg's optimistic catalog CAS)."""

    def __init__(self, root: str, key_col: str = "url", n_buckets: int = 16):
        self.root = root
        self.key_col = key_col
        self.n_buckets = n_buckets
        import threading

        self._lock = threading.Lock()
        # layout validation: the first write freezes (key_col, n_buckets) in
        # _table.json; opening an existing table with a DIFFERENT layout is
        # an error, not a silent misread — e.g. a 32-bucket table opened as
        # 16 buckets would make bucket-pruned reads (resume, IVF probes)
        # silently miss half the manifest keys
        self._validate_table_meta(record=False)

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "_table.json")

    def _validate_table_meta(self, record: bool) -> None:
        want = {"key_col": self.key_col, "n_buckets": self.n_buckets}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                stored = json.load(f)
            if stored != want:
                raise IceliteError(
                    f"icelite table at {self.root} was laid out with {stored} "
                    f"but opened with {want} — bucket ids would not align"
                )
        elif record:
            os.makedirs(self.root, exist_ok=True)
            tmp = self._meta_path + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(want, f, indent=1, sort_keys=True)
            os.replace(tmp, self._meta_path)

    # ------------------------------------------------------------------ paths
    @property
    def _head_path(self) -> str:
        return os.path.join(self.root, "_HEAD")

    @property
    def _schema_path(self) -> str:
        return os.path.join(self.root, "_schema.json")

    def _snap_path(self, sid: int) -> str:
        return os.path.join(self.root, "_snapshots", f"{sid}.json")

    # ------------------------------------------------------------- snapshots
    def exists(self) -> bool:
        return os.path.exists(self._head_path)

    def head_id(self) -> int | None:
        if not self.exists():
            return None
        with open(self._head_path) as f:
            return int(f.read().strip())

    def snapshot(self, sid: int | None = None) -> Snapshot | None:
        sid = sid if sid is not None else self.head_id()
        if sid is None or sid < 0:
            return None
        with open(self._snap_path(sid)) as f:
            return Snapshot.from_json(f.read())

    def snapshots(self) -> list[Snapshot]:
        out: list[Snapshot] = []
        s = self.snapshot()
        while s is not None:
            out.append(s)
            s = self.snapshot(s.parent_id) if s.parent_id is not None else None
        return list(reversed(out))

    def _write_manifest(self, snap: Snapshot) -> None:
        """fsync'd atomic manifest write — EVERY manifest rewrite must go
        through this (a crash after a non-fsync'd os.replace can leave a
        zero-length manifest that bricks the whole snapshot chain)."""
        tmp = self._snap_path(snap.snapshot_id) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(snap.to_json())
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._snap_path(snap.snapshot_id))

    def _commit(self, snap: Snapshot) -> None:
        """The atomic commit point (manifest fsync + HEAD os.replace)."""
        os.makedirs(os.path.join(self.root, "_snapshots"), exist_ok=True)
        self._write_manifest(snap)
        head_tmp = self._head_path + f".tmp-{uuid.uuid4().hex}"
        with open(head_tmp, "w") as f:
            f.write(str(snap.snapshot_id))
            f.flush()
            os.fsync(f.fileno())
        os.replace(head_tmp, self._head_path)

    # ----------------------------------------------------------------- write
    def _write_data(self, df: DataFrame, token: str) -> tuple[dict, dict]:
        """Write df bucket-partitioned under data/<token>; returns
        (files: bucket->paths, file_rows: path->rows from parquet footers).
        The token is unique per write attempt so concurrent writers never
        collide on a directory; a failed attempt leaves unreferenced files
        that expire_snapshots-style GC may remove."""
        out_dir = os.path.join(self.root, "data", token)
        (
            df.withColumn(BUCKET_COL, bucket_expr(self.key_col, self.n_buckets))
            .repartition(BUCKET_COL)
            .write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(out_dir)
        )
        files: dict[str, list[str]] = {}
        file_rows: dict[str, int] = {}
        for bdir in sorted(os.listdir(out_dir)):
            if not bdir.startswith(f"{BUCKET_COL}="):
                continue
            bucket = bdir.split("=", 1)[1]
            for fn in sorted(os.listdir(os.path.join(out_dir, bdir))):
                if not fn.endswith(".parquet"):
                    continue
                rel = os.path.join("data", token, bdir, fn)
                files.setdefault(bucket, []).append(rel)
                file_rows[rel] = pq.read_metadata(os.path.join(self.root, rel)).num_rows
        return files, file_rows

    # ---------------------------------------------------------------- schema
    def table_schema(self) -> dict[str, str] | None:
        """The frozen column->type map recorded at first write, or None."""
        if not os.path.exists(self._schema_path):
            return None
        with open(self._schema_path) as f:
            return json.load(f)

    def _validate_or_record_schema(self, df: DataFrame) -> None:
        """K6 validated insert: the first data write freezes the table
        schema (names + types, nullability/order-insensitive); every later
        append/merge batch is validated against it and rejected with a
        typed error BEFORE any file is written."""
        self._validate_table_meta(record=True)
        incoming = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        stored = self.table_schema()
        if stored is None:
            os.makedirs(self.root, exist_ok=True)
            tmp = self._schema_path + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(incoming, f, indent=1, sort_keys=True)
            os.replace(tmp, self._schema_path)
            return
        if incoming != stored:
            missing = sorted(set(stored) - set(incoming))
            extra = sorted(set(incoming) - set(stored))
            retyped = sorted(
                f"{c}: {stored[c]} -> {incoming[c]}"
                for c in set(stored) & set(incoming)
                if stored[c] != incoming[c]
            )
            raise SchemaMismatchError(
                f"icelite schema mismatch for table {self.root}: "
                f"missing columns {missing}, unexpected columns {extra}, "
                f"type changes {retyped}"
            )

    def create_empty(self, metadata: dict | None = None) -> None:
        if self.exists():
            return
        self._validate_table_meta(record=True)
        os.makedirs(self.root, exist_ok=True)
        self._commit(
            Snapshot(0, None, "create", {}, {}, metadata or {"key": self.key_col, "n_buckets": self.n_buckets})
        )

    def append(self, df: DataFrame, metadata: dict | None = None) -> int:
        """K5/K6 append: new files add to the current file set.  Pure
        addition never conflicts — the manifest is rebuilt from the current
        head under the commit lock.  The batch schema is validated against
        the table schema first (SchemaMismatchError, no files written)."""
        self._validate_or_record_schema(df)
        files, file_rows = self._write_data(df, f"w-{uuid.uuid4().hex[:12]}")
        with self._lock:
            head = self.snapshot()
            sid = (head.snapshot_id + 1) if head else 0
            merged_files = {k: list(v) for k, v in (head.files if head else {}).items()}
            for b, paths in files.items():
                merged_files.setdefault(b, []).extend(paths)
            merged_rows = dict(head.file_rows) if head else {}
            merged_rows.update(file_rows)
            self._commit(
                Snapshot(
                    sid,
                    head.snapshot_id if head else None,
                    "append",
                    merged_files,
                    merged_rows,
                    metadata or {},
                )
            )
        return sid

    def merge(
        self,
        df: DataFrame,
        metadata: dict | None = None,
        touched_buckets: list[int] | None = None,
    ) -> int:
        """K3 idempotent upsert: for every bucket present in ``df``, replace
        rows whose key appears in ``df`` (delete-matched + insert), rewrite
        only those buckets; other buckets carry over by reference.

        Exactly-once visible effect per key: running the same merge twice
        yields the same table (reference save-to-google-sheet.ts:146-240).

        Concurrency: writers touching DISJOINT buckets may run in parallel
        (manifest rebuilt from the current head at commit time, under the
        lock); a same-bucket race raises a commit conflict instead of
        silently losing an update.
        """
        spark = df.sparkSession
        start_head = self.snapshot()
        if start_head is None or not start_head.files:
            return self.append(df, metadata)
        self._validate_or_record_schema(df)

        incoming = df.withColumn(BUCKET_COL, bucket_expr(self.key_col, self.n_buckets))
        if touched_buckets is not None:
            # caller already knows the affected buckets (e.g. the pipeline's
            # bucket-group) — skip the extra job over the incoming DF
            touched = [str(b) for b in touched_buckets]
        else:
            touched = [
                str(r[BUCKET_COL])
                for r in incoming.select(BUCKET_COL).distinct().collect()
            ]
        old_paths = [p for b in touched for p in start_head.files.get(b, [])]
        if old_paths:
            old = spark.read.parquet(*[os.path.join(self.root, p) for p in old_paths])
            # no forced broadcast on the key set: a bucket-group merge at
            # the 100 TB design point carries ~10^8 distinct keys (multi-GB
            # — over Spark's broadcast hard limit and the driver heap);
            # AQE upgrades the anti-join to broadcast at runtime whenever
            # the key relation is actually small, so the hint only removed
            # the planner's ability to fall back
            keep = old.join(
                incoming.select(self.key_col).distinct(),
                self.key_col,
                "left_anti",
            )
            combined = keep.unionByName(incoming.drop(BUCKET_COL))
        else:
            combined = incoming.drop(BUCKET_COL)
        files, file_rows = self._write_data(combined, f"w-{uuid.uuid4().hex[:12]}")
        stray = sorted(set(files) - set(touched))
        if stray:
            # under-covering touched_buckets would APPEND these buckets'
            # rows without anti-joining their old keys — duplicate keys,
            # silently; surface it as a typed layout error instead
            raise IceliteError(
                f"merge wrote buckets {stray} outside touched_buckets "
                f"{sorted(touched)} — the caller's bucket set under-covers "
                "the incoming batch"
            )

        with self._lock:
            head = self.snapshot()
            if head.snapshot_id != start_head.snapshot_id:
                # someone committed since we started: fine iff our buckets
                # were untouched (our anti-join read their old state)
                for b in touched:
                    if head.files.get(b, []) != start_head.files.get(b, []):
                        raise CommitConflictError(
                            f"icelite commit conflict: bucket {b} changed "
                            "under a concurrent merge"
                        )
            sid = head.snapshot_id + 1
            new_files = {
                b: list(paths) for b, paths in head.files.items() if b not in touched
            }
            new_rows = {
                p: head.file_rows[p] for paths in new_files.values() for p in paths
            }
            for b, paths in files.items():
                new_files.setdefault(b, []).extend(paths)
                for p in paths:
                    new_rows[p] = file_rows[p]
            self._commit(
                Snapshot(sid, head.snapshot_id, "merge", new_files, new_rows, metadata or {})
            )
        return sid

    # ------------------------------------------------------------------ read
    def read(
        self,
        spark: SparkSession,
        buckets: list[int] | None = None,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Snapshot-isolated read; ``buckets`` prunes at the manifest level
        (the file list shrinks before Spark ever lists anything).
        ``snapshot_id`` time-travels to an earlier committed state (Iceberg
        ``VERSION AS OF`` semantics — old data files are never mutated)."""
        head = self.snapshot(snapshot_id)
        if head is None or not head.files:
            raise FileNotFoundError(f"icelite table at {self.root} is empty")
        wanted = (
            {str(b) for b in buckets} if buckets is not None else set(head.files)
        )
        paths = [
            os.path.join(self.root, p)
            for b, ps in sorted(head.files.items())
            if b in wanted
            for p in ps
        ]
        if not paths:
            return spark.createDataFrame([], self._any_schema(spark, head))
        return spark.read.parquet(*paths)

    def _any_schema(self, spark: SparkSession, head: Snapshot):
        some = next(p for ps in head.files.values() for p in ps)
        return spark.read.parquet(os.path.join(self.root, some)).schema

    def patch_metadata(self, sid: int, updates: dict) -> None:
        """Amend one snapshot's metadata in place (manifest file only — the
        HEAD pointer is untouched, so this is safe after later commits)."""
        with self._lock:
            snap = self.snapshot(sid)
            snap.metadata.update(updates)
            self._write_manifest(snap)

    # ----------------------------------------------------------- maintenance
    def compact(self, spark: SparkSession, max_files_per_bucket: int = 1) -> int | None:
        """Small-file compaction: any bucket with more data files than
        ``max_files_per_bucket`` is rewritten into one file.  Content is
        unchanged (same rows, new layout) — the lakehouse maintenance op
        that keeps scan task counts proportional to data, not to commit
        history.  Returns the new snapshot id, or None if nothing to do.

        Concurrency follows merge(): the rewrite runs against the starting
        head outside the lock, then the commit re-reads the head under the
        lock and raises a commit conflict if any compacted bucket changed —
        committing against the stale head would silently drop a concurrent
        writer's files from the table view."""
        start_head = self.snapshot()
        if start_head is None:
            return None
        fat = {
            b: ps for b, ps in start_head.files.items() if len(ps) > max_files_per_bucket
        }
        if not fat:
            return None
        paths = [os.path.join(self.root, p) for ps in fat.values() for p in ps]
        rewritten = spark.read.parquet(*paths)
        files, file_rows = self._write_data(rewritten, f"compact-{uuid.uuid4().hex[:12]}")
        with self._lock:
            head = self.snapshot()
            if head.snapshot_id != start_head.snapshot_id:
                for b in fat:
                    if head.files.get(b, []) != start_head.files.get(b, []):
                        raise CommitConflictError(
                            f"icelite commit conflict: bucket {b} changed "
                            "under a concurrent compact"
                        )
            sid = head.snapshot_id + 1
            new_files = {b: list(ps) for b, ps in head.files.items() if b not in fat}
            new_rows = {p: head.file_rows[p] for ps in new_files.values() for p in ps}
            for b, ps in files.items():
                new_files.setdefault(b, []).extend(ps)
                for p in ps:
                    new_rows[p] = file_rows[p]
            self._commit(
                Snapshot(
                    sid,
                    head.snapshot_id,
                    "compact",
                    new_files,
                    new_rows,
                    {"compacted_buckets": sorted(fat)},
                )
            )
        return sid

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Iceberg-style maintenance: drop history older than the last
        ``keep_last`` snapshots and delete data files no newer snapshot
        references.  Readers of retained snapshots are unaffected (their
        file sets are untouched).  Returns the deleted file paths."""
        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return []
        keep, drop = snaps[-keep_last:], snaps[:-keep_last]
        live = {p for s in keep for ps in s.files.values() for p in ps}
        doomed = {
            p for s in drop for ps in s.files.values() for p in ps
        } - live
        for p in doomed:
            full = os.path.join(self.root, p)
            if os.path.exists(full):
                os.remove(full)
        # unlink history: oldest kept snapshot becomes the chain root
        # (under the commit lock — a concurrent _commit must not interleave
        # with the chain rewrite)
        with self._lock:
            root_snap = keep[0]
            root_snap.parent_id = None
            self._write_manifest(root_snap)
            for s in drop:
                try:
                    os.remove(self._snap_path(s.snapshot_id))
                except FileNotFoundError:
                    pass
        return sorted(doomed)

    def remove_orphan_files(self, older_than_s: float = 0.0) -> list[str]:
        """Delete data files referenced by NO snapshot in the retained chain
        — the leftovers of write attempts that crashed before their commit
        (Iceberg's ``remove_orphan_files``; expire_snapshots can't reach
        them because they were never referenced).  ``older_than_s`` guards
        against deleting files of an IN-FLIGHT write (Iceberg defaults to
        3 days); 0 is only safe when no writer is running.  Returns the
        deleted paths (relative)."""
        import time

        live: set[str] = set()
        for s in self.snapshots():
            for ps in s.files.values():
                live.update(ps)
        # directories holding at least one live file keep their Spark
        # sidecars (_SUCCESS, .crc); fully-orphaned write dirs lose them too
        live_dirs = {os.path.dirname(p) for p in live}
        data_root = os.path.join(self.root, "data")
        doomed: list[str] = []
        cutoff = time.time() - older_than_s
        for dirpath, _dirs, files in os.walk(data_root):
            rel_dir = os.path.relpath(dirpath, self.root)
            dir_is_live = any(d == rel_dir or d.startswith(rel_dir + os.sep) for d in live_dirs)
            for fn in files:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.root)
                if rel in live:
                    continue
                if not fn.endswith(".parquet") and dir_is_live:
                    continue  # sidecar of a directory with committed data
                if os.path.getmtime(full) > cutoff:
                    continue
                os.remove(full)
                doomed.append(rel)
        # prune now-empty write directories (rmdir refuses non-empty ones)
        for dirpath, _dirs, _files in os.walk(data_root, topdown=False):
            if dirpath != data_root:
                try:
                    os.rmdir(dirpath)
                except OSError:
                    pass
        return sorted(doomed)

    # --------------------------------------------------------------- lineage
    def row_count(self) -> int:
        head = self.snapshot()
        return sum(head.file_rows.values()) if head else 0

    def committed_groups(self, key: str = "bucket_group") -> list[list[int]]:
        """Resume support: operation metadata of every snapshot in the chain."""
        return [s.metadata[key] for s in self.snapshots() if key in s.metadata]

    def drop(self) -> None:
        if os.path.exists(self.root):
            shutil.rmtree(self.root)
