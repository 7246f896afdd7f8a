"""TableIO: snapshot-capable table access for the engine.

The engine's north rule targets Iceberg tables (snapshot-based
checkpoint/resume, partition-level retention deletes). This sandbox has
no iceberg-spark-runtime jar and no network, so all table access goes
through this thin interface with two implementations:

* :class:`IcebergTableIO` — used when the Iceberg extensions are on the
  session classpath (``spark.sql.extensions`` +
  ``org.apache.iceberg.spark.SparkCatalog``); append = native Iceberg
  snapshot, retention = ``DELETE WHERE`` + ``expire_snapshots``.
* :class:`ParquetTableIO` — partitioned parquet directories plus a
  JSON snapshot manifest (`_snapshots.json`) that emulates Iceberg's
  snapshot ids for checkpointing: every append commits a new snapshot
  listing the files it added; readers pin a snapshot id and read
  exactly its files. Retention drops whole partition directories.

Writers are idempotent per ``commit_key``: re-running a failed job step
with the same key is a no-op (the resume contract in SURVEY.md §3.4).
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Snapshot:
    snapshot_id: str
    committed_at_ms: int
    files: list[str]
    commit_key: str | None = None


class ParquetTableIO:
    """Parquet + JSON-manifest tables with snapshot semantics."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ------------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_snapshots.json")

    def snapshots(self, table: str) -> list[Snapshot]:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return []
        return [Snapshot(**s) for s in json.loads(open(p).read())]

    @contextlib.contextmanager
    def _manifest_lock(self, table: str, timeout_s: float = 30.0):
        """Serialize manifest read-modify-write across concurrent
        writers (e.g. a streaming sink plus a batch job sharing the
        warehouse): O_EXCL lockfile, stale locks broken after 60 s."""
        lock = self._manifest_path(table) + ".lock"
        os.makedirs(os.path.dirname(lock), exist_ok=True)
        deadline = time.time() + timeout_s
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(lock) > 60:
                        # break the stale lock via rename: exactly ONE
                        # waiter wins the rename (unlink-then-create
                        # would let a second waiter's queued unlink
                        # delete the winner's fresh lock — TOCTOU)
                        stale = f"{lock}.stale.{uuid.uuid4().hex[:8]}"
                        os.rename(lock, stale)
                        os.unlink(stale)
                        continue
                except FileNotFoundError:
                    continue
                if time.time() > deadline:
                    raise TimeoutError(f"manifest lock busy: {lock}")
                time.sleep(0.05)
        try:
            yield
        finally:
            os.close(fd)
            with contextlib.suppress(FileNotFoundError):
                os.unlink(lock)

    def _commit(self, table: str, files: list[str],
                commit_key: str | None) -> Snapshot | None:
        with self._manifest_lock(table):
            # re-read inside the lock: another writer may have committed
            # (including this very commit_key) since our pre-check
            snaps = self.snapshots(table)
            if commit_key and any(s.commit_key == commit_key for s in snaps):
                return None
            snap = Snapshot(snapshot_id=uuid.uuid4().hex[:16],
                            committed_at_ms=int(time.time() * 1000),
                            files=files, commit_key=commit_key)
            snaps.append(snap)
            tmp = self._manifest_path(table) + ".tmp"
            with open(tmp, "w") as f:
                json.dump([s.__dict__ for s in snaps], f)
            os.replace(tmp, self._manifest_path(table))  # atomic commit
            return snap

    def committed_keys(self, table: str) -> set[str]:
        return {s.commit_key for s in self.snapshots(table) if s.commit_key}

    # -- I/O -------------------------------------------------------------
    def append(self, table: str, df: DataFrame,
               commit_key: str | None = None) -> Snapshot | None:
        """Write df as a new snapshot; no-op if commit_key already done."""
        if commit_key and commit_key in self.committed_keys(table):
            return None
        subdir = uuid.uuid4().hex[:12]
        path = os.path.join(self.root, table, "data", subdir)
        df.write.mode("overwrite").parquet(path)
        snap = self._commit(table, [path], commit_key)
        if snap is None:
            # lost a same-commit-key race after writing: remove the
            # orphaned data directory no snapshot will ever reference
            shutil.rmtree(path, ignore_errors=True)
        return snap

    def rewrite(self, table: str, df: DataFrame,
                commit_key: str | None = None,
                expected_snapshot_id: str | None = None) -> Snapshot | None:
        """Replace the table's contents up to ``expected_snapshot_id``
        with ``df`` in one atomic manifest swap — the parquet-fallback
        analogue of Iceberg's ``rewrite_data_files`` (compaction). The
        new data is fully written BEFORE the swap; replaced snapshots
        stay in the manifest with emptied file lists so their commit
        keys keep deduplicating replayed appends (crash-between-commits
        safety of plans/checkpoint.py survives a compaction). Old data
        dirs are removed only after the swap commits.

        ``expected_snapshot_id`` is the optimistic-concurrency anchor:
        the snapshot the caller read to build ``df``. Snapshots
        committed AFTER it (e.g. by a streaming sink running alongside
        the batch compactor) keep their files — their rows are not in
        ``df``, so emptying them would be silent data loss. If the
        expected snapshot is no longer in the manifest (retention raced
        the compactor), the rewrite aborts and returns None. With
        ``expected_snapshot_id=None`` the caller asserts ``df`` covers
        the whole table as of the swap, and every prior snapshot is
        replaced (the pre-concurrency behavior — only safe with a
        single writer).

        Collapses time-travel history up to the expected snapshot, like
        running Iceberg expire after a rewrite; no-op when
        ``commit_key`` was already committed.
        """
        if commit_key and commit_key in self.committed_keys(table):
            return None
        subdir = uuid.uuid4().hex[:12]
        path = os.path.join(self.root, table, "data", subdir)
        df.write.mode("overwrite").parquet(path)  # reads old files: pre-swap
        with self._manifest_lock(table):
            snaps = self.snapshots(table)
            if commit_key and any(s.commit_key == commit_key
                                  for s in snaps):
                shutil.rmtree(path, ignore_errors=True)
                return None
            if expected_snapshot_id is None:
                n_replace = len(snaps)
            else:
                idx = [i for i, s in enumerate(snaps)
                       if s.snapshot_id == expected_snapshot_id]
                if not idx:
                    # anchor vanished (retention raced us): df may be
                    # stale in a way we can't reason about — abort
                    shutil.rmtree(path, ignore_errors=True)
                    return None
                n_replace = idx[0] + 1
            old_files = [f for s in snaps[:n_replace] for f in s.files]
            for s in snaps[:n_replace]:
                s.files = []
            snap = Snapshot(snapshot_id=uuid.uuid4().hex[:16],
                            committed_at_ms=int(time.time() * 1000),
                            files=[path], commit_key=commit_key)
            # insert at the anchor position, NOT the manifest tail:
            # a cumulative read at any concurrent snapshot X that
            # landed after the anchor must still see the compacted
            # rows (the emptied base snapshots precede X), and
            # _backfill_lineage's read-up-to-rewrite must not include
            # concurrent appends (ADVICE r4)
            snaps.insert(n_replace, snap)
            tmp = self._manifest_path(table) + ".tmp"
            with open(tmp, "w") as f:
                json.dump([s.__dict__ for s in snaps], f)
            os.replace(tmp, self._manifest_path(table))
        for f in old_files:
            shutil.rmtree(f, ignore_errors=True)
        return snap

    def read(self, table: str, snapshot_id: str | None = None) -> DataFrame:
        snaps = self.snapshots(table)
        if snapshot_id is not None:
            upto = []
            for s in snaps:
                upto.append(s)
                if s.snapshot_id == snapshot_id:
                    break
            snaps = upto
        files = [f for s in snaps for f in s.files]
        if not files:
            raise FileNotFoundError(f"table {table} has no snapshots")
        return self.spark.read.parquet(*files)

    def current_snapshot_id(self, table: str) -> str | None:
        snaps = self.snapshots(table)
        return snaps[-1].snapshot_id if snaps else None

    def delete_snapshots_before(self, table: str, cutoff_ms: int) -> int:
        """Retention: drop whole snapshots older than the cutoff (the
        partition-prune analogue of Iceberg DELETE WHERE + expire)."""
        import shutil
        with self._manifest_lock(table):
            snaps = self.snapshots(table)
            keep, dropped = [], 0
            for s in snaps:
                if s.committed_at_ms < cutoff_ms:
                    for f in s.files:
                        shutil.rmtree(f, ignore_errors=True)
                    dropped += 1
                else:
                    keep.append(s)
            tmp = self._manifest_path(table) + ".tmp"
            with open(tmp, "w") as f:
                json.dump([s.__dict__ for s in keep], f)
            os.replace(tmp, self._manifest_path(table))
            return dropped


class IcebergTableIO:
    """Iceberg-backed implementation (requires iceberg-spark-runtime on
    the classpath; configure e.g.::

        spark.sql.catalog.eng = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.eng.type = hadoop
        spark.sql.catalog.eng.warehouse = <path>

    Not exercisable in this sandbox (no jar, no network) — the pytest
    suite covers ParquetTableIO; this class keeps the call surface
    identical so a cluster deployment only swaps the constructor.)
    """

    def __init__(self, spark: SparkSession, catalog: str = "eng") -> None:
        self.spark = spark
        self.catalog = catalog
        jvm_ok = True
        try:
            spark.sql(f"SHOW NAMESPACES IN {catalog}")
        except Exception as exc:  # pragma: no cover - no jar in sandbox
            jvm_ok = False
            self._err = exc
        if not jvm_ok:  # pragma: no cover
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} unavailable; use "
                f"ParquetTableIO or add iceberg-spark-runtime") from self._err

    def _fq(self, table: str) -> str:
        return f"{self.catalog}.db.{table}"

    def append(self, table: str, df: DataFrame,
               commit_key: str | None = None):  # pragma: no cover
        fq = self._fq(table)
        if commit_key:
            done = {r.commit_key for r in self.spark.sql(
                f"SELECT snapshot_id, summary['commit_key'] AS commit_key "
                f"FROM {fq}.snapshots").collect() if r.commit_key}
            if commit_key in done:
                return None
        writer = df.writeTo(fq)
        if commit_key:
            writer = writer.option("snapshot-property.commit_key", commit_key)
        writer.append()

    def read(self, table: str,
             snapshot_id: str | None = None) -> DataFrame:  # pragma: no cover
        if snapshot_id:
            return (self.spark.read.option("snapshot-id", snapshot_id)
                    .table(self._fq(table)))
        return self.spark.table(self._fq(table))

    def delete_where(self, table: str, predicate: str):  # pragma: no cover
        self.spark.sql(f"DELETE FROM {self._fq(table)} WHERE {predicate}")

    def expire_snapshots(self, table: str,
                         older_than_ms: int):  # pragma: no cover
        self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots("
            f"table => '{self._fq(table)}', "
            f"older_than => TIMESTAMP '{older_than_ms}')")


def open_table_io(spark: SparkSession, root: str):
    """Prefer Iceberg when configured; fall back to parquet+manifest."""
    try:
        return IcebergTableIO(spark)
    except Exception:
        return ParquetTableIO(spark, root)
