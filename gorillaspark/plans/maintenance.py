"""Table maintenance: block compaction as an idempotent, lineage-
recorded sweep — the piece that runs alongside retention in the
resumable rollup job.

Streaming ingestion (streaming/stream_rollup.py) can leave a day's
block split across micro-batch fragments when a flush lands mid-day;
fragments decode correctly but waste per-block headers and inflate
block counts. ``compact_sweep`` repairs the table in place:

* only fragmented (series_key, block_ts) groups decode → re-encode
  (operators/encode.compact_blocks — proven bit-identical to a
  single-pass encode); the untouched majority is rewritten as-is;
* the rewrite is one atomic manifest swap (ParquetTableIO.rewrite,
  the Iceberg ``rewrite_data_files`` analogue) keyed by the snapshot
  it compacted, so a crashed/re-run sweep is a no-op and a *changed*
  table compacts again under a fresh key;
* each sweep commits a ``_meta`` lineage row (job_id =
  ``{job_id}-compact``, unit = the compacted snapshot id). A crash
  BETWEEN the rewrite commit and the lineage commit is repaired on
  the next sweep: committed ``{job_id}/compact/*`` keys with no
  matching ``_meta`` row are backfilled (wall_ms 0 marks a backfill),
  mirroring run_resumable's crash-between-commits contract.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.encode import compact_blocks
from .checkpoint import completed_units, record_unit


def fragmented_group_count(blocks) -> int:
    """Number of (series_key, block_ts) groups split across >1 block."""
    return (blocks.groupBy("series_key", "block_ts")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1).count())


def _backfill_lineage(spark: SparkSession, io, table: str,
                      job_id: str) -> None:
    """Repair lineage for compactions whose rewrite committed but whose
    ``_meta`` row was lost to a crash (idempotent: record_unit dedups
    on its own commit key)."""
    prefix = f"{job_id}/compact/"
    done = completed_units(spark, io, f"{job_id}-compact")
    snaps = {s.commit_key: s for s in io.snapshots(table) if s.commit_key}
    for k, s in snaps.items():
        if not k.startswith(prefix):
            continue
        unit = k[len(prefix):]
        if unit in done:
            continue
        # count the compacted snapshot itself, not the live table —
        # appends that landed after the rewrite must not inflate the
        # backfilled metric
        rows = io.read(table, snapshot_id=s.snapshot_id).count()
        record_unit(spark, io, f"{job_id}-compact", unit=unit,
                    rows_out=rows, out_partitions=0, out_bytes_est=0,
                    snapshot_id=s.snapshot_id, wall_ms=0)


def compact_sweep(spark: SparkSession, io, table: str = "blocks",
                  job_id: str = "maintenance",
                  value_kind: str = "double") -> int:
    """Compact fragmented day-blocks in ``table``; returns the number
    of fragmented groups repaired (0 = clean table or no-op replay).
    Idempotent per table snapshot: the rewrite commit key embeds the
    snapshot id being compacted.
    """
    _backfill_lineage(spark, io, table, job_id)
    # pin the read at the snapshot the commit key names: an append
    # landing between here and the rewrite neither enters `compacted`
    # nor gets its files dropped (rewrite preserves snapshots after
    # expected_snapshot_id)
    snap_id = io.current_snapshot_id(table)
    if snap_id is None:
        return 0
    blocks = io.read(table, snapshot_id=snap_id)
    key = f"{job_id}/compact/{snap_id}"
    if key in io.committed_keys(table):
        return 0
    n_frag = fragmented_group_count(blocks)
    if n_frag == 0:
        return 0
    t0 = time.time()
    compacted = compact_blocks(blocks, value_kind).localCheckpoint()
    rows_out = compacted.count()
    snap = io.rewrite(table, compacted, commit_key=key,
                      expected_snapshot_id=snap_id)
    if snap is None:
        # nothing landed: either retention removed the anchor snapshot
        # (rewrite aborted) or a concurrent sweep won the same commit
        # key (that sweep owns the lineage row) — recording a success
        # here would fabricate a compaction that never happened
        return 0
    record_unit(spark, io, f"{job_id}-compact", unit=str(snap_id),
                rows_out=rows_out,
                out_partitions=compacted.rdd.getNumPartitions(),
                out_bytes_est=(compacted.agg(F.sum(F.size("words")))
                               .collect()[0][0] or 0) * 8,
                snapshot_id=snap.snapshot_id if snap else None,
                wall_ms=max(int((time.time() - t0) * 1000), 1))
    # the rewrite changed the table's file set in place — memoized
    # spread() widen decisions keyed on the pre-rewrite plan are now
    # stale (r7 ADVICE); force the next stage to re-evaluate
    from ..operators.spread import invalidate as _spread_invalidate
    _spread_invalidate()
    return n_frag
