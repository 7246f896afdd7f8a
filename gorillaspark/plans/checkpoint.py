"""Checkpoint / lineage / metrics: resumable jobs.

Contract (north rule): jobs are resumable from snapshot checkpoints
with *per-partition lineage and metrics rows*. Implementation:

* work is partitioned into logical units (here: day partitions of the
  input); each unit's completion is one row in the ``_meta`` table:
  ``(job_id, unit, status, rows_in, rows_out, snapshot_id, wall_ms)``;
* a restarted job anti-joins pending units against completed ``_meta``
  rows — only unfinished units re-run;
* output appends are keyed ``commit_key = f"{job_id}/{unit}"`` so a
  crash *between* output commit and meta commit re-runs the unit but
  the TableIO append is a no-op (idempotent exactly-once output).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

META_TABLE = "_meta"

META_SCHEMA = StructType([
    StructField("job_id", StringType(), False),
    StructField("unit", StringType(), False),
    StructField("status", StringType(), False),
    StructField("rows_out", LongType(), True),
    StructField("out_partitions", LongType(), True),
    StructField("out_bytes_est", LongType(), True),
    StructField("snapshot_id", StringType(), True),
    StructField("wall_ms", LongType(), True),
    StructField("committed_at_ms", LongType(), True),
])


def completed_units(spark: SparkSession, io, job_id: str) -> set[str]:
    try:
        meta = io.read(META_TABLE)
    except FileNotFoundError:
        return set()
    rows = (meta.where((F.col("job_id") == job_id)
                       & (F.col("status") == "done"))
            .select("unit").distinct().collect())
    return {r.unit for r in rows}


def pending_units(all_units: list[str], done: set[str]) -> list[str]:
    return [u for u in all_units if u not in done]


def record_unit(spark: SparkSession, io, job_id: str, unit: str,
                rows_out: int, out_partitions: int, out_bytes_est: int,
                snapshot_id: str | None, wall_ms: int) -> None:
    row = [(job_id, unit, "done", rows_out, out_partitions,
            out_bytes_est, snapshot_id or "", wall_ms,
            int(time.time() * 1000))]
    io.append(META_TABLE, spark.createDataFrame(row, META_SCHEMA),
              commit_key=f"meta/{job_id}/{unit}")


def unit_metrics(spark: SparkSession, io, job_id: str):
    """The per-unit lineage + metrics rows for a job (throughput,
    output volume, snapshot ids) — the operational view the north rule
    asks for; empty DataFrame if the job never ran."""
    from pyspark.sql import functions as F
    try:
        meta = io.read(META_TABLE)
    except FileNotFoundError:
        return spark.createDataFrame([], META_SCHEMA)
    return (meta.where(F.col("job_id") == job_id)
            .withColumn("rows_per_sec",
                        F.col("rows_out")
                        / F.greatest(F.col("wall_ms"), F.lit(1)) * 1000))


def run_resumable(spark: SparkSession, io, job_id: str,
                  units: list[str],
                  unit_fn,
                  out_table: str) -> dict[str, int]:
    """Drive a unit-at-a-time resumable job.

    ``unit_fn(unit) -> DataFrame`` produces a unit's output; completed
    units are skipped on re-run. Each unit commits one lineage+metrics
    row (rows, partitions, estimated bytes, snapshot id, wall time).
    Returns {unit: rows_out} for the units executed in THIS invocation.
    """
    from pyspark.sql import functions as F

    done = completed_units(spark, io, job_id)
    ran: dict[str, int] = {}
    for unit in pending_units(units, done):
        ran[unit] = _commit_unit(spark, io, job_id, unit,
                                 unit_fn(unit), out_table)
    return ran


def _commit_unit(spark: SparkSession, io, job_id: str, unit: str,
                 out: DataFrame, out_table: str) -> int:
    """Materialize + append one unit's output and record its
    lineage/metrics row. Returns rows_out."""
    t0 = time.time()
    out = out.cache()
    rows_out = out.count()
    n_part = out.rdd.getNumPartitions()
    # cheap volume estimate: words column when present (encoded
    # blocks), else row count * avg-ish width
    if "words" in out.columns:
        bytes_est = (out.agg(F.sum(F.size("words")))
                     .collect()[0][0] or 0) * 8
    else:
        bytes_est = rows_out * 64
    snap = io.append(out_table, out, commit_key=f"{job_id}/{unit}")
    out.unpersist()
    record_unit(spark, io, job_id, unit, rows_out, n_part,
                int(bytes_est),
                snap.snapshot_id if snap else None,
                int((time.time() - t0) * 1000))
    return rows_out


def run_resumable_shared(spark: SparkSession, io,
                         stages: list[tuple],
                         units: list[str],
                         shared_fn) -> dict[str, dict[str, int]]:
    """Drive several resumable stages off ONE shared scan per unit.

    ``stages`` is a list of ``(job_id, stage_fn, out_table)`` where
    ``stage_fn(shared_df) -> DataFrame``; ``shared_fn(unit)`` derives
    the unit's shared input (e.g. the day's latency points), which is
    persisted once and fed to every stage still pending for that unit.
    Each stage keeps its OWN ``_meta`` ledger and idempotent commit
    key, so resumability semantics are identical to running
    :func:`run_resumable` per stage — but the expensive source scan
    happens once per unit instead of once per stage per unit (at
    100 TB the difference between 1x and len(stages)x ingest cost).

    Returns {job_id: {unit: rows_out}} for units executed this
    invocation.
    """
    done = {job_id: completed_units(spark, io, job_id)
            for job_id, _, _ in stages}
    ran: dict[str, dict[str, int]] = {job_id: {}
                                      for job_id, _, _ in stages}
    for unit in units:
        todo = [(j, fn, tbl) for j, fn, tbl in stages
                if unit not in done[j]]
        if not todo:
            continue
        shared = shared_fn(unit)
        if len(todo) > 1:  # a single pending stage needs no pin
            shared = shared.persist()
        try:
            for job_id, stage_fn, out_table in todo:
                ran[job_id][unit] = _commit_unit(
                    spark, io, job_id, unit, stage_fn(shared),
                    out_table)
        finally:
            if len(todo) > 1:
                shared.unpersist()
    return ran
