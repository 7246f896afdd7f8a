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
        t0 = time.time()
        out = unit_fn(unit)
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
        ran[unit] = rows_out
    return ran
