"""End-to-end resumable job: gorillaspark.jobs.rollup_job driven twice
over the same warehouse — the second run must be a no-op (idempotent
commit keys + per-unit lineage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gorillaspark.jobs import rollup_job
from gorillaspark.operators.normalize import turn_latency_points
from gorillaspark.plans.checkpoint import completed_units
from gorillaspark.sources.tableio import ParquetTableIO


@pytest.fixture(scope="module")
def job_env(spark, tmp_path_factory, transcripts):
    root = tmp_path_factory.mktemp("jobwh")
    tpath = str(root / "transcripts")
    transcripts.write.mode("overwrite").parquet(tpath)
    wh = str(root / "warehouse")
    return tpath, wh


def _run(spark, tpath, wh, job_id="jt"):
    # drive the job's unit loop directly against the session fixture
    # (spark-submit wraps exactly this; build_session would start a
    # second context in-process)
    io = ParquetTableIO(spark, wh)
    transcripts = spark.read.parquet(tpath)
    units = rollup_job.day_units(transcripts)
    from gorillaspark.operators.encode import encode_points
    from gorillaspark.operators.normalize import validate_points
    from gorillaspark.plans.checkpoint import run_resumable

    def day_blocks(day):
        tday = transcripts.where(
            F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd")
            == day)
        return encode_points(validate_points(turn_latency_points(tday)))

    ran = run_resumable(spark, io, f"{job_id}-encode", units, day_blocks,
                        out_table="blocks")
    return io, units, ran


def test_job_runs_and_resumes(spark, job_env, transcripts):
    tpath, wh = job_env
    io, units, ran1 = _run(spark, tpath, wh)
    assert set(ran1) == set(units) and len(units) > 1
    total_pts = io.read("blocks").agg(F.sum("n_points")).collect()[0][0]
    expected = turn_latency_points(transcripts).count()
    assert total_pts == expected
    # second invocation: nothing pending, no duplicates
    io2, units2, ran2 = _run(spark, tpath, wh)
    assert ran2 == {}
    assert io2.read("blocks").agg(F.sum("n_points")).collect()[0][0] \
        == expected
    assert completed_units(spark, io2, "jt-encode") == set(units)
