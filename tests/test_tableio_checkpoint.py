"""TableIO snapshots, idempotent commits, resumable jobs, retention."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gorillaspark.operators.retention import (
    RetentionPolicy,
    apply_retention,
    retention_sweep,
)
from gorillaspark.plans.checkpoint import completed_units, run_resumable
from gorillaspark.sources.tableio import ParquetTableIO


@pytest.fixture()
def io(spark, tmp_path):
    return ParquetTableIO(spark, str(tmp_path / "wh"))


def test_snapshot_append_read(spark, io):
    df1 = spark.range(5).withColumn("v", F.lit("a"))
    df2 = spark.range(3).withColumn("v", F.lit("b"))
    s1 = io.append("t", df1)
    assert io.read("t").count() == 5
    s2 = io.append("t", df2)
    assert io.read("t").count() == 8
    # snapshot pinning: reading at s1 excludes s2's rows
    assert io.read("t", snapshot_id=s1.snapshot_id).count() == 5
    assert io.current_snapshot_id("t") == s2.snapshot_id


def test_idempotent_commit_key(spark, io):
    df = spark.range(4)
    assert io.append("t", df, commit_key="k1") is not None
    assert io.append("t", df, commit_key="k1") is None  # no-op replay
    assert io.read("t").count() == 4


def test_resumable_job_skips_done_units(spark, io):
    calls = []

    def unit_fn(u):
        calls.append(u)
        return spark.range(2).withColumn("unit", F.lit(u))

    ran1 = run_resumable(spark, io, "job1", ["d1", "d2", "d3"], unit_fn,
                         out_table="out")
    assert set(ran1) == {"d1", "d2", "d3"}
    assert io.read("out").count() == 6
    # simulate restart: only new unit runs, outputs not duplicated
    calls.clear()
    ran2 = run_resumable(spark, io, "job1", ["d1", "d2", "d3", "d4"],
                         unit_fn, out_table="out")
    assert set(ran2) == {"d4"} and calls == ["d4"]
    assert io.read("out").count() == 8
    assert completed_units(spark, io, "job1") == {"d1", "d2", "d3", "d4"}


def test_crash_between_output_and_meta_is_exactly_once(spark, io):
    """If a crash lands after the output append but before the meta
    row, the re-run re-executes the unit but the output append is a
    keyed no-op — no duplicate rows."""
    df = spark.range(3).withColumn("unit", F.lit("d1"))
    io.append("out", df, commit_key="job2/d1")   # output committed…
    # …crash before meta; restart:
    ran = run_resumable(spark, io, "job2", ["d1"],
                        lambda u: spark.range(3).withColumn(
                            "unit", F.lit(u)),
                        out_table="out")
    assert ran == {"d1": 3}
    assert io.read("out").count() == 3           # not 6


def test_retention_filter_and_sweep(spark, io):
    now = 100 * 86_400_000
    pol = RetentionPolicy()
    df = spark.createDataFrame(
        [(i * 86_400_000,) for i in range(80, 100)], "bucket_ms: long")
    kept = apply_retention(df, "raw", now, pol, bucket_col="bucket_ms")
    assert kept.count() == 7  # days 93..99 within the 7-day raw window
    # physical sweep: old snapshots dropped wholesale
    io.append("blocks", spark.range(2))
    snaps = io.snapshots("blocks")
    snaps[0].committed_at_ms = 0  # age it
    import json
    with open(io._manifest_path("blocks"), "w") as f:
        json.dump([s.__dict__ for s in snaps], f)
    dropped = retention_sweep(io, "blocks", "raw", now_ms=10**15)
    assert dropped == 1
    with pytest.raises(FileNotFoundError):
        io.read("blocks")


def test_unit_metrics_rows(spark, io):
    from gorillaspark.plans.checkpoint import run_resumable, unit_metrics

    run_resumable(spark, io, "jm", ["u1", "u2"],
                  lambda u: spark.range(10).withColumn("unit", F.lit(u)),
                  out_table="out")
    m = unit_metrics(spark, io, "jm").toPandas()
    assert len(m) == 2
    assert (m["rows_out"] == 10).all()
    assert (m["out_partitions"] >= 1).all()
    assert (m["out_bytes_est"] > 0).all()
    assert (m["wall_ms"] >= 0).all()
    assert (m["committed_at_ms"] > 0).all()
    assert (m["rows_per_sec"] > 0).all()


def test_concurrent_appends_lose_no_snapshot(spark, io):
    """The manifest lock must serialize read-modify-write commits:
    N threads appending concurrently → exactly N snapshots survive."""
    from concurrent.futures import ThreadPoolExecutor

    def one(i):
        io.append("conc", spark.range(3).withColumn("w", F.lit(i)),
                  commit_key=f"writer/{i}")

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(one, range(8)))
    snaps = io.snapshots("conc")
    assert len(snaps) == 8
    assert {s.commit_key for s in snaps} == {f"writer/{i}" for i in range(8)}
    assert io.read("conc").count() == 24
    # racing writers with the SAME key: exactly one commit wins
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(lambda _: io.append(
            "conc", spark.range(1), commit_key="dup"), range(8)))
    assert sum(1 for s in io.snapshots("conc")
               if s.commit_key == "dup") == 1
