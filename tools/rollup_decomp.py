#!/usr/bin/env python
"""Rollup scaling decomposition (VERDICT r2 #4): attribute the 2→8
core efficiency gap stage by stage.

Hypothesis chain, each variant isolating one mechanism:

  scan_only      cached scan + codegen scalar aggregate — no shuffle,
                 no group hash table: the memory/scan ceiling.
  shuffle_only   groupBy(keys).count() — pure shuffle + codegen hash
                 aggregate, no percentile: the plan's floor.
  no_p95         cnt/sum/avg/min/max without p95 — still whole-stage
                 codegen HashAggregate.
  p95_fb128      the full rollup with Spark's DEFAULT
                 spark.sql.objectHashAggregate.sortBased.
                 fallbackThreshold = 128: because F.percentile is a
                 TypedImperativeAggregate the whole aggregate runs as
                 ObjectHashAggregate, and with ≫128 groups per
                 partition it silently degrades to SORT-based
                 aggregation — both map side and reduce side.
  p95_fb2m       same plan with the threshold raised to 2M groups:
                 the aggregate stays a real hash aggregate (memory per
                 group is the same value buffer either way; bucketed
                 groups bound it).

Usage: python tools/rollup_decomp.py            # writes one JSON line
Env:   DECOMP_N_CONV (default 40000), DECOMP_REPS (default 3),
       DECOMP_LEVELS (default "2,8").

Same pinning protocol as tools/bench_scaling.py (taskset over the
whole process tree, tmpfs shuffle, min-of-reps after warm-up).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_CONV = int(os.environ.get("DECOMP_N_CONV", "40000"))
MEAN_TURNS = int(os.environ.get("DECOMP_MEAN_TURNS", "300"))
REPS = int(os.environ.get("DECOMP_REPS", "3"))
LEVELS = tuple(int(x) for x in
               os.environ.get("DECOMP_LEVELS", "2,8").split(","))


def _single(cpus: int, tpath: str) -> None:
    from pyspark.sql import functions as F

    from gorillaspark.operators.normalize import turn_latency_points
    from gorillaspark.operators.rollup import rollup_tier
    from gorillaspark.plans.session import build_session

    res: dict = {"cpus": cpus}

    def run_variant(name: str, threshold: int | None, fn_name: str):
        extra = {"spark.sql.adaptive.coalescePartitions.enabled": "false"}
        if threshold is not None:
            extra["spark.sql.objectHashAggregate.sortBased."
                  "fallbackThreshold"] = str(threshold)
        spark = build_session(app=f"decomp-{cpus}-{name}",
                              master=f"local[{cpus}]",
                              shuffle_partitions=64, extra=extra)
        spark.sparkContext.setLogLevel("ERROR")
        pts = turn_latency_points(spark.read.parquet(tpath)).cache()
        n = pts.count()
        res["n_points"] = n

        def hashed_keys_group(df):
            return df.groupBy(F.xxhash64("series_key").alias("_h64"),
                              F.hash("series_key").alias("_h32"),
                              F.window(F.timestamp_millis("ts_ms"),
                                       "1 minute")["start"].alias("bucket"))

        if fn_name == "scan_only":
            # cached-scan + codegen scalar agg: no shuffle beyond 64
            # partial rows — isolates the memory/scan ceiling
            job = lambda: pts.agg(                                 # noqa: E731
                F.sum("value"),
                F.avg("ts_ms"),  # avg: no int64-sum overflow (ANSI)
                F.sum(F.xxhash64("series_key") % F.lit(1_000_003))
            ).collect()
        elif fn_name == "shuffle_only":
            job = lambda: hashed_keys_group(pts).count().count()  # noqa: E731
        elif fn_name == "no_p95":
            job = lambda: hashed_keys_group(pts).agg(              # noqa: E731
                F.count("value").alias("cnt"),
                F.sum("value").alias("sum"),
                F.avg("value").alias("avg"),
                F.min("value").alias("min"),
                F.max("value").alias("max")).count()
        else:
            job = lambda: rollup_tier(                             # noqa: E731
                pts, "1m", hashed_keys=True).count()
        job()  # warm-up
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            job()
            times.append(round(time.perf_counter() - t0, 3))
        pts.unpersist()
        spark.stop()
        res[name] = {"reps": times, "min_s": min(times)}

    run_variant("scan_only", None, "scan_only")
    run_variant("shuffle_only", None, "shuffle_only")
    run_variant("no_p95", None, "no_p95")
    run_variant("p95_fb128", 128, "rollup")
    run_variant("p95_fb2m", 2_097_152, "rollup")
    print("RESULT " + json.dumps(res))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        _single(int(sys.argv[2]), sys.argv[3])
        return

    from gorillaspark.plans.session import build_session
    from gorillaspark.sources.transcripts import generate_transcripts
    tdir = tempfile.mkdtemp(prefix="gsdecomp-",
        dir="/dev/shm" if os.access("/dev/shm", os.W_OK) else None)
    tpath = f"{tdir}/transcripts"
    s = build_session(app="decomp-gen", master="local[32]")
    s.sparkContext.setLogLevel("ERROR")
    generate_transcripts(s, n_conv=N_CONV, mean_turns=MEAN_TURNS,
                         hot_share=0.2).write.mode("overwrite") \
        .parquet(tpath)
    s.stop()

    results = {}
    try:
        for c in LEVELS:
            cmd = ["taskset", "-c", f"0-{c - 1}", sys.executable,
                   str(Path(__file__).resolve()), "--single", str(c), tpath]
            env = dict(os.environ)
            env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 cwd=str(REPO), env=env)
            if out.returncode != 0:
                raise RuntimeError(
                    f"pinned run at {c} cores failed:\n"
                    f"{out.stderr[-3000:]}")
            for line in out.stdout.splitlines():
                if line.startswith("RESULT "):
                    results[c] = json.loads(line[len("RESULT "):])
    finally:
        shutil.rmtree(tdir, ignore_errors=True)

    eff = {}
    if len(LEVELS) == 2:
        lo, hi = LEVELS
        r = hi / lo
        for k in ("scan_only", "shuffle_only", "no_p95", "p95_fb128",
                  "p95_fb2m"):
            eff[k] = round(
                (results[lo][k]["min_s"] / results[hi][k]["min_s"]) / r, 3)
    print(json.dumps({"levels": results, "efficiency_2to8": eff}))


if __name__ == "__main__":
    main()
