#!/usr/bin/env python
"""Encode scaling decomposition: attribute the 2→8 core encode gap
stage by stage, the companion of tools/rollup_decomp.py.

The encode pipeline is repartition(series,block) →
sortWithinPartitions → mapInArrow(segmented C kernel) → sink. The
kernel itself scales at ~0.93 over 2→8 pinned processes
(tools/kernel_scaling.py), so the end-to-end gap must live in the
JVM/transport layers. Variants, each adding one layer:

  shuffle_sort    repartition + sortWithinPartitions + noop sink —
                  the shuffle/sort floor, zero Python.
  arrow_identity  same layout + a mapInArrow PASS-THROUGH (batches in,
                  batches out) + noop — adds the Arrow serialization
                  and Python-worker round trip, zero kernel work.
  full_encode     encode_points + noop — adds the codec kernel.

Usage: python tools/encode_decomp.py            # one JSON line
Env:   ENC_DECOMP_N_CONV (default 40000), ENC_DECOMP_REPS (default 3),
       ENC_DECOMP_LEVELS (default "2,8").

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

N_CONV = int(os.environ.get("ENC_DECOMP_N_CONV", "40000"))
MEAN_TURNS = int(os.environ.get("ENC_DECOMP_MEAN_TURNS", "300"))
REPS = int(os.environ.get("ENC_DECOMP_REPS", "3"))
LEVELS = tuple(int(x) for x in
               os.environ.get("ENC_DECOMP_LEVELS", "2,8").split(","))
VARIANTS = ("shuffle_sort", "arrow_identity", "full_encode")


def _single(cpus: int, tpath: str) -> None:
    from gorillaspark.operators.encode import encode_points
    from gorillaspark.operators.normalize import block_key, turn_latency_points
    from gorillaspark.plans.session import build_session

    spark = build_session(
        app=f"encdecomp-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra={"spark.sql.adaptive.coalescePartitions.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    pts = turn_latency_points(spark.read.parquet(tpath)).cache()
    n = pts.count()
    res: dict = {"cpus": cpus, "n_points": n}

    def laid_out():
        p = pts.withColumn("block_ts", block_key("ts_ms"))
        return (p.repartition(64, "series_key", "block_ts")
                .sortWithinPartitions("series_key", "block_ts", "ts_ms"))

    def passthrough(batches):
        yield from batches

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    jobs = {
        "shuffle_sort": lambda: noop(laid_out()),
        "arrow_identity": lambda: noop(
            laid_out().mapInArrow(
                passthrough,
                "series_key string, ts_ms long, value double, "
                "block_ts long")),
        "full_encode": lambda: noop(encode_points(pts, "double")),
    }
    for name in VARIANTS:
        job = jobs[name]
        job()  # warm-up
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            job()
            times.append(round(time.perf_counter() - t0, 3))
        res[name] = {"reps": times, "min_s": min(times)}
    pts.unpersist()
    spark.stop()
    print("RESULT " + json.dumps(res))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        _single(int(sys.argv[2]), sys.argv[3])
        return

    from gorillaspark.plans.session import build_session
    from gorillaspark.sources.transcripts import generate_transcripts
    tdir = tempfile.mkdtemp(prefix="gsencdec-",
        dir="/dev/shm" if os.access("/dev/shm", os.W_OK) else None)
    tpath = f"{tdir}/transcripts"
    s = build_session(app="encdecomp-gen", master="local[32]")
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
        for k in VARIANTS:
            eff[k] = round(
                (results[lo][k]["min_s"] / results[hi][k]["min_s"]) / r, 3)
    print(json.dumps({"levels": results, "efficiency_2to8": eff}))


if __name__ == "__main__":
    main()
