#!/usr/bin/env python
"""Scaling-efficiency evidence: the same job at local[8] vs local[32]
on the same input (the sandbox stand-in for N vs 4N executors, per
BASELINE.md). Writes BENCH/BASELINE.md.

Efficiency = (T_8 / T_32) / 4 — 1.0 is perfect linear scaling.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_CONV = int(os.environ.get("SCALE_N_CONV", "20000"))
MEAN_TURNS = int(os.environ.get("SCALE_MEAN_TURNS", "300"))
LEVELS = [int(x) for x in
          os.environ.get("SCALE_LEVELS", "8,32").split(",")]


def run_at(cpus: int, tpath: str) -> dict:
    from pyspark.sql import functions as F

    from gorillaspark.operators.encode import decode_points, encode_points
    from gorillaspark.operators.normalize import turn_latency_points
    from gorillaspark.operators.rollup import rollup_tier
    from gorillaspark.plans.session import build_session

    spark = build_session(app=f"scale-{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=64)  # fixed across levels: identical work split
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(tpath)
    pts = turn_latency_points(transcripts).cache()
    n_pts = pts.count()

    scratch = tempfile.mkdtemp(prefix=f"gsscale{cpus}-")
    res = {"cpus": cpus, "n_points": n_pts}
    t0 = time.perf_counter()
    encode_points(pts, "double").write.mode("overwrite").parquet(
        f"{scratch}/blocks")
    res["encode_s"] = time.perf_counter() - t0
    blocks = spark.read.parquet(f"{scratch}/blocks")
    t0 = time.perf_counter()
    decode_points(blocks).count()
    res["decode_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    rollup_tier(pts, "1m").count()
    res["rollup_s"] = time.perf_counter() - t0
    pts.unpersist()
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return res


def main() -> None:
    from gorillaspark.plans.session import build_session
    from gorillaspark.sources.transcripts import generate_transcripts

    tdir = tempfile.mkdtemp(prefix="gsscale-corpus-")
    tpath = f"{tdir}/transcripts"
    s = build_session(app="scale-gen", master="local[32]")
    s.sparkContext.setLogLevel("ERROR")
    generate_transcripts(s, n_conv=N_CONV, mean_turns=MEAN_TURNS,
                         hot_share=0.2).write.mode("overwrite") \
        .parquet(tpath)
    s.stop()

    results = [run_at(c, tpath) for c in LEVELS]
    shutil.rmtree(tdir, ignore_errors=True)

    lo, hi = results[0], results[-1]
    ratio = hi["cpus"] / lo["cpus"]
    eff = {k: round((lo[f"{k}_s"] / hi[f"{k}_s"]) / ratio, 3)
           for k in ("encode", "decode", "rollup")}

    md = ["# BENCH — scaling evidence (N vs 4N parallelism)", "",
          f"Same job, same input ({hi['n_points']:,} latency points from "
          f"{N_CONV:,} conversations), local[{lo['cpus']}] vs "
          f"local[{hi['cpus']}] (sandbox stand-in for N vs 4N executors "
          "per BASELINE.md).", "",
          "| stage | " + " | ".join(f"local[{r['cpus']}] sec "
                                    f"(pts/s)" for r in results)
          + " | efficiency (T_N/T_4N)/4 |",
          "|---|" + "---|" * (len(results) + 1)]
    for k in ("encode", "decode", "rollup"):
        cells = [f"{r[f'{k}_s']:.2f} ({r['n_points'] / r[f'{k}_s'] / 1e6:.2f}M)"
                 for r in results]
        md.append(f"| {k} | " + " | ".join(cells) + f" | **{eff[k]}** |")
    md += ["",
           "Reference single-thread baseline (BASELINE.md): 83.5 M pts/s "
           "v2 compression, 77.9 M pts/s decompression on a 2011 i7 "
           "core. Our per-core kernel is numpy-vectorized Python "
           "(honest figure above); the engine's lever is horizontal "
           "scale — the efficiency column is the north-rule criterion "
           "(target ≥ 0.8).", "",
           "Raw JSON: " + json.dumps(results), ""]
    out = REPO / "BENCH" / "BASELINE.md"
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(md))
    print(json.dumps({"results": results, "efficiency": eff}))


if __name__ == "__main__":
    main()
