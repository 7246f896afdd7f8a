#!/usr/bin/env python
"""Adjudicate the BENCH_r07 `dedup_minhash_lsh` 6.39x flag (VERDICT
r7 ask #2): reproduce the query under INDUCED memory pressure and
compare the r7 double-cache plan against the r8 single-cache plan
(dedup.py now caches only the compact per-doc hash arrays; the
verify join re-explodes them).

Antagonist: N worker processes that continuously stream writes+reads
through large private buffers (~memory-bandwidth + page-cache theft —
the shared resource tools/membw_probe.py showed saturates this box).
This emulates the co-tenant profile the r7 verdict hypothesised from
the uniform ~1.7x degradation of the driver-environment run.

Protocol: one Spark session, warm-up run, then interleaved reps
quiet -> pressure -> quiet for BOTH plan variants (the old variant is
reconstructed inline below so the comparison is same-session,
same-data). Reports medians + the pressure/quiet ratio per variant.

Usage: python tools/minhash_pressure_probe.py \
    [--sf-dir /root/testdata/sf0.1] [--out BENCH/minhash_pressure_r8.json]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _antagonist(stop, gb: float):
    """Stream through a private buffer to steal bandwidth+page cache."""
    n = int(gb * (1 << 30) / 8)
    buf = np.empty(n, dtype=np.int64)
    x = 1
    while not stop.is_set():
        buf[:] = x                  # write stream
        x = int(buf[::4096].sum()) & 0xFFFF  # touch pages, defeat DCE
        _ = buf.sum()               # read stream


def _old_minhash_pairs(docs, threshold=0.5):
    """The r7 plan, reconstructed: caches the EXPLODED (doc_id, h)
    relation AND the per-doc arrays (double storage of every shingle
    hash) — the memory-pressure-sensitive shape under adjudication."""
    from pyspark.sql import functions as F

    from gorillaspark.operators.dedup import make_minhash_udf, shingles
    n_perm, n_bands = 64, 16
    rows_per_band = n_perm // n_bands
    shh = (shingles(docs, 3, "text", "doc_id")
           .select("doc_id", F.xxhash64("shingle").alias("h"))
           .cache())
    sets = shh.groupBy("doc_id").agg(
        F.collect_list("h").alias("hash_set"),
        F.count(F.lit(1)).alias("sz")).cache()
    mh = make_minhash_udf(n_perm)
    sigs = sets.select("doc_id", mh("hash_set").alias("sig"))
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.hash(
                    F.slice("sig", i * rows_per_band + 1,
                            rows_per_band)))).alias("band", "band_hash"))
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (x.join(y, (F.col("x.band") == F.col("y.band"))
                   & (F.col("x.band_hash") == F.col("y.band_hash"))
                   & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b"))
            .distinct())
    sh_a = shh.select(F.col("doc_id").alias("doc_a"),
                      F.col("h").alias("h_a"))
    sh_b = shh.select(F.col("doc_id").alias("doc_b2"),
                      F.col("h").alias("h_b"))
    inter = (cand.join(sh_a, "doc_a")
             .join(sh_b, (F.col("doc_b") == F.col("doc_b2"))
                   & (F.col("h_a") == F.col("h_b")))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("i")))
    sz = sets.select(F.col("doc_id"), F.col("sz"))
    out = (inter
           .join(sz.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("sz", "sz_a"), "doc_a")
           .join(sz.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("sz", "sz_b"), "doc_b")
           .withColumn("jaccard", F.col("i")
                       / (F.col("sz_a") + F.col("sz_b") - F.col("i")))
           .filter(F.col("jaccard") >= threshold))
    return out, [shh, sets]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="BENCH/minhash_pressure_r8.json")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--antagonists", type=int, default=8)
    ap.add_argument("--gb-each", type=float, default=2.0)
    args = ap.parse_args()

    from gorillaspark.operators.dedup import minhash_lsh_pairs
    from gorillaspark.plans.session import build_session

    spark = build_session(app="minhash-pressure",
                          master=f"local[{args.cpus}]",
                          shuffle_partitions=max(args.cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")

    def run_new():
        return minhash_lsh_pairs(docs, threshold=0.5).count()

    def run_old():
        out, cached = _old_minhash_pairs(docs)
        n = out.count()
        for df in cached:
            df.unpersist()
        return n

    def med(fn):
        ts = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
        return sorted(ts)[len(ts) // 2], ts

    # warm-up both plans (codegen / python worker spin-up)
    run_new()
    run_old()

    res: dict = {"sf_dir": args.sf_dir, "cpus": args.cpus,
                 "antagonists": args.antagonists,
                 "gb_each": args.gb_each, "reps": args.reps}
    res["quiet_new"], res["quiet_new_reps"] = med(run_new)
    res["quiet_old"], res["quiet_old_reps"] = med(run_old)

    stop = mp.Event()
    procs = [mp.Process(target=_antagonist, args=(stop, args.gb_each),
                        daemon=True) for _ in range(args.antagonists)]
    for p in procs:
        p.start()
    time.sleep(3)                   # let the steal stabilise
    try:
        res["pressure_new"], res["pressure_new_reps"] = med(run_new)
        res["pressure_old"], res["pressure_old_reps"] = med(run_old)
    finally:
        stop.set()
        for p in procs:
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()

    res["ratio_new"] = round(res["pressure_new"] / res["quiet_new"], 2)
    res["ratio_old"] = round(res["pressure_old"] / res["quiet_old"], 2)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
