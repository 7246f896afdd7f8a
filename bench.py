#!/usr/bin/env python
"""Headline benchmark: one JSON line for the round driver.

Measures, on local[$SPARK_GRAFT_CPUS] (default 32):

* the Gorilla codec through the full Spark path (encode + decode
  points/s) on a distributed-generated synthetic transcript corpus
  (deterministic, no driver-side data);
* the rollup/gap-fill/latency query suite on the same corpus;
* the oracle-checked query suite on $SPARK_GRAFT_SF_DIR testdata;
* dedup + ANN operators on the documents/embeddings tables.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., plus codec throughput
         fields}. Scaling evidence (local[8] vs local[32]) is produced
by tools/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_conv = int(os.environ.get("BENCH_N_CONV", "6000"))
    mean_turns = int(os.environ.get("BENCH_MEAN_TURNS", "300"))

    from pyspark.sql import functions as F

    from gorillaspark.operators.dedup import minhash_lsh_pairs
    from gorillaspark.operators.encode import decode_points, encode_points
    from gorillaspark.operators.gapfill import gapfill_ffill
    from gorillaspark.operators.normalize import turn_latency_points
    from gorillaspark.operators.rollup import rollup_from_lower, rollup_tier
    from gorillaspark.operators.similarity import cosine_topk_bruteforce
    from gorillaspark.plans.session import build_session
    from gorillaspark.queries import QUERIES
    from gorillaspark.sources.transcripts import generate_transcripts

    spark = build_session(app="gorillaspark-bench",
                          master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    scratch = tempfile.mkdtemp(prefix="gsbench-", dir="/root/repo/.scratch"
                               if os.path.isdir("/root/repo/.scratch")
                               else None)
    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn, reps=1):
        # warm-up + median for repeatable numbers on a shared-tenant box
        if reps > 1:
            fn()
        times = []
        r = None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        queries[name] = round(dt, 3)
        return r, dt

    # ---- corpus (generation excluded from the headline total) -------
    tpath = os.path.join(scratch, "transcripts")
    generate_transcripts(spark, n_conv=n_conv, mean_turns=mean_turns,
                         hot_share=0.2).write.mode("overwrite").parquet(tpath)
    transcripts = spark.read.parquet(tpath)
    n_turns = transcripts.count()

    pts = turn_latency_points(transcripts)
    n_pts = n_turns - n_conv  # first turn of each conv has no latency

    # ---- codec through Spark ----------------------------------------
    bpath = os.path.join(scratch, "blocks")
    _, dt = timed("encode_blocks", lambda: encode_points(pts, "double")
                  .write.mode("overwrite").parquet(bpath), reps=3)
    extras["encode_pts_per_sec"] = round(n_pts / dt)
    blocks = spark.read.parquet(bpath)
    _, dt = timed("decode_blocks",
                  lambda: decode_points(blocks).count(), reps=3)
    extras["decode_pts_per_sec"] = round(n_pts / dt)
    raw_bytes = 16 * n_pts
    enc_bytes = blocks.agg(F.sum(F.size("words"))).collect()[0][0] * 8
    extras["compression_ratio"] = round(enc_bytes / raw_bytes, 4)
    extras["n_points"] = n_pts

    # ---- rollup / gapfill / latency suite on the corpus --------------
    timed("rollup_1m", lambda: rollup_tier(pts, "1m").count())
    m1 = rollup_tier(pts, "1m")
    timed("rollup_cascade_1h_1d", lambda: rollup_from_lower(
        rollup_from_lower(m1, "1h", p95_source=pts), "1d",
        p95_source=pts).count())
    timed("gapfill_1h", lambda: gapfill_ffill(pts, "1h").count())

    # ---- oracle suite on testdata SF ---------------------------------
    for name in ["rollup_1m", "latency_stats_per_series", "sessionize",
                 "pricing_summary", "top_customers", "codec_roundtrip"]:
        fn = QUERIES[name]
        timed(f"sf_{name}", lambda f=fn: f(spark, sf_dir).count())

    # ---- training-data ops on documents/embeddings --------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("dedup_minhash_lsh",
          lambda: minhash_lsh_pairs(docs, threshold=0.5).count())
    qvecs = emb.limit(32)
    timed("ann_topk_bruteforce",
          lambda: cosine_topk_bruteforce(emb, qvecs, k=10).count())

    total = round(sum(queries.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "gorillaspark headline suite (codec+rollup+queries)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "corpus_turns": n_turns,
        **extras,
    }
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
