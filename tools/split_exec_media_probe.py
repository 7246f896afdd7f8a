#!/usr/bin/env python
"""Cluster-shaped scaling datapoint for the MEDIA family (r8): the
H.264 I/P/B GOP pipeline (synthesize per-doc avc1 MP4s, then demux +
entropy decode + MC + spatial direct + POC reorder through
video_frame_stats) is the round's new Spark surface; this probe runs
the same sentinel-gated split-executor protocol as
split_exec_train_probe.py over it.

The stage is embarrassingly parallel by construction (per-payload
mapInArrow, no shuffle), so the probe tests the claim directly: four
2-core pinned processes on disjoint quarter shards should match 4x
one 2-core process on one shard. Payload synthesis runs inside the
timed plan (the bench's synth-inside-the-plan protocol) — the number
reported is the whole Python-parallel media stage, encode+decode.

Groups (the north rule's N vs 4N executors, N=1):
  * solo2_quarter: one 2-core pinned process on a quarter shard;
  * split_4x2: FOUR 2-core processes on disjoint cpusets over the
    four quarter shards concurrently (barrier-aligned);
  * solo8_full: one 8-core process on the full corpus.

Shards are hash-of-doc_id splits of the sf0.1 documents table, so
each shard keeps the ~50/50 CAVLC/CABAC doc-parity mix. Co-tenant
gating, sentinel staggering and quietest-of-TRIES come from
split_exec_probe.py unchanged.

Prints one JSON line with per-group frame throughputs and
eff_1_to_4_executors.
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

from split_exec_probe import CAL_TOLERANCE, calibrate, _collect  # noqa: E402

SF_DIR = os.environ.get("SPLIT_MEDIA_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPLIT_REPS", "3"))
TRIES = int(os.environ.get("SPLIT_TRIES", "3"))
# late r8: CODEC=h265 swaps the synthesized tracks for HEVC I-B-P
# ladders (_synth_hvc1_b_udf) — same protocol, same shard mix
CODEC = os.environ.get("SPLIT_MEDIA_CODEC", "h264")
# SPLIT_MEDIA_DOC_MOD=k times the stage on the doc_id % k == 0 slice
# (the HEVC ladder's per-doc encode is ~3x H.264's; the slice keeps
# the protocol inside a probe-sized wall-clock budget)
DOC_MOD = int(os.environ.get("SPLIT_MEDIA_DOC_MOD", "1"))


def _single(cpus: int, shard: str, barrier: str, tag: str) -> None:
    idx = int(os.environ.get("SPLIT_TAG_INDEX", "0"))
    n_kids = int(os.environ.get("SPLIT_GROUP_SIZE", "1"))
    time.sleep(idx * 0.25)
    cal0 = min(calibrate() for _ in range(3))

    from pyspark.sql import functions as F

    from gorillaspark.operators.multimodal import video_frame_stats
    from gorillaspark.plans.session import build_session
    from gorillaspark.queries import (_synth_h264_b_gop_udf,
                                      _synth_hvc1_b_udf)

    local_dir = tempfile.mkdtemp(
        prefix=f"gssplitm-{tag}-",
        dir="/dev/shm" if os.access("/dev/shm", os.W_OK) else None)
    os.environ["SPARK_GRAFT_LOCAL_DIR"] = local_dir
    spark = build_session(app=f"split-media-{tag}",
                          master=f"local[{cpus}]",
                          shuffle_partitions=max(8, cpus * 4))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{shard}/documents")
    if DOC_MOD > 1:
        docs = docs.where(F.col("doc_id") % DOC_MOD == 0)
    # widen BEFORE the synth projection (the bench's docs_w protocol;
    # the coalesced shard reads as ONE partition, which would
    # serialize the per-doc GOP encode — the dominant cost for h265 —
    # while only the decode stage spreads itself)
    docs = docs.repartition(cpus).cache()
    n_docs = docs.count()
    synth = (_synth_hvc1_b_udf if CODEC == "h265"
             else _synth_h264_b_gop_udf)
    media = docs.select(F.col("doc_id").alias("media_id"),
                        synth()(F.col("doc_id"))
                        .alias("payload"))

    def stage() -> int:
        return video_frame_stats(media, every_ms=500).count()

    n_frames = stage()               # warm-up before the barrier

    Path(f"{barrier}.ready.{tag}").touch()
    while not Path(f"{barrier}.go").exists():
        time.sleep(0.05)

    res = {"tag": tag, "cpus": cpus, "n_docs": n_docs,
           "n_frames": n_frames, "cal0": cal0}
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        stage()
        times.append(round(time.perf_counter() - t0, 3))
    res["h264_reps"] = times
    res["h264_s"] = min(times)
    spark.stop()
    shutil.rmtree(local_dir, ignore_errors=True)
    Path(f"{barrier}.done.{tag}").touch()
    deadline = time.time() + 600
    bdir = Path(barrier).parent
    while len(list(bdir.glob(f"{Path(barrier).name}.done.*"))) \
            < n_kids:
        if time.time() > deadline:
            break                       # sentinel still informative
        time.sleep(0.05)
    time.sleep(idx * 0.25)
    res["cal1"] = min(calibrate() for _ in range(3))
    print("RESULT " + json.dumps(res))


def _launch(cores: str, cpus: int, shard: str, barrier: str,
            tag: str, idx: int = 0,
            group_size: int = 1) -> subprocess.Popen:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    env["SPLIT_TAG_INDEX"] = str(idx)
    env["SPLIT_GROUP_SIZE"] = str(group_size)
    return subprocess.Popen(
        ["taskset", "-c", cores, sys.executable,
         str(Path(__file__).resolve()), "--single", str(cpus), shard,
         barrier, tag],
        stdout=subprocess.PIPE, text=True, cwd=str(REPO), env=env)


def _run_group(specs: list) -> list:
    bdir = tempfile.mkdtemp(prefix="gssplitm-bar-")
    barrier = f"{bdir}/bar"
    procs = [(_launch(cores, cpus, shard, barrier, tag, i,
                      len(specs)), tag)
             for i, (cores, cpus, shard, tag) in enumerate(specs)]
    deadline = time.time() + 900
    while not all(Path(f"{barrier}.ready.{t}").exists()
                  for _, t in procs):
        if time.time() > deadline:
            for p, _ in procs:
                p.kill()
            raise RuntimeError("children never became ready")
        time.sleep(0.1)
    Path(f"{barrier}.go").touch()
    out = [_collect(p) for p, _ in procs]
    shutil.rmtree(bdir, ignore_errors=True)
    return out


def _prepare_shards(tdir: str) -> None:
    """Hash-of-doc_id quarter/full shards of the documents table."""
    from pyspark.sql import functions as F

    from gorillaspark.plans.session import build_session

    s = build_session(app="split-media-gen", master="local[32]")
    s.sparkContext.setLogLevel("ERROR")
    docs = s.read.parquet(f"{SF_DIR}/documents.parquet")
    q = F.pmod(F.xxhash64("doc_id"), F.lit(4))
    for i in range(4):
        docs.withColumn("_q", q).where(F.col("_q") == i).drop("_q") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(f"{tdir}/quarter{i}/documents")
    docs.write.mode("overwrite").parquet(f"{tdir}/full/documents")
    s.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        _single(int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
        return

    tdir = tempfile.mkdtemp(
        prefix="gssplitm-corpus-",
        dir="/dev/shm" if os.access("/dev/shm", os.W_OK) else None)
    _prepare_shards(tdir)

    grids = {
        "solo2_quarter": [("0-1", 2, f"{tdir}/quarter0", "solo2")],
        "split_4x2": [("0-1", 2, f"{tdir}/quarter0", "q0"),
                      ("2-3", 2, f"{tdir}/quarter1", "q1"),
                      ("4-5", 2, f"{tdir}/quarter2", "q2"),
                      ("6-7", 2, f"{tdir}/quarter3", "q3")],
        "solo8_full": [("0-7", 8, f"{tdir}/full", "solo8")],
    }
    runs: dict = {}
    cal_ref = min(calibrate() for _ in range(5))
    for name, specs in grids.items():
        attempts = []
        for _ in range(TRIES):
            rs = _run_group(specs)
            worst = max(max(r["cal0"], r["cal1"]) for r in rs)
            attempts.append((worst, rs))
            if worst <= cal_ref * CAL_TOLERANCE:
                break
        runs[name] = min(attempts, key=lambda a: a[0])[1]
        runs[name + "_worst_cal"] = min(a[0] for a in attempts)
    runs["cal_ref"] = cal_ref
    shutil.rmtree(tdir, ignore_errors=True)

    solo2 = runs["solo2_quarter"][0]
    tp_solo2 = solo2["n_frames"] / solo2["h264_s"]
    rs = runs["split_4x2"]
    tp_4x2 = sum(r["n_frames"] for r in rs) / max(r["h264_s"]
                                                  for r in rs)
    solo8 = runs["solo8_full"][0]
    tp_solo8 = solo8["n_frames"] / solo8["h264_s"]
    out = {"sf_dir": SF_DIR, "reps": REPS, "codec": CODEC,
           "runs": runs,
           "efficiency": {
               "solo2_quarter_frames_s": round(tp_solo2, 1),
               "split_4x2_frames_s": round(tp_4x2, 1),
               "solo8_full_frames_s": round(tp_solo8, 1),
               "eff_1_to_4_executors": round(tp_4x2 / (4 * tp_solo2),
                                             3),
               "solo8_vs_4x_solo2": round(tp_solo8 / (4 * tp_solo2),
                                          3),
           }}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
