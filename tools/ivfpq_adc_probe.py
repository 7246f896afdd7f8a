#!/usr/bin/env python
"""Measure the IVF-PQ scoring stage's input bytes across three forms:
(a) the r4 recon-join scoring (candidates x reconstructed float
arrays), (b) a naive ADC with exploded (vid, m, code) rows + groupBy
(x8 row blow-up — measured WORSE on shuffle than recon), and (c) the
shipped r5 form: codes bit-packed into one BIGINT per vector +
broadcast per-query LUT arrays, scored by a static expression with no
explosion and no aggregation.

Method: build the shared index pieces once (candidates, PQ codes,
reconstructions, per-query LUT), materialize each to parquet scratch,
then run ONLY the scoring+rank step of each variant as its own Spark
job group and read the job's stage input bytes from the UI REST API.
Parquet on-disk sizes of the candidate-side relations are reported too
(the at-rest version of the same claim).

Output: one JSON line. Evidence target: BENCH/BASELINE.md (round-5
verdict task 2 — "bench entry showing the scoring stage's input bytes
dropped").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/root/repo/.scratch/adc_probe"
UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4049"))


def _dir_bytes(path: str) -> int:
    return sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(path) for f in fs)


def _api(app_id: str, what: str):
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/{what}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def _job_bytes(app_id: str, group: str) -> dict:
    jobs = [j for j in _api(app_id, "jobs")
            if j.get("jobGroup") == group]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    stages = {s["stageId"]: s for s in _api(app_id, "stages")}
    tot = {"input_bytes": 0, "shuffle_read_bytes": 0,
           "shuffle_write_bytes": 0}
    for sid in stage_ids:
        st = stages.get(sid)
        if not st:  # skipped stage (reused exchange)
            continue
        tot["input_bytes"] += st.get("inputBytes", 0)
        tot["shuffle_read_bytes"] += st.get("shuffleReadBytes", 0)
        tot["shuffle_write_bytes"] += st.get("shuffleWriteBytes", 0)
    return tot


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from gorillaspark.operators.similarity import (
        pq_codes_fixed_codebook, pq_reconstruct, with_unit_norm)
    from gorillaspark.plans.session import build_session

    spark = build_session(
        app="ivfpq-adc-probe",
        extra={"spark.ui.enabled": "true",
               "spark.ui.port": str(UI_PORT)})
    sc = spark.sparkContext
    app_id = sc.applicationId

    n_centroids, nprobe, n_sub, n_codes, dim, refine = 16, 4, 8, 16, 64, 40
    sub_w = dim // n_sub
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 32)

    def _dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)

    # --- shared index pieces (mirrors ivfpq_topk_fixed_codebook steps:
    # r6 inline literal-argmax assignment — no join inflation/window)
    from gorillaspark.operators.similarity import (
        _cell_scores,
        _collect_cell_codebook,
    )
    normed = with_unit_norm(emb, "embedding")
    cell_ids, cell_units = _collect_cell_codebook(
        normed, n_centroids, "vec_id")
    assigned = (normed.select(
        F.col("vec_id").alias("nbr_id"),
        F.array_min(_cell_scores("unit", cell_ids, cell_units))
        .getField("cell").alias("cell")))
    probes = (with_unit_norm(queries, "embedding")
              .select(F.col("vec_id").alias("query_id"),
                      F.col("unit").alias("q_unit"),
                      F.explode(F.slice(F.array_sort(_cell_scores(
                          "unit", cell_ids, cell_units)),
                          1, nprobe)).alias("_pc"))
              .select("query_id", "q_unit",
                      F.col("_pc.cell").alias("cell")))
    subs = F.array(*[
        F.slice("unit", m * sub_w + 1, sub_w) for m in range(n_sub)])
    codebook = (normed.where(F.col("vec_id") < n_codes)
                .select(F.col("vec_id").cast("int").alias("code"),
                        F.posexplode(subs).alias("m", "cw")))
    codes = pq_codes_fixed_codebook(emb, n_sub, n_codes, dim)
    recon = pq_reconstruct(codes, codebook) \
        .withColumnRenamed("vid", "nbr_id")
    q_units = probes.select("query_id", "q_unit").distinct()
    q_subs = q_units.select(
        "query_id",
        F.posexplode(F.array(*[
            F.slice("q_unit", m * sub_w + 1, sub_w)
            for m in range(n_sub)])).alias("m", "q_sub"))
    lut = (q_subs.join(F.broadcast(codebook), "m")
           .select("query_id", "m", "code",
                   F.floor(_dot("q_sub", "cw") * F.lit(1e6) + F.lit(0.5))
                   .alias("lut_i")))
    cands = (assigned.join(F.broadcast(probes.select("query_id", "cell")
                                       .distinct()), "cell")
             .where(F.col("query_id") != F.col("nbr_id"))
             .select("query_id", "nbr_id").distinct())

    n_bits = max(1, (n_codes - 1).bit_length())
    packed = (codes.groupBy("vid").agg(
        F.sum(F.expr(f"shiftleft(cast(code AS BIGINT), m * {n_bits})"))
        .alias("packed")))
    lut_arr = (lut.groupBy("query_id")
               .agg(F.array_sort(F.collect_list(
                   F.struct("m", "code", "lut_i")))
                   .getField("lut_i").alias("lut_arr")))

    shutil.rmtree(SCRATCH, ignore_errors=True)
    parts = {"cands": cands, "codes": codes, "recon": recon,
             "q_units": q_units, "lut": lut, "packed": packed,
             "lut_arr": lut_arr}
    for name, df in parts.items():
        df.write.mode("overwrite").parquet(f"{SCRATCH}/{name}")
    disk = {name: _dir_bytes(f"{SCRATCH}/{name}") for name in parts}
    rd = {name: spark.read.parquet(f"{SCRATCH}/{name}") for name in parts}

    # --- variant A: r4 recon-join scoring (float arrays per candidate)
    sc.setJobGroup("old_recon", "recon-join scoring")
    approx_old = (rd["cands"].join(rd["recon"], "nbr_id")
                  .join(F.broadcast(rd["q_units"]), "query_id")
                  .withColumn("approx",
                              F.round(_dot("q_unit", "recon"), 6)))
    w_ref = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("nbr_id"))
    n_old = (approx_old.withColumn("_rr", F.row_number().over(w_ref))
             .where(F.col("_rr") <= refine).count())
    sc.setJobGroup("default", "")

    # --- variant B: exploded ADC (x8 code rows + groupBy) — rejected
    sc.setJobGroup("adc_exploded", "exploded ADC scoring")
    approx_ex = (rd["cands"].join(rd["codes"]
                                  .withColumnRenamed("vid", "nbr_id"),
                                  "nbr_id")
                 .join(F.broadcast(rd["lut"]), ["query_id", "m", "code"])
                 .groupBy("query_id", "nbr_id")
                 .agg(F.sum("lut_i").alias("approx_i")))
    w_ref_i = Window.partitionBy("query_id").orderBy(
        F.desc("approx_i"), F.asc("nbr_id"))
    n_ex = (approx_ex.withColumn("_rr", F.row_number().over(w_ref_i))
            .where(F.col("_rr") <= refine).count())
    sc.setJobGroup("default", "")

    # --- variant C: packed ADC (shipped) — one BIGINT of codes per
    # candidate, broadcast LUT arrays, static lookup expression
    sc.setJobGroup("adc_packed", "packed ADC scoring")
    adc_terms = [
        F.element_at(
            "lut_arr",
            (F.shiftrightunsigned("packed", m * n_bits)
             .bitwiseAND(F.lit(n_codes - 1))
             + F.lit(m * n_codes + 1)).cast("int"))
        for m in range(n_sub)]
    approx_pk = (rd["cands"].join(rd["packed"]
                                  .withColumnRenamed("vid", "nbr_id"),
                                  "nbr_id")
                 .join(F.broadcast(rd["lut_arr"]), "query_id")
                 .withColumn("approx_i", sum(adc_terms[1:], adc_terms[0])))
    n_pk = (approx_pk.withColumn("_rr", F.row_number().over(w_ref_i))
            .where(F.col("_rr") <= refine).count())
    sc.setJobGroup("default", "")

    out = {
        "sf_dir": SF_DIR,
        "n_cands": rd["cands"].count(),
        "survivors_old": n_old, "survivors_exploded": n_ex,
        "survivors_packed": n_pk,
        "parquet_bytes": disk,
        "candidate_side_bytes_old": disk["recon"],
        "candidate_side_bytes_packed": disk["packed"],
        "job_old_recon": _job_bytes(app_id, "old_recon"),
        "job_adc_exploded": _job_bytes(app_id, "adc_exploded"),
        "job_adc_packed": _job_bytes(app_id, "adc_packed"),
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
