#!/usr/bin/env python
"""Pure-codec-kernel scaling: P pinned processes, fixed work each.

Isolates the engine's own compute kernels from single-JVM local-mode
artifacts — this is what per-executor scaling looks like when each
executor runs the kernel on its partition (no shared driver, no shared
BlockManager). Appends a section to BENCH/BASELINE.md when run with
--write-md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


_BARRIER = None


def _init(barrier):
    global _BARRIER
    _BARRIER = barrier


def kernel_work(args):
    cpuset, n_blocks, block_len = args
    os.sched_setaffinity(0, cpuset)
    import numpy as np

    from gorillaspark.codec.native import (
        decode_blocks_native,
        encode_blocks_native,
    )
    rng = np.random.default_rng(os.getpid())
    S, L = n_blocks, block_len
    N = S * L
    block_ts = (1500400800000 + np.arange(S) * 86_400_000).astype(np.int64)
    ts = (block_ts.repeat(L)
          + np.tile(np.cumsum(rng.integers(1, 240000, L)), S)).astype(np.int64)
    vs = (1000.0 + np.cumsum(rng.normal(0, 5, N))).view(np.uint64)
    offsets = np.arange(S + 1, dtype=np.int64) * L
    encode_blocks_native(block_ts, offsets, ts, vs)  # warm (build .so)
    # barrier so every process's timed section overlaps: the aggregate
    # is then real simultaneous throughput, not staggered snapshots
    _BARRIER.wait()
    t0 = time.perf_counter()
    w, wc = encode_blocks_native(block_ts, offsets, ts, vs)
    enc = time.perf_counter() - t0
    _BARRIER.wait()
    t0 = time.perf_counter()
    decode_blocks_native(w, wc, n_points_hint=N)
    dec = time.perf_counter() - t0
    return N, enc, dec


def measure(levels=(2, 8, 32), n_blocks=20000, block_len=300):
    rows = []
    for P in levels:
        cpuset = set(range(P))
        work = [(cpuset, n_blocks, block_len)] * P
        ctx = mp.get_context("spawn")
        barrier = ctx.Barrier(P)
        with ctx.Pool(P, initializer=_init,
                      initargs=(barrier,)) as pool:
            t0 = time.perf_counter()
            res = pool.map(kernel_work, work)
            wall = time.perf_counter() - t0
        tot = sum(r[0] for r in res)
        enc_wall = max(r[1] for r in res)   # slowest process bounds wall
        dec_wall = max(r[2] for r in res)
        rows.append({"procs": P, "pts": tot, "pool_wall_s": round(wall, 2),
                     "encode_s": round(enc_wall, 3),
                     "dec_s": round(dec_wall, 3),
                     "encode_Mpts_s": round(tot / enc_wall / 1e6, 1),
                     "decode_Mpts_s": round(tot / dec_wall / 1e6, 1)})
    return rows


def main():
    rows = measure()
    effs = {}
    for lo, hi in zip(rows[:-1], rows[1:]):
        r = hi["procs"] / lo["procs"]
        effs[f"{lo['procs']}to{hi['procs']}"] = {
            "encode": round(hi["encode_Mpts_s"] / lo["encode_Mpts_s"] / r, 3),
            "decode": round(hi["decode_Mpts_s"] / lo["decode_Mpts_s"] / r, 3),
        }
    out = {"rows": rows, "efficiency": effs}
    print(json.dumps(out))
    if "--write-md" in sys.argv:
        md = ["", "## Kernel-level scaling (P pinned processes, fixed "
              "work each — the per-executor view)", "",
              "| procs | aggregate encode M pts/s | aggregate decode "
              "M pts/s |", "|---|---|---|"]
        for r in rows:
            md.append(f"| {r['procs']} | {r['encode_Mpts_s']} | "
                      f"{r['decode_Mpts_s']} |")
        md += ["", "Efficiency per 4× step: " + json.dumps(effs), ""]
        p = REPO / "BENCH" / "BASELINE.md"
        p.write_text(p.read_text() + "\n".join(md))


if __name__ == "__main__":
    main()
