#!/usr/bin/env python
"""Isolate the kernel 8→32 decode cliff (VERDICT r3 #6).

BENCH/BASELINE.md's kernel table shows aggregate decode throughput
*dropping* 382 → 75 M pts/s going 8 → 32 pinned processes — a 5×
absolute fall that memory-bandwidth flattening alone cannot explain.

Hypothesis under test: the cliff is an output-allocation artifact of
the single-shot measurement, not decode compute. Each
``decode_blocks_native`` call allocates ~16 B/point of fresh output
(np.empty → mmap for large buffers) plus a final ``.copy()`` — the C
kernel then *first-touches* every page inside the timed region, so the
measurement includes ~200 MB of kernel page-zeroing per process. At 32
simultaneous processes that is >6 GB of page faults contending on the
zero-page path and memory bandwidth; at 8 it mostly hides.

Three variants per level, every process cpuset-pinned and
barrier-synced so timed sections overlap:

* ``fresh``    — one timed decode, cold buffers (replicates the
                 kernel_scaling measurement that produced the cliff);
* ``prefault`` — ``mallopt(M_MMAP_THRESHOLD, 1 GiB)`` so freed big
                 buffers return to the malloc free-list instead of
                 munmap; min of reps after a warm-up then reuses
                 already-faulted pages — decode compute with the
                 allocation artifact removed;
* ``fault_only`` — allocate + memset the same output footprint, no
                 decode: the artifact in isolation.

Attribution rule: if ``prefault`` restores 8→32 efficiency toward the
membw bound (~0.8) while ``fresh`` reproduces the cliff and
``fault_only`` collapses the same way ``fresh`` does, the cliff is a
measurement artifact of cold-output single-shot decode, not a decode
scaling defect.

Prints one JSON line; ``--write-md`` appends a section to
BENCH/BASELINE.md (bench_scaling.py embeds the JSON on full regen).
"""

from __future__ import annotations

import ctypes
import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_BLOCKS = int(os.environ.get("CLIFF_N_BLOCKS", "20000"))
BLOCK_LEN = int(os.environ.get("CLIFF_BLOCK_LEN", "300"))
REPS = int(os.environ.get("CLIFF_REPS", "3"))
LEVELS = tuple(int(x) for x in
               os.environ.get("CLIFF_LEVELS", "8,32").split(","))

_BARRIER = None


def _init(barrier):
    global _BARRIER
    _BARRIER = barrier


def _mallopt_prefault() -> bool:
    """Raise M_MMAP_THRESHOLD so large numpy buffers come from the
    malloc free-list after the first free — freed pages stay faulted."""
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        return bool(libc.mallopt(M_MMAP_THRESHOLD, 1 << 30))
    except Exception:
        return False


def _work(args):
    cpuset, variant = args
    os.sched_setaffinity(0, cpuset)
    # codec/native.py applies mallopt(M_MMAP_THRESHOLD) at import for
    # the production path — which would keep the data-gen/encode
    # allocations below on the free-list and pre-fault the very pages
    # the 'fresh'/'fault_only' CONTROL variants must observe cold.
    # Only the 'prefault' variant may see it (and applies it itself).
    os.environ["SPARK_GRAFT_MALLOC_PREFAULT"] = "0"
    import numpy as np

    from gorillaspark.codec.native import (
        decode_blocks_native,
        encode_blocks_native,
    )
    S, L = N_BLOCKS, BLOCK_LEN
    N = S * L
    rng = np.random.default_rng(os.getpid())
    block_ts = (1500400800000 + np.arange(S) * 86_400_000).astype(np.int64)
    ts = (block_ts.repeat(L)
          + np.tile(np.cumsum(rng.integers(1, 240000, L)), S)).astype(np.int64)
    vs = (1000.0 + np.cumsum(rng.normal(0, 5, N))).view(np.uint64)
    offsets = np.arange(S + 1, dtype=np.int64) * L
    w, wc = encode_blocks_native(block_ts, offsets, ts, vs)

    op, _, variant = variant.partition(":")

    def work():
        if op == "decode":
            decode_blocks_native(w, wc, n_points_hint=N)
        else:
            encode_blocks_native(block_ts, offsets, ts, vs)

    if variant == "prefault":
        _mallopt_prefault()
        work()  # warm: fault once

    _BARRIER.wait()
    if variant == "fault_only":
        # same footprint the op's output touches: decode = ts + vals +
        # the two copies; encode = the words buffer (compressed, ~1/8)
        t0 = time.perf_counter()
        if op == "decode":
            a = np.empty(N, dtype=np.int64); a.fill(0)      # noqa: E702
            b = np.empty(N, dtype=np.uint64); b.fill(0)     # noqa: E702
            c = a.copy(); d = b.copy()                      # noqa: E702
            dt = time.perf_counter() - t0
            del a, b, c, d
        else:
            a = np.empty(len(w) or N // 8, dtype=np.uint64)
            a.fill(0)
            dt = time.perf_counter() - t0
            del a
        return N, dt
    if variant == "fresh":
        t0 = time.perf_counter()
        work()
        return N, time.perf_counter() - t0
    # prefault: min of reps, buffers recycled via the malloc free-list
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        work()
        best = min(best, time.perf_counter() - t0)
    return N, best


_VARIANTS = [f"{op}:{v}" for op in ("decode", "encode")
             for v in ("fresh", "prefault", "fault_only")]


def measure():
    out = {"n_blocks": N_BLOCKS, "block_len": BLOCK_LEN, "levels": {}}
    for P in LEVELS:
        cpuset = set(range(P))
        lvl = {}
        for variant in _VARIANTS:
            ctx = mp.get_context("spawn")
            barrier = ctx.Barrier(P)
            with ctx.Pool(P, initializer=_init,
                          initargs=(barrier,)) as pool:
                res = pool.map(_work, [(cpuset, variant)] * P)
            tot = sum(r[0] for r in res)
            wall = max(r[1] for r in res)  # slowest bounds the stage
            lvl[variant] = {
                "Mpts_s": round(tot / wall / 1e6, 1),
                "wall_s": round(wall, 3),
            }
        out["levels"][str(P)] = lvl
    lo, hi = (str(x) for x in LEVELS[:2])
    r = LEVELS[1] / LEVELS[0]
    out["efficiency"] = {
        v: round(out["levels"][hi][v]["Mpts_s"]
                 / out["levels"][lo][v]["Mpts_s"] / r, 3)
        for v in _VARIANTS}
    e = out["efficiency"]
    att = {}
    for op in ("decode", "encode"):
        if (e[f"{op}:prefault"] >= 2 * e[f"{op}:fresh"]
                and e[f"{op}:fault_only"] <= 1.5 * e[f"{op}:fresh"]):
            att[op] = ("cliff is cold-output page-fault contention "
                       "(measurement artifact of single-shot runs), "
                       f"not {op} compute")
        elif e[f"{op}:prefault"] >= 0.6:
            # membw_probe: pure streaming scales ~0.76 over 8→32 on
            # this VM — prefault at/above that bound means the
            # remaining gap is shared bandwidth, not codec compute
            att[op] = (f"{op} with pre-faulted buffers scales at the "
                       "box's memory-bandwidth bound; residual vs 1.0 "
                       "is shared bandwidth, not compute")
        else:
            att[op] = (f"page faults do not fully explain the {op} "
                       "cliff at this run's contention level")
    out["attribution"] = att
    return out


def main():
    out = measure()
    print(json.dumps(out))
    if "--write-md" in sys.argv:
        lo, hi = (str(x) for x in LEVELS[:2])
        md = ["", f"## Codec-cliff probe (tools/decode_cliff_probe.py, "
              f"{LEVELS[0]} vs {LEVELS[1]} pinned procs)", "",
              "| variant | " + f"{lo}-proc M pts/s | {hi}-proc M pts/s "
              "| efficiency |", "|---|---|---|---|"]
        for v in _VARIANTS:
            md.append(
                f"| {v} | {out['levels'][lo][v]['Mpts_s']} | "
                f"{out['levels'][hi][v]['Mpts_s']} | "
                f"{out['efficiency'][v]} |")
        md += ["", f"Attribution: {json.dumps(out['attribution'])}", ""]
        p = REPO / "BENCH" / "BASELINE.md"
        p.write_text(p.read_text() + "\n".join(md))


if __name__ == "__main__":
    main()
