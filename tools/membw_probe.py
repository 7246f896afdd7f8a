#!/usr/bin/env python
"""STREAM-triad-style memory bandwidth probe at P pinned processes.

Shows the single-box ceiling that bounds 8→32-core scaling for
memory-streaming kernels (each cluster NODE brings its own memory
controllers; one VM does not)."""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

_B = None


def _init(b):
    global _B
    _B = b


def triad(args):
    cpuset, n = args
    os.sched_setaffinity(0, cpuset)
    import numpy as np
    a = np.random.default_rng(1).random(n)
    b = np.random.default_rng(2).random(n)
    c = np.empty(n)
    np.multiply(b, 3.0, out=c)
    _B.wait()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        np.add(a, c, out=c)       # 3 × 8B per element per op
    dt = time.perf_counter() - t0
    return reps * n * 24 / dt     # bytes/s


def main():
    n = 20_000_000
    out = {}
    for P in (1, 2, 8, 32):
        ctx = mp.get_context("spawn")
        bar = ctx.Barrier(P)
        with ctx.Pool(P, initializer=_init, initargs=(bar,)) as pool:
            bws = pool.map(triad, [(set(range(P)), n)] * P)
        out[P] = round(sum(bws) / 1e9, 1)
    print(json.dumps({"triad_GBps_by_procs": out}))


if __name__ == "__main__":
    main()
