#!/usr/bin/env python
"""Generate bit-exactness golden fixtures by running the *reference*
gorilla-tsc implementation (compiled once from /root/reference with
javac) over the fixture vectors from FIXTURES.md / SURVEY.md §5.

Outputs tests/goldens/*.json:
  {"name", "block_ts", "mode", "points": [[ts, raw_bits_signed], ...],
   "words": [signed longs]  |  "bytes_hex": "..."}

Run from the repo root:  python tools/gen_goldens.py
The build dir (tools/ref_build) is git-ignored; goldens are committed.
"""

from __future__ import annotations

import json
import random
import re
import struct
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
BUILD = REPO / "tools" / "ref_build"
GOLDENS = REPO / "tests" / "goldens"


def to_signed64(x: int) -> int:
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x


def dbits(v: float) -> int:
    return to_signed64(struct.unpack("<Q", struct.pack("<d", v))[0])


def compile_reference() -> None:
    BUILD.mkdir(parents=True, exist_ok=True)
    srcs = [
        str(p) for p in (REF / "src/main/java").rglob("*.java")
        if "benchmark" not in str(p)  # JMH dir needs external deps
    ]
    subprocess.run(
        ["javac", "-d", str(BUILD), *srcs], check=True)
    subprocess.run(
        ["javac", "-cp", str(BUILD), "-d", str(BUILD),
         str(REPO / "tools" / "GoldenDump.java")], check=True)


def run_dump(mode: str, block_ts: int, points, extra=()) -> dict:
    inp = "\n".join(f"{t} {v}" for t, v in points)
    res = subprocess.run(
        ["java", "-cp", str(BUILD), "GoldenDump", mode, str(block_ts),
         *map(str, extra)],
        input=inp, capture_output=True, text=True, check=True)
    return json.loads(res.stdout)


def extract_will_it_blend() -> tuple[int, list[tuple[int, int]]]:
    """Pull the 240-pair fixed vector out of the reference test source
    (it is data, not code): `EncodeGorillaTest.java:66-328`."""
    src = (REF / "src/test/java/fi/iki/yak/ts/compression/gorilla/"
           "EncodeGorillaTest.java").read_text()
    m = re.search(r"void willItBlend.*?long blockTimestamp = (\d+)L;(.*?)"
                  r"comparePairsToCompression", src, re.S)
    block_ts = int(m.group(1))
    pairs = [(int(a), int(b))
             for a, b in re.findall(r"new Pair\((\d+)L,\s*(-?\d+)\)", m.group(2))]
    assert len(pairs) == 254, len(pairs)  # 254 literal pairs at :69-326
    return block_ts, pairs


def fixtures() -> list[dict]:
    fx = []

    # simple8 — fixed hour boundary instead of now() (determinism)
    base = 1500400800000
    offs = [10, 20, 28, 84, 400, 2300, 16384, 16500]
    vals = [1.0, -2.0, -2.5, 65537.0, 2147483650.0, -16384.0, 2.8, -38.0]
    fx.append(dict(name="simple8", mode="v2", block_ts=base,
                   points=[(base + o, dbits(v)) for o, v in zip(offs, vals)]))

    bts, pairs = extract_will_it_blend()
    fx.append(dict(name="will_it_blend", mode="v2", block_ts=bts, points=pairs))

    # similar floats (go-tsz issue #4 regression), 2015-03-02T00:00Z
    sbase = 1425254400000
    sim = [6.00065e+06, 6.000656e+06, 6.000657e+06, 6.000659e+06, 6.000661e+06]
    fx.append(dict(name="similar_floats", mode="v2", block_ts=sbase,
                   points=[(sbase + i + 1, dbits(v)) for i, v in enumerate(sim)]))

    # large random doubles, 100k points, stride ~60ms with jitter (seeded)
    rng = random.Random(42)
    ts = base
    pts = []
    for i in range(100_000):
        ts += 60_000 + rng.randint(-100, 100)
        pts.append((ts, dbits(i * rng.random())))
    fx.append(dict(name="large_random", mode="v2", block_ts=base, points=pts))

    # long values, 10k points
    rng = random.Random(43)
    ts = base
    lpts = []
    for _ in range(10_000):
        ts += 60_000
        lpts.append((ts, rng.randrange(0, 2**31)))
    fx.append(dict(name="long_values", mode="v2", block_ts=base, points=lpts))

    fx.append(dict(name="empty_block", mode="v2", block_ts=base, points=[]))

    # copy-flush: snapshot without close
    fx.append(dict(name="copy_flush", mode="v2nc", block_ts=base,
                   points=[(base + 10, dbits(1.0)), (base + 7777, dbits(-2.5))]))

    # DFCM predictor round trip (1024-entry table)
    fx.append(dict(name="dfcm_roundtrip", mode="v2dfcm", block_ts=base,
                   points=lpts[:5000], extra=(1024,)))

    # edge bit patterns: NaN payloads, -0.0, subnormals, ±Inf, extremes
    edge_vals = [dbits(float("nan")), to_signed64(0x7FF8DEADBEEF0001),
                 to_signed64(0xFFF0000000000001), dbits(-0.0), dbits(0.0),
                 dbits(float("inf")), dbits(float("-inf")),
                 1, -1, to_signed64(2**63 - 1), to_signed64(-(2**63))]
    fx.append(dict(name="edge_bits", mode="v2", block_ts=base,
                   points=[(base + 10 * (i + 1), v)
                           for i, v in enumerate(edge_vals)]))

    # v1 wire-format fixtures
    fx.append(dict(name="v1_simple8", mode="v1", block_ts=base,
                   points=[(base + o, dbits(v)) for o, v in zip(offs, vals)]))
    fx.append(dict(name="v1_large_random", mode="v1", block_ts=base,
                   points=pts[:20_000]))
    fx.append(dict(name="v1_long_values", mode="v1", block_ts=base,
                   points=lpts))
    fx.append(dict(name="v1_empty", mode="v1", block_ts=base, points=[]))

    # timestamp-pattern torture: dd==0 runs, dd==-1 (the 36-bit quirk),
    # each bucket boundary ±1, and large jumps
    tts, cur = [], base
    deltas = [1000, 1000, 999, 1000, 1063, 1000, 64, 65, 1256, 1000, 3048,
              5000, 5000, 2**21, 1000, 1, 2, 4095, 4096, 4097, 1000, 1000]
    for d in deltas:
        cur += d
        tts.append((cur, dbits(42.0)))
    fx.append(dict(name="ts_torture", mode="v2", block_ts=base, points=tts))
    fx.append(dict(name="v1_ts_torture", mode="v1", block_ts=base, points=tts))

    return fx


def main() -> None:
    compile_reference()
    GOLDENS.mkdir(parents=True, exist_ok=True)
    for fx in fixtures():
        out = run_dump(fx["mode"], fx["block_ts"], fx["points"],
                       fx.get("extra", ()))
        record = {k: fx[k] for k in ("name", "mode", "block_ts")}
        record.update(out)
        record["points"] = fx["points"]
        path = GOLDENS / f"{fx['name']}.json"
        path.write_text(json.dumps(record) + "\n")
        size = len(out.get("words", [])) * 8 or len(out.get("bytes_hex", "")) // 2
        print(f"{fx['name']}: {len(fx['points'])} pts -> {size} bytes",
              file=sys.stderr)


if __name__ == "__main__":
    main()
