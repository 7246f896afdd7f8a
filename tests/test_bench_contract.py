"""bench.py driver-contract regression tests (no Spark needed).

Round 7 lost its bench of record: the one-line JSON grew an unbounded
``regressions`` array (19 entries in a degraded-environment run) and
outgrew the driver's ~2000-char tail capture, so BENCH_r07.json has
``parsed: null``. These tests pin the fixed contract: the line stays
parseable and under the window even when EVERY guarded query blows its
budget, and the full regression detail lands in
BENCH/regressions_last.json instead of on the line.
"""

import json
import os

import bench


def _worst_case_queries() -> dict:
    # every guarded query wildly over budget + the unguarded entries
    qs = {k: 999.999 for k in bench._BUDGET_S}
    qs.update({
        "rollup_cascade_1h_1d": 999.999,  # guarded name, keep explicit
        "decode_blocks": 999.999,
    })
    return qs


def _extras() -> dict:
    return {
        "encode_pts_per_sec": 199_500_000,
        "decode_pts_per_sec": 113_300_000,
        "encode_dfcm_pts_per_sec": 150_000_000,
        "compression_ratio": 0.4189,
        "n_points": 2_276_834,
    }


def test_worst_case_line_fits_tail_window(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    line = bench.build_output_line(
        _worst_case_queries(), _extras(),
        sf_dir="/root/testdata/sf0.1", cpus=32, n_turns=2_282_834)
    assert len(line) < 1900, f"line is {len(line)} chars"
    out = json.loads(line)
    assert out["regression_count"] == len(bench._BUDGET_S)
    # the line carries at most the 3 worst, sorted by ratio desc
    assert len(out["regressions"]) <= 3
    ratios = [r["ratio"] for r in out["regressions"]]
    assert ratios == sorted(ratios, reverse=True)
    # the complete list is on disk for adjudication
    full = json.load(open(tmp_path / "BENCH" / "regressions_last.json"))
    assert len(full["regressions"]) == len(bench._BUDGET_S)


def test_clean_run_has_no_regression_noise(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    qs = {k: v * 0.9 for k, v in bench._BUDGET_S.items()}
    line = bench.build_output_line(
        qs, _extras(), sf_dir="/root/testdata/sf0.1",
        cpus=32, n_turns=2_282_834)
    out = json.loads(line)
    assert out["regression_count"] == 0
    assert out["regressions"] == []
    assert not os.path.exists(tmp_path / "BENCH" / "regressions_last.json")
    assert len(line) < 1900


def test_non_default_sf_never_flags(tmp_path, monkeypatch):
    # sf1 runs carry 10x the data — budgets only apply at sf0.1
    monkeypatch.chdir(tmp_path)
    line = bench.build_output_line(
        _worst_case_queries(), _extras(),
        sf_dir="/root/testdata/sf1", cpus=32, n_turns=22_828_340)
    out = json.loads(line)
    assert out["regression_count"] == 0
    assert out["sf"] == 1.0
