"""M4 / counter-rate / histogram operators vs in-process pandas."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gorillaspark.operators.downsample import (
    counter_rate,
    histogram_cascade,
    histogram_tier,
    m4_downsample,
)

HOUR = 3_600_000


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(5)
    n = 5_000
    pdf = pd.DataFrame({
        "series_key": rng.integers(0, 6, n).astype(str),
        "ts_ms": rng.choice(np.arange(0, 40 * HOUR, 7_000), n,
                            replace=False).astype("int64"),
        "value": rng.normal(50, 40, n).round(2),
    })
    return spark.createDataFrame(pdf), pdf


def test_m4_matches_pandas(spark, pts):
    sdf, pdf = pts
    got = (m4_downsample(sdf, "1h").toPandas()
           .sort_values(["series_key", "bucket_ms"])
           .reset_index(drop=True))
    p = pdf.assign(bucket_ms=(pdf.ts_ms // HOUR) * HOUR)
    exp = (p.sort_values("ts_ms").groupby(["series_key", "bucket_ms"])
           .agg(v_min=("value", "min"), v_max=("value", "max"),
                v_first=("value", "first"), v_last=("value", "last"),
                n=("value", "size"))
           .reset_index().sort_values(["series_key", "bucket_ms"])
           .reset_index(drop=True))
    for c in ("v_min", "v_max", "v_first", "v_last"):
        assert np.array_equal(got[c].values, exp[c].values), c
    assert np.array_equal(got["n"].values, exp["n"].values)


def test_counter_rate_resets(spark):
    # hand-built counter with known wraps
    rows = [("a", t * 1000, v) for t, v in enumerate(
        [0.0, 10.0, 25.0, 5.0, 7.0, 2.0, 50.0])]
    sdf = spark.createDataFrame(rows, "series_key string, ts_ms long, "
                                      "value double")
    got = counter_rate(sdf, "1h").toPandas()
    # increases: 10, 15, 5(reset), 2, 2(reset), 48 → 82; resets: 2
    assert len(got) == 1
    assert got.increase[0] == pytest.approx(82.0)
    assert got.n_resets[0] == 2


def test_histogram_cascade_equals_direct(spark, pts):
    sdf, pdf = pts
    h1 = histogram_tier(sdf, "1h", bin_width=10.0)
    day = (histogram_cascade(h1, "1d").toPandas()
           .sort_values(["series_key", "bucket_ms", "bin"])
           .reset_index(drop=True))
    direct = (histogram_tier(sdf, "1d", bin_width=10.0).toPandas()
              .sort_values(["series_key", "bucket_ms", "bin"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(day, direct)
    # and against pandas
    p = pdf.assign(bucket_ms=(pdf.ts_ms // (24 * HOUR)) * 24 * HOUR,
                   bin=np.floor(pdf.value / 10.0).astype("int64"))
    exp = (p.groupby(["series_key", "bucket_ms", "bin"]).size()
           .rename("cnt").reset_index()
           .sort_values(["series_key", "bucket_ms", "bin"])
           .reset_index(drop=True))
    assert np.array_equal(day["cnt"].values, exp["cnt"].values)
    assert len(day) == len(exp)


def test_ewma_segmented_bounded_memory_large_series(spark):
    """The r2 EWMA buffered whole series in one aggregation row; the
    segmented path must (a) keep per-group state bounded by
    points-per-chunk, (b) bit-match a scalar replay of the identical
    day-segmented operation sequence, and (c) approximate the plain
    sequential EWMA (same recurrence, different rounding order)."""
    from gorillaspark.operators.downsample import ewma_segmented

    n = 200_000  # one series spanning ~139 days at 60s cadence
    day = 86_400_000
    pts = (spark.range(n)
           .selectExpr("'s' AS series_key",
                       "id * 60000 AS ts_ms",
                       "CAST(1.0 + (id % 997) * 0.25 AS DOUBLE) AS value"))
    got = ewma_segmented(pts, alpha=0.2).collect()[0]["ewma"]

    # scalar replay of the segmented composition (identical op order)
    vals = [1.0 + (i % 997) * 0.25 for i in range(n)]
    per_day = day // 60000
    chunks = [vals[i:i + per_day] for i in range(0, n, per_day)]
    y = None
    for ci, vs in enumerate(chunks):
        if ci == 0:
            acc = vs[0]
            for x in vs[1:]:
                acc = 0.2 * x + 0.8 * acc
            y = acc
        else:
            a, b = 1.0, 0.0
            for x in vs:
                a = a * 0.8
                b = 0.2 * x + 0.8 * b
            y = a * y + b
    import struct
    assert struct.pack("<d", got) == struct.pack("<d", y)

    # and it IS the EWMA: plain sequential fold agrees to float noise
    seq = vals[0]
    for x in vals[1:]:
        seq = 0.2 * x + 0.8 * seq
    assert got == pytest.approx(seq, rel=1e-9)

    # scale contract: no whole-series collect — the first aggregation
    # groups by (series, chunk), so max per-group state is one day
    plan = ewma_segmented(pts)._jdf.queryExecution().toString()
    assert "chunk_ms" in plan
