"""DDSketch-style mergeable quantile tier: error bound vs exact,
mergeability (cascade == direct), and edge cases (zeros, negatives,
sub-1 magnitudes, single-point buckets)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gorillaspark.operators.sketch import (
    DEFAULT_ALPHA,
    dd_sketch_cascade,
    dd_sketch_quantile,
    dd_sketch_tier,
    gamma_of,
    rollup_sketch_p95,
)


def _exact_nearest_rank_p95(rows):
    """value at rank ceil(19n/20) (1-based) per sorted group."""
    vs = sorted(rows)
    n = len(vs)
    rank = (19 * n + 19) // 20
    return vs[max(rank, 1) - 1]


@pytest.fixture(scope="module")
def corpus(spark):
    """Deterministic multi-series corpus spanning 3 days, magnitudes
    from 0.003 to ~9000, plus zeros and negatives."""
    import numpy as np
    rng = np.random.default_rng(42)
    day = 86_400_000
    rows = []
    for s in range(6):
        n = 500 + 100 * s
        ts = day + rng.integers(0, 3 * day, size=n)
        if s < 4:  # lognormal positive latencies
            vals = np.exp(rng.normal(3 + s, 2, size=n))
        elif s == 4:  # signed values incl. exact zeros
            vals = rng.normal(0, 50, size=n)
            vals[::17] = 0.0
        else:  # tiny magnitudes
            vals = np.exp(rng.normal(-4, 1, size=n))
        rows += [(f"s{s}", int(t), float(v)) for t, v in zip(ts, vals)]
    return spark.createDataFrame(
        rows, "series_key string, ts_ms long, value double")


def test_error_bound_vs_exact(spark, corpus):
    """The published DDSketch guarantee: the p95 estimate is within
    relative error alpha of the exact nearest-rank p95 — pinned per
    (series, 1d bucket) on the whole corpus."""
    alpha = DEFAULT_ALPHA
    est = {(r.series_key, r.bucket_ms): r.p95
           for r in rollup_sketch_p95(corpus, "1d", "1m", alpha).collect()}
    raw = corpus.collect()
    groups = {}
    for r in raw:
        k = (r.series_key, r.ts_ms // 86_400_000 * 86_400_000)
        groups.setdefault(k, []).append(r.value)
    assert set(est) == set(groups)
    for k, vs in groups.items():
        exact = _exact_nearest_rank_p95(vs)
        if exact == 0.0:
            assert est[k] == 0.0
        else:
            rel = abs(est[k] - exact) / abs(exact)
            assert rel <= alpha + 1e-12, (k, est[k], exact, rel)


def test_cascade_equals_direct(spark, corpus):
    """Mergeability: summing 1m-tier bin counts up to 1d must equal
    building the 1d sketch directly from raw — bin-for-bin."""
    fine = dd_sketch_tier(corpus, "1m")
    via_cascade = dd_sketch_cascade(fine, "1d")
    direct = dd_sketch_tier(corpus, "1d")
    key = ["series_key", "bucket_ms", "sign", "bin"]
    diff = (via_cascade.withColumnRenamed("cnt", "c1")
            .join(direct.withColumnRenamed("cnt", "c2"), key, "full")
            .where(F.col("c1").isNull() | F.col("c2").isNull()
                   | (F.col("c1") != F.col("c2"))))
    assert diff.count() == 0
    # and therefore identical quantiles
    q1 = {(r.series_key, r.bucket_ms): r.p95
          for r in dd_sketch_quantile(via_cascade).collect()}
    q2 = {(r.series_key, r.bucket_ms): r.p95
          for r in dd_sketch_quantile(direct).collect()}
    assert q1 == q2


def test_two_level_cascade(spark, corpus):
    """1m → 1h → 1d merges to the same sketch as 1m → 1d (merge is
    associative, the property the tier hierarchy relies on)."""
    fine = dd_sketch_tier(corpus, "1m")
    two_step = dd_sketch_cascade(dd_sketch_cascade(fine, "1h"), "1d")
    one_step = dd_sketch_cascade(fine, "1d")
    key = ["series_key", "bucket_ms", "sign", "bin"]
    diff = (two_step.withColumnRenamed("cnt", "c1")
            .join(one_step.withColumnRenamed("cnt", "c2"), key, "full")
            .where(F.col("c1").isNull() | F.col("c2").isNull()
                   | (F.col("c1") != F.col("c2"))))
    assert diff.count() == 0


def test_edge_values(spark):
    """Zeros map to the zero bin and report 0.0 exactly; negatives
    order below zero below positives; a single-point bucket reports
    that point within alpha."""
    day = 86_400_000
    rows = ([("z", day + i, 0.0) for i in range(10)]
            + [("n", day + i, -100.0) for i in range(19)]
            + [("n", day + 100, 5.0)]
            + [("one", day, 123.456)])
    pts = spark.createDataFrame(
        rows, "series_key string, ts_ms long, value double")
    got = {r.series_key: r.p95
           for r in rollup_sketch_p95(pts, "1d", "1m").collect()}
    assert got["z"] == 0.0
    # 19 of 20 values are -100 → rank ceil(19*20/20)=19 → still -100
    assert abs(got["n"] + 100.0) / 100.0 <= DEFAULT_ALPHA
    assert abs(got["one"] - 123.456) / 123.456 <= DEFAULT_ALPHA


def test_sketch_width_bounded(spark, corpus):
    """The scale claim: occupied bins per (series, 1d bucket) stay far
    below the raw point count (the sketch is a real compression, and
    its size is O(log(max/min)/alpha) independent of n)."""
    sk = dd_sketch_cascade(dd_sketch_tier(corpus, "1m"), "1d")
    stats = (sk.groupBy("series_key", "bucket_ms")
             .agg(F.count(F.lit(1)).alias("bins"), F.sum("cnt").alias("n"))
             .collect())
    g = gamma_of(DEFAULT_ALPHA)
    # 12 decades of double magnitude fit in ~ln(1e12)/ln(gamma) bins —
    # the bound is independent of n, which is the 100 TB property
    hard_cap = math.log(1e12) / math.log(g) + 3
    for r in stats:
        assert r.bins <= hard_cap
    # the compression claim needs a realistic group size: a dense
    # bucket (20k points) still occupies only ~O(log range / alpha)
    # bins — size does NOT grow with n
    import numpy as np
    rng = np.random.default_rng(7)
    day = 86_400_000
    dense = spark.createDataFrame(
        [("d", int(day + i), float(v)) for i, v in enumerate(
            np.exp(rng.normal(4, 2, size=20_000)))],
        "series_key string, ts_ms long, value double")
    [r] = (dd_sketch_cascade(dd_sketch_tier(dense, "1m"), "1d")
           .groupBy("series_key", "bucket_ms")
           .agg(F.count(F.lit(1)).alias("bins"), F.sum("cnt").alias("n"))
           .collect())
    assert r.n == 20_000 and r.bins <= hard_cap
    assert r.bins < r.n / 10


def test_multi_quantile_matches_single(spark, corpus):
    """dd_sketch_quantiles extracts p50/p95/p99 in one pass; each
    column must equal the corresponding single-quantile extraction."""
    from gorillaspark.operators.sketch import dd_sketch_quantiles

    sk = dd_sketch_cascade(dd_sketch_tier(corpus, "1m"), "1d")
    multi = {(r.series_key, r.bucket_ms): r
             for r in dd_sketch_quantiles(sk).collect()}
    for q_num, q_den, name in [(1, 2, "p50"), (19, 20, "p95"),
                               (99, 100, "p99")]:
        single = {(r.series_key, r.bucket_ms): r[name]
                  for r in dd_sketch_quantile(
                      sk, q_num, q_den, out_col=name).collect()}
        assert set(single) == set(multi)
        for k, v in single.items():
            assert multi[k][name] == v, (name, k)


def test_null_values_fail_loudly(spark):
    """NULL values must raise, not silently land in the zero bin and
    skew quantiles (the codec's reject-don't-misbin contract)."""
    import pyspark

    pts = spark.createDataFrame(
        [("s", 86_400_000, 1.0), ("s", 86_400_001, None)],
        "series_key string, ts_ms long, value double")
    with pytest.raises(Exception, match="NULL value"):
        dd_sketch_tier(pts, "1m").collect()


def _py_sketch_quantile(vals, q_num, q_den, alpha=DEFAULT_ALPHA):
    """Pure-python mirror of the sketch formulas (bin, skey order,
    integer rank, midpoint estimate) — the property-test oracle."""
    g = gamma_of(alpha)
    lng = math.log(g)
    bins = {}
    for v in vals:
        if v > 0:
            k = (1, math.ceil(math.log(v) / lng))
        elif v < 0:
            k = (-1, math.ceil(math.log(-v) / lng))
        else:
            k = (0, 0)
        bins[k] = bins.get(k, 0) + 1
    total = len(vals)
    rank = (q_num * total + q_den - 1) // q_den
    cum = 0
    for sign, b in sorted(bins, key=lambda k: k[0] * (2 ** 32 + k[1])):
        cum += bins[(sign, b)]
        if cum >= rank:
            return 0.0 if sign == 0 else sign * 2.0 * g ** b / (g + 1.0)
    raise AssertionError("rank not reached")


def test_sketch_math_property():
    """Hypothesis: for ANY finite value list the midpoint estimate of
    the bin holding the nearest-rank p95 is within alpha relative
    error of that exact order statistic — the published DDSketch
    guarantee, checked against the same formulas the Spark/DuckDB
    implementations use (pure python, no Spark per example)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    finite = st.one_of(
        st.floats(min_value=1e-12, max_value=1e12),
        st.floats(min_value=-1e12, max_value=-1e-12),
        st.just(0.0))

    @settings(max_examples=300, deadline=None)
    @given(st.lists(finite, min_size=1, max_size=200))
    def check(vals):
        est = _py_sketch_quantile(vals, 19, 20)
        vs = sorted(vals)
        exact = vs[max((19 * len(vs) + 19) // 20, 1) - 1]
        if exact == 0.0:
            assert est == 0.0
        else:
            assert abs(est - exact) / abs(exact) <= DEFAULT_ALPHA + 1e-12

    check()


def test_python_mirror_matches_spark(spark, corpus):
    """The property-test oracle and the Spark implementation are the
    same math: spot-check them equal on the shared corpus."""
    import numpy as np

    got = {(r.series_key, r.bucket_ms): r.p95
           for r in rollup_sketch_p95(corpus, "1d", "1m").collect()}
    groups = {}
    for r in corpus.collect():
        k = (r.series_key, r.ts_ms // 86_400_000 * 86_400_000)
        groups.setdefault(k, []).append(r.value)
    for k, vs in groups.items():
        assert np.isclose(got[k], _py_sketch_quantile(vs, 19, 20),
                          rtol=1e-12, atol=0), k
