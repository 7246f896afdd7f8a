"""As-of and bucketed interval joins vs in-process pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gorillaspark.operators.asof import asof_join, bucketed_interval_join


@pytest.fixture(scope="module")
def sides(spark):
    rng = np.random.default_rng(42)
    n_l, n_r = 400, 300
    left = pd.DataFrame({
        "k": rng.integers(0, 8, n_l),
        "lts": rng.integers(0, 100_000, n_l).astype("int64"),
        "lid": np.arange(n_l, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 8, n_r),
        "rts": rng.integers(0, 100_000, n_r).astype("int64"),
        "val": rng.normal(0, 1, n_r).round(3),
    })
    # make timestamps unique per key so the match is well-defined
    right = right.drop_duplicates(["k", "rts"])
    # inject exact-tie rows: the inclusive (>=) semantics must match
    ties = left.iloc[:5].copy()
    right = pd.concat([right, pd.DataFrame({
        "k": ties.k.values, "rts": ties.lts.values,
        "val": np.full(5, 9.5)})]).drop_duplicates(["k", "rts"])
    return left, right


def _pd_asof(left, right, direction, tol=None):
    out = pd.merge_asof(
        left.sort_values("lts"), right.sort_values("rts"),
        left_on="lts", right_on="rts", by="k", direction=direction,
        tolerance=tol, allow_exact_matches=True)
    return out.sort_values("lid").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas(spark, sides, direction):
    left, right = sides
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = (asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts",
                     right_cols=["val"], direction=direction, how="left")
           .toPandas().sort_values("lid").reset_index(drop=True))
    exp = _pd_asof(left, right, direction)
    assert len(got) == len(left)
    pd.testing.assert_series_equal(
        got["asof_ts"].astype("float64"), exp["rts"].astype("float64"),
        check_names=False)
    pd.testing.assert_series_equal(
        got["asof_val"].astype("float64"), exp["val"].astype("float64"),
        check_names=False)


def test_asof_join_tolerance_and_inner(spark, sides):
    left, right = sides
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = (asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts",
                     right_cols=["val"], tolerance_ms=500, how="inner")
           .toPandas().sort_values("lid").reset_index(drop=True))
    exp = _pd_asof(left, right, "backward", tol=500)
    exp = exp[exp.rts.notna()].reset_index(drop=True)
    assert list(got["lid"]) == list(exp["lid"])
    assert np.allclose(got["asof_ts"], exp["rts"])
    # every surviving match is within tolerance
    assert ((got["lid"].map(left.set_index("lid").lts) - got["asof_ts"])
            <= 500).all()


def test_bucketed_interval_join_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    spans = pd.DataFrame({
        "sid": np.arange(60, dtype="int64"),
        "start_ms": rng.integers(0, 500_000, 60).astype("int64"),
    })
    # span lengths straddle the bucket size (10k): sub-bucket, exact
    # multiple, and multi-bucket spans all occur
    spans["end_ms"] = spans.start_ms + rng.integers(0, 35_000, 60)
    points = pd.DataFrame({
        "pid": np.arange(500, dtype="int64"),
        "ts_ms": rng.integers(0, 540_000, 500).astype("int64"),
    })
    got = (bucketed_interval_join(
        spark.createDataFrame(spans), spark.createDataFrame(points),
        bucket_ms=10_000)
        .select("sid", "pid").toPandas()
        .sort_values(["sid", "pid"]).reset_index(drop=True))
    brute = spans.merge(points, how="cross")
    brute = brute[(brute.ts_ms >= brute.start_ms)
                  & (brute.ts_ms <= brute.end_ms)][["sid", "pid"]] \
        .sort_values(["sid", "pid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, brute)
    # exactly-once: no dedup pass inside, so no duplicates may appear
    assert not got.duplicated().any()


def test_two_tier_interval_count_matches_single_tier(spark):
    from gorillaspark.operators.asof import interval_count_two_tier
    rng = np.random.default_rng(11)
    spans = pd.DataFrame({
        "sid": np.arange(50, dtype="int64"),
        "start_ms": rng.integers(0, 400_000, 50).astype("int64"),
    })
    spans["end_ms"] = spans.start_ms + rng.integers(0, 60_000, 50)
    points = pd.DataFrame({
        "ts_ms": rng.integers(0, 460_000, 2_000).astype("int64")})
    got = (interval_count_two_tier(
        spark.createDataFrame(spans), spark.createDataFrame(points),
        ["sid"], bucket_ms=10_000)
        .toPandas().set_index("sid")["n_points"].sort_index())
    brute = spans.merge(points, how="cross")
    exp = ((brute.ts_ms >= brute.start_ms)
           & (brute.ts_ms <= brute.end_ms)).groupby(brute.sid).sum()
    exp = exp.reindex(spans.sid, fill_value=0).sort_index()
    assert (got.values == exp.values).all()
    # spans shorter than one bucket (edge-only) and spans spanning
    # multiple full buckets both occur in this fixture
    widths = (spans.end_ms - spans.start_ms)
    assert (widths < 10_000).any() and (widths > 20_000).any()


def test_asof_join_rejects_name_collisions(spark):
    left = spark.createDataFrame(
        [(1, 100, 1.0)], "k long, ts_ms long, asof_ts double")
    right = spark.createDataFrame(
        [(1, 50, 2.0)], "k long, ts_ms long, v double")
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, on="k")
    # right column literally named 'ts' would emit a duplicate asof_ts
    left2 = spark.createDataFrame([(1, 100)], "k long, ts_ms long")
    right2 = spark.createDataFrame(
        [(1, 50, 7)], "k long, ts_ms long, ts long")
    with pytest.raises(ValueError, match="collision"):
        asof_join(left2, right2, on="k", right_cols=["ts"])


def test_interval_join_drops_inverted_spans(spark):
    from gorillaspark.operators.asof import interval_count_two_tier
    spans = spark.createDataFrame(
        [(0, 0, 5000), (1, 9000, 100)],  # second span is inverted
        "sid long, start_ms long, end_ms long")
    pts = spark.createDataFrame([(1, 100), (2, 4000)],
                                "pid long, ts_ms long")
    got = bucketed_interval_join(spans, pts, bucket_ms=1000).toPandas()
    assert set(got.sid) == {0}          # no job abort, span 1 dropped
    assert len(got) == 2
    cnt = (interval_count_two_tier(spans, pts, ["sid"], bucket_ms=1000)
           .toPandas())
    assert dict(zip(cnt.sid, cnt.n_points)) == {0: 2}
