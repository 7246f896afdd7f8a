"""Gap-fill: densify per-series time grids and fill missing buckets.

Composition of built-in operators (SURVEY.md §2B): per-series min/max →
``sequence`` + ``explode`` builds the dense grid (distributed — the
grid rows materialize on executors, never the driver), left join back,
then forward-fill with ``last(..., ignorenulls)`` over an ordered
window. Linear interpolation variant uses the next/prev anchor values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SPANS_MS = {"1m": 60_000, "1h": 3_600_000, "1d": 86_400_000}


def dense_grid(points: DataFrame, tier: str = "1m") -> DataFrame:
    """One row per (series_key, bucket) covering each series' span.

    Two-level explode: days first, then buckets within each day. A
    multi-year series at 1-minute granularity would otherwise build a
    single million-element array on one row (executor OOM risk at
    100 TB); day-chunking caps every intermediate array at ≤ 1440
    elements and lets the inner explode pipeline row-by-row.
    """
    step = _SPANS_MS[tier]
    day = 86_400_000
    spans = points.groupBy("series_key").agg(
        F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi"))
    days = spans.select(
        "series_key", "lo", "hi",
        F.explode(F.sequence(
            F.col("lo") - F.pmod(F.col("lo"), F.lit(day)),
            F.col("hi") - F.pmod(F.col("hi"), F.lit(day)),
            F.lit(day))).alias("day_ms"))
    lo_b = F.greatest(F.col("day_ms"),
                      F.col("lo") - F.pmod(F.col("lo"), F.lit(step)))
    hi_b = F.least(F.col("day_ms") + F.lit(day - step),
                   F.col("hi") - F.pmod(F.col("hi"), F.lit(step)))
    return (days
            .where(lo_b <= hi_b)
            .select("series_key",
                    F.explode(F.sequence(lo_b, hi_b, F.lit(step)))
                     .alias("bucket_ms"))
            .withColumn("bucket", F.timestamp_millis("bucket_ms")))


def gapfill_ffill(points: DataFrame, tier: str = "1m",
                  agg: str = "avg") -> DataFrame:
    """Bucket the series, densify, and forward-fill empty buckets with
    the last observed aggregate. ``filled`` marks synthesized rows."""
    step = _SPANS_MS[tier]
    bucketed = (
        points
        .withColumn("bucket_ms",
                    F.col("ts_ms") - F.pmod(F.col("ts_ms"), F.lit(step)))
        .groupBy("series_key", "bucket_ms")
        .agg(getattr(F, agg)("value").alias("value"))
    )
    grid = dense_grid(points, tier)
    w = (Window.partitionBy("series_key").orderBy("bucket_ms")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        grid.join(bucketed, ["series_key", "bucket_ms"], "left")
        .withColumn("filled", F.col("value").isNull())
        .withColumn("value", F.last("value", ignorenulls=True).over(w))
        .select("series_key", "bucket", "bucket_ms", "value", "filled")
    )


def gapfill_interpolate(points: DataFrame, tier: str = "1m",
                        agg: str = "avg") -> DataFrame:
    """Linear interpolation between the previous and next observed
    buckets (ffill semantics at the trailing edge, NULL before the
    first observation)."""
    step = _SPANS_MS[tier]
    bucketed = (
        points
        .withColumn("bucket_ms",
                    F.col("ts_ms") - F.pmod(F.col("ts_ms"), F.lit(step)))
        .groupBy("series_key", "bucket_ms")
        .agg(getattr(F, agg)("value").alias("value"))
    )
    grid = dense_grid(points, tier)
    joined = grid.join(bucketed, ["series_key", "bucket_ms"], "left")
    back = (Window.partitionBy("series_key").orderBy("bucket_ms")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fwd = (Window.partitionBy("series_key").orderBy("bucket_ms")
           .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    prev_v = F.last("value", ignorenulls=True).over(back)
    next_v = F.first("value", ignorenulls=True).over(fwd)
    prev_t = F.last(F.when(F.col("value").isNotNull(), F.col("bucket_ms")),
                    ignorenulls=True).over(back)
    next_t = F.first(F.when(F.col("value").isNotNull(), F.col("bucket_ms")),
                     ignorenulls=True).over(fwd)
    frac = (F.col("bucket_ms") - prev_t) / (next_t - prev_t)
    interp = F.when(F.col("value").isNotNull(), F.col("value")) \
        .when(next_v.isNull(), prev_v) \
        .when(prev_v.isNull(), F.lit(None)) \
        .otherwise(prev_v + (next_v - prev_v) * frac)
    return (joined
            .withColumn("filled", F.col("value").isNull())
            .withColumn("value", interp)
            .select("series_key", "bucket", "bucket_ms", "value", "filled"))
