"""Time-series downsampling and derived-series operators.

* M4 — the published visualization downsampler: per (series, pixel
  bucket) keep min, max, first and last values. Error-free for
  line rendering at the bucket resolution, and a pure hash aggregate
  in Spark (min/max/min_by/max_by with map-side partial aggregation),
  so it scales like any rollup: one shuffle, no window sort.

* Counter rate — monotonic-counter increase per bucket with reset
  detection (a decrease means the counter restarted; the post-reset
  value counts as the increase, the standard rate() convention).
  One per-series window lag, then a hash aggregate.

* Mergeable fixed-bin histogram — per (series, bucket, value bin)
  counts. Mergeable by construction: coarser tiers are the SUM of
  finer-tier bins (``histogram_cascade``), never a re-read of raw —
  the property that makes percentile-ish queries cheap at 100 TB.

All three are pure JVM column plans (no Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MS = {"1m": 60_000, "1h": 3_600_000, "1d": 86_400_000}


def _bucket(tier: str):
    return (F.floor(F.col("ts_ms") / _MS[tier]) * _MS[tier]).alias(
        "bucket_ms")


def m4_downsample(pts: DataFrame, tier: str = "1h") -> DataFrame:
    """M4: (series, bucket) → v_min, v_max, v_first, v_last.

    first/last are argmin/argmax over the timestamp (``min_by`` /
    ``max_by`` — single-pass, partial-aggregatable). Timestamps are
    assumed unique within a series (the ingest contract); with
    duplicates the tie winner is engine-dependent.
    """
    return (pts.groupBy("series_key", _bucket(tier))
            .agg(F.min("value").alias("v_min"),
                 F.max("value").alias("v_max"),
                 F.min_by("value", "ts_ms").alias("v_first"),
                 F.max_by("value", "ts_ms").alias("v_last"),
                 F.count(F.lit(1)).alias("n")))


def counter_rate(pts: DataFrame, tier: str = "1h") -> DataFrame:
    """Per-bucket counter increase with reset handling.

    ``increase = v - lag(v)`` when non-negative, else ``v`` (counter
    restarted from 0 — the conventional monotonic-counter semantics).
    The first point of a series has no predecessor and contributes
    nothing. Output: (series_key, bucket_ms, increase, n_resets).
    """
    w = Window.partitionBy("series_key").orderBy("ts_ms")
    stepped = (pts
               .withColumn("_prev", F.lag("value").over(w))
               .where(F.col("_prev").isNotNull())
               .withColumn("_inc",
                           F.when(F.col("value") >= F.col("_prev"),
                                  F.col("value") - F.col("_prev"))
                           .otherwise(F.col("value")))
               .withColumn("_reset",
                           (F.col("value") < F.col("_prev")).cast("long")))
    return (stepped.groupBy("series_key", _bucket(tier))
            .agg(F.sum("_inc").alias("increase"),
                 F.sum("_reset").alias("n_resets")))


def histogram_tier(pts: DataFrame, tier: str = "1h",
                   bin_width: float = 10.0) -> DataFrame:
    """Fixed-width value histogram per (series, bucket):
    (series_key, bucket_ms, bin, cnt) with bin = floor(value/width).

    Plain hash aggregate — and, unlike a quantile, MERGEABLE: see
    :func:`histogram_cascade`.
    """
    return (pts.groupBy("series_key", _bucket(tier),
                        F.floor(F.col("value") / bin_width).alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def histogram_cascade(hist: DataFrame, tier: str) -> DataFrame:
    """Roll a finer histogram tier up to ``tier`` by summing bin
    counts — no raw-data re-read; the 100 TB path for coarse tiers."""
    return (hist.groupBy(
                "series_key",
                (F.floor(F.col("bucket_ms") / _MS[tier]) * _MS[tier])
                .alias("bucket_ms"),
                "bin")
            .agg(F.sum("cnt").alias("cnt")))
