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


def ewma_segmented(pts: DataFrame, alpha: float = 0.2,
                   chunk_ms: int = 86_400_000) -> DataFrame:
    """Per-series EWMA final value via day-segmented affine composition
    — the scale-safe replacement for a whole-series collect+fold.

    The recurrence y = α·x + (1−α)·y_prev is affine, so a chunk of
    points composes into one (A, B) pair with y_out = A·y_in + B, and
    chunks compose sequentially. Two-level plan, all JVM-side folds:

    1. group by (series, chunk): sort the chunk's points, fold them
       into A = Π(1−α) (one multiply per point), B (the α-weighted
       fold from 0), and F (the fold seeded with the chunk's first
       value — used only by a series' first chunk). Per-group state is
       bounded by points-per-chunk, never the whole series.
    2. group by series: sort the (chunk, A, B, F) rows — count bounded
       by series_span/chunk_ms — and fold y = F₁ then y = A_c·y + B_c.

    Bit-exactness contract: every floating-point operation and its
    order is fixed by construction (per-chunk sequential folds in
    (ts, value) order, cross-chunk sequential composition in chunk
    order), so an oracle performing the same sequence (DuckDB
    list_reduce per chunk + recursive CTE across chunks) reproduces
    the doubles bit-for-bit. NOTE the result differs in final ulps
    from a single whole-series fold — the registered semantic is the
    segmented composition itself, identically on both engines.

    Output: (series_key, ewma) with the raw double (callers truncate).
    """
    a1 = F.lit(1.0 - alpha)
    chunk = (F.floor(F.col("ts_ms") / chunk_ms) * chunk_ms) \
        .alias("chunk_ms")
    per_chunk = (pts.groupBy("series_key", chunk)
                 .agg(F.array_sort(
                      F.collect_list(F.struct("ts_ms", "value")))
                      .alias("pv")))
    vs = F.transform(F.col("pv"), lambda s: s["value"])
    step = lambda acc, x: F.lit(alpha) * x + a1 * acc  # noqa: E731
    rest = F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0)))
    per_chunk = per_chunk.select(
        "series_key", "chunk_ms",
        F.aggregate(vs, F.lit(1.0), lambda acc, x: acc * a1).alias("a"),
        F.aggregate(vs, F.lit(0.0), step).alias("b"),
        F.aggregate(rest, F.element_at(vs, 1), step).alias("f"))
    per_series = (per_chunk.groupBy("series_key")
                  .agg(F.array_sort(F.collect_list(
                       F.struct("chunk_ms", "a", "b", "f"))).alias("ch")))
    ch = F.col("ch")
    tail = F.slice(ch, 2, F.greatest(F.size(ch) - 1, F.lit(0)))
    ewma = F.aggregate(
        tail, F.element_at(ch, 1)["f"],
        lambda acc, s: s["a"] * acc + s["b"])
    return per_series.select("series_key", ewma.alias("ewma"))


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
