"""Mergeable quantile sketch tier (DDSketch-style log-binned).

Closes the one structural 100 TB gap in the rollup cascade: exact p95
(``F.percentile``) is not mergeable, so ``rollup_from_lower`` had to
either re-read raw points for the p95 column or emit NULL. This module
provides the mergeable alternative with a *stated relative-error
bound*: the DDSketch binning of Masson, Rim & Lee, "DDSketch: a fast
and fully-mergeable quantile sketch with relative-error guarantees"
(VLDB 2019) — log-width bins ``bin = ceil(log_gamma |v|)`` with
``gamma = (1+alpha)/(1-alpha)``, giving a quantile estimate within
relative error ``alpha`` of the true (nearest-rank) quantile value.

Unlike a t-digest, the sketch here is *plain rows* — one
``(series_key, bucket_ms, sign, bin, cnt)`` row per occupied bin — so:

* the 1m tier is a single hash aggregate (map-side combinable, salting
  compatible, no TypedImperativeAggregate buffers);
* cascading 1m → 1h → 1d is a SUM of counts (``dd_sketch_cascade``) —
  never a re-read of raw data, which is the whole point at 100 TB;
* the sketch and its quantile extraction are exactly reproducible in
  ANSI SQL, so the driver's DuckDB oracle can verify *values*, not
  just shapes (no other mergeable-quantile design we considered has
  an exact SQL twin).

Determinism/portability notes (the oracle contract depends on these):

* bins use natural log; JVM ``Math.log`` and DuckDB's libm agree to
  the last ulp on this box, and a disagreement could only flip a bin
  when ``ln(v)/ln(gamma)`` sits within 1 ulp of an integer — pinned
  by tests/test_sketch_bin_contract.py: every driver-corpus value
  clears the nearest boundary by >= 1e-9 (measured 1.7e-5; |v| = 1 is
  the IEEE-exact ``ln(1)=0`` case), and adversarial values one ulp
  either side of ``gamma^k`` boundaries bin identically cross-engine;
* the quantile rank is pure integer arithmetic
  (``ceil(q_num*total/q_den)`` via ``(a+b-1) div b``), never
  ``ceil(0.95*n)`` in floating point;
* bins order by the single integer key ``skey = sign * (2^32 + bin)``
  which sorts by numeric value across negative/zero/positive bins.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MS = {"1m": 60_000, "1h": 3_600_000, "1d": 86_400_000}

DEFAULT_ALPHA = 0.01


def gamma_of(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def _bucket(tier: str):
    return (F.floor(F.col("ts_ms") / _MS[tier]) * _MS[tier]).alias(
        "bucket_ms")


def _sign_bin(value, alpha: float):
    """(sign, bin) expressions for a double column: sign ∈ {-1,0,1},
    bin = ceil(ln|v| / ln gamma) (0 for v == 0).

    NULLs fail loudly (raise_error), not silently: a NULL would
    otherwise fall through every when() into the zero bin with a NULL
    bin key, counting toward the quantile total and sorting first —
    the same reject-don't-misbin stance the codec takes (NaN/±inf
    already fail at the ANSI bin cast)."""
    lng = math.log(gamma_of(alpha))
    v = F.col(value) if isinstance(value, str) else value
    null_err = F.raise_error(F.lit(
        "dd_sketch received a NULL value — the sketch has no "
        "missing-value bin (validate or gap-fill upstream; pandas NaN "
        "converts to Arrow NULL)"))
    sign = (F.when(v.isNull(), null_err.cast("int"))
            .when(v > 0, F.lit(1)).when(v < 0, F.lit(-1))
            .otherwise(F.lit(0)).cast("int").alias("sign"))
    bin_ = (F.when(v == 0, F.lit(0))
            .otherwise(F.ceil(F.log(F.abs(v)) / F.lit(lng)))
            .cast("long").alias("bin"))
    return sign, bin_


def dd_sketch_tier(pts: DataFrame, tier: str = "1m",
                   alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """points(series_key, ts_ms, value) → sketch rows
    (series_key, bucket_ms, sign, bin, cnt).

    Values must be finite: NaN/±inf have no log bin (under Spark's
    ANSI mode the bin cast fails loudly rather than mis-binning) —
    the same contract as the codec's NULL rejection; filter or clamp
    upstream.

    One hash aggregate — the sketch IS the grouped relation. Row count
    per (series, bucket) is bounded by the number of occupied bins:
    ≤ ~log_gamma(max/min) ≈ 1400 bins for alpha=0.01 over 6 decades,
    and in practice far fewer than the raw point count the exact-p95
    path would have to re-read.
    """
    sign, bin_ = _sign_bin("value", alpha)
    return (pts.groupBy("series_key", _bucket(tier), sign, bin_)
            .agg(F.count(F.lit(1)).alias("cnt")))


def dd_sketch_cascade(sk: DataFrame, tier: str) -> DataFrame:
    """Roll a finer sketch tier up to ``tier`` by summing bin counts —
    no raw re-read; sketches are fully mergeable by construction.

    The merge repartitions by (series, coarse-bucket) EXPLICITLY
    rather than letting the groupBy shuffle on the full
    (series, bucket, sign, bin) key: a subset partitioning satisfies
    the aggregate's clustering requirement, and — the point — it also
    satisfies the (series, bucket) window partitioning of
    :func:`dd_sketch_quantile`/:func:`dd_sketch_quantiles`, so the
    quantile extraction after a cascade inserts NO further exchange
    (plan-asserted in tests/test_plans.py). Map-side combine loses
    nothing: the fine tier's output is scattered by its own hash, so
    partial aggregation across same-day buckets had nothing to merge
    locally anyway.
    """
    day = (F.floor(F.col("bucket_ms") / _MS[tier]) * _MS[tier])
    return (sk.repartition(F.col("series_key"), day)
            .groupBy("series_key", day.alias("bucket_ms"),
                     "sign", "bin")
            .agg(F.sum("cnt").alias("cnt")))


def dd_sketch_quantile(sk: DataFrame, q_num: int = 19, q_den: int = 20,
                       alpha: float = DEFAULT_ALPHA,
                       out_col: str = "p95") -> DataFrame:
    """Extract the q = q_num/q_den quantile estimate per
    (series_key, bucket_ms) from sketch rows.

    Nearest-rank convention: the estimate is the midpoint value of the
    bin containing the ``ceil(q*total)``-th smallest point (rank in
    pure integer arithmetic). Output:
    (series_key, bucket_ms, cnt, <out_col>) where cnt is the total
    point count and the estimate carries relative error ≤ alpha vs the
    true nearest-rank quantile value.

    One window cumsum over bins *within a (series, bucket) group* —
    partition-local and tiny (bins per group, not points), so the sort
    is bounded regardless of raw skew.
    """
    g = gamma_of(alpha)
    skey = (F.col("sign").cast("long")
            * (F.lit(2 ** 32) + F.col("bin"))).alias("skey")
    w = (Window.partitionBy("series_key", "bucket_ms")
         .orderBy("skey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wg = Window.partitionBy("series_key", "bucket_ms")
    cum = sk.select("series_key", "bucket_ms", "sign", "bin", "cnt",
                    skey) \
        .withColumn("cum", F.sum("cnt").over(w)) \
        .withColumn("total", F.sum("cnt").over(wg))
    # rank = ceil(q_num*total/q_den) via integer (a + b - 1) div b
    rank = F.floor((F.lit(q_num) * F.col("total") + F.lit(q_den - 1))
                   / F.lit(q_den))
    hit = cum.where((F.col("cum") >= rank)
                    & (F.col("cum") - F.col("cnt") < rank))
    est = (F.when(F.col("sign") == 0, F.lit(0.0))
           .otherwise(F.col("sign")
                      * (F.lit(2.0) * F.pow(F.lit(g), F.col("bin"))
                         / F.lit(g + 1.0))))
    return hit.select("series_key", "bucket_ms",
                      F.col("total").alias("cnt"),
                      est.alias(out_col))


def dd_sketch_quantiles(sk: DataFrame,
                        qs: list[tuple[int, int, str]] | None = None,
                        alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """Extract SEVERAL quantiles per (series_key, bucket_ms) in one
    pass over the sketch — one window cumsum, one hash aggregate, no
    matter how many quantiles (the dashboard shape: p50/p95/p99).

    ``qs`` is a list of (q_num, q_den, out_col); default
    [(1,2,'p50'), (19,20,'p95'), (99,100,'p99')]. Each estimate
    carries the same ≤ alpha relative-error bound as
    :func:`dd_sketch_quantile`.
    """
    if qs is None:
        qs = [(1, 2, "p50"), (19, 20, "p95"), (99, 100, "p99")]
    g = gamma_of(alpha)
    skey = (F.col("sign").cast("long")
            * (F.lit(2 ** 32) + F.col("bin"))).alias("skey")
    w = (Window.partitionBy("series_key", "bucket_ms")
         .orderBy("skey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wg = Window.partitionBy("series_key", "bucket_ms")
    cum = sk.select("series_key", "bucket_ms", "sign", "bin", "cnt",
                    skey) \
        .withColumn("cum", F.sum("cnt").over(w)) \
        .withColumn("total", F.sum("cnt").over(wg))
    est = (F.when(F.col("sign") == 0, F.lit(0.0))
           .otherwise(F.col("sign")
                      * (F.lit(2.0) * F.pow(F.lit(g), F.col("bin"))
                         / F.lit(g + 1.0))))
    aggs = []
    for q_num, q_den, name in qs:
        rank = F.floor((F.lit(q_num) * F.col("total")
                        + F.lit(q_den - 1)) / F.lit(q_den))
        hit = (F.col("cum") >= rank) & (F.col("cum") - F.col("cnt") < rank)
        # exactly one row per group satisfies `hit` for each quantile
        aggs.append(F.max(F.when(hit, est)).alias(name))
    return (cum.groupBy("series_key", "bucket_ms")
            .agg(F.max("total").alias("cnt"), *aggs))


def rollup_sketch_p95(pts: DataFrame, tier: str = "1d",
                      from_tier: str = "1m",
                      alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """The cascade path end-to-end: build the fine sketch tier, merge
    it up to ``tier``, extract p95 — raw points are read exactly once
    (by the fine tier's single hash aggregate)."""
    fine = dd_sketch_tier(pts, from_tier, alpha)
    coarse = dd_sketch_cascade(fine, tier)
    return dd_sketch_quantile(coarse, 19, 20, alpha, out_col="p95")
