"""As-of and interval (range) joins — the time-series join shapes
Spark lacks as built-ins, expressed with shuffle-once plans.

As-of join (backward: for each left row, the latest right row with
``right.ts <= left.ts`` on the same key) is implemented as a UNION +
window, not a range join: tag both sides, union, sort each key's
timeline once, and carry the last-seen right payload forward with
``last(..., ignorenulls=True)``. One shuffle on the key, linear work,
no candidate-pair explosion — the plan survives arbitrarily long
histories per key, which a windowed range join does not. (DuckDB's
native ASOF JOIN is the oracle for correctness checks.)

Interval join (points within [start, end] spans) uses time-bucketing:
explode each span into the fixed-width buckets it overlaps, bucket the
points, equi-join on the bucket, then apply the exact range predicate.
Each point lands in exactly one bucket, so no dedup is needed; the
shuffle is an equi-join shuffle, never a cross product. At very large
scale the classic refinement is two-tier (pre-aggregated counts for
fully-contained buckets + exact scan of the two edge buckets); the
single-tier form here keeps arbitrary point payloads available to the
caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts_ms", right_ts: str = "ts_ms",
              right_cols: list[str] | None = None,
              direction: str = "backward",
              tolerance_ms: int | None = None,
              how: str = "inner") -> DataFrame:
    """As-of join: for each left row, the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its timestamp, per key.

    Output = every left column, plus ``asof_ts`` (the matched right
    timestamp) and the requested ``right_cols`` prefixed ``asof_``.
    Ties on equal timestamps match (inclusive, like DuckDB ASOF);
    among equal right timestamps the last one in (ts, input-order) is
    carried. ``tolerance_ms`` drops matches farther than the bound.
    ``how='left'`` keeps unmatched left rows with NULL matches.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)]
    # output/internal name collisions produce silently ambiguous
    # columns (e.g. a right column literally named 'ts' emits a second
    # 'asof_ts') — fail loudly instead
    reserved = {"asof_ts"} | {f"asof_{c}" for c in right_cols}
    internal = {"_k", "_ts", "_side", "_lpay", "_rts"} \
        | {f"_r_{c}" for c in right_cols}
    clashes = (set(left.columns) & (reserved | internal)) \
        | ({f"asof_{c}" for c in right_cols} & {"asof_ts"}) \
        | (set(right.columns) & internal)
    if clashes:
        raise ValueError(
            f"asof_join name collision on {sorted(clashes)}: rename the "
            "input column(s) or restrict right_cols")

    lefted = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lpay"),
        F.lit(None).cast("long").alias("_rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols])
    righted = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lefted.schema["_lpay"].dataType).alias("_lpay"),
        F.col(right_ts).cast("long").alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols])
    u = lefted.unionByName(righted)

    # one sort per key: right rows sort before left at equal ts so the
    # inclusive (>= / <=) match semantics fall out of last(ignorenulls)
    order = [F.col("_ts").asc(), F.col("_side").asc()] \
        if direction == "backward" else \
        [F.col("_ts").desc(), F.col("_side").asc()]
    w = (Window.partitionBy("_k").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        "_k", "_ts", "_side", "_lpay",
        F.last("_rts", ignorenulls=True).over(w).alias("asof_ts"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in right_cols])

    out = carried.where(F.col("_side") == 1)
    if tolerance_ms is not None:
        gap = (F.col("_ts") - F.col("asof_ts")) if direction == "backward" \
            else (F.col("asof_ts") - F.col("_ts"))
        out = out.withColumn(
            "asof_ts",
            F.when(gap <= tolerance_ms, F.col("asof_ts")))
        for c in right_cols:
            out = out.withColumn(
                f"asof_{c}",
                F.when(F.col("asof_ts").isNotNull(), F.col(f"asof_{c}")))
    if how == "inner":
        out = out.where(F.col("asof_ts").isNotNull())
    return out.select(
        *[F.col(f"_lpay.{c}").alias(c) for c in left.columns],
        "asof_ts", *[f"asof_{c}" for c in right_cols])


def bucketed_interval_join(spans: DataFrame, points: DataFrame,
                           bucket_ms: int = 3_600_000,
                           start_col: str = "start_ms",
                           end_col: str = "end_ms",
                           ts_col: str = "ts_ms") -> DataFrame:
    """All (span, point) pairs with ``start <= ts <= end``, via
    time-bucket equi-join (no key required between the two sides).

    Spans explode into the buckets they overlap; each point belongs to
    exactly one bucket, so the equi-join emits each qualifying pair
    exactly once — no distinct pass. The join shuffle is on the bucket
    id: bounded fan-out (span length / bucket_ms per span), never a
    per-key cross product. Pick ``bucket_ms`` ≈ median span length so
    the explode factor stays ~2 while bucket populations stay small.

    Contract: spans with ``end < start`` are empty intervals and are
    dropped up front (an unguarded one would abort the whole job with
    an opaque executor-side ``sequence`` error).
    """
    b = F.lit(bucket_ms)
    spans = spans.where(F.col(end_col) >= F.col(start_col))
    sp = spans.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(F.col(start_col) / b),
                             F.floor(F.col(end_col) / b))))
    pt = points.withColumn("_bucket", F.floor(F.col(ts_col) / b))
    return (sp.join(pt, "_bucket")
            .where(F.col(ts_col).between(F.col(start_col),
                                         F.col(end_col)))
            .drop("_bucket"))


def interval_count_two_tier(spans: DataFrame, points: DataFrame,
                            span_keys: list[str],
                            bucket_ms: int = 3_600_000,
                            start_col: str = "start_ms",
                            end_col: str = "end_ms",
                            ts_col: str = "ts_ms") -> DataFrame:
    """Points-per-span counts via the two-tier refinement: buckets
    FULLY contained in [start, end] contribute a pre-aggregated count
    (one small join against a per-bucket count table — no point rows
    touched), and only the ≤ 2 partial edge buckets per span scan
    actual points. Output: span_keys + ``n_points``.

    This is the shape that survives 100 TB: the point side is read
    once to build the per-bucket counts (reusable across span sets),
    and the per-span work is O(span/bucket) tiny rows plus two
    edge-bucket probes — pair materialization never happens. The
    single-tier :func:`bucketed_interval_join` remains the tool when
    the caller needs the matching point payloads, not statistics.

    Contract: spans with ``end < start`` are empty intervals and are
    dropped up front (see :func:`bucketed_interval_join`).
    """
    b = F.lit(bucket_ms)
    spans = spans.where(F.col(end_col) >= F.col(start_col))
    per_bucket = (points
                  .groupBy(F.floor(F.col(ts_col) / b).alias("_bucket"))
                  .agg(F.count(F.lit(1)).alias("_bcnt")))
    sp = spans.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(F.col(start_col) / b),
                             F.floor(F.col(end_col) / b))))
    is_full = ((F.col("_bucket") * b >= F.col(start_col))
               & ((F.col("_bucket") + 1) * b - 1 <= F.col(end_col)))
    full = (sp.where(is_full)
            .join(per_bucket, "_bucket")
            .groupBy(*span_keys)
            .agg(F.sum("_bcnt").alias("_full_cnt")))
    pt = points.withColumn("_bucket", F.floor(F.col(ts_col) / b))
    edge = (sp.where(~is_full)
            .join(pt, "_bucket")
            .where(F.col(ts_col).between(F.col(start_col),
                                         F.col(end_col)))
            .groupBy(*span_keys)
            .agg(F.count(F.lit(1)).alias("_edge_cnt")))
    base = spans.select(*span_keys).distinct()
    return (base.join(full, span_keys, "left")
            .join(edge, span_keys, "left")
            .select(*span_keys,
                    (F.coalesce("_full_cnt", F.lit(0))
                     + F.coalesce("_edge_cnt", F.lit(0)))
                    .alias("n_points")))
