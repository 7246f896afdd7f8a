"""Spark operators for Gorilla block encode/decode.

Scale design (SURVEY.md §3.4/§4.3):

* one shuffle lays points out for encoding:
  ``repartition(series_key, block_ts)`` co-locates every block, then
  ``sortWithinPartitions`` orders points inside each block;
* the encode UDF is ``mapInPandas`` — NOT per-group ``applyInPandas``
  — because realistic blocks are 50–500 points and per-group UDF
  dispatch would dominate; instead each Arrow batch is handed to the
  segmented numpy kernel (:func:`gorillaspark.codec.vector
  .encode_blocks`) in ONE call. A block whose points straddle two Arrow
  batches is carried over between batches inside the same partition
  iterator, so correctness never depends on batch boundaries;
* block size is naturally bounded: day-aligned ``block_ts`` caps a
  block at one conv-day, so no salting is needed here (hot conv_ids
  split across days); skew is handled at the rollup/aggregation stage;
* decode is the mirror image: blocks → points via one kernel call per
  batch, exploded back to rows JVM-side by the Arrow return.

Value transparency: double metrics travel as raw IEEE-754 bits through
the codec (NaN payloads / -0.0 / subnormals round-trip bit-exactly,
reference `Pair.java:21-23` semantics).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..codec.vector import decode_blocks_fast, encode_blocks_fast

BLOCK_SCHEMA = StructType([
    StructField("series_key", StringType(), False),
    StructField("block_ts", LongType(), False),
    StructField("n_points", IntegerType(), False),
    StructField("value_kind", StringType(), False),
    StructField("words", ArrayType(LongType(), False), False),
])

POINT_SCHEMA_BITS = StructType([
    StructField("series_key", StringType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("value", LongType(), False),   # raw 64-bit pattern
])

POINT_SCHEMA_DOUBLE = StructType([
    StructField("series_key", StringType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("value", DoubleType(), False),
])


def _encode_batch(pdf: pd.DataFrame, value_kind: str) -> pd.DataFrame:
    """Encode one already-sorted batch: group boundaries from the
    (series_key, block_ts) change points, one segmented-kernel call."""
    keys = pdf["series_key"].to_numpy()
    bts = pdf["block_ts"].to_numpy()
    ts = pdf["ts_ms"].to_numpy()
    vals = pdf["value"].to_numpy()
    if vals.dtype == np.float64:
        vals = vals.view(np.uint64)
    else:
        vals = vals.astype(np.int64).view(np.uint64)
    n = len(ts)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (keys[1:] != keys[:-1]) | (bts[1:] != bts[:-1])
    starts = np.flatnonzero(change)
    offsets = np.empty(starts.shape[0] + 1, dtype=np.int64)
    offsets[:-1] = starts
    offsets[-1] = n
    words, wc = encode_blocks_fast(bts[starts], offsets, ts, vals)
    wsplit = np.split(words.view(np.int64), np.cumsum(wc)[:-1])
    return pd.DataFrame({
        "series_key": keys[starts],
        "block_ts": bts[starts],
        "n_points": (offsets[1:] - offsets[:-1]).astype(np.int32),
        "value_kind": value_kind,
        "words": wsplit,
    })


def _encode_partition(batches: Iterator[pd.DataFrame],
                      value_kind: str) -> Iterator[pd.DataFrame]:
    """Carry the trailing (possibly incomplete) block across Arrow batch
    boundaries; each yielded frame is the encoding of whole blocks."""
    held: pd.DataFrame | None = None
    for pdf in batches:
        if pdf.empty:
            continue
        if held is not None:
            pdf = pd.concat([held, pdf], ignore_index=True)
        keys = pdf["series_key"].to_numpy()
        bts = pdf["block_ts"].to_numpy()
        # the last group may continue in the next batch — hold it back
        tail_mask = (keys == keys[-1]) & (bts == bts[-1])
        if tail_mask.all():
            held = pdf
            continue
        tail_len = int(tail_mask[::-1].argmin())  # trailing True count
        held = pdf.iloc[len(pdf) - tail_len:].reset_index(drop=True)
        yield _encode_batch(pdf.iloc[:len(pdf) - tail_len], value_kind)
    if held is not None and not held.empty:
        yield _encode_batch(held, value_kind)


def encode_points(points: DataFrame, value_kind: str = "double",
                  partitions: int | None = None) -> DataFrame:
    """points(series_key, ts_ms, value) → Gorilla blocks.

    One shuffle: hash-repartition on the block key, sort within
    partitions, stream batches through the segmented kernel.
    """
    from .normalize import block_key

    pts = points.withColumn("block_ts", block_key("ts_ms"))
    n_part = partitions or pts.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    laid_out = (
        pts.repartition(int(n_part), "series_key", "block_ts")
        .sortWithinPartitions("series_key", "block_ts", "ts_ms")
    )
    return laid_out.mapInPandas(
        lambda it: _encode_partition(it, value_kind), BLOCK_SCHEMA)


def _decode_partition(batches: Iterator[pd.DataFrame],
                      as_double: bool) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if pdf.empty:
            continue
        words_lists = pdf["words"]
        wc = np.fromiter((len(w) for w in words_lists), dtype=np.int64,
                         count=len(words_lists))
        words = np.concatenate([np.asarray(w, dtype=np.int64)
                                for w in words_lists]).view(np.uint64) \
            if len(words_lists) else np.empty(0, np.uint64)
        offsets, ts, vals = decode_blocks_fast(
            words, wc, n_points_hint=int(pdf['n_points'].sum()))
        lens = (offsets[1:] - offsets[:-1])
        yield pd.DataFrame({
            "series_key": pdf["series_key"].to_numpy().repeat(lens),
            "ts_ms": ts,
            "value": vals.view(np.float64) if as_double
            else vals.view(np.int64),
        })


def decode_points(blocks: DataFrame, as_double: bool = True) -> DataFrame:
    """Gorilla blocks → points; value restored from raw bits.

    The bit reinterpretation happens inside the Arrow batch (zero-copy
    ``view``), the Java-side equivalent of Double.longBitsToDouble
    (`Pair.java:21-23`)."""
    schema = POINT_SCHEMA_DOUBLE if as_double else POINT_SCHEMA_BITS
    return blocks.mapInPandas(
        lambda it: _decode_partition(it, as_double), schema)


def roundtrip_check(points: DataFrame, value_kind: str = "double") -> DataFrame:
    """decode(encode(points)) joined back to the input; returns rows
    that fail raw-bit equality (empty result == pass). Distributed —
    the check is a join + filter, never a driver collect; NaN payloads
    and -0.0 are compared on their exact bit patterns."""
    from ..functions.bits import double_to_bits

    blocks = encode_points(points, value_kind)
    decoded = decode_points(blocks, as_double=False).withColumnRenamed(
        "value", "decoded_bits")
    orig = points.select(
        "series_key", "ts_ms",
        double_to_bits("value").alias("orig_bits") if value_kind == "double"
        else F.col("value").cast("long").alias("orig_bits"))
    joined = orig.join(decoded, ["series_key", "ts_ms"], "full_outer")
    return joined.where(
        F.col("orig_bits").isNull() | F.col("decoded_bits").isNull()
        | (F.col("orig_bits") != F.col("decoded_bits")))
