"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, batched Arrow UDF signatures,
partition sizing for fat binary rows) is real and tested; the actual
media decoding is STUBBED — the sandbox ships no image/audio libs —
behind ``decoder=`` hooks that raise ``NotImplementedError`` unless a
deterministic fake is requested. Swapping in PIL/torchaudio on a real
cluster changes only the hook body: batch shapes, schemas and
partitioning are already exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image|audio|video
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("payload", BinaryType(), False),     # opaque bytes
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("sha256", StringType(), False),
    StructField("feature", ArrayType(FloatType(), False), True),
])


def synthesize_media(spark, n: int = 256, seed: int = 3) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for
    exercising the binary-column path at test scale."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"))
         .alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        F.lit(1000).alias("duration_ms"),
        F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 512)
         .cast("binary").alias("payload"),
    )
    return df


def _fake_decode(kind: str, payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derives a fixed-size
    feature from the payload bytes (stable across runs/platforms)."""
    h = hashlib.sha256(kind.encode() + payload).digest()
    raw = np.frombuffer(h[: dim * 4], dtype="<u4").astype(np.float32)
    return raw / np.float32(2**32)


def extract_features(media: DataFrame, decoder: str = "stub",
                     dim: int = 8) -> DataFrame:
    """Batched feature extraction over the binary column.

    ``decoder='stub'`` raises NotImplementedError (real decode needs
    media libs absent from this container); ``decoder='fake'`` uses the
    deterministic byte-derived feature so the full Spark plumbing —
    Arrow batching of binary rows, schema, partition sizing — runs and
    is asserted in tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if decoder == "fake":
                    feats.append(_fake_decode(kind, bytes(payload), dim))
                else:
                    raise NotImplementedError(
                        "media decoding requires image/audio libraries not "
                        "present in this environment; use decoder='fake' "
                        "for plumbing tests or plug a real decoder here")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "sha256": [hashlib.sha256(bytes(p)).hexdigest()
                           for p in pdf["payload"]],
                "feature": feats,
            })

    # binary rows are fat: cap Arrow batch size via repartition so a
    # batch stays executor-memory friendly at 100 TB payload scale
    return media.repartition("media_id").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) —
    the explode is JVM-side; actual frame decode goes through
    :func:`extract_features`-style hooks."""
    return (media.where(F.col("kind") == "video")
            .select("media_id",
                    F.explode(
                        F.sequence(F.lit(0), F.col("duration_ms"),
                                   F.lit(every_ms))).alias("frame_ts_ms")))
