"""Driver contract for the spark-graft builder (PySpark target).

entry(): flagship pipeline — derive per-series points from the sf0.001
events table, push them through the Gorilla encode→decode Spark path,
and roll up 1-minute tiers with exact p95 (the engine's north-star
query shape).

queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md §2B, each with a DuckDB-equivalent oracle (column names and
float rounding matched on both sides — see gorillaspark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gorillaspark.operators.encode import decode_points, encode_points
    from gorillaspark.operators.rollup import rollup_tier
    from gorillaspark.queries import _event_points

    pts = _event_points(spark, "/root/testdata/sf0.001")
    decoded = decode_points(encode_points(pts, "double"), as_double=True)
    return rollup_tier(decoded, "1m")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gorillaspark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gorillaspark.queries import ORACLES
    return dict(ORACLES)
