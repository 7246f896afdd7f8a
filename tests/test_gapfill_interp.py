"""Gap-fill interpolation + per-role/per-tool rates."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from gorillaspark.operators.gapfill import gapfill_interpolate
from gorillaspark.operators.rollup import role_rates, tool_rates


def test_gapfill_interpolate(spark):
    pdf = pd.DataFrame({
        "series_key": ["a"] * 3,
        "ts_ms": [60_000, 120_000, 360_000],
        "value": [1.0, 2.0, 6.0],
    })
    out = (gapfill_interpolate(spark.createDataFrame(pdf), "1m")
           .toPandas().sort_values("bucket_ms").reset_index(drop=True))
    # buckets 1..6 min; 3m..5m interpolate linearly between 2.0 and 6.0
    assert out["value"].tolist() == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    assert out["filled"].tolist() == [False, False, True, True, True, False]


def test_gapfill_interpolate_edges(spark):
    pdf = pd.DataFrame({
        "series_key": ["a"] * 2,
        "ts_ms": [120_000, 300_000],
        "value": [10.0, 40.0],
    })
    out = (gapfill_interpolate(spark.createDataFrame(pdf), "1m")
           .toPandas().sort_values("bucket_ms").reset_index(drop=True))
    assert math.isclose(out["value"].iloc[1], 20.0)
    assert math.isclose(out["value"].iloc[2], 30.0)


def test_role_and_tool_rates(spark, transcripts):
    rr = role_rates(transcripts, "1 hour").toPandas()
    assert set(rr["role"]) <= {"user", "assistant", "tool", "system"}
    assert rr["messages"].sum() == transcripts.count()
    tr = tool_rates(transcripts, "1 hour").toPandas()
    assert set(tr["tool"]) <= {"search", "exec", "browse", "fetch"}
    n_tool_turns = transcripts.where(F.col("tool").isNotNull()).count()
    assert tr["calls"].sum() == n_tool_turns
