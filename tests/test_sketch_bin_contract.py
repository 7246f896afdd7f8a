"""Red-team the sketch's cross-engine bin contract (r5 verdict #4).

The DDSketch bin ``ceil(ln|v| / ln gamma)`` is computed by JVM
``Math.log`` on the Spark side and by DuckDB's libm in the oracle.
The module docstring argues a disagreement can only flip a bin when
``ln(v)/ln(gamma)`` sits within ~1 ulp of an integer — measure zero
for real corpora. These tests turn that prose argument into pinned
evidence:

1. a corpus guard: no value the driver's sketch queries actually bin
   (events.value at the driver SFs) has ``ln(v)/ln(gamma)`` within
   1e-9 of an integer — six orders of magnitude wider than the 1-ulp
   danger zone, so per-engine log differences cannot flip any bin the
   driver compares;
2. an adversarial cross-engine check: for values constructed to sit
   AS CLOSE TO bin boundaries as doubles allow (gamma^k for k across
   the corpus range, plus their nextafter neighbours both ways), the
   Spark plan's bins and the DuckDB oracle expression's bins agree
   exactly on this box — the contract holds even where it is thinnest.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from gorillaspark.operators.sketch import DEFAULT_ALPHA, gamma_of

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
           if os.path.isdir(d)]
pytestmark = pytest.mark.skipif(not SF_DIRS, reason="no test data dirs")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_corpus_values_clear_of_bin_boundaries(sf_dir):
    import duckdb
    g = gamma_of(DEFAULT_ALPHA)
    con = duckdb.connect()
    # |v| = 1 IS a bin boundary, harmlessly: ln(1.0) == 0.0 exactly is
    # an IEEE special case every libm honors, so both engines compute
    # r = 0 and bin 0 with no rounding involved (also pinned by the
    # adversarial test below, which includes 1.0 and its neighbours)
    vals = con.execute(
        f"SELECT DISTINCT CAST(value AS DOUBLE) AS v FROM "
        f"'{sf_dir}/events.parquet' WHERE value <> 0 AND abs(value) <> 1"
    ).fetchnumpy()["v"]
    con.close()
    assert len(vals) > 0
    r = np.log(np.abs(vals)) / math.log(g)
    dist = np.abs(r - np.rint(r))
    assert dist.min() > 1e-9, (
        f"corpus value {vals[dist.argmin()]!r} sits {dist.min():.3e} "
        f"from a bin boundary — inside the cross-engine ulp danger "
        f"zone; the driver sketch oracles are no longer safe")


def test_boundary_values_bin_identically_cross_engine(spark):
    import duckdb
    g = gamma_of(DEFAULT_ALPHA)
    lng = math.log(g)
    # the nastiest constructible inputs: doubles nearest to gamma^k
    # (exact bin boundaries), and one ulp either side of each
    ks = list(range(-20, 701, 45))  # spans ~1e-1 .. ~1e6 for alpha=.01
    base = [float(g) ** k for k in ks] + [1.0]
    vals = sorted({f(v) for v in base
                   for f in (lambda x: x,
                             lambda x: np.nextafter(x, np.inf),
                             lambda x: np.nextafter(x, -np.inf))})

    day0 = 1_700_000_000_000
    rows = [("s", day0 + i, float(v)) for i, v in enumerate(vals)]
    pts = spark.createDataFrame(
        rows, "series_key string, ts_ms long, value double")
    from gorillaspark.operators.sketch import _sign_bin
    sign, bin_ = _sign_bin("value", DEFAULT_ALPHA)
    sdf = pts.select("value", bin_).collect()
    spark_bins = {r["value"]: r["bin"] for r in sdf}

    con = duckdb.connect()
    duck = con.execute(
        f"SELECT v, CAST(ceil(ln(abs(v)) / {lng!r}) AS BIGINT) AS b "
        f"FROM (SELECT unnest(?::DOUBLE[]) AS v)", [vals]).fetchall()
    con.close()
    duck_bins = {v: b for v, b in duck}

    mismatches = {v: (spark_bins[v], duck_bins[v]) for v in vals
                  if spark_bins[v] != duck_bins[v]}
    assert not mismatches, (
        f"JVM Math.log and DuckDB libm disagree on bin at "
        f"{len(mismatches)} boundary values: "
        f"{dict(list(mismatches.items())[:5])} — the sketch oracle "
        f"contract is broken on this box")
