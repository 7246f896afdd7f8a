"""Type-level oracle contract: for every registered query, the pandas
dtype KIND that DuckDB's fetchdf() will materialize must match the kind
Spark's toPandas() will materialize, derived from static types on both
sides (no data scanned).

Why: the driver hashes raw values column-by-column, so an oracle that
returns float64 40.0 against Spark's int64 40 is a red row even though
every value is numerically equal.  Round 4 lost its flagship query to
exactly this: DuckDB window SUM over BIGINT yields HUGEINT, which
fetchdf() lands as float64 (queries.py _sketch_p95_sql, fixed with
CAST(... AS BIGINT) in round 5).  This test sweeps ALL oracles for any
type-driven kind divergence so the class can never reach the driver.

Static means type-driven only: a nullable Spark int column whose data
happens to contain NULLs becomes float64 at toPandas() on both engines
symmetrically, so value-driven promotion can't diverge; only the
declared result types can, and that is what we pin here.
"""

from __future__ import annotations

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF),
    reason=f"test data dir {SF} absent (set SPARK_GRAFT_SF_DIR_SMALL)")

_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF}/{t}.parquet'")
    yield con
    con.close()


def _spark_kind(dt) -> str:
    """pandas dtype kind that toPandas() produces for a Spark type."""
    from pyspark.sql import types as T
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "f"  # Decimal lands as object in fact, but no oracle emits it
    if isinstance(dt, T.BooleanType):
        return "b"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "M"
    return "O"  # string / binary / array / map / struct


def _duck_kind(type_str: str) -> str:
    """pandas dtype kind that duckdb fetchdf() produces for a DuckDB
    result type.  HUGEINT is the trap: it has no numpy integer wide
    enough, so fetchdf() silently converts to float64."""
    t = type_str.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "i"
    if t in ("HUGEINT", "UHUGEINT"):
        return "f"  # fetchdf() materializes HUGEINT as float64
    if t in ("FLOAT", "DOUBLE", "REAL") or t.startswith("DECIMAL"):
        return "f"
    if t == "BOOLEAN":
        return "b"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "M"
    return "O"


def _all_pairs():
    import __spark_entry__ as e
    from gorillaspark.queries import EXTRA_ORACLES, EXTRA_QUERIES
    qs, oracles = e.queries(), e.oracle_sql()
    qs = {**qs, **EXTRA_QUERIES}
    oracles = {**oracles, **EXTRA_ORACLES}
    return sorted(n for n in qs if n in oracles)


@pytest.mark.parametrize("name", _all_pairs())
def test_oracle_dtype_kinds_match_spark(spark, duck, name):
    import __spark_entry__ as e
    from gorillaspark.queries import EXTRA_ORACLES, EXTRA_QUERIES
    qs = {**e.queries(), **EXTRA_QUERIES}
    oracles = {**e.oracle_sql(), **EXTRA_ORACLES}

    sschema = qs[name](spark, SF).schema  # analysis only, no collect
    rel = duck.sql(oracles[name])         # lazy relation, no execution
    skinds = {f.name: _spark_kind(f.dataType) for f in sschema.fields}
    dkinds = {c: _duck_kind(str(t)) for c, t in zip(rel.columns, rel.types)}

    assert set(skinds) == set(dkinds), (
        f"{name}: column sets differ: {sorted(skinds)} vs {sorted(dkinds)}")
    bad = {c: (skinds[c], dkinds[c], str(dict(zip(rel.columns, rel.types))[c]))
           for c in skinds if skinds[c] != dkinds[c]}
    assert not bad, (
        f"{name}: dtype-kind divergence (spark_kind, duck_kind, duck_type): "
        f"{bad} — the driver hash-compares raw values, so e.g. an uncast "
        f"DuckDB HUGEINT (integer SUM / window SUM) lands as float64 and "
        f"red-rows an exactly-correct query; CAST(... AS BIGINT) it")
