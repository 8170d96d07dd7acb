"""Shared pytest fixtures: one SparkSession per test run, a DuckDB
connection with the catalog tables registered as views, and a comparator
that mirrors the driver's correctness gate (row-count + column-name-sorted,
order-insensitive value comparison)."""

from __future__ import annotations

import datetime
import decimal
import os

import duckdb
import pytest

from skripsi_mapreduce_spark.io import TABLES
from skripsi_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon_value(v):
    if v is None:
        return "␀"
    if isinstance(v, decimal.Decimal):
        # NO normalization: the external driver's hasher canonicalizes the
        # two engines' decimals differently (Spark Decimal('25.0000') vs a
        # float-ized 25.0 — 20 round-1 entries failed on exactly this), so
        # the repo convention is to never emit DECIMAL in a hash-matched
        # output at all (scaled-BIGINT _e4/_e6 columns instead). str() here
        # keeps trailing zeros so any decimal that sneaks back in fails
        # loudly instead of being masked.
        return str(v)
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return format(v, ".10g")
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canon_result(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (as the driver does), canonicalize values,
    return a sorted multiset of row tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _duck_kind(t: str) -> str:
    """Collapse a DuckDB type string to a comparison kind. HUGEINT and
    DECIMAL map to themselves so they can never kind-match a Spark type:
    both fetch as float64/object through pandas and the external driver's
    hasher then renders them differently from Spark's int64 even when the
    values are identical (round-1 DECIMAL trailing zeros, round-2
    emb_random_projection SUM(BIGINT)→HUGEINT)."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return "array<" + _duck_kind(t[:-2]) + ">"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "HUGEINT":
        return "hugeint"
    if t in {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}:
        return "int"
    if t in {"FLOAT", "REAL", "DOUBLE"}:
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t in {"VARCHAR", "TEXT", "STRING", "UUID", "BLOB"}:
        return "string"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith("STRUCT"):
        return "struct"
    if t.startswith("MAP"):
        return "map"
    return t.lower()


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return "array<" + _spark_kind(dt.elementType) + ">"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.StringType, T.BinaryType)):
        return "string"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.MapType):
        return "map"
    return dt.simpleString()


def dtype_mismatches(spark_schema, ddb_con, sql: str) -> list[str]:
    """Compare the oracle's DuckDB output column types against the Spark
    schema by kind (int-vs-int, float-vs-float, ...). Returns a list of
    human-readable mismatch strings — empty means the hash surfaces agree.
    ``con.sql(...)`` only binds/plans the query (no execution), so this is
    cheap. Both round-1 (DECIMAL rendering) and round-2 (HUGEINT) external
    red rows were exactly this class; driver_sim and the oracle test suite
    both call this so the class dies locally."""
    rel = ddb_con.sql(sql)
    duck = {c.lower(): _duck_kind(str(t)) for c, t in zip(rel.columns, rel.types)}
    spark = {f.name.lower(): _spark_kind(f.dataType) for f in spark_schema.fields}
    out = []
    for col in sorted(set(duck) | set(spark)):
        dk, sk = duck.get(col), spark.get(col)
        if dk in ("decimal", "hugeint"):
            out.append(f"{col}: oracle emits {dk.upper()} (renders as float64/object "
                       f"in the driver hasher — cast it; spark side is {sk})")
        elif sk == "decimal":
            out.append(f"{col}: spark emits DECIMAL (scaled-BIGINT convention)")
        elif dk is not None and sk is not None and dk != sk:
            out.append(f"{col}: spark {sk} vs oracle {dk}")
    return out


def compare_spark_duckdb(spark_df, ddb_con, sql: str, name: str = "query"):
    """Assert the Spark DataFrame and the DuckDB oracle SQL agree on
    column names and order-insensitive canonicalized values. Also enforces
    the no-DECIMAL output convention (decimal outputs hash-diverge on
    trailing-zero canonicalization in the external driver)."""
    from pyspark.sql.types import DecimalType

    dec_cols = [f.name for f in spark_df.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not dec_cols, (
        f"{name}: DECIMAL output columns {dec_cols} violate the scaled-BIGINT "
        "hash-surface convention (see plans/relational.py e_int)"
    )
    bad_types = dtype_mismatches(spark_df.schema, ddb_con, sql)
    assert not bad_types, f"{name}: oracle/Spark dtype mismatch: {bad_types}"
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = [c.lower() for c in spark_df.columns]
    res = ddb_con.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column names differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    cs = canon_result(s_cols, s_rows)
    cd = canon_result(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        raise AssertionError(f"{name}: values differ; first diffs: {diffs}")
