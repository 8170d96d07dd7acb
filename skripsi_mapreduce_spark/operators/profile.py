"""One-pass dataset profiling: per-column null rate, distinct estimate,
min/max, and numeric moments — the input-validation step of a training
pipeline (run it before burning cluster-hours on bad data).

All columns profile in a SINGLE aggregation job (one scan, one reduce of
a handful of rows): at 100 TB the scan is the cost and it is paid once.
Distinct counts use HLL (approx_count_distinct) — exact distinct per
column would need one shuffle per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.IntegerType,
    T.LongType,
    T.DoubleType,
    T.FloatType,
    T.ShortType,
    T.ByteType,
    T.DecimalType,
)
_ORDERABLE_STR = (T.StringType, T.TimestampType, T.DateType, T.BooleanType)


def profile(df: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Returns one row per column: (column, dtype, n_rows, n_null,
    null_rate, approx_distinct, min, max, mean, stddev) — min/max/mean/
    stddev NULL for non-numeric, min/max as strings for orderable
    non-numerics (strings, timestamps, dates, booleans)."""
    # backtick-quote names so dotted columns don't parse as nested paths
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, f in enumerate(df.schema.fields):
        c = F.col("`" + f.name.replace("`", "``") + "`")
        aggs.append(
            F.coalesce(F.sum(F.when(c.isNull(), 1).otherwise(0)), F.lit(0)).alias(f"_null_{i}")
        )
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"_dist_{i}"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"_min_{i}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{i}"))
            aggs.append(F.avg(c.cast("double")).alias(f"_mean_{i}"))
            aggs.append(F.stddev(c.cast("double")).alias(f"_std_{i}"))
        elif isinstance(f.dataType, _ORDERABLE_STR):
            aggs.append(F.min(c).cast("string").alias(f"_smin_{i}"))
            aggs.append(F.max(c).cast("string").alias(f"_smax_{i}"))
    row = df.agg(*aggs).head().asDict()

    out = []
    n = row["_n"]
    for i, f in enumerate(df.schema.fields):
        is_num = isinstance(f.dataType, _NUMERIC)
        out.append(
            {
                "column": f.name,
                "dtype": f.dataType.simpleString(),
                "n_rows": n,
                "n_null": row[f"_null_{i}"],
                "null_rate": (row[f"_null_{i}"] / n) if n else 0.0,
                "approx_distinct": row[f"_dist_{i}"],
                "min_num": row.get(f"_min_{i}"),
                "max_num": row.get(f"_max_{i}"),
                "mean": row.get(f"_mean_{i}"),
                "stddev": row.get(f"_std_{i}"),
                "min_str": row.get(f"_smin_{i}"),
                "max_str": row.get(f"_smax_{i}"),
            }
        )
    schema = (
        "column string, dtype string, n_rows long, n_null long, null_rate double, "
        "approx_distinct long, min_num double, max_num double, mean double, "
        "stddev double, min_str string, max_str string"
    )
    return df.sparkSession.createDataFrame(out, schema)


def profile_exact(df: DataFrame) -> DataFrame:
    """The oracle-matchable subset of :func:`profile`, long-form:
    (column, n_rows, n_null, min_repr, max_repr) — one row per input
    column, computed in the SAME single-scan aggregation shape.

    Exactness rules per dtype: integer/date/string/boolean min/max render
    as strings with one canonical form in every engine; float/double
    min/max are deliberately NULL here (their string rendering is
    engine-dependent; the full :func:`profile` surfaces them as doubles
    for human use). approx_count_distinct (HLL) is likewise excluded —
    its binary state is engine-private (the deterministic alternative is
    operators/sketches.kmv_distinct)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, f in enumerate(df.schema.fields):
        c = F.col("`" + f.name.replace("`", "``") + "`")
        aggs.append(
            F.coalesce(F.sum(F.when(c.isNull(), 1).otherwise(0)), F.lit(0)).alias(f"_null_{i}")
        )
        if isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            continue
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.min(c).cast("long").cast("string").alias(f"_min_{i}"))
            aggs.append(F.max(c).cast("long").cast("string").alias(f"_max_{i}"))
        elif isinstance(f.dataType, (T.StringType, T.DateType)):
            aggs.append(F.min(c).cast("string").alias(f"_min_{i}"))
            aggs.append(F.max(c).cast("string").alias(f"_max_{i}"))
    row = df.agg(*aggs).head().asDict()
    out = [
        {
            "column": f.name,
            "n_rows": row["_n"],
            "n_null": row[f"_null_{i}"],
            "min_repr": row.get(f"_min_{i}"),
            "max_repr": row.get(f"_max_{i}"),
        }
        for i, f in enumerate(df.schema.fields)
    ]
    return df.sparkSession.createDataFrame(
        out, "column string, n_rows long, n_null long, min_repr string, max_repr string"
    )
