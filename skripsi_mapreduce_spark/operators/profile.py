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

_NUMERIC = (T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.ShortType, T.DecimalType)


def profile(df: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Returns one row per column: (column, dtype, n_rows, n_null,
    null_rate, approx_distinct, min, max, mean, stddev) — min/max/mean/
    stddev NULL for non-numeric, min/max as strings for orderable
    non-numerics."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"))
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"_dist_{c}"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{c}"))
            aggs.append(F.avg(F.col(c).cast("double")).alias(f"_mean_{c}"))
            aggs.append(F.stddev(F.col(c).cast("double")).alias(f"_std_{c}"))
        elif isinstance(f.dataType, (T.StringType, T.TimestampType, T.DateType)):
            aggs.append(F.min(c).cast("string").alias(f"_smin_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"_smax_{c}"))
    row = df.agg(*aggs).head()

    out = []
    for f in df.schema.fields:
        c = f.name
        is_num = isinstance(f.dataType, _NUMERIC)
        n = row["_n"]
        out.append(
            {
                "column": c,
                "dtype": f.dataType.simpleString(),
                "n_rows": n,
                "n_null": row[f"_null_{c}"],
                "null_rate": (row[f"_null_{c}"] / n) if n else 0.0,
                "approx_distinct": row[f"_dist_{c}"],
                "min_num": row[f"_min_{c}"] if is_num else None,
                "max_num": row[f"_max_{c}"] if is_num else None,
                "mean": row[f"_mean_{c}"] if is_num else None,
                "stddev": row[f"_std_{c}"] if is_num else None,
                "min_str": row.asDict().get(f"_smin_{c}"),
                "max_str": row.asDict().get(f"_smax_{c}"),
            }
        )
    schema = (
        "column string, dtype string, n_rows long, n_null long, null_rate double, "
        "approx_distinct long, min_num double, max_num double, mean double, "
        "stddev double, min_str string, max_str string"
    )
    return df.sparkSession.createDataFrame(out, schema)
