"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes every
implemented operator from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB
equivalent for the hash-matched correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY.md §2.4 Q03) on sf0.001."""
    from skripsi_mapreduce_spark.plans import QUERIES

    return QUERIES["q03_tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    from skripsi_mapreduce_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each hash-matched query; keys absent
    here (none yet) get the weaker rows-only check."""
    from skripsi_mapreduce_spark.plans import ORACLE

    return dict(ORACLE)
