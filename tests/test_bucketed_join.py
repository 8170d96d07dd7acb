"""Bucketed-table co-location: `io.write_bucketed`'s 100 TB claim —
equi-joins and aggregations on the bucket key read co-located buckets
and skip the shuffle entirely — asserted on the physical plan, not just
stated. Two tables bucketed 8-ways on the same key must sort-merge-join
with ZERO Exchange operators; the same join over plain parquet must
shuffle (the control proving the assertion has teeth)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skripsi_mapreduce_spark.io import write_bucketed


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    left = spark.range(0, 2000).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 2000).select(
        F.col("id").alias("key"), (F.col("id") % 11).alias("b")
    )
    write_bucketed(left, "bj_left", ["key"], num_buckets=8, sort_cols=["key"])
    write_bucketed(right, "bj_right", ["key"], num_buckets=8, sort_cols=["key"])
    yield "bj_left", "bj_right"
    for t in ("bj_left", "bj_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-or-not decision to be about bucketing, not size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(lt).join(spark.table(rt), "key")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 2000

        # control: identical join over non-bucketed inputs must shuffle
        plain = spark.table(lt).select("key", "a").repartition(8)
        ctrl = plain.join(spark.table(rt), "key")
        assert "Exchange" in _executed_plan(ctrl)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("key").agg(F.sum("a").alias("s"))
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000
