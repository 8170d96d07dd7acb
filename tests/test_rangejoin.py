"""Range join vs the naive non-equi join; time rollup vs per-granularity
groupBys — the bucketized/grouping-sets forms must be result-identical."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from skripsi_mapreduce_spark.operators.rangejoin import range_join, time_rollup


def _events(spark, n, seed, name):
    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, rng.randint(1, 5), base + dt.timedelta(seconds=rng.randint(0, 7200)))
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(rows, f"{name}_id long, user_id long, ts timestamp")


def _naive(spark, left, right, lo, hi, key=None):
    cond = (
        (F.unix_micros(right["ts"]) >= F.unix_micros(left["ts"]) + int(lo * 1e6))
        & (F.unix_micros(right["ts"]) <= F.unix_micros(left["ts"]) + int(hi * 1e6))
    )
    if key:
        cond = cond & (left[key] == right[key])
    return left.join(right, cond)


def test_range_join_matches_naive_with_key(spark):
    left = _events(spark, 120, 1, "l")
    right = _events(spark, 150, 2, "r")
    got = sorted(
        (r["l_id"], r["r_id_r"])
        for r in range_join(left, right, -300, 300, key="user_id").collect()
    )
    want = sorted(
        (r["l_id"], r["r_id"])
        for r in _naive(spark, left, right, -300, 300, "user_id").collect()
    )
    assert got == want and len(got) > 0


def test_range_join_matches_naive_keyless_and_asymmetric(spark):
    left = _events(spark, 60, 3, "l")
    right = _events(spark, 60, 4, "r")
    got = sorted(
        (r["l_id"], r["r_id_r"]) for r in range_join(left, right, 0, 900).collect()
    )
    want = sorted(
        (r["l_id"], r["r_id"]) for r in _naive(spark, left, right, 0, 900).collect()
    )
    assert got == want and len(got) > 0


def test_range_join_point_offset(spark):
    left = _events(spark, 200, 5, "l")
    # right = the same instants shifted by +60s: lo=hi=60 matches exactly
    right = left.select(
        (F.col("l_id") + 1000).alias("r_id"),
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 60 SECONDS")).alias("ts"),
    )
    got = sorted(
        (r["l_id"], r["r_id_r"]) for r in range_join(left, right, 60, 60, key="user_id").collect()
    )
    assert len(got) >= 200  # every row matches its own shifted twin (+ time collisions)
    assert all(b == a + 1000 or True for a, b in got)
    assert {(a, a + 1000) for a, _ in got} <= set(got)


def test_time_rollup_matches_per_granularity_groupbys(spark):
    ev = _events(spark, 500, 7, "e")
    rolled = time_rollup(
        ev,
        ["hour", "day"],
        [F.count("*").cast("bigint").alias("n")],
        group_cols=["user_id"],
    )
    got = sorted(map(tuple, rolled.collect()))
    want = []
    for g in ("hour", "day"):
        rows = (
            ev.groupBy(F.date_trunc(g, "ts").alias("b"), "user_id")
            .agg(F.count("*").cast("bigint").alias("n"))
            .collect()
        )
        want += [
            (g, int(r["b"].replace(tzinfo=dt.timezone.utc).timestamp()), r["user_id"], r["n"])
            for r in rows
        ]
    assert got == sorted(want)


def test_range_join_plans_as_equi_join(spark):
    """The bucketized form must plan as a hash/sort-merge join on the
    bucket key — never the BroadcastNestedLoopJoin a raw non-equi range
    predicate produces."""
    left = _events(spark, 50, 8, "l")
    right = _events(spark, 50, 9, "r")
    df = range_join(left, right, -300, 300, key="user_id")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
