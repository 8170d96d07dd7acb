"""Skew-salting helpers, the stateful streaming operator, and the
ml.KMeans fast path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skripsi_mapreduce_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
    with_salt,
)

from .conftest import SF_DIR


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", i * 1.0) for i in range(1000)] + [("cold", 5.0), ("cold", 7.0)],
        "k string, v double",
    )
    got = {
        r["k"]: (r["total"], r["n"])
        for r in salted_aggregate(
            df,
            ["k"],
            [F.sum("v").alias("s"), F.count("*").alias("c")],
            lambda: [F.sum("s").alias("total"), F.sum("c").alias("n")],
        ).collect()
    }
    expect = {
        r["k"]: (r["total"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert got == expect


def test_salt_is_deterministic(spark):
    df = spark.createDataFrame([(i, f"x{i}") for i in range(100)], "a long, b string")
    s1 = {tuple(r) for r in with_salt(df).collect()}
    s2 = {tuple(r) for r in with_salt(df).collect()}
    assert s1 == s2
    assert all(0 <= r[-1] < 16 for r in s1)


def test_salted_broadcast_left_complete(spark):
    big = spark.createDataFrame([("k1", i) for i in range(500)], "k string, v int")
    small = spark.createDataFrame([("k1", "dim1")], "k string, d string")
    out = salted_broadcast_left(big, small, on=["k"], buckets=8)
    assert out.count() == 500  # every big row found its dim despite the salt
    assert out.select("d").distinct().head()["d"] == "dim1"


def test_stateful_running_mean(spark):
    """Drive applyInPandasWithState over a file-replay stream and check
    the final per-user running state equals the batch computation."""
    from skripsi_mapreduce_spark.streaming.stateful import running_mean_anomalies
    from skripsi_mapreduce_spark.streaming.windows import stream_events

    ev = stream_events(spark, SF_DIR)
    out = running_mean_anomalies(ev)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_state")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT user_id, MAX_BY(running_count, running_count) rc,"
        " MAX_BY(running_mean, running_count) rm FROM t_state GROUP BY user_id"
    ).collect()
    from skripsi_mapreduce_spark.io import load_table

    batch = {
        r["user_id"]: (r["n"], r["m"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.avg("value").alias("m"))
        .collect()
    }
    assert rows, "no stateful output"
    for r in rows:
        n, m = batch[r["user_id"]]
        assert r["rc"] == n
        assert r["rm"] == pytest.approx(m, rel=1e-9)


def test_kmeans_ml_fast_path(spark):
    from skripsi_mapreduce_spark.operators.kmeans import kmeans_ml
    from skripsi_mapreduce_spark.operators.tfidf import tfidf_long

    rows = [
        (1, "cat dog cat pet"),
        (2, "dog cat pet paw"),
        (3, "python java code"),
        (4, "code java python bug"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = tfidf_long(df)
    assigned, model = kmeans_ml(spark, feats, k=2, max_iter=10, seed=42)
    got = {r["doc_id"]: r["cluster"] for r in assigned.collect()}
    assert len(got) == 4
    # the two topic groups must separate
    assert got[1] == got[2] and got[3] == got[4] and got[1] != got[3]
    assert len(model.clusterCenters()) == 2
