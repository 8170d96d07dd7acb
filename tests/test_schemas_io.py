"""Schema module: S1-S5 parity types, dense<->long conversions, bucketed
writes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skripsi_mapreduce_spark import schemas
from skripsi_mapreduce_spark.io import write_bucketed


def test_dense_long_roundtrip(spark):
    rows = [
        ("1", {"good": 0.8, "bad": 0.6}),
        ("2", {"good": 1.0}),
    ]
    dense = spark.createDataFrame(rows, schemas.FINAL_FEATURE)
    long = schemas.dense_to_long(dense)
    got = {(r["doc_id"], r["word"]): r["weight"] for r in long.collect()}
    assert got == {(1, "good"): 0.8, (1, "bad"): 0.6, (2, "good"): 1.0}
    back = schemas.long_to_dense(long)
    out = {r["id"]: dict(r["feature"]) for r in back.collect()}
    assert out["1"] == {"good": 0.8, "bad": 0.6}
    assert out["2"] == {"good": 1.0}


def test_long_to_dense_with_vocab_zero_fill(spark):
    """The reference's density contract (O23): explicit zeros over the
    whole vocabulary."""
    long = spark.createDataFrame([(1, "good", 0.5)], schemas.FEATURES_LONG)
    dense = schemas.long_to_dense(long, vocab=["good", "bad", "ugly"])
    feat = dict(dense.head()["feature"])
    assert feat == {"good": 0.5, "bad": 0.0, "ugly": 0.0}


def test_dense_drops_explicit_zeros(spark):
    dense = spark.createDataFrame(
        [("1", {"good": 0.5, "bad": 0.0})], schemas.FINAL_FEATURE
    )
    long = schemas.dense_to_long(dense)
    assert [(r["word"]) for r in long.collect()] == ["good"]


def test_bucketed_write_and_shuffle_free_join(spark, tmp_path):
    df = spark.range(1000).withColumn("k", F.col("id") % 50).withColumn(
        "v", F.col("id") * 2
    )
    write_bucketed(df, "t_bucketed_a", ["k"], num_buckets=8)
    write_bucketed(df, "t_bucketed_b", ["k"], num_buckets=8)
    a = spark.table("t_bucketed_a")
    b = spark.table("t_bucketed_b")
    joined = a.join(b, "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: the join must not introduce a hash-partition
    # exchange on either side
    assert "hashpartitioning(k" not in plan.lower()
    assert joined.count() == 1000 * 20
    spark.sql("DROP TABLE t_bucketed_a")
    spark.sql("DROP TABLE t_bucketed_b")


def test_s5_schema_accepts_reference_shape(spark):
    rows = [(0, [1, 2], {"good": 1.23456789012}, 0.5)]
    df = spark.createDataFrame(rows, schemas.KMEANS_INTERMEDIATE)
    r = df.head()
    assert r["cluster"] == 0 and r["list_id"] == [1, 2]


def test_prefix_sum_matches_global_window(spark):
    """Two-phase range-partitioned prefix sum == a global running SUM,
    including order stability across the sampled partition boundaries."""
    import random

    from pyspark.sql import functions as F

    from skripsi_mapreduce_spark.operators.etl import prefix_sum

    rng = random.Random(11)
    rows = [(i, rng.randrange(0, 50)) for i in range(2000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r["k"]: r["cum"] for r in prefix_sum(df, ["k"], "v").collect()}
    acc, want = 0, {}
    for k, v in sorted(rows):
        acc += v
        want[k] = acc
    assert got == want


def test_write_sharded_manifest_and_bounds(spark, tmp_path):
    from skripsi_mapreduce_spark.io import write_sharded

    df = spark.range(0, 5000).selectExpr("id", "id % 7 AS g")
    out = str(tmp_path / "shards")
    m = write_sharded(df, out, rows_per_shard=1200, order_by=["id"])
    assert m["total_rows"] == 5000
    assert all(s["rows"] <= 1200 for s in m["shards"])
    assert m["n_shards"] >= 5  # 5000 / 1200 rounded up, per-partition
    back = spark.read.parquet(out)
    assert back.count() == 5000
    import json, os
    disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert disk["total_rows"] == 5000 and disk["shards"] == m["shards"]


def test_table_column_max_footer_stats(spark, tmp_path):
    """Round-10: table_column_max reads the exact column MAX from
    parquet row-group statistics (no Spark job) for both single-file
    and directory tables, matches the engine aggregate, and returns
    None (the loud Spark-fallback signal) for missing columns or
    non-parquet paths — it may be slow to say None, never wrong."""
    from pyspark.sql import functions as F

    from skripsi_mapreduce_spark.io import table_column_max

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    want = docs.agg(F.max("doc_id")).head()[0]
    assert table_column_max(sf, "documents", "doc_id") == want
    # directory-shaped table (multi-file) — max spans files
    docs.repartition(4).write.parquet(str(tmp_path / "docs.parquet"))
    assert table_column_max(str(tmp_path), "docs", "doc_id") == want
    # absent column / absent table -> None, not a wrong scalar
    assert table_column_max(sf, "documents", "no_such_col") is None
    assert table_column_max(str(tmp_path), "nope", "doc_id") is None
