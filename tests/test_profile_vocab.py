"""Profiler single-pass stats, broadcast vocab semi-join equivalence,
approximate-function accuracy bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skripsi_mapreduce_spark.operators.profile import profile
from skripsi_mapreduce_spark.operators.tfidf import filter_vocab_join, tokens_long

from .conftest import SF_DIR


def test_profile_basics(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, None, 3.0), (4, "a", 4.0)],
        "id long, s string, v double",
    )
    rows = {r["column"]: r for r in profile(df).collect()}
    assert rows["id"]["n_rows"] == 4 and rows["id"]["n_null"] == 0
    assert rows["s"]["n_null"] == 1 and rows["s"]["null_rate"] == pytest.approx(0.25)
    assert rows["v"]["min_num"] == 1.0 and rows["v"]["max_num"] == 4.0
    assert rows["v"]["mean"] == pytest.approx(8 / 3)
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "b"
    assert rows["id"]["approx_distinct"] >= 3  # HLL within rsd of 4


def test_profile_one_job(spark):
    """The whole profile is one aggregation: exactly one row out of agg."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    p = profile(df)
    assert p.count() == len(df.columns)
    n = df.count()
    assert all(r["n_rows"] == n for r in p.collect())


def test_profile_edge_cases(spark):
    """Dotted column names, booleans (orderable), byte columns (numeric),
    and empty inputs (n_null must be 0, not NULL)."""
    df = spark.createDataFrame([(1, True, 2)], "`a.b` long, flag boolean, tiny tinyint")
    rows = {r["column"]: r for r in profile(df).collect()}
    assert rows["a.b"]["n_null"] == 0
    assert rows["flag"]["min_str"] == "true" and rows["flag"]["max_str"] == "true"
    assert rows["tiny"]["min_num"] == 2.0 and rows["tiny"]["mean"] == 2.0
    empty = spark.createDataFrame([], "x long")
    r = profile(empty).head()
    assert r["n_null"] == 0 and r["null_rate"] == 0.0


def test_vocab_broadcast_join_equals_literal_filter(spark):
    docs = spark.createDataFrame(
        [(1, "good bad good ugly"), (2, "nice bad bad")], "doc_id long, text string"
    )
    vocab = ["good", "bad", "nice"]
    lit_path = tokens_long(docs, vocab=vocab)
    vocab_df = spark.createDataFrame([(w,) for w in vocab], "word string")
    join_path = filter_vocab_join(tokens_long(docs), vocab_df)
    a = sorted(tuple(r) for r in lit_path.collect())
    b = sorted(tuple(r) for r in join_path.collect())
    assert a == b  # duplicates preserved in both paths


def test_approx_functions_within_bounds(spark):
    """approx_count_distinct / percentile_approx stay within documented
    error of exact values (the scale escape hatches for q05/q32)."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey").alias("d")).head()["d"]
    approx = o.select(F.approx_count_distinct("o_custkey", 0.02).alias("d")).head()["d"]
    assert abs(approx - exact) <= max(0.05 * exact, 2)
    med_exact = o.select(F.percentile("o_totalprice", F.lit(0.5)).alias("m")).head()["m"]
    med_approx = o.select(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("m")
    ).head()["m"]
    assert med_approx == pytest.approx(med_exact, rel=0.05)
