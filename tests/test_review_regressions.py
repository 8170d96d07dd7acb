"""Regressions for review findings: short-doc shingles, sparse-id
K-Means init, string-id exact dedup, ngram threshold guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from skripsi_mapreduce_spark.operators import dedup as dd
from skripsi_mapreduce_spark.operators.kmeans import kmeans
from skripsi_mapreduce_spark.operators.tfidf import tfidf_long


def test_shingles_short_docs_no_crash(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "one two three")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["shingle"] for r in dd.shingles(df, size=2).collect()}
    # only the 3-token doc yields bigrams; 1-token and empty docs yield none
    assert set(out) == {3}
    pairs = dd.ngram_near_dups(df, threshold=0.3, shingle_size=2).collect()
    assert pairs == []  # and the full pipeline survives short docs


def test_kmeans_sparse_ids(spark):
    rows = [(100, "cat dog pet"), (205, "dog cat paw"), (999, "java code bug"),
            (1307, "code java stack")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = tfidf_long(df)
    res = kmeans(spark, feats, k=2, max_iter=5, seed=42)
    got = {r["doc_id"]: r["cluster"] for r in res.assignments.collect()}
    # every document assigned, centroids non-empty (ids 100..1307 are far
    # from dense 1..N — init must still land on real documents)
    assert set(got) == {100, 205, 999, 1307}
    assert len(res.centroids) == 2


def test_exact_dedup_string_ids_numeric_min(spark):
    df = spark.createDataFrame(
        [("9", "same text"), ("10", "same text"), ("2", "other")],
        "doc_id string, text string",
    )
    got = dd.exact_duplicate_groups(df).collect()
    assert len(got) == 1
    assert got[0]["keep_id"] == 9  # numeric min, not lexicographic '10'


def test_ngram_threshold_above_one_returns_nothing(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")], "doc_id long, text string"
    )
    assert dd.ngram_near_dups(df, threshold=1.5, shingle_size=1).collect() == []
    assert (
        dd.ngram_near_dups(df, threshold=1.0, shingle_size=1)
        .filter(F.col("jaccard") >= 1.0)
        .count()
        == 1
    )
