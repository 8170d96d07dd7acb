"""Engine schemas: the reference's five Avro record schemas (S1-S5,
SURVEY.md §1.2) as StructTypes, plus the catalog table schemas.

The reference duplicates each schema as JSON string literals across 3-4
Java files (e.g. ReviewBook at JobExtractTransform.java:28-41,
MapperExtractTransform.java:30-43, ReducerExtractTransform.java:18-31,
JobExtractFeature.java:47-60) — a drift hazard this single module removes.

S3's map<string,map<string,double>> intermediate and S5's dense
agg_feature map exist for Avro-shuffle plumbing only; the engine's native
layout is the sparse long-form (doc_id, word, weight) table
(operators/tfidf.py), so these StructTypes serve parity IO (Avro
import/export of reference datasets), not internal processing.
"""

from __future__ import annotations

from pyspark.sql import types as T

# S1 ReviewBook (JobExtractTransform.java:28-41)
REVIEW_BOOK = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("reviewerID", T.StringType()),
        T.StructField("asin", T.StringType()),
        T.StructField("reviewerName", T.StringType()),
        T.StructField("adjectiveWord", T.ArrayType(T.StringType())),
        T.StructField("reviewText", T.StringType()),
    ]
)

# S2 DocumentFrequency (JobExtractFeature.java:61-70)
DOCUMENT_FREQUENCY = T.StructType(
    [
        T.StructField("word", T.StringType(), False),
        T.StructField("idf", T.DoubleType(), False),
    ]
)

# S3 InputFeature (JobExtractFeature.java:71-87) — Avro-plumbing
# intermediate only
INPUT_FEATURE = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("length", T.IntegerType(), False),
        T.StructField(
            "feature",
            T.MapType(T.StringType(), T.MapType(T.StringType(), T.DoubleType())),
        ),
    ]
)

# S4 finalFeature (JobExtractFeature.java:88-101) — dense map form; the
# engine's native form is FEATURES_LONG below
FINAL_FEATURE = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("feature", T.MapType(T.StringType(), T.DoubleType())),
    ]
)

# S5 intermediate (JobClustering.java:60-83)
KMEANS_INTERMEDIATE = T.StructType(
    [
        T.StructField("cluster", T.IntegerType(), False),
        T.StructField("list_id", T.ArrayType(T.IntegerType())),
        T.StructField("agg_feature", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("sse", T.DoubleType()),
    ]
)

# Engine-native sparse layouts
FEATURES_LONG = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("word", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)

ASSIGNMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("cluster", T.IntegerType(), False),
        T.StructField("dist2", T.DoubleType(), False),
    ]
)


def dense_to_long(df, id_col: str = "id", map_col: str = "feature"):
    """S4 dense map -> engine-native long form (explode the map; zeros,
    which the reference materializes explicitly — O23 — are dropped:
    downstream math is sparse-safe)."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.col(map_col)).alias("word", "weight"),
    ).filter(F.col("weight") != 0.0)


def long_to_dense(df, vocab: list[str] | None = None):
    """Engine long form -> S4 dense map (for exporting datasets a
    reference deployment can read). With ``vocab`` the map is completed
    with explicit zeros to match the reference's density contract."""
    from pyspark.sql import functions as F

    dense = df.groupBy(F.col("doc_id")).agg(
        F.map_from_entries(F.collect_list(F.struct("word", "weight"))).alias("feature")
    )
    if vocab is not None:
        vocab_arr = F.lit(sorted(set(vocab)))
        fill = F.map_from_arrays(
            vocab_arr,
            F.transform(vocab_arr, lambda _: F.lit(0.0)),
        )
        dense = dense.withColumn("feature", F.map_concat(
            F.map_filter(fill, lambda k, _: ~F.map_contains_key(F.col("feature"), k)),
            F.col("feature"),
        ))
    return dense.select(F.col("doc_id").cast("string").alias("id"), "feature")
