"""Streaming twin of the incremental SemDeDup verdict: embedding
batches arrive as an unbounded stream and are routed through the
CORPUS-trained hierarchical model — the clustering never re-runs, the
stream only pays one fused quantization kernel plus a stream-static
join per micro-batch.

Replay property (what the adjudication pins): a batch doc's verdict
depends only on the static corpus and its OWN vector, so the output is
identical however the file source slices the input into micro-batches —
the same statement the other stream_* entries make for windows, joins,
and dedup, extended to the model-serving shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table as an unbounded stream (file-source replay
    of the parquet — the embedding twin of windows.stream_events)."""
    import os

    schema = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir)
    )


def semantic_verdicts_stream(
    batch_stream: DataFrame,
    corpus_assign: DataFrame,
    model: dict,
    allemb: DataFrame,
    eps_e6: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-doc SemDeDup verdicts over a STREAM of batch docs against a
    static corpus: quantize each arriving doc through the frozen
    ``model`` (one mapInPandas kernel — works unchanged on streams),
    stream-static join to the corpus members of its cluster, score the
    exact fixed-point cosines, and aggregate one verdict row per doc.

    The zero-pair case rides a SENTINEL row (cosine_e6 = -2000000,
    below any real score and any eps) unioned per doc instead of an
    outer join — stream-stream joins need watermarks, but a union into
    ONE complete-mode aggregation does not, and max/sum over the
    sentinel reproduce the batch operator's COALESCE semantics exactly
    (pinned by the shared oracle)."""
    from ..functions.numeric import e_int
    from ..operators.kmeans import assign_with_model
    from ..operators.similarity import pair_cosine_join

    dense_b = batch_stream.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(vec_col).alias("vec")
    )
    ba = assign_with_model(dense_b, model).select("doc_id", "cluster")
    # No broadcast hint on corpus_assign: it is an n-row table (one row
    # per corpus doc), which is NOT a broadcastable side at corpus
    # scale. The stream-static equi-join on cluster works shuffled, and
    # Catalyst may still SIZE-pick a broadcast when the corpus is
    # genuinely small — the decision belongs to the planner, not a
    # hint (a test pins that no unconditional broadcast survives).
    pairs = (
        ba.select(F.col("doc_id").alias("id_b"), "cluster")
        .join(
            corpus_assign.select(F.col("doc_id").alias("id_a"), F.col("cluster")),
            "cluster",
        )
        .select("cluster", "id_a", "id_b")
    )
    scored = pair_cosine_join(pairs, allemb, id_col=id_col, vec_col=vec_col).select(
        "id_b", "cluster", e_int(F.col("cosine"), 6).alias("cosine_e6")
    )
    sentinel = ba.select(
        F.col("doc_id").alias("id_b"),
        "cluster",
        F.lit(-2_000_000).cast("long").alias("cosine_e6"),
    )
    u = scored.unionByName(sentinel)
    agg = u.groupBy("id_b").agg(
        F.max("cluster").alias("cluster"),  # constant per doc
        F.sum(F.when(F.col("cosine_e6") >= eps_e6, 1).otherwise(0))
        .cast("long")
        .alias("n_dups"),
        F.max("cosine_e6").alias("max_cosine_e6"),
    )
    return agg.select(
        F.col("id_b").alias("doc_id"),
        "cluster",
        "n_dups",
        F.col("max_cosine_e6").cast("long").alias("max_cosine_e6"),
        F.when(F.col("n_dups") == 0, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("is_new"),
    )
