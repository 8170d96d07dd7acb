r"""TF-IDF vectorization, sparse long-form (SURVEY.md §2.2).

Reference semantics (all cited to /root/reference/):

- df(w) = number of documents whose DISTINCT token set contains w
  (MapperExtractFeatureDocument.java:23-31 O16-O17,
  ReducerExtractFeatureDocument.java:49-53 O18).
- idf(w) = ln((N+1)/(df(w)+1)) + 1 — sklearn's smooth_idf
  (ReducerExtractFeatureDocument.java:56 O19); vocabulary words in no
  document get df=0 => idf = ln(N+1)+1 (MapperExtractFeatureTFIDF.java:73-84
  O21).
- tf(w,d) = count(w in d) / |d|  (ReducerExtractFeatureTFIDF.java:63-67).
- weight = round(tf*idf / ||v||_2, 6) HALF_UP, NaN -> 0
  (ReducerExtractFeatureTFIDF.java:68-80 O25). The 1/|d| factor cancels
  under L2 normalization, so raw counts are used here.

Layout: the reference materializes DENSE vectors over the whole vocabulary
(map<word,double> with explicit zeros — MapperExtractFeatureTFIDF.java:94-105
O23), which is the memory cliff at scale. This engine keeps the long-form
sparse table ``(doc_id, word, weight)``; zeros are implicit and downstream
math (kmeans.py) uses the sparse-safe expansion ||x||^2+||c||^2-2x.c.

Every step is built-in DataFrame ops — the shuffles are exactly two hash
aggregations (tf by (doc,word), df by word) plus one broadcast join of the
idf table (small: |vocab| rows), mirroring the reference's distributed-cache
join (MapperExtractFeatureTFIDF.java:54-66 O20) without the per-mapper
memory copy.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize_col
from ..io import spread_scan


def tokens_long(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: Iterable[str] | None = None,
    vocab: Iterable[str] | None = None,
) -> DataFrame:
    """Explode documents into ``(id, word)`` rows (one per occurrence).

    ``spread_scan`` first so tokenization parallelizes off a local
    single-file scan; identity on cluster sessions (see io.spread_scan —
    an unconditional repartition would shuffle the corpus text at
    100 TB)."""
    return spread_scan(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_col(text_col, stopwords=stopwords, vocab=vocab)).alias("word"),
    )


def filter_vocab_join(tokens: DataFrame, vocab_df: DataFrame, word_col: str = "word") -> DataFrame:
    """Vocabulary filter as a broadcast LEFT SEMI join over the exploded
    token table — the at-scale form of the reference's in-memory HashSet
    dictionary filter (MapperExtractTransform.java:81 O8, loaded per task
    at :52-56). Use when the vocabulary is too large for a literal array
    in the plan (tokenize_col's path); semantics are identical: duplicate
    occurrences of kept words survive."""
    return tokens.join(
        F.broadcast(vocab_df.select(F.col(word_col).alias("word")).distinct()),
        "word",
        "left_semi",
    ).select(*tokens.columns)  # semi-join fronts the key; restore caller order


def document_frequency(tokens: DataFrame, n_docs: int) -> DataFrame:
    """``(word, df, idf)`` — smoothed IDF over distinct-doc counts.

    count(DISTINCT doc_id) per word == the reference's per-doc HashSet
    dedup followed by a sum (O16-O18); Catalyst plans it as two partial
    aggregations, both map-side combined.
    """
    return tokens.groupBy("word").agg(
        F.countDistinct("doc_id").alias("df"),
    ).withColumn(
        "idf", F.log((F.lit(n_docs) + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    )


def tfidf_long(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: Iterable[str] | None = None,
    vocab: Iterable[str] | None = None,
    n_docs: int | None = None,
    round_dp: int = 6,
    min_df: int | None = None,
    max_df: int | float | None = None,
    max_features: int | None = None,
) -> DataFrame:
    """L2-normalized TF-IDF, long-form sparse: ``(doc_id, word, weight)``.

    ``n_docs`` is the corpus size N (the reference publishes it via a WebHDFS
    side file, App.java:70-91 O14; here it is either passed by the caller or
    computed with one ``count()``).

    ``min_df`` / ``max_df`` / ``max_features`` implement the vocabulary
    pruning flags the reference's launcher passes but App.java never
    defines (run-job.sh:30 vs App.java:40-46 — SURVEY.md §8 Q7), with
    sklearn semantics: min_df is an absolute doc count, max_df may be a
    ratio (float) or count, max_features keeps the top-N words by corpus
    document frequency (ties: word ascending, so pruning is deterministic).
    """
    if n_docs is None:
        n_docs = df.count()
    toks = tokens_long(df, id_col, text_col, stopwords, vocab)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq_full = document_frequency(toks, n_docs)
    if min_df is not None:
        dfreq_full = dfreq_full.filter(F.col("df") >= int(min_df))
    if max_df is not None:
        cap = int(max_df * n_docs) if isinstance(max_df, float) else int(max_df)
        dfreq_full = dfreq_full.filter(F.col("df") <= cap)
    if max_features is not None:
        # Two-phase distributed rank (etl.assign_sequential_ids): range-
        # partition on (df desc, word), rank within partitions, add
        # offsets. A plain global row_number() window collapses the vocab
        # table to ONE partition — tolerable for a closed adjective list,
        # a real bottleneck at a 100M-word open vocabulary (r3 verdict).
        from .etl import assign_sequential_ids

        dfreq_full = (
            assign_sequential_ids(
                dfreq_full, [F.col("df").desc(), F.col("word")], id_col="_rk"
            )
            .filter(F.col("_rk") <= int(max_features))
            .drop("_rk")
        )
    idf = dfreq_full.select("word", "idf")
    # idf table is |vocab|-sized -> broadcast (the O20 cache-join, minus the
    # per-task on-heap copy of the whole table).
    v = tf.join(F.broadcast(idf), "word").withColumn("v", F.col("tf") * F.col("idf"))
    w_doc = Window.partitionBy("doc_id")
    norm = F.sqrt(F.sum(F.col("v") * F.col("v")).over(w_doc))
    weight = F.when(norm > 0, F.col("v") / norm).otherwise(F.lit(0.0))
    return v.select(
        "doc_id",
        "word",
        F.round(weight, round_dp).alias("weight"),
    )
