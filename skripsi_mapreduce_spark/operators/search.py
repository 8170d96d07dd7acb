"""Full-text relevance ranking: BM25 over the documents corpus.

The lexical-search twin of the embedding similarity family — a training
pipeline uses it for targeted corpus slicing ("all documents relevant to
query X"), retrieval-based decontamination, and hard-negative mining.

Shape: everything derives from the same two aggregates TF-IDF uses
(tf per (doc, word); df per word), plus two scalars (N, average doc
length) collected driver-side exactly like the reference's document
count (App.java:70-91 O14). Scoring touches only the query terms'
postings — a broadcast semi-join on word — so query cost scales with
the posting lists, not the corpus; top-k plans as
TakeOrderedAndProject.

Cross-engine exactness (the DuckDB oracle reproduces scores
bit-for-bit): per-term idf and the per-(doc, term) partial score are
rounded to 8dp and summed as DECIMAL — order-independent — and every
double input (dl/avgdl ratio, k1/b literals) is the identical IEEE
value in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import e_int
from ..functions.text import TOKEN_PATTERN


def _tf(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("word"),
    )
    return toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 for a bag of query terms (classic
    Robertson/Sparck-Jones idf in its non-negative Lucene form,
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``). Returns (doc_id, score_e6),
    ties broken by doc_id ascending.

    Documents matching no query term score 0 and are not returned."""
    terms = sorted({t.lower() for t in query_terms})
    tf = _tf(docs, id_col, text_col)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")).localCheckpoint(eager=False)
    # two scalar driver reductions, same convention as TF-IDF's N (O14)
    n_docs = docs.count()
    tot = dl.agg(F.sum("dl")).head()[0] or 0
    # `or 1.0`: an empty / all-empty-text corpus has tot == 0, and a zero
    # avgdl would turn the length norm into a division by zero (Inf/NaN
    # scores); with no terms anywhere the qtf join is empty regardless,
    # so the substitute value never reaches a real score
    avgdl = float(tot) / float(max(n_docs, 1)) or 1.0

    qtf = tf.filter(F.col("word").isin(terms))
    dfreq = qtf.groupBy("word").agg(F.count("*").alias("df"))
    idf = F.round(
        F.log(
            1.0
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        8,
    ).cast("decimal(18,8)")
    model = dfreq.select("word", idf.alias("idf"))

    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.lit(avgdl))
    )
    part = F.round(
        F.col("idf").cast("double") * (F.col("tf") * F.lit(k1 + 1.0)) / norm, 8
    ).cast("decimal(18,8)")
    scored = (
        qtf.join(F.broadcast(model), "word")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(part).alias("score"))
    )
    return (
        scored.select("doc_id", e_int(F.col("score").cast("double"), 6).alias("score_e6"))
        .orderBy(F.col("score_e6").desc(), "doc_id")
        .limit(k)
    )
