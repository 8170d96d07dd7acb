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

Round 9 makes the lexical MODEL a maintained artifact instead of a
per-query recomputation: :func:`bm25_model` materializes the two model
tables (postings + per-doc lengths), :func:`bm25_update_model` absorbs
a document delta (new docs and replacements) with the CDC merge
pattern (anti-join the changed keys, union the recomputed rows — the
monoid discipline cdc.merge_aggregates documents), and
:func:`bm25_topk` / :func:`bm25_topk_many` score any query against the
model. Retrieval pipelines reindex continuously; a from-scratch df/avgdl
pass per index refresh is exactly the cost this kills.

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


def bm25_model(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The BM25 lexical model as two maintainable tables:
    ``(postings, doclen)`` — postings is (doc_id, word, tf), doclen is
    (doc_id, dl) with one row per CORPUS document (dl = 0 for
    token-less docs, so ``doclen.count()`` is the corpus N and no
    separate scalar state exists). Everything a query needs — df,
    avgdl, N — derives from these two tables at query time, touching
    only the query terms' posting lists.

    ``checkpoint=True`` pins BOTH tables lazily: the postings plan is
    checkpointed BEFORE doclen derives from it, so the corpus tokenizes
    exactly ONCE no matter how many actions later touch either table
    (checkpointing the two returned plans separately tokenizes twice:
    doclen's lineage re-runs the tf chain — round-10 finding), and
    doclen itself is checkpointed so its docs-scan + aggregate + join
    runs once, not once per consumer (the scalar job and the dl join
    both read it — round-10 review finding). Materializing doclen first
    materializes the tf checkpoint as a side effect (it is upstream),
    so no dedicated job is ever paid. Use it whenever the model is
    materialized for serving."""
    tf = _tf(docs, id_col, text_col)
    if checkpoint:
        tf = tf.localCheckpoint(eager=False)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    doclen = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(dl, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("dl"), F.lit(0).cast("bigint")).alias("dl"))
    )
    if checkpoint:
        doclen = doclen.localCheckpoint(eager=False)
    return tf, doclen


def bm25_update_model(
    postings: DataFrame,
    doclen: DataFrame,
    delta_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_col: str | None = None,
    assume_unique: bool = False,
    deleted_ids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Absorb a document DELTA into the lexical model without touching
    unchanged docs' rows: delta doc_ids' old postings/length rows are
    anti-joined away and the recomputed rows unioned in — the CDC
    upsert shape (cdc.apply_changes / merge_aggregates), covering NEW
    documents, REPLACEMENTS of existing ones, and DELETIONS
    (``deleted_ids``: a 1-column DataFrame of doc ids to drop — their
    rows are anti-joined out of BOTH tables with nothing unioned back,
    so N, avgdl and df all shrink exactly as a reindex over the
    post-delete corpus would; continuous-recrawl pipelines drop
    documents as often as they add them). A doc id in both the delta
    and ``deleted_ids`` is a replace-then-delete conflict and raises.
    The updated model is row-identical to :func:`bm25_model` over the
    post-delta corpus (pinned by test and adjudicated by
    ta_bm25_incremental, whose oracle is the from-scratch statement),
    so scores after an update can never drift from a reindex.

    The delta must resolve to ONE row per doc_id before the recompute —
    a multi-version batch would otherwise merge both versions' tokens
    into one doc's postings AND double its doclen row (inflating N and
    duplicating score rows, silently). Three contracts, CDC-style:
    ``seq_col`` names a version column and the highest version per
    doc_id wins (ties by the later text, deterministically — the
    apply_changes discipline); without it, duplicate delta ids raise
    (one counting job over the DELTA only); ``assume_unique=True``
    skips that guard job for hot paths whose upstream already dedupes.

    At 100 TB: the anti-join keys are the changed/deleted doc_ids
    (AQE converts the anti-join to broadcast at runtime for any sane
    batch size, and falls back to a shuffled anti-join for a
    million-doc recrawl wave rather than OOMing a forced broadcast —
    round-9 ADVICE), the recompute tokenizes ONLY the delta, and with
    both model tables stored partitioned/bucketed by their keys the
    merge rewrites only touched partitions."""
    if seq_col is not None:
        delta_docs = (
            delta_docs.groupBy(F.col(id_col))
            .agg(
                F.max(F.struct(F.col(seq_col), F.col(text_col))).alias("_v")
            )
            .select(F.col(id_col), F.col(f"_v.{text_col}").alias(text_col))
        )
    elif not assume_unique:
        dup = (
            delta_docs.groupBy(F.col(id_col))
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > 1)
            .head(1)
        )
        if dup:
            raise ValueError(
                f"delta carries {dup[0]['_n']} rows for {id_col}="
                f"{dup[0][id_col]}; pass seq_col to resolve multi-version "
                "batches latest-wins, or dedupe upstream (assume_unique=True "
                "skips this guard)"
            )
    changed = delta_docs.select(F.col(id_col).alias("doc_id")).distinct()
    removed = changed
    if deleted_ids is not None:
        dels = deleted_ids.select(
            F.col(deleted_ids.columns[0]).alias("doc_id")
        ).distinct()
        conflict = changed.join(dels, "doc_id", "semi").head(1)
        if conflict:
            raise ValueError(
                f"doc_id={conflict[0]['doc_id']} appears in both the delta "
                "and deleted_ids — resolve upsert-vs-delete upstream (a "
                "delete of a doc this batch also rewrites is ambiguous)"
            )
        removed = changed.unionByName(dels)
    d_tf, d_len = bm25_model(delta_docs, id_col, text_col)
    new_postings = postings.join(removed, "doc_id", "anti").unionByName(d_tf)
    new_doclen = doclen.join(removed, "doc_id", "anti").unionByName(d_len)
    return new_postings, new_doclen


def bm25_model_scalars(doclen: DataFrame) -> tuple[int, int]:
    """(n_docs, total_dl): the model's two driver scalars in one job —
    compute once per MODEL, not per query, when serving a static model
    (the streaming route hoists this out of the micro-batch loop)."""
    row = doclen.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("tot")
    ).head()
    return int(row["n"]), int(row["tot"])


def _score_from_model(
    postings: DataFrame,
    doclen: DataFrame,
    terms: list[str] | DataFrame,
    k1: float,
    b: float,
    scalars: tuple[int, int] | None = None,
) -> DataFrame:
    """(doc_id, word, p): the 8dp-decimal per-(doc, term) partial BM25
    scores for one term set — the shared scoring tail of
    :func:`bm25_topk` and :func:`bm25_topk_many`. df/idf/avgdl are
    query-INDEPENDENT given the term set, so the many-query kernel
    computes them once over the union of all queries' terms. ``terms``
    is a literal list (single-query path) or a 1-column DataFrame of
    distinct words (batched path — broadcast semi-join, nothing
    collected). ``scalars`` = precomputed :func:`bm25_model_scalars`
    (n_docs, total_dl) — serving loops over a STATIC model pass it so
    the per-call scalar job disappears (the streaming route computes it
    once per stream, not once per micro-batch)."""
    # two scalar driver reductions, same convention as TF-IDF's N (O14)
    n_docs, tot = scalars if scalars is not None else bm25_model_scalars(doclen)
    # `or 1.0`: an empty / all-empty-text corpus has tot == 0, and a zero
    # avgdl would turn the length norm into a division by zero (Inf/NaN
    # scores); with no terms anywhere the qtf join is empty regardless,
    # so the substitute value never reaches a real score
    avgdl = float(tot) / float(max(n_docs, 1)) or 1.0

    if isinstance(terms, DataFrame):
        qtf = postings.join(F.broadcast(terms.select("word").distinct()), "word", "semi")
    else:
        qtf = postings.filter(F.col("word").isin(terms))
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
    return (
        qtf.join(F.broadcast(model), "word")
        .join(doclen, "doc_id")
        .select("doc_id", "word", part.alias("p"))
    )


def bm25_topk_from_model(
    postings: DataFrame,
    doclen: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    scalars: tuple[int, int] | None = None,
) -> DataFrame:
    """Top-``k`` documents by BM25 against a materialized
    (:func:`bm25_model` / :func:`bm25_update_model`) lexical model.
    Returns (doc_id, score_e6), ties broken by doc_id ascending;
    documents matching no query term score 0 and are not returned.
    Pass ``scalars`` (:func:`bm25_model_scalars`) when querying a
    static model repeatedly."""
    terms = sorted({t.lower() for t in query_terms})
    parts = _score_from_model(postings, doclen, terms, k1, b, scalars)
    scored = parts.groupBy("doc_id").agg(F.sum("p").alias("score"))
    return (
        scored.select("doc_id", e_int(F.col("score").cast("double"), 6).alias("score_e6"))
        .orderBy(F.col("score_e6").desc(), "doc_id")
        .limit(k)
    )


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

    Documents matching no query term score 0 and are not returned.
    Builds the model inline; serving deployments materialize it once
    with :func:`bm25_model` and score via
    :func:`bm25_topk_from_model`."""
    # checkpoint=True pins the tf plan BEFORE doclen derives from it:
    # the scalar pass, the qtf filter, and the dl join then all reuse
    # one tokenize+aggregate run instead of re-running the chain per
    # consumer (round-9 review finding, tightened round 10 — the old
    # checkpoint-both-outputs form still tokenized twice because
    # doclen's lineage predated the postings checkpoint)
    postings, doclen = bm25_model(docs, id_col, text_col, checkpoint=True)
    return bm25_topk_from_model(postings, doclen, query_terms, k, k1, b)


def bm25_topk_many(
    postings: DataFrame,
    doclen: DataFrame,
    queries: DataFrame,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    q_id_col: str = "query_id",
    q_terms_col: str = "terms",
    scalars: tuple[int, int] | None = None,
) -> DataFrame:
    """Batched BM25: N queries (``(query_id, terms array<string>)``)
    answered in ONE pass over the union of their posting lists —
    returns (query_id, doc_id, score_e6), top-k per query, scores
    BIT-IDENTICAL to :func:`bm25_topk_from_model` run per query
    (pinned by test; df/idf/avgdl are query-independent, so sharing
    them across queries changes nothing but the pass count). The
    query→term table is small (bounded query batch) and broadcasts;
    per-query ranking is a window top-k over candidate rows only.

    This is the per-micro-batch kernel of streaming search serving
    (streaming/serving.serve_bm25_topk_foreachbatch)."""
    from pyspark.sql import Window

    qterms = queries.select(
        F.col(q_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(F.transform(F.col(q_terms_col), F.lower))
        ).alias("word"),
    )
    parts = _score_from_model(postings, doclen, qterms, k1, b, scalars)
    scored = (
        parts.join(F.broadcast(qterms), "word")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("p").alias("score"))
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("score_e6").desc(), F.col("doc_id")
        )
    )
    return (
        scored.select(
            "query_id",
            "doc_id",
            e_int(F.col("score").cast("double"), 6).alias("score_e6"),
        )
        .withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
