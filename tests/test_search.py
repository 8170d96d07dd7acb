"""BM25 ranking (operators/search.py): parity with an independent Python
implementation and the standard behavioral properties."""

from __future__ import annotations

import math

from skripsi_mapreduce_spark.operators.search import bm25_topk


def _python_bm25(corpus: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in corpus.items()}
    n = len(corpus)
    dl = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dl.values()) / n
    scores = {}
    for t in sorted(set(terms)):
        df = sum(1 for w in toks.values() if t in w)
        if df == 0:
            continue
        idf = round(math.log(1.0 + (n - df + 0.5) / (df + 0.5)), 8)
        for d, words in toks.items():
            tf = words.count(t)
            if tf == 0:
                continue
            part = round(
                idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl[d] / avgdl))), 8
            )
            scores[d] = round(scores.get(d, 0.0) + part, 10)
    return scores


def test_bm25_matches_python_reference(spark):
    corpus = {
        1: "spark hash join join join",
        2: "spark spark spark table scan",
        3: "hash hash hash hash hash hash hash hash",
        4: "table scan filter sort window",
        5: "join spark",
    }
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {r["doc_id"]: r["score_e6"] for r in
           bm25_topk(df, ["spark", "join"], k=10).collect()}
    want = _python_bm25(corpus, ["spark", "join"])
    assert set(got) == set(want)
    for d, s in want.items():
        assert abs(got[d] - round(s * 1e6)) <= 1, (d, got[d], s)


def test_bm25_rare_term_outranks_common(spark):
    rows = [(i, "common filler words here") for i in range(1, 20)]
    rows += [(100, "common rare"), (101, "common words")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [r["doc_id"] for r in bm25_topk(df, ["rare", "common"], k=3).collect()]
    assert got[0] == 100  # the only doc with the rare term wins


def test_bm25_length_normalization(spark):
    # same tf for the query term; the shorter document must score higher
    rows = [(1, "spark " + "pad " * 50), (2, "spark pad")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [r["doc_id"] for r in bm25_topk(df, ["spark"], k=2).collect()]
    assert got == [2, 1]


def test_bm25_no_match_returns_empty(spark):
    df = spark.createDataFrame([(1, "alpha beta")], ["doc_id", "text"])
    assert bm25_topk(df, ["missingterm"], k=5).count() == 0


def test_bm25_empty_and_all_empty_corpus(spark):
    """avgdl guard: an all-empty-text corpus must yield an empty result,
    not NaN/Inf scores from a zero average document length."""
    df = spark.createDataFrame([(1, ""), (2, "")], ["doc_id", "text"])
    assert bm25_topk(df, ["anything"], k=5).count() == 0
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(empty, ["anything"], k=5).count() == 0


def test_bm25_update_model_equals_reindex(spark):
    """Round-9 incremental model maintenance: absorbing a delta of new
    docs AND replacements via bm25_update_model must leave the model
    tables ROW-IDENTICAL to bm25_model over the post-delta corpus (the
    ta_bm25_incremental claim, pinned code-level), and scores through
    either model must match."""
    from pyspark.sql import functions as F

    from skripsi_mapreduce_spark.operators.search import (
        bm25_model,
        bm25_topk_from_model,
        bm25_update_model,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    did = F.col("doc_id")
    stale = docs.filter(did % 5 != 0).withColumn(
        "text",
        F.when(did % 20 == 3, F.lit("stale placeholder text")).otherwise(
            F.col("text")
        ),
    )
    delta = docs.filter((did % 5 == 0) | (did % 20 == 3))
    p0, l0 = bm25_model(stale)
    p1, l1 = bm25_update_model(p0, l0, delta)
    pw, lw = bm25_model(docs)
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, pw.collect()))
    assert sorted(map(tuple, l1.collect())) == sorted(map(tuple, lw.collect()))
    terms = ["hash", "join", "spark", "stream"]
    got = [tuple(r) for r in bm25_topk_from_model(p1, l1, terms, k=10).collect()]
    want = [tuple(r) for r in bm25_topk_from_model(pw, lw, terms, k=10).collect()]
    assert got == want and len(got) == 10


def test_bm25_topk_many_matches_per_query(spark):
    """The batched kernel must be bit-identical to per-query scoring:
    df/idf/avgdl are query-independent, so one pass over the union of
    posting lists changes nothing but the pass count. Also pins
    term-dedup and case-folding inside the terms array."""
    from skripsi_mapreduce_spark.operators.search import (
        bm25_model,
        bm25_topk_from_model,
        bm25_topk_many,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    postings, doclen = bm25_model(docs)
    queries = [
        (0, ["hash", "join", "spark", "stream"]),
        (1, ["filter", "group", "sort", "window"]),
        (2, ["Table", "table", "QUERY", "scan", "merge"]),  # dup + case
    ]
    qdf = spark.createDataFrame(queries, "query_id long, terms array<string>")
    got = sorted(
        map(tuple, bm25_topk_many(postings, doclen, qdf, k=7).collect())
    )
    want = sorted(
        (qid, r["doc_id"], r["score_e6"])
        for qid, terms in queries
        for r in bm25_topk_from_model(postings, doclen, terms, k=7).collect()
    )
    assert got == want and len(got) == 21


def test_stream_bm25_serving_matches_batch_and_slicing_invariant(spark, tmp_path):
    """Round-9 streaming lexical serving: the foreachBatch BM25 route
    must be bit-identical to the batch bm25_topk_many kernel for both a
    one-file replay and a per-query slicing (stateless per query), and
    the parquet-append sink must equal the driver accumulation."""
    from skripsi_mapreduce_spark.operators.search import bm25_model, bm25_topk_many
    from skripsi_mapreduce_spark.streaming.serving import (
        serve_bm25_topk_foreachbatch,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    postings, doclen = bm25_model(docs)
    postings = postings.localCheckpoint(eager=True)
    doclen = doclen.localCheckpoint(eager=True)
    queries = [
        (0, ["hash", "join"]),
        (1, ["filter", "window"]),
        (2, ["table", "scan"]),
    ]
    qdf = spark.createDataFrame(queries, "query_id long, terms array<string>")
    want = sorted(
        map(tuple, bm25_topk_many(postings, doclen, qdf, k=5).collect())
    )
    one = str(tmp_path / "one")
    qdf.coalesce(1).write.parquet(one)
    many = str(tmp_path / "many")
    qdf.repartition(3, "query_id").write.parquet(many)

    def replay(src, **kw):
        qstream = (
            spark.readStream.schema(qdf.schema)
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .load(src)
        )
        return serve_bm25_topk_foreachbatch(qstream, postings, doclen, k=5, **kw)

    assert sorted(map(tuple, replay(one, memory_sink=True).collect())) == want
    assert sorted(map(tuple, replay(many, memory_sink=True).collect())) == want
    sink = str(tmp_path / "sink")
    assert sorted(map(tuple, replay(one, sink_path=sink).collect())) == want
    # round-10 sink contract: a reused logical sink path returns only
    # its own run's rows (auto run-namespacing under the path)
    assert sorted(map(tuple, replay(many, sink_path=sink).collect())) == want
    # empty stream: foreachBatch never fires, schema'd empty table back
    empty = str(tmp_path / "empty")
    import os

    os.makedirs(empty)
    qdf.limit(0).coalesce(1).write.mode("overwrite").parquet(empty)
    assert replay(empty, memory_sink=True).count() == 0


def test_bm25_update_model_multi_version_delta(spark):
    """Round-9 review finding: a multi-version delta batch must never
    silently corrupt the model. Without seq_col duplicate delta ids
    raise; with seq_col the highest version wins and the model equals
    a reindex over the resolved corpus; assume_unique skips the guard."""
    import pytest

    from skripsi_mapreduce_spark.operators.search import (
        bm25_model,
        bm25_update_model,
    )

    base = spark.createDataFrame(
        [(1, "hash join"), (2, "sort scan")], "doc_id long, text string"
    )
    p0, l0 = bm25_model(base)
    dup_delta = spark.createDataFrame(
        [(2, "old version", 1), (2, "sort scan merge", 2), (3, "spark stream", 1)],
        "doc_id long, text string, seq long",
    )
    with pytest.raises(ValueError, match="rows for doc_id=2"):
        bm25_update_model(p0, l0, dup_delta)
    p1, l1 = bm25_update_model(p0, l0, dup_delta, seq_col="seq")
    resolved = spark.createDataFrame(
        [(1, "hash join"), (2, "sort scan merge"), (3, "spark stream")],
        "doc_id long, text string",
    )
    pw, lw = bm25_model(resolved)
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, pw.collect()))
    assert sorted(map(tuple, l1.collect())) == sorted(map(tuple, lw.collect()))
    # assume_unique skips the guard (caller's contract)
    clean = dup_delta.filter("seq = 2 OR doc_id = 3").drop("seq")
    p2, l2 = bm25_update_model(p0, l0, clean, assume_unique=True)
    assert sorted(map(tuple, p2.collect())) == sorted(map(tuple, pw.collect()))


def test_bm25_update_model_empty_delta_is_identity(spark):
    """An empty delta must leave the model row-identical (the no-op
    micro-batch edge of continuous reindexing)."""
    from skripsi_mapreduce_spark.operators.search import (
        bm25_model,
        bm25_update_model,
    )

    docs = spark.createDataFrame(
        [(1, "hash join"), (2, "")], "doc_id long, text string"
    )
    p0, l0 = bm25_model(docs)
    p1, l1 = bm25_update_model(p0, l0, docs.limit(0))
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p0.collect()))
    assert sorted(map(tuple, l1.collect())) == sorted(map(tuple, l0.collect()))
    # token-less doc 2 still counts toward N through doclen
    assert l1.count() == 2


def test_bm25_results_partition_invariant(spark):
    """Scores and top-k membership must not depend on physical layout:
    the decimal-sum discipline makes per-doc scores order-independent,
    so any repartitioning of docs or model tables yields identical
    results (the shuffle-proof claim, pinned)."""
    from skripsi_mapreduce_spark.operators.search import (
        bm25_model,
        bm25_topk,
        bm25_topk_many,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = ["hash", "join", "spark", "stream"]
    a = [tuple(r) for r in bm25_topk(docs, terms, k=15).collect()]
    b = [tuple(r) for r in bm25_topk(docs.repartition(17), terms, k=15).collect()]
    assert a == b and len(a) == 15
    p, d = bm25_model(docs)
    qdf = spark.createDataFrame([(0, terms)], "query_id long, terms array<string>")
    m1 = sorted(map(tuple, bm25_topk_many(p, d, qdf, k=15).collect()))
    m2 = sorted(
        map(
            tuple,
            bm25_topk_many(
                p.repartition(13), d.repartition(5), qdf, k=15
            ).collect(),
        )
    )
    assert m1 == m2
    assert {(doc, s) for _q, doc, s in m1} == set(a)


def test_bm25_update_model_deletions_equal_reindex(spark):
    """Round-10: bm25_update_model's deleted_ids path must leave the
    model ROW-IDENTICAL to a reindex over the post-delete corpus — a
    phantom doc left behind would skew N/avgdl and every shared term's
    df — and a doc id in both the delta and deleted_ids raises (an
    upsert-vs-delete conflict is ambiguous, never silent)."""
    import pytest

    from skripsi_mapreduce_spark.operators.search import (
        bm25_model,
        bm25_topk_from_model,
        bm25_update_model,
    )

    full = spark.createDataFrame(
        [
            (1, "hash join spark"),
            (2, "sort scan merge"),
            (3, "spark stream window"),
            (4, "filter group hash"),
        ],
        "doc_id long, text string",
    )
    p0, l0 = bm25_model(full, checkpoint=True)
    delta = spark.createDataFrame(
        [(2, "sort scan merge rewrite"), (5, "spark table query")],
        "doc_id long, text string",
    )
    dels = spark.createDataFrame([(3,), (4,)], "doc_id long")
    p1, l1 = bm25_update_model(p0, l0, delta, deleted_ids=dels)
    survivors = spark.createDataFrame(
        [
            (1, "hash join spark"),
            (2, "sort scan merge rewrite"),
            (5, "spark table query"),
        ],
        "doc_id long, text string",
    )
    pw, lw = bm25_model(survivors)
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, pw.collect()))
    assert sorted(map(tuple, l1.collect())) == sorted(map(tuple, lw.collect()))
    got = [
        tuple(r)
        for r in bm25_topk_from_model(p1, l1, ["spark", "hash"], k=10).collect()
    ]
    want = [
        tuple(r)
        for r in bm25_topk_from_model(pw, lw, ["spark", "hash"], k=10).collect()
    ]
    assert got == want and len(got) > 0
    # deleting a doc that was never in the model is a no-op, not an error
    p2, l2 = bm25_update_model(
        p0, l0, delta, deleted_ids=spark.createDataFrame([(99,)], "doc_id long")
    )
    pw2, lw2 = bm25_model(
        full.filter("doc_id <> 2").unionByName(delta)
    )
    assert sorted(map(tuple, l2.collect())) == sorted(map(tuple, lw2.collect()))
    assert sorted(map(tuple, p2.collect())) == sorted(map(tuple, pw2.collect()))
    # upsert-vs-delete conflict raises
    with pytest.raises(ValueError, match="both the delta and deleted_ids"):
        bm25_update_model(
            p0, l0, delta, deleted_ids=spark.createDataFrame([(5,)], "doc_id long")
        )


def test_bm25_model_checkpoint_single_tokenize(spark):
    """bm25_model(checkpoint=True) must return tables value-identical
    to the plain form AND tokenize the corpus exactly once: doclen's
    plan derives from the pinned tf RDD, so materializing doclen then
    postings schedules the regexp-extract scan a single time (the
    round-10 fix — checkpointing the two returned plans separately
    re-ran the tokenize chain through doclen's lineage)."""
    from skripsi_mapreduce_spark.operators.search import bm25_model

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p0, l0 = bm25_model(docs)
    p1, l1 = bm25_model(docs, checkpoint=True)
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p0.collect()))
    assert sorted(map(tuple, l1.collect())) == sorted(map(tuple, l0.collect()))
    # the checkpointed tf plan is pinned: doclen's physical plan scans
    # the checkpoint RDD, not the parquet + regexp chain
    assert "Scan ExistingRDD" in l1._jdf.queryExecution().executedPlan().toString()
