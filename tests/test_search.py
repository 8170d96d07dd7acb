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
