"""Hand-computed semantics for the corpus-level text-analysis operators:
cross-document duplication, duplicated passages, unigram log-prob."""

from __future__ import annotations

from skripsi_mapreduce_spark.operators.text_analysis import (
    cross_doc_duplication,
    duplicated_passages,
    remove_duplicated_passages,
    unigram_logprob,
)


def test_cross_doc_duplication_known_values(spark):
    rows = [
        (1, "aa bb cc"),  # bigrams {aa bb, bb cc}; "aa bb" shared with doc 2
        (2, "aa bb dd"),  # bigrams {aa bb, bb dd}
        (3, "ee ff"),  # unique bigram
        (4, "gg"),  # shorter than k -> no grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in cross_doc_duplication(df, k=2).collect()}
    assert out[1] == {"doc_id": 1, "n_grams": 2, "n_shared": 1, "crossdup_frac": 0.5}
    assert out[2] == {"doc_id": 2, "n_grams": 2, "n_shared": 1, "crossdup_frac": 0.5}
    assert out[3] == {"doc_id": 3, "n_grams": 1, "n_shared": 0, "crossdup_frac": 0.0}
    assert out[4] == {"doc_id": 4, "n_grams": 0, "n_shared": 0, "crossdup_frac": 0.0}


def test_duplicated_passages_reports_shared_windows(spark):
    rows = [(1, "aa bb cc"), (2, "aa bb dd"), (3, "xx yy")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = duplicated_passages(df, k=2).collect()
    assert [(r["passage"], r["n_docs"], r["example_doc_id"]) for r in got] == [("aa bb", 2, 1)]


def test_remove_duplicated_passages_known_values(spark):
    rows = [
        # docs 1 and 2 share the window "aa bb" -> those tokens are removed
        # from both; the unshared tails survive
        (1, "aa bb cc"),
        (2, "aa bb dd"),
        (3, "ee ff"),  # unique window -> untouched
        (4, "gg"),  # shorter than k -> untouched
        (5, ""),  # empty -> empty
        (6, "aa bb"),  # the shared window IS the whole doc -> fully removed
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in remove_duplicated_passages(df, k=2).collect()}
    assert out[1] == {"doc_id": 1, "n_tokens": 3, "n_removed": 2, "cleaned": "cc"}
    assert out[2] == {"doc_id": 2, "n_tokens": 3, "n_removed": 2, "cleaned": "dd"}
    assert out[3] == {"doc_id": 3, "n_tokens": 2, "n_removed": 0, "cleaned": "ee ff"}
    assert out[4] == {"doc_id": 4, "n_tokens": 1, "n_removed": 0, "cleaned": "gg"}
    assert out[5] == {"doc_id": 5, "n_tokens": 0, "n_removed": 0, "cleaned": ""}
    assert out[6] == {"doc_id": 6, "n_tokens": 2, "n_removed": 2, "cleaned": ""}


def test_remove_duplicated_passages_overlapping_windows_merge(spark):
    # "aa bb cc dd" shares BOTH windows ("aa bb", then overlapping "bb cc")
    # with doc 2/3 — coverage is the union of positions, not double-counted
    rows = [(1, "aa bb cc dd"), (2, "aa bb"), (3, "bb cc")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in remove_duplicated_passages(df, k=2).collect()}
    assert out[1] == {"doc_id": 1, "n_tokens": 4, "n_removed": 3, "cleaned": "dd"}


def test_unigram_logprob_known_values(spark):
    # corpus counts: aa=2, bb=2, T=4 -> p = 0.5 for both words
    # every doc's mean nll = -ln(0.5) = 0.69314718... -> 0.6931 at 4dp
    rows = [(1, "aa aa bb"), (2, "bb"), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in unigram_logprob(df).collect()}
    assert out[1]["n_words"] == 3 and abs(out[1]["nll"] - 0.6931) < 1e-9
    assert out[2]["n_words"] == 1 and abs(out[2]["nll"] - 0.6931) < 1e-9
    assert out[3] == {"doc_id": 3, "n_words": 0, "nll": 0.0}


def test_unigram_logprob_orders_rare_docs_higher(spark):
    # doc 2 is one rare token; doc 1 repeats the common token — the
    # filter's purpose: rare-token soup must score strictly higher
    rows = [(1, "aa aa aa aa"), (2, "zz"), (3, "aa aa aa aa")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["nll"] for r in unigram_logprob(df).collect()}
    assert out[2] > out[1] == out[3]


def test_quality_classifier_known_values(spark):
    from skripsi_mapreduce_spark.operators.text_analysis import (
        CLASSIFIER_BIAS,
        CLASSIFIER_THRESHOLD,
        CLASSIFIER_WEIGHTS,
        quality_classifier,
        quality_score,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "!!! ??? ... ,,, ;;; ::: ((( ))) --- '''"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    feats = {r["doc_id"]: r.asDict() for r in quality_score(df).collect()}
    out = {r["doc_id"]: r for r in quality_classifier(df).collect()}
    for d in (1, 2, 3):
        z = CLASSIFIER_BIAS
        for name, w in CLASSIFIER_WEIGHTS.items():
            z = z + w * feats[d][name]
        assert out[d]["logit"] == z, d
        assert out[d]["keep"] == int(z >= CLASSIFIER_THRESHOLD), d
    # clean prose scores above punctuation soup
    assert out[1]["logit"] > out[2]["logit"]
    assert out[1]["keep"] == 1
