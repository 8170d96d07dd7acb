"""prepare_corpus: the corpus-prep composition behaves stage by stage and
end to end; deterministic_sample is reproducible and well-calibrated."""

from __future__ import annotations

from pyspark.sql import functions as F

from skripsi_mapreduce_spark.operators.pipeline import (
    deterministic_sample,
    prepare_corpus,
)


def test_deterministic_sample_reproducible_and_calibrated(spark):
    df = spark.range(1, 20_001).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in deterministic_sample(df, 0.3, "doc_id").collect()}
    b = {r["doc_id"] for r in deterministic_sample(df, 0.3, "doc_id").collect()}
    assert a == b  # pure function of the key
    assert 0.27 < len(a) / 20_000 < 0.33  # calibrated to the fraction
    c = {r["doc_id"] for r in deterministic_sample(df, 0.3, "doc_id", salt="other").collect()}
    assert c != a  # salt changes the draw
    assert {r["doc_id"] for r in deterministic_sample(df, 1.0, "doc_id").collect()} == set(
        range(1, 20_001)
    )


def test_prepare_corpus_end_to_end(spark):
    rows = [
        (1, "the cat sat on the mat and it is a fine mat for cats to sit on today"),
        (2, "the cat sat on the mat and it is a fine mat for cats to sit on today"),  # exact dup
        (3, "the cat sat on the mat and it is a fine mat for cats to sit on now"),  # near dup
        (4, "zz!!! ??? !!!"),  # junk -> quality filter
        (5, "el gato esta en la casa y la casa es de los gatos que viven alli"),  # spanish
        (6, "completely different english text that talks about the weather in spring it is nice"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(
        docs,
        min_quality=0.5,
        languages=["en"],
        exact_dedup=True,
        near_dedup_threshold=0.7,
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # 2 drops as exact dup of 1; 3 drops as near dup of 1; 4 fails quality;
    # 5 fails language; 1 and 6 survive
    assert kept == [1, 6]


def test_prepare_corpus_chunking_stage(spark):
    rows = [(1, " ".join(f"tok{i:03d}" for i in range(70)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(
        docs,
        min_quality=None,
        exact_dedup=False,
        near_dedup_threshold=None,
        chunk_tokens=32,
    )
    chunks = sorted((r["chunk_idx"], len(r["chunk_text"].split())) for r in out.collect())
    assert chunks == [(0, 32), (1, 32), (2, 6)]


def test_scrub_pii_replaces_typed_spans(spark):
    from skripsi_mapreduce_spark.operators.pipeline import scrub_pii

    rows = [
        (1, "contact alice@example.com or +1 (555) 123-4567 today"),
        (2, "server at 192.168.1.100 holds ssn 123-45-6789"),
        (3, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in scrub_pii(df).collect()}
    assert "[email]" in got[1] and "alice@" not in got[1]
    assert "[phone]" in got[1] and "555" not in got[1]
    assert "[ipv4]" in got[2] and "192.168" not in got[2]
    assert "[ssn]" in got[2] and "6789" not in got[2]
    assert got[3] == "no pii here at all"
    only_email = {r["doc_id"]: r["text"] for r in scrub_pii(df, kinds=["email"]).collect()}
    assert "[email]" in only_email[1] and "555" in only_email[1].replace("[phone]", "555")


def test_contamination_check_finds_verbatim_ngrams(spark):
    from skripsi_mapreduce_spark.operators.pipeline import contamination_check

    eval_q = "what is the capital of france and why does it matter to anyone"
    train = [
        (1, "some prefix text then " + eval_q + " plus a suffix"),  # contaminated
        (2, "completely unrelated training document about cooking pasta dishes well"),
    ]
    docs = spark.createDataFrame(train, "doc_id long, text string")
    evals = spark.createDataFrame([(100, eval_q)], "doc_id long, text string")
    got = {
        (r["doc_id"], r["eval_id"]): r["n_shared_ngrams"]
        for r in contamination_check(docs, evals, shingle_size=8).collect()
    }
    assert set(got) == {(1, 100)}
    assert got[(1, 100)] >= 4  # several 8-gram windows of the query leak


def test_deterministic_sample_is_nested(spark):
    """Smaller fractions are strict subsets of larger ones (threshold
    form over the same hash draw) — so a 1% corpus study extends to the
    10% corpus without re-drawing."""
    df = spark.range(1, 5_001).withColumnRenamed("id", "doc_id")
    s10 = {r["doc_id"] for r in deterministic_sample(df, 0.10, "doc_id").collect()}
    s30 = {r["doc_id"] for r in deterministic_sample(df, 0.30, "doc_id").collect()}
    s60 = {r["doc_id"] for r in deterministic_sample(df, 0.60, "doc_id").collect()}
    assert s10 <= s30 <= s60
