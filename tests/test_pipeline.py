"""prepare_corpus: the corpus-prep composition behaves stage by stage and
end to end; deterministic_sample is reproducible and well-calibrated."""

from __future__ import annotations

from pyspark.sql import functions as F

from skripsi_mapreduce_spark.operators.pipeline import (
    deterministic_sample,
    mix_weights,
    prepare_corpus,
    stratified_sample,
    weighted_priority_sample,
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


def test_weighted_priority_sample_matches_python_formula(spark):
    """The selected set is exactly the top-k by the Efraimidis-Spirakis
    priority recomputed independently in Python from the same md5 draw."""
    import hashlib
    import math

    rows = [(i, float(w)) for i, w in zip(range(1, 51), [1, 5, 10, 50] * 12 + [100, 100])]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = [r["doc_id"] for r in weighted_priority_sample(df, k=10, weight_col="w").collect()]

    def prio(doc_id, w):
        u_int = int(hashlib.md5(f"wps:{doc_id}".encode()).hexdigest()[:15], 16)
        x = math.log((u_int + 1) / float(1 << 60)) / w
        import decimal

        return int(decimal.Decimal(x * 1e8).to_integral_value(rounding=decimal.ROUND_HALF_UP))

    want = sorted(rows, key=lambda r: (-prio(r[0], r[1]), r[0]))[:10]
    assert got == [d for d, _ in want]


def test_weighted_priority_sample_weight_bias_and_exclusion(spark):
    """Across many rows, heavy rows must be selected far more often than
    light ones (inclusion ∝ weight), and nonpositive weights never."""
    rows = [(i, 100.0 if i % 10 == 0 else 1.0) for i in range(1, 2001)]
    rows += [(9001, 0.0), (9002, -3.0)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = {r["doc_id"] for r in weighted_priority_sample(df, k=200, weight_col="w").collect()}
    assert 9001 not in got and 9002 not in got
    heavy = sum(1 for d in got if d % 10 == 0)
    # 200 heavy rows at weight 100 vs 1800 light at weight 1: heavy rows
    # dominate the draw (expected ~>150 of 200 picks)
    assert heavy > 120
    # determinism under repartitioning
    again = {r["doc_id"] for r in
             weighted_priority_sample(df.repartition(13), k=200, weight_col="w").collect()}
    assert got == again


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


def test_stratified_sample_boundary_rates(spark):
    df = spark.range(1, 2_001).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    kept = stratified_sample(df, {"en": 1.0}, "lang").collect()
    assert {r["lang"] for r in kept} == {"en"}
    assert len(kept) == 1000  # rate 1.0 keeps every row of the group
    assert stratified_sample(df, {"en": 0.0, "de": 0.0}, "lang").count() == 0
    # groups absent from the rates dict are dropped entirely
    assert stratified_sample(df, {"de": 1.0}, "lang").count() == 1000


def test_stratified_sample_nested_and_calibrated(spark):
    df = spark.range(1, 10_001).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("fr").alias("lang"),
    )
    lo = {r["doc_id"] for r in stratified_sample(df, {"en": 0.2, "fr": 0.5}).collect()}
    hi = {r["doc_id"] for r in stratified_sample(df, {"en": 0.6, "fr": 0.9}).collect()}
    assert lo <= hi  # raising rates only adds documents
    n_en = sum(1 for d in lo if d % 3 == 0)
    n_fr = len(lo) - n_en
    assert 0.15 < n_en / 3333 < 0.25 and 0.45 < n_fr / 6667 < 0.55


def test_mix_weights_math(spark):
    # counts: en=600, de=300, fr=100; target mix 1:1:1 -> bottleneck fr
    df = spark.range(1, 1_001).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") <= 600, "en")
        .when(F.col("id") <= 900, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    rates = mix_weights(df, {"en": 1.0, "de": 1.0, "fr": 1.0})
    # T = min(600, 300, 100) = 100 -> rates 100/600, 100/300, 100/100
    assert rates["fr"] == 1.0
    assert abs(rates["en"] - 100 / 600) < 1e-12
    assert abs(rates["de"] - 100 / 300) < 1e-12
    # group not named in weights -> rate 0
    rates2 = mix_weights(df, {"en": 2.0, "de": 1.0})
    assert abs(rates2["en"] - 1.0) < 1e-12  # 600/2=300 vs 300/1=300 -> en binds
    assert rates2["de"] == 1.0


def test_ngram_repetition_known_values(spark):
    from skripsi_mapreduce_spark.operators.text_analysis import ngram_repetition

    rows = [
        # tokens [aa bb aa bb aa bb]: bigrams "aa bb"x3 "bb aa"x2 -> top2 3/5;
        # trigrams "aa bb aa"x2 "bb aa bb"x2 -> top3 2/4; 5-grams unique -> dup5 0
        (1, "aa bb aa bb aa bb"),
        # 7x "cc": bigram top 6/6; 5-grams: one gram x3 -> dup5 3/3
        (2, "cc cc cc cc cc cc cc"),
        # too short for any gram
        (3, "dd"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in ngram_repetition(df).collect()}
    assert out[1]["n_words"] == 6
    assert abs(out[1]["top2_frac"] - 0.6) < 1e-9
    assert abs(out[1]["top3_frac"] - 0.5) < 1e-9
    assert out[1]["dup5_frac"] == 0.0
    assert out[2]["top2_frac"] == 1.0 and out[2]["dup5_frac"] == 1.0
    assert out[3] == {
        "doc_id": 3,
        "n_words": 1,
        "top2_frac": 0.0,
        "top3_frac": 0.0,
        "dup5_frac": 0.0,
    }


def test_negative_samples_exclusion_and_coverage(spark):
    """The rank-skip exclusion must hold at BOTH boundaries (anchor at
    rank 1 and rank n), every anchor must get exactly k negatives, every
    negative must come from the corpus, and the draw must be a pure
    function of (salt, id, j) — invariant to partitioning."""
    from skripsi_mapreduce_spark.operators.pipeline import negative_samples

    corpus = spark.range(0, 97).select(F.col("id").alias("doc_id"))
    anchors = corpus.filter(F.col("doc_id").isin([0, 13, 96]))  # rank 1, mid, rank n
    out = negative_samples(corpus, anchors, "doc_id", k=16, salt="t").collect()
    assert len(out) == 3 * 16
    by_anchor: dict[int, list[int]] = {}
    for r in out:
        assert r.neg_id != r.anchor_id, "self-pair leaked through the rank skip"
        assert 0 <= r.neg_id <= 96
        by_anchor.setdefault(r.anchor_id, []).append((r.j, r.neg_id))
    assert sorted(by_anchor) == [0, 13, 96]
    assert all(sorted(j for j, _ in v) == list(range(16)) for v in by_anchor.values())

    # partition-invariance of the draws
    out2 = negative_samples(
        corpus.repartition(7), anchors.repartition(3), "doc_id", k=16, salt="t"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_negative_samples_two_row_corpus_and_validation(spark):
    from skripsi_mapreduce_spark.operators.pipeline import negative_samples
    import pytest as _pytest

    two = spark.range(0, 2).select(F.col("id").alias("doc_id"))
    rows = negative_samples(two, two, "doc_id", k=3, salt="t").collect()
    # with n=2 the only legal negative is the other row, for every draw
    assert all(r.neg_id == 1 - r.anchor_id for r in rows) and len(rows) == 6

    one = spark.range(0, 1).select(F.col("id").alias("doc_id"))
    with _pytest.raises(ValueError):
        negative_samples(one, one, "doc_id", k=2)
