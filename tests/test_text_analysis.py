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


def test_fit_quality_classifier_recovers_planted_signal(spark):
    """Exact least squares over hashed token features: labels that are
    EXACTLY linear in the features must fit with the planted weights
    recovered to float precision (residual-zero normal equations), by
    both the driver-solve path and the engine-side Cramer path."""
    from pyspark.sql import functions as F

    from skripsi_mapreduce_spark.operators.text_analysis import (
        cramer4_sql,
        fit_quality_classifier,
        hashed_token_features,
        moment_aggs,
        quality_logit_learned,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = hashed_token_features(docs, 3)
    planted = [7.0, 2.5, -1.25, 0.5]
    lab = feats.select(
        "doc_id", "x1", "x2", "x3",
        (
            F.lit(int(planted[0] * 4))
            + F.lit(int(planted[1] * 4)) * F.col("x1")
            + F.lit(int(planted[2] * 4)) * F.col("x2")
            + F.lit(int(planted[3] * 4)) * F.col("x3")
        ).cast("long").alias("y4"),  # x4 scale keeps labels integer-exact
    ).localCheckpoint()
    docs_lab = docs.join(lab.select("doc_id", "y4"), "doc_id")

    model = fit_quality_classifier(docs_lab, "y4", n_buckets=3)
    got = [w / 4.0 for w in model["weights"]]  # back to label units
    assert all(abs(g - p) < 1e-9 for g, p in zip(got, planted)), got

    # engine-side Cramer path agrees with the driver solve
    det_a, det_j = cramer4_sql()
    m = lab.withColumnRenamed("y4", "y").agg(*moment_aggs(3, "y"))
    w_row = m.select(
        *[F.expr(f"({det_j[j]}) / ({det_a})").alias(f"w{j}") for j in range(4)]
    ).head()
    cramer = [w_row[f"w{j}"] / 4.0 for j in range(4)]
    assert all(abs(c - p) < 1e-9 for c, p in zip(cramer, planted)), cramer

    # inference through the learned logit keeps exactly the docs whose
    # planted label clears the threshold
    thr = 4.0 * 9.0 + 0.5  # half-integer: no integer label sits ON it
    scored = quality_logit_learned(docs_lab, model, thr)
    got_keep = {r["doc_id"] for r in scored.filter(F.col("keep") == 1).collect()}
    want_keep = {r["doc_id"] for r in lab.filter(F.col("y4") >= thr).collect()}
    assert got_keep == want_keep and 0 < len(want_keep) < docs.count()


def test_collocations_known_values(spark):
    """PMI computed by hand on a corpus where 'new york' always
    co-occurs and 'the' is everywhere: pmi(new, york) must be high and
    exact, selection is by integer count only, and sub-threshold
    bigrams must not appear."""
    import math

    from skripsi_mapreduce_spark.operators.text_analysis import collocations

    rows = [(i, "the cat saw new york") for i in range(6)]
    rows += [(10 + i, "the dog") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["a"], r["b"]): r for r in collocations(df, min_count=5).collect()}
    # corpus: 6*5 + 4*2 = 38 tokens, 6*4 + 4*1 = 28 bigrams
    assert ("new", "york") in out
    r = out[("new", "york")]
    assert r["pair_count"] == 6
    want = round(math.log((6 / 28) / ((6 / 38) * (6 / 38))), 8)
    assert abs(r["pmi"] - want) < 1e-8
    # ('the', 'cat') appears 6 times -> present; ('the', 'dog') 4 < 5 -> absent
    assert ("the", "cat") in out and ("the", "dog") not in out
    # every surviving bigram meets the integer threshold
    assert all(r["pair_count"] >= 5 for r in out.values())


def test_collocations_degenerate_short_docs(spark):
    """Documents with fewer than two tokens contribute no bigrams; a
    corpus of only such docs yields an empty result, not an error."""
    from skripsi_mapreduce_spark.operators.text_analysis import collocations

    df = spark.createDataFrame(
        [(1, "word"), (2, ""), (3, "x")], "doc_id long, text string"
    )
    assert collocations(df, min_count=1).count() == 0


def test_collocations_mass_conservation_and_symmetric_pair(spark):
    """At min_count=1 the pair counts must sum to the corpus's total
    bigram count, and a bigram whose two words occur ONLY together has
    the closed-form pmi ln((c/B) / ((c/T)^2))."""
    import math

    from skripsi_mapreduce_spark.operators.text_analysis import collocations

    rows = [(i, "alpha beta gamma delta") for i in range(4)]
    rows += [(10 + i, "zig zag") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(df, min_count=1).collect()
    total_bigrams = 4 * 3 + 3 * 1
    assert sum(r["pair_count"] for r in out) == total_bigrams
    total_tokens = 4 * 4 + 3 * 2
    zz = next(r for r in out if (r["a"], r["b"]) == ("zig", "zag"))
    want = round(
        math.log((3 / total_bigrams) / ((3 / total_tokens) * (3 / total_tokens))), 8
    )
    assert abs(zz["pmi"] - want) < 1e-8


def test_pii_scrub_idempotent_and_typed(spark):
    """Scrubbing twice equals scrubbing once (placeholders contain no
    scrubbable spans), and each planted kind maps to its own typed
    placeholder."""
    from skripsi_mapreduce_spark.operators.pipeline import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.org call +1 (555) 123-4567 ip 10.0.0.7 ssn 123-45-6789 end")],
        "doc_id long, text string",
    )
    once = scrub_pii(df).head()["text"]
    twice = scrub_pii(scrub_pii(df)).head()["text"]
    assert once == twice
    assert once == "mail [email] call [phone] ip [ipv4] ssn [ssn] end"


def test_feature_hash_embed_matches_python_twin(spark):
    """feature_hash_embed vs an independent Python twin (hashlib md5,
    same gram/bucket/sign/normalize semantics): every (doc, dim) value
    must agree exactly, including zero-fill rows, sign cancellation,
    and the empty-doc zero vector."""
    import hashlib
    import math
    import re

    from skripsi_mapreduce_spark.operators.text_analysis import feature_hash_embed

    docs = [
        (1, "Hello world hello spark"),
        (2, ""),           # empty -> zero vector, not divide-by-zero
        (3, "one"),        # single gram -> unit vector
        (4, "aa bb aa bb aa bb cc dd"),  # repeated grams, cancellations
        (5, "Mixed CASE Tokens mixed case tokens"),
        (6, None),         # NULL text -> zero vector (tokens NULL,
                           # explode drops the row, zero-fill restores)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    dim = 8
    got = {
        (r["doc_id"], r["dim"]): r["value_e6"]
        for r in feature_hash_embed(df, dim=dim).collect()
    }
    assert len(got) == len(docs) * dim  # zero-fill: all dims for all docs

    for doc_id, text in docs:
        toks = re.findall(r"\w\w+", (text or "").lower())
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        v = [0] * dim
        for g in grams:
            hx = hashlib.md5(g.encode()).hexdigest()
            j = int(hx[:8], 16) % dim
            s = 1 if int(hx[31], 16) % 2 == 1 else -1
            v[j] += s
        s2 = sum(x * x for x in v)
        for j in range(dim):
            if s2 == 0:
                want = 0
            else:
                x = (float(v[j]) / math.sqrt(float(s2))) * 1e6
                # e6 half-away-from-zero (Spark round / DuckDB ROUND)
                want = int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))
            assert got[(doc_id, j)] == want, (doc_id, j, got[(doc_id, j)], want)


def test_feature_hash_embed_single_corpus_scan(spark):
    """The norm must come from a WINDOW over the aggregated (doc, dim)
    table, not a second aggregate lineage over the corpus: exactly one
    scan of the documents text column (the zero-fill base may scan the
    narrow doc_id column), and no nested-loop joins beyond the bounded
    16-row dims cross join."""
    from skripsi_mapreduce_spark.plans import QUERIES

    from .conftest import SF_DIR

    df = QUERIES["emb_feature_hashing"](spark, SF_DIR)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    reads = [l for l in p.splitlines() if "ReadSchema" in l]
    text_scans = [l for l in reads if "text" in l]
    assert len(text_scans) == 1, f"corpus text scanned {len(text_scans)}x"
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_feature_hash_embed_properties(spark):
    """Property block over generated corpora (deterministic seed grid —
    the repo's hypothesis-equivalent for Spark-backed ops, where each
    case costs a job): for every doc, (1) the emitted vector is either
    the zero vector (no grams, or total sign cancellation) or has
    L2 norm 1e6 within integer-rounding slack (dim/2 e6 units);
    (2) shuffling the input row order changes nothing (canonical
    determinism). (Text-doubling does NOT preserve direction — bigram
    counts scale as 2n-1 while unigrams scale as 2n — so no such
    property is asserted.)"""
    import random

    from skripsi_mapreduce_spark.operators.text_analysis import feature_hash_embed

    rng = random.Random(99)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(0, 12))))
        for i in range(24)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = feature_hash_embed(df, dim=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["dim"]] = r["value_e6"]
    for doc_id, vec in by_doc.items():
        assert sorted(vec) == list(range(8))  # all dims, zero-filled
        s2 = sum(v * v for v in vec.values())
        if s2:
            # ||v||=1e6 up to per-coordinate rounding (<=0.5 each)
            assert abs(s2 - 10**12) <= 8 * 10**6, (doc_id, s2)

    shuffled = list(docs)
    rng.shuffle(shuffled)
    df2 = spark.createDataFrame(shuffled, "doc_id long, text string")
    out2 = feature_hash_embed(df2, dim=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
