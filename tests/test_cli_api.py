"""CLI three-stage pipeline end-to-end, vocabulary pruning flags, the
Engine facade, and source readers."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from skripsi_mapreduce_spark.api import Engine
from skripsi_mapreduce_spark.operators.tfidf import tfidf_long
from skripsi_mapreduce_spark.sources.readers import avro_available, read_any, read_json_lines

STOP = ["the", "a", "of", "and", "to", "in", "is", "it"]


@pytest.fixture(scope="module")
def reviews_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "reviews.json"
    rows = [
        {"reviewerID": f"u{i:02d}", "asin": f"B{i % 5:02d}", "reviewerName": f"n{i}",
         "reviewText": f"this is a good book number {i} " + ("great " * (i % 3))}
        for i in range(40)
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def wordlists(tmp_path_factory):
    d = tmp_path_factory.mktemp("lists")
    (d / "adj.txt").write_text("good\ngreat\nbad\n")
    (d / "stop.txt").write_text("\n".join(STOP) + "\n")
    return str(d / "adj.txt"), str(d / "stop.txt")


def test_cli_three_stages(spark, tmp_path, reviews_path, wordlists, capsys):
    from skripsi_mapreduce_spark.cli import main

    adj, stop = wordlists
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    assert main(["-a", "1", "-i", reviews_path, "-o", out,
                 "--adjectives", adj, "--stopwords", stop]) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["documents"] == 40
    assert main(["-a", "2", "-o", out, "-k", "3"]) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["n_docs"] == 40 and s2["feature_rows"] > 0
    assert main(["-a", "3", "-o", out, "-k", "3", "-m", "5"]) == 0
    s3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s3["iterations"] >= 1
    clusters = spark.read.parquet(os.path.join(out, "clusters"))
    assert clusters.count() == 40
    assert set(clusters.columns) == {"doc_id", "cluster", "dist2"}


def test_vocab_pruning_flags(spark):
    rows = [(1, "aa bb cc dd"), (2, "aa bb cc"), (3, "aa bb"), (4, "aa")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    words = lambda out: {r["word"] for r in out.collect()}
    assert words(tfidf_long(df, min_df=3)) == {"aa", "bb"}
    assert words(tfidf_long(df, min_df=2)) == {"aa", "bb", "cc"}
    assert words(tfidf_long(df, max_df=2)) == {"cc", "dd"}
    assert words(tfidf_long(df, max_df=0.5)) == {"cc", "dd"}
    assert words(tfidf_long(df, max_features=2)) == {"aa", "bb"}
    # deterministic tie-break: bb and cc tie at df=2 with max_features=3?
    assert words(tfidf_long(df, max_features=3)) == {"aa", "bb", "cc"}


def test_engine_facade(spark):
    eng = Engine(spark)
    df = spark.createDataFrame([(1, "good good bad"), (2, "bad ugly")], "doc_id long, text string")
    toks = eng.text.tokenize(df, "text").select("tokens").collect()
    assert toks[0]["tokens"] == ["good", "good", "bad"]
    feats = eng.text.tfidf(df)
    res = eng.cluster.kmeans(feats, k=2, max_iter=3, seed=1)
    assert set(res.centroids) <= {0, 1}
    stats = eng.text.token_stats(df).collect()
    assert {r["doc_id"]: r["n_words"] for r in stats} == {1: 3, 2: 2}


def test_read_json_lines_drops_corrupt(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text('{"a": 1, "b": "x"}\n{not json at all\n{"a": 2, "b": "y"}\n')
    schema = T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.StringType())])
    df = read_json_lines(spark, str(p), schema)
    assert sorted((r["a"], r["b"]) for r in df.collect()) == [(1, "x"), (2, "y")]


def test_read_any_formats(spark, tmp_path):
    df = spark.range(5).withColumn("s", F.col("id").cast("string"))
    pq = str(tmp_path / "t.parquet")
    df.write.parquet(pq)
    assert read_any(spark, pq, "parquet").count() == 5
    with pytest.raises(ValueError):
        read_any(spark, pq, "json")  # schema required
    with pytest.raises(RuntimeError):
        read_any(spark, pq, "delta")
    if not avro_available(spark):
        # the pure-Python avro fallback engages; a parquet dir has no
        # .avro part files so it reports that, not a classpath error
        with pytest.raises(FileNotFoundError):
            read_any(spark, pq, "avro")


def test_cli_extension_stages(spark, tmp_path):
    """-a 4/5/6: the training-data operator surface is reachable from the
    reference-shaped CLI."""
    import json as _json

    from skripsi_mapreduce_spark.cli import main as cli_main

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    dpath = str(tmp_path / "docs.parquet")
    docs.write.parquet(dpath)
    out = str(tmp_path / "out")

    assert cli_main(["-a", "4", "-i", dpath, "-o", out, "--method", "exact"]) == 0
    got = spark.read.parquet(f"{out}/dedup_exact").collect()
    assert len(got) == 1 and got[0]["keep_id"] == 1

    assert cli_main(["-a", "5", "-i", dpath, "-o", out]) == 0
    ta_rows = spark.read.parquet(f"{out}/text_analysis")
    assert ta_rows.count() == 3 and "quality" in ta_rows.columns

    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    epath = str(tmp_path / "emb.parquet")
    emb.write.parquet(epath)
    for method, extra in (
        ("brute", []),
        ("ivf", []),
        ("pq_rerank", ["--pq-codes", "4", "--rerank-mult", "2", "--topk", "3"]),
        ("ivfpq_rerank", ["--pq-codes", "4", "--n-list", "4", "--n-probe", "4",
                          "--rerank-mult", "2", "--topk", "3"]),
    ):
        assert cli_main(
            ["-a", "6", "-i", epath, "-o", out, "--method", method, "--query-id", "0"]
            + extra
        ) == 0
        top = spark.read.parquet(f"{out}/topk_{method}").collect()
        assert any(r["vec_id"] == 0 for r in top)  # self hit


def test_cli_corpus_prep_and_bpe_stages(spark, tmp_path):
    """-a 7/8: corpus prep (incl. passage removal) and BPE training."""
    from skripsi_mapreduce_spark.cli import main as cli_main

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in the sun"),
            (2, "the quick brown fox jumps over the lazy dog in the rain"),
            (3, "completely different text about barges and canals today"),
        ],
        "doc_id long, text string",
    )
    dpath = str(tmp_path / "docs.parquet")
    docs.write.parquet(dpath)
    out = str(tmp_path / "out")

    assert cli_main(["-a", "7", "-i", dpath, "-o", out, "--min-quality", "0.1"]) == 0
    assert spark.read.parquet(f"{out}/corpus_prepared").count() >= 1

    assert cli_main(
        ["-a", "7", "-i", dpath, "-o", out, "--method", "passages", "--window", "4"]
    ) == 0
    cleaned = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/corpus_cleaned").collect()}
    assert cleaned[3]["n_removed"] == 0  # the unique doc is untouched
    assert cleaned[1]["n_removed"] > 0  # the near-dup pair lost its shared run

    assert cli_main(["-a", "8", "-i", dpath, "-o", out, "--n-merges", "5"]) == 0
    merges = spark.read.parquet(f"{out}/bpe_merges")
    counts = spark.read.parquet(f"{out}/bpe_token_counts")
    assert merges.count() == 5 and counts.count() == 3


def test_engine_facade_round9_surfaces(spark):
    """The round-9 public surfaces ride the Engine facade: unified
    near-dups dispatch and the maintainable BM25 model triple."""
    eng = Engine(spark)
    docs = spark.createDataFrame(
        [
            (1, "hash join hash join hash join"),
            (2, "hash join hash join hash join"),
            (3, "window sort filter group"),
        ],
        "doc_id long, text string",
    )
    pairs = eng.dedup.near_dups(docs, "text", max_hamming=4).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    postings, doclen = eng.text.bm25_model(docs)
    delta = spark.createDataFrame(
        [(4, "hash join spark stream")], "doc_id long, text string"
    )
    postings, doclen = eng.text.bm25_update(postings, doclen, delta)
    top = eng.text.bm25_query(postings, doclen, ["spark", "stream"], k=2).collect()
    assert [r["doc_id"] for r in top] == [4]


def test_engine_facade_feature_hash_embed(spark):
    """Round-11 surface: eng.text.feature_hash_embed emits the full
    zero-filled long form and unit-normalizes a single-gram doc."""
    eng = Engine(spark)
    docs = spark.createDataFrame(
        [(1, "one"), (2, "")], "doc_id long, text string"
    )
    rows = eng.text.feature_hash_embed(docs, dim=4).collect()
    assert len(rows) == 8  # 2 docs x 4 dims, zero-filled
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["value_e6"])
    assert sorted(abs(v) for v in by_doc[1]) == [0, 0, 0, 10**6]
    assert by_doc[2] == [0, 0, 0, 0]
