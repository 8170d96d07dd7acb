"""CLI entry point mirroring the reference's three pipelines (``-a 1/2/3``,
App.java:40-63 O40), so a user of the reference can switch by changing the
launch command only.

Differences from the reference (all documented in SURVEY.md §8):
- the vocabulary-pruning flags run-job.sh passes but App.java drops
  (-mindf, -maxdf, -f/--max-features) actually work here (Q7);
- exit code is 0 on success (the reference returns 1, Q6);
- -seed makes the K-Means init reproducible (the reference is unseeded, Q5);
- outputs are parquet directories (<out>/review_book, <out>/features,
  <out>/clusters) instead of hard-coded HDFS paths (Q9); N is returned
  in-process instead of via a WebHDFS side file (O14).

Beyond the reference's stages, the engine's training-data operators are
exposed as additional algorithm ids (the reference CLI shape, extended):
``-a 4`` dedup (--method exact|minhash|simhash|ngram|embedding),
``-a 5`` text analysis (stats + quality + langid + fingerprint, one
joined table), ``-a 6`` similarity top-k
(--method brute|lsh|ivf|pq|pq_rerank|ivfpq_rerank),
``-a 7`` corpus prep (sample → quality → language → dedup → chunk,
plus exact-substring passage removal with --method passages),
``-a 8`` BPE tokenizer training (--n-merges; writes the merge table
and per-doc token counts).

Usage:
    python -m skripsi_mapreduce_spark -a 1 -i reviews.json -o outdir \
        --adjectives adj.txt --stopwords stopwords_en.txt
    python -m skripsi_mapreduce_spark -a 2 -o outdir -k 8
    python -m skripsi_mapreduce_spark -a 3 -o outdir -k 8 -m 10
    python -m skripsi_mapreduce_spark -a 4 -i docs.parquet -o outdir \
        --method minhash --threshold 0.8
    python -m skripsi_mapreduce_spark -a 5 -i docs.parquet -o outdir
    python -m skripsi_mapreduce_spark -a 6 -i emb.parquet -o outdir \
        --method ivf --query-id 0 --topk 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F


def _read_wordlist(path: str) -> list[str]:
    with open(path) as f:
        return [w.strip() for w in f if w.strip()]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="skripsi_mapreduce_spark")
    p.add_argument("-i", "--input", help="JSON-lines reviews path (stage 1)")
    p.add_argument("-o", "--output", required=True, help="output directory")
    p.add_argument(
        "-a", "--algorithm", type=int, required=True, choices=[1, 2, 3, 4, 5, 6, 7, 8]
    )
    p.add_argument("-k", type=int, default=8, help="number of clusters")
    p.add_argument("-m", type=int, default=10, help="max iterations (reference runs m-1)")
    p.add_argument("-name", "--name", default="job", help="job name")
    p.add_argument("--adjectives", help="vocabulary word list (adj.txt)")
    p.add_argument("--stopwords", help="stopword list (stopwords_en.txt)")
    p.add_argument("-mindf", "--min-df", type=int, default=None)
    p.add_argument("-maxdf", "--max-df", type=float, default=None)
    p.add_argument("-f", "--max-features", type=int, default=None)
    p.add_argument("-seed", "--seed", type=int, default=42)
    p.add_argument(
        "--method",
        default=None,
        help=(
            "-a 4: exact|minhash|simhash|ngram|embedding; "
            "-a 6: brute|lsh|ivf|pq|pq_rerank|ivfpq_rerank"
        ),
    )
    p.add_argument("--threshold", type=float, default=0.8, help="-a 4 similarity threshold")
    p.add_argument("--max-hamming", type=int, default=8, help="-a 4 simhash Hamming radius")
    p.add_argument("--query-id", type=int, default=0, help="-a 6 query vector id")
    p.add_argument("--topk", type=int, default=10, help="-a 6 k")
    p.add_argument("--n-planes", type=int, default=4, help="-a 6 lsh hyperplanes")
    p.add_argument("--n-list", type=int, default=16, help="-a 6 ivf coarse lists")
    p.add_argument("--n-probe", type=int, default=4, help="-a 6 ivf probed lists")
    p.add_argument("--pq-m", type=int, default=8, help="-a 6 pq subspaces")
    p.add_argument("--pq-codes", type=int, default=16, help="-a 6 pq codebook size")
    p.add_argument(
        "--rerank-mult", type=int, default=8,
        help="-a 6 pq_rerank/ivfpq_rerank shortlist = mult * k",
    )
    p.add_argument("--sample", type=float, default=None, help="-a 7 sample fraction")
    p.add_argument("--min-quality", type=float, default=0.5, help="-a 7 quality cut")
    p.add_argument("--languages", default=None, help="-a 7 comma-separated lang codes")
    p.add_argument("--chunk-tokens", type=int, default=None, help="-a 7 chunk size")
    p.add_argument("--window", type=int, default=6, help="-a 7 passages window k")
    p.add_argument("--n-merges", type=int, default=100, help="-a 8 BPE merges to learn")
    return p


def _run_dedup(spark, args, out: str) -> dict:
    from .operators import dedup as dd
    from .operators import similarity as sim

    docs = spark.read.parquet(args.input)
    method = args.method or "exact"
    if method == "exact":
        res = dd.exact_duplicate_groups(docs)
    elif method == "minhash":
        res = dd.minhash_near_dups(docs, threshold=args.threshold)
    elif method == "simhash":
        res = dd.simhash_near_dups(dd.simhash64(docs), max_hamming=args.max_hamming)
    elif method == "ngram":
        res = dd.ngram_near_dups(docs, threshold=args.threshold, shingle_size=2)
    elif method == "embedding":
        res = sim.embedding_near_dups(docs, threshold=args.threshold, n_planes=4)
    else:
        raise SystemExit(f"unknown dedup method: {method}")
    from .io import write_parquet

    write_parquet(res, os.path.join(out, f"dedup_{method}"))
    return {"stage": 4, "method": method, "rows": spark.read.parquet(
        os.path.join(out, f"dedup_{method}")).count()}


def _run_text_analysis(spark, args, out: str) -> dict:
    from .io import write_parquet
    from .operators import text_analysis as ta

    docs = spark.read.parquet(args.input)
    joined = (
        ta.token_stats(docs)
        .join(ta.quality_score(docs), "doc_id")
        .join(ta.lang_id(docs), "doc_id")
        .join(ta.fingerprint(docs), "doc_id")
    )
    write_parquet(joined, os.path.join(out, "text_analysis"))
    return {"stage": 5, "rows": spark.read.parquet(os.path.join(out, "text_analysis")).count()}


def _run_similarity(spark, args, out: str) -> dict:
    from .io import write_parquet
    from .operators import similarity as sim

    emb = spark.read.parquet(args.input)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == args.query_id).head()["embedding"]
    ]
    method = args.method or "brute"
    if method == "brute":
        res = sim.topk_cosine(emb, qvec, k=args.topk)
    elif method == "lsh":
        res = sim.lsh_topk_cosine(emb, qvec, k=args.topk, n_planes=args.n_planes)
    elif method == "ivf":
        res = sim.ivf_topk_cosine(
            emb, qvec, k=args.topk, n_list=args.n_list, n_probe=args.n_probe
        )
    elif method == "pq":
        res = sim.pq_topk(emb, qvec, k=args.topk, m=args.pq_m, n_codes=args.pq_codes)
    elif method == "pq_rerank":
        res = sim.pq_rerank_topk(
            emb, qvec, k=args.topk, rerank_mult=args.rerank_mult,
            m=args.pq_m, n_codes=args.pq_codes,
        )
    elif method == "ivfpq_rerank":
        res = sim.ivfpq_rerank_topk(
            emb, qvec, k=args.topk, rerank_mult=args.rerank_mult,
            n_list=args.n_list, n_probe=args.n_probe,
            m=args.pq_m, n_codes=args.pq_codes,
        )
    else:
        raise SystemExit(f"unknown similarity method: {method}")
    write_parquet(res, os.path.join(out, f"topk_{method}"))
    return {"stage": 6, "method": method, "k": args.topk}


def _run_corpus_prep(spark, args, out: str) -> dict:
    from .io import write_parquet

    docs = spark.read.parquet(args.input)
    if args.method == "passages":
        from .operators.text_analysis import remove_duplicated_passages

        res = remove_duplicated_passages(docs, k=args.window)
        write_parquet(res, os.path.join(out, "corpus_cleaned"))
        n = spark.read.parquet(os.path.join(out, "corpus_cleaned")).count()
        return {"stage": 7, "method": "passages", "rows": n}
    from .operators.pipeline import prepare_corpus

    langs = args.languages.split(",") if args.languages else None
    res = prepare_corpus(
        docs,
        sample_fraction=args.sample,
        min_quality=args.min_quality,
        languages=langs,
        near_dedup_threshold=args.threshold,
        chunk_tokens=args.chunk_tokens,
    )
    write_parquet(res, os.path.join(out, "corpus_prepared"))
    n = spark.read.parquet(os.path.join(out, "corpus_prepared")).count()
    return {"stage": 7, "rows": n}


def _run_bpe(spark, args, out: str) -> dict:
    from .io import write_parquet
    from .operators.bpe import bpe_token_count, learn_bpe, merges_df

    docs = spark.read.parquet(args.input)
    merges = learn_bpe(docs, n_merges=args.n_merges)
    write_parquet(merges_df(spark, merges), os.path.join(out, "bpe_merges"))
    counts = bpe_token_count(docs, merges)
    write_parquet(counts, os.path.join(out, "bpe_token_counts"))
    total = spark.read.parquet(os.path.join(out, "bpe_token_counts")).agg(
        F.sum("n_bpe_tokens")
    ).head()[0]
    return {"stage": 8, "merges_learned": len(merges), "total_bpe_tokens": int(total or 0)}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .io import write_parquet
    from .session import get_spark

    spark = get_spark(app_name=f"skripsi_mapreduce_spark-{args.name}")
    out = args.output
    if args.algorithm == 1:
        from .operators.etl import extract_transform

        if not args.input:
            print("error: -a 1 requires -i <reviews.json>", file=sys.stderr)
            return 2
        stop = _read_wordlist(args.stopwords) if args.stopwords else []
        vocab = _read_wordlist(args.adjectives) if args.adjectives else None
        review_book, n = extract_transform(spark, args.input, stop, vocab)
        write_parquet(review_book, os.path.join(out, "review_book"))
        # the reference publishes N via WebHDFS (App.java:70-91); a local
        # metadata file keeps stage 2 self-contained
        with open(os.path.join(out, "jumlah_dokumen.txt"), "w") as f:
            f.write(str(n))
        print(json.dumps({"stage": 1, "documents": n}))
    elif args.algorithm == 2:
        from .operators.tfidf import tfidf_long

        rb = spark.read.parquet(os.path.join(out, "review_book"))
        docs = rb.select(
            F.col("id").cast("long").alias("doc_id"),
            F.array_join("adjectiveWord", " ").alias("text"),
        )
        with open(os.path.join(out, "jumlah_dokumen.txt")) as f:
            n = int(f.read().strip())
        feats = tfidf_long(
            docs,
            n_docs=n,
            min_df=args.min_df,
            max_df=args.max_df,
            max_features=args.max_features,
        )
        write_parquet(feats, os.path.join(out, "features"))
        print(json.dumps({"stage": 2, "n_docs": n, "feature_rows": feats.count()}))
    elif args.algorithm in (4, 5, 6, 7, 8):
        if not args.input:
            print(f"error: -a {args.algorithm} requires -i <input.parquet>", file=sys.stderr)
            return 2
        runner = {
            4: _run_dedup,
            5: _run_text_analysis,
            6: _run_similarity,
            7: _run_corpus_prep,
            8: _run_bpe,
        }[args.algorithm]
        print(json.dumps(runner(spark, args, out)))
    else:
        from .operators.kmeans import kmeans

        feats = spark.read.parquet(os.path.join(out, "features"))
        res = kmeans(spark, feats, k=args.k, max_iter=args.m, seed=args.seed)
        write_parquet(res.assignments, os.path.join(out, "clusters"))
        print(
            json.dumps(
                {
                    "stage": 3,
                    "iterations": res.iterations,
                    "converged": res.converged,
                    "sse": {str(c): s for c, s in sorted(res.sse.items())},
                }
            )
        )
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
