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

Usage:
    python -m skripsi_mapreduce_spark -a 1 -i reviews.json -o outdir \
        --adjectives adj.txt --stopwords stopwords_en.txt
    python -m skripsi_mapreduce_spark -a 2 -o outdir -k 8
    python -m skripsi_mapreduce_spark -a 3 -o outdir -k 8 -m 10
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
    p.add_argument("-a", "--algorithm", type=int, required=True, choices=[1, 2, 3])
    p.add_argument("-k", type=int, default=8, help="number of clusters")
    p.add_argument("-m", type=int, default=10, help="max iterations (reference runs m-1)")
    p.add_argument("-name", "--name", default="job", help="job name")
    p.add_argument("--adjectives", help="vocabulary word list (adj.txt)")
    p.add_argument("--stopwords", help="stopword list (stopwords_en.txt)")
    p.add_argument("-mindf", "--min-df", type=int, default=None)
    p.add_argument("-maxdf", "--max-df", type=float, default=None)
    p.add_argument("-f", "--max-features", type=int, default=None)
    p.add_argument("-seed", "--seed", type=int, default=42)
    return p


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
