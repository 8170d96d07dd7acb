"""Scaling-curve measurement: run the dedup/ANN/clustering family at
several scale factors and print wall-time-vs-sf (evidence behind
SCALING.md's 100 TB design arguments).

Usage: python tools/scaling_run.py [sf_dir ...]
Defaults: /root/testdata/sf0.1 .scaling/sf0.5 .scaling/sf1.0

Only entries reading documents/embeddings run (the locally generated
dirs carry just those two tables). Best-of-2 per (entry, sf) after a
small-sf warm pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENTRIES = [
    "q29_exact_dedup",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "sim_topk_cosine",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "emb_kmeans",
    "kmeans_documents",
    "tfidf_longform",
    "pack_blocks",
]


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(root, ".scaling", "sf0.5"),
        os.path.join(root, ".scaling", "sf1.0"),
    ]
    from skripsi_mapreduce_spark.plans import QUERIES
    from skripsi_mapreduce_spark.session import get_spark

    spark = get_spark(
        app_name="scaling", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    for name in ENTRIES:  # warm: codegen/JIT at the smallest sf
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").count()
        except Exception as exc:  # noqa: BLE001
            print(f"# warm {name}: {exc}", file=sys.stderr)

    results: dict[str, dict[str, float]] = {}
    for d in dirs:
        sf = os.path.basename(d.rstrip("/")).replace("sf", "")
        for name in ENTRIES:
            best = None
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    n = QUERIES[name](spark, d).count()
                    el = time.perf_counter() - t0
                    best = el if best is None or el < best else best
            except Exception as exc:  # noqa: BLE001
                print(f"# {name}@{sf}: FAILED {exc}", file=sys.stderr)
                continue
            results.setdefault(name, {})[sf] = round(best, 3)
            print(f"# {name}@{sf}: {best:.3f}s rows={n}", file=sys.stderr, flush=True)
    print(json.dumps(results, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
