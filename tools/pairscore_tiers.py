"""Pair-scoring tier head-to-head: broadcast kernel vs distributed
join, same task, same corpus — the measurement behind SCALING.md's
round-7 table and the round-7 decision to make `pair_cosine_join` the
SemDeDup family's default scorer.

Both tiers are BIT-IDENTICAL by construction (same float64 gather, same
`_round_half_away` e8 fixed-point products, same 6dp rounding — pinned
by tests/test_dedup_similarity.py); this harness measures only the
execution shape:

- broadcast tier (`pair_cosine_pandas` under max_vectors): the vector
  table is collected and rides an sc.broadcast; the pair stream
  shuffles narrow (id, id) rows. Pays count + collect + broadcast jobs
  before the first pair scores, and holds the whole corpus driver-side.
- join tier (`pair_cosine_join`): vectors reach each pair through two
  plain equi-joins; the kernel sees only its own Arrow batch. Nothing
  is collected — the only tier that survives a corpus-scale vector
  table, and measured FASTER end-to-end on the SemDeDup shape at every
  local sf.

Runs semantic_keep end-to-end per tier (warm pass at sf0.001, best of
--reps) and verifies the two verdict sets match before reporting.

Usage: python tools/pairscore_tiers.py [emb_dir ...] [--reps N]
Defaults: /root/testdata/sf0.1 .scaling/sf0.5 .scaling/sf1.0 --reps 2
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = args or [
        "/root/testdata/sf0.1",
        os.path.join(root, ".scaling", "sf0.5"),
        os.path.join(root, ".scaling", "sf1.0"),
    ]

    from pyspark.sql import functions as F

    from skripsi_mapreduce_spark.operators import dedup as dd
    from skripsi_mapreduce_spark.operators import similarity as sim
    from skripsi_mapreduce_spark.session import get_spark

    spark = get_spark(
        app_name="pairscore-tiers",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    orig_join = sim.pair_cosine_join
    orig_pandas = sim.pair_cosine_pandas

    def forced_broadcast(pairs, emb, **kw):
        kw["max_vectors"] = 1 << 62  # pin the broadcast kernel, no fallback
        return orig_pandas(pairs, emb, **kw)

    # warm both tiers (codegen/Arrow init) at the smallest sf
    warm = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dd.semantic_keep(warm).count()
    sim.pair_cosine_join = forced_broadcast
    dd.semantic_keep(warm).count()
    sim.pair_cosine_join = orig_join

    out: dict = {}
    for d in dirs:
        sf = os.path.basename(d.rstrip("/"))
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet")).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        res: dict = {}
        verdicts: dict = {}
        for tier, patch in (("join", orig_join), ("broadcast", forced_broadcast)):
            sim.pair_cosine_join = patch
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                n = dd.semantic_keep(emb).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            res[tier] = round(best, 3)
            verdicts[tier] = sorted(
                map(tuple, dd.semantic_keep(emb).collect())
            )
        sim.pair_cosine_join = orig_join
        assert verdicts["join"] == verdicts["broadcast"], f"{sf}: tiers diverge"
        res["rows"] = len(verdicts["join"])
        out[sf] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
