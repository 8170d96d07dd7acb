"""Prefix-filter candidate generation: losslessness property — every
pair at or above the threshold must be among the prefix candidates."""

from __future__ import annotations

from pyspark.sql import functions as F

from skripsi_mapreduce_spark.operators.dedup import (
    jaccard_pairs,
    prefix_candidates,
    shingles,
)


def test_prefix_candidates_lossless(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),
        (3, "alpha beta gamma eta theta"),
        (4, "iota kappa lambda mu nu"),
        (5, "iota kappa lambda mu xi"),
        (6, "alpha omicron pi rho sigma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(df, size=1).localCheckpoint(eager=True)
    for t in (0.5, 0.8):
        cands = {
            (r["id_a"], r["id_b"]) for r in prefix_candidates(sh, t).collect()
        }
        truth = {
            (r["id_a"], r["id_b"])
            for r in jaccard_pairs(sh).filter(F.col("jaccard") >= t).collect()
        }
        assert truth <= cands, f"t={t}: missed {truth - cands}"
        # and the filter actually prunes something at the high threshold
        all_sharing = {(r["id_a"], r["id_b"]) for r in jaccard_pairs(sh).collect()}
        if t == 0.8:
            assert len(cands) < len(all_sharing)


def test_prefix_candidates_lossless_random_corpora(spark):
    """Seeded random corpora (zipf-ish token draws so some shingles are
    hot — the case prefix filtering exists for): candidates must be a
    superset of the true >= t pairs at every threshold tried."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(2):
        rows = []
        for d in range(20):
            n = rng.randint(4, 12)
            # zipf-ish: low-index words drawn more often
            words = {vocab[min(rng.randrange(1, 31), rng.randrange(1, 31)) - 1]
                     for _ in range(n)}
            rows.append((d, " ".join(sorted(words))))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sh = shingles(df, size=1).localCheckpoint(eager=True)
        truth_all = {
            (r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(sh).collect()
        }
        for t in (0.4, 0.7, 0.9):
            cands = {
                (r["id_a"], r["id_b"]) for r in prefix_candidates(sh, t).collect()
            }
            qualifying = {p for p, j in truth_all.items() if j >= t}
            missing = qualifying - cands
            assert not missing, (trial, t, missing)
