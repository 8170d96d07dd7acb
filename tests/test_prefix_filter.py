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
