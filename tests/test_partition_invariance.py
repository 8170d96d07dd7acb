"""Partition-count invariance: the hash-match conventions (md5 draws,
int64/decimal-exact sums, defined tie-breaks) promise that results do
not depend on physical parallelism. This suite re-runs representative
entries under a different shuffle-partition count and asserts identical
canonical results — the regression net for any future float sum or
undefined-order leak."""

from __future__ import annotations

import pytest

from skripsi_mapreduce_spark.plans import QUERIES

from .conftest import SF_DIR, canon_result

# the entries most exposed to ordering/parallelism hazards: iterative
# algorithms, sampling, sketches, pair generation, prefix sums
ENTRIES = [
    "dedup_minhash",
    "kmeans_documents",
    "graph_components",
    "pack_blocks",
    "sketch_kmv_distinct",
    "mix_weighted_topk",
    "etl_sequential_ids",
    "sim_topk_many",
    "q49_recursive_cte",
    "dedup_group_keep",
    "dedup_incremental",
    # round 11: the hashed-embedding norm is a doc-partitioned window
    # over an int64 aggregate — invariance pins that no float sum or
    # window-order dependence leaked into the normalized values
    "emb_feature_hashing",
]


def _canon(df):
    return canon_result(df.columns, [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_to_shuffle_partitions(spark, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    base = _canon(QUERIES[name](spark, SF_DIR))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        alt = _canon(QUERIES[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert alt == base and len(base) > 0
