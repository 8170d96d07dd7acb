"""Every declared query with an oracle must hash-match DuckDB at sf0.001
(the driver re-runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from skripsi_mapreduce_spark.plans import ORACLE, QUERIES

from .conftest import SF_DIR, compare_spark_duckdb


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_duckdb(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    compare_spark_duckdb(df, ddb, ORACLE[name], name=name)


def test_every_query_has_entry():
    assert QUERIES, "query registry is empty"
    missing = set(ORACLE) - set(QUERIES)
    assert not missing, f"oracle without query impl: {missing}"
    no_oracle = set(QUERIES) - set(ORACLE)
    assert not no_oracle, f"entry without oracle (weaker driver check): {no_oracle}"


def test_rotation_lists_match_registry():
    """The adjudication rotation (plans/__init__._PROMOTED/_TAIL) only
    works if every name actually exists — a typo would silently push an
    entry out of the driver's checked window."""
    from skripsi_mapreduce_spark.plans import _PROMOTED, _TAIL

    assert set(_PROMOTED) <= set(QUERIES), set(_PROMOTED) - set(QUERIES)
    assert set(_TAIL) <= set(QUERIES), set(_TAIL) - set(QUERIES)
    assert not set(_PROMOTED) & set(_TAIL)
    # promoted entries lead the registry, so the driver's ~50-entry
    # window always adjudicates them
    assert list(QUERIES)[: len(_PROMOTED)] == [p for p in _PROMOTED if p in QUERIES]
    # the gate cuts at ~50: a longer list would document entries as
    # promoted that never actually get a fresh driver row, and a shorter
    # one wastes adjudication slots — EXACTLY 50 is the contract
    assert len(_PROMOTED) == 50, len(_PROMOTED)
