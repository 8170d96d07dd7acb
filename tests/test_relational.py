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
