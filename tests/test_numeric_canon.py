"""Cross-engine exactness of the scaled-BIGINT hash surface
(functions/numeric.e_int vs e_int_sql): the same input double must round
to the same integer in Spark and DuckDB, INCLUDING the half-boundary
rationals where plain ROUND(double, d) is known to diverge."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from skripsi_mapreduce_spark.functions.numeric import e_int, e_int_sql

# Adversarial corpus: every shape that has ever diverged or could.
# - small-rational ratios landing exactly on 4dp halves (3/160 = 0.01875)
# - the classic shortest-repr-vs-binary case 0.285
# - negatives (half away from zero on both engines)
# - exact halves at the scaled integer (k + 0.5) / 10^4
# - magnitudes near the 2^52/10^4 exactness bound
_rng = random.Random(42)
VALUES = (
    [3 / 160, 0.285, 7 / 32, 1 / 3, 2 / 3, 0.1, 0.12345, 1e-9, 0.0]
    + [-(3 / 160), -0.285, -12345.00005]
    + [(k + 0.5) / 10_000 for k in (0, 1, 2, 123, 9_999, 123_456)]
    + [-(k + 0.5) / 10_000 for k in (1, 123, 9_999)]
    + [p / q for p in range(1, 40) for q in (3, 7, 16, 160, 320, 2000)]
    + [_rng.uniform(-1e7, 1e7) for _ in range(200)]
    + [_rng.randint(1, 10**11) / 10**4 for _ in range(50)]
)


@pytest.mark.parametrize("dp", [4, 6])
def test_e_int_matches_duckdb_exactly(spark, dp):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(VALUES)], "i long, x double")
    got = {
        r["i"]: r["e"] for r in df.select("i", e_int(F.col("x"), dp).alias("e")).collect()
    }
    con = duckdb.connect()
    con.register("vals", __import__("pandas").DataFrame({"i": range(len(VALUES)), "x": VALUES}))
    want = {
        i: e
        for i, e in con.execute(
            f"SELECT i, {e_int_sql('x', dp)} AS e FROM vals"
        ).fetchall()
    }
    diffs = {i: (got[i], want[i], VALUES[i]) for i in want if got[i] != want[i]}
    assert not diffs, f"{len(diffs)} divergent values, first: {list(diffs.items())[:5]}"


def test_dtype_mismatches_catches_rendering_classes(spark):
    """The two external red-row classes so far were invisible to value
    comparison: round-1 DECIMAL (trailing-zero canonicalization) and
    round-2 HUGEINT (DuckDB's SUM(BIGINT) fetches as float64). The
    dtype-parity gate must flag both, plus int-vs-float kind drift, and
    stay silent on a clean surface."""
    from tests.conftest import dtype_mismatches

    con = duckdb.connect()
    df = spark.createDataFrame([(1, 2)], "k long, v long")

    # clean: BIGINT meets bigint
    assert dtype_mismatches(
        df.schema, con, "SELECT 1::BIGINT AS k, 2::BIGINT AS v"
    ) == []
    # HUGEINT (bare SUM over BIGINT) must be flagged even though values match
    bad = dtype_mismatches(df.schema, con, "SELECT 1::BIGINT AS k, SUM(2::BIGINT) AS v")
    assert bad and "HUGEINT" in bad[0]
    # DECIMAL on the oracle side
    bad = dtype_mismatches(df.schema, con, "SELECT 1::BIGINT AS k, 2.5::DECIMAL(8,2) AS v")
    assert bad and "DECIMAL" in bad[0]
    # int-vs-float kind drift
    bad = dtype_mismatches(df.schema, con, "SELECT 1::BIGINT AS k, 2.0::DOUBLE AS v")
    assert bad and "int" in bad[0] and "float" in bad[0]
    # array element kinds participate
    adf = spark.createDataFrame([([1, 2],)], "a array<long>")
    assert dtype_mismatches(adf.schema, con, "SELECT [1::BIGINT, 2::BIGINT] AS a") == []
    bad = dtype_mismatches(adf.schema, con, "SELECT [1.0::DOUBLE] AS a")
    assert bad
