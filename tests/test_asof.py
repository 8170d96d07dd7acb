"""As-of join unit semantics: inclusive at-or-before match, NULL when no
prior right row, per-key isolation."""

from __future__ import annotations

import datetime as dt

from skripsi_mapreduce_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(20)), (3, 2, _ts(5)), (4, 3, _ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(15)), (2, _ts(6)), (3, _ts(1))],
        "user_id long, ts timestamp",
    )
    out = {
        r["event_id"]: r["ts_asof"]
        for r in asof_join(left, right, key="user_id", ts="ts").collect()
    }
    assert out[1] == _ts(10)  # inclusive: right row at the same instant matches
    assert out[2] == _ts(15)  # most recent at-or-before, not just any
    assert out[3] is None  # right row is later -> no match
    assert out[4] == _ts(1)  # keys don't leak across users


def test_asof_tiebreak_determinism(spark):
    """Several right rows share the maximal ts: with a tiebreak column the
    carried value is the greatest-tiebreak row's, deterministically."""
    left = spark.createDataFrame(
        [(1, 1, _ts(20))], "event_id long, user_id long, ts timestamp"
    )
    rows = [(1, _ts(10), i, f"v{i}") for i in range(50)]
    right = spark.createDataFrame(
        rows, "user_id long, ts timestamp, rid long, val string"
    ).repartition(8)
    for _ in range(3):
        out = asof_join(
            left,
            right,
            key="user_id",
            ts="ts",
            right_value_cols=["val"],
            right_tiebreak_col="rid",
        ).collect()
        assert len(out) == 1
        assert out[0]["ts_asof"] == _ts(10)
        assert out[0]["val_asof"] == "v49"  # greatest rid wins, every run
