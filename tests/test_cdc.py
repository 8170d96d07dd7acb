"""Changelog compaction semantics (operators/cdc.py): latest-version
snapshots and MERGE-style upsert application."""

from __future__ import annotations

from skripsi_mapreduce_spark.operators.cdc import apply_changes, latest_snapshot


def test_latest_snapshot_picks_greatest_version(spark):
    rows = [
        # (key, ts, seq, val) — key 1 has three versions, ts tie on the
        # last two broken by seq
        (1, 10, 1, "a"),
        (1, 20, 2, "b"),
        (1, 20, 3, "c"),
        (2, 5, 1, "x"),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "seq", "val"])
    out = {r["k"]: (r["ts"], r["seq"], r["val"]) for r in
           latest_snapshot(df, ["k"], ts_col="ts", tiebreak=["seq"]).collect()}
    assert out == {1: (20, 3, "c"), 2: (5, 1, "x")}


def test_latest_snapshot_is_partial_aggregate_not_window_sort(spark):
    df = spark.createDataFrame([(1, 10, 1, "a")], ["k", "ts", "seq", "val"])
    plan = latest_snapshot(df, ["k"], ts_col="ts", tiebreak=["seq"])._jdf.queryExecution().executedPlan().toString()
    # the point of max_by over row_number: one hash aggregate with a
    # map-side partial, no Window (which would sort every key's versions)
    assert "Window" not in plan
    assert "partial_max_by" in plan or "HashAggregate" in plan


def test_apply_changes_upserts_and_deletes(spark):
    snap = spark.createDataFrame(
        [(1, 0, "old1"), (2, 0, "old2"), (3, 0, "old3")], ["k", "ts", "val"]
    )
    changes = spark.createDataFrame(
        [
            (1, 5, "new1a", "U"),
            (1, 9, "new1b", "U"),  # later change wins
            (3, 7, None, "D"),     # delete key 3
            (4, 2, "ins4", "I"),   # brand-new key
        ],
        ["k", "ts", "val", "op"],
    )
    out = {r["k"]: r["val"] for r in
           apply_changes(snap, changes, ["k"], ts_col="ts").collect()}
    assert out == {1: "new1b", 2: "old2", 4: "ins4"}


def test_apply_changes_change_beats_snapshot_regardless_of_ts(spark):
    # snapshot carries a LATER ts than the change; the change still wins —
    # snapshot rows are version -infinity by contract
    snap = spark.createDataFrame([(1, 100, "snap")], ["k", "ts", "val"])
    changes = spark.createDataFrame([(1, 5, "chg", "U")], ["k", "ts", "val", "op"])
    out = apply_changes(snap, changes, ["k"], ts_col="ts").collect()
    assert [(r["k"], r["val"]) for r in out] == [(1, "chg")]
