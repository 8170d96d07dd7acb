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


def test_scd2_history_intervals(spark):
    from skripsi_mapreduce_spark.operators.cdc import scd2_history

    rows = [
        (1, "k1", 100), (2, "k1", 200), (3, "k1", 300),
        (4, "k2", 150),
    ]
    df = spark.createDataFrame(rows, "ver long, key string, ts long")
    out = {r["ver"]: r for r in scd2_history(df, ["key"], "ts", ["ver"]).collect()}
    assert (out[1]["valid_from"], out[1]["valid_to"], out[1]["is_current"]) == (100, 200, False)
    assert (out[2]["valid_from"], out[2]["valid_to"], out[2]["is_current"]) == (200, 300, False)
    assert (out[3]["valid_from"], out[3]["valid_to"], out[3]["is_current"]) == (300, None, True)
    assert (out[4]["valid_from"], out[4]["valid_to"], out[4]["is_current"]) == (150, None, True)


def test_merge_aggregates_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from skripsi_mapreduce_spark.operators.cdc import merge_aggregates

    rows = [(i % 7, i, i * 10) for i in range(200)]
    df = spark.createDataFrame(rows, "g long, i long, v long")

    def agg(d):
        return d.groupBy("g").agg(
            F.count("*").cast("bigint").alias("n"), F.sum("v").cast("bigint").alias("s")
        )

    base = agg(df.filter(F.col("i") % 3 != 0))
    delta = agg(df.filter(F.col("i") % 3 == 0))
    merged = sorted(
        (r["g"], r["n"], r["s"])
        for r in merge_aggregates(base, delta, ["g"], "n", ["s"]).collect()
    )
    full = sorted((r["g"], r["n"], r["s"]) for r in agg(df).collect())
    assert merged == full


def test_merge_aggregates_handles_new_and_untouched_groups(spark):
    from skripsi_mapreduce_spark.operators.cdc import merge_aggregates

    base = spark.createDataFrame([("a", 2, 10), ("b", 1, 5)], "g string, n long, s long")
    delta = spark.createDataFrame([("b", 3, 30), ("c", 1, 7)], "g string, n long, s long")
    out = {r["g"]: (r["n"], r["s"]) for r in merge_aggregates(base, delta, ["g"], "n", ["s"]).collect()}
    assert out == {"a": (2, 10), "b": (4, 35), "c": (1, 7)}


def test_versioned_writes_time_travel(spark, tmp_path):
    from skripsi_mapreduce_spark.io import list_versions, read_versioned, write_versioned

    root = str(tmp_path / "vtable")
    assert write_versioned(spark.range(0, 10), root) == 1
    assert write_versioned(spark.range(0, 25), root) == 2
    assert write_versioned(spark.range(0, 7), root) == 3
    assert list_versions(root) == [1, 2, 3]
    assert read_versioned(spark, root).count() == 7          # latest
    assert read_versioned(spark, root, 2).count() == 25      # time travel
    assert read_versioned(spark, root, 1).count() == 10
    import pytest

    with pytest.raises(FileNotFoundError):
        read_versioned(spark, root, 9)


def test_versioned_partial_write_is_invisible(spark, tmp_path):
    """A crashed/in-flight writer leaves a v=N dir WITHOUT Spark's
    _SUCCESS marker: it must be invisible to list_versions and to
    explicit-version reads (the 'readers never observe a half-written
    version' contract), and the next writer must allocate PAST it
    instead of colliding."""
    import os

    import pytest

    from skripsi_mapreduce_spark.io import list_versions, read_versioned, write_versioned

    root = str(tmp_path / "vtable2")
    assert write_versioned(spark.range(0, 5), root) == 1
    # simulate a crashed v=2: directory + a part file, no _SUCCESS
    os.makedirs(os.path.join(root, "v=2"))
    with open(os.path.join(root, "v=2", "part-00000.parquet"), "wb") as fh:
        fh.write(b"partial")
    assert list_versions(root) == [1]
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, root, 2)  # explicit read of the torn version
    assert read_versioned(spark, root).count() == 5  # _latest still v=1
    assert write_versioned(spark.range(0, 9), root) == 3  # skips past v=2
    assert list_versions(root) == [1, 3]
    assert read_versioned(spark, root).count() == 9


def test_versioned_visible_without_success_marker(spark, tmp_path):
    """Clusters running cloud committers with
    mapreduce.fileoutputcommitter.marksuccessfuljobs=false never write
    _SUCCESS — write_versioned's own _committed sidecar must keep those
    versions visible (simulated by deleting _SUCCESS post-write)."""
    import os

    from skripsi_mapreduce_spark.io import list_versions, read_versioned, write_versioned

    root = str(tmp_path / "vtable3")
    assert write_versioned(spark.range(0, 5), root) == 1
    assert write_versioned(spark.range(0, 8), root) == 2
    for n in (1, 2):
        os.remove(os.path.join(root, f"v={n}", "_SUCCESS"))
    assert list_versions(root) == [1, 2]
    assert read_versioned(spark, root).count() == 8
    assert read_versioned(spark, root, 1).count() == 5
