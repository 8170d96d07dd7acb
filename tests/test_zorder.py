"""Z-order clustering (functions/zorder.py): Morton-code correctness
against a Python twin, and the actual data-skipping claim — a
two-dimensional table written in z-order concentrates any single
dimension's range predicate into fewer files than a linear sort by the
other dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from skripsi_mapreduce_spark.functions.zorder import minmax_bucket, zorder_key


def _py_morton(vals: list[int], bits: int) -> int:
    out = 0
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * len(vals) + i)
    return out


def test_zorder_key_matches_python_twin(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=6)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_morton([x, y], 6)


def test_minmax_bucket_bounds_and_clamp(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (250.0,)], "v double")
    got = [r["b"] for r in df.select(minmax_bucket("v", 0.0, 100.0, 4).alias("b")).collect()]
    assert got[0] == 0 and got[1] == 0          # clamped low / at-lo
    assert got[2] == 8                           # midpoint -> half range
    assert got[3] == 15 and got[4] == 15         # at-hi / clamped high
    assert all(0 <= b < 16 for b in got)


def test_zorder_layout_skips_files_on_trailing_dimension(spark, tmp_path):
    """The data-skipping claim, measured: 10k uniform (x, y) points in
    64 files. Linear sort by x answers a narrow y-range from (almost)
    every file; the z-ordered layout concentrates it into strictly
    fewer — the same footer-stats pruning parquet applies at 100 TB."""
    n = 10_000
    df = (
        spark.range(n)
        .withColumn("x", (F.col("id") * 2654435761) % 1024)
        .withColumn("y", (F.col("id") * 40503) % 1024)
    )
    lin, zord = str(tmp_path / "lin"), str(tmp_path / "z")
    (
        df.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite").parquet(lin)
    )
    zkey = zorder_key(
        [minmax_bucket("x", 0, 1024, 10), minmax_bucket("y", 0, 1024, 10)], bits=10
    )
    (
        df.withColumn("_z", zkey)
        .repartitionByRange(64, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite").parquet(zord)
    )

    def files_hit(path: str) -> int:
        return (
            spark.read.parquet(path)
            .filter((F.col("y") >= 100) & (F.col("y") < 164))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    lin_files, z_files = files_hit(lin), files_hit(zord)
    assert z_files < lin_files, (z_files, lin_files)
    # and the clustered layout loses no rows
    assert spark.read.parquet(zord).count() == n


def test_zorder_key_is_bijective_and_boxed(spark):
    """Morton interleave properties pinned against a Python reference:
    (1) bijection — dim-wise bit deinterleave recovers (x, y) for every
    key; (2) box property — all codes sharing a 6-bit prefix fit in a
    32x32 box, the guarantee q53_zorder_layout adjudicates."""
    from skripsi_mapreduce_spark.functions.zorder import zorder_key

    import random

    rng = random.Random(3)
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", zorder_key(["x", "y"], bits=8).alias("z")).collect()

    def py_morton(x, y, bits=8):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    boxes = {}
    for r in rows:
        assert r["z"] == py_morton(r["x"], r["y"])
        boxes.setdefault(r["z"] >> 10, []).append((r["x"], r["y"]))
    for prefix, members in boxes.items():
        xs = [x for x, _ in members]
        ys = [y for _, y in members]
        assert max(xs) - min(xs) < 32 and max(ys) - min(ys) < 32, prefix
