"""SparkSession factory.

Replaces the reference's hand-set Hadoop configuration (App.java:58-63:
yarn, snappy map-output compression, 3 GB containers) with a Spark-first
config: AQE on (runtime re-planning, skew-join handling, partition
coalescing), Arrow for the Python boundary, UTC session timezone so results
canonicalize identically against external oracles.

At 100 TB on a real cluster the same factory applies — only ``master``,
memory and ``spark.sql.shuffle.partitions`` change (set shuffle partitions
so post-shuffle partitions land in the 100-200 MB range; AQE coalescing
then corrects the tail).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "skripsi_mapreduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults target the local test envelope (``local[$SPARK_GRAFT_CPUS]``);
    on a cluster, pass ``master=None`` with spark-submit-provided master and
    a shuffle partition count sized to the data (e.g. ~2-3x total cores,
    with AQE coalescing trimming small partitions).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # ANSI mode off: the declared-query surface relies on permissive
        # casts matching the DuckDB oracle's implicit coercions.
        .config("spark.sql.ansi.enabled", "false")
        # io.spread_scan round-robins corpus inputs before tokenize-heavy
        # operators when the master is local (single-row-group parquet
        # scans are unsplittable); this conf is an explicit override —
        # "true" forces the spread on a cluster, "false" disables it
        # locally. Cluster scans are already parallel, so the default
        # there is the identity (the spread would be a full-text shuffle).
        .config("spark.skripsi.spreadSmallScans", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
