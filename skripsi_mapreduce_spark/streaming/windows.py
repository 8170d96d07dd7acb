"""Streaming windows over the events table (extension ST1).

The reference is pure batch (SURVEY.md §2.5) — this module is the
engine's streaming extension, designed so every streaming aggregation has
a batch twin in plans/relational.py (Q27 tumbling, Q28 sessionization)
and the two are asserted equal in tests/test_streaming.py via a
file-source replay into a memory sink.

Watermark/late-data policy (declared): ``withWatermark(ts, '1 hour')``;
rows later than the watermark are dropped. On a real cluster the source
would be Kafka; the transformations are source-agnostic, so tests replay
the same parquet files through ``readStream``.

Scale notes: state for the tumbling window is (window x event_type) —
bounded and tiny. Session windows keep per-user open sessions; the
watermark bounds state retention, and ``session_window`` merges are
handled by Spark's state store (RocksDB-backed on a cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numeric import e_int

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos (synthetic replay files)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream (file source replay of the parquet).

    The timestamp normalization mirrors io.load_table — the generated file
    has shipped as both TIMESTAMP(NANOS) (readable only as a long) and
    TIMESTAMP(MICROS)-NTZ — so the streaming and batch inputs are identical
    row-for-row. A one-off batch read of the footer decides which variant
    is on disk; the stream then declares that schema explicitly (required
    by the file source)."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    ts_type = next(f.dataType for f in batch_schema.fields if f.name == "ts")
    raw = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        # file stream source wants a directory; select just the events file
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if isinstance(ts_type, T.LongType):  # raw nanos → integer-divide to micros
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):  # naive micros → UTC instant
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1-hour tumbling window x event_type: count + sum(value) — the
    streaming twin of Q27 (same grouping keys, same aggregates)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            e_int(F.sum(F.col("value").cast("decimal(20,4)"))).alias("total_value_e4"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("hour_epoch"),
            "event_type",
            "n",
            "total_value_e4",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding 1h/30m window x event_type — the streaming twin of
    q42_sliding_window. Each event lands in window/slide overlapping
    windows (2 here); state is (open windows x event_type), bounded by
    the watermark closing windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            e_int(F.sum(F.col("value").cast("decimal(20,4)"))).alias("total_value_e4"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start_epoch"),
            "event_type",
            "n",
            "total_value_e4",
        )
    )


def sessionized_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """session_window(ts, gap) per user — the streaming twin of Q28.

    Emits one row per closed session; per-user session counts are the
    batch-comparable projection."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("session_start"),
            F.unix_timestamp(F.col("w.end")).cast("bigint").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact deduplication — the ingestion twin of the batch
    D1 operator: keep the FIRST arrival per key (e.g. a content digest)
    and drop replays.

    ``within_watermark=True`` uses ``dropDuplicatesWithinWatermark``:
    state per key is evicted once the watermark passes its event time, so
    state is bounded by the replay horizon — the only formulation that
    survives an unbounded stream (plain dropDuplicates keeps every key
    forever). Duplicates arriving later than the watermark are NOT
    caught; that is the documented contract (late replays land in the
    batch dedup pass downstream — the standard lambda-ish split).

    Scale: state lives in the state store (RocksDB on a cluster), keyed
    by ``key_cols`` — shuffle carries digests, never documents, same as
    the batch path."""
    wm = stream.withWatermark(ts_col, watermark)
    if within_watermark:
        return wm.dropDuplicatesWithinWatermark(key_cols)
    return wm.dropDuplicates(key_cols)


def run_to_memory_sink(df: DataFrame, name: str, output_mode: str = "complete") -> DataFrame:
    """Drive a streaming aggregation over all available input synchronously
    and return the sink contents as a batch DataFrame (test/audit path)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(300)
    finally:
        q.stop()
    if not finished:
        raise TimeoutError(
            f"streaming replay '{name}' did not finish within 300s — sink is partial"
        )
    return df.sparkSession.sql(f"SELECT * FROM {name}")


from contextlib import contextmanager  # noqa: E402


@contextmanager
def state_partitions(spark: SparkSession, n: int = 8):
    """Scope ``spark.sql.shuffle.partitions`` around a streaming start.

    Streaming stateful operators instantiate one state store per shuffle
    partition PER OPERATOR STORE (a stream-stream join keeps four stores
    per partition — two per side), and each store pays provider init +
    per-batch commit regardless of how little state it holds: at toy
    replay scale 32 partitions means up to 128 stores doing ~nothing
    (measured 8.3s → 2.6s on the interval-join entry by dropping to 8).
    The knob is read at query START, so scoping the conf around
    ``run_to_memory_sink`` pins it per query without touching the rest
    of the session. Production sizes this to state volume / cluster
    cores — the default 200 (or AQE) is right at real scale; the scope
    here is a local-replay fit, not a semantic change."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def stream_to_versioned_snapshots(
    agg: DataFrame, path: str, name: str, output_mode: str = "complete"
) -> list[int]:
    """Streaming materialized view with TIME TRAVEL: drive a streaming
    aggregation and publish each micro-batch's full result as an
    immutable :func:`io.write_versioned` snapshot via ``foreachBatch`` —
    readers query ``read_versioned(path)`` for the latest consistent
    state or any past version, and never see a half-written batch (the
    pointer moves after the files commit).

    This is the maintenance loop the CDC family feeds at scale: the
    stream keeps the aggregate incrementally (state store), snapshots
    make it queryable-with-history. Returns the version numbers written
    (one per non-empty micro-batch)."""
    from ..io import write_versioned

    versions: list[int] = []

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        versions.append(write_versioned(batch_df, path))

    q = (
        agg.writeStream.outputMode(output_mode)
        .foreachBatch(publish)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(300)
    finally:
        q.stop()
    if not finished:
        raise TimeoutError(f"streaming publish '{name}' did not finish within 300s")
    return versions
