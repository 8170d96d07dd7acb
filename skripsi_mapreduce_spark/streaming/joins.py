"""Stream-stream joins (extension ST1 continued).

The batch engine joins events to events (q40 as-of, range_join); the
streaming twin is Spark's watermarked stream-stream interval join: both
sides carry event-time watermarks and the join condition bounds
right.ts to a window around left.ts, which lets the state store evict
rows once the watermark passes their eligibility window — the ONLY
formulation that survives an unbounded stream (an unbounded condition
would buffer both streams forever).

Batch parity: the same function applied to batch DataFrames produces
the identical join (the condition is ordinary column logic), which is
exactly how tests/test_streaming.py verifies it — replay the events
files through readStream and compare to the batch result.

Scale: state per key is the rows inside the watermark horizon ±
interval bound; shuffle is hash-partitioned on the join key like any
equi-join. RocksDB state store on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lo_seconds: float,
    hi_seconds: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str | None = "1 hour",
    prefix: str = "r_",
) -> DataFrame:
    """left ⋈ right on ``key`` with right.ts in
    [left.ts + lo_seconds, left.ts + hi_seconds] (event-time interval
    join). Right-side columns come back ``prefix``-renamed. Works
    identically on batch and streaming inputs; pass ``watermark=None``
    on batch frames to skip the (streaming-only) watermark declaration.
    """
    r = right.select([F.col(c).alias(prefix + c) for c in right.columns])
    if watermark is not None and left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if watermark is not None and r.isStreaming:
        r = r.withWatermark(prefix + right_ts, watermark)
    lo_us, hi_us = int(lo_seconds * 1_000_000), int(hi_seconds * 1_000_000)
    cond = (
        (F.col(key) == F.col(prefix + key))
        & (
            F.col(prefix + right_ts)
            >= F.col(left_ts) + F.expr(f"INTERVAL {lo_us} MICROSECOND")
        )
        & (
            F.col(prefix + right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {hi_us} MICROSECOND")
        )
    )
    return left.join(r, cond, "inner")
