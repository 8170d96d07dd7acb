"""Skew mitigation primitives (SURVEY.md §7 M7).

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); these
helpers cover the two shapes AQE does not re-plan:

- ``salted_aggregate``: a groupBy whose key distribution is pathological
  (one key holding >> 1/parallelism of all rows — the reference hit
  exactly this with its doc-length shuffle key,
  MapperExtractFeatureTFIDF.java:105 / JobExtractFeature.java:178 O24).
  Two-phase: salt the key, partially aggregate per (key, salt), then
  merge per key. Correct for any algebraic aggregate given its merge
  expression.

- ``salted_broadcast_left``: replicate a SMALL right side r times so a
  salted big left side still joins completely (useful when the big side
  must stay salted for a downstream aggregation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, buckets): hash of the whole row —
    stable across retries (a rand() salt breaks task re-execution
    semantics under speculative execution)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: Callable[[], list[Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``merge_aggs()`` (a
    factory so callers can reference the partial aliases) merges across
    salts per key. Example::

        salted_aggregate(
            df, ["k"],
            [F.sum("v").alias("s"), F.count("*").alias("c")],
            lambda: [F.sum("s").alias("total"), F.sum("c").alias("n")],
        )
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs())


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Join a salted big side with a replicated-broadcast small side.

    The big side keeps its salt column (so a later groupBy(keys, _salt)
    stays skew-free); the small side is exploded x buckets and joined on
    (on + salt)."""
    big_s = with_salt(big, buckets)
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return big_s.join(F.broadcast(small_r), on + ["_salt"])
