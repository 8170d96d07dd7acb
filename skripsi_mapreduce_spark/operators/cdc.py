"""Changelog compaction operators: latest-record snapshots and upsert
merge — the "merge-on-read" half every large ingest pipeline needs when
the corpus arrives as an append-only stream of record versions (CDC
feeds, recrawls, annotation fixes).

Scale notes: :func:`latest_snapshot` is a ``groupBy(keys).agg(max_by)``
— ONE hash aggregate with map-side partial combining (each task reduces
its local versions to one row per key before the shuffle), so the
exchange carries ~|distinct keys| rows, not |versions|. The window
formulation (``row_number() = 1``) would sort every key's versions
after a full shuffle; ``max_by`` needs no sort at all. That difference
is the whole game on a 100 TB changelog with a hot-key update stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """One row per key: the version with the greatest ``(ts_col,
    *tiebreak)``. Supply a ``tiebreak`` that makes the ordering unique
    (e.g. a change sequence number) — on exact ties without one, which
    version wins is nondeterministic, same as any max_by."""
    payload = [c for c in df.columns if c not in keys]
    ordk = F.struct(F.col(ts_col), *[F.col(c) for c in (tiebreak or [])])
    agg = df.groupBy(*keys).agg(F.max_by(F.struct(*payload), ordk).alias("_r"))
    return agg.select(*keys, *[F.col(f"_r.{c}").alias(c) for c in payload])


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Merge a changelog into a base snapshot (SQL MERGE semantics,
    expressed as one aggregate instead of a per-row upsert):

    - ``changes`` rows carry ``op_col`` ('I'/'U'/``delete_op``) and a
      version timestamp; the latest change per key wins over both older
      changes and the snapshot row.
    - keys whose final state is ``delete_op`` disappear from the result.
    - snapshot rows are treated as version -infinity (any change beats
      them), implemented by a 0/1 source rank below the timestamp in the
      max_by ordering — no sentinel timestamps needed.

    Columns: the snapshot must have the changes' schema minus ``op_col``.
    Result schema = snapshot schema."""
    payload = [c for c in snapshot.columns if c not in keys]
    base = snapshot.select(
        *keys, F.lit(0).alias("_src"), F.lit(None).cast("string").alias(op_col), *payload
    )
    chg = changes.select(
        *keys, F.lit(1).alias("_src"), F.col(op_col).cast("string").alias(op_col), *payload
    )
    allv = base.unionByName(chg)
    ordk = F.struct(F.col("_src"), F.col(ts_col))
    winner = allv.groupBy(*keys).agg(
        F.max_by(F.struct(op_col, *payload), ordk).alias("_r")
    )
    return (
        winner.filter(
            F.col(f"_r.{op_col}").isNull() | (F.col(f"_r.{op_col}") != delete_op)
        )
        .select(*keys, *[F.col(f"_r.{c}").alias(c) for c in payload])
    )


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: turn a changelog
    (one row per version) into validity intervals — each version valid
    from its own timestamp until the NEXT version of the same key
    (``valid_to`` NULL on the current version, ``is_current`` true).
    The warehouse-side complement of :func:`latest_snapshot` (which
    keeps only the last interval).

    Supply a ``tiebreak`` making the per-key ordering total (a change
    sequence number); exact-tie order is otherwise nondeterministic,
    same caveat as latest_snapshot.

    Scale: ONE shuffle by key (the window partition); intervals are a
    single ``lead`` pass — no self-join, no per-version scan. Output
    size = input size."""
    from pyspark.sql import Window as W

    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = W.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )


def merge_aggregates(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    count_col: str = "n",
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental maintenance of an algebraic aggregate: combine a
    materialized aggregate with the aggregate of new rows by FULL OUTER
    join + coalesced addition — the O(|delta|) path that replaces a full
    recompute (counts and sums are commutative monoids; avg/var derive
    from them downstream).

    Scale: ONE shuffle keyed by the group columns, sized by the number
    of GROUPS touched, not the fact-table row count — the whole point of
    keeping the aggregate materialized. The same shape maintains any
    merge-able state (the sketches in operators/sketches.py merge by
    integer addition too)."""
    sums = [count_col] + list(sum_cols or [])
    b = base.select(*keys, *[F.col(c).alias(f"_b_{c}") for c in sums])
    d = delta.select(*keys, *[F.col(c).alias(f"_d_{c}") for c in sums])
    j = b.join(d, keys, "full_outer")
    out_cols = [
        (
            F.coalesce(F.col(f"_b_{c}"), F.lit(0)) + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
        ).alias(c)
        for c in sums
    ]
    return j.select(*keys, *out_cols)
