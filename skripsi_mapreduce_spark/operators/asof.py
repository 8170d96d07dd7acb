"""As-of (most-recent-at-or-before) join — an operator Spark lacks
natively, composed from union + ordered window per the engine's
custom-operator preference order (SURVEY.md §4.3: built-in composition
before Pandas UDFs).

Shape: for every left row, attach the greatest right-side timestamp
<= the left timestamp within the same key. Implementation: tag both
sides, union, and take ``last(right_ts, ignorenulls)`` over a window
ordered by (ts, side) — right rows sort before left rows at equal ts, so
the match is inclusive, exactly DuckDB's ``ASOF JOIN ... ON l.ts >=
r.ts`` semantics.

Scale: ONE shuffle (the window partition by key), state per partition is
one key's rows; no range-join explosion, no per-row subquery. This is
the standard log-enrichment primitive (attach latest dimension version /
last heartbeat / previous event of another type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
    right_tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the most recent ``right`` row
    (same ``key``, right.ts <= left.ts). Unmatched left rows keep NULLs.

    ``right_value_cols`` are the right-side columns to carry (default:
    just the timestamp, as ``ts + suffix``).

    Tie policy: when several right rows share the maximal timestamp, the
    one with the greatest ``right_tiebreak_col`` wins (pass a unique
    right-side key for full determinism). Without a tiebreak column the
    winner among equal-ts right rows is shuffle-order-dependent — the
    matched TIMESTAMP is still deterministic, but carried value columns
    are not."""
    if right_value_cols is None:
        right_value_cols = []
    tb_type = (
        right.schema[right_tiebreak_col].dataType if right_tiebreak_col else None
    )
    lcols = left.columns
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("_r_ts"),
        (F.lit(None).cast(tb_type) if tb_type else F.lit(0)).alias("_tb"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        F.col(ts).alias("_r_ts"),
        (F.col(right_tiebreak_col) if right_tiebreak_col else F.lit(0)).alias("_tb"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left at equal ts (inclusive match); among
    # right rows with equal ts the tiebreak orders them so last() is the
    # greatest-tiebreak row
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "_side",
        "_l",
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"{ts}{suffix}"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
    )
    out = filled.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        f"{ts}{suffix}",
        *[f"{c}{suffix}" for c in right_value_cols],
    )
    return out
