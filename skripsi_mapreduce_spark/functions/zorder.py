"""Z-order (Morton) clustering keys — multi-column data skipping.

A table sorted by one column prunes scans only on that column's
predicates; interleaving the bits of several bounded integer keys into
one Morton code makes rows that are close in EVERY dimension land in
the same files, so parquet min/max footer stats skip files for
predicates on ANY of the interleaved columns. This is the standard
layout lever for 100 TB fact tables filtered along several axes
(time × entity, key × date); the write is just `orderBy(zorder_key)`,
and the benefit arrives with zero reader changes.

Pure column expressions (shifts/masks, whole-stage codegen) — no UDF,
no shuffle beyond the range sort the caller orders by.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def minmax_bucket(col: Column | str, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into ``[0, 2^bits)`` by min-max scaling —
    the bounded-integer form :func:`zorder_key` interleaves. Values at
    or beyond the bounds clamp (stats-based bounds need not be exact)."""
    c = F.col(col) if isinstance(col, str) else col
    n = (1 << bits) - 1
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi) - float(lo))
    return F.least(
        F.lit(n), F.greatest(F.lit(0), F.floor(scaled * F.lit(float(1 << bits))).cast("long"))
    )


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton code of ``len(cols)`` bounded integer columns (each in
    ``[0, 2^bits)`` — use :func:`minmax_bucket` first): bit ``b`` of
    column ``i`` lands at position ``b * n_cols + i``. Total width
    ``bits * n_cols`` must fit an int64 (≤ 62)."""
    ncols = len(cols)
    if bits * ncols > 62:
        raise ValueError(f"{bits} bits × {ncols} cols exceeds int64")
    out = F.lit(0).cast("long")
    for i, col in enumerate(cols):
        c = (F.col(col) if isinstance(col, str) else col).cast("long")
        for b in range(bits):
            out = out + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ncols + i
            )
    return out
