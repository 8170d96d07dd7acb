"""Cross-engine exact numeric helpers.

``ROUND(x, d)`` on a DOUBLE diverges between engines at non-representable
half-boundaries: Spark rounds the shortest decimal representation
(HALF_UP on ``Double.toString``), DuckDB rounds the binary value —
``round(0.285, 2)`` gives 0.29 on Spark, 0.28 on DuckDB. The divergence
can only fire when the value's shortest representation lands exactly on a
half at ``d`` digits, which happens for small-rational ratios (averages,
Jaccard, count ratios: e.g. 3/160 = 0.01875) but has probability ~0 for
irrational outputs (sqrt/ln/exp/cosine) whose shortest representation
carries ~17 digits.

The exact fix: round AFTER scaling to an integer. Half-INTEGERS are
exactly representable as doubles, so scale-0 rounding coincides in every
engine (Spark's shortest-repr of a double that is exactly k+0.5 IS
"k.5", and both engines round halves away from zero); the rescale by
10^-d is then exact in decimal, and within 1 ulp — hence cast-exact — in
double. Both sides MUST use the same formula: the scaled product is the
identical IEEE double in each engine, so the integer it rounds to is
identical too.

SQL twin (DuckDB):
    CAST(CAST(CAST(ROUND((x) * 10000) AS BIGINT) AS DECIMAL(24,4))
         / 10000 AS DECIMAL(20,4))

Python twin (for pure-Python test oracles):
    int(Decimal(x * 10**d).to_integral_value(ROUND_HALF_UP)) / 10**d
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_exact_double(col: Column, dp: int = 4) -> Column:
    """Exact cross-engine ROUND(col, dp) for DOUBLE ratios, as a DOUBLE.

    ``round(col * 10^dp)`` at scale 0 (engine-exact, see module doc),
    then a double division by 10^dp — the result is the double nearest
    k/10^dp, which casts to DECIMAL exactly (Spark casts via the
    shortest decimal representation).
    """
    scale = 10**dp
    return F.round(col * scale).cast("long").cast("double") / F.lit(float(scale))


def e_int(col: Column | str, dp: int = 4) -> Column:
    """Hash-surface canon: ``ROUND(x * 10^dp)::BIGINT`` (column suffix
    ``_e{dp}``). The scaled product is the identical IEEE double in every
    engine (decimal→double conversion is correctly rounded in both Spark
    and DuckDB), scale-0 rounding coincides (module doc above), and a
    BIGINT has exactly one rendering — no decimal-canonicalization hazard
    (the round-1 driver hash-failed 20 value-identical entries purely on
    Spark ``Decimal('25.0000')`` vs an oracle-side ``25.0``).

    Exact as long as |x| < 2^52 / 10^dp (~4.5e11 at dp=4) — far above any
    per-group aggregate at the tested SFs; the convention is a
    test-surface concern, production sinks keep native types."""
    col = F.col(col) if isinstance(col, str) else col
    return F.round(col.cast("double") * F.lit(float(10**dp))).cast("long")


def e_int_sql(expr: str, dp: int = 4) -> str:
    """DuckDB twin of :func:`e_int` — same double path, same rounding."""
    return f"CAST(ROUND(CAST(({expr}) AS DOUBLE) * {10**dp}) AS BIGINT)"


def rnd_exact4_sql(expr: str) -> str:
    """DuckDB-SQL twin of the 4dp exact rounding, DECIMAL(20,4) output."""
    return (
        f"CAST(CAST(CAST(ROUND(({expr}) * 10000) AS BIGINT) AS DECIMAL(24,4))"
        f" / 10000 AS DECIMAL(20,4))"
    )
