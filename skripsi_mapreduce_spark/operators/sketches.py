"""Deterministic cardinality / frequency sketches — the approximate
counting layer a 100 TB pipeline runs BEFORE committing to exact
aggregation (how many distinct URLs per domain? which tokens are heavy
hitters?), sized so the sketch state is constant per group regardless of
corpus size.

Both sketches replace engine-native randomness with the repo's md5
integer draw (operators/pipeline._draw60 convention), so every counter
and every estimate is a pure function of the data — reproducible across
runs, partitionings, retries, and engines, and therefore hash-matchable
against a DuckDB oracle stating the same arithmetic (unlike
``approx_count_distinct``'s HLL++, whose binary state is engine-private).

- KMV (k minimum values / bottom-k) distinct estimator: per group keep
  the k smallest 60-bit hash draws of the keys; with h_k = the k-th
  smallest normalized to (0,1], estimate D = (k-1)/h_k (Bar-Yossef et
  al. 2002, the classic KMV form). Exact below k (the sketch holds every
  key), unbiased-ish above with rel. error ~ 1/sqrt(k-2).
- Count-min sketch (Cormode & Muthukrishnan 2005): d independent hash
  rows of w counters; point estimate = min over rows. Counters are ONE
  ``groupBy(row, col).count()`` — the whole sketch is d*w rows and
  estimation is a broadcast join against it.

Scale notes. KMV: the only shuffle is a distinct + a per-group window
over DISTINCT keys; state per group is the key set (the same bound any
exact count-distinct pays) but the *output* is k values — at true scale
swap the window for a per-partition bottom-k partial aggregate; the
estimator arithmetic is unchanged. CMS: two hash aggregations, one of
them over a key space capped at d*w — scan-speed at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io import local_df

from ..functions.numeric import e_int

_SIXTY = float(1 << 60)  # 1152921504606846976


def _draw60_expr(col: F.Column, salt: str) -> F.Column:
    """60-bit uniform integer draw, pure function of (salt, value) —
    same construction as operators/pipeline._draw60."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns ``(group_col, n_exact, est_e4)`` — the exact distinct count
    (for free: it's the window frame size) and the KMV estimate as an
    e4-scaled BIGINT. Groups with fewer than k distinct keys report the
    exact count (the sketch degenerates to the full key set — standard
    KMV behavior).

    Determinism: rows ordered by (draw, key) so equal draws (md5
    collisions) can't flip which hash is "k-th"; the estimate divides
    the same integer literals in every engine.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    pairs = df.select(F.col(group_col), F.col(key_col)).distinct()
    h = _draw60_expr(F.col(key_col), salt)
    w_rank = Window.partitionBy(group_col).orderBy("h", key_col)
    w_all = Window.partitionBy(group_col)
    ranked = pairs.select(
        group_col,
        F.col(key_col),
        h.alias("h"),
    ).select(
        group_col,
        "h",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n_exact"),
    )
    kth = ranked.filter(
        (F.col("rn") == F.lit(k))
        | ((F.col("n_exact") < F.lit(k)) & (F.col("rn") == F.col("n_exact")))
    )
    est = F.when(
        F.col("n_exact") >= F.lit(k),
        F.lit(float(k - 1) * _SIXTY) / F.col("h").cast("double"),
    ).otherwise(F.col("n_exact").cast("double"))
    return kth.select(
        group_col,
        F.col("n_exact").cast("bigint").alias("n_exact"),
        e_int(est, 4).alias("est_e4"),
    )


def cms_counters(
    items: DataFrame,
    item_col: str = "word",
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Build the count-min counter table over an item stream (one row
    per occurrence): ``(r, c, cnt)`` with r in [0, d) and c in [0, w).
    One explode (×d) + one hash aggregate whose key space is capped at
    d*w — the sketch stays 4096 rows no matter the corpus size."""
    rows = items.select(
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r"),
        F.col(item_col).alias("item"),
    ).select(
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(salt),
                            F.col("r").cast("string"),
                            F.lit(":"),
                            F.col("item"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % w
        ).alias("c"),
    )
    return rows.groupBy("r", "c").agg(F.count("*").cast("bigint").alias("cnt"))


def cms_estimate(
    probes: DataFrame,
    counters: DataFrame,
    item_col: str = "word",
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate each probe item's frequency from the counter
    table: min over the d rows' counters at the item's columns. The
    counter table is ≤ d*w rows — broadcast, so estimation is a narrow
    map-side join however many probes arrive."""
    cells = probes.select(
        F.col(item_col),
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r"),
    ).select(
        item_col,
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(salt),
                            F.col("r").cast("string"),
                            F.lit(":"),
                            F.col(item_col),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % w
        ).alias("c"),
    )
    joined = cells.join(F.broadcast(counters), ["r", "c"], "left").select(
        item_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy(item_col).agg(F.min("cnt").cast("bigint").alias("n_est"))


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch: ``(q_e4, est_e4)``.

    The sketch state is ONE bounded hash aggregate — n_bins integer
    counters over fixed [lo, hi) bins (out-of-range values clamp to the
    edge bins) — so it merges across partitions/files/days by plain
    addition, the property approx quantiles need at 100 TB (exact
    interpolated quantiles, entry q32, need a full sort per probe).
    Estimates interpolate linearly inside the containing bin at
    continuous rank r = q·(N−1).

    Unlike approx_percentile's engine-private GK/KLL state, every number
    here is a pure function of the data: integer counters plus double
    arithmetic written in the same shape on both engines, so the DuckDB
    oracle reproduces the estimates bit-for-bit. The bin-locate step runs
    on the collected counter table (≤ n_bins rows — bounded like the
    k-centroid collects); the estimate arithmetic itself is engine-side
    Column math so no Python float enters the hash surface."""
    if not (hi > lo and n_bins >= 1):
        raise ValueError("need hi > lo and n_bins >= 1")
    width = (hi - lo) / n_bins
    b = F.floor((F.col(value_col).cast("double") - F.lit(float(lo))) / F.lit(width))
    b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b.cast("int")))
    counts = {
        r["bin"]: r["cnt"]
        for r in df.select(b.alias("bin")).groupBy("bin").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    n = sum(counts.values())
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame([], "q_e4 bigint, est_e4 bigint")
    cum = 0
    edges = []  # (bin, cnt, cum_before)
    for bin_ in sorted(counts):
        edges.append((bin_, counts[bin_], cum))
        cum += counts[bin_]
    rows = []
    for q in qs:
        r = q * float(n - 1)  # continuous rank; same double op as the oracle
        for bin_, cnt, cum_before in edges:
            if r >= float(cum_before) and r < float(cum_before + cnt):
                rows.append((float(q), r, bin_, cnt, cum_before))
                break
    lit = local_df(
        spark, rows, "q double, r double, bin int, cnt bigint, cum_before bigint"
    )
    est = F.lit(float(lo)) + (
        F.col("bin").cast("double")
        + (F.col("r") - F.col("cum_before").cast("double")) / F.col("cnt").cast("double")
    ) * F.lit(width)
    return lit.select(
        e_int(F.col("q"), 4).alias("q_e4"), e_int(est, 4).alias("est_e4")
    )


# ---------------------------------------------------------------------------
# Bloom filter membership sketch (round 4)
# ---------------------------------------------------------------------------
def bloom_position_cols(key: F.Column, m: int, k: int, salt: str = "bloom") -> list[F.Column]:
    """The ``k`` bit positions of ``key`` in an ``m``-bit Bloom filter —
    each an independent md5 draw (salted ``{salt}{j}``) reduced mod m.
    Pure function of (salt, key): reproducible across engines, so the
    whole filter is SQL-replayable (unlike Spark's native
    ``BloomFilterAggregate``, whose bit layout is engine-private)."""
    return [(_draw60_expr(key, f"{salt}{j}") % m).alias(f"pos{j}") for j in range(k)]


def bloom_build(
    df: DataFrame,
    key_col: str,
    m: int = 16384,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Build the filter as its SET-BIT table: one row per distinct set
    position (``pos: bigint``, at most min(m, k·n) rows regardless of
    input size — the sketch property).

    Scale: positions are narrow expressions over the scan; the distinct
    is an m-bounded aggregate. A production deployment folds this row
    set into an m-bit binary bitmap (``collect_set`` per 64-bit word or
    the native BloomFilterAggregate) and broadcasts ~m/8 bytes; the
    row-set form keeps every bit SQL-visible for adjudication while
    costing the same bounded shuffle."""
    keys = df.select(F.col(key_col).cast("string").alias("_k")).distinct()
    pos = keys.select(
        F.explode(F.array(*bloom_position_cols(F.col("_k"), m, k, salt))).alias("pos")
    )
    return pos.distinct()


def bloom_probe(
    bits: DataFrame,
    probe_df: DataFrame,
    key_col: str,
    m: int = 16384,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Probe: a key is (probably) a member iff ALL ``k`` of its positions
    are set. Returns one row per distinct probe key with ``hit`` (int
    0/1). The bit table is broadcast (≤ m rows) — the probe is a
    map-side join against the scan, the exact shape a 100 TB
    contamination / join-pruning pre-filter needs."""
    keys = probe_df.select(F.col(key_col).cast("string").alias("_k")).distinct()
    probes = keys.select(
        "_k", F.explode(F.array(*bloom_position_cols(F.col("_k"), m, k, salt))).alias("pos")
    )
    marked = probes.join(
        F.broadcast(bits.withColumn("_set", F.lit(1))), "pos", "left"
    ).select("_k", F.coalesce(F.col("_set"), F.lit(0)).alias("_set"))
    return marked.groupBy("_k").agg(F.min("_set").cast("int").alias("hit"))


def kmv_bottomk(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """The KMV sketch ITSELF (not just its estimate): per group, the k
    smallest (draw, key) pairs — ``(group_col, h, key)`` rows. This is
    the state a distributed system ships between nodes; see
    :func:`kmv_merge` for the union operation."""
    pairs = df.select(F.col(group_col), F.col(key_col).alias("_key")).distinct()
    ranked = pairs.select(
        group_col, "_key", _draw60_expr(F.col("_key"), salt).alias("h")
    ).withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy(group_col).orderBy("h", "_key")),
    )
    return ranked.filter(F.col("_rn") <= k).select(group_col, "h", "_key")


def kmv_merge(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge per-group KMV sketches into ONE sketch of the union and
    estimate its distinct count: bottom-k of the union of the groups'
    bottom-k sets. EXACT identity, not approximation-on-approximation —
    every element of the union's true bottom-k is necessarily in its own
    group's bottom-k, so merging sketch states loses nothing (the
    property that lets a 1000-executor job combine per-partition
    sketches into the global answer). Returns one row
    ``(n_sketch_rows, est_e4)``; the estimate is the same (k-1)·2^60/h_k
    arithmetic as :func:`kmv_distinct`, degenerating to the row count
    below k."""
    u = sketches.select("h", "_key").distinct()
    kth = (
        u.orderBy("h", "_key")
        .limit(k)
        .withColumn("_rn", F.row_number().over(Window.orderBy("h", "_key")))
    )
    agg = kth.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.max(F.when(F.col("_rn") == k, F.col("h"))).alias("h_k"),
    )
    est = F.when(
        F.col("n_rows") >= k,
        F.lit(float(k - 1) * _SIXTY) / F.col("h_k").cast("double"),
    ).otherwise(F.col("n_rows").cast("double"))
    return agg.select(
        F.col("n_rows").alias("n_sketch_rows"), e_int(est, 4).alias("est_e4")
    )


def kmv_intersect(sk_a: DataFrame, sk_b: DataFrame, k: int = 64) -> DataFrame:
    """Theta-sketch-style INTERSECTION estimate from two
    :func:`kmv_bottomk` states (same salt, so a key draws the same h on
    both sides): θ = min of the two sketches' thresholds (the k-th
    smallest draw, or 2^60 when a sketch holds its full set), the
    common keys with h < θ form an unbiased uniform sample of A ∩ B at
    rate θ/2^60, and the estimate is |common| · 2^60 / θ. Degenerates
    to the EXACT intersection count when both inputs are below k (θ =
    2^60 keeps every common key). This is the set-operation companion
    to :func:`kmv_merge`'s union: ship two bottom-k states anywhere,
    intersect without touching the raw data — audience-overlap /
    contamination-rate analytics at 100 TB move k rows per side.

    Returns one row (n_common, est_e4)."""
    # Each sketch lineage feeds theta AND the common join AND (via the
    # re-join) the estimate — pin both states once instead of replaying
    # the upstream distinct+window scan per reference.
    sk_a = sk_a.localCheckpoint(eager=False)
    sk_b = sk_b.localCheckpoint(eager=False)
    full = F.lit(1 << 60).cast("long")

    def _theta(sk: DataFrame):
        return sk.agg(
            F.when(F.count("*") >= k, F.max("h")).otherwise(full).alias("th")
        )

    theta = (
        _theta(sk_a)
        .crossJoin(_theta(sk_b).withColumnRenamed("th", "th_b"))
        .select(F.least("th", "th_b").alias("theta"))
    )
    common = sk_a.select("h", "_key").join(sk_b.select("h", "_key"), ["h", "_key"])
    agg = (
        common.crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    # theta re-joined after the aggregate: a COUNT over zero rows still
    # yields its one row, so the estimate stays defined for empty A ∩ B
    return agg.crossJoin(F.broadcast(theta)).select(
        "n_common",
        e_int(
            F.col("n_common").cast("double") * _SIXTY / F.col("theta").cast("double"),
            4,
        ).alias("est_e4"),
    )
