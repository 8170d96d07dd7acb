"""Deterministic sketches (operators/sketches.py) and fixed-point
PageRank (operators/components.pagerank_e8): known-value and Python-twin
parity tests. The cross-engine hash match for the registry entries
(sketch_kmv_distinct, sketch_cms_topk, graph_pagerank, bpe_encode) is
pinned by the parametrized oracle suite in test_relational.py."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from skripsi_mapreduce_spark.operators.components import pagerank_e8
from skripsi_mapreduce_spark.operators.sketches import (
    cms_counters,
    cms_estimate,
    kmv_distinct,
)

SIXTY = 1 << 60


def _draw60(salt: str, value) -> int:
    h = hashlib.md5(f"{salt}:{value}".encode()).hexdigest()
    return int(h[:15], 16)


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------
def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)] + [("b", i % 3) for i in range(30)],
        ["g", "key"],
    )
    out = {r["g"]: r for r in kmv_distinct(df, "g", "key", k=64).collect()}
    assert out["a"]["n_exact"] == 10 and out["a"]["est_e4"] == 10 * 10**4
    assert out["b"]["n_exact"] == 3 and out["b"]["est_e4"] == 3 * 10**4


def test_kmv_estimate_matches_python_twin_and_is_close(spark):
    n = 2000
    df = spark.createDataFrame([("g", i) for i in range(n)], ["g", "key"])
    row = kmv_distinct(df, "g", "key", k=64).collect()[0]
    assert row["n_exact"] == n
    # Python twin: same draws, k-th smallest, same estimator arithmetic
    draws = sorted(_draw60("kmv", i) for i in range(n))
    h_k = draws[63]
    est = 63.0 * float(SIXTY) / float(h_k)
    assert row["est_e4"] == round(est * 10**4)
    # statistical sanity: rel. error ~1/sqrt(62) => well within 50%
    assert abs(row["est_e4"] / 10**4 - n) / n < 0.5


def test_kmv_deterministic_across_partitionings(spark):
    df = spark.createDataFrame([("g", i) for i in range(500)], ["g", "key"])
    a = kmv_distinct(df.repartition(17), "g", "key").collect()
    b = kmv_distinct(df.coalesce(1), "g", "key").collect()
    assert a == b


# ---------------------------------------------------------------------------
# CMS
# ---------------------------------------------------------------------------
def test_cms_estimate_upper_bounds_exact(spark):
    rows = [(w,) for w in ["x"] * 50 + ["y"] * 20 + ["z"] * 5 + list("abcdefgh")]
    items = spark.createDataFrame(rows, ["word"])
    counters = cms_counters(items, d=4, w=64)
    probes = items.distinct()
    est = {r["word"]: r["n_est"] for r in cms_estimate(probes, counters, d=4, w=64).collect()}
    exact = {r["word"]: r["cnt"] for r in items.groupBy("word").agg(F.count("*").alias("cnt")).collect()}
    for w, c in exact.items():
        assert est[w] >= c, (w, est[w], c)


def test_cms_exact_when_no_collisions(spark):
    # 3 items in a 1024-wide sketch: collision probability per row is
    # tiny, and min-over-4-rows needs a collision in EVERY row to
    # overcount — verify the estimates are exact here.
    rows = [("alpha",)] * 7 + [("beta",)] * 3 + [("gamma",)] * 11
    items = spark.createDataFrame(rows, ["word"])
    counters = cms_counters(items)
    est = {r["word"]: r["n_est"] for r in cms_estimate(items.distinct(), counters).collect()}
    assert est == {"alpha": 7, "beta": 3, "gamma": 11}


def test_cms_counter_table_is_bounded(spark):
    items = spark.createDataFrame([(f"w{i}",) for i in range(5000)], ["word"])
    counters = cms_counters(items, d=4, w=1024)
    assert counters.count() <= 4 * 1024
    total = counters.agg(F.sum("cnt")).collect()[0][0]
    assert total == 4 * 5000  # every occurrence lands in every row


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------
def _python_pagerank(edges, nodes, n_iter=3, damp=85):
    e8 = 10**8
    n = len(nodes)
    base = (100 - damp) * e8 // (100 * n)
    wout = {}
    for s, _, w in edges:
        wout[s] = wout.get(s, 0) + w
    ranks = {v: e8 // n for v in nodes}
    for _ in range(n_iter):
        s_in = {v: 0 for v in nodes}
        for s, d, w in edges:
            s_in[d] += ranks[s] * w // wout[s]
        ranks = {v: base + damp * s_in[v] // 100 for v in nodes}
    return ranks


def test_pagerank_cycle_is_uniform(spark):
    # 4-cycle: symmetry => every node keeps the same rank
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1)], ["src", "dst", "weight"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(4)], ["node"])
    out = {r["node"]: r["rank_e8"] for r in pagerank_e8(edges, nodes, n_iter=3).collect()}
    assert len(set(out.values())) == 1
    assert out[0] == _python_pagerank([(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1)], range(4))[0]


def test_pagerank_matches_python_twin(spark):
    edges_py = [
        (0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 5), (3, 0, 1), (1, 3, 1),
    ]
    edges = spark.createDataFrame(edges_py, ["src", "dst", "weight"])
    nodes = spark.createDataFrame([(i,) for i in range(5)], ["node"])  # node 4 isolated
    got = {r["node"]: r["rank_e8"] for r in pagerank_e8(edges, nodes, n_iter=3).collect()}
    want = _python_pagerank(edges_py, range(5))
    assert got == want
    # isolated node sits at the teleport base
    assert got[4] == (100 - 85) * 10**8 // (100 * 5)


def test_pagerank_sink_absorbs_rank(spark):
    # star into node 0: node 0's rank ends above everyone else's
    edges = spark.createDataFrame([(i, 0, 1) for i in range(1, 5)], ["src", "dst", "weight"])
    nodes = spark.createDataFrame([(i,) for i in range(5)], ["node"])
    out = {r["node"]: r["rank_e8"] for r in pagerank_e8(edges, nodes, n_iter=2).collect()}
    assert out[0] > max(v for k, v in out.items() if k != 0)


def test_histogram_quantiles_known_values_and_invariance(spark):
    """Uniform integers over one-unit bins: every estimate is exact
    (each bin holds one value, interpolation is within-bin identity);
    results are partition-invariant (integer counters merge by addition)
    and monotone in q."""
    from skripsi_mapreduce_spark.operators.sketches import histogram_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    out = {r["q_e4"]: r["est_e4"] for r in
           histogram_quantiles(df, "x", 0.0, 100.0, n_bins=100).collect()}
    # continuous rank r = q*99 lands inside bin floor(r); est = r exactly
    assert out[2500] == 247500   # 0.25*99 = 24.75
    assert out[5000] == 495000   # 49.5
    assert out[9900] == 980100   # 98.01
    rep = {r["q_e4"]: r["est_e4"] for r in
           histogram_quantiles(df.repartition(7), "x", 0.0, 100.0, n_bins=100).collect()}
    assert rep == out
    qs = sorted(out)
    assert all(out[a] <= out[b] for a, b in zip(qs, qs[1:]))


def test_histogram_quantiles_clamps_and_empty(spark):
    from skripsi_mapreduce_spark.operators.sketches import histogram_quantiles

    df = spark.createDataFrame([(-5.0,), (0.5,), (99.0,)], "x double")
    out = histogram_quantiles(df, "x", 0.0, 10.0, n_bins=10)
    assert out.count() == 5  # out-of-range values clamp, never drop
    empty = spark.createDataFrame([], "x double")
    assert histogram_quantiles(empty, "x", 0.0, 1.0).count() == 0


def test_kmv_intersect_exact_below_k_and_estimate(spark):
    """Intersection from sketch states: exact when both sides hold the
    full set (theta = 2^60 keeps every common key), a Python-twin-exact
    estimate when a side overflows k, and statistically sane."""
    from skripsi_mapreduce_spark.operators.sketches import kmv_bottomk, kmv_intersect

    # small sides: exact degenerate path
    df = spark.createDataFrame(
        [("a", i) for i in range(20)] + [("b", i) for i in range(10, 40)],
        ["g", "key"],
    )
    sk = kmv_bottomk(df, "g", "key", k=64)
    row = kmv_intersect(
        sk.filter(sk["g"] == "a").select("h", "_key"),
        sk.filter(sk["g"] == "b").select("h", "_key"),
        k=64,
    ).collect()[0]
    assert row["n_common"] == 10 and row["est_e4"] == 10 * 10**4

    # big sides: estimator path, pinned against the Python twin
    big = spark.createDataFrame(
        [("a", i) for i in range(1500)] + [("b", i) for i in range(500, 2000)],
        ["g", "key"],
    )
    skb = kmv_bottomk(big, "g", "key", k=64)
    row = kmv_intersect(
        skb.filter(skb["g"] == "a").select("h", "_key"),
        skb.filter(skb["g"] == "b").select("h", "_key"),
        k=64,
    ).collect()[0]
    da = sorted((_draw60("kmv", i), i) for i in range(1500))[:64]
    db = sorted((_draw60("kmv", i), i) for i in range(500, 2000))[:64]
    theta = min(da[-1][0], db[-1][0])
    common = {p for p in da if p[0] < theta} & {p for p in db if p[0] < theta}
    est = len(common) * float(SIXTY) / float(theta)
    assert row["n_common"] == len(common)
    assert row["est_e4"] == round(est * 10**4)
    # true intersection is 1000; theta sampling at k=64 is coarse
    assert 0 < row["est_e4"] / 10**4 < 3000


def test_kmv_merge_identity_vs_direct_sketch(spark):
    """Merging per-group bottom-k sketch states must equal sketching
    the union directly — exact identity, not an approximation."""
    from skripsi_mapreduce_spark.operators.sketches import (
        kmv_bottomk,
        kmv_distinct,
        kmv_merge,
    )

    rows = [("a", i) for i in range(300)] + [("b", i) for i in range(150, 600)]
    df = spark.createDataFrame(rows, ["g", "key"])
    merged = kmv_merge(kmv_bottomk(df, "g", "key", k=64), k=64).collect()[0]
    direct = kmv_distinct(
        df.selectExpr("'all' AS g", "key"), "g", "key", k=64
    ).collect()[0]
    assert merged["est_e4"] == direct["est_e4"]
    assert merged["n_sketch_rows"] == 64
    # Python twin of the union estimate
    draws = sorted(_draw60("kmv", i) for i in range(600))
    assert merged["est_e4"] == round(63.0 * float(SIXTY) / float(draws[63]) * 1e4)
