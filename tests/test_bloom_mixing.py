"""Bloom filter sketch (operators/sketches.bloom_*) and temperature
mixing (operators/pipeline.temperature_weights): known-value and
Python-twin parity tests. The cross-engine hash match for the registry
entries (sketch_bloom, mix_temperature) is pinned by the parametrized
oracle suite in test_relational.py."""

from __future__ import annotations

import hashlib
import math

from skripsi_mapreduce_spark.operators.pipeline import temperature_weights
from skripsi_mapreduce_spark.operators.sketches import bloom_build, bloom_probe

_M, _K = 1024, 4


def _positions(key, m=_M, k=_K) -> set[int]:
    return {
        int(hashlib.md5(f"bloom{j}:{key}".encode()).hexdigest()[:15], 16) % m
        for j in range(k)
    }


def test_bloom_no_false_negatives_and_python_twin(spark):
    members = spark.createDataFrame([(i,) for i in range(100)], ["key"])
    bits = bloom_build(members, "key", _M, _K)
    got = {r["pos"] for r in bits.collect()}
    want = set().union(*(_positions(i) for i in range(100)))
    assert got == want  # bit-for-bit the Python twin
    probes = spark.createDataFrame([(i,) for i in range(300)], ["key"])
    hits = {r["_k"]: r["hit"] for r in bloom_probe(bits, probes, "key", _M, _K).collect()}
    # every true member hits (the Bloom guarantee)
    assert all(hits[str(i)] == 1 for i in range(100))
    # a non-member hits iff ALL its positions happen to be set
    for i in range(100, 300):
        assert hits[str(i)] == int(_positions(i) <= want)


def test_bloom_deterministic_across_partitionings(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["key"])
    a = sorted(r["pos"] for r in bloom_build(df.repartition(13), "key", _M, _K).collect())
    b = sorted(r["pos"] for r in bloom_build(df.coalesce(1), "key", _M, _K).collect())
    assert a == b


def test_temperature_weights_python_twin(spark):
    rows = [("a", i) for i in range(400)] + [("b", i) for i in range(100)] + [
        ("c", i) for i in range(25)
    ]
    df = spark.createDataFrame(rows, ["source", "i"])
    out = {r["domain"]: r for r in temperature_weights(df, "source", 1000).collect()}
    mass = {g: round(math.sqrt(n) * 1e8) for g, n in {"a": 400, "b": 100, "c": 25}.items()}
    total = sum(mass.values())
    for g, n in {"a": 400, "b": 100, "c": 25}.items():
        w = mass[g] / total
        assert out[g]["n_docs"] == n
        assert out[g]["w_e6"] == round(w * 1e6)
        assert out[g]["expect_n"] == round(1000.0 * w)
    # α=1/2 flattens: small domains upweighted relative to size share
    assert out["c"]["w_e6"] / 1e6 > 25 / 525
    assert out["a"]["w_e6"] / 1e6 < 400 / 525
