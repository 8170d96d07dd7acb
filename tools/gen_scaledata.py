"""Generate LOCAL scaling-curve data (documents + embeddings) beyond the
driver-provided sf0.1 — evidence for the 100 TB extrapolations in
SCALING.md (the r3 verdict: "everything is measured at sf0.1 only").

Matches the driver generator's observed statistics at sf0.1 (seed=42,
deterministic):

- ``documents``: doc length ~ Uniform(10, 100) tokens drawn uniformly
  from the same 30-word vocabulary; lang marginals (en 40%, de/es/fr/zh
  15%); 20 uniform sources; ~5% of docs are near-copies of an earlier doc
  (identical text + " dup" suffix — the structure dedup operators find at
  sf0.1) and a handful are exact copies.
- ``embeddings``: 64-dim float32, unit-norm, 10 labels with tiny
  cluster structure (centroid norm ~0.07, residual std ~0.125) — i.e.
  near-isotropic Gaussian on the sphere, as observed.

Row counts extrapolate the driver's line: n_docs = 50000*sf,
n_emb = 20000*sf.

Usage: python tools/gen_scaledata.py 0.5 [outdir]   (default
.scaling/sf{sf} under the repo root). NOT driver data — never used for
correctness adjudication, only wall-time-vs-sf measurements.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.05:
            # near-copy of an earlier doc, marked with the trailing token
            src = int(rng.integers(0, i))
            base = texts[src]
            texts.append(base + " dup" if r >= 0.002 else base)
        else:
            ln = int(rng.integers(10, 101))
            idx = rng.integers(0, len(VOCAB), size=ln)
            texts.append(" ".join(VOCAB[j] for j in idx))
        langs.append(LANGS[int(rng.choice(len(LANGS), p=LANG_P))])
        sources.append(f"src{int(rng.integers(0, 20))}")
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator, dim: int = 64, k: int = 10) -> pa.Table:
    centroids = rng.normal(0.0, 0.07 / np.sqrt(dim) * np.sqrt(dim), size=(k, dim))
    centroids *= 0.07 / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-9)
    labels = rng.integers(0, k, size=n)
    vecs = centroids[labels] + rng.normal(0.0, 0.125, size=(n, dim))
    # ~2% planted near-duplicates (tiny perturbations of an earlier
    # vector) so the near-dup operators have positives to verify, like
    # the driver data at sf0.1
    n_dup = n // 50
    if n_dup:
        src = rng.integers(0, n, size=n_dup)
        dst = rng.integers(0, n, size=n_dup)
        vecs[dst] = vecs[src] + rng.normal(0.0, 0.002, size=(n_dup, dim))
        labels[dst] = labels[src]
    vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-9)
    emb = pa.array(list(vecs.astype(np.float32)), pa.list_(pa.float32()))
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": emb,
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def gen_documents_zipf(
    n: int, rng: np.random.Generator, vocab_size: int = 50_000, a: float = 1.1
) -> pa.Table:
    """Long-tail corpus for the prefix-filter experiments: the 30-word
    uniform vocabulary of :func:`gen_documents` makes EVERY shingle hot
    (the degenerate case where a frequency-ordered prefix filter cannot
    prune — dedup.prefix_candidates' documented loss). Real text is
    zipfian: here word ranks draw from p_i ∝ (i+1)^-a over a 50k-word
    vocabulary, so most shingles in a document are RARE and the rarest-
    first prefix collides almost only on true near-duplicates. Same
    near-dup structure as gen_documents (~5% near-copies via a trailing
    token, a few exact copies)."""
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    p = ranks ** -a
    p /= p.sum()
    lens = rng.integers(10, 101, size=n)
    all_tokens = rng.choice(vocab_size, size=int(lens.sum()), p=p)
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.05:
            src = int(rng.integers(0, i))
            texts.append(texts[src] + " dup" if r >= 0.002 else texts[src])
        else:
            texts.append(" ".join(f"w{t}" for t in all_tokens[offs[i] : offs[i + 1]]))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_events(n: int, rng: np.random.Generator) -> pa.Table:
    """Matches the driver's events at sf0.1 (100k rows, 1500 users ≈ 67
    events/user, ts uniform over Jan 2024, value ~ U(0, 560) at 2dp,
    5 uniform event types, props = {"k": int})."""
    n_users = max(int(n * 0.015), 1)
    base_us = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = base_us + rng.integers(0, span_us, size=n)
    types = np.array(["click", "view", "purchase", "signup", "error"])
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
            "event_type": pa.array(types[rng.integers(0, 5, size=n)], pa.string()),
            "value": pa.array(np.round(rng.uniform(0, 560, size=n), 2), pa.float64()),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n)], pa.string()
            ),
        }
    )


def _days(rng: np.random.Generator, n: int, start: str, span_days: int):
    base = np.datetime64(f"{start}T00:00:00", "us").astype(np.int64)
    day_us = 24 * 3600 * 1_000_000
    return pa.array(
        base + rng.integers(0, span_days, size=n) * day_us, pa.timestamp("us")
    )


def gen_tpch(sf: float, rng: np.random.Generator, out: str) -> None:
    """Slimmed TPC-H facts/dims matched to the driver's shapes at sf0.1
    (lineitem 6M·sf, orders 1.5M·sf, customer 150k·sf, supplier 10k·sf;
    same columns, dtypes, value ranges). Wall-time evidence only — the
    correctness oracles always run on the driver's own data."""
    n_li, n_o, n_c, n_s = (
        int(6_000_000 * sf), int(1_500_000 * sf), int(150_000 * sf), int(10_000 * sf)
    )
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int64()),
    }), os.path.join(out, "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": pa.array(
            ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"], pa.string()),
    }), os.path.join(out, "region.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(1, n_s + 1), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(1, n_s + 1)], pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n_s), pa.int64()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, size=n_s), 2), pa.float64()),
    }), os.path.join(out, "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(1, n_c + 1), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(1, n_c + 1)], pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n_c), pa.int64()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, size=n_c), 2), pa.float64()),
        "c_mktsegment": pa.array(
            np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])[
                rng.integers(0, 5, size=n_c)
            ], pa.string()),
    }), os.path.join(out, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(1, n_o + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_c + 1, size=n_o), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.choice(3, size=n_o, p=[0.49, 0.49, 0.02])],
            pa.string()),
        "o_totalprice": pa.array(np.round(rng.uniform(900, 500000, size=n_o), 2), pa.float64()),
        "o_orderdate": _days(rng, n_o, "1995-01-01", 2400),
        "o_orderpriority": pa.array(
            np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])[
                rng.integers(0, 5, size=n_o)
            ], pa.string()),
    }), os.path.join(out, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(1, n_o + 1, size=n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(1, int(200_000 * sf) + 2, size=n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_s + 1, size=n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, size=n_li).astype(np.int32), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, size=n_li).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, size=n_li), 2), pa.float64()),
        "l_discount": pa.array(np.round(rng.integers(0, 11, size=n_li) / 100.0, 2), pa.float64()),
        "l_tax": pa.array(np.round(rng.integers(0, 9, size=n_li) / 100.0, 2), pa.float64()),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, size=n_li)], pa.string()),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, size=n_li)], pa.string()),
        "l_shipdate": _days(rng, n_li, "1995-01-02", 2450),
    }), os.path.join(out, "lineitem.parquet"))
    n_p = int(200_000 * sf)
    adjs = np.array(["blue", "cold", "hot", "large", "new", "old", "red", "small"])
    nouns = np.array(["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"])
    names = np.char.add(np.char.add(adjs[rng.integers(0, 8, size=n_p)], " "),
                        nouns[rng.integers(0, 8, size=n_p)])
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(n_p), pa.int64()),
        "p_name": pa.array(names, pa.string()),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, size=n_p)], pa.string()),
        "p_type": pa.array(np.char.add("TYPE_", rng.integers(0, 150, size=n_p).astype(str)), pa.string()),
        "p_size": pa.array(rng.integers(1, 51, size=n_p).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, size=n_p), 2), pa.float64()),
    }), os.path.join(out, "part.parquet"))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--zipf"]
    zipf = "--zipf" in sys.argv[1:]
    sf = float(args[0]) if args else 0.5
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    default = os.path.join(root, ".scaling", f"{'zipf' if zipf else 'sf'}{sf}")
    out = args[1] if len(args) > 1 else default
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    if zipf:
        n_docs = int(50000 * sf)
        pq.write_table(gen_documents_zipf(n_docs, rng), os.path.join(out, "documents.parquet"))
        print(f"wrote {out}: zipf documents={n_docs}")
        return
    n_docs, n_emb, n_ev = int(50000 * sf), int(20000 * sf), int(1_000_000 * sf)
    pq.write_table(gen_documents(n_docs, rng), os.path.join(out, "documents.parquet"))
    pq.write_table(gen_embeddings(n_emb, rng), os.path.join(out, "embeddings.parquet"))
    pq.write_table(gen_events(n_ev, rng), os.path.join(out, "events.parquet"))
    gen_tpch(sf, rng, out)
    print(
        f"wrote {out}: documents={n_docs} embeddings={n_emb} events={n_ev} "
        f"lineitem={int(6_000_000 * sf)}"
    )


if __name__ == "__main__":
    main()
