"""Pure-Python/numpy oracles for the text pipeline and K-Means.

These independently reimplement the reference's math (SURVEY.md §2.2/§2.3):
TF-IDF == sklearn TfidfVectorizer(smooth_idf=True, norm='l2') semantics with
the \\b\\w\\w+\\b analyzer; K-Means == Lloyd's with seeded init, HALF_UP
10dp centroid rounding, exact-equality convergence, at most m-1 iterations.
"""

from __future__ import annotations

import decimal
import math
import re
import random

TOKEN_RE = re.compile(r"\b\w\w+\b")


def tokenize(text: str, stopwords=None, vocab=None) -> list[str]:
    toks = TOKEN_RE.findall(text.lower())
    if stopwords is not None:
        stop = set(stopwords)
        toks = [t for t in toks if t not in stop]
    if vocab is not None:
        v = set(vocab)
        toks = [t for t in toks if t in v]
    return toks


def _round_half_up(x: float, dp: int) -> float:
    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(f"1e-{dp}"), rounding=decimal.ROUND_HALF_UP
        )
    )


def tfidf_oracle(
    docs: dict[int, str], stopwords=None, vocab=None, round_dp: int = 6
) -> dict[tuple[int, str], float]:
    """{(doc_id, word): weight} — L2-normalized smoothed TF-IDF, sparse."""
    n = len(docs)
    tokenized = {d: tokenize(t, stopwords, vocab) for d, t in docs.items()}
    df: dict[str, int] = {}
    for toks in tokenized.values():
        for w in set(toks):
            df[w] = df.get(w, 0) + 1
    idf = {w: math.log((n + 1) / (dfw + 1)) + 1.0 for w, dfw in df.items()}
    out: dict[tuple[int, str], float] = {}
    for d, toks in tokenized.items():
        tf: dict[str, int] = {}
        for w in toks:
            tf[w] = tf.get(w, 0) + 1
        v = {w: c * idf[w] for w, c in tf.items()}
        norm = math.sqrt(sum(x * x for x in v.values()))
        for w, x in v.items():
            out[(d, w)] = _round_half_up(x / norm if norm > 0 else 0.0, round_dp)
    return out


def kmeans_oracle(
    features: dict[int, dict[str, float]], k: int, max_iter: int, seed: int = 42
):
    """Sparse Lloyd's matching operators/kmeans.py semantics exactly.

    Returns (assignments {doc: cluster}, centroids, sse, iterations,
    converged)."""
    n = len(features)
    rng = random.Random(seed)
    ids = rng.sample(range(1, n + 1), k)
    centroids = {idx: dict(features[doc]) for idx, doc in enumerate(ids)}

    def dist2(x: dict[str, float], c: dict[str, float]) -> float:
        x2 = sum(v * v for v in x.values())
        c2 = sum(v * v for v in c.values())
        dot = sum(v * c[w] for w, v in x.items() if w in c)
        return max(x2 + c2 - 2 * dot, 0.0)

    assignments: dict[int, int] = {}
    sse: dict[int, float] = {}
    iterations = 0
    converged = False
    for _ in range(max(max_iter - 1, 0)):
        iterations += 1
        assignments, sse = {}, {}
        for d, x in features.items():
            best = min(
                ((dist2(x, c), ci) for ci, c in centroids.items()),
                key=lambda t: (t[0], t[1]),
            )
            assignments[d] = best[1]
            sse[best[1]] = sse.get(best[1], 0.0) + best[0]
        new_centroids: dict[int, dict[str, float]] = {}
        counts: dict[int, int] = {}
        sums: dict[int, dict[str, float]] = {}
        for d, ci in assignments.items():
            counts[ci] = counts.get(ci, 0) + 1
            s = sums.setdefault(ci, {})
            for w, v in features[d].items():
                s[w] = s.get(w, 0.0) + v
        for ci, s in sums.items():
            new_centroids[ci] = {
                w: _round_half_up(v / counts[ci], 10) for w, v in s.items()
            }
        if all(new_centroids.get(c) == centroids[c] for c in centroids):
            centroids = new_centroids
            converged = True
            break
        centroids = new_centroids
    if not assignments:
        for d, x in features.items():
            best = min(
                ((dist2(x, c), ci) for ci, c in centroids.items()),
                key=lambda t: (t[0], t[1]),
            )
            assignments[d] = best[1]
            sse[best[1]] = sse.get(best[1], 0.0) + best[0]
    return assignments, centroids, sse, iterations, converged
