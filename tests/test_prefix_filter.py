"""Prefix-filter candidate generation: losslessness property — every
pair at or above the threshold must be among the prefix candidates."""

from __future__ import annotations

from pyspark.sql import functions as F

from skripsi_mapreduce_spark.operators.dedup import (
    jaccard_pairs,
    prefix_candidates,
    shingles,
)


def test_prefix_candidates_lossless(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),
        (3, "alpha beta gamma eta theta"),
        (4, "iota kappa lambda mu nu"),
        (5, "iota kappa lambda mu xi"),
        (6, "alpha omicron pi rho sigma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(df, size=1).localCheckpoint(eager=True)
    for t in (0.5, 0.8):
        cands = {
            (r["id_a"], r["id_b"]) for r in prefix_candidates(sh, t).collect()
        }
        truth = {
            (r["id_a"], r["id_b"])
            for r in jaccard_pairs(sh).filter(F.col("jaccard") >= t).collect()
        }
        assert truth <= cands, f"t={t}: missed {truth - cands}"
        # and the filter actually prunes something at the high threshold
        all_sharing = {(r["id_a"], r["id_b"]) for r in jaccard_pairs(sh).collect()}
        if t == 0.8:
            assert len(cands) < len(all_sharing)


def test_prefix_candidates_lossless_random_corpora(spark):
    """Seeded random corpora (zipf-ish token draws so some shingles are
    hot — the case prefix filtering exists for): candidates must be a
    superset of the true >= t pairs at every threshold tried."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(2):
        rows = []
        for d in range(20):
            n = rng.randint(4, 12)
            # zipf-ish: low-index words drawn more often
            words = {vocab[min(rng.randrange(1, 31), rng.randrange(1, 31)) - 1]
                     for _ in range(n)}
            rows.append((d, " ".join(sorted(words))))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sh = shingles(df, size=1).localCheckpoint(eager=True)
        truth_all = {
            (r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(sh).collect()
        }
        for t in (0.4, 0.7, 0.9):
            cands = {
                (r["id_a"], r["id_b"]) for r in prefix_candidates(sh, t).collect()
            }
            qualifying = {p for p, j in truth_all.items() if j >= t}
            missing = qualifying - cands
            assert not missing, (trial, t, missing)


def _zipf_corpus(spark, n_docs=120, vocab=4000, doc_len=24, seed=7):
    """Deterministic long-tail corpus: token ranks drawn ∝ rank^-1.1
    from a large vocabulary (the tools/gen_scaledata.py --zipf shape,
    shrunk to test size), with every 10th doc a near-dup of its
    predecessor (one token swapped — Jaccard well above 0.9 at this
    length)."""
    import random

    rng = random.Random(seed)
    weights = [1.0 / (r ** 1.1) for r in range(1, vocab + 1)]
    tot = sum(weights)
    cum, acc = [], 0.0
    for wt in weights:
        acc += wt / tot
        cum.append(acc)

    def draw():
        import bisect

        return f"w{bisect.bisect_left(cum, rng.random()):05d}"

    rows, prev = [], None
    for i in range(n_docs):
        if prev is not None and i % 10 == 9:
            toks = list(prev)
            toks[rng.randrange(len(toks))] = draw()
        else:
            toks = [draw() for _ in range(doc_len)]
        rows.append((i, " ".join(toks)))
        prev = toks
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_generator_autoselect_routes_both_corpus_shapes(spark):
    """jaccard_near_dups_auto (round-7): the shingle-frequency profile
    must route the long-tail (zipf) corpus to the LOSSLESS prefix arm
    — whose output must equal brute-force exact Jaccard — and the
    hot-vocabulary synthetic documents corpus to the LSH cascade —
    whose output must equal minhash_near_dups run directly. The
    decision statistic is the EXACT candidate-pair count of the
    prefix self-join, computed without running the join."""
    from skripsi_mapreduce_spark.operators.dedup import (
        jaccard_generator_profile,
        jaccard_near_dups_auto,
        minhash_near_dups,
    )

    from .conftest import SF_DIR

    t = 0.9
    # long-tail shape: prefix wins, recall 1.0 == brute force
    zipf = _zipf_corpus(spark).localCheckpoint(eager=True)
    sh_z = shingles(zipf, size=1).localCheckpoint(eager=True)
    prof_z = jaccard_generator_profile(sh_z, t)
    assert prof_z["generator"] == "prefix", prof_z
    pairs_z, prof_z2 = jaccard_near_dups_auto(zipf, threshold=t)
    assert prof_z2 == prof_z
    got_z = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in pairs_z.collect()
    )
    truth_z = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs(sh_z).filter(F.col("jaccard") >= t).collect()
    )
    assert got_z == truth_z and len(got_z) >= 5  # planted near-dups found

    # hot-vocabulary shape: the prefix join would be ~quadratic → LSH
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh_u = shingles(docs, size=1).localCheckpoint(eager=True)
    prof_u = jaccard_generator_profile(sh_u, t)
    assert prof_u["generator"] == "lsh", prof_u
    pairs_u, _ = jaccard_near_dups_auto(docs, threshold=t)
    got_u = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in pairs_u.collect()
    )
    want_u = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_near_dups(docs, threshold=t).collect()
    )
    assert got_u == want_u and len(got_u) > 0


def test_array_verify_kernel_matches_join_verify(spark):
    """The set-array verify kernel (verify_max_tokens opt-in) must be
    bit-identical to the exploded equi-join verify on the same
    candidates — same pairs, same float64 jaccard — on a long-tail
    corpus whose trigram-sized vocabulary disables the bitmap tier."""
    docs = _zipf_corpus(spark, n_docs=80).localCheckpoint(eager=True)
    for size, t in ((1, 0.7), (3, 0.8)):
        sh = shingles(docs, size=size).localCheckpoint(eager=True)
        cands = prefix_candidates(sh, t).localCheckpoint(eager=True)
        via_join = jaccard_pairs(sh, pairs=cands, bitmap_max_vocab=0)
        via_arrays = jaccard_pairs(
            sh, pairs=cands, bitmap_max_vocab=0, verify_max_tokens=4096
        )
        a = sorted(map(tuple, via_join.collect()))
        b = sorted(map(tuple, via_arrays.collect()))
        assert a == b and len(a) > 0, (size, t, len(a), len(b))

    # backend invariance on the ZERO-OVERLAP edge: a candidate pair with
    # disjoint shingle sets must be absent from BOTH backends' output
    # (the array kernel fences o > 0 like the bitmap kernel)
    sh1 = shingles(docs, size=1).localCheckpoint(eager=True)
    ids = [r["doc_id"] for r in sh1.select("doc_id").distinct().limit(2).collect()]
    forced = spark.createDataFrame([(ids[0], ids[1]), (0, 10)], "id_a long, id_b long")
    j = sorted(map(tuple, jaccard_pairs(sh1, pairs=forced, bitmap_max_vocab=0).collect()))
    ar = sorted(map(tuple, jaccard_pairs(
        sh1, pairs=forced, bitmap_max_vocab=0, verify_max_tokens=4096).collect()))
    assert j == ar, (j, ar)
