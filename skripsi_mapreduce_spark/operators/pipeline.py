"""End-to-end training-corpus preparation — the composition the other
operator families exist for: deterministic sample → quality filter →
language filter → exact dedup → near-dedup → chunk.

Every stage is one of the engine's scan-speed operators; the composition
stays a single lazy DataFrame plan until the caller materializes it, so
Catalyst pushes the cheap row-level filters (quality, language, sample)
below everything it can, and the only shuffles are the ones the dedup
stages inherently need. At 100 TB this ordering matters: sampling and
quality filtering first shrink the corpus BEFORE any shuffle.

Stage toggles accept None to skip — the defaults mirror the standard
web-corpus recipe (C4/Gopher-style filter, exact then near dedup,
fixed-size token windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Reproducible, engine-portable row sample: keep rows whose
    ``md5(salt || key)`` falls under ``fraction`` of the hash space.

    Unlike ``df.sample`` the decision is a pure function of the key —
    stable across runs, partitionings, engines, and retries (the property
    a training pipeline needs so a re-run reproduces the exact corpus).
    Uses the first 15 hex digits (60 bits) of md5 as the uniform draw,
    compared as integers against a driver-computed literal threshold."""
    return df.filter(_draw60(key_col, salt) < F.lit(sample_threshold(fraction)))


def sample_threshold(fraction: float) -> int:
    """The 60-bit integer threshold for a keep-fraction: a row survives
    when its md5 draw (first 15 hex digits as an int) is below this.
    Computed ONCE driver-side and embedded as a literal in every engine,
    so there is no cross-engine float hazard in the comparison."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(round(fraction * float(1 << 60)))


def _draw60(key_col: str, salt: str) -> F.Column:
    """Uniform 60-bit integer draw as a pure function of (salt, key)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-group sampling — the domain-mixing primitive for
    training corpora: keep each row of group g with probability
    ``rates[g]`` (groups absent from ``rates`` are dropped).

    Like :func:`deterministic_sample` the decision is a pure function of
    the key, so the mix is reproducible across runs, engines, retries,
    and partitionings, and nested: the kept set at rate r is a subset of
    the kept set at any r' > r (useful for scaling a mix up or down
    without churning which documents survive). A narrow filter — no
    shuffle, pushed to the scan."""
    thresholds = {g: sample_threshold(r) for g, r in rates.items()}
    pairs: list[F.Column] = []
    for g, t in sorted(thresholds.items()):
        pairs += [F.lit(g), F.lit(t)]
    thr = F.element_at(F.create_map(*pairs), F.col(group_col)) if pairs else F.lit(None)
    return df.filter(_draw60(key_col, salt) < F.coalesce(thr, F.lit(0)))


def weighted_priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wps",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: the k rows with
    the largest Efraimidis-Spirakis priority ``u^(1/w)`` — each row's
    inclusion probability is proportional to its weight, exactly the
    one-pass distributed formulation of weighted reservoir sampling
    (rows with weight <= 0 are excluded). The uniform draw ``u`` is the
    row's 60-bit md5 integer (pure function of the key), so the sample
    is reproducible across runs, engines, retries, and partitionings.

    Ranking uses the equivalent monotone key ``ln(u)/w`` rounded to 8dp
    (the repo's cross-engine-stable ln convention, cf. unigram_logprob)
    with the row key as tie-break, surfaced as ``priority_e8``.

    Scale: priority is a narrow expression; top-k plans as
    TakeOrderedAndProject — per-task k-row heaps, driver merges k×tasks
    rows, no global sort ever (same shape as q18)."""
    from ..functions.numeric import e_int

    u = (_draw60(key_col, salt) + 1).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    return (
        df.filter(w > 0)
        .withColumn("priority_e8", e_int(F.log(u) / w, 8))
        .orderBy(F.col("priority_e8").desc(), F.col(key_col))
        .limit(k)
    )


def negative_samples(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    salt: str = "neg",
) -> DataFrame:
    """Contrastive negative sampling: for every anchor row, draw ``k``
    deterministic negatives uniformly from the whole corpus, never the
    anchor itself — the pair generator behind contrastive embedding /
    reranker training data. Draw ``j`` for an anchor is
    ``md5(salt:id:j) % (n-1)`` mapped onto the corpus's dense 1..n rank
    with the anchor's own rank skipped (the classic re-roll-free
    exclusion), so the sample is a pure function of (salt, id, j):
    reproducible across runs, engines, retries, and partitionings, like
    every sampler in this module.

    Scale: the rank table comes from the two-phase range-partitioned
    rank (etl.assign_sequential_ids — no global window), carries ONLY
    (id, rank), and the two equi-joins (anchor->rank, draw->rank) are
    narrow shuffles AQE handles; nothing is collected but the
    per-partition offsets. Works unchanged whether anchors are 0.1% or
    100% of the corpus."""
    from .etl import assign_sequential_ids

    ranked, n = assign_sequential_ids(
        corpus.select(id_col), [id_col], id_col="_rank", with_total=True
    )
    if n < 2:
        raise ValueError("negative sampling needs a corpus of at least 2 rows")
    a = anchors.select(F.col(id_col).alias("anchor_id")).join(
        ranked.select(F.col(id_col).alias("anchor_id"), F.col("_rank").alias("_arank")),
        "anchor_id",
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    drawn = a.select("anchor_id", "_arank", j).withColumn(
        "_draw",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.col("anchor_id").cast("string"),
                        F.col("j").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(n - 1),
    )
    # candidate rank in 1..n-1; bump past the anchor's own rank -> 1..n \ {arank}
    drawn = drawn.withColumn(
        "_nrank",
        F.when(F.col("_draw") + 1 >= F.col("_arank"), F.col("_draw") + 2).otherwise(
            F.col("_draw") + 1
        ),
    )
    return (
        drawn.join(
            ranked.select(F.col(id_col).alias("neg_id"), F.col("_rank").alias("_nrank")),
            "_nrank",
        )
        .select("anchor_id", "j", "neg_id")
    )


def mix_weights(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "lang",
) -> dict[str, float]:
    """Per-group keep-rates that reshape the corpus to target proportions.

    Given target mix weights w_g (relative, need not sum to 1) and the
    observed group counts c_g, the largest achievable total under
    rates <= 1 is T = min_g c_g / w_g; each group keeps
    rate_g = T * w_g / c_g. Feed the result to :func:`stratified_sample`.

    Driver-side reduction: one groupBy-count collect of k rows (k =
    number of domains — bounded, never row-scale). Groups not named in
    ``weights`` get rate 0 (dropped)."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    counts = {
        row[0]: row[1]
        for row in df.groupBy(group_col).count().collect()
        if row[0] in weights and weights[row[0]] > 0
    }
    if not counts:
        return {g: 0.0 for g in weights}
    total = min(counts[g] / weights[g] for g in counts)
    return {
        g: (min(1.0, total * weights[g] / counts[g]) if g in counts else 0.0) for g in weights
    }


# PII patterns: conservative, precision-first (a training-corpus scrub
# prefers missing an odd formatting to mangling prose). RE2-compatible —
# no lookarounds — so the same patterns run in any engine.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{1,3}[-. (]{1,2}\d{3}[-. )]{1,2}\d{3}[-. ]?\d{4}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
    replacement: str = "[{kind}]",
) -> DataFrame:
    """Replace PII spans in ``text_col`` with typed placeholders
    (``[email]``, ``[phone]``, …) — chained ``regexp_replace`` built-ins,
    scan-speed, no Python. ``kinds`` selects a subset of
    :data:`PII_PATTERNS`; order is deterministic (dict order)."""
    out = df
    col = F.col(text_col)
    for kind, pattern in PII_PATTERNS.items():
        if kinds is not None and kind not in kinds:
            continue
        col = F.regexp_replace(col, pattern, replacement.format(kind=kind))
    return out.withColumn(text_col, col)


def contamination_check(
    docs: DataFrame,
    eval_docs: DataFrame,
    shingle_size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination scan: which training documents contain a
    verbatim ``shingle_size``-gram from the evaluation set?

    Returns (doc_id, eval_id, n_shared_ngrams) for every contaminated
    (train, eval) pair. The equi-join is on md5 of the n-gram — shuffle
    carries digests; the eval side is tiny and broadcast. Long n-grams
    (8 words is the common contamination convention) make coincidental
    overlap vanishingly rare, so any hit is a real leak."""
    from . import dedup as dd

    train_sh = dd.shingles(docs, id_col, text_col, shingle_size).select(
        "doc_id", F.md5("shingle").alias("h")
    )
    eval_sh = dd.shingles(eval_docs, eval_id_col, eval_text_col, shingle_size).select(
        F.col("doc_id").alias("eval_id"), F.md5("shingle").alias("h")
    )
    return (
        train_sh.join(F.broadcast(eval_sh), "h")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").cast("bigint").alias("n_shared_ngrams"))
    )


def corpus_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_fraction: float | None = None,
    min_quality: float | None = None,
    languages: list[str] | None = None,
    pii: bool = False,
) -> DataFrame:
    """The narrow-only prefix of corpus prep: deterministic sample →
    quality filter → language filter → optional PII scrub, all inline
    column expressions — no join, no shuffle, no state.

    Because every stage is narrow, the SAME function works on a
    streaming DataFrame (``spark.readStream`` source): ingestion-time
    filtering for a continuously-arriving corpus, with batch/stream
    parity pinned in tests/test_streaming.py. Returns (doc_id, text)."""
    from . import text_analysis as ta

    out = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    if sample_fraction is not None:
        out = deterministic_sample(out, sample_fraction, "doc_id")
    if min_quality is not None:
        out = out.filter(ta.quality_columns(F.col("text"))["quality"] >= min_quality)
    if languages:
        out = out.filter(ta.lang_columns(F.col("text"))["lang_pred"].isin(languages))
    if pii:
        out = scrub_pii(out)
    return out


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_fraction: float | None = None,
    min_quality: float | None = 0.5,
    languages: list[str] | None = None,
    exact_dedup: bool = True,
    near_dedup_threshold: float | None = 0.8,
    near_dedup_transitive: bool = False,
    chunk_tokens: int | None = None,
) -> DataFrame:
    """The standard corpus-prep pipeline over ``(doc_id, text)``.

    Stages, in the order that minimizes shuffled bytes:

    1. ``sample_fraction`` — deterministic hash sample (narrow filter).
    2. ``min_quality`` — keep docs with composite quality >= threshold
       (text_analysis.quality_score; narrow, scan-speed).
    3. ``languages`` — keep docs whose predicted language is in the list
       (text_analysis.lang_id; narrow).
    4. ``exact_dedup`` — one survivor per content digest, lowest id wins
       (digest-keyed shuffle, never text).
    5. ``near_dedup_threshold`` — MinHash+LSH near-duplicate pairs, then
       one of two survivor rules:
       - default (one-pass): drop every doc that is the GREATER id of
         any qualifying pair. No iteration; may keep more than one doc
         per transitive cluster when a mid-id doc only pairs upward.
       - ``near_dedup_transitive=True``: exact transitive clusters via
         distributed connected components (operators/components.py);
         exactly the smallest member of each cluster survives.
    6. ``chunk_tokens`` — explode into fixed-size token windows
       (doc_id, chunk_idx, chunk_text).

    Returns the surviving documents (or chunks when ``chunk_tokens``).
    """
    from . import dedup as dd

    # the narrow prefix — inline column-expression filters, no joins
    out = corpus_filter(
        docs,
        id_col,
        text_col,
        sample_fraction=sample_fraction,
        min_quality=min_quality,
        languages=languages,
    )
    if exact_dedup:
        out = dd.dedup_exact(out, ["text"])
    if near_dedup_threshold is not None:
        pairs = dd.minhash_near_dups(out, threshold=near_dedup_threshold)
        if near_dedup_transitive:
            from .components import duplicate_groups

            losers = duplicate_groups(pairs).filter(~F.col("is_keeper")).select("doc_id")
        else:
            # survivors-by-lowest-id: drop every doc that appears as the
            # GREATER id of a qualifying near-dup pair
            losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        out = out.join(losers, "doc_id", "left_anti")
    if chunk_tokens is not None:
        from ..functions.text import tokenize_col

        toks = out.select("doc_id", tokenize_col("text").alias("t"))
        idx = F.when(
            F.size("t") > 0,
            F.sequence(F.lit(0), F.ceil(F.size("t") / chunk_tokens).cast("int") - 1),
        ).otherwise(F.array().cast("array<int>"))
        out = (
            toks.select("doc_id", F.explode(idx).alias("chunk_idx"), "t")
            .select(
                "doc_id",
                "chunk_idx",
                F.array_join(
                    F.slice("t", F.col("chunk_idx") * chunk_tokens + 1, chunk_tokens), " "
                ).alias("chunk_text"),
            )
            .filter(F.col("chunk_text") != "")
        )
    return out


def temperature_weights(
    df: DataFrame,
    group_col: str = "source",
    budget: int = 100_000,
) -> DataFrame:
    """Temperature-scaled domain mixing weights (the multilingual-LM
    sampling scheme: upweight small domains by flattening the size
    distribution, w_d ∝ n_d^α normalized) at α = 1/2, plus the expected
    sample allocation for a ``budget``-row draw.

    α is pinned to 0.5 because sqrt is IEEE-correctly-rounded in every
    engine, which makes the whole computation hash-matchable: the
    per-domain mass is the e8 fixed-point integer ROUND(sqrt(n)·1e8),
    the normalizer is an exact int64 sum of those, and the final ratios
    divide one exactly-represented integer by another (both < 2^53) —
    identical doubles on Spark and DuckDB. A general-α variant is the
    same plan with pow(); its last-ulp portability is not guaranteed,
    so the adjudicated surface keeps α = 1/2.

    Scale: one groupBy over the scan (partial-aggregated), a 1-row
    total broadcast back — no window, no single-partition exchange."""
    from ..functions.numeric import e_int

    counts = df.groupBy(F.col(group_col).alias("domain")).agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    mass = counts.withColumn(
        "mass_e8", F.round(F.sqrt(F.col("n_docs").cast("double")) * 1e8).cast("long")
    )
    total = mass.agg(F.sum("mass_e8").alias("_total"))
    w = F.col("mass_e8").cast("double") / F.col("_total").cast("double")
    return (
        mass.crossJoin(F.broadcast(total))
        .select(
            "domain",
            "n_docs",
            e_int(w, 6).alias("w_e6"),
            F.round(F.lit(float(budget)) * w).cast("long").alias("expect_n"),
        )
        .orderBy("domain")
    )
