r"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure built-in column expressions (regexp, length, array ops, md5) —
no Python in the hot path, so these run at full scan speed over 100 TB of
documents and every one of them is reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round_exact_double
from ..functions.text import TOKEN_PATTERN

# Tiny marker-word lists for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "es"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que"],
}

STOPWORDS_EN = LANG_MARKERS["en"]

# A BPE-ish pre-tokenization regex: words, numbers, or single non-space
# symbols — the standard shape of GPT-2-style pretokenizers, minus the
# lookahead tricks unavailable in RE2 (keeps the DuckDB oracle exact).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), F.lit(0))


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_ws_tokens, n_bpe_tokens, n_words)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text).cast("bigint").alias("n_chars"),
        F.size(F.split(F.trim(text), r"\s+")).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))
        .cast("bigint")
        .alias("n_bpe_tokens"),
        F.size(_tokens(text)).cast("bigint").alias("n_words"),
    )


def quality_columns(text: Column) -> dict[str, Column]:
    """The quality feature/score expressions over a text column — exposed
    separately from :func:`quality_score` so narrow consumers (streaming
    filters, inline predicates) can use them without a join."""
    toks = _tokens(text)
    n_chars = F.length(text).cast("double")
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()-]", "")).cast("double")
    n_words = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(F.lit(STOPWORDS_EN), t))).cast(
        "double"
    )
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(0.0)
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double") / n_words,
    ).otherwise(0.0)
    len_score = F.least(n_words / 20.0, F.lit(1.0))
    wl_score = F.when((mean_word_len >= 3) & (mean_word_len <= 10), 1.0).otherwise(0.5)
    score = (
        0.3 * len_score
        + 0.25 * alpha_ratio
        + 0.2 * (1.0 - F.least(punct_ratio * 4, F.lit(1.0)))
        + 0.15 * F.least(stop_ratio * 3, F.lit(1.0))
        + 0.1 * wl_score
    )
    # ratios of small integers can land exactly on 4dp half-boundaries
    # (e.g. 3/160) where plain ROUND(double) diverges across engines —
    # scale-0 rounding after *10^4 is engine-exact (functions/numeric.py)
    return {
        "alpha_ratio": round_exact_double(alpha_ratio),
        "punct_ratio": round_exact_double(punct_ratio),
        "stop_ratio": round_exact_double(stop_ratio),
        "mean_word_len": round_exact_double(mean_word_len),
        "quality": round_exact_double(score),
    }


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score in [0,1].

    Features follow the usual web-corpus filters (Gopher/C4-style):
    document length, mean word length, alphabetic character ratio,
    punctuation density, stopword ratio."""
    cols = quality_columns(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"), *[c.alias(name) for name, c in cols.items()]
    )


def lang_columns(text: Column) -> dict[str, Column]:
    """The language-id expressions over a text column (lang_pred,
    lang_score) — exposed for narrow consumers like streaming filters."""
    toks = _tokens(text)
    n_words = F.size(toks)
    def _marker_count(markers: list[str]):
        arr = F.lit(markers)
        # single-arg lambda: pyspark treats a second parameter as the
        # element index, so the marker array must be closed over, not
        # passed as a defaulted argument.
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: _marker_count(markers) for lang, markers in LANG_MARKERS.items()}
    n_cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score <= 0, F.lit("und")).otherwise(pred)
    pred = F.when(n_cjk * 2 > F.length(text), F.lit("zh")).otherwise(pred)
    conf = F.when(n_words > 0, best_score.cast("double") / n_words.cast("double")).otherwise(0.0)
    return {"lang_pred": pred, "lang_score": round_exact_double(conf)}


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — marker-word language heuristic.

    Scores each language by its marker-word count over the token list;
    argmax wins, ties broken by language code ascending, zero matches ->
    'und'. CJK is detected first by script range (\\u4e00-\\u9fff density),
    which needs no tokenization."""
    cols = lang_columns(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"), *[c.alias(name) for name, c in cols.items()]
    )


def ngram_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3),
    dup_n: int = 5,
) -> DataFrame:
    """Repetition signals per document (Gopher/MassiveText-style filters):

    - ``top{n}_frac`` for each n in ``top_ns``: the most frequent word
      n-gram's share of all n-gram instances in the doc — high values
      flag boilerplate / TV-schedule pages.
    - ``dup{dup_n}_frac``: the fraction of ``dup_n``-gram instances whose
      gram occurs more than once in the doc — high values flag
      copy-paste-looped text.

    Docs with fewer than n tokens score 0 for that signal. All signals in
    [0, 1], surfaced via the engine-exact 4dp rounding.

    Scale shape: ONE explode over all n sizes at once (each gram tagged
    with its n), counts keyed on (doc_id, n, md5(gram)) so the shuffle
    carries 32-byte digests instead of gram text, then one per-doc
    conditional aggregate — two shuffles total regardless of how many n
    sizes are requested, both keyed by doc_id-prefixed keys (no hot key
    can exceed one document's gram count).
    """
    ns = sorted(set(top_ns) | {dup_n})
    toks = _tokens(F.col(text_col))

    def _grams(n: int) -> Column:
        # md5 of the space-joined n-token window, tagged with n
        idx = F.sequence(F.lit(1), F.size(toks) - n + 1)
        win = F.transform(
            idx,
            lambda i: F.struct(
                F.lit(n).alias("n"), F.md5(F.concat_ws(" ", F.slice(toks, i, n))).alias("g")
            ),
        )
        return F.when(F.size(toks) >= n, win).otherwise(
            F.array().cast("array<struct<n:int,g:string>>")
        )

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_words"),
        F.concat(*[_grams(n) for n in ns]).alias("grams"),
    )
    counts = (
        base.select("doc_id", F.explode("grams").alias("gr"))
        .groupBy("doc_id", F.col("gr.n").alias("n"), F.col("gr.g").alias("g"))
        .agg(F.count("*").alias("c"))
    )
    aggs = []
    for n in top_ns:
        aggs.append(F.max(F.when(F.col("n") == n, F.col("c"))).alias(f"_top{n}"))
        aggs.append(F.sum(F.when(F.col("n") == n, F.col("c"))).alias(f"_tot{n}"))
    aggs.append(
        F.sum(F.when((F.col("n") == dup_n) & (F.col("c") > 1), F.col("c")).otherwise(0)).alias(
            "_dup"
        )
    )
    aggs.append(F.sum(F.when(F.col("n") == dup_n, F.col("c"))).alias("_totd"))
    stats = counts.groupBy("doc_id").agg(*aggs)

    def _frac(num: Column, den: Column) -> Column:
        return round_exact_double(
            F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0)
        )

    out = base.select("doc_id", "n_words").join(stats, "doc_id", "left")
    return out.select(
        "doc_id",
        "n_words",
        *[_frac(F.col(f"_top{n}"), F.col(f"_tot{n}")).alias(f"top{n}_frac") for n in top_ns],
        _frac(F.col("_dup"), F.col("_totd")).alias(f"dup{dup_n}_frac"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — order-invariant content fingerprint: md5 over the
    sorted distinct token set. Robust to token reordering and duplicated
    runs; the cheap first pass before MinHash in a dedup cascade."""
    toks = _tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("fp"),
    )


def cross_doc_duplication(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 6
) -> DataFrame:
    """Cross-document duplicated-passage signal (the detection half of
    exact-substring dedup, per "Deduplicating Training Data Makes
    Language Models Better"): for each doc, the fraction of its distinct
    ``k``-token windows that also occur in at least one OTHER document.

    Returns (doc_id, n_grams, n_shared, crossdup_frac). Docs shorter
    than ``k`` tokens score 0. Companion :func:`duplicated_passages`
    surfaces the repeated windows themselves for inspection.

    Scale shape: distinct per-doc shingling (dedup.shingles), then two
    digest-keyed aggregations — the shuffle carries 32-byte md5 digests,
    never window text, and both aggregates get map-side partial
    combining. The doc-frequency join is digest-equi (near-unique keys,
    no skew)."""
    from .dedup import shingles

    sh = shingles(df, id_col, text_col, k).select("doc_id", F.md5("shingle").alias("h"))
    # shingle sets are distinct per doc, so count(*) per digest = #docs
    dfreq = sh.groupBy("h").agg(F.count("*").alias("df"))
    per_doc = (
        sh.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).cast("bigint").alias("n_shared"),
        )
    )
    out = df.select(F.col(id_col).alias("doc_id")).join(per_doc, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
        round_exact_double(
            F.when(
                F.col("n_grams") > 0,
                F.col("n_shared").cast("double") / F.col("n_grams").cast("double"),
            ).otherwise(0.0)
        ).alias("crossdup_frac"),
    )


def duplicated_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """The repeated ``k``-token windows themselves: (passage, n_docs,
    example_doc_id) for every window appearing in >= ``min_docs``
    documents — the inspection/report companion to
    :func:`cross_doc_duplication`. Groups on window text (needed in the
    output); for corpora where the report itself is huge, raise ``k`` or
    ``min_docs`` — the HAVING prunes inside the aggregate."""
    from .dedup import shingles

    sh = shingles(df, id_col, text_col, k)
    return (
        sh.groupBy("shingle")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .withColumnRenamed("shingle", "passage")
    )


def remove_duplicated_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """The REMOVAL half of exact-substring dedup ("Deduplicating Training
    Data Makes Language Models Better", Lee et al. 2022): drop every token
    covered by a ``k``-token window that occurs in >= ``min_docs`` distinct
    documents, and rebuild each document from the surviving tokens.

    Returns (doc_id, n_tokens, n_removed, cleaned) where ``cleaned`` is the
    space-joined surviving token stream (the operator is defined over the
    tokenized corpus — the standard formulation; callers needing byte-exact
    offsets run it over their own tokenization). Documents shorter than
    ``k`` tokens are untouched; fully-duplicated documents come back empty.

    Companion ops: :func:`cross_doc_duplication` (the per-doc signal) and
    :func:`duplicated_passages` (the repeated windows themselves).

    Scale shape: window digests are md5 (32-byte shuffle keys, never text);
    doc-frequency is one digest-keyed aggregate over DISTINCT per-doc
    windows; coverage expansion multiplies only the DUPLICATED windows by
    ``k``; and reconstruction is one doc-keyed aggregate. Every join key is
    (doc_id, pos) or a digest — near-unique, no skew. The corpus text
    crosses exactly one shuffle (the rebuild), carrying surviving tokens
    only."""
    toks = df.select(F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("t"))
    # (doc_id, p, h): md5 digest of the k-token window starting at p (1-based)
    win_arr = F.when(
        F.size("t") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - k + 1),
            lambda i: F.struct(
                i.alias("p"), F.md5(F.concat_ws(" ", F.slice("t", i, k))).alias("h")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p:int,h:string>>"))
    wins = toks.select("doc_id", F.explode(win_arr).alias("w")).select(
        "doc_id", F.col("w.p").alias("p"), F.col("w.h").alias("h")
    )
    # doc frequency over DISTINCT per-doc windows (a window repeated inside
    # one doc is not cross-document duplication)
    dfreq = wins.select("doc_id", "h").distinct().groupBy("h").agg(F.count("*").alias("df"))
    dup = wins.join(dfreq.filter(F.col("df") >= min_docs).select("h"), "h").select(
        "doc_id", "p"
    )
    covered = dup.select(
        "doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + (k - 1))).alias("pos")
    ).distinct()
    tl = toks.select("doc_id", F.posexplode("t").alias("pos0", "tok")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    kept = tl.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]),
        ).alias("cleaned"),
    )
    base = toks.select("doc_id", F.size("t").cast("bigint").alias("n_tokens"))
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).cast("bigint").alias("n_removed"),
        F.coalesce("cleaned", F.lit("")).alias("cleaned"),
    )


def unigram_logprob(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc mean negative log-likelihood under the corpus's own
    unigram model — the cheap stand-in for the CCNet/KenLM perplexity
    filter: p(w) = corpus count of w / total tokens, and a document
    scores nll = -(1/n) * sum_i ln p(w_i). LOW values = made of common
    words (boilerplate-ish); HIGH values = rare-token soup (noise).

    Returns (doc_id, n_words, nll). Two-pass by nature (the model is an
    aggregate of the same corpus being scored): tf per (doc, word), the
    word-count model from a second aggregate of tf, then one join back
    on word. Cross-engine exactness: each word's ln p is rounded to 8dp
    and summed as DECIMAL scaled by tf — order-independent, so the
    shuffle schedule can't move the result.

    Scale: the model table is vocabulary-sized (zipfian-small vs the
    corpus); at 100 TB the join on word broadcasts the model. The total
    token count is a one-scalar driver reduction (same convention as
    TF-IDF's document count), so the scoring pass re-reads ONLY the tf
    exchange (ReusedExchange), not the corpus. Empty docs score 0."""
    toks = df.select(F.col(id_col).alias("doc_id"), F.explode(_tokens(F.col(text_col))).alias("word"))
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    cw = tf.groupBy("word").agg(F.sum("tf").alias("cw"))
    t_total = cw.agg(F.sum("cw")).collect()[0][0] or 0
    # widths chosen so the product (12,0)x(18,8) -> (31,8) stays under
    # both engines' 38-digit decimal cap (a wider product would make
    # Spark silently shave scale to fit)
    lnp = F.round(F.log(F.col("cw").cast("double") / F.lit(float(max(t_total, 1)))), 8).cast(
        "decimal(18,8)"
    )
    model = cw.select("word", lnp.alias("lnp"))
    per = (
        tf.join(F.broadcast(model), "word")
        .groupBy("doc_id")
        .agg(
            (-(F.sum(F.col("tf").cast("decimal(12,0)") * F.col("lnp")))).alias("s"),
            F.sum("tf").cast("bigint").alias("n_words"),
        )
    )
    out = df.select(F.col(id_col).alias("doc_id")).join(per, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        round_exact_double(
            F.when(
                F.col("n_words") > 0, F.col("s").cast("double") / F.col("n_words").cast("double")
            ).otherwise(0.0)
        ).alias("nll"),
    )


# Fixed weights for the linear quality classifier — stand-ins for a
# trained model's coefficients (a fasttext/logreg-style keep/drop filter
# distilled to its scoring pass). All weights are exactly-representable
# doubles so the logit arithmetic is bit-identical across engines.
CLASSIFIER_BIAS = -2.0
CLASSIFIER_WEIGHTS = {
    "alpha_ratio": 3.0,
    "punct_ratio": -4.0,
    "stop_ratio": 2.0,
    "mean_word_len": 0.25,
}
CLASSIFIER_THRESHOLD = 0.5


def quality_classifier(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Model-based corpus filter: a linear classifier's LOGIT over the
    quality features, plus the keep/drop decision at a fixed threshold —
    the scoring pass of a learned quality filter (the training-pipeline
    step after heuristic filtering; weights here are fixed literals, the
    operator shape is what matters).

    Deliberately emits the logit rather than a sigmoid probability: the
    features are exact k/10^4 doubles (round_exact_double) and the
    weights exact literals, so the left-associated multiply-add chain is
    the identical IEEE double in every engine — whereas exp() is libm-
    dependent and NOT bit-portable. Monotonicity makes the decision
    identical either way. Pure narrow projection — scan-speed, pushed
    below any shuffle."""
    cols = quality_columns(F.col(text_col))
    z = F.lit(CLASSIFIER_BIAS)
    for name, w in CLASSIFIER_WEIGHTS.items():
        z = z + F.lit(w) * cols[name]
    return df.select(
        F.col(id_col).alias("doc_id"),
        z.alias("logit"),
        (z >= F.lit(CLASSIFIER_THRESHOLD)).cast("bigint").alias("keep"),
    )


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", lam: float = 0.75
) -> DataFrame:
    """Per-doc mean negative log-likelihood under an interpolated BIGRAM
    model of the corpus — one step up the KenLM ladder from
    :func:`unigram_logprob`: p(w|prev) = lam * c(prev,w)/c(prev,*) +
    (1-lam) * c(w)/T. Documents with fewer than two tokens score 0.

    Returns (doc_id, n_bigrams, nll). The same cross-engine discipline
    as the unigram model: each distinct bigram's ln p is rounded to 8dp
    and summed as DECIMAL scaled by its per-doc count —
    order-independent, shuffle-proof.

    Scale: the bigram model table is corpus-bigram-bounded (zipf-small
    vs corpus bytes) and broadcasts for the scoring join; the corpus is
    tokenized once, bigrams come from one array transform (no
    self-join), and T is the only driver scalar."""
    # token array materialized as a projected column BEFORE the n-gram
    # transform: element_at then indexes an ATTRIBUTE — the inlined form
    # re-evaluates the tokenizer regex per n-gram element (see
    # collocations: measured 6.8s -> 0.45s at sf0.1 for the explode)
    tk = df.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("t")
    )
    t = F.col("t")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("a"), F.element_at(t, i + 1).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    bi = tk.select("doc_id", F.explode(bigrams).alias("p")).select(
        "doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )
    btf = bi.groupBy("doc_id", "a", "b").agg(F.count("*").alias("tf"))
    cab = btf.groupBy("a", "b").agg(F.sum("tf").alias("cab"))
    ca = cab.groupBy("a").agg(F.sum("cab").alias("ca"))
    uni = tk.select(F.explode(t).alias("word")).groupBy("word").agg(
        F.count("*").alias("cw")
    )
    t_total = uni.agg(F.sum("cw")).collect()[0][0] or 0
    p = F.lit(lam) * (F.col("cab").cast("double") / F.col("ca").cast("double")) + F.lit(
        1.0 - lam
    ) * (F.col("cw").cast("double") / F.lit(float(max(t_total, 1))))
    model = (
        cab.join(ca, "a")
        .join(uni.withColumnRenamed("word", "b"), "b")
        .select("a", "b", F.round(F.log(p), 8).cast("decimal(18,8)").alias("lnp"))
    )
    per = (
        btf.join(F.broadcast(model), ["a", "b"])
        .groupBy("doc_id")
        .agg(
            (-(F.sum(F.col("tf").cast("decimal(12,0)") * F.col("lnp")))).alias("s"),
            F.sum("tf").cast("bigint").alias("n_bigrams"),
        )
    )
    out = df.select(F.col(id_col).alias("doc_id")).join(per, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        round_exact_double(
            F.when(
                F.col("n_bigrams") > 0,
                F.col("s").cast("double") / F.col("n_bigrams").cast("double"),
            ).otherwise(0.0)
        ).alias("nll"),
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """PMI collocation mining (Church & Hanks 1990) — the corpus-analysis
    stage that surfaces multiword expressions ("new york", "machine
    learning") for tokenizer vocabularies and phrase-aware dedup:
    pmi(a,b) = ln( (c(a,b)/B) / ((c(a)/T) · (c(b)/T)) ) over adjacent
    token pairs, where B = total bigrams and T = total tokens.

    Returns (a, b, pair_count, pmi) for every bigram with
    ``pair_count >= min_count`` — selection is by INTEGER count only
    (never by the float score), so the row set is engine-exact; pmi is
    rounded to 8dp through the same LN discipline as the LM ladder
    (identical expression tree in both engines, ln of a ratio of exact
    integer casts).

    Scale: ONE tokenization pass — the token ARRAY is materialized as a
    projected column BEFORE the bigram transform, so ``element_at``
    indexes an attribute instead of re-running the tokenizer regex per
    bigram element (the inlined form re-evaluates regexp_extract_all
    twice per element: measured 6.8s -> 0.45s at sf0.1 for the explode
    alone). Bigrams come from the array transform (no self-join); the
    unigram table is zipf-small and broadcasts onto the count-filtered
    bigram table; T and B ride the SAME single action as cross-joined
    1-row aggregates (no driver collect, and AQE serves them from the
    reused uni/cab shuffle stages). Shuffles carry (a, b, count) rows,
    never text."""
    tk = df.select(_tokens(F.col(text_col)).alias("t"))
    t = F.col("t")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("a"), F.element_at(t, i + 1).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    bi = tk.select(F.explode(bigrams).alias("p")).select(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )
    cab = bi.groupBy("a", "b").agg(F.count("*").alias("cab"))
    uni = tk.select(F.explode(t).alias("word")).groupBy("word").agg(
        F.count("*").alias("cw")
    )
    tot = uni.agg(F.sum("cw").alias("t_tok")).crossJoin(
        cab.agg(F.sum("cab").alias("b_big"))
    )
    pmi = (
        F.col("cab").cast("double") / F.col("b_big").cast("double")
    ) / (
        (F.col("cw_a").cast("double") / F.col("t_tok").cast("double"))
        * (F.col("cw_b").cast("double") / F.col("t_tok").cast("double"))
    )
    return (
        cab.filter(F.col("cab") >= min_count)
        .join(F.broadcast(uni.select(F.col("word").alias("a"), F.col("cw").alias("cw_a"))), "a")
        .join(F.broadcast(uni.select(F.col("word").alias("b"), F.col("cw").alias("cw_b"))), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.col("cab").cast("bigint").alias("pair_count"),
            F.round(F.log(pmi), 8).cast("decimal(18,8)").cast("double").alias("pmi"),
        )
    )


def trigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam3: float = 0.6,
    lam2: float = 0.3,
    lam1: float = 0.1,
) -> DataFrame:
    """Per-doc mean negative log-likelihood under an interpolated TRIGRAM
    model — the next rung up the KenLM ladder from :func:`bigram_logprob`:
    p(c|a,b) = lam3·c(a,b,c)/c(a,b,*) + lam2·c(b,c)/c(b,*) + lam1·c(c)/T
    (Jelinek-Mercer interpolation with fixed weights; every division is
    over corpus counts, so the model is fully determined by one tokenize
    pass). Documents with fewer than three tokens score 0.

    Returns (doc_id, n_trigrams, nll). Cross-engine discipline as the
    lower orders: each distinct trigram's ln p is rounded to 8dp and
    summed as DECIMAL scaled by its per-doc count — order-independent.
    The interpolation literals (0.6/0.3/0.1) are written identically in
    both engines, and the sum is left-associated identically, so the
    double is bit-equal despite the weights not being dyadic.

    Scale: trigram/bigram/unigram model tables are all corpus-vocabulary
    bounded (zipf-small) and broadcast for the scoring join; n-grams come
    from array transforms over ONE tokenization — no self-joins; T is the
    only driver scalar."""
    # token array as a projected column — element_at indexes an
    # attribute instead of re-running the tokenizer regex per n-gram
    # element (see collocations / bigram_logprob)
    tk = df.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("t")
    )
    t = F.col("t")
    tris = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 2),
            lambda i: F.struct(
                F.element_at(t, i).alias("a"),
                F.element_at(t, i + 1).alias("b"),
                F.element_at(t, i + 2).alias("c"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string,c:string>>"))
    tri = tk.select("doc_id", F.explode(tris).alias("t")).select(
        "doc_id", F.col("t.a").alias("a"), F.col("t.b").alias("b"), F.col("t.c").alias("c")
    )
    ttf = tri.groupBy("doc_id", "a", "b", "c").agg(F.count("*").alias("tf"))
    cabc = ttf.groupBy("a", "b", "c").agg(F.sum("tf").alias("cabc"))
    cab = cabc.groupBy("a", "b").agg(F.sum("cabc").alias("cab"))
    # bigram/unigram backoff counts over the FULL corpus token stream
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("x"), F.element_at(t, i + 1).alias("y")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    cbc = (
        tk.select(F.explode(bigrams).alias("p"))
        .groupBy(F.col("p.x").alias("b"), F.col("p.y").alias("c"))
        .agg(F.count("*").alias("cbc"))
    )
    cb = cbc.groupBy("b").agg(F.sum("cbc").alias("cb"))
    uni = tk.select(F.explode(t).alias("c")).groupBy("c").agg(F.count("*").alias("cw"))
    t_total = uni.agg(F.sum("cw")).collect()[0][0] or 0
    p = (
        F.lit(lam3) * (F.col("cabc").cast("double") / F.col("cab").cast("double"))
        + F.lit(lam2) * (F.col("cbc").cast("double") / F.col("cb").cast("double"))
        + F.lit(lam1) * (F.col("cw").cast("double") / F.lit(float(max(t_total, 1))))
    )
    model = (
        cabc.join(cab, ["a", "b"])
        .join(cbc, ["b", "c"])
        .join(cb, "b")
        .join(uni, "c")
        .select("a", "b", "c", F.round(F.log(p), 8).cast("decimal(18,8)").alias("lnp"))
    )
    per = (
        ttf.join(F.broadcast(model), ["a", "b", "c"])
        .groupBy("doc_id")
        .agg(
            (-(F.sum(F.col("tf").cast("decimal(12,0)") * F.col("lnp")))).alias("s"),
            F.sum("tf").cast("bigint").alias("n_trigrams"),
        )
    )
    out = df.select(F.col(id_col).alias("doc_id")).join(per, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("n_trigrams", F.lit(0)).cast("bigint").alias("n_trigrams"),
        round_exact_double(
            F.when(
                F.col("n_trigrams") > 0,
                F.col("s").cast("double") / F.col("n_trigrams").cast("double"),
            ).otherwise(0.0)
        ).alias("nll"),
    )


# ---------------------------------------------------------------------------
# Trainable quality classifier: exact normal-equations least squares over
# hashed token features (round-8). The reference scores with fixed
# weights only; a real pipeline refits its quality filter per corpus.
# ---------------------------------------------------------------------------

QC_FIT_BUCKETS = 3  # d = 1 intercept + 3 hashed buckets (the adjudicated size)


def hashed_token_features(
    df: DataFrame,
    n_buckets: int = QC_FIT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, x1..x{n}): hashed-token count features — every token
    lands in bucket md5(token)[:8 hex] mod ``n_buckets`` and x_j counts
    the doc's tokens in bucket j. INTEGER counts, so every downstream
    moment sum is exact int64 (the e-int discipline); the md5-derived
    bucket is the engine-portable hash both Spark and a SQL oracle
    compute identically. Docs with no tokens keep zero rows via the
    left join. One explode + one groupBy — scan-shaped at 100 TB."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("t"),
    )
    bkt = F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("bigint") % n_buckets
    counts = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(bkt == j, 1).otherwise(0)).cast("long").alias(f"x{j + 1}")
            for j in range(n_buckets)
        ]
    )
    return df.select(F.col(id_col).alias("doc_id")).join(counts, "doc_id", "left").select(
        "doc_id",
        *[
            F.coalesce(F.col(f"x{j + 1}"), F.lit(0).cast("long")).alias(f"x{j + 1}")
            for j in range(n_buckets)
        ],
    )


def moment_aggs(n_buckets: int, y_col: str = "y") -> list[Column]:
    """The normal-equation moments as ONE partial-aggregated pass:
    A = X'X (symmetric — d(d+1)/2 distinct sums, named a{i}{j} with
    i <= j over the [1, x1..xn] feature vector) and b = X'y (named
    b{i}). All inputs integer, so the sums are exact int64 and the
    moments hash identically across engines — the q44_corr_stats
    pattern generalized from d=2 to arbitrary bounded d."""
    feats = ["1"] + [f"x{j + 1}" for j in range(n_buckets)]
    aggs: list[Column] = []
    for i, fi in enumerate(feats):
        for j in range(i, len(feats)):
            fj = feats[j]
            prod = (
                F.lit(1).cast("long")
                if fi == "1" and fj == "1"
                else F.col(fj)
                if fi == "1"
                else F.col(fi) * F.col(fj)
            )
            aggs.append(F.sum(prod).cast("long").alias(f"a{i}{j}"))
        yi = F.col(y_col) if fi == "1" else F.col(fi) * F.col(y_col)
        aggs.append(F.sum(yi).cast("long").alias(f"b{i}"))
    return aggs


def cramer4_sql() -> tuple[str, list[str]]:
    """Closed-form 4x4 Cramer solve as arithmetic STRINGS over the
    moment column names (a00..a33, b0..b3): (det_A, [det_A_0..det_A_3])
    where A_j is A with column j replaced by b. Generated ONCE from the
    same Leibniz expansion and used verbatim by the Spark plan
    (F.expr) and the DuckDB oracle, so both engines evaluate the
    identical left-associated IEEE-double chain — the solve itself is
    adjudicated, not just the moments. Bounded d=4 keeps the expansion
    at 24 terms; the general-d path (:func:`fit_quality_classifier`)
    solves driver-side instead."""
    from itertools import permutations

    def a(i: int, j: int) -> str:
        return f"CAST(a{min(i, j)}{max(i, j)} AS DOUBLE)"

    def build(repl: int | None) -> str:
        def entry(i: int, j: int) -> str:
            return f"CAST(b{i} AS DOUBLE)" if j == repl else a(i, j)

        terms = []
        for p in permutations(range(4)):
            inv = sum(
                1 for i in range(4) for k in range(i + 1, 4) if p[i] > p[k]
            )
            sgn = "+" if inv % 2 == 0 else "-"
            terms.append(f"{sgn} " + " * ".join(entry(i, p[i]) for i in range(4)))
        return "(0.0 " + " ".join(terms) + ")"

    return build(None), [build(j) for j in range(4)]


def fit_quality_classifier(
    df: DataFrame,
    label_col: str,
    n_buckets: int = QC_FIT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Distributed EXACT least squares for a linear quality filter:
    regress an integer (or fixed-point ``_e4``) label on the hashed
    token features. The cluster computes only the normal-equation
    moments — X'X and X'y as exact int64 aggregates in ONE
    partial-aggregated pass (shuffle carries d(d+3)/2 longs, data never
    moves) — and the d x d solve runs driver-side at bounded d
    (d = n_buckets + 1; a quality filter has dozens of features, not
    millions). Returns {"n", "n_buckets", "weights": [w0..wd]} with w0
    the intercept, in label units.

    The adjudicated entry (ta_fit_classifier) is the fixed d=4 twin
    whose solve stays ENGINE-SIDE via :func:`cramer4_sql`, so the whole
    fit is oracle-replayable; this driver-solve path generalizes to any
    bounded d and is pinned against the Cramer path by test. Labels
    must be integers for exact moments (the caller scales e4 — the
    repo's fixed-point discipline)."""
    import numpy as np

    feats = hashed_token_features(df, n_buckets, id_col=id_col, text_col=text_col)
    lab = feats.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(label_col).alias("y")),
        "doc_id",
    )
    row = lab.agg(*moment_aggs(n_buckets, "y")).head()
    d = n_buckets + 1
    A = np.zeros((d, d), dtype=np.float64)
    b = np.zeros(d, dtype=np.float64)
    for i in range(d):
        b[i] = float(row[f"b{i}"])
        for j in range(i, d):
            A[i, j] = A[j, i] = float(row[f"a{i}{j}"])
    w = np.linalg.solve(A, b)
    return {"n": int(row["a00"]), "n_buckets": n_buckets, "weights": [float(x) for x in w]}


def quality_logit_learned(
    df: DataFrame,
    model: dict,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inference with a LEARNED model (:func:`fit_quality_classifier`'s
    output): the same left-associated multiply-add logit shape as
    :func:`quality_classifier`, over the hashed token features the
    model was trained on. Returns (doc_id, logit, keep)."""
    feats = hashed_token_features(
        df, model["n_buckets"], id_col=id_col, text_col=text_col
    )
    w = model["weights"]
    z = F.lit(float(w[0]))
    for j in range(model["n_buckets"]):
        z = z + F.lit(float(w[j + 1])) * F.col(f"x{j + 1}").cast("double")
    return feats.select(
        "doc_id",
        z.alias("logit"),
        (z >= F.lit(float(threshold))).cast("bigint").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Feature hashing: text -> embedding, engine-side (round-11). The one
# LLM-pipeline stage the registry previously derived from pre-supplied
# embedding columns rather than producing itself — the hashing trick
# (Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
# Learning") maps token/bigram grams into a fixed d-dim signed count
# vector with NO vocabulary table at all, which is exactly what makes
# it the 100 TB text-vectorizer: stateless, one explode + one
# (doc, dim)-keyed partial-aggregated groupBy, nothing broadcast,
# nothing collected, no fit pass over the corpus.
# ---------------------------------------------------------------------------


def feature_hash_embed(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, dim, value_e6): L2-normalized hashed n-gram embedding.

    Grams are the unigram tokens plus adjacent bigrams (``"a b"``) of
    the lowered TOKEN_PATTERN tokens; each gram lands in bucket
    ``md5(gram)[:8 hex] mod dim`` with an Achlioptas ±1 sign from the
    parity of md5's last hex digit (the same engine-portable draws as
    hashed_token_features and similarity.random_projection). Bucket
    sums are exact int64, the L2 norm is an int64 sum of squares, and
    the surfaced value is ``e6(v_j / sqrt(||v||^2))`` — division and
    sqrt are correctly-rounded IEEE ops over identical integers, and
    both engines round e6 half-away-from-zero, so the whole embedding
    hash-matches a SQL oracle. Every doc emits all ``dim`` rows
    (zero-fill discipline, schemas.py); an empty doc embeds as the
    zero vector, not a divide-by-zero.

    Plan shape: the token array projects as a COLUMN before the bigram
    transform (inlined regexp in a HOF lambda re-runs per element —
    the round-8 collocations finding), one explode, one (doc, dim)
    groupBy with map-side partials; the norm is a doc-partitioned
    WINDOW over the resulting ≤dim-rows-per-doc table, NOT a second
    aggregate over the corpus — a groupBy-then-join formulation made
    Catalyst scan and re-tokenize the whole corpus twice (measured on
    the first cut of this operator; DataFrame lineage has no common-
    subplan reuse), and at 100 TB the tokenize+explode IS the cost.
    The dims-literal cross join supplies the zero rows. No vocabulary,
    no broadcast of anything corpus-sized, no driver collect —
    scan-shaped at any corpus size."""
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        _tokens(F.col(text_col)).alias("toks"),
    )
    bigrams = F.when(
        F.size("toks") >= 2,
        F.expr("transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select(
        "doc_id", F.explode(F.concat(F.col("toks"), bigrams)).alias("g")
    )
    bucket = (
        F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("bigint") % dim
    ).cast("int")
    sign = F.when(
        F.conv(F.substring(F.md5("g"), 32, 1), 16, 10).cast("bigint") % 2 == 1,
        F.lit(1),
    ).otherwise(F.lit(-1))
    v = (
        grams.select("doc_id", bucket.alias("dim"), sign.alias("s"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("s").cast("long").alias("vj"))
    )
    from pyspark.sql import Window as W

    vn = v.withColumn(
        "s2", F.sum(F.col("vj") * F.col("vj")).over(W.partitionBy("doc_id"))
    )
    dims = df.sparkSession.range(dim).select(F.col("id").cast("int").alias("dim"))
    base = df.select(F.col(id_col).cast("long").alias("doc_id")).crossJoin(dims)
    from ..functions.numeric import e_int

    return (
        base.join(vn, ["doc_id", "dim"], "left")
        .select(
            "doc_id",
            "dim",
            F.when(
                F.coalesce(F.col("s2"), F.lit(0)) == 0, F.lit(0).cast("long")
            )
            .otherwise(
                e_int(
                    F.coalesce(F.col("vj"), F.lit(0)).cast("double")
                    / F.sqrt(F.col("s2").cast("double")),
                    6,
                )
            )
            .alias("value_e6"),
        )
    )
