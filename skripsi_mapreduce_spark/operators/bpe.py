r"""Distributed BPE tokenizer training and application.

A training-data pipeline doesn't just COUNT tokens — it trains the
tokenizer in the first place. Classic byte-pair encoding (Sennrich et
al. 2016; the GPT-2/RoBERTa recipe): start from characters, repeatedly
merge the most frequent adjacent symbol pair across the corpus.

The Spark shape exploits BPE's key property: after the initial word
count, learning operates on the WORD-FREQUENCY table (vocabulary-sized,
zipf-small — sublinear in corpus bytes), never the corpus. So:

- one corpus-scale aggregation (``word_counts``: explode + groupBy —
  the same shuffle shape as TF-IDF's tf stage), then
- ``n_merges`` tiny jobs over the vocab table: pair-count aggregate →
  1-row argmax collect (the only driver data movement) → merge applied
  via a literal string ``replace`` (non-regex, non-overlapping
  left-to-right in both Spark and DuckDB — exactly BPE's greedy merge
  order), lineage cut per iteration.

Applying a learned tokenizer (``bpe_token_count``) is again
dictionary-sized work: the merges chain into nested ``replace`` calls
over DISTINCT words (one narrow projection, whole-stage codegen), and
documents get per-doc token counts through a broadcast join — the
corpus is touched once, with no Python in the loop.

Symbols are space-joined inside a word's sequence string; word
characters (``\w``) can never contain spaces, so the encoding is
unambiguous. Merged symbols concatenate their parts (standard BPE
convention — no marker glyphs, keeping every primitive engine-portable
and oracle-reproducible in DuckDB).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import local_df

from ..functions.text import TOKEN_PATTERN


@dataclass(frozen=True)
class BpeMerge:
    step: int
    left: str
    right: str
    count: int

    @property
    def merged(self) -> str:
        return self.left + self.right


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the tokenized corpus — the one corpus-scale pass."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _char_seq(col: F.Column) -> F.Column:
    """word -> space-joined character sequence ('abc' -> 'a b c')."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length(col)), lambda i: F.substring(col, i, 1)
        ),
        " ",
    )


def _apply_merge(seq: F.Column, left: str, right: str) -> F.Column:
    """One greedy BPE merge pass over a space-joined symbol sequence.

    Greedy left-to-right non-overlapping selection has a closed form
    that needs no sequential fold: mark every position whose adjacent
    pair is (left, right); within a maximal run of consecutive marks,
    greedy picks the 1st, 3rd, 5th... — i.e. ``sel[i] = mark[i] AND
    (i - last position ≤ i with no mark) is odd``. (A run of marks is
    overlapping candidate pairs — ``a a a a`` marks positions 1,2,3 and
    greedy merges at 1 and 3.) The rebuild keeps position i unless its
    predecessor was selected, emitting the merged symbol at selected
    positions. Every step is array lambdas over word-length arrays —
    pure codegen, and the DuckDB oracle states the identical expressions
    (_bpe_oracle_sql), so learned merges match string-for-string.

    This factory builds ~100 Column nodes per call (~1s of py4j for a
    5-merge loop); hot callers use :func:`_apply_merge_cached` instead,
    which builds the tree once over placeholder columns."""
    merged = F.lit(left + right) if isinstance(left, str) else F.concat(left, right)
    arr = F.split(seq, " ")
    n = F.size(arr)
    mark = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: (F.element_at(arr, i) == left) & (F.element_at(arr, i + 1) == right),
        ),
    ).otherwise(F.array().cast("array<boolean>"))

    def _sel(m: F.Column) -> F.Column:
        # last unmarked position ≤ i (0 if none); parity decides selection
        return F.when(
            F.size(m) >= 1,
            F.transform(
                F.sequence(F.lit(1), F.size(m)),
                lambda i: F.element_at(m, i)
                & (
                    (
                        i
                        - F.coalesce(
                            F.array_max(
                                F.filter(F.sequence(F.lit(1), i), lambda j: ~F.element_at(m, j))
                            ),
                            F.lit(0),
                        )
                    )
                    % 2
                    == 1
                ),
            ),
        ).otherwise(F.array().cast("array<boolean>"))

    # try_element_at: sel has n-1 entries but i ranges to n, and i-1 hits 0 for
    # i=1 — out-of-range must yield NULL (absorbed by coalesce) even under an
    # ANSI-enabled session, where element_at would instead raise
    # INVALID_ARRAY_INDEX_IN_ELEMENT_AT.
    sel = _sel(mark)
    kept = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: ~((i >= 2) & F.coalesce(F.try_element_at(sel, i - 1), F.lit(False))),
    )
    rebuilt = F.transform(
        kept,
        lambda i: F.when(
            F.coalesce(F.try_element_at(sel, i), F.lit(False)), merged
        ).otherwise(F.element_at(arr, i)),
    )
    return F.when(n >= 1, F.array_join(rebuilt, " ")).otherwise(seq)


_APPLY_MERGE_EXPR: F.Column | None = None


def _apply_merge_cached() -> F.Column:
    """:func:`_apply_merge`'s Column tree over placeholder columns
    ``_bpe_in`` / ``_bpe_left`` / ``_bpe_right``, built once per process.
    Callers bind the placeholders to literals (:func:`_with_merge`) and
    Catalyst constant-folds them into the lambdas, so the specialized
    plan is identical to building the tree fresh — without paying ~100
    py4j round-trips per merge step (the same driver-cost pattern as
    dedup._simhash_agg_exprs)."""
    global _APPLY_MERGE_EXPR
    if _APPLY_MERGE_EXPR is None:
        _APPLY_MERGE_EXPR = _apply_merge(
            F.col("_bpe_in"), F.col("_bpe_left"), F.col("_bpe_right")
        )
    return _APPLY_MERGE_EXPR


def _with_merge(df: DataFrame, seq_name: str, left: str, right: str) -> DataFrame:
    """Apply one (left, right) merge to ``df[seq_name]`` in place via the
    cached expression; column order and all other columns preserved."""
    return (
        df.withColumn("_bpe_in", F.col(seq_name))
        .withColumn("_bpe_left", F.lit(left))
        .withColumn("_bpe_right", F.lit(right))
        .withColumn(seq_name, _apply_merge_cached())
        .drop("_bpe_in", "_bpe_left", "_bpe_right")
    )


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
) -> list[BpeMerge]:
    """Learn ``n_merges`` BPE merges from the corpus. Deterministic:
    argmax ties break on (pair count desc, left asc, right asc), so the
    merge table is a pure function of the corpus. Returns the ordered
    merge list (step, left, right, count)."""
    wc = word_counts(df, text_col)
    seqs = wc.select(_char_seq(F.col("word")).alias("seq"), "cnt").localCheckpoint(
        eager=False
    )
    # iteration-independent (pure function of col("seq")) — build once,
    # not once per merge step
    arr = F.split(F.col("seq"), " ")
    pairs = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.struct(
                F.element_at(arr, i).alias("a"), F.element_at(arr, i + 1).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    merges: list[BpeMerge] = []
    for step in range(n_merges):
        best = (
            seqs.select(F.explode(pairs).alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_count:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append(BpeMerge(step, a, b, c))
        seqs = _with_merge(seqs, "seq", a, b)
        # cut lineage so iteration t+1 doesn't replay replaces 0..t-1
        seqs = seqs.localCheckpoint(eager=False)
    return merges


def merges_df(spark, merges: list[BpeMerge]) -> DataFrame:
    """The learned merge table as a DataFrame (step, sym_a, sym_b,
    merged, pair_count) — the persistable tokenizer artifact."""
    return local_df(
        spark,
        [(m.step, m.left, m.right, m.merged, m.count) for m in merges],
        "step int, sym_a string, sym_b string, merged string, pair_count long",
    )


def encode_words(words: DataFrame, merges: list[BpeMerge], word_col: str = "word") -> DataFrame:
    """word -> its BPE symbol sequence under the learned merges, applied
    in order (one stacked projection per merge — chaining the column
    EXPRESSIONS would nest the greedy-selection lambdas exponentially;
    as column references each step stays a modest Project and the whole
    stack is still one narrow codegen stage). Adds ``bpe_seq``
    (space-joined) and ``n_bpe`` (symbol count)."""
    out = words.withColumn("bpe_seq", _char_seq(F.col(word_col)))
    for m in merges:
        out = _with_merge(out, "bpe_seq", m.left, m.right)
    return out.withColumn(
        "n_bpe",
        F.when(F.length("bpe_seq") == 0, F.lit(0)).otherwise(
            F.size(F.split(F.col("bpe_seq"), " "))
        ).cast("bigint"),
    )


def bpe_token_count(
    df: DataFrame,
    merges: list[BpeMerge],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens) under the learned tokenizer.

    The merge chain runs once per DISTINCT word (dictionary-sized), and
    documents pick up per-word symbol counts through a broadcast join —
    the 100 TB corpus is scanned once and never carries symbol strings
    through a shuffle."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("word"),
    )
    dictionary = encode_words(toks.select("word").distinct(), merges).select(
        "word", "n_bpe"
    )
    per_doc = (
        toks.join(F.broadcast(dictionary), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0)).cast("bigint").alias("n_bpe_tokens"),
    )
