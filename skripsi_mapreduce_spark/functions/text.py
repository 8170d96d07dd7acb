r"""Text tokenization as built-in higher-order column functions.

Reference semantics (SURVEY.md §2.1 O5-O8; MapperExtractTransform.java:74-84):
lowercase -> regex tokenize with sklearn's default pattern ``(?u)\b\w\w+\b``
-> drop stopwords -> keep only dictionary (vocabulary) words, preserving
duplicates and order.

Everything here stays inside whole-stage codegen: ``regexp_extract_all`` +
``filter`` higher-order functions, no Python UDFs. Stopword/vocab sets ride
along as array literals — fine up to a few thousand words; for very large
vocabularies use the explode + broadcast-join path in operators/tfidf.py
(the scale-out equivalent of the reference's distributed-cache HashSet,
MapperExtractTransform.java:48-62).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

# sklearn's default token_pattern, as hand-coded at MapperExtractTransform.java:75.
# (?U) = Java's UNICODE_CHARACTER_CLASS so \w matches what Python/sklearn's
# (?u)\w matches; without it Java \w is ASCII-only and drops accented tokens.
TOKEN_PATTERN = r"(?U)\b\w\w+\b"


def tokenize_col(
    text: Column | str,
    stopwords: Iterable[str] | None = None,
    vocab: Iterable[str] | None = None,
) -> Column:
    """lower -> regex tokenize -> stopword removal -> vocabulary filter.

    Duplicate tokens are preserved (term frequency depends on them), which
    is why this uses ``filter(...)`` and not ``array_except`` (set
    semantics would drop duplicates).
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), F.lit(0))
    if stopwords is not None:
        stop_arr = F.lit(sorted(set(stopwords)))
        toks = F.filter(toks, lambda t: ~F.array_contains(stop_arr, t))
    if vocab is not None:
        vocab_arr = F.lit(sorted(set(vocab)))
        toks = F.filter(toks, lambda t: F.array_contains(vocab_arr, t))
    return toks
