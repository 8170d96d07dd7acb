"""BPE tokenizer training (operators/bpe.py): known-value merges, parity
with a hand-rolled Python BPE oracle, and the apply/count path."""

from __future__ import annotations

from collections import Counter

from skripsi_mapreduce_spark.operators.bpe import (
    bpe_token_count,
    encode_words,
    learn_bpe,
    word_counts,
)


def _python_bpe(word_cnt: dict[str, int], n_merges: int) -> list[tuple[str, str, int]]:
    """Reference BPE (Sennrich et al.): greedy left-to-right non-overlap
    merge application, argmax ties on (count desc, left asc, right asc)."""
    seqs = {tuple(w): c for w, c in word_cnt.items()}
    out = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in seqs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((a, b, c))
        new = {}
        for syms, cnt in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new[key] = new.get(key, 0) + cnt
        seqs = new
    return out


def test_learn_bpe_known_values(spark):
    # 'abab' x3, 'abc' x2: pair counts round 1: (a,b)=3*2+2=8 wins
    # round 2 (on merged seqs): ('ab','ab')=3, ('ab','c')=2 -> ('ab','ab')
    df = spark.createDataFrame(
        [(1, "abab abab abab abc abc")], ["doc_id", "text"]
    )
    merges = learn_bpe(df, n_merges=2)
    assert [(m.left, m.right, m.count) for m in merges] == [("a", "b", 8), ("ab", "ab", 3)]
    assert merges[1].merged == "abab"


def test_learn_bpe_matches_python_oracle(spark):
    rows = [
        (1, "the theme there then the"),
        (2, "other mother the brother"),
        (3, "there then theme theme"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    wc = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    want = _python_bpe(wc, 6)
    got = [(m.left, m.right, m.count) for m in learn_bpe(df, n_merges=6)]
    assert got == want


def test_encode_words_applies_merges_in_order(spark):
    df = spark.createDataFrame([(1, "abab abab abc")], ["doc_id", "text"])
    merges = learn_bpe(df, n_merges=2)  # (a,b) then (ab,ab)
    words = spark.createDataFrame([("abab",), ("abc",), ("ba",)], ["word"])
    got = {r["word"]: (r["bpe_seq"], r["n_bpe"]) for r in encode_words(words, merges).collect()}
    assert got["abab"] == ("abab", 1)
    assert got["abc"] == ("ab c", 2)
    assert got["ba"] == ("b a", 2)  # no merge applies to reversed pair


def test_bpe_token_count_compresses_corpus(spark):
    df = spark.createDataFrame(
        [(1, "abab abab"), (2, "abc abc abc"), (3, "")], ["doc_id", "text"]
    )
    # merge 1: (a,b) count 7; merge 2: (ab,c) count 3 beats (ab,ab) count 2
    merges = learn_bpe(df, n_merges=2)
    assert [(m.left, m.right) for m in merges] == [("a", "b"), ("ab", "c")]
    out = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in
           bpe_token_count(df, merges).collect()}
    assert out[1] == (2, 4)  # 'abab' -> 'ab ab'
    assert out[2] == (3, 3)  # 'abc' -> single merged symbol
    assert out[3] == (0, 0)
    # a trained tokenizer must not EXPAND the corpus vs characters
    assert all(bpe <= 4 * words for words, bpe in out.values() if words)


def test_learn_bpe_ansi_session(spark):
    """Regression (round-2 driver red row): _apply_merge's rebuild read
    element_at(sel, i) for i up to n while sel has n-1 entries, crashing
    with INVALID_ARRAY_INDEX_IN_ELEMENT_AT under an ANSI-enabled session
    (the external driver runs Spark 4's default ANSI-on; the repo's own
    sessions force it off at session.py:54). try_element_at makes the
    out-of-range read NULL under both configs."""
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        # 3-symbol word reproduces the crash (index 3, array of 2)
        df = spark.createDataFrame([(1, "abc abc ab")], ["doc_id", "text"])
        merges = learn_bpe(df, n_merges=2)
        assert [(m.left, m.right, m.count) for m in merges] == [
            ("a", "b", 3),
            ("ab", "c", 2),
        ]
        out = {r["doc_id"]: r["n_bpe_tokens"] for r in
               bpe_token_count(df, merges).collect()}
        assert out[1] == 3  # 'abc','abc' -> 1 each; 'ab' -> 1
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
