"""BPE tokenizer training semantics (operators/bpe.py) — hand-computed
merge sequence on the classic low/lower/newest corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from logsight_filebeat_spark.operators import bpe


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "low low low lower"), (2, "lower newest")],
        "doc_id bigint, text string",
    )


def test_word_freqs_and_initial_pairs(spark):
    w = {r.word: r.freq for r in bpe.word_freqs(_corpus(spark)).collect()}
    assert w == {"low": 3, "lower": 2, "newest": 1}

    counts = {
        (r.left, r.right): r.cnt
        for r in bpe.pair_counts(
            bpe.word_freqs(_corpus(spark)), bpe.bpe_symbols("word")
        ).collect()
    }
    assert counts[("l", "o")] == 5
    assert counts[("o", "w")] == 5
    assert counts[("w", bpe.END_MARK)] == 3
    assert counts[("w", "e")] == 3  # 2 from lower + 1 from newest


def test_learn_merges_hand_computed(spark):
    merges = bpe.learn_merges(_corpus(spark), num_merges=3)
    # tie at 5 between (l,o) and (o,w) breaks lexicographically to (l,o);
    # then (lo,w) 5; then (low,</w>) 3
    assert merges == [
        ("l", "o", 5),
        ("lo", "w", 5),
        ("low", bpe.END_MARK, 3),
    ]


def test_token_counts_after_merges(spark):
    merges = [(a, b) for a, b, _ in bpe.learn_merges(_corpus(spark), 3)]
    vt = {
        r.word: r.n_tokens
        for r in bpe.vocab_token_counts(
            bpe.word_freqs(_corpus(spark)), merges
        ).collect()
    }
    assert vt == {"low": 1, "lower": 4, "newest": 7}

    dt = {
        r.doc_id: r.bpe_tokens
        for r in bpe.doc_token_counts(_corpus(spark), merges).collect()
    }
    # doc 1: low(1)*3 + lower(4) = 7 ; doc 2: lower(4) + newest(7) = 11
    assert dt == {1: 7, 2: 11}
    # empty doc counts zero, not null
    empty = spark.createDataFrame([(9, "")], "doc_id bigint, text string")
    assert bpe.doc_token_counts(empty, merges).collect()[0].bpe_tokens == 0


def test_overlapping_pair_merges_left_to_right(spark):
    # "a a a a" with learned pair (a,a): greedy single pass → [aa, aa, </w>]
    df = spark.createDataFrame([(1, "aaaa")], "doc_id bigint, text string")
    merges = [(a, b) for a, b, _ in bpe.learn_merges(df, 1)]
    assert merges == [("a", "a")]
    [r] = bpe.doc_token_counts(df, merges).collect()
    assert r.bpe_tokens == 3  # aa, aa, </w>


def test_learn_merges_past_full_collapse_no_crash(spark):
    """Round-4 regression: merge 3 collapses 'low' to the single symbol
    'low</w>' — the pair builder must emit NO pairs for 1-symbol states
    (sequence(1, 0) is descending and element_at(arr, 0) throws) and
    training must continue over the remaining multi-symbol vocab."""
    merges = bpe.learn_merges(_corpus(spark), num_merges=5)
    # hand-computed continuation past the collapse: lower → low|e|r|</w>,
    # newest untouched; (e,r)=2 wins the tie lexicographically, then the
    # merged (er,</w>)=2
    assert merges == [
        ("l", "o", 5),
        ("lo", "w", 5),
        ("low", bpe.END_MARK, 3),
        ("e", "r", 2),
        ("er", bpe.END_MARK, 2),
    ]
