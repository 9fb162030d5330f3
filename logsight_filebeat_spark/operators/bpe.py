"""Distributed BPE tokenizer training (Sennrich et al. 2016) in pure
DataFrame ops — the "train a tokenizer on the corpus" stage of a
training-data pipeline, cross-engine deterministic so a DuckDB oracle can
retrain the identical merge table.

Scale shape (the whole point):
  * ONE corpus-sized shuffle — the word-frequency aggregate (map-side
    combine; hot words partial-aggregate before the exchange). Everything
    after runs on the VOCABULARY table (|vocab| ≪ corpus tokens; Heaps'
    law), so each merge iteration costs a vocab-sized scan + a tiny
    TakeOrdered, never a corpus rescan.
  * Symbol state is a single string per word, symbols joined by the unit
    separator chr(31): applying merge (a, b) is a literal left-to-right
    non-overlapping ``replace(sym, a∥US∥b, a∥b)`` — EXACTLY the greedy
    single-pass application of one BPE merge rule, and byte-identical
    semantics in Spark (UTF8_BINARY) and DuckDB. No per-row Python, no
    UDFs: the merge chain is nested codegen'd ``replace`` Columns.
  * Each iteration's argmax pair is a 1-row TakeOrdered collect —
    control-plane, like the k-means centroid loop (similarity.py); ties
    break (count DESC, left ASC, right ASC) in binary collation so both
    engines pick the same pair.

Constraint: corpus text must not contain chr(31) (the unit separator is
non-printing and never occurs in natural text); words are codepoint-split
via regexp ``(.)``, identical across engines for BMP text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from logsight_filebeat_spark.functions.caching import track_persist

US = "\x1f"  # unit separator — joins symbols inside one word's state string
END_MARK = "</w>"  # end-of-word symbol (Sennrich et al. 2016 convention)


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — lowercased whitespace-token frequencies. The ONE
    corpus-sized aggregate of BPE training; everything downstream is
    vocab-sized."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_symbols(col: Column | str = "word") -> Column:
    """Initial symbol state: codepoints joined by US, then the end-of-word
    marker — 'abc' → 'a␟b␟c␟</w>'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.regexp_replace(c, "(.)", "$1" + US), F.lit(END_MARK))


def apply_merges(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Chain the learned merges over a symbol-state string, in rank order.
    Each is one literal replace — left-to-right, non-overlapping — i.e. the
    greedy application of that merge rule in a single pass."""
    for a, b in merges:
        col = F.replace(col, F.lit(a + US + b), F.lit(a + b))
    return col


def pair_counts(words: DataFrame, sym_col: Column) -> DataFrame:
    """(left, right, cnt) — adjacent-symbol pair counts over the vocab,
    weighted by word frequency. Explode is bounded by word length (symbols
    per word ≤ chars + 1), so the exploded table is O(corpus vocab chars),
    not O(corpus tokens)."""
    arr = F.split(sym_col, US)
    # Guard the fully-merged case: once a word collapses to ONE symbol
    # (e.g. ('low','</w>') merging into 'low</w>'), size(arr)=1 and
    # sequence(1, 0) is a DESCENDING [1, 0] — element_at(arr, 0) throws.
    # Such words simply contribute no pairs.
    idx = F.when(
        F.size(arr) >= 2, F.sequence(F.lit(1), F.size(arr) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(arr, i).alias("left"),
            F.element_at(arr, i + 1).alias("right"),
        ),
    )
    return (
        words.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def learn_merges(
    df: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
    words: DataFrame | None = None,
) -> list[tuple[str, str, int]]:
    """Train ``num_merges`` BPE merges: [(left, right, cnt), ...] in rank
    order. Driver loop over vocab-sized jobs (word table persisted once);
    iteration i re-derives symbol state as the merge chain 0..i-1 applied
    to the initial codepoint split — nested codegen replaces, no
    iteration-over-corpus, no intermediate materialization to manage."""
    w = words if words is not None else track_persist(word_freqs(df, text_col))
    out: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        sym = apply_merges(bpe_symbols("word"), [(a, b) for a, b, _ in out])
        best = (
            pair_counts(w, sym)
            .orderBy(F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        r = best[0]
        out.append((r["left"], r["right"], r["cnt"]))
    return out


def merge_table(spark: SparkSession, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merges as a DataFrame: (rank, left, right, cnt)."""
    return spark.createDataFrame(
        [(i, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "rank int, left string, right string, cnt bigint",
    )


def vocab_token_counts(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, freq, n_tokens) — how many BPE tokens each vocab word
    segments into under the learned merges. Vocab-sized projection."""
    sym = apply_merges(bpe_symbols("word"), merges)
    return words.select(
        "word", "freq", F.size(F.split(sym, US)).alias("n_tokens")
    )


def doc_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token count under the learned merges — the
    budget/packing statistic a training pipeline needs per doc. The merge
    chain is applied inside a ``transform`` lambda over the doc's token
    array, then summed — a pure scan projection: no explode, no join, no
    shuffle. (With a huge merge table you'd broadcast-join a precomputed
    ``vocab_token_counts`` instead; for the Column-chain form the merge
    list is part of the plan.)"""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    per_word = F.transform(
        toks, lambda w: F.size(F.split(apply_merges(bpe_symbols(w), merges), US))
    )
    return df.select(
        F.col(id_col),
        F.coalesce(
            F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x), F.lit(0)
        ).alias("bpe_tokens"),
    )
