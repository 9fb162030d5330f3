"""Text-analysis functions for large-scale corpus pipelines.

All pure Column expressions (whole-stage codegen, no Python): tokenization,
quality scoring, language-ID by marker-word scoring, and document
fingerprinting. These are the per-document maps that precede dedup/routing in
a training-data pipeline; at 100 TB they run inside the scan stage with zero
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from logsight_filebeat_spark.functions.hashing import md5_hex

# small demo stopword list; production passes its own
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it")

# marker words per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped (split on \\s+)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: alpha runs, digit runs, and single
    punctuation each count as one token (a cheap BPE proxy)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    ).cast("bigint")


def stopword_ratio(col: Column | str, stopwords=STOPWORDS) -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return F.round(n_sw / F.greatest(F.size(toks), F.lit(1)), 6)


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.round(n_punct / F.greatest(F.length(c), F.lit(1)), 6)


def avg_token_length(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score(col: Column | str, stopwords=STOPWORDS) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane word length,
    some-but-not-all stopwords, low punctuation noise. Same closed formula
    is reproduced in the DuckDB oracle."""
    ntok = token_count(col)
    len_ok = F.when(ntok >= 10, F.lit(0.4)).otherwise(ntok.cast("double") * 0.04)
    awl = avg_token_length(col)
    awl_ok = F.when((awl >= 3) & (awl <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
    sw = stopword_ratio(col, stopwords)
    sw_ok = F.when((sw > 0) & (sw < 0.5), F.lit(0.2)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) < 0.1, F.lit(0.1)).otherwise(F.lit(0.0))
    return F.round(len_ok + awl_ok + sw_ok + punct_ok, 6)


def lang_scores(col: Column | str, markers=LANG_MARKERS) -> dict[str, Column]:
    toks = F.transform(tokens(col), F.lower)
    out = {}
    for lang, words in markers.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(col: Column | str, markers=LANG_MARKERS, min_hits: int = 1) -> Column:
    """argmax marker-hit language; ties broken by language-code order;
    'und' when no marker reaches min_hits."""
    scores = lang_scores(col, markers)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("hits"), F.lit(lang).alias("lang"))
            for lang in sorted(markers)
        ]
    )
    sorted_pairs = F.array_sort(
        pairs,
        lambda a, b: F.when(
            a.getField("hits") > b.getField("hits"), F.lit(-1)
        )
        .when(a.getField("hits") < b.getField("hits"), F.lit(1))
        .when(a.getField("lang") < b.getField("lang"), F.lit(-1))
        .when(a.getField("lang") > b.getField("lang"), F.lit(1))
        .otherwise(F.lit(0)),
    )
    top = F.element_at(sorted_pairs, 1)
    return F.when(top.getField("hits") >= min_hits, top.getField("lang")).otherwise(
        F.lit("und")
    )


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    lowercase token set — the classic near-canonical-form fingerprint."""
    c = F.col(col) if isinstance(col, str) else col
    canon = F.array_join(
        F.array_sort(F.array_distinct(F.transform(tokens(c), F.lower))), " "
    )
    return md5_hex(canon)


# ---------------------------------------------------------------------------
# Gopher-style quality filter signals (public heuristics from Rae et al.
# 2021, "Scaling Language Models" Appendix A) — pure Columns, zero shuffle
# ---------------------------------------------------------------------------

def _lines(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, "\n")


def symbol_word_ratio(col: Column | str) -> Column:
    """(# count + ellipsis count) per word — boilerplate/spam signal."""
    c = F.col(col) if isinstance(col, str) else col
    hashes = F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
    ellipses = (
        F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", ""))
    ) / 3 + (F.length(c) - F.length(F.regexp_replace(c, "…", "")))
    return F.round(
        (hashes + ellipses) / F.greatest(F.size(tokens(c)), F.lit(1)), 6
    )


def bullet_line_frac(col: Column | str) -> Column:
    """Fraction of lines starting with a bullet marker (-, *, •)."""
    lines = _lines(col)
    n = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    return F.round(n / F.greatest(F.size(lines), F.lit(1)), 6)


def ellipsis_line_frac(col: Column | str) -> Column:
    """Fraction of lines ending in an ellipsis (truncated boilerplate)."""
    lines = _lines(col)
    n = F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
    return F.round(n / F.greatest(F.size(lines), F.lit(1)), 6)


def alpha_word_frac(col: Column | str) -> Column:
    """Fraction of tokens containing at least one alphabetic character."""
    toks = tokens(col)
    n = F.size(F.filter(toks, lambda t: t.rlike(r"[A-Za-z]")))
    return F.round(n / F.greatest(F.size(toks), F.lit(1)), 6)


def distinct_stopword_count(col: Column | str, stopwords=STOPWORDS) -> Column:
    """How many DISTINCT stopwords appear (Gopher requires ≥ 2 — a document
    with language-like function-word variety, not one repeated token)."""
    toks = F.transform(tokens(col), F.lower)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(
        F.array_distinct(F.filter(toks, lambda t: F.array_contains(sw, t)))
    ).cast("bigint")


def gopher_pass(
    col: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_distinct_stopwords: int = 2,
    stopwords=STOPWORDS,
) -> Column:
    """The composed Gopher quality gate as one boolean Column. Thresholds
    default to the published values; callers tune per corpus."""
    ntok = token_count(col)
    awl = avg_token_length(col)
    return (
        (ntok >= min_words)
        & (ntok <= max_words)
        & (awl >= min_mean_word_len)
        & (awl <= max_mean_word_len)
        & (symbol_word_ratio(col) < max_symbol_word_ratio)
        & (bullet_line_frac(col) < max_bullet_line_frac)
        & (ellipsis_line_frac(col) < max_ellipsis_line_frac)
        & (alpha_word_frac(col) > min_alpha_word_frac)
        & (distinct_stopword_count(col, stopwords) >= min_distinct_stopwords)
    )


def chunk_tokens(
    col: Column | str, width: int = 128, overlap: int = 0
) -> Column:
    """Split a document into ~``width``-token chunks with ``overlap`` tokens
    of context carried between consecutive chunks (stride = width−overlap) —
    the standard training/RAG sequence-prep operator, as one array
    expression: array of (idx, chunk_text, n_tokens) structs (idx 0-based).
    The final chunk may be shorter; a chunk that would contain ONLY overlap
    (no new tokens) is never emitted, so every chunk past the first adds at
    least one fresh token; empty docs yield no chunks. Callers explode to
    rows; chunking itself never leaves the scan stage."""
    if not 0 <= overlap < width:
        raise ValueError(f"need 0 <= overlap < width, got {overlap}/{width}")
    stride = width - overlap
    toks = tokens(col)
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride))
    chunks = F.transform(
        F.filter(
            starts, lambda s: (s == 1) | (s + overlap <= F.size(toks))
        ),
        lambda s, i: F.struct(
            i.alias("idx"),
            F.array_join(F.slice(toks, s, width), " ").alias("chunk_text"),
            F.least(F.size(toks) - s + 1, F.lit(width)).alias("n_tokens"),
        ),
    )
    return F.when(F.size(toks) > 0, chunks).otherwise(
        F.array().cast(
            "array<struct<idx:int,chunk_text:string,n_tokens:int>>"
        )
    )


def sentence_count(col: Column | str) -> Column:
    """Terminal-punctuation-run count, floored at 1 (any non-empty text is
    at least one sentence)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.greatest(
        F.regexp_count(c, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("bigint")


def syllable_count(col: Column | str) -> Column:
    """Vowel-run syllable heuristic: each maximal [aeiouy] run counts as
    one syllable — the standard cheap estimator under readability
    formulas (exact syllabification needs a dictionary; the vowel-run
    proxy is within a few percent on English prose and, critically here,
    is a single RE2-able regex that runs in the scan)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[aeiouyAEIOUY]+")).cast("bigint")


def flesch_reading_ease(col: Column | str) -> Column:
    """Flesch reading ease (Flesch 1948): 206.835 − 1.015·(words/sentences)
    − 84.6·(syllables/words), rounded to 1e-6 — the classic prose-
    complexity quality signal (very low = legalese/boilerplate, very high
    = fragment soup; curation gates trim both tails). NULL when the text
    has no words. Pure codegen Columns, engine-portable double math (the
    division order is pinned so a SQL oracle reproduces every bit)."""
    c = F.col(col) if isinstance(col, str) else col
    w = token_count(c).cast("double")
    s = sentence_count(c).cast("double")
    sy = syllable_count(c).cast("double")
    return F.when(
        w > 0,
        F.round(
            F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (sy / w),
            6,
        ),
    )


def char_class_entropy(col: Column | str) -> Column:
    """Shannon entropy (bits) over FIVE character classes — letters,
    digits, whitespace, punctuation-ish symbols, other — the cheap
    garbled-content detector: natural prose sits near the class mix of
    its language, base64/minified/binary-pasted junk collapses toward
    one or two classes (low entropy) or an unnaturally flat mix (high).
    Class counts, not per-character distributions, so the whole thing is
    five scan-side regexp counts and a FIXED-ARITY unrolled sum — the
    float addition order is pinned by the expression tree itself, making
    the value bit-stable across partitionings and engines (a per-char
    distribution would need an FP-sum aggregate whose order floats).
    Rounded to 1e-6; NULL on empty text."""
    c = F.col(col) if isinstance(col, str) else col
    counts = [
        F.regexp_count(c, F.lit(r"[A-Za-z]")).cast("double"),
        F.regexp_count(c, F.lit(r"[0-9]")).cast("double"),
        F.regexp_count(c, F.lit(r"\s")).cast("double"),
        F.regexp_count(c, F.lit(r"[!-/:-@\[-`{-~]")).cast("double"),
    ]
    total = F.length(c).cast("double")
    other = total - counts[0] - counts[1] - counts[2] - counts[3]
    terms = counts + [other]
    ent = F.lit(0.0)
    for t in terms:
        p = t / total
        ent = ent + F.when(t > 0, -p * F.log2(p)).otherwise(F.lit(0.0))
    return F.when(total > 0, F.round(ent, 6))
