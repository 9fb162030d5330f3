"""Text cleaning + PII redaction — pre-training hygiene, pure Columns.

The standard first pass over raw web text before any dedup/quality work:
strip markup remnants, collapse whitespace, and mask personally
identifiable strings (emails, phone-ish numbers, IPs) with stable
placeholder tokens so downstream token statistics stay meaningful. All
whole-stage-codegen `regexp_replace` chains — zero shuffle, zero Python —
and every pattern is deliberately written in the common subset of Java
regex and RE2 so DuckDB oracles (and any porting target) reproduce the
bytes exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deliberately simple, dialect-portable patterns (no lookaround, no \b
# differences): production swaps in its own vetted PII patterns
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"(\d{1,3}\.){3}\d{1,3}"
PHONE_RE = r"\+?\d[\d -]{7,14}\d"
TAG_RE = r"<[^>]*>"


def strip_markup(col: Column | str) -> Column:
    """Remove angle-bracket tag remnants, then collapse runs of spaces/tabs
    (newlines preserved — line structure feeds the quality signals)."""
    c = F.col(col) if isinstance(col, str) else col
    no_tags = F.regexp_replace(c, TAG_RE, " ")
    collapsed = F.regexp_replace(no_tags, r"[ \t]+", " ")
    return F.trim(collapsed)


def redact_pii(col: Column | str) -> Column:
    """Mask emails, IPv4s, and phone-shaped digit runs with fixed
    placeholder tokens (order matters: emails first — an address would
    otherwise be half-eaten by the phone pattern's digit runs)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IPV4_RE, "<IP>")
    c = F.regexp_replace(c, PHONE_RE, "<PHONE>")
    return c


def clean_text(col: Column | str) -> Column:
    """The composed hygiene pass: markup strip → PII redaction."""
    return redact_pii(strip_markup(col))


# block-level html boundary tags: splitting on these yields candidate
# content blocks (the jusText/trafilatura-style segmentation granularity)
BLOCK_BOUNDARY_RE = (
    r"(?i)</?(?:p|div|td|li|h[1-6]|article|section|br|tr|table|ul|ol|pre"
    r"|nav|header|footer|aside|title|head|body|html)[^>]*>"
)


def main_content(
    col: Column | str, min_chars: int = 40, min_density_pct: int = 50
) -> Column:
    """Boilerplate removal by block text density (the jusText/Boilerpipe
    family of heuristics): split html into blocks at block-level tag
    boundaries, strip inline markup per block, keep blocks whose retained
    text is long enough (≥ ``min_chars``) AND dense enough (text chars ≥
    ``min_density_pct``% of the raw block — navigation/link farms are
    mostly markup, body prose is mostly text), join survivors with
    newlines.

    Pure array/regexp Columns — whole-stage codegen in the scan, zero
    Python, zero shuffle — so the 100-TB boilerplate pass costs exactly
    one corpus read. Density compares in integer arithmetic
    (``len·100 ≥ pct·raw``) so the keep decision is engine-exact; every
    pattern stays in the Java-regex ∩ RE2 common subset for DuckDB
    oracles."""
    c = F.col(col) if isinstance(col, str) else col
    blocks = F.split(c, BLOCK_BOUNDARY_RE)
    scored = F.transform(
        blocks,
        lambda b: F.struct(
            F.trim(F.regexp_replace(b, TAG_RE, "")).alias("txt"),
            F.length(b).alias("raw"),
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["txt"]) >= min_chars)
        & (F.length(s["txt"]) * 100 >= s["raw"] * min_density_pct),
    )
    return F.array_join(F.transform(kept, lambda s: s["txt"]), "\n")


def mojibake_signals(col):
    """Tell-tale double-decode (UTF-8 read as Latin-1) sequence counts --
    the ftfy-style mojibake detector: '\u00c3\u00a9'-class pairs
    (\u00c3/\u00c2 followed by a Latin-1-continuation char) and the
    '\u00e2\u0080\u0099'-family punctuation triples almost never occur
    in clean prose but are exactly what a mis-decoded UTF-8 byte stream
    renders as. Returns (n_pairs, n_punct) integer counts as a struct
    Column -- pure scan-side regexp counts, no UDF; gate on
    n_pairs + n_punct > 0 (or a rate) to route docs to an encoding-repair
    pass instead of silently training on garbage."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    pairs = F.regexp_count(c, F.lit("[\u00c3\u00c2][\u00a0-\u00ff]"))
    punct = F.regexp_count(c, F.lit("\u00e2\u0080[\u0090-\u00ff]"))
    return F.struct(
        pairs.cast("bigint").alias("n_pairs"),
        punct.cast("bigint").alias("n_punct"),
    )


def pii_counts(col):
    """Per-class PII occurrence counts (emails, IPv4s, phone numbers) as a
    struct Column — the AUDIT side of :func:`redact_pii`: redaction
    destroys the evidence, so compliance reporting needs the counts
    BEFORE the rewrite (how much PII does each source/host leak, is a
    crawl slice safe to release). Same regexes as the redactor, so the
    report and the rewrite can never disagree about what counts as PII;
    pure scan-side regexp counts."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(c, F.lit(IPV4_RE)).cast("bigint").alias("n_ipv4"),
        F.regexp_count(c, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
    )
