"""Vectorized parse stage: multiline join + grok/dissect pattern extraction.

The reference delegates these to the Beats framework (multiline joining and
dissect processors are framework capabilities configured by the plugin — dep
at /root/reference/go.mod:139, embedded at /root/reference/filebeat/main.go:35-39).
Per SURVEY §2 ("Capabilities inherited from the Beats framework") our engine
owns them natively:

* ``multiline_join`` — continuation lines (default: leading whitespace, the
  stack-trace shape) merge into the preceding event. Implemented with Spark
  higher-order functions (split + aggregate fold) — fully JVM-side, per-page,
  no cross-row state, no Python. At 100 TB this is a narrow map over the scan.

* Grok — a pattern like ``%{NOTSPACE:timestamp} %{WORD:level}
  %{GREEDYDATA:message}`` compiles ONCE on the driver into (a) a Java regex
  for the native Column path (regexp_extract per field, whole-stage codegen)
  and (b) a Python regex for the Arrow-vectorized ``mapInPandas`` path (one
  precompiled match per row over Arrow batches — the north rule's vectorized
  grok stage for patterns too heavy for codegen or needing byte-exact Python
  `re` semantics). Both paths are tested byte-identical against a
  single-threaded Python oracle (input_hint invariant).

Grok base patterns are the public grok vocabulary (non-capturing internals so
field ⇒ capture-group index is positional).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# public grok base vocabulary (subset); internals non-capturing
BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "YEAR": r"\d{4}",
    "TIMESTAMP_ISO8601": (
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(?::\d{2})?(?:\.\d+)?"
        r"(?:Z|[+-]\d{2}:?\d{2})?"
    ),
    "LOGLEVEL": (
        r"(?:INFO|WARNING|WARN|FINER|FINE|DEBUG|ERROR|ERR|EXCEPTION|SEVERE"
        r"|TRACE|FATAL|CRITICAL)"
    ),
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "URIPATH": r"(?:/[A-Za-z0-9_.%$+!*'(),~:;=@#-]*)+",
    "QS": r"\"[^\"]*\"",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


@dataclass(frozen=True)
class CompiledGrok:
    """Driver-side compiled grok pattern (compile once, run everywhere —
    the analogue of the reference hoisting regexp.Compile to config time,
    plugin/config.go:42)."""

    source: str
    regex: str  # RE2∩Java∩Python-safe
    fields: tuple[str, ...]  # capture-group order, group i+1 = fields[i]

    @property
    def python(self) -> re.Pattern:
        # re.ASCII pins \w/\s/\b/\d to their RE2/Java (ASCII) definitions —
        # without it Python's unicode classes diverge from the native Column
        # path (and from the Go-RE2 reference) on non-ASCII word characters,
        # silently breaking the byte-identity invariant
        return re.compile(self.regex, re.ASCII)


def compile_grok(pattern: str, extra_patterns: dict[str, str] | None = None) -> CompiledGrok:
    """Expand %{BASE:field} refs into one regex with positional groups.
    Unnamed refs (%{BASE}) expand non-capturing. Unknown base ⇒ ValueError
    at compile time (driver), mirroring config.go:42-45."""
    vocab = {**BASE_PATTERNS, **(extra_patterns or {})}
    fields: list[str] = []

    def sub(m: re.Match) -> str:
        base, field = m.group(1), m.group(2)
        if base not in vocab:
            raise ValueError(f"unknown grok pattern %{{{base}}}")
        if field:
            fields.append(field)
            return f"({vocab[base]})"
        return f"(?:{vocab[base]})"

    regex = _GROK_REF.sub(sub, pattern)
    if not fields:
        raise ValueError(f"grok pattern {pattern!r} captures no fields")
    re.compile(regex)  # validate now, on the driver
    return CompiledGrok(source=pattern, regex=regex, fields=tuple(fields))


# ---------------------------------------------------------------------------
# dissect — literal-delimiter tokenization (the cheap non-regex path)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CompiledDissect:
    """Beats-style dissect pattern: ``%{a} %{b} - %{rest}`` splits on the
    exact literal delimiters between fields; the final field takes the
    remainder. No regex at runtime — whole-stage-codegen string finds."""

    source: str
    fields: tuple[str, ...]
    delimiters: tuple[str, ...]  # len == len(fields) - 1; literal separators


_DISSECT_REF = re.compile(r"%\{(\w+)\}")


def compile_dissect(pattern: str) -> CompiledDissect:
    """Compile on the driver; errors eagerly like compile_grok. The pattern
    must start with a field and alternate field/delimiter (a leading literal
    prefix is folded into the first delimiter check by stripping it)."""
    parts = _DISSECT_REF.split(pattern)
    # parts = [prefix, f1, d1, f2, d2, ..., fn, suffix]
    if len(parts) < 3 or parts[0] != "":
        raise ValueError(
            f"dissect pattern {pattern!r} must start with a %{{field}}"
        )
    if parts[-1] != "":
        raise ValueError(
            f"dissect pattern {pattern!r} must end with a %{{field}} "
            "(the last field takes the remainder)"
        )
    fields = tuple(parts[1::2])
    delimiters = tuple(parts[2:-1:2])
    if any(d == "" for d in delimiters):
        raise ValueError(
            f"dissect pattern {pattern!r} has adjacent fields with no "
            "literal delimiter between them"
        )
    if len(set(fields)) != len(fields):
        raise ValueError(f"dissect pattern {pattern!r} repeats a field name")
    return CompiledDissect(source=pattern, fields=fields, delimiters=delimiters)


def dissect_native(col: Column | str, dissect: CompiledDissect) -> Column:
    """One struct column of captures; NULL struct when any delimiter is
    missing (row failure, matching the grok no-match semantics). Pure
    substring arithmetic on ``instr`` positions — no regex engine at all,
    the cheapest extraction path for fixed-layout records."""
    c = F.col(col) if isinstance(col, str) else col
    remaining = c
    values: list[Column] = []
    ok = F.lit(True)
    for delim in dissect.delimiters:
        pos = F.instr(remaining, F.lit(delim))  # 1-based; 0 = not found
        ok = ok & (pos > 0)
        values.append(F.substring(remaining, 1, pos - 1))
        remaining = F.substring(
            remaining, pos + len(delim), F.length(remaining)
        )
    values.append(remaining)
    struct = F.struct(
        *[v.alias(name) for v, name in zip(values, dissect.fields)]
    )
    return F.when(ok, struct)


def with_dissect(
    df: DataFrame, col: str, dissect: CompiledDissect, out: str = "parsed"
) -> DataFrame:
    return df.withColumn(out, dissect_native(col, dissect))


# ---------------------------------------------------------------------------
# multiline join
# ---------------------------------------------------------------------------

DEFAULT_CONTINUATION = r"^\s"

# boundary-split equivalent of the ^\s continuation fold: an event boundary
# is a \n whose NEXT char is not an intra-line whitespace char. (\n itself is
# excluded from the class: an empty line does not match ^\s, so it starts a
# new event — `\n(?!\s)` would get that wrong.) Splitting on boundaries
# yields exactly the fold's events, with ~zero allocation per line instead of
# a struct-accumulator fold — the measured hot spot of the parse stage.
_DEFAULT_BOUNDARY_RE = r"\n(?![ \t\x0B\f\r])"


def multiline_join(
    text: Column | str, continuation: str = DEFAULT_CONTINUATION
) -> Column:
    """Fold a page's lines into logical events: a line matching
    ``continuation`` appends (with \\n) to the previous event. Returns
    array<string>. Pure Column expressions — no shuffle, no UDF.

    Fast path: for the default ``^\\s`` continuation the fold is equivalent
    to one regex split on event boundaries (proof in _DEFAULT_BOUNDARY_RE
    comment; pinned by tests against the general fold). Other continuation
    patterns use the general higher-order-function fold."""
    col = F.col(text) if isinstance(text, str) else text
    if continuation == DEFAULT_CONTINUATION:
        return F.split(col, _DEFAULT_BOUNDARY_RE)
    lines = F.split(col, "\n")
    acc_type = "struct<events:array<string>,cur:string>"
    folded = F.aggregate(
        lines,
        F.struct(
            F.array().cast("array<string>").alias("events"),
            F.lit(None).cast("string").alias("cur"),
        ),
        lambda acc, x: F.when(
            x.rlike(continuation) & acc.getField("cur").isNotNull(),
            F.struct(
                acc.getField("events").alias("events"),
                F.concat(acc.getField("cur"), F.lit("\n"), x).alias("cur"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc.getField("cur").isNull(), acc.getField("events")
                )
                .otherwise(F.array_append(acc.getField("events"), acc.getField("cur")))
                .alias("events"),
                x.alias("cur"),
            )
        ),
        lambda acc: F.when(
            acc.getField("cur").isNull(), acc.getField("events")
        ).otherwise(F.array_append(acc.getField("events"), acc.getField("cur"))),
    )
    return folded.cast("array<string>")


def explode_multiline(
    df: DataFrame, text_col: str = "text", out_col: str = "event_text",
    continuation: str = DEFAULT_CONTINUATION,
) -> DataFrame:
    """pages → one row per logical event, event index preserved (the
    harvester emitting events per file, filebeat/main.go:27-30)."""
    events = multiline_join(text_col, continuation)
    return df.select(
        "*", F.posexplode(events).alias("event_idx", out_col)
    )


# ---------------------------------------------------------------------------
# grok execution — native Column path
# ---------------------------------------------------------------------------

def grok_native(col: Column | str, grok: CompiledGrok) -> Column:
    """One struct column of captures; NULL struct when no match (the row
    failure of mapper.go:145-150 — NOT an empty string). Each field is one
    regexp_extract; Catalyst codegens these with a cached compiled pattern,
    and common-subexpression elimination shares the match work."""
    c = F.col(col) if isinstance(col, str) else col
    matched = c.rlike(grok.regex)
    fields = [
        F.regexp_extract(c, grok.regex, i + 1).alias(name)
        for i, name in enumerate(grok.fields)
    ]
    return F.when(matched, F.struct(*fields))


def with_grok_native(
    df: DataFrame, col: str, grok: CompiledGrok, out: str = "parsed"
) -> DataFrame:
    return df.withColumn(out, grok_native(col, grok))


# ---------------------------------------------------------------------------
# grok execution — Arrow-vectorized path (mapInPandas)
# ---------------------------------------------------------------------------

def with_grok_vectorized(
    df: DataFrame, col: str, grok: CompiledGrok, out: str = "parsed"
) -> DataFrame:
    """Single mapInPandas stage applying the precompiled pattern once per row
    over Arrow batches (north rule: batched re2-style matchers; no per-row
    Python *interpretation* — the regex engine is C). All pre/post logic
    stays in Columns; this is the only JVM→Python hop in the pipeline
    (SURVEY §4.2). Fields come back as a struct column, NULL on no-match —
    byte-identical to grok_native and to the single-threaded oracle.

    Hot-path shape: ONE ``str.extract`` pass per batch (no separate contains
    check — compile_grok only emits non-optional capture groups, so group 1
    participates in every match and NaN there ⇔ no match), captures cross
    Arrow as flat string columns, and the struct is assembled JVM-side.
    Per-row Python objects (dict-per-row) would dominate the stage cost."""
    flat = [f"__{out}_{f}" for f in grok.fields]
    ok_col = f"__{out}_ok"
    mid_schema = T.StructType(
        df.schema.fields
        + [T.StructField(c, T.StringType()) for c in flat]
        + [T.StructField(ok_col, T.BooleanType())]
    )
    regex = grok.regex

    def run(batches: Iterator) -> Iterator:
        # compile once per worker task; re.ASCII = RE2/Java class semantics
        # (see CompiledGrok.python) so captures stay byte-identical to the
        # native Column path on non-ASCII input
        pat = re.compile(regex, re.ASCII)

        for pdf in batches:
            pdf = pdf.copy()
            ext = pdf[col].str.extract(pat)  # one C-vectorized pass
            ok = ext.iloc[:, 0].notna()
            for i, c in enumerate(flat):
                pdf[c] = ext.iloc[:, i]
            pdf[ok_col] = ok
            yield pdf

    mid = df.mapInPandas(run, schema=mid_schema)
    struct = F.when(
        F.col(ok_col),
        F.struct(*[F.col(c).alias(f) for c, f in zip(flat, grok.fields)]),
    )
    return mid.withColumn(out, struct).drop(*flat, ok_col)
