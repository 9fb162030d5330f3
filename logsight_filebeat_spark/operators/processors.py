"""Beats processor suite — the libbeat event-pipeline processors the
reference's shipper runs under, re-expressed as Catalyst column plans.

The reference is a Beats output plugin (/root/reference/plugin/plugin.go:21,
registered via the libbeat framework dep /root/reference/go.mod:139); every
event it ships first passes the framework's processor chain configured in
filebeat.yml. The plugin repo configures these rather than implementing them,
so this module owns them natively — each processor compiles to pure Column
expressions (zero Python in the hot path) and a whole CHAIN collapses into a
single Catalyst Project over the scan (CollapseProject), i.e. the per-event
interpreter loop Beats runs becomes one codegen'd projection at 10^12-row
scale.

Covered (libbeat `processors:` config surface):
  * conditions — `when:` clauses: equals / contains / regexp / range /
    has_fields + and / or / not combinators → ``compile_condition``
  * drop_event (condition-gated row filter)
  * add_fields / rename / copy_fields / drop_fields / include_fields
  * convert (typed casts, ignore_missing / error-tag semantics)
  * decode_json_fields (malformed ⇒ error tag, never a task failure)
  * decode_csv_fields (RFC4180 quoting via from_csv)
  * fingerprint (md5 / sha256 over a canonical field encoding)
  * truncate_fields (BYTE-budget truncation, UTF-8-boundary-safe)
  * urldecode
  * rate_limit (deterministic batch analogue: first K per key+window)
  * detect_mime_type (magic-byte sniffing over binary columns)

Scale notes: every processor is a projection or a filter — no shuffle, no
UDF, no driver loop. ``compile_chain`` folds N processors into consecutive
``select``s that Catalyst collapses to ONE Project (pinned by
tests/test_plans_explain.py), so chain length never multiplies scan cost.
rate_limit is the one windowed member: it shuffles once on (key, window) —
the same partitioning its downstream per-key sinks need anyway.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logsight_filebeat_spark.functions.hashing import md5_hex

# ---------------------------------------------------------------------------
# conditions (libbeat `when:`)
# ---------------------------------------------------------------------------

_RANGE_OPS = {"gt": "__gt__", "gte": "__ge__", "lt": "__lt__", "lte": "__le__"}


def compile_condition(cond: Mapping[str, Any]) -> Column:
    """Compile a Beats `when:` condition dict to a boolean Column.

    Supported keys (exactly one per dict, like the Beats YAML):
      equals: {field: value, ...}        — all pairs must match (AND)
      contains: {field: substring, ...}  — substring match, AND across pairs
      regexp: {field: pattern, ...}      — RE2-style match, AND across pairs
      range: {field: {gt/gte/lt/lte: num, ...}, ...}
      network: {field: cidr|name|[...], ...} — IPv4 CIDR / named-range
        membership (enrich.py::network_match); list = any-of
      has_fields: [field, ...]           — all present AND non-null
      and / or: [cond, ...]              — combinators
      not: cond

    NULL semantics: a comparison against a NULL field is FALSE (the event
    lacks the field ⇒ the condition doesn't hold), never NULL. Each leaf is
    built two-valued with PUSHABLE primitives — eqNullSafe for equals,
    isNotNull AND pred otherwise — rather than coalesce(..., false), which
    Catalyst cannot translate to parquet filters: the same condition then
    prunes row groups at the scan (plan-pinned in test_plans_explain.py).
    """
    if len(cond) != 1:
        raise ValueError(f"condition must have exactly one key: {cond!r}")
    (kind, body), = cond.items()
    if kind == "and":
        out = compile_condition(body[0])
        for c in body[1:]:
            out = out & compile_condition(c)
        return out
    if kind == "or":
        out = compile_condition(body[0])
        for c in body[1:]:
            out = out | compile_condition(c)
        return out
    if kind == "not":
        return ~compile_condition(body)
    if kind == "has_fields":
        out = F.lit(True)
        for f in body:
            out = out & F.col(f).isNotNull()
        return out

    leaves = []
    if kind == "equals":
        for f, v in sorted(body.items()):
            leaves.append(F.col(f).eqNullSafe(F.lit(v)))
    elif kind == "contains":
        for f, v in sorted(body.items()):
            leaves.append(
                F.col(f).isNotNull() & F.contains(F.col(f), F.lit(v))
            )
    elif kind == "regexp":
        for f, v in sorted(body.items()):
            leaves.append(F.col(f).isNotNull() & F.col(f).rlike(v))
    elif kind == "network":
        from logsight_filebeat_spark.operators.enrich import network_match

        for f, spec in sorted(body.items()):
            leaves.append(network_match(F.col(f), spec))
    elif kind == "range":
        for f, ops in sorted(body.items()):
            for op, v in sorted(ops.items()):
                if op not in _RANGE_OPS:
                    raise ValueError(f"range op {op!r} not in {sorted(_RANGE_OPS)}")
                leaves.append(
                    F.col(f).isNotNull()
                    & getattr(F.col(f), _RANGE_OPS[op])(F.lit(v))
                )
    else:
        raise ValueError(f"unsupported condition kind: {kind!r}")
    if not leaves:
        raise ValueError(f"empty condition body: {cond!r}")
    out = leaves[0]
    for leaf in leaves[1:]:
        out = out & leaf
    return out


def drop_event(df: DataFrame, when: Mapping[str, Any]) -> DataFrame:
    """drop_event processor: remove rows matching the condition. A pure
    filter — pushes into the scan when the condition references only scan
    columns."""
    return df.where(~compile_condition(when))


# ---------------------------------------------------------------------------
# field-shape processors (projection-only)
# ---------------------------------------------------------------------------


def rename_fields(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """rename processor: {from: to}. Fails at compile time if `from` is
    missing or `to` already exists (Beats' fail_on_error default) — never
    at runtime. The checks must run BEFORE withColumnRenamed: Spark's
    rename is a silent no-op for a missing source, which would let a typo'd
    config drop the target column without a trace."""
    out = df
    for src, dst in mapping.items():
        if src not in out.columns:
            raise ValueError(f"rename source {src!r} missing")
        if dst in out.columns:
            raise ValueError(f"rename target {dst!r} already exists")
        out = out.withColumnRenamed(src, dst)
    return out


def copy_fields(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """copy_fields processor: {from: to}, `to` must not exist."""
    out = df
    for src, dst in mapping.items():
        if dst in out.columns:
            raise ValueError(f"copy_fields target {dst!r} exists")
        out = out.withColumn(dst, F.col(src))
    return out


def drop_fields(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    return df.drop(*fields)


def include_fields(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    return df.select(*fields)


# ---------------------------------------------------------------------------
# convert
# ---------------------------------------------------------------------------


def convert_fields(
    df: DataFrame,
    conversions: Sequence[Mapping[str, str]],
    error_col: str = "_convert_error",
    gate: Column | None = None,
) -> DataFrame:
    """convert processor: [{"from": col, "to": out_col?, "type": t}, ...].

    Semantics (Beats convert, fail_on_error:false + tagging): each
    conversion try_casts — an unconvertible value yields NULL in the output
    field and appends the field name to ``error_col`` (array of failed
    field names, empty when clean); the row itself NEVER fails (ANSI-mode
    safe). ``to`` defaults to in-place.

    With a ``gate`` (the per-processor "when" condition), non-matching rows
    are untouched: in-place targets keep the original value, new targets
    are NULL, and the error array is empty — the processor simply did not
    run for that row."""
    # Error flags evaluate BEFORE any in-place replacement (a conversion
    # with to == from overwrites its own source; tagging must see the
    # original value, not the casted NULL).
    errs: list[Column] = []
    for c in conversions:
        src, typ = c["from"], c["type"]
        casted = F.col(src).try_cast(typ)
        flag = F.when(
            F.col(src).isNotNull() & casted.isNull(), F.lit(src)
        )
        if gate is not None:
            flag = F.when(gate, flag)
        errs.append(flag)
    out = df.withColumn(
        error_col,
        F.array_compact(F.array(*errs)) if errs else F.array().cast("array<string>"),
    )
    for c in conversions:
        src, typ = c["from"], c["type"]
        dst = c.get("to", src)
        casted = F.col(src).try_cast(typ)
        if gate is not None:
            old = (
                F.col(dst)
                if dst in out.columns
                else F.lit(None).cast(typ)
            )
            casted = F.when(gate, casted).otherwise(old)
        out = out.withColumn(dst, casted)
    return out


# ---------------------------------------------------------------------------
# decode_json_fields / decode_csv_fields
# ---------------------------------------------------------------------------


def decode_json_fields(
    df: DataFrame,
    field: str,
    schema: str,
    target: str = "decoded",
    error_col: str = "_json_error",
) -> DataFrame:
    """decode_json_fields processor: parse a JSON-string column into a typed
    struct column.

    Error semantics (add_error_key:true): ``error_col`` is TRUE iff the
    field is non-null but not valid JSON — ANY valid JSON value (object,
    array, scalar) counts as valid, exactly Beats' strict Go decoder.
    Spark's JSON paths (from_json, try_parse_json) are all PREFIX-LENIENT:
    they accept a valid value followed by trailing garbage, and the
    variant probe even accepts a bare leading scalar (so '"k": 1}' — an
    object with its '{' cut off — would read as the string '"k"'). The
    probe therefore pairs ``try_parse_json`` with a structural anchor
    guard: a trimmed object must end '}', an array must end ']', and a
    scalar must BE a complete number/string/true/false/null. (A
    balanced-looking double-terminated doc like '{"a":1}}' can still slip
    the guard — the one residual leniency, unreachable by truncation-style
    corruption.) All checks are codegen Columns in one stage, no UDF;
    invalidity stays distinguishable from merely-missing keys."""
    col = F.col(field)
    t = F.trim(col)
    shape = (
        (t.startswith("{") & t.endswith("}"))
        | (t.startswith("[") & t.endswith("]"))
        | t.rlike(r'^"(?:[^"\\]|\\.)*"$')
        | t.rlike(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")
        | t.isin("true", "false", "null")
    )
    return df.withColumn(target, F.from_json(col, schema)).withColumn(
        error_col,
        col.isNotNull() & ~(F.try_parse_json(col).isNotNull() & shape),
    )


def decode_csv_fields(
    df: DataFrame,
    field: str,
    schema: str,
    target: str = "decoded",
    sep: str = ",",
) -> DataFrame:
    """decode_csv_fields processor: parse an RFC4180 CSV line (quoted fields,
    doubled quotes, embedded separators/newlines) into a typed struct via
    the JVM univocity parser (`from_csv`) — never a hand-split. The
    escape option is pinned to '"' (RFC4180 doubled-quote escaping);
    Spark's default escape is backslash, which silently mis-parses
    fields holding doubled quotes."""
    return df.withColumn(
        target, F.from_csv(F.col(field), schema, {"sep": sep, "escape": '"'})
    )


def to_csv_line(cols: Sequence[Column | str], sep: str = ",") -> Column:
    """RFC4180 encoder matching decode_csv_fields: a field containing the
    separator, a double quote, or a newline is wrapped in quotes with inner
    quotes doubled. Pure Column — the encoder half of a CSV sink."""
    parts = []
    for c in cols:
        c = F.col(c) if isinstance(c, str) else c
        s = c.cast("string")
        needs = (
            F.contains(s, F.lit(sep))
            | F.contains(s, F.lit('"'))
            | F.contains(s, F.lit("\n"))
        )
        quoted = F.concat(
            F.lit('"'), F.replace(s, F.lit('"'), F.lit('""')), F.lit('"')
        )
        parts.append(F.when(needs, quoted).otherwise(s))
    return F.concat_ws(sep, *parts)


# ---------------------------------------------------------------------------
# fingerprint
# ---------------------------------------------------------------------------


def fingerprint(
    fields: Sequence[Column | str],
    names: Sequence[str],
    method: str = "sha256",
) -> Column:
    """fingerprint processor: a stable content hash over selected fields.

    Canonical encoding (documented, engine-portable): fields sorted by NAME,
    each contributing ``name|value`` with NULL rendering as the empty
    string, segments joined by ``|``; the hash is the lowercase hex md5 /
    sha256 of the UTF-8 bytes. Matches DuckDB's md5()/sha256() byte-for-byte
    so fingerprints survive an engine migration — the property that makes
    them usable as cross-system dedup keys."""
    if len(fields) != len(names):
        raise ValueError("fields and names must align")
    ordered = sorted(zip(names, fields), key=lambda kv: kv[0])
    parts: list[Column] = []
    for name, c in ordered:
        c = F.col(c) if isinstance(c, str) else c
        parts.append(F.lit(name))
        parts.append(F.coalesce(c.cast("string"), F.lit("")))
    payload = F.concat_ws("|", *parts)
    if method == "md5":
        return md5_hex(payload)
    if method == "sha256":
        return F.sha2(F.encode(payload, "UTF-8"), 256)
    raise ValueError(f"unsupported fingerprint method: {method!r}")


# ---------------------------------------------------------------------------
# truncate_fields (byte budget, UTF-8 safe)
# ---------------------------------------------------------------------------


def truncate_utf8(col: Column | str, max_bytes: int) -> Column:
    """truncate_fields processor: cap a string at ``max_bytes`` of UTF-8
    WITHOUT splitting a multi-byte character (a naive byte slice yields
    mojibake / invalid UTF-8 that poisons downstream tokenizers).

    Plan shape: a codegen'd fold over the char array accumulating the byte
    count — O(chars) per row inside WholeStageCodegen, no UDF. The common
    all-ASCII case short-circuits to a plain substring (octet_length ==
    char length ⇒ bytes are chars)."""
    c = F.col(col) if isinstance(col, str) else col
    folded = F.aggregate(
        F.split(c, ""),
        F.struct(F.lit(0).alias("b"), F.lit("").alias("o")),
        lambda acc, ch: F.struct(
            (acc["b"] + F.octet_length(ch)).alias("b"),
            F.when(
                acc["b"] + F.octet_length(ch) <= F.lit(max_bytes),
                F.concat(acc["o"], ch),
            )
            .otherwise(acc["o"])
            .alias("o"),
        ),
        lambda acc: acc["o"],
    )
    return F.when(F.octet_length(c) <= F.lit(max_bytes), c).when(
        F.octet_length(c) == F.length(c), F.substring(c, 1, max_bytes)
    ).otherwise(folded)


# ---------------------------------------------------------------------------
# urldecode
# ---------------------------------------------------------------------------


def urldecode(col: Column | str) -> Column:
    """urldecode processor — percent-decoding via the JVM codec; NULL (not a
    task failure) on malformed sequences via try_url_decode."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_url_decode(c)


# ---------------------------------------------------------------------------
# rate_limit (deterministic batch analogue)
# ---------------------------------------------------------------------------


def rate_limit(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    limit: int,
    window: str = "minute",
    keep_col: str = "_kept",
) -> DataFrame:
    """rate_limit processor, batch form: keep the FIRST ``limit`` events per
    (key, window-bucket) in event-time order — the deterministic analogue
    of Beats' token-bucket (which is wall-clock and admission-order
    dependent, hence untestable); ties break on the full ordering key so
    reruns keep identical rows.

    Scale: one shuffle on (key, bucket) for the window rank; no global
    sort. At 10^12 rows a hot key splits across buckets by construction
    (the bucket IS time), so the skew ceiling is limit·buckets, not
    corpus size."""
    from pyspark.sql import Window

    bucket = F.date_trunc(window, F.col(ts_col))
    w = (
        Window.partitionBy(F.col(key_col), bucket)
        .orderBy(F.col(ts_col), F.monotonically_increasing_id())
    )
    # monotonically_increasing_id is partition-order-dependent; callers that
    # need cross-engine determinism order by a real unique column instead.
    return df.withColumn(keep_col, F.row_number().over(w) <= limit)


def rate_limit_by(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    limit: int,
    window: str = "minute",
) -> DataFrame:
    """Deterministic rate_limit: rank by (ts, order_col) — fully
    reproducible across engines and reruns. Returns only the kept rows."""
    from pyspark.sql import Window

    bucket = F.date_trunc(window, F.col(ts_col))
    w = Window.partitionBy(F.col(key_col), bucket).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= limit)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# detect_mime_type (magic-byte sniffing)
# ---------------------------------------------------------------------------

# (hex prefix, mime) — checked longest-first so e.g. WARC/ wins over text.
MAGIC_PREFIXES: tuple[tuple[str, str], ...] = (
    ("255044462D", "application/pdf"),  # %PDF-
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946383", "image/gif"),  # GIF87a/GIF89a
    ("504B0304", "application/zip"),
    ("1F8B", "application/gzip"),
    ("574152432F", "application/warc"),  # "WARC/"
    ("424D", "image/bmp"),
    ("52494646", "audio/x-riff"),  # RIFF container (wav/avi)
)


def detect_mime_type(bin_col: Column | str) -> Column:
    """detect_mime_type processor over a binary column: sniff well-known
    magic-byte prefixes; fall back to text/html when the payload (after
    optional ASCII whitespace) starts with '<', else text/plain.

    Pure Column: ONE hex() of the first 16 bytes feeds every prefix test —
    payload bytes never leave the scan and never shuffle (the multimodal
    rule, operators/multimodal.py)."""
    c = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    head = F.hex(F.substring(c, 1, 16))
    out = None
    for prefix, mime in sorted(MAGIC_PREFIXES, key=lambda p: -len(p[0])):
        cond = head.startswith(prefix)
        out = F.when(cond, mime) if out is None else out.when(cond, mime)
    text_head = F.ltrim(F.substring(c, 1, 32).cast("string"))
    return out.when(text_head.startswith("<"), "text/html").otherwise(
        "text/plain"
    )


# ---------------------------------------------------------------------------
# replace / extract_array / decode_base64_field / timestamp / community_id
# ---------------------------------------------------------------------------


def replace_fields(
    df: DataFrame, rules: Sequence[Mapping[str, str]]
) -> DataFrame:
    """replace processor: [{"field": f, "pattern": re, "replacement": s}].
    Regex substitution over string fields (RE2-compatible patterns, Java
    regex execution — same dialect contract as the grok path). A missing
    field fails at COMPILE time (Beats fail_on_error default), and a
    malformed pattern fails at compile time too (re.compile probe) — never
    per-row. NULL field values stay NULL."""
    import re as _re

    out = df
    for r in rules:
        fld = r["field"]
        if fld not in out.columns:
            raise ValueError(f"replace field {fld!r} missing")
        try:
            _re.compile(r["pattern"])
        except _re.error as e:
            raise ValueError(
                f"replace pattern {r['pattern']!r} invalid: {e}"
            ) from None
        out = out.withColumn(
            fld,
            F.regexp_replace(F.col(fld), r["pattern"], r["replacement"]),
        )
    return out


def extract_array(
    df: DataFrame, field: str, mapping: Mapping[int, str]
) -> DataFrame:
    """extract_array processor: project array elements into named fields —
    {index: target_col}, 0-based like the Beats config. An out-of-range
    index yields NULL in the target (the row survives; Beats' fail_on_error
    aborts the whole event pipeline on one short array, which at corpus
    scale turns a single ragged row into a dead batch — segregate on
    NULLs downstream instead, the O13 failure-split pattern)."""
    out = df
    for idx, target in sorted(mapping.items()):
        out = out.withColumn(target, F.get(F.col(field), int(idx)))
    return out


def decode_base64_field(
    df: DataFrame,
    field: str,
    target: str,
    error_col: str = "_b64_error",
) -> DataFrame:
    """decode_base64_field processor: strict-validate then decode.

    Spark's ``unbase64`` is lenient — it skips junk characters and pads
    silently, so garbage input yields garbage bytes instead of an error.
    The processor therefore probes strict RFC 4648 shape first (charset,
    '=' only as 1-2 char suffix, length ≡ 0 mod 4): probe-fail ⇒ NULL
    target + error flag, row never fails (add_error_key semantics, same
    contract as decode_json_fields). Decoded bytes read as UTF-8."""
    col = F.col(field)
    shape = col.rlike(
        r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
    ) & (F.length(col) % 4 == 0)
    decoded = F.when(shape, F.decode(F.unbase64(col), "UTF-8"))
    return df.withColumn(target, decoded).withColumn(
        error_col, col.isNotNull() & ~shape
    )


def timestamp_fields(
    df: DataFrame,
    field: str,
    layouts: Sequence[str],
    target: str = "event_ts",
    error_col: str | None = None,
) -> DataFrame:
    """timestamp processor: try each layout in order, first parse wins —
    ``coalesce(try_to_timestamp(f, l1), try_to_timestamp(f, l2), ...)``,
    exactly Beats' first-successful-layout contract but as ONE codegen'd
    expression (the JVM evaluates layouts left-to-right and
    short-circuits). No layout matching ⇒ NULL target (+ optional error
    flag), never a task failure — ANSI-safe via the try_ form."""
    if not layouts:
        raise ValueError("timestamp processor needs at least one layout")
    col = F.col(field)
    parsed = F.coalesce(
        *[F.try_to_timestamp(col, F.lit(layout)) for layout in layouts]
    )
    out = df.withColumn(target, parsed)
    if error_col:
        out = out.withColumn(error_col, col.isNotNull() & parsed.isNull())
    return out


def community_id(
    saddr: Column | str,
    sport: Column | str,
    daddr: Column | str,
    dport: Column | str,
    proto: Column | str,
    seed: int = 0,
) -> Column:
    """community_id processor (v1, the Corelight/Zeek flow-hash spec): a
    direction-independent flow identifier —

        "1:" + base64(sha1(seed_be16 ‖ ip_lo ‖ ip_hi ‖ proto ‖ 0x00
                           ‖ port_lo_be16 ‖ port_hi_be16))

    with the (addr, port) endpoint pair ordered so both directions of a
    flow hash identically. IPv4 TCP/UDP/SCTP form; endpoints pack via hex
    strings → ONE unhex, sha1 and base64 are JVM built-ins, so the whole
    id is a codegen'd narrow map — pytest pins it against an independent
    hashlib+struct reference implementation of the published spec. An
    unparseable address yields NULL."""
    from logsight_filebeat_spark.operators.enrich import ipv4_to_long

    sa, da = ipv4_to_long(saddr), ipv4_to_long(daddr)
    sp = (F.col(sport) if isinstance(sport, str) else sport).cast("bigint")
    dp = (F.col(dport) if isinstance(dport, str) else dport).cast("bigint")
    pr = (F.col(proto) if isinstance(proto, str) else proto).cast("bigint")
    fwd = (sa < da) | ((sa == da) & (sp <= dp))
    a_lo, a_hi = F.when(fwd, sa).otherwise(da), F.when(fwd, da).otherwise(sa)
    p_lo, p_hi = F.when(fwd, sp).otherwise(dp), F.when(fwd, dp).otherwise(sp)

    def hx(col: Column, width: int) -> Column:
        return F.lpad(F.lower(F.hex(col)), width, "0")

    payload = F.unhex(
        F.concat(
            F.lit(format(seed, "04x")),
            hx(a_lo, 8),
            hx(a_hi, 8),
            hx(pr, 2),
            F.lit("00"),
            hx(p_lo, 4),
            hx(p_hi, 4),
        )
    )
    return F.when(
        sa.isNotNull() & da.isNotNull(),
        F.concat(F.lit("1:"), F.base64(F.unhex(F.sha1(payload)))),
    )


# ---------------------------------------------------------------------------
# chain compiler
# ---------------------------------------------------------------------------


def compile_chain(
    df: DataFrame, processors: Sequence[Mapping[str, Any]]
) -> DataFrame:
    """Compile an ordered Beats processor list into a DataFrame plan.

    Each entry is {"<type>": <config>} with an optional "when" condition
    (the Beats per-processor gate): a gated VALUE processor (add_fields,
    convert, truncate_fields, urldecode, fingerprint) applies per-row via
    CASE — non-matching rows keep their original value (or NULL for a new
    column); a gated drop_event filters only matching rows. COLUMN-SHAPE
    processors (rename, copy_fields, drop_fields, include_fields) cannot
    vary per row on a columnar engine, so a "when" on one is a compile-time
    ValueError rather than a silently ignored gate. Projection processors
    fold into consecutive selects that Catalyst collapses into ONE Project
    (CollapseProject) — chain length does not multiply scan cost
    (plan-pinned in tests)."""
    out = df
    for proc in processors:
        body = dict(proc)
        when = body.pop("when", None)
        if len(body) != 1:
            raise ValueError(f"processor must have one type key: {proc!r}")
        (kind, cfg), = body.items()
        gate = compile_condition(when) if when is not None else None
        if kind == "drop_event":
            cond = compile_condition(cfg["when"]) if cfg else F.lit(True)
            if gate is not None:
                cond = gate & cond
            out = out.where(~cond)
            continue
        if kind == "add_fields":
            for name, val in sorted(cfg.items()):
                col = F.lit(val)
                if gate is not None:
                    # gated set: non-matching rows keep the old value, or
                    # NULL when the column is new
                    old = F.col(name) if name in out.columns else F.lit(None)
                    col = F.when(gate, col).otherwise(old)
                out = out.withColumn(name, col)
        elif kind in ("rename", "copy_fields", "drop_fields", "include_fields"):
            if gate is not None:
                raise ValueError(
                    f"processor {kind!r} changes column shape and cannot "
                    "be row-gated with 'when' — gate upstream with "
                    "drop_event or split the stream"
                )
            if kind == "rename":
                out = rename_fields(out, cfg)
            elif kind == "copy_fields":
                out = copy_fields(out, cfg)
            elif kind == "drop_fields":
                out = drop_fields(out, cfg)
            else:
                out = include_fields(out, cfg)
        elif kind == "convert":
            out = convert_fields(out, cfg, gate=gate)
        elif kind == "truncate_fields":
            for name in cfg["fields"]:
                col = truncate_utf8(name, cfg["max_bytes"])
                if gate is not None:
                    col = F.when(gate, col).otherwise(F.col(name))
                out = out.withColumn(name, col)
        elif kind == "urldecode":
            for name in cfg["fields"]:
                col = urldecode(name)
                if gate is not None:
                    col = F.when(gate, col).otherwise(F.col(name))
                out = out.withColumn(name, col)
        elif kind == "fingerprint":
            target = cfg.get("target_field", "fingerprint")
            fp = fingerprint(
                cfg["fields"], cfg["fields"], cfg.get("method", "sha256")
            )
            if gate is not None:
                old = (
                    F.col(target)
                    if target in out.columns
                    else F.lit(None).cast("string")
                )
                fp = F.when(gate, fp).otherwise(old)
            out = out.withColumn(target, fp)
        else:
            if kind in (
                "replace",
                "extract_array",
                "decode_base64_field",
                "timestamp",
                "community_id",
            ):
                if gate is not None:
                    raise ValueError(
                        f"processor {kind!r} does not support a per-row "
                        "'when' gate — gate upstream with drop_event or "
                        "split the stream"
                    )
                if kind == "replace":
                    out = replace_fields(out, cfg)
                elif kind == "extract_array":
                    out = extract_array(out, cfg["field"], cfg["mapping"])
                elif kind == "decode_base64_field":
                    out = decode_base64_field(
                        out,
                        cfg["field"],
                        cfg.get("target", cfg["field"] + "_decoded"),
                    )
                elif kind == "timestamp":
                    out = timestamp_fields(
                        out,
                        cfg["field"],
                        cfg["layouts"],
                        cfg.get("target_field", "event_ts"),
                    )
                else:
                    out = out.withColumn(
                        cfg.get("target_field", "community_id"),
                        community_id(
                            cfg["source_ip"],
                            cfg["source_port"],
                            cfg["destination_ip"],
                            cfg["destination_port"],
                            cfg["transport"],
                            seed=int(cfg.get("seed", 0)),
                        ),
                    )
                continue
            raise ValueError(f"unsupported processor type: {kind!r}")
    return out


def decode_base64_field(
    df: DataFrame,
    field: str,
    target: str = "decoded",
    error_col: str = "_b64_error",
) -> DataFrame:
    """decode_base64_field processor: decode a base64 string column to its
    utf-8 text.

    Validity is decided in two layers, because engine built-ins disagree
    on garbage (Spark's unbase64 silently skips non-alphabet bytes,
    DuckDB's from_base64 throws; Spark's decode substitutes U+FFFD for
    invalid UTF-8 while DuckDB raises):

    1. STRICT structural check — standard alphabet, correct '=' padding,
       length ≡ 0 (mod 4) — so every engine agrees on which strings are
       well-formed base64 at all.
    2. UTF-8 validity check on the decoded bytes (``is_valid_utf8`` over
       the verbatim binary→string cast — a byte copy, never a transcode,
       so it cannot throw). Base64-encoded BINARY payloads (images,
       compressed blobs) therefore route to the error column instead of
       hitting Spark 4's ANSI MALFORMED_CHARACTER_CODING (or, pre-ANSI,
       silently gaining U+FFFD replacements DuckDB would have refused to
       produce).

    Invalid non-null input at either layer ⇒ NULL target + ``error_col``
    true (add_error_key semantics, same contract as decode_json_fields).
    Pure codegen Columns in one stage; ``decode`` only ever runs inside
    the CASE branch whose guard proved the bytes valid."""
    col = F.col(field)
    valid = col.rlike(r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$")
    # NULL-mask BEFORE unbase64: Spark 4's decoder throws on malformed
    # padding, and subexpression elimination can hoist unbase64 out of a
    # CASE guard — feeding it NULL for invalid rows is the only layout
    # that can never throw regardless of how codegen schedules it.
    raw = F.unbase64(F.when(valid, col))
    utf8_ok = F.coalesce(F.is_valid_utf8(raw.cast("string")), F.lit(False))
    ok = col.isNotNull() & valid & utf8_ok
    return df.withColumn(
        target, F.when(ok, F.decode(raw, "UTF-8"))
    ).withColumn(error_col, col.isNotNull() & ~(valid & utf8_ok))
