"""Beats processor suite: conditions, field-shape chain, decode, fingerprint,
truncate, rate_limit, mime sniffing (operators/processors.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logsight_filebeat_spark.operators.processors import (
    compile_chain,
    compile_condition,
    convert_fields,
    copy_fields,
    decode_csv_fields,
    decode_json_fields,
    detect_mime_type,
    drop_event,
    fingerprint,
    rate_limit_by,
    rename_fields,
    to_csv_line,
    truncate_utf8,
    urldecode,
)


def _ev(spark):
    rows = [
        (1, "error", 10.0, "svc-a", '{"k": 5, "tag": "x"}'),
        (2, "click", 3.0, "svc-b", '{"k": 7}'),
        (3, "error", 99.0, None, "{broken"),
        (4, "view", 50.0, "svc-a", None),
    ]
    return spark.createDataFrame(
        rows, "id int, event_type string, value double, svc string, props string"
    )


# ---------------------------------------------------------------------------
# conditions
# ---------------------------------------------------------------------------

def test_condition_leaves_and_combinators(spark):
    df = _ev(spark)

    def ids(cond):
        return sorted(
            r.id for r in df.where(compile_condition(cond)).collect()
        )

    assert ids({"equals": {"event_type": "error"}}) == [1, 3]
    assert ids({"contains": {"svc": "a"}}) == [1, 4]
    assert ids({"regexp": {"svc": "^svc-[ab]$"}}) == [1, 2, 4]
    assert ids({"range": {"value": {"gte": 10, "lt": 99}}}) == [1, 4]
    assert ids({"has_fields": ["svc", "props"]}) == [1, 2]
    assert ids(
        {"and": [{"equals": {"event_type": "error"}}, {"range": {"value": {"gt": 50}}}]}
    ) == [3]
    assert ids(
        {"or": [{"equals": {"event_type": "view"}}, {"equals": {"event_type": "click"}}]}
    ) == [2, 4]
    # NOT over a NULL-field leaf: row 3 (svc NULL) does NOT contain 'a',
    # so not(contains) keeps it — two-valued semantics, never NULL-dropped
    assert ids({"not": {"contains": {"svc": "a"}}}) == [2, 3]


def test_condition_rejects_bad_shapes(spark):
    with pytest.raises(ValueError):
        compile_condition({"equals": {"a": 1}, "contains": {"b": "x"}})
    with pytest.raises(ValueError):
        compile_condition({"range": {"value": {"between": [1, 2]}}})
    with pytest.raises(ValueError):
        compile_condition({"fuzzy": {"a": 1}})


def test_drop_event_keeps_null_condition_rows(spark):
    out = drop_event(_ev(spark), {"equals": {"svc": "svc-a"}})
    assert sorted(r.id for r in out.collect()) == [2, 3]


# ---------------------------------------------------------------------------
# field shape + convert
# ---------------------------------------------------------------------------

def test_rename_copy_guardrails(spark):
    df = _ev(spark)
    out = rename_fields(df, {"svc": "service"})
    assert "service" in out.columns and "svc" not in out.columns
    with pytest.raises(ValueError):
        copy_fields(df, {"svc": "value"})  # target exists


def test_convert_fields_error_tagging(spark):
    rows = [(1, "42", "1.5"), (2, "nope", "2"), (3, None, "x")]
    df = spark.createDataFrame(rows, "id int, a string, b string")
    out = convert_fields(
        df, [{"from": "a", "type": "int"}, {"from": "b", "to": "b_num", "type": "double"}]
    )
    got = {r.id: r for r in out.collect()}
    assert got[1].a == 42 and got[1].b_num == 1.5 and got[1]._convert_error == []
    assert got[2].a is None and got[2]._convert_error == ["a"]
    # NULL input is "missing", not a conversion failure (ignore_missing)
    assert got[3]._convert_error == ["b"]


# ---------------------------------------------------------------------------
# decode_json_fields / decode_csv_fields
# ---------------------------------------------------------------------------

def test_decode_json_error_vs_missing_key(spark):
    out = decode_json_fields(_ev(spark), "props", "k int, tag string")
    got = {r.id: r for r in out.collect()}
    assert got[1].decoded.k == 5 and got[1].decoded.tag == "x"
    assert got[2].decoded.k == 7 and got[2].decoded.tag is None
    assert got[2]._json_error is False  # missing key is NOT an error
    assert got[3]._json_error is True   # malformed JSON IS
    assert got[4]._json_error is False  # NULL field: nothing to decode


def test_csv_roundtrip_rfc4180(spark):
    rows = [
        (1, "plain", "x"),
        (2, "with,comma", "y"),
        (3, 'has "quotes"', "z"),
        (4, "both, \"q\"", "w"),
    ]
    df = spark.createDataFrame(rows, "id int, a string, b string")
    enc = df.withColumn("line", to_csv_line(["id", "a", "b"]))
    dec = decode_csv_fields(enc, "line", "id int, a string, b string")
    for r in dec.collect():
        assert r.decoded.id == r.id and r.decoded.a == r.a and r.decoded.b == r.b


# ---------------------------------------------------------------------------
# fingerprint / truncate / urldecode
# ---------------------------------------------------------------------------

def test_fingerprint_is_field_order_insensitive_and_matches_hashlib(spark):
    import hashlib

    df = spark.createDataFrame([(1, "error", None)], "id int, t string, s string")
    a = df.select(fingerprint(["t", "s"], ["t", "s"], "sha256").alias("f"))
    b = df.select(fingerprint(["s", "t"], ["s", "t"], "sha256").alias("f"))
    fa, fb = a.first().f, b.first().f
    assert fa == fb  # canonical: sorted by field NAME
    expect = hashlib.sha256(b"s||t|error").hexdigest()
    assert fa == expect
    with pytest.raises(ValueError):
        fingerprint(["t"], ["t"], "crc32")


def test_truncate_utf8_never_splits_a_char(spark):
    rows = [(1, "abcdef"), (2, "héllo"), (3, "ééé"), (4, "aé")]
    df = spark.createDataFrame(rows, "id int, s string")
    out = df.select("id", truncate_utf8("s", 4).alias("t")).collect()
    got = {r.id: r.t for r in out}
    assert got[1] == "abcd"          # ASCII fast path
    assert got[2] == "hél"           # h(1)+é(2)+l(1)=4; next l would be 5
    assert got[3] == "éé"            # 2+2=4; third é would cross
    assert got[4] == "aé"            # already within budget
    for t in got.values():           # every output is valid UTF-8
        t.encode("utf-8")


def test_urldecode_and_malformed(spark):
    df = spark.createDataFrame(
        [(1, "a%20b%2Fc"), (2, "plain"), (3, "bad%zz")], "id int, s string"
    )
    got = {r.id: r.d for r in df.select("id", urldecode("s").alias("d")).collect()}
    assert got[1] == "a b/c" and got[2] == "plain" and got[3] is None


# ---------------------------------------------------------------------------
# rate_limit
# ---------------------------------------------------------------------------

def test_rate_limit_keeps_first_k_per_key_window(spark):
    rows = []
    for m in (0, 1):
        for i in range(5):
            rows.append((m * 10 + i, "k", f"2024-01-01 00:0{m}:{i:02d}"))
    df = spark.createDataFrame(rows, "id int, key string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    kept = rate_limit_by(df, "key", "ts", "id", limit=3, window="minute")
    assert sorted(r.id for r in kept.collect()) == [0, 1, 2, 10, 11, 12]


# ---------------------------------------------------------------------------
# detect_mime_type
# ---------------------------------------------------------------------------

def test_mime_sniffing(spark):
    rows = [
        (1, b"%PDF-1.7 rest"),
        (2, b"\x1f\x8b\x08payload"),
        (3, b"\x89PNG\r\n\x1a\npayload"),
        (4, b"WARC/1.0\r\n"),
        (5, b"  <html><body>"),
        (6, b"plain words"),
        (7, b"PK\x03\x04zip"),
    ]
    df = spark.createDataFrame(rows, "id int, data binary")
    got = {
        r.id: r.m
        for r in df.select("id", detect_mime_type("data").alias("m")).collect()
    }
    assert got == {
        1: "application/pdf",
        2: "application/gzip",
        3: "image/png",
        4: "application/warc",
        5: "text/html",
        6: "text/plain",
        7: "application/zip",
    }


# ---------------------------------------------------------------------------
# chain compiler
# ---------------------------------------------------------------------------

def test_chain_semantics_and_gating(spark):
    df = _ev(spark)
    out = compile_chain(
        df,
        [
            {"drop_event": {"when": {"equals": {"event_type": "view"}}}},
            {"add_fields": {"pipeline": "v1"}},
            {"rename": {"svc": "service"}},
            {"copy_fields": {"event_type": "kind"}},
            {"convert": [{"from": "value", "to": "value_int", "type": "int"}]},
            {
                "add_fields": {"flagged": "yes"},
                "when": {"range": {"value": {"gt": 50}}},
            },
            {"drop_fields": ["props"]},
        ],
    )
    rows = {r.id: r for r in out.collect()}
    assert sorted(rows) == [1, 2, 3]
    assert rows[1].pipeline == "v1" and rows[1].service == "svc-a"
    assert rows[1].kind == "error" and rows[1].value_int == 10
    assert rows[3].flagged == "yes" and "props" not in out.columns
    # gated add_fields on a NEW column: non-matching rows get NULL
    assert rows[1].flagged is None


def test_chain_collapses_to_single_project(spark):
    df = _ev(spark)
    out = compile_chain(
        df,
        [
            {"add_fields": {"pipeline": "v1"}},
            {"rename": {"svc": "service"}},
            {"copy_fields": {"event_type": "kind"}},
            {"convert": [{"from": "value", "to": "value_int", "type": "int"}]},
            {"drop_fields": ["props"]},
        ],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # CollapseProject: the whole chain is ONE Project over the relation
    assert plan.count("Project") == 1, plan


# ---------------------------------------------------------------------------
# network condition / CIDR classification
# ---------------------------------------------------------------------------

def test_network_condition(spark):
    from logsight_filebeat_spark.operators.enrich import network_match
    from logsight_filebeat_spark.operators.processors import compile_condition

    rows = [
        (1, "10.1.2.3"),          # private
        (2, "172.16.0.1"),        # private (12-bit mask lower edge)
        (3, "172.32.0.1"),        # NOT private (past 172.31)
        (4, "192.168.255.1"),     # private
        (5, "127.0.0.1"),         # loopback
        (6, "8.8.8.8"),           # public
        (7, "224.0.0.251"),       # multicast
        (8, "169.254.10.10"),     # link-local
        (9, "256.1.1.1"),         # invalid octet
        (10, "not-an-ip"),        # junk
        (11, None),               # NULL
        (12, "10.43.200.7"),      # inside 10.42.0.0/15
    ]
    df = spark.createDataFrame(rows, "id int, ip string")
    got = {
        r.id: (r.priv, r.pub, r.cidr)
        for r in df.select(
            "id",
            network_match("ip", "private").alias("priv"),
            network_match("ip", "public").alias("pub"),
            network_match("ip", "10.42.0.0/15").alias("cidr"),
        ).collect()
    }
    assert got[1] == (True, False, False)
    assert got[2] == (True, False, False)
    assert got[3] == (False, True, False)
    assert got[4] == (True, False, False)
    assert got[5] == (False, False, False)
    assert got[6] == (False, True, False)
    assert got[7] == (False, False, False)
    assert got[8] == (False, False, False)
    # invalid / junk / NULL: condition-FALSE, never NULL
    assert got[9] == (False, False, False)
    assert got[10] == (False, False, False)
    assert got[11] == (False, False, False)
    assert got[12] == (True, False, True)

    # list = any-of; compile_condition wiring
    cond = compile_condition({"network": {"ip": ["loopback", "8.8.8.0/24"]}})
    kept = sorted(r.id for r in df.filter(cond).collect())
    assert kept == [5, 6]

    # malformed CIDR fails at compile time
    with pytest.raises(ValueError):
        network_match("ip", "10.0.0.0/33")
    with pytest.raises(ValueError):
        network_match("ip", "10.0.0/8")


# ---------------------------------------------------------------------------
# replace / extract_array / decode_base64_field / timestamp
# ---------------------------------------------------------------------------

def test_replace_fields(spark):
    from logsight_filebeat_spark.operators.processors import replace_fields

    df = spark.createDataFrame(
        [(1, "user=alice id=42"), (2, None)], "id int, line string"
    )
    out = replace_fields(
        df, [{"field": "line", "pattern": r"id=\d+", "replacement": "id=<n>"}]
    )
    rows = {r.id: r.line for r in out.collect()}
    assert rows[1] == "user=alice id=<n>"
    assert rows[2] is None
    with pytest.raises(ValueError):
        replace_fields(df, [{"field": "nope", "pattern": "x", "replacement": ""}])
    with pytest.raises(ValueError):
        replace_fields(df, [{"field": "line", "pattern": "(", "replacement": ""}])


def test_extract_array(spark):
    from logsight_filebeat_spark.operators.processors import extract_array

    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["only"])], "id int, arr array<string>"
    )
    out = extract_array(df, "arr", {0: "first", 2: "third"})
    rows = {r.id: (r.first, r.third) for r in out.collect()}
    assert rows[1] == ("a", "c")
    assert rows[2] == ("only", None)  # out-of-range ⇒ NULL, row survives


def test_decode_base64_field_basic(spark):
    import base64

    from logsight_filebeat_spark.operators.processors import decode_base64_field

    good = base64.b64encode(b"hello world").decode()
    df = spark.createDataFrame(
        [(1, good), (2, "!!!not-base64"), (3, "QUJD"), (4, None), (5, "QQ=")],
        "id int, b string",
    )
    out = decode_base64_field(df, "b", "txt")
    rows = {r.id: (r.txt, r._b64_error) for r in out.collect()}
    assert rows[1] == ("hello world", False)
    assert rows[2] == (None, True)
    assert rows[3] == ("ABC", False)
    assert rows[4] == (None, False)   # missing field: no error, no value
    assert rows[5] == (None, True)    # bad padding length
    

def test_timestamp_fields(spark):
    from logsight_filebeat_spark.operators.processors import timestamp_fields

    df = spark.createDataFrame(
        [
            (1, "2024-03-01 10:00:00"),
            (2, "01/Mar/2024:10:00:00"),
            (3, "garbage"),
        ],
        "id int, raw string",
    )
    out = timestamp_fields(
        df,
        "raw",
        ["yyyy-MM-dd HH:mm:ss", "dd/MMM/yyyy:HH:mm:ss"],
        target="ts",
        error_col="bad",
    )
    rows = {r.id: (r.ts, r.bad) for r in out.collect()}
    assert rows[1][0] is not None and rows[1][1] is False
    assert rows[2][0] is not None and rows[2][1] is False
    assert rows[1][0].hour == 10 and rows[2][0].day == 1
    assert rows[3] == (None, True)


# ---------------------------------------------------------------------------
# community_id — pinned against an independent stdlib reference
# ---------------------------------------------------------------------------

def _cid_ref(saddr, sport, daddr, dport, proto, seed=0):
    import base64
    import hashlib
    import socket
    import struct

    sa, da = socket.inet_aton(saddr), socket.inet_aton(daddr)
    if (sa, sport) > (da, dport):
        sa, da, sport, dport = da, sa, dport, sport
    data = struct.pack("!H", seed) + sa + da + struct.pack(
        "!BBHH", proto, 0, sport, dport
    )
    return "1:" + base64.b64encode(hashlib.sha1(data).digest()).decode()


def test_community_id(spark):
    from logsight_filebeat_spark.operators.processors import community_id

    flows = [
        ("128.232.110.120", 34855, "66.35.250.204", 80, 6),
        ("192.168.1.52", 54585, "8.8.8.8", 53, 17),
        ("10.0.0.1", 80, "10.0.0.2", 80, 6),      # equal ports
        ("10.0.0.5", 1, "10.0.0.5", 2, 6),        # equal addrs
        ("1.2.3.4", 1234, "5.6.7.8", 5678, 132),  # sctp
    ]
    rows = [(i, *f) for i, f in enumerate(flows)]
    df = spark.createDataFrame(
        rows, "id int, sa string, sp int, da string, dp int, pr int"
    )
    out = df.select(
        "id", community_id("sa", "sp", "da", "dp", "pr").alias("cid")
    )
    got = {r.id: r.cid for r in out.collect()}
    # the published corelight/community-id-spec TCP vector
    assert got[0] == "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    for i, f in enumerate(flows):
        assert got[i] == _cid_ref(*f), f
        # direction independence
        rev = _cid_ref(f[2], f[3], f[0], f[1], f[4])
        assert got[i] == rev

    # seed participates
    out2 = df.select(community_id("sa", "sp", "da", "dp", "pr", seed=1).alias("c"))
    assert out2.first().c == _cid_ref(*flows[0], seed=1)

    # unparseable address ⇒ NULL
    bad = spark.createDataFrame(
        [("nope", 1, "10.0.0.1", 2, 6)], "sa string, sp int, da string, dp int, pr int"
    )
    assert bad.select(community_id("sa", "sp", "da", "dp", "pr").alias("c")).first().c is None


def test_chain_new_processors(spark):
    from logsight_filebeat_spark.operators.processors import compile_chain

    df = spark.createDataFrame(
        [(1, "a,b,c", "aGk=", "2024-03-01 10:00:00")],
        "id int, csvish string, b64 string, raw_ts string",
    )
    out = compile_chain(
        df,
        [
            {"add_fields": {"arr_src": "x"}},
            {"replace": [{"field": "csvish", "pattern": ",", "replacement": "|"}]},
            {"decode_base64_field": {"field": "b64", "target": "msg"}},
            {"timestamp": {"field": "raw_ts", "layouts": ["yyyy-MM-dd HH:mm:ss"]}},
        ],
    )
    r = out.first()
    assert r.csvish == "a|b|c" and r.msg == "hi" and r.event_ts is not None
    # per-row gates on shape-changing processors refuse at compile time
    with pytest.raises(ValueError):
        compile_chain(
            df,
            [{"replace": [{"field": "csvish", "pattern": "a", "replacement": "b"}],
              "when": {"equals": {"id": 1}}}],
        )


def test_decode_base64_field(spark):
    import base64

    from logsight_filebeat_spark.operators.processors import (
        decode_base64_field,
    )

    enc = base64.b64encode("héllo wörld".encode()).decode()
    rows = [
        (1, enc),                 # valid, round-trips utf-8
        (2, enc + "!"),           # corrupted → error, NULL
        (3, "AAA"),               # bad length (3 mod 4) → error
        (4, None),                # missing → no error, NULL
        (5, ""),                  # empty string IS valid base64 of b""
        # structurally valid base64 of NON-UTF-8 bytes: must error, not
        # silently decode with U+FFFD substitutions (DuckDB would raise)
        (6, base64.b64encode(b"\xff\xfe\x00binary").decode()),
    ]
    df = spark.createDataFrame(rows, "id int, line string")
    got = {
        r["id"]: (r["decoded"], r["_b64_error"])
        for r in decode_base64_field(df, "line").collect()
    }
    assert got[1] == ("héllo wörld", False)
    assert got[2] == (None, True)
    assert got[3] == (None, True)
    assert got[4] == (None, False)
    assert got[5] == ("", False)
    assert got[6] == (None, True)
