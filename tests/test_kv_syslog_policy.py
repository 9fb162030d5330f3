"""KV extraction, RFC5424 syslog decode, and robots-style prefix policy."""

from __future__ import annotations

from pyspark.sql import functions as F

from logsight_filebeat_spark.operators.enrich import prefix_policy, url_path
from logsight_filebeat_spark.operators.parse import (
    SYSLOG_FACILITIES,
    SYSLOG_SEVERITIES,
    kv_fields,
    kv_pairs,
    syslog_decode,
)


# ---------------------------------------------------------------------------
# kv_fields / kv_pairs
# ---------------------------------------------------------------------------

def _kv_df(spark):
    rows = [
        (1, "a=1 b=two c=3.5"),
        (2, "noise a=dup1 a=dup2 b="),          # duplicate key, empty value
        (3, "plain tokens only"),                # nothing extractable
        (4, "x=1=2 a=last"),                     # '=' inside the value
        (5, ""),                                 # empty line
    ]
    return spark.createDataFrame(rows, "id int, line string")


def test_kv_fields_semantics(spark):
    out = (
        kv_fields(_kv_df(spark), "line", ["a", "b", "x", "zz"])
        .orderBy("id")
        .collect()
    )
    by_id = {r.id: r for r in out}
    assert by_id[1].a == "1" and by_id[1].b == "two"
    # first occurrence wins; empty value is '' (present), not NULL
    assert by_id[2].a == "dup1" and by_id[2].b == ""
    # nothing extractable / missing keys ⇒ NULL, never ''
    assert by_id[3].a is None and by_id[1].zz is None
    # value keeps everything after the FIRST separator
    assert by_id[4].x == "1=2" and by_id[4].a == "last"
    assert by_id[5].a is None


def test_kv_fields_custom_separators(spark):
    df = spark.createDataFrame([(1, "a:1;b:2")], "id int, line string")
    out = kv_fields(df, "line", ["a", "b"], field_split=";", value_split=":")
    r = out.collect()[0]
    assert r.a == "1" and r.b == "2"


def test_kv_pairs_explode(spark):
    got = {
        (r.id, r.key, r.value)
        for r in kv_pairs(_kv_df(spark), "line", id_cols=("id",)).collect()
    }
    assert (1, "a", "1") in got and (1, "c", "3.5") in got
    # duplicates both survive in the explode form
    assert (2, "a", "dup1") in got and (2, "a", "dup2") in got
    assert (2, "b", "") in got
    assert (4, "x", "1=2") in got
    # nothing from rows 3 and 5
    assert not any(i in (3, 5) for i, _, _ in got)


# ---------------------------------------------------------------------------
# syslog_decode
# ---------------------------------------------------------------------------

def _syslog(spark, line: str):
    df = spark.createDataFrame([(line,)], "line string")
    return syslog_decode(df, "line").select("syslog").collect()[0].syslog


def test_syslog_valid_frame(spark):
    s = _syslog(
        spark, "<165>1 2024-03-01T10:00:00Z web01 app 77 m1 - hello spaced msg"
    )
    assert s is not None
    assert s.facility == 20 and s.severity == 5
    assert s.severity_name == "notice" and s.facility_name == "local4"
    assert s.host == "web01" and s.app == "app"
    assert s.sd is None                    # NILVALUE SD ⇒ NULL sd
    assert s.msg == "hello spaced msg"     # MSG keeps its spaces


def test_syslog_structured_data(spark):
    # one element whose PARAM-VALUE contains spaces
    s = _syslog(spark, '<34>1 t h a p m [ex@32473 k="v w x"] tail msg')
    assert s.sd == '[ex@32473 k="v w x"]' and s.msg == "tail msg"
    # two elements, escaped ']' inside a PARAM-VALUE
    s = _syslog(spark, '<34>1 t h a p m [a@1 x="p\\]q"][b@2 y="z"] m2')
    assert s.sd == '[a@1 x="p\\]q"][b@2 y="z"]' and s.msg == "m2"
    # SD with no MSG at all is a valid frame (MSG is optional)
    s = _syslog(spark, '<34>1 t h a p m [only@1 k="v"]')
    assert s.sd == '[only@1 k="v"]' and s.msg is None
    # NILVALUE with no MSG
    s = _syslog(spark, "<34>1 t h a p m -")
    assert s is not None and s.sd is None and s.msg is None
    # a 7th field that is neither NILVALUE nor an element chain ⇒ malformed
    assert _syslog(spark, "<34>1 t h a p m hello world") is None
    # unterminated element ⇒ malformed
    assert _syslog(spark, '<34>1 t h a p m [broken k="v" msg') is None


def test_syslog_pri_boundaries(spark):
    assert _syslog(spark, "<0>1 t h a p m - x").severity == 0
    assert _syslog(spark, "<191>1 t h a p m - x").facility == 23
    # out of range / malformed ⇒ NULL struct, never half-populated
    assert _syslog(spark, "<192>1 t h a p m - x") is None
    assert _syslog(spark, "<-1>1 t h a p m - x") is None
    assert _syslog(spark, "<07>1 t h a p m - x") is None    # leading zero
    assert _syslog(spark, "165>1 t h a p m - x") is None    # no bracket
    assert _syslog(spark, "<165>2 t h a p m - x") is None   # wrong version
    assert _syslog(spark, "<165>1 t h a p") is None         # short header
    assert _syslog(spark, "") is None


def test_syslog_keyword_tables():
    assert len(SYSLOG_SEVERITIES) == 8 and len(SYSLOG_FACILITIES) == 24
    assert SYSLOG_SEVERITIES[3] == "err" and SYSLOG_FACILITIES[16] == "local0"


# ---------------------------------------------------------------------------
# prefix_policy
# ---------------------------------------------------------------------------

def _rules(spark):
    rows = [
        ("h.com", "/a", False),
        ("h.com", "/a/b", True),
        ("t.com", "/x", False),
        ("t.com", "/x", True),       # tie: allow wins
    ]
    return spark.createDataFrame(rows, "host string, prefix string, allow boolean")


def test_prefix_policy_verdicts(spark):
    urls = [
        ("https://h.com/a/b/c?q=1",),   # /a (deny) and /a/b (allow): longest wins
        ("https://h.com/a/zz",),        # only /a matches ⇒ deny
        ("https://h.com/other",),       # no rule ⇒ default allow
        ("https://t.com/x/1",),         # same-length allow+deny tie ⇒ allow
        ("https://u.com/x",),           # host with no rules ⇒ default allow
    ]
    df = spark.createDataFrame(urls, "url string")
    got = {
        r.url: (r.allowed, r.rule_prefix)
        for r in prefix_policy(df, _rules(spark)).collect()
    }
    assert got["https://h.com/a/b/c?q=1"] == (True, "/a/b")
    assert got["https://h.com/a/zz"] == (False, "/a")
    assert got["https://h.com/other"] == (True, None)
    assert got["https://t.com/x/1"] == (True, "/x")
    assert got["https://u.com/x"] == (True, None)


def test_prefix_policy_default_deny(spark):
    df = spark.createDataFrame([("https://u.com/x",)], "url string")
    r = prefix_policy(df, _rules(spark), default_allow=False).collect()[0]
    assert r.allowed is False


def test_url_path(spark):
    df = spark.createDataFrame(
        [("https://h.com/a/b?q=1#f",), ("https://h.com",), ("nonsense",)],
        "url string",
    )
    got = [r.p for r in df.select(url_path("url").alias("p")).collect()]
    assert got == ["/a/b", "/", "/"]


def test_prefix_policy_broadcast_plan(spark):
    df = spark.createDataFrame([("https://h.com/a",)], "url string")
    plan = prefix_policy(df, _rules(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
