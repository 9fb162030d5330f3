"""Mapper semantics pinned to the reference's table-driven tests.

Fixture event mirrors /root/reference/plugin/mapper/mapper_test.go:20-27:
  {Timestamp: 2022-04-01T20:10:57Z, Key: {key1: "value1"},
   key3: "value2", key4: 4}; key5 absent.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logsight_filebeat_spark.functions.mappers import (
    constant_mapper,
    event_time_mapper,
    key_mapper,
    key_regex_mapper,
    string_guard,
    string_key_mapper,
    tags_mapper,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("Key", T.StructType([T.StructField("key1", T.StringType())])),
        T.StructField("key3", T.StringType()),
        T.StructField("key4", T.IntegerType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)


@pytest.fixture(scope="module")
def event_df(spark):
    return spark.createDataFrame(
        [
            Row(
                event_ts=dt.datetime(2022, 4, 1, 20, 10, 57, tzinfo=dt.timezone.utc),
                Key=Row(key1="value1"),
                key3="value2",
                key4=4,
                attrs={"a": "va"},
            )
        ],
        SCHEMA,
    )


def one(df, mapped):
    return df.select(
        mapped.value.alias("value"), mapped.error.alias("error")
    ).first()


def test_constant_mapper(event_df):
    # mapper.go:38-44 — emits the constant, never fails
    r = one(event_df, constant_mapper("app_name"))
    assert r.value == "app_name" and r.error is None


def test_key_mapper_top_level(event_df):
    r = one(event_df, key_mapper(event_df, "key3"))
    assert r.value == "value2" and r.error is None


def test_key_mapper_nested(event_df):
    # mapper_test.go:90-95 — dotted path "Key.key1" → "value1"
    r = one(event_df, key_mapper(event_df, "Key.key1"))
    assert r.value == "value1" and r.error is None


def test_key_mapper_map_type(event_df):
    r = one(event_df, key_mapper(event_df, "attrs.a"))
    assert r.value == "va" and r.error is None


def test_key_mapper_missing_key_fails(event_df):
    # mapper_test.go:104-109 — missing key errors
    r = one(event_df, key_mapper(event_df, "key5"))
    assert r.value is None and "not found" in r.error


def test_string_mapper_rejects_int(event_df):
    # mapper_test.go:279-284 — int 4 under StringMapper errors, NOT coerced
    r = one(event_df, string_key_mapper(event_df, "key4"))
    assert r.value is None and "not a string" in r.error


def test_string_guard_passthrough(event_df):
    r = one(event_df, string_guard(event_df, "key3", key_mapper(event_df, "key3")))
    assert r.value == "value2" and r.error is None


def test_key_regex_capture(event_df):
    # mapper_test.go:155-161 — `va(.*)e` over "value2" captures "lu"...
    # note: Go FindStringSubmatch is unanchored leftmost; "value2" with
    # va(.*)e → greedy capture up to last 'e' within match: "lu" (value2 ends
    # with '2'; match is "value", capture "lu").
    r = one(event_df, key_regex_mapper(event_df, "key3", "va(.*)e"))
    assert r.value == "lu" and r.error is None


def test_key_regex_path_capture(spark):
    # mapper_test.go:203-208 — `.*/(.*)/.*` over "/path/app_name/here"
    df = spark.createDataFrame([("/path/app_name/here",)], ["key3"])
    r = one(df, key_regex_mapper(df, "key3", ".*/(.*)/.*"))
    assert r.value == "app_name" and r.error is None


def test_key_regex_no_match_fails(spark):
    # mapper_test.go:210-215 — no match ⇒ error (not empty string!)
    df = spark.createDataFrame([("/path",)], ["key3"])
    r = one(df, key_regex_mapper(df, "key3", r".*/(.*)/.+"))
    assert r.value is None and "no matches" in r.error


def test_key_regex_empty_capture_fails(spark):
    # mapper_test.go:216-222 — match but empty capture ⇒ error
    df = spark.createDataFrame([("/path//here",)], ["key3"])
    r = one(df, key_regex_mapper(df, "key3", ".*/(.*)/.*"))
    assert r.value is None and "empty" in r.error.lower()


def test_key_regex_whole_match_without_group_fails(event_df):
    # mapper.go:152-155 — pattern with no capture group fails even on match
    r = one(event_df, key_regex_mapper(event_df, "key3", "value2"))
    assert r.value is None and "submatches" in r.error


def test_key_regex_upstream_failure_propagates(event_df):
    r = one(event_df, key_regex_mapper(event_df, "key5", "va(.*)e"))
    assert r.value is None and "not found" in r.error


def test_event_time_mapper_rfc3339(event_df):
    # mapper.go:77-79 — Go time.RFC3339; UTC renders as Z
    r = one(event_df, event_time_mapper("event_ts"))
    assert r.value == "2022-04-01T20:10:57Z" and r.error is None


def test_tags_mapper_skips_missing_and_non_string(event_df):
    # mapper.go:103-106 (skip missing) + :123-127 (drop non-string)
    mapped = tags_mapper(
        event_df,
        {"t1": "key3", "t2": "key5", "t3": "key4", "t4": "Key.key1"},
    )
    r = one(event_df, mapped)
    assert r.error is None
    assert dict(r.value) == {"t1": "value2", "t4": "value1"}


def test_tags_mapper_empty_mapping(event_df):
    r = one(event_df, tags_mapper(event_df, {}))
    assert dict(r.value) == {} and r.error is None


def test_tags_mapper_null_value_skipped(spark):
    df = spark.createDataFrame(
        [Row(a=None, b="x")],
        T.StructType(
            [T.StructField("a", T.StringType()), T.StructField("b", T.StringType())]
        ),
    )
    r = one(df, tags_mapper(df, {"ka": "a", "kb": "b"}))
    assert dict(r.value) == {"kb": "x"}
