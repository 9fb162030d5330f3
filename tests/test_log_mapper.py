"""O10–O13 end-to-end: record assembly, validation, failure segregation.

Cases from /root/reference/plugin/mapper/log_mapper_test.go:20-122 and the
ToLogs batch behavior (log_mapper.go:58-79 — implementing the documented
intent, not the inverted-return bug at :74-78; see SURVEY §2 O13).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logsight_filebeat_spark.config import PipelineConfig
from logsight_filebeat_spark.operators.log_mapper import (
    ERROR_COL,
    split_ok_failed,
    to_log,
)

SCHEMA = T.StructType(
    [
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("msg", T.StringType()),
        T.StructField("lvl", T.StringType()),
        T.StructField("ts_str", T.StringType()),
        T.StructField("team", T.StringType()),
    ]
)


def mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


BASE_TS = dt.datetime(2022, 4, 4, 9, 0, 35, tzinfo=dt.timezone.utc)


def test_valid_log_passes(spark):
    # log_mapper_test.go:20-48 — valid log with/without TZ offset passes
    df = mk(
        spark,
        [
            Row(warc_ts=BASE_TS, msg="hello", lvl="info", ts_str="2022-04-04T09:00:35+00:00", team="a"),
            Row(warc_ts=BASE_TS, msg="hello", lvl="error", ts_str="2022-04-04T09:00:35", team="a"),
        ],
    )
    cfg = PipelineConfig(
        message_key="msg",
        timestamp_key="ts_str",
        level_key="lvl",
        tags_mapping={"team": "team"},
    )
    mapped = to_log(df, cfg)
    rows = mapped.collect()
    assert all(r[ERROR_COL] is None for r in rows)
    # level upper-cased before validation (log_mapper.go:48)
    assert sorted(r.level for r in rows) == ["ERROR", "INFO"]
    assert dict(rows[0].tags) == {"team": "a"}


def test_bogus_level_fails(spark):
    # log_mapper_test.go:50-65 — BOGUS / INFOINFO rejected
    df = mk(
        spark,
        [
            Row(warc_ts=BASE_TS, msg="m", lvl="BOGUS", ts_str="2022-04-04T09:00:35", team=None),
            Row(warc_ts=BASE_TS, msg="m", lvl="INFOINFO", ts_str="2022-04-04T09:00:35", team=None),
        ],
    )
    cfg = PipelineConfig(message_key="msg", timestamp_key="ts_str", level_key="lvl")
    ok, failed = split_ok_failed(to_log(df, cfg))
    assert ok.count() == 0 and failed.count() == 2
    assert all("level" in r[ERROR_COL] for r in failed.collect())


def test_date_only_timestamp_fails(spark):
    # log_mapper_test.go:66-73 — "2022-04-01" rejected
    df = mk(spark, [Row(warc_ts=BASE_TS, msg="m", lvl="INFO", ts_str="2022-04-01", team=None)])
    cfg = PipelineConfig(message_key="msg", timestamp_key="ts_str", level_key="lvl")
    ok, failed = split_ok_failed(to_log(df, cfg))
    assert ok.count() == 0
    assert "ISO 8601" in failed.first()[ERROR_COL]


def test_default_level_and_event_time(spark):
    # client.go:65-75 — no timestamp_key ⇒ EventTimeMapper; no level_key ⇒ INFO
    df = mk(spark, [Row(warc_ts=BASE_TS, msg="m", lvl=None, ts_str=None, team=None)])
    cfg = PipelineConfig(message_key="msg")
    r = to_log(df, cfg).first()
    assert r[ERROR_COL] is None
    assert r.level == "INFO"
    assert r.timestamp == "2022-04-04T09:00:35Z"


def test_missing_message_key_fails_row(spark):
    df = mk(spark, [Row(warc_ts=BASE_TS, msg=None, lvl=None, ts_str=None, team=None)])
    cfg = PipelineConfig(message_key="msg")
    ok, failed = split_ok_failed(to_log(df, cfg))
    assert ok.count() == 0
    assert "not found" in failed.first()[ERROR_COL]


def test_batch_segregation_counts(spark):
    # ToLogs over a mixed batch: failures reported alongside ok rows (intent
    # of log_mapper.go:58-73, bug at :74-78 NOT reproduced)
    rows = [
        Row(warc_ts=BASE_TS, msg="ok1", lvl="INFO", ts_str="2022-04-04T09:00:35", team="t"),
        Row(warc_ts=BASE_TS, msg="ok2", lvl="warn", ts_str="2022-04-04T09:00:35Z", team="t"),
        Row(warc_ts=BASE_TS, msg="bad-level", lvl="nope", ts_str="2022-04-04T09:00:35", team="t"),
        Row(warc_ts=BASE_TS, msg=None, lvl="INFO", ts_str="2022-04-04T09:00:35", team="t"),
        Row(warc_ts=BASE_TS, msg="bad-ts", lvl="INFO", ts_str="2022-04-04", team="t"),
    ]
    cfg = PipelineConfig(
        message_key="msg", timestamp_key="ts_str", level_key="lvl",
        tags_mapping={"team": "team"},
    )
    ok, failed = split_ok_failed(to_log(mk(spark, rows), cfg))
    assert ok.count() == 2
    assert failed.count() == 3


def test_error_precedence_timestamp_first(spark):
    # ToLog checks timestamp mapper first (log_mapper.go:29-32)
    df = mk(spark, [Row(warc_ts=BASE_TS, msg=None, lvl="nope", ts_str=None, team=None)])
    cfg = PipelineConfig(message_key="msg", timestamp_key="ts_str", level_key="lvl")
    r = to_log(df, cfg).first()
    assert "ts_str" in r[ERROR_COL]  # timestamp error wins over message/level
