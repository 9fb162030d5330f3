"""O14 routing precedence — /root/reference/plugin/config_test.go:30-106."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logsight_filebeat_spark.config import ConfigError, MapperConf, PipelineConfig
from logsight_filebeat_spark.operators.router import SINK_COL, route, sink_column


def test_precedence_regex_over_key_over_constant():
    # config_test.go:87-105 — regex wins when key+regex set; key beats name
    assert MapperConf(name="n", key="k", regex_matcher="(x)").kind() == "regex"
    assert MapperConf(name="n", key="k").kind() == "key"
    assert MapperConf(name="n").kind() == "constant"


def test_invalid_regex_is_config_error():
    # config.go:42-45 / config_test.go invalid regex `^.*($[T|t]est.*$`
    with pytest.raises(ConfigError):
        MapperConf(key="k", regex_matcher="^.*($[T|t]est.*$").kind()


def test_all_empty_is_config_error():
    # config.go:52-53
    with pytest.raises(ConfigError):
        MapperConf().kind()


def test_groupless_regex_is_config_error():
    with pytest.raises(ConfigError):
        MapperConf(key="k", regex_matcher="^test$").kind()


def test_regex_route(spark):
    # config_test.go regex fixture `^.*([T|t]est).*$` over field values
    df = spark.createDataFrame(
        [("this is a Test line",), ("no match here",), ("test lower",)],
        ["app"],
    )
    col = sink_column(
        df, [MapperConf(key="app", regex_matcher="^.*([T|t]est).*$")], "_q"
    )
    got = [r.s for r in df.select(col.alias("s")).collect()]
    assert got == ["Test", "_q", "test"]


def test_key_route_and_constant_fallback(spark):
    df = spark.createDataFrame([("svc-a",), (None,)], ["app"])
    col = sink_column(
        df,
        [MapperConf(key="app"), MapperConf(name="default_app")],
        "_q",
    )
    got = [r.s for r in df.select(col.alias("s")).collect()]
    assert got == ["svc-a", "default_app"]


def test_route_sends_failed_rows_to_quarantine(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", "boom")], ["app", "_error"]
    )
    cfg = PipelineConfig(routes=(MapperConf(key="app"),))
    got = {r.app: r[SINK_COL] for r in route(df, cfg).collect()}
    assert got == {"a": "a", "b": "_quarantine"}


def test_no_rules_all_quarantine(spark):
    df = spark.createDataFrame([("x",)], ["app"])
    cfg = PipelineConfig()
    assert route(df, cfg).first()[SINK_COL] == "_quarantine"
