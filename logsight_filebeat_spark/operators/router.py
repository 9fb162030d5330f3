"""Output selector / router + fan-out (O14).

Reference: /root/reference/plugin/config.go:40-55 — a mapperConf compiles to
exactly one mapper by precedence (Key+Regex → KeyRegexMapper, else Key →
KeyMapper, else Name → ConstantStringMapper, else config error; pinned by
plugin/config_test.go:30-106). The mapper's output string IS the routing key
(the sink/application name).

Spark shape: rules compile on the driver into one `sink` Column —
first-successful-rule-wins as a coalesce chain (a generalization of the
reference's single-rule selector that reduces to it for one rule). Rows whose
every rule fails route to the quarantine sink, mirroring the per-event mapper
error. Fan-out is then either N narrow filters over one persisted DF or a
single write partitioned by `sink` (sinks/writers.py) — never N rescans of
the parse stage (SURVEY §4.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logsight_filebeat_spark.config import MapperConf, PipelineConfig
from logsight_filebeat_spark.functions.mappers import (
    constant_mapper,
    key_mapper,
    key_regex_mapper,
    string_guard,
)

SINK_COL = "sink"


def compile_route(df: DataFrame, rule: MapperConf) -> Column:
    """One rule → a nullable string Column (NULL = rule failed for the row).

    Precedence per mapperConf.toMapper (config.go:40-55); ConfigError raised
    from rule.kind() for invalid regex / all-empty, at compile time, exactly
    where the reference errors.
    """
    kind = rule.kind()
    if kind == "regex":
        mapped = key_regex_mapper(df, rule.key, rule.regex_matcher)
    elif kind == "key":
        mapped = string_guard(df, rule.key, key_mapper(df, rule.key))
    else:  # constant
        mapped = constant_mapper(rule.name)
    # every mapper's value is NULL exactly when its error is set (mappers.py
    # invariant), so routing on the value alone skips evaluating the error
    # expression — for regex rules that halves the per-row regex work
    return mapped.value


def sink_column(
    df: DataFrame, rules: Sequence[MapperConf], quarantine: str = "_quarantine"
) -> Column:
    """First-success-wins over the rule list; all-fail ⇒ quarantine sink."""
    routed = [compile_route(df, r) for r in rules]
    return F.coalesce(*routed, F.lit(quarantine)) if routed else F.lit(quarantine)


def route(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Add the `sink` column. Rows already failed by the log mapper
    (non-NULL `_error`) route to quarantine regardless of rules."""
    col = sink_column(df, cfg.routes, cfg.quarantine_sink)
    if "_error" in df.columns:
        col = F.when(F.col("_error").isNotNull(), F.lit(cfg.quarantine_sink)).otherwise(
            col
        )
    return df.withColumn(SINK_COL, col)
