"""Job configuration — the Spark-side analogue of the reference's config.

Reference: /root/reference/plugin/config.go
  - ``logsightConfig`` (config.go:14-27) with defaults at config.go:57-70
    (message_key="message", level default "INFO" at config.go:12,
    batch_size=100, max_retries=20, timeout=120).
  - ``mapperConf`` (config.go:34-38) and its precedence compiler
    ``toMapper()`` (config.go:40-55): Key+Regex → regex-capture mapper,
    else Key → key mapper, else Name → constant mapper, else config error.
    Invalid regex fails at *compile* time (config.go:42-45) — we keep that:
    bad rules raise here, on the driver, never inside a task.

The Spark engine compiles these dataclasses once on the driver into Column
expressions (see functions/mappers.py, plans/pipeline.py) — the analogue of
the reference assembling its Mapper tree in NewClient (plugin/client.go:63-87).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

DEFAULT_LEVEL = "INFO"  # plugin/config.go:12
DEFAULT_MESSAGE_KEY = "message"  # plugin/config.go:64
DEFAULT_BATCH_SIZE = 100  # plugin/config.go:66
DEFAULT_MAX_RETRIES = 20  # plugin/config.go:67
DEFAULT_TIMEOUT_S = 120  # plugin/config.go:68


class ConfigError(ValueError):
    """Driver-side config compilation failure (ref: config.go:42-53)."""


@dataclass(frozen=True)
class MapperConf:
    """One extraction/routing rule (ref: plugin/config.go:34-38).

    ``kind()`` mirrors toMapper() precedence (plugin/config.go:40-55),
    verified by plugin/config_test.go:30-106: regex > key > constant;
    all-empty is a config error; an uncompilable regex is a config error.
    """

    name: str = ""
    key: str = ""
    regex_matcher: str = ""

    def kind(self) -> str:
        if self.key and self.regex_matcher:
            try:
                pat = re.compile(self.regex_matcher)
            except re.error as e:  # ref: config.go:42-45
                raise ConfigError(
                    f"invalid regex expression {self.regex_matcher!r}: {e}"
                ) from e
            if pat.groups < 1:
                # KeyRegexMapper requires a capture group; a groupless pattern
                # fails every row at runtime (mapper.go:152-155). Surfacing it
                # at compile time is strictly better and test-pinned.
                raise ConfigError(
                    f"regex {self.regex_matcher!r} has no capture group; "
                    "KeyRegexMapper semantics require one"
                )
            return "regex"
        if self.key:
            return "key"
        if self.name:
            return "constant"
        raise ConfigError(
            f"invalid application config {self}. either name or key must be set"
        )  # ref: config.go:52-53


@dataclass(frozen=True)
class PipelineConfig:
    """Full job config (ref: logsightConfig, plugin/config.go:14-27).

    Network/auth fields of the reference (url/email/password/TLS/proxy) have
    no analytics meaning here — sinks are tables; ``sink_root`` replaces the
    HTTP endpoint. Mapper wiring mirrors NewClient (plugin/client.go:63-87):
      timestamp := timestamp_key == "" ? event-time : key(timestamp_key)
      level     := level_key == ""     ? constant("INFO") : key(level_key)
      message   := key(message_key)
      tags      := multi-key map(tags_mapping)  (skip-on-missing)
    """

    message_key: str = DEFAULT_MESSAGE_KEY
    timestamp_key: str = ""
    level_key: str = ""
    tags_mapping: dict[str, str] = field(default_factory=dict)
    # routing rules, first-success-wins; each compiles per MapperConf.kind()
    routes: tuple[MapperConf, ...] = ()
    default_sink: str = "default"
    quarantine_sink: str = "_quarantine"  # FailedMapping side-channel (O13)
    batch_size: int = DEFAULT_BATCH_SIZE  # → target rows per output file
    max_retries: int = DEFAULT_MAX_RETRIES  # → spark.task.maxFailures via
    # session.task_retry_conf (applied at context creation by the runner)
    sink_root: str = ""  # base path/catalog for per-sink tables

    def validate(self) -> "PipelineConfig":
        if not self.message_key:
            raise ConfigError("message_key is required")
        for r in self.routes:
            r.kind()  # raises ConfigError on bad rule
        return self
