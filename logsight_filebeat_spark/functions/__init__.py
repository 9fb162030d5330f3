from logsight_filebeat_spark.functions.mappers import (  # noqa: F401
    Mapped,
    constant_mapper,
    event_time_mapper,
    key_mapper,
    key_regex_mapper,
    string_guard,
    tags_mapper,
    wallclock_mapper,
)
from logsight_filebeat_spark.functions.validation import (  # noqa: F401
    ISO8601_RE,
    LEVEL_RE,
    valid_level,
    valid_timestamp,
)
