"""Driver-contract query registry.

Each entry: a Spark callable (spark, sf_dir) -> DataFrame built from the
engine's operators, plus (where SQL-expressible) an equivalent DuckDB oracle
SQL string. Column names and rounding are aligned on both sides — the driver
hashes values over name-sorted columns.

Coverage maps to SURVEY.md §2 (pipeline operators O2-O17/O22) plus the
training-data suites (dedup, similarity, text analysis, multimodal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logsight_filebeat_spark.config import MapperConf, PipelineConfig
from logsight_filebeat_spark.functions.validation import ISO8601_RE, LEVEL_RE
from logsight_filebeat_spark.sources.tables import load

# DuckDB-side copies of the validation regexes (identical dialect subset)
_D_LEVEL = LEVEL_RE
_D_ISO = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(([+-]\d{2}:\d{2})|Z)?$"

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # timestamps render in the SESSION timezone; the DuckDB oracle is
            # tz-naive UTC, so pin it here — the driver's own session may not
            # be UTC-configured (runtime-settable, no session restart needed).
            # Deliberately NOT restored in a finally: the returned DataFrame
            # is lazy, and date_format/strftime render at EXECUTION time —
            # restoring the caller's timezone after plan construction would
            # silently un-pin every timestamp the driver later collects.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# shared derivations over `events` — the log-record stand-in table
# (FIXTURES.md "Driver-provided tables": events doubles as the event stream)
# ---------------------------------------------------------------------------

def _events_prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive log-shaped columns from events: an ISO timestamp string
    (every 10th row date-only ⇒ validation failure), a level token (every
    13th row invalid), message = props JSON."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "ts",
        "event_type",
        "user_id",
        "value",
        F.col("props").alias("msg"),
        F.when(
            F.col("event_id") % 10 == 0, F.date_format("ts", "yyyy-MM-dd")
        )
        .otherwise(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .alias("ts_str"),
        F.when(F.col("event_id") % 13 == 0, F.lit("bogus"))
        .when(F.col("event_type") == "error", F.lit("error"))
        .when(F.col("event_type") == "purchase", F.lit("warn"))
        .otherwise(F.lit("info"))
        .alias("lvl"),
    )


_D_EVENTS_PREPARED = """
  SELECT event_id, ts, event_type, user_id, value, props AS msg,
    CASE WHEN event_id % 10 = 0 THEN strftime(ts, '%Y-%m-%d')
         ELSE strftime(ts, '%Y-%m-%dT%H:%M:%SZ') END AS ts_str,
    CASE WHEN event_id % 13 = 0 THEN 'bogus'
         WHEN event_type = 'error' THEN 'error'
         WHEN event_type = 'purchase' THEN 'warn'
         ELSE 'info' END AS lvl
  FROM events
"""


def _log_pipeline_cfg() -> PipelineConfig:
    return PipelineConfig(
        message_key="msg",
        timestamp_key="ts_str",
        level_key="lvl",
        tags_mapping={"etype": "event_type"},
        routes=(
            MapperConf(key="event_type", regex_matcher="^(error|purchase)$"),
            MapperConf(name="other"),
        ),
    )


_D_MAPPED = f"""
  WITH base AS ({_D_EVENTS_PREPARED}),
  mapped AS (
    SELECT *, upper(lvl) AS level,
      CASE WHEN NOT regexp_matches(upper(lvl), '{_D_LEVEL}') THEN 'invalid log level'
           WHEN NOT regexp_matches(ts_str, '{_D_ISO}') THEN 'bad timestamp'
      END AS _error
    FROM base),
  routed AS (
    SELECT *, CASE
      WHEN _error IS NOT NULL THEN '_quarantine'
      WHEN regexp_matches(event_type, '^(error|purchase)$')
           AND regexp_extract(event_type, '^(error|purchase)$', 1) <> ''
        THEN regexp_extract(event_type, '^(error|purchase)$', 1)
      ELSE 'other' END AS sink
    FROM mapped)
"""


# ---------------------------------------------------------------------------
# pipeline queries (O10-O17)
# ---------------------------------------------------------------------------

@register(
    "pl_flagship",
    _D_MAPPED
    + """
  SELECT sink,
    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
    count(*)::bigint AS event_count,
    sum(CASE WHEN _error IS NULL THEN octet_length(encode(msg)) ELSE 0 END)::bigint AS byte_total,
    sum(CASE WHEN _error IS NOT NULL THEN 1 ELSE 0 END)::bigint AS failed_count,
    round(sum(CASE WHEN _error IS NOT NULL THEN 1 ELSE 0 END)::double / count(*), 6) AS parse_failure_rate
  FROM routed GROUP BY 1, 2
""",
)
def pl_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline: map → validate → route → per-(sink,hour) aggregates."""
    from logsight_filebeat_spark.operators.aggregate import sink_hour_aggregates
    from logsight_filebeat_spark.operators.log_mapper import to_log
    from logsight_filebeat_spark.operators.router import route

    cfg = _log_pipeline_cfg()
    df = _events_prepared(spark, sf_dir)
    routed = route(to_log(df, cfg, event_ts_col="ts"), cfg)
    agg = sink_hour_aggregates(routed, ts_col="ts", bytes_cols=("message",))
    return agg.select(
        "sink",
        F.date_format("hour_bucket", "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
        F.col("event_count").cast("bigint").alias("event_count"),
        F.col("byte_total").cast("bigint").alias("byte_total"),
        F.col("failed_count").cast("bigint").alias("failed_count"),
        "parse_failure_rate",
    )


@register(
    "pl_receipts",
    _D_MAPPED
    + """
  SELECT sink,
    sum(CASE WHEN _error IS NULL THEN 1 ELSE 0 END)::bigint AS logs_count,
    (CASE WHEN sum(CASE WHEN _error IS NOT NULL THEN 1 ELSE 0 END) = 0
          THEN 200 ELSE 207 END)::int AS status
  FROM routed GROUP BY sink
""",
)
def pl_receipts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogReceipt analogue per sink (api/log.go:57-62)."""
    from logsight_filebeat_spark.operators.aggregate import receipts
    from logsight_filebeat_spark.operators.log_mapper import to_log
    from logsight_filebeat_spark.operators.router import route

    cfg = _log_pipeline_cfg()
    routed = route(to_log(_events_prepared(spark, sf_dir), cfg, event_ts_col="ts"), cfg)
    return receipts(routed, "b").select(
        "sink", "logs_count", F.col("status").cast("int").alias("status")
    )


@register(
    "pl_failures",
    _D_MAPPED
    + """
  SELECT _error AS error, count(*)::bigint AS n
  FROM routed WHERE _error IS NOT NULL GROUP BY _error
""",
)
def pl_failures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FailedMapping side-channel breakdown (O13)."""
    from logsight_filebeat_spark.operators.log_mapper import split_ok_failed, to_log

    cfg = _log_pipeline_cfg()
    _, failed = split_ok_failed(
        to_log(_events_prepared(spark, sf_dir), cfg, event_ts_col="ts")
    )
    # align error strings with the oracle's two classes
    err = F.when(F.col("_error").contains("level"), F.lit("invalid log level")).otherwise(
        F.lit("bad timestamp")
    )
    return failed.groupBy(err.alias("error")).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# individual mapper operators (O2-O9, O14)
# ---------------------------------------------------------------------------

@register(
    "op_constant",
    "SELECT event_id, 'app_name' AS app FROM events",
)
def op_constant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logsight_filebeat_spark.functions.mappers import constant_mapper

    m = constant_mapper("app_name")
    return load(spark, sf_dir, "events").select("event_id", m.value.alias("app"))


@register(
    "op_key_json",
    "SELECT event_id, json_extract_string(props, '$.k') AS k_val FROM events",
)
def op_key_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key projection out of a dynamic document (O3 over open-ended attrs)."""
    return load(spark, sf_dir, "events").select(
        "event_id", F.get_json_object("props", "$.k").alias("k_val")
    )


@register(
    "op_event_time",
    "SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts FROM events",
)
def op_event_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logsight_filebeat_spark.functions.mappers import event_time_mapper

    m = event_time_mapper("ts")
    return load(spark, sf_dir, "events").select("event_id", m.value.alias("iso_ts"))


@register(
    "op_key_regex",
    """
  SELECT doc_id,
    CASE WHEN regexp_matches(text, 'spark (\\w+)')
              AND regexp_extract(text, 'spark (\\w+)', 1) <> ''
         THEN regexp_extract(text, 'spark (\\w+)', 1) END AS captured,
    NOT (regexp_matches(text, 'spark (\\w+)')
         AND regexp_extract(text, 'spark (\\w+)', 1) <> '') AS failed
  FROM documents
""",
)
def op_key_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyRegexMapper semantics (O5): first capture group; no-match and
    empty-capture are row failures, not empty strings."""
    from logsight_filebeat_spark.functions.mappers import key_regex_mapper

    docs = load(spark, sf_dir, "documents")
    m = key_regex_mapper(docs, "text", r"spark (\w+)")
    return docs.select(
        "doc_id", m.value.alias("captured"), m.error.isNotNull().alias("failed")
    )


@register(
    "op_validate_level",
    f"""
  WITH base AS ({_D_EVENTS_PREPARED})
  SELECT regexp_matches(upper(lvl), '{_D_LEVEL}') AS is_valid, count(*)::bigint AS n
  FROM base GROUP BY 1
""",
)
def op_validate_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logsight_filebeat_spark.functions.validation import valid_level

    df = _events_prepared(spark, sf_dir)
    return df.groupBy(
        valid_level(F.upper("lvl")).alias("is_valid")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "op_validate_timestamp",
    f"""
  WITH base AS ({_D_EVENTS_PREPARED})
  SELECT regexp_matches(ts_str, '{_D_ISO}') AS is_valid, count(*)::bigint AS n
  FROM base GROUP BY 1
""",
)
def op_validate_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logsight_filebeat_spark.functions.validation import valid_timestamp

    df = _events_prepared(spark, sf_dir)
    return df.groupBy(valid_timestamp("ts_str").alias("is_valid")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "op_router",
    _D_MAPPED
    + """
  SELECT sink, count(*)::bigint AS n FROM routed GROUP BY sink
""",
)
def op_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O14 precedence routing: regex rule first, constant fallback,
    quarantine for failed rows."""
    from logsight_filebeat_spark.operators.log_mapper import to_log
    from logsight_filebeat_spark.operators.router import SINK_COL, route

    cfg = _log_pipeline_cfg()
    routed = route(to_log(_events_prepared(spark, sf_dir), cfg, event_ts_col="ts"), cfg)
    return routed.groupBy(SINK_COL).agg(F.count(F.lit(1)).alias("n"))


@register(
    "op_multiline",
    """
  WITH lined AS (
    SELECT doc_id, string_split(replace(text, ' table ', chr(10) || '  at '), chr(10)) AS lines
    FROM documents)
  SELECT doc_id,
    (1 + len(list_filter(lines[2:], x -> NOT regexp_matches(x, '^\\s'))))::bigint AS n_events
  FROM lined
""",
)
def op_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiline joining: synthesize continuation lines, count logical
    events after the fold."""
    from logsight_filebeat_spark.operators.parse import multiline_join

    docs = load(spark, sf_dir, "documents").withColumn(
        "text2", F.regexp_replace("text", " table ", "\n  at ")
    )
    return docs.select(
        "doc_id", F.size(multiline_join("text2")).cast("bigint").alias("n_events")
    )


@register(
    "op_tags_map",
    """
  SELECT event_id, event_type AS tag_etype, json_extract_string(props, '$.k') AS tag_k
  FROM events
""",
)
def op_tags_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultipleKeyValueStringMapper (O8): build the tags map (skip-on-missing
    exercised via a nonexistent source key), emit entries as columns."""
    from logsight_filebeat_spark.functions.mappers import tags_mapper

    ev = load(spark, sf_dir, "events").withColumn(
        "k_val", F.get_json_object("props", "$.k")
    )
    m = tags_mapper(ev, {"etype": "event_type", "k": "k_val", "missing": "no_such_col"})
    return ev.select(
        "event_id",
        F.element_at(m.value, "etype").alias("tag_etype"),
        F.element_at(m.value, "k").alias("tag_k"),
    )


# ---------------------------------------------------------------------------
# enrichment joins (O22) + Catalyst built-ins coverage
# ---------------------------------------------------------------------------

@register(
    "en_broadcast_join",
    """
  SELECT r.r_name AS region_name, count(*)::bigint AS n_customers,
    round(sum(c.c_acctbal), 2) AS total_acctbal
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name
""",
)
def en_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "en_lookup_tags",
    """
  WITH lk AS (SELECT DISTINCT source, upper(source) AS org FROM documents)
  SELECT lk.org AS org, count(*)::bigint AS n_docs
  FROM documents d LEFT JOIN lk ON d.source = lk.source
  GROUP BY lk.org
""",
)
def en_lookup_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-metadata-style enrichment: derive a lookup, broadcast-left-join,
    fold into tags, aggregate per enriched value."""
    from logsight_filebeat_spark.operators.enrich import enrich_with_lookup

    docs = load(spark, sf_dir, "documents").withColumn(
        "tags", F.create_map().cast("map<string,string>")
    )
    lk = docs.select("source").distinct().withColumn("org", F.upper("source"))
    out = enrich_with_lookup(docs, lk, "source", {"org": "org"})
    return out.groupBy(F.element_at("tags", "org").alias("org")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# pages-pipeline + dedup/similarity/text/multimodal suites register themselves
# into QUERIES/ORACLES on import (must stay the last statement in this module)
from logsight_filebeat_spark import entry_queries_corpus  # noqa: E402,F401
