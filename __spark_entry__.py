"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline query at sf0.001;
``queries()``/``oracle_sql()`` expose the operator registry from
logsight_filebeat_spark.entry_queries, verified against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: the full north-rule pages pipeline
    (multiline join → grok parse → map+validate → broadcast enrich → route →
    per-(sink, warc_ts-hour) aggregates) over the input_hint pages table."""
    from logsight_filebeat_spark.entry_queries import QUERIES

    return QUERIES["pg_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logsight_filebeat_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from logsight_filebeat_spark.entry_queries import ORACLES

    return dict(ORACLES)
