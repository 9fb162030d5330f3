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


def _driver_verified() -> set[str]:
    """Names already green in a past round's driver artifact. The driver's
    correctness window covers the FIRST 50 registry entries only, so
    ``queries()`` rotates never-driver-verified entries to the front each
    round — otherwise the newest ~70 queries would never get a driver
    verdict. Read dynamically from the committed CORRECTNESS_r*.json so
    the rotation continues automatically in later rounds. (Every query,
    windowed or not, is additionally value-exact-verified each round by
    tools/check_correctness.py; the sweep is committed as
    CORRECTNESS_local_r*.json.)"""
    import glob
    import json

    seen: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                seen.update(json.load(fh).keys())
        except (OSError, ValueError):
            continue
    return seen


def _rotated(mapping: dict) -> dict:
    seen = _driver_verified()
    unseen = {k: v for k, v in mapping.items() if k not in seen}
    return {**unseen, **{k: v for k, v in mapping.items() if k in seen}}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logsight_filebeat_spark.entry_queries import QUERIES

    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from logsight_filebeat_spark.entry_queries import ORACLES

    return _rotated(dict(ORACLES))
