"""Testdata table loaders (O1 — source scan).

The reference's source is Filebeat's harvester/spooler over log files
(/root/reference/filebeat/main.go:27-34); ours is a table scan —
`spark.read.parquet` in the sandbox, `spark.read.format("iceberg")` on a real
catalog. Partition/file planning replaces glob+tail; Catalyst pushes filters
and prunes columns into the scan (verified in tests via explain()).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
