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
    """Scan a table, guaranteeing enough partitions to use the cluster.

    Spark splits parquet by BYTE ranges, but a split only owns the row
    groups whose midpoint lands in it — a small single-row-group file is
    exactly ONE task no matter how many executors exist, which serializes
    every expression-heavy operator downstream (md5-per-token signatures,
    shingling, fingerprints) onto one core. When the scan's parallelism is
    below the session default, round-robin repartition up to it: the shuffle
    moves only this small file's bytes once, and the condition is false on
    real multi-row-group/multi-file tables at scale, where this is a no-op.
    Operator results are partitioning-independent (test-pinned), so this
    never changes values."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, 8):
        df = df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
