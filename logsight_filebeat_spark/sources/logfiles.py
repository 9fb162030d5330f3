"""Log-file source — the Filebeat harvester analogue (O1).

The reference's input is Filebeat itself: find files by glob, tail them, emit
events, record offsets (/root/reference/filebeat/main.go:27-34). The Spark
shape: whole-file text reads (one row per FILE — line order inside a file is
preserved, which per-line ``spark.read.text`` does NOT guarantee once a file
splits across partitions), the multiline fold turning a file's lines into
logical events, and ``input_file_name()``/file metadata standing in for the
harvester's provenance. The registrar's restart offsets map to the streaming
file-source checkpoint (streaming/micro_batch.py) — at file granularity, the
unit Filebeat actually tracks.

Scale note: whole-file reads assume harvest-shaped inputs — many rotated
files of bounded size (the log-shipping reality), not one multi-GB file. For
a pathological single giant file, pre-split it or fall back to per-line
reads + a windowed line-regroup (one shuffle on file name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logsight_filebeat_spark.operators.parse import (
    DEFAULT_CONTINUATION,
    multiline_join,
)


def read_log_files(spark: SparkSession, path: str) -> DataFrame:
    """(file, content): one row per harvested file, full text preserved.
    ``path`` may be a directory or glob, exactly like filebeat's paths."""
    return (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("file"),
            F.col("value").alias("content"),
        )
    )


def harvest_events(
    spark: SparkSession,
    path: str,
    continuation: str = DEFAULT_CONTINUATION,
) -> DataFrame:
    """(file, event_idx, event_text): the harvester's event stream — files →
    multiline-joined logical events, in file order. Trailing newlines yield
    no phantom events (the final empty line is dropped, as a tailing
    harvester would wait for the line to complete)."""
    files = read_log_files(spark, path)
    events = multiline_join(F.col("content"), continuation)
    df = files.select(
        "file", F.posexplode(events).alias("event_idx", "event_text")
    )
    # empty events are skipped (Filebeat drops empty lines; this also eats
    # the phantom tail a file ending in '\n' would otherwise produce)
    return df.filter(F.col("event_text") != "")


def logfiles_as_pages(
    spark: SparkSession,
    path: str,
    default_lang: str = "und",
) -> DataFrame:
    """Adapt harvested files to the pages schema so the whole pipeline
    (plans/pipeline.py) runs unchanged over log files: url="file://...",
    warc_ts=file modification time, text=content."""
    return (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("url"),
            F.col("_metadata.file_modification_time").alias("warc_ts"),
            F.encode("value", "UTF-8").alias("html"),
            F.col("value").alias("text"),
            F.lit(default_lang).alias("lang"),
        )
    )
