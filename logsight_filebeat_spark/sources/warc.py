"""WARC archive source — the Common-Crawl container format (ISO 28500).

A crawl pipeline's rawest input is not a parquet table but WARC files:
concatenated records of ``WARC/1.0\\r\\n`` + header lines + ``\\r\\n\\r\\n``
+ payload + ``\\r\\n\\r\\n``. This source turns a directory of WARC files
into the (url, warc_ts, html, …) page rows the rest of the engine consumes
— the upstream edge of the whole system.

Parse strategy (pure Column, zero Python): records split on the
``WARC/1.0\\r\\n`` magic and every record is then VALIDATED against its own
``Content-Length`` header. The magic is not payload-escapable in general —
a payload that embeds the magic severs the record — but the severed pieces
then fail the byte-length check and flag ``valid = false``, so corruption
is quarantined, never silently mis-parsed (the same failure-segregation
contract as the parse pipeline's O13). A Content-Length-driven sequential
scan (the streaming-parser approach) would be exact but per-file
imperative; the sentinel+validate form keeps the hot path in whole-stage
codegen and loses nothing: records that disagree with their declared
length are exactly the records the sequential parser would refuse too.

Files are the unit of parallelism (whole-file reads, like the log
harvester): real crawl archives arrive as many ~1 GB segment files, which
is also why per-record gzip (.warc.gz) stays whole-file-readable —
Hadoop's codec decompresses concatenated gzip members as one stream.

Reference surface: the shipper's harvester (O1) generalized to archive
containers; fixture bytes committed under data/warc/ (tools/gen_warc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_MAGIC = "WARC/1.0\r\n"
_HDR_SEP = "\r\n\r\n"


def read_warc_files(spark: SparkSession, path: str) -> DataFrame:
    """(file, content): one row per WARC file, bytes preserved verbatim.
    ``path`` may be a directory or glob; .gz files decompress transparently
    through the text codec."""
    return spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"),
        F.col("value").alias("content"),
    )


def warc_records(spark: SparkSession, path: str) -> DataFrame:
    """(file, rec_idx, warc_type, target_uri, warc_date, content_length,
    payload, payload_bytes, valid): every record of every WARC file under
    ``path``, in file order, with ``valid`` asserting the payload's actual
    byte length equals the declared Content-Length (false ⇒ quarantine:
    truncated/corrupt/magic-embedding records).

    One whole-file scan → one split + posexplode → header fields via
    regexp_extract — all codegen Columns, no UDF, no shuffle."""
    files = read_warc_files(spark, path)
    chunks = files.select(
        "file",
        # \Q...\E quotes the magic for the regex engine — the '.' in
        # "WARC/1.0" must not match arbitrary bytes, or payloads containing
        # near-magic text (e.g. "WARC/1x0\r\n") would falsely sever records
        F.posexplode(
            F.split("content", F.lit("\\Q" + WARC_MAGIC + "\\E"), -1)
        ).alias(
            "pos", "chunk"
        ),
    ).filter(F.col("pos") >= 1)  # chunk 0 is the (empty) pre-magic preamble
    headers = F.substring_index(F.col("chunk"), _HDR_SEP, 1)
    # payload = chunk minus headers+separator, minus the record's trailing
    # \r\n\r\n terminator
    payload = F.regexp_replace(
        F.col("chunk").substr(
            F.length(headers) + F.lit(len(_HDR_SEP) + 1), F.length("chunk")
        ),
        r"\r\n\r\n$",
        "",
    )
    cl_str = F.regexp_extract(headers, r"Content-Length:\s*(\d+)", 1)
    declared = F.when(cl_str != "", cl_str.cast("bigint"))
    rec = chunks.select(
        "file",
        (F.col("pos") - 1).cast("bigint").alias("rec_idx"),
        F.regexp_extract(headers, r"WARC-Type:\s*([^\r\n]+)", 1).alias(
            "warc_type"
        ),
        F.regexp_extract(headers, r"WARC-Target-URI:\s*([^\r\n]+)", 1).alias(
            "target_uri"
        ),
        F.regexp_extract(headers, r"WARC-Date:\s*([^\r\n]+)", 1).alias(
            "warc_date"
        ),
        declared.alias("content_length"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("payload_bytes"),
    )
    return rec.withColumn(
        "valid",
        F.col("content_length").isNotNull()
        & (F.col("payload_bytes") == F.col("content_length")),
    )


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """Valid response records shaped as the engine's pages table:
    (url, warc_ts, html binary, text, lang) — the drop-in upstream for
    every pages query. ``text`` is the main-content extraction for the
    engine's page template (the ``<pre>`` body — byte-identical to the
    originating pages row, the per-row invariant the whole pipeline is
    verified against); payloads not carrying the template fall back to the
    raw payload and flow to the full main_content/parse operators
    downstream. Invalid records are excluded here; audit them via
    ``warc_records(...).filter(~F.col('valid'))``."""
    rec = warc_records(spark, path).filter(
        F.col("valid") & (F.col("warc_type") == "response")
    )
    inner = F.regexp_extract("payload", r"(?s)<pre>(.*)</pre>", 1)
    return rec.select(
        F.col("target_uri").alias("url"),
        F.to_timestamp(
            F.col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("warc_ts"),
        F.encode("payload", "UTF-8").alias("html"),
        F.when(inner != "", inner).otherwise(F.col("payload")).alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
