"""NDJSON (JSON-lines) source — filebeat's ``json:`` input mode.

The reference ships whatever Filebeat hands it; when the input is configured
with ``json.keys_under_root`` the harvester parses each LINE as a JSON
object and a parse failure becomes an error-tagged event, not a dropped
batch (Filebeat json input semantics; reference surface via the framework
dep /root/reference/go.mod:139). The Spark shape mirrors
sources/logfiles.py: whole-file reads preserve per-file line order (a
per-line ``spark.read.json`` does not, once a file splits across
partitions, and its corrupt-record column cannot carry the line NUMBER the
registrar-style provenance wants), then one ``from_json`` per line inside
the scan stage — JVM Jackson, no Python in the row path.

Corrupt-line semantics, pinned by the lf_ndjson oracle (DuckDB
``json_valid`` over identical bytes): a line that fails to parse yields
``corrupt = true`` and NULL fields but KEEPS its (file, line_idx, raw)
provenance — the quarantine lane for a shipper is a routing decision, not
data loss. An empty JSON object parses fine (corrupt = false) and simply
fails downstream validation, exactly like an event missing its level key.

Scale note: whole-file reads assume harvest-shaped inputs — many rotated
files of bounded size. For giant single files, fall back to
``spark.read.text`` per line + zipWithIndex-style regrouping (one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_EVENT_SCHEMA = (
    "ts string, level string, msg string, host string, props string"
)


def read_ndjson_files(spark: SparkSession, path: str) -> DataFrame:
    """(file, content): one row per NDJSON file, bytes preserved."""
    return spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"),
        F.col("value").alias("content"),
    )


def ndjson_events(
    spark: SparkSession,
    path: str,
    schema: str = DEFAULT_EVENT_SCHEMA,
) -> DataFrame:
    """(file, line_idx, raw, parsed, corrupt): per-line parsed events with
    provenance. ``parsed`` is a struct of ``schema``; ``corrupt`` marks
    lines Jackson rejects (parsed NULL). Empty lines (including the
    phantom tail of a newline-terminated file) are dropped — a tailing
    harvester would wait for the line to complete."""
    return parse_ndjson_files(read_ndjson_files(spark, path), schema)


def ndjson_stream(
    spark: SparkSession,
    path: str,
    schema: str = DEFAULT_EVENT_SCHEMA,
) -> DataFrame:
    """The LIVE twin of :func:`ndjson_events`: a file-source stream
    (filebeat tailing a log directory) through the IDENTICAL per-line
    parse/quarantine transformation — stateless, so it runs as a pure
    streaming projection (no state store) and the drained output equals
    the batch read of the same files row-for-row. New files appearing in
    ``path`` become micro-batches; the checkpoint is the registrar.

    Source note: the streaming TEXT source silently ignores
    ``wholetext`` (each line becomes a row and per-file line provenance
    is lost), so the stream reads whole files via the ``binaryFile``
    source (requires an explicit schema in streaming) and decodes —
    byte-identical content to the batch path's ``spark.read.text``."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .load(path)
        .select(
            F.col("path").alias("file"),
            F.col("content").cast("string").alias("content"),
        )
    )
    return parse_ndjson_files(files, schema)


def parse_ndjson_files(
    files: DataFrame, schema: str = DEFAULT_EVENT_SCHEMA
) -> DataFrame:
    """The shared batch/streaming parse: whole-file rows → per-line
    events with provenance + corrupt lane (see :func:`ndjson_events`)."""
    lines = files.select(
        F.regexp_extract("file", "([^/]+)$", 1).alias("file"),
        F.posexplode(F.split("content", "\n")).alias("line_idx", "raw"),
    ).filter(F.col("raw") != "")
    # PERMISSIVE from_json yields an all-NULL struct for malformed input
    # (indistinguishable from '{}'), so corruption is detected the
    # canonical way: a corrupt-record column in the schema, which Jackson
    # fills with the raw text ONLY when the parse failed
    with_corrupt = F.from_json(
        "raw",
        f"{schema}, _malformed string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_malformed"},
    )
    fields = [f.split()[0] for f in schema.split(",")]
    return lines.select(
        "file",
        F.col("line_idx").cast("bigint").alias("line_idx"),
        "raw",
        with_corrupt.alias("_p"),
    ).select(
        "file",
        "line_idx",
        "raw",
        F.when(
            F.col("_p._malformed").isNull(),
            F.struct(*[F.col(f"_p.{f}").alias(f) for f in fields]),
        ).alias("parsed"),
        F.col("_p._malformed").isNotNull().alias("corrupt"),
    )
