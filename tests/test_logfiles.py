"""Harvester source (sources/logfiles.py) over the committed .log fixtures."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logsight_filebeat_spark.sources.logfiles import (
    harvest_events,
    logfiles_as_pages,
    read_log_files,
)

LOGS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "logs")


def test_read_log_files_one_row_per_file(spark):
    df = read_log_files(spark, LOGS)
    assert df.count() == 3
    names = sorted(os.path.basename(r.file) for r in df.collect())
    assert names == [
        "app-2024-03-01.log",
        "app-2024-03-02.log",
        "worker-2024-03-02.log",
    ]


def test_harvest_events_multiline_and_no_phantom_tail(spark):
    ev = harvest_events(spark, LOGS)
    by_file = {}
    for r in ev.collect():
        by_file.setdefault(os.path.basename(r.file), []).append(r)
    # app-01: 6 lines, 2 stack-trace continuations merge into the ERROR event
    app1 = sorted(by_file["app-2024-03-01.log"], key=lambda r: r.event_idx)
    assert len(app1) == 4
    err = [r for r in app1 if "ERROR" in r.event_text][0]
    assert "Handler.java:42" in err.event_text and err.event_text.count("\n") == 2
    # worker: EXCEPTION event carries its tab-indented trace
    w = sorted(by_file["worker-2024-03-02.log"], key=lambda r: r.event_idx)
    assert len(w) == 2
    assert "IllegalStateException" in w[1].event_text
    # no empty phantom events from trailing newlines
    assert ev.filter(F.col("event_text") == "").count() == 0


def test_logfiles_as_pages_runs_full_pipeline(spark):
    from logsight_filebeat_spark.entry_queries_corpus import _pages_plan

    pg = logfiles_as_pages(spark, LOGS)
    assert set(pg.columns) == {"url", "warc_ts", "html", "text", "lang"}
    routed = _pages_plan(spark).mapped(pg)
    counts = {r.sink: r.n for r in routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()}
    # file:// urls match no route rule → constant fallback; bad rows quarantine
    assert counts.get("default", 0) >= 7
    assert counts.get("_quarantine", 0) >= 3  # date-only ts, bogus level, …


def test_ndjson_events_parse_quarantine_and_provenance(spark, tmp_path):
    from logsight_filebeat_spark.sources.jsonlines import ndjson_events

    p = tmp_path / "in"
    p.mkdir()
    (p / "a.ndjson").write_text(
        '{"ts":"2024-01-01T00:00:00Z","level":"INFO","msg":"ok","host":"h1"}\n'
        'garbage line\n'
        '{"msg":"no level or ts"}\n'
        '{}\n'
        '{"ts":"2024-01-01T00:00:03Z","level":"bogus","msg":"bad level"}\n'
    )
    ev = ndjson_events(spark, str(p))
    rows = {r.line_idx: r for r in ev.collect()}
    assert len(rows) == 5  # newline tail dropped, nothing else
    assert rows[0].parsed.level == "INFO" and not rows[0].corrupt
    assert rows[1].corrupt and rows[1].parsed is None
    assert rows[1].raw == "garbage line"  # quarantine keeps the bytes
    assert not rows[2].corrupt and rows[2].parsed.level is None
    assert not rows[3].corrupt  # empty object parses; fails validation later
    assert rows[4].parsed.level == "bogus"
    # line order is the file order (whole-file read, not split lines)
    assert sorted(rows) == [0, 1, 2, 3, 4]
    # JVM json path: no Python evaluation in the plan
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ndjson_nested_object_lands_as_json_text(spark, tmp_path):
    from logsight_filebeat_spark.sources.jsonlines import ndjson_events

    p = tmp_path / "in2"
    p.mkdir()
    (p / "b.ndjson").write_text(
        '{"ts":"t","level":"INFO","msg":"m","host":"h","props":{"code":500}}\n'
    )
    row = ndjson_events(spark, str(p)).collect()[0]
    import json

    assert json.loads(row.parsed.props) == {"code": 500}


def test_ndjson_stream_equals_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    from logsight_filebeat_spark.sources.jsonlines import (
        ndjson_events,
        ndjson_stream,
    )

    p = tmp_path / "nd"
    p.mkdir()
    (p / "a.ndjson").write_text(
        '{"ts":"2024-01-01T00:00:00Z","level":"INFO","msg":"ok","host":"h"}\n'
        'broken {\n'
    )
    (p / "b.ndjson").write_text('{"msg":"m2"}\n')
    out = ndjson_stream(spark, str(p)).drop("parsed").withColumn(
        "file", F.regexp_extract("file", "([^/]+)$", 1)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("nd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    key = lambda r: (r.file, r.line_idx)
    got = sorted(spark.table("nd_out").collect(), key=key)
    want = sorted(
        ndjson_events(spark, str(p)).drop("parsed").collect(), key=key
    )
    assert got == want
    assert len(got) == 3 and got[1].corrupt
