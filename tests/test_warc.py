"""WARC archive source (sources/warc.py) over the committed data/warc
fixture: record boundaries, header extraction, Content-Length validation
(both corruption shapes), and the pages-table round trip back to the
originating parquet fixture.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logsight_filebeat_spark.sources.warc import warc_pages, warc_records

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WARC = os.path.join(REPO, "data", "warc")
PAGES = os.path.join(REPO, "data", "pages_sf0.001.parquet")


def test_warc_records_parse_and_validate(spark):
    rec = warc_records(spark, WARC).collect()
    by_file = {}
    for r in rec:
        by_file.setdefault(os.path.basename(r.file), []).append(r)
    assert sorted(by_file) == [
        "crawl-2024-03-01-00000.warc",
        "crawl-2024-03-01-00001.warc",
    ]
    f0 = sorted(by_file["crawl-2024-03-01-00000.warc"], key=lambda r: r.rec_idx)
    assert [r.rec_idx for r in f0] == list(range(20))
    assert all(r.valid for r in f0)
    assert all(r.warc_type == "response" for r in f0)
    assert all(r.payload_bytes == r.content_length for r in f0)
    assert all(r.target_uri.startswith("https://") for r in f0)

    f1 = sorted(by_file["crawl-2024-03-01-00001.warc"], key=lambda r: r.rec_idx)
    # 20 good records + 1 length-lie + 1 magic-embedder severed into 2
    assert len(f1) == 23
    bad = [r for r in f1 if not r.valid]
    # length-mismatch record flags invalid
    assert any(
        r.target_uri == "https://corrupt.example/len-mismatch"
        and r.content_length == 20
        and r.payload_bytes != 20
        for r in bad
    )
    # the magic-embedding record severs into TWO records, both invalid
    severed = [
        r
        for r in f1
        if r.target_uri
        in ("https://corrupt.example/embedded-magic", "https://fake.example/")
    ]
    assert len(severed) == 2
    assert all(not r.valid for r in severed)
    assert len(bad) == 3  # and nothing else flagged


def test_warc_pages_round_trips_the_pages_fixture(spark):
    """warc_pages over the fixture must reproduce the originating pages
    rows byte-for-byte (url, warc_ts, html, text==decoded html payload) —
    the archive format is lossless for the engine's input contract."""
    got = {
        r.url: (r.warc_ts, bytes(r.html), r.text)
        for r in warc_pages(spark, WARC).collect()
    }
    src = (
        spark.read.parquet(PAGES)
        .orderBy("url")
        .limit(40)
        .select("url", "warc_ts", "html", "text")
        .collect()
    )
    assert len(got) == 40
    for r in src:
        ts, html, text = got[r.url]
        assert ts == r.warc_ts
        assert html == bytes(r.html)
        assert text == r.text  # the byte-identical extracted-text invariant


def test_warc_plan_is_pure_column(spark):
    plan = warc_records(spark, WARC)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange" not in plan  # no shuffle: scan → split → project
    for py_stage in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_stage not in plan
