"""Salted aggregation equivalence + Structured Streaming micro-batch loop."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logsight_filebeat_spark.operators.skew import salted_agg
from logsight_filebeat_spark.sources.pages import pages


def test_salted_agg_equals_plain_groupby(spark):
    pg = pages(spark, 3000).withColumn(
        "host", F.regexp_extract("url", "https://([^/]+)/", 1)
    ).withColumn("n_bytes", F.octet_length("text"))
    aggs = [
        ("n_pages", "count", None),
        ("byte_total", "sum", "n_bytes"),
        ("first_ts", "min", "warc_ts"),
        ("last_ts", "max", "warc_ts"),
    ]
    salted = {
        r.host: (r.n_pages, r.byte_total, r.first_ts, r.last_ts)
        for r in salted_agg(pg, ["host"], aggs, salt_buckets=8).collect()
    }
    plain = {
        r.host: (r.n_pages, r.byte_total, r.first_ts, r.last_ts)
        for r in pg.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n_bytes").alias("byte_total"),
            F.min("warc_ts").alias("first_ts"),
            F.max("warc_ts").alias("last_ts"),
        )
        .collect()
    }
    assert salted == plain
    # the hot host really is hot (skew exists to be handled)
    assert max(v[0] for v in salted.values()) > 0.3 * 3000


def test_salted_agg_rejects_non_decomposable(spark):
    import pytest

    pg = pages(spark, 10)
    with pytest.raises(ValueError, match="not decomposable"):
        salted_agg(pg, ["lang"], [("x", "avg", "warc_ts")])


def test_stream_pipeline_matches_batch_and_resumes(spark, tmp_path):
    from logsight_filebeat_spark.entry_queries_corpus import _pages_plan
    from logsight_filebeat_spark.streaming.micro_batch import run_stream

    in_dir = str(tmp_path / "in")
    sink_root = str(tmp_path / "out")
    plan = _pages_plan(spark)

    pages(spark, 500, seed=7).coalesce(1).write.mode("append").parquet(in_dir)
    q = run_stream(spark, plan, in_dir, sink_root)
    q.awaitTermination(120)

    routed_path = os.path.join(sink_root, "routed")
    first_count = spark.read.parquet(routed_path).count()
    batch_count = plan.mapped(pages(spark, 500, seed=7)).count()
    assert first_count == batch_count

    # drain again with no new input: checkpoint says nothing to do
    q2 = run_stream(spark, plan, in_dir, sink_root)
    q2.awaitTermination(120)
    assert spark.read.parquet(routed_path).count() == first_count

    # new file lands → only the new pages are processed (registrar resume)
    pages(spark, 200, seed=8).coalesce(1).write.mode("append").parquet(in_dir)
    q3 = run_stream(spark, plan, in_dir, sink_root)
    q3.awaitTermination(120)
    extra = plan.mapped(pages(spark, 200, seed=8)).count()
    assert spark.read.parquet(routed_path).count() == first_count + extra


def test_streaming_aggregates_shape(spark, tmp_path):
    from logsight_filebeat_spark.entry_queries_corpus import _pages_plan
    from logsight_filebeat_spark.streaming.micro_batch import (
        read_pages_stream,
        streaming_aggregates,
    )

    in_dir = str(tmp_path / "in")
    pages(spark, 300, seed=7).coalesce(1).write.mode("append").parquet(in_dir)
    plan = _pages_plan(spark)
    agg = streaming_aggregates(plan, read_pages_stream(spark, in_dir))
    assert agg.isStreaming
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("agg_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from agg_test").collect()
    assert rows
    assert {"hour_window", "sink", "event_count", "byte_total", "failed_count"} <= set(
        rows[0].asDict()
    )
    total = sum(r.event_count for r in rows)
    assert total == plan.mapped(pages(spark, 300, seed=7)).count()


def test_sessionize_gap_rule(spark):
    """Sessions split only on gaps STRICTLY over the gap duration; an
    event exactly at the boundary still merges (pins Spark's inclusive
    merge rule, which the ev_sessions oracle mirrors with `>`)."""
    from datetime import datetime, timedelta

    from logsight_filebeat_spark.operators.aggregate import sessionize

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    m = timedelta(minutes=1)
    rows = [
        (1, t0, 7, 1.0),
        (2, t0 + 10 * m, 7, 2.0),        # 10 min gap → same session
        (3, t0 + 45 * m, 7, 4.0),        # 35 min gap → new session
        (4, t0, 9, 1.5),
        (5, t0 + 30 * m, 9, 2.5),        # exactly 30 min → still merges
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    got = sorted(
        sessionize(df, gap="30 minutes").collect(),
        key=lambda r: (r.user_id, r.session_start),
    )
    assert [(r.user_id, r.n_events, r.total_value) for r in got] == [
        (7, 2, 3.0),
        (7, 1, 4.0),
        (9, 2, 4.0),
    ]
    assert got[0].session_start == t0 and got[0].session_end == t0 + 10 * m


def test_running_totals_state_survives_micro_batches(spark, tmp_path):
    """applyInPandasWithState per-key totals accumulate ACROSS micro-batches
    (maxFilesPerTrigger=1 forces one batch per file) and the final running
    total equals the global per-key count."""
    from logsight_filebeat_spark.streaming.stateful import running_totals

    in_dir = str(tmp_path / "in")
    spark.createDataFrame(
        [("auth", 10), ("search", 5)] * 3, "sink string, n int"
    ).coalesce(1).write.mode("overwrite").parquet(in_dir)
    spark.createDataFrame(
        [("auth", 7)] * 2, "sink string, n int"
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema("sink string, n int")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = running_totals(stream, key_col="sink", bytes_col="n")
    q = (
        out.writeStream.format("memory")
        .queryName("rt_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("rt_out").collect()
    # at least two micro-batches touched 'auth'
    auth = sorted(
        (r for r in rows if r.sink == "auth"), key=lambda r: r.total_events
    )
    assert len(auth) >= 2
    assert auth[-1].total_events == 5  # 3 + 2 events
    assert auth[-1].total_bytes == 44  # 3×10 + 2×7
    # totals are monotone across batches (state accumulated, not reset)
    assert all(
        a.total_events < b.total_events for a, b in zip(auth, auth[1:])
    )
    search = [r for r in rows if r.sink == "search"]
    assert max(r.total_events for r in search) == 3
    assert max(r.total_bytes for r in search) == 15


def test_sessionize_runs_in_streaming_mode(spark, tmp_path):
    """The same sessionize() call works as a streaming aggregate (the
    docstring's claim): session windows over a file stream with a
    watermark, drained with availableNow, equal the batch result."""
    from datetime import datetime, timedelta

    from logsight_filebeat_spark.operators.aggregate import sessionize

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    m = timedelta(minutes=1)
    rows = [
        (1, t0, 7, 1.0),
        (2, t0 + 5 * m, 7, 2.0),
        (3, t0 + 90 * m, 7, 3.0),
        (4, t0 + 2 * m, 9, 4.0),
    ]
    in_dir = str(tmp_path / "in")
    batch_df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    batch_df.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, value double"
    ).parquet(in_dir)
    agg = sessionize(stream.withWatermark("ts", "2 hours"), gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.table("sess_stream").collect()
    }
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in sessionize(batch_df, gap="30 minutes").collect()
    }
    assert streamed == batch and len(batch) == 3


def test_asof_join_semantics(spark):
    """Backward as-of: latest right row with ts <= left ts per key; ties
    match (inclusive); unmatched left rows survive with nulls; a matched
    right row whose value is null is still a MATCH (atomic struct carry),
    not a fall-through to an older row."""
    from datetime import datetime

    from logsight_filebeat_spark.operators.aggregate import asof_join

    t = lambda s: datetime(2024, 1, 1, 12, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, 7, t(10)),   # before any right row → null
            (2, 7, t(20)),   # tie with right@20 → matches it
            (3, 7, t(35)),   # between 30 and 40 → right@30 (null value!)
            (4, 7, t(50)),   # after right@40 → right@40
            (5, 9, t(50)),   # key with no right rows at all → null
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, t(20), 2.0),
            (7, t(30), None),  # legitimate null value
            (7, t(40), 4.0),
        ],
        "user_id bigint, ts timestamp, v double",
    )
    got = {
        r.event_id: (r.asof_ts, r.asof_v)
        for r in asof_join(
            left, right, key_col="user_id", value_cols=("v",)
        ).collect()
    }
    assert got == {
        1: (None, None),
        2: (t(20), 2.0),
        3: (t(30), None),
        4: (t(40), 4.0),
        5: (None, None),
    }


def test_asof_join_plan_single_shuffle(spark):
    """The as-of construction is union + ONE hash-partitioned window on the
    key — never an inequality join (no CartesianProduct /
    BroadcastNestedLoopJoin, no SortMergeJoin) and exactly one Exchange."""
    from datetime import datetime

    from logsight_filebeat_spark.operators.aggregate import asof_join

    left = spark.createDataFrame(
        [(1, 7, datetime(2024, 1, 1))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, datetime(2024, 1, 1), 1.0)],
        "user_id bigint, ts timestamp, v double",
    )
    plan = (
        asof_join(left, right, key_col="user_id", value_cols=("v",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_content_dedup_stream_state_spans_micro_batches(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch (maxFilesPerTrigger=1
    → one file per batch) must still be dropped: the dedup state store
    survives batch boundaries."""
    from datetime import datetime

    from logsight_filebeat_spark.streaming.micro_batch import (
        content_dedup_stream,
    )

    src = tmp_path / "docs"
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    schema = "doc_id bigint, text string, ts timestamp"
    spark.createDataFrame(
        [(1, "alpha", t0), (2, "beta", t0)], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(3, "gamma", t0), (4, "alpha", t0)], schema  # dup of doc 1
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        content_dedup_stream(stream, watermark="1 hour")
        .select("text")
        .writeStream.format("memory")
        .queryName("st_dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = sorted(r.text for r in spark.table("st_dedup_test").collect())
    assert got == ["alpha", "beta", "gamma"]


def test_multiline_stream_folds_and_timeout_flushes(spark, tmp_path):
    """Streaming multiline with the Beats `timeout` flush: an event left
    OPEN at the end of one micro-batch (maxFilesPerTrigger=1 → one batch
    per file) absorbs its continuation lines from the NEXT batch; events
    still open once input runs dry flush via the 2 s processing-time
    timeout (while any state timeout is pending the engine keeps
    scheduling no-data batches, which is what fires it — so the test
    polls the sink and stops the query explicitly; a query with
    registered processing-time timeouts never self-terminates, even
    under availableNow)."""
    import time

    from logsight_filebeat_spark.streaming.stateful import multiline_events

    src = tmp_path / "lines"
    schema = "file string, line_idx bigint, line string"
    # batch 1: one complete event + one event left open
    spark.createDataFrame(
        [
            ("a.log", 0, "2024 first"),
            ("a.log", 1, "  cont1"),
            ("a.log", 2, "2024 second"),
            ("b.log", 0, "2024 other"),
        ],
        schema,
    ).coalesce(1).write.parquet(str(src / "f1"))
    # batch 2: continuation of a.log's open event, then a fresh opener
    spark.createDataFrame(
        [
            ("a.log", 3, "  cont2"),
            ("a.log", 4, "2024 third"),
        ],
        schema,
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        multiline_events(stream, timeout_ms=2000)
        .writeStream.format("memory")
        .queryName("ml_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    expected = {
        # closed by the next opener — cross-batch state fold
        ("a.log", 0): ("2024 first\n  cont1", False),
        ("a.log", 1): ("2024 second\n  cont2", False),
        # still open when input ran dry — flushed by the timeout
        ("a.log", 2): ("2024 third", True),
        ("b.log", 0): ("2024 other", True),
    }
    got = {}
    try:
        deadline = time.time() + 120
        while time.time() < deadline and len(got) < len(expected):
            time.sleep(1)
            got = {
                (r.file, r.event_idx): (r.event_text, r.by_timeout)
                for r in spark.table("ml_stream").collect()
            }
    finally:
        q.stop()
    assert got == expected


def test_multiline_stream_validation():
    import pytest

    from logsight_filebeat_spark.streaming.stateful import multiline_events

    for kwargs in (
        {"match": "sideways"},
        {"max_lines": 0},
        {"timeout_ms": 0},
        {"pattern": "(["},
    ):
        with pytest.raises(Exception):
            multiline_events(None, **kwargs)


def test_session_stream_matches_batch_sessionize(spark, tmp_path):
    """session_stream (the dedicated streaming twin in micro_batch.py)
    emits the SAME session table as the batch sessionize operator — column
    names included — so a live stream and a batch backfill are
    interchangeable."""
    from datetime import datetime, timedelta

    from logsight_filebeat_spark.operators.aggregate import sessionize
    from logsight_filebeat_spark.streaming.micro_batch import session_stream

    t0 = datetime(2024, 3, 1, 8, 0, 0)
    m = timedelta(minutes=1)
    rows = [
        (1, t0, 5, 1.5),
        (2, t0 + 29 * m, 5, 2.5),          # 29 min gap: same session
        (3, t0 + 29 * m + 30 * m, 5, 0.5),  # exactly 30 min: still merges
        (4, t0 + 200 * m, 5, 4.0),          # new session
        (5, t0, 6, 9.0),
    ]
    in_dir = str(tmp_path / "in")
    batch_df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    batch_df.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, value double"
    ).parquet(in_dir)
    out = session_stream(
        stream, key_col="user_id", ts_col="ts", gap="30 minutes",
        watermark="2 hours", value_col="value",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_twin")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.table("sess_twin").collect()
    }
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in sessionize(batch_df, gap="30 minutes").collect()
    }
    assert streamed == batch
    assert len(batch) == 3  # user 5: one merged session + one late; user 6: one


def test_correlate_streams_matches_batch_range_join(spark, tmp_path):
    """Stream-stream inner join with a time bound equals the batch range
    join on the same data: same-key right events within [l_ts, l_ts+30m]
    pair up, boundary-inclusive both ends, everything else drops."""
    from datetime import datetime, timedelta

    from logsight_filebeat_spark.streaming.micro_batch import correlate_streams

    t0 = datetime(2024, 4, 1, 9, 0, 0)
    m = timedelta(minutes=1)
    views = [  # (user, view_id, ts)
        (7, 100, t0),
        (7, 101, t0 + 60 * m),
        (8, 102, t0),
    ]
    clicks = [  # (user, click_id, ts)
        (7, 200, t0 + 5 * m),     # matches view 100
        (7, 201, t0 + 30 * m),    # exactly +30m: inclusive -> matches 100
        (7, 202, t0 + 59 * m),    # matches nothing (before 101, after 100+30m)
        (7, 203, t0 + 61 * m),    # matches view 101
        (8, 204, t0 - m),         # before the view: no match
        (9, 205, t0),             # key with no views
    ]
    v_dir, c_dir = str(tmp_path / "v"), str(tmp_path / "c")
    spark.createDataFrame(
        views, "user_id bigint, view_id bigint, view_ts timestamp"
    ).write.parquet(v_dir)
    spark.createDataFrame(
        clicks, "user_id bigint, click_id bigint, click_ts timestamp"
    ).write.parquet(c_dir)
    vs = spark.readStream.schema(
        "user_id bigint, view_id bigint, view_ts timestamp"
    ).parquet(v_dir)
    cs = spark.readStream.schema(
        "user_id bigint, click_id bigint, click_ts timestamp"
    ).parquet(c_dir)
    out = correlate_streams(
        vs, cs, key_col="user_id", left_ts="view_ts", right_ts="click_ts",
        max_delay="30 minutes", watermark="2 hours",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sscorr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.view_id, r.click_id)
        for r in spark.table("sscorr").collect()
    }
    assert got == {(7, 100, 200), (7, 100, 201), (7, 101, 203)}


def test_correlate_streams_rejects_colliding_columns(spark, tmp_path):
    import pytest

    from logsight_filebeat_spark.streaming.micro_batch import correlate_streams

    d = str(tmp_path / "d")
    spark.createDataFrame(
        [(1, 2)], "user_id bigint, ts bigint"
    ).write.parquet(d)
    s = spark.readStream.schema("user_id bigint, ts bigint").parquet(d)
    with pytest.raises(ValueError, match="rename upstream"):
        correlate_streams(s, s, left_ts="ts", right_ts="ts")


def test_hourly_rates_state_accumulates_and_matches_batch_scoring(
    spark, tmp_path
):
    """hourly_rates folds out-of-order events into per-(key, hour) state
    across micro-batches; max(n) per bucket over the drained update
    stream must equal the plain batch hourly count, and scoring it with
    ewma_from_hourly must match ewma_scores on the same events exactly
    (shared scoring expression — stream ≡ backfill)."""
    import datetime as dt

    import pyspark.sql.functions as F

    from logsight_filebeat_spark.operators.aggregate import (
        ewma_from_hourly,
        ewma_scores,
    )
    from logsight_filebeat_spark.streaming.stateful import hourly_rates

    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    rows = []
    for i in range(60):  # key A: hours 0..5, 10 events each
        rows.append(("A", base + dt.timedelta(hours=i % 6, minutes=i % 50)))
    for i in range(12):  # key B: a burst hour after a quiet run
        rows.append(("B", base + dt.timedelta(hours=3, minutes=i)))
    rows.append(("B", base))
    # split so each hour's events span files (out-of-order arrival)
    in_dir = str(tmp_path / "ev")
    df = spark.createDataFrame(rows, "key string, ts timestamp")
    for s in range(3):
        df.filter(F.minute("ts") % 3 == s).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    stream = (
        spark.readStream.schema("key string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = hourly_rates(stream, key_col="key", ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("hr_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("hr_out")
    # cross-batch accumulation: some bucket was emitted more than once
    # with increasing cumulative counts
    multi = (
        drained.groupBy("key", "hour")
        .agg(F.count("*").alias("c"), F.max("n").alias("mx"))
        .filter(F.col("c") >= 2)
    )
    assert multi.count() > 0
    final = drained.groupBy("key", "hour").agg(F.max("n").alias("n"))
    batch_hourly = df.groupBy(
        "key", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    sk = lambda r: (r.key, r.hour)
    assert sorted(final.collect(), key=sk) == sorted(
        batch_hourly.collect(), key=sk
    )
    got = sorted(ewma_from_hourly(final).collect(), key=sk)
    want = sorted(ewma_scores(df, "key", "ts").collect(), key=sk)
    assert got == want  # float-exact: same scoring expression
    # B's hour-3 burst flags against its quiet baseline
    b3 = [r for r in want if r.key == "B" and r.hour.hour == 3][0]
    assert b3.is_burst


def test_hourly_rates_max_hours_evicts_oldest(spark, tmp_path):
    import datetime as dt

    import pyspark.sql.functions as F

    from logsight_filebeat_spark.streaming.stateful import hourly_rates

    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    rows = [("K", base + dt.timedelta(hours=h)) for h in range(6)]
    in_dir = str(tmp_path / "ev2")
    spark.createDataFrame(rows, "key string, ts timestamp").coalesce(
        1
    ).write.mode("overwrite").parquet(in_dir)
    stream = (
        spark.readStream.schema("key string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = hourly_rates(stream, key_col="key", ts_col="ts", max_hours=2)
    q = (
        out.writeStream.format("memory")
        .queryName("hr_ev")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # single batch: all 6 buckets were touched and emitted, but state kept
    # only the newest 2 — emission reflects surviving buckets
    got = {r.hour.hour: r.n for r in spark.table("hr_ev").collect()}
    assert set(got) == {4, 5} and all(v == 1 for v in got.values())
