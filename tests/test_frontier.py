"""Crawl-frontier scheduling semantics (operators/frontier.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logsight_filebeat_spark.operators.frontier import (
    frontier_stats,
    schedule_frontier,
)


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, priority bigint"
    )


def test_slots_follow_priority_then_url(spark):
    out = schedule_frontier(
        _frontier(
            spark,
            [
                ("u/a", "h1", 10),
                ("u/b", "h1", 30),
                ("u/c", "h1", 30),
                ("u/z", "h2", 1),
            ],
        )
    ).collect()
    slots = {r.url: r.slot for r in out}
    # priority desc, url asc: b (30) before c (30) before a (10)
    assert slots == {"u/b": 0, "u/c": 1, "u/a": 2, "u/z": 0}


def test_delay_dim_and_default(spark):
    delays = spark.createDataFrame([("h1", 5)], "host string, delay_s int")
    out = schedule_frontier(
        _frontier(spark, [("u/a", "h1", 2), ("u/b", "h1", 1), ("u/x", "h2", 1)]),
        delays=delays,
        default_delay_s=2,
    ).collect()
    got = {r.url: (r.delay_s, r.fetch_at_s) for r in out}
    assert got == {"u/a": (5, 0), "u/b": (5, 5), "u/x": (2, 0)}


def test_two_phase_cap_matches_single_phase(spark):
    rows = [
        (f"u/{i:03d}", "hot" if i % 4 else "cold", (i * 37) % 23)
        for i in range(200)
    ]
    df = _frontier(spark, rows)
    salted = schedule_frontier(df, max_per_host=10, n_salt=4)
    plain = schedule_frontier(df, max_per_host=10, n_salt=None)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the salted plan really has the phase-1 bucket window
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2


def test_frontier_stats_makespan(spark):
    sched = schedule_frontier(
        _frontier(spark, [("u/a", "h1", 2), ("u/b", "h1", 1)]),
        default_delay_s=3,
    )
    [r] = frontier_stats(sched).collect()
    assert (r.host, r.n_urls, r.makespan_s, r.delay_s) == ("h1", 2, 3, 3)


def test_recrawl_schedule_tiers_and_load(spark):
    from logsight_filebeat_spark.operators.frontier import recrawl_schedule

    rows = (
        # hot: 3 of 4 observed changed → daily (24h)
        [("hot", "changed")] * 3 + [("hot", "unchanged")]
        # warm: 1 of 8 observed changed → weekly (168h)
        + [("warm", "changed")] + [("warm", "unchanged")] * 7
        # cold: nothing changed → monthly; 'new'/'gone' don't count as observed
        + [("cold", "unchanged")] * 2 + [("cold", "new"), ("cold", "gone")]
        # fresh: only new urls, zero observed → monthly default
        + [("fresh", "new")] * 3
    )
    df = spark.createDataFrame(rows, "host string, status string")
    got = {
        r["host"]: (
            r["n_urls"], r["n_observed"], r["n_changed"],
            r["interval_h"], r["fetches_per_day"],
        )
        for r in recrawl_schedule(df).collect()
    }
    assert got["hot"] == (4, 4, 3, 24, 4)       # 4*24/24
    assert got["warm"] == (8, 8, 1, 168, 1)     # 8*24/168 = 1 (floor)
    assert got["cold"] == (4, 2, 0, 720, 0)
    assert got["fresh"] == (3, 0, 0, 720, 0)
    # exact boundary: 1 of 2 observed = exactly 1/2 → daily
    b = spark.createDataFrame(
        [("b", "changed"), ("b", "unchanged")], "host string, status string"
    )
    assert recrawl_schedule(b).first()["interval_h"] == 24
