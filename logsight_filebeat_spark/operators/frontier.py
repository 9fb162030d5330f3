"""Crawl-frontier scheduling — per-host politeness slots at corpus scale.

The fetch side of the shipper's harvest loop (reference: the filebeat
harvester schedules per-file reads; a crawler schedules per-HOST fetches):
given a frontier of candidate urls with priorities and per-host crawl
delays (robots.txt Crawl-delay or a politeness default), assign every url
its fetch SLOT within its host queue and the wall-clock offset at which
that slot comes up. Politeness makes a host's fetches inherently serial,
so the slot sequence IS the schedule; across hosts everything is
embarrassingly parallel.

Scale shapes:
* The per-host ranking window is the classic hot-key trap (one task sees
  every url of a 10^8-page host), so with a cap the ranking is TWO-PHASE
  exactly like sampling.per_key_cap: phase 1 ranks inside (host, salt)
  buckets and keeps ``cap`` per bucket — provably a superset of the
  global top-cap, because any row in a host's global top-cap is also in
  its own bucket's top-cap under the same total order — and phase 2
  re-ranks only the ``≤ cap·n_salt`` survivors. Uncapped frontiers keep
  the single window (documented: an uncapped hot host costs one wide
  task — but politeness means you never crawl an uncapped hot host
  anyway).
* Crawl delays ride a broadcast join keyed on host (robots tables are
  dimension-sized); missing hosts take ``default_delay_s``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logsight_filebeat_spark.functions.hashing import seeded_hash32


def schedule_frontier(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
    delays: DataFrame | None = None,
    default_delay_s: int = 1,
    max_per_host: int | None = None,
    n_salt: int = 8,
) -> DataFrame:
    """Assign politeness slots: per host, urls rank by (priority DESC,
    url ASC — a total order, so the schedule is deterministic and
    engine-portable), the top ``max_per_host`` (all, when None) keep
    0-based ``slot``, and ``fetch_at_s = slot * delay_s`` places the
    fetch on the host's serial timeline. ``delays`` is an optional
    (host, delay_s) dimension — robots.txt Crawl-delay — broadcast-joined;
    absent hosts crawl at ``default_delay_s``.

    Output: (url, host, priority, slot, delay_s, fetch_at_s)."""
    rows = frontier.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.col(priority_col).cast("bigint").alias("priority"),
    )
    order = [F.col("priority").desc(), F.col("url").asc()]
    if max_per_host is not None and n_salt is not None:
        salt = seeded_hash32(F.col("url"), "frontier~salt") % n_salt
        w1 = Window.partitionBy("host", salt).orderBy(*order)
        rows = rows.withColumn("_rn1", F.row_number().over(w1)).filter(
            F.col("_rn1") <= max_per_host
        )
    w = Window.partitionBy("host").orderBy(*order)
    ranked = rows.withColumn(
        "slot", (F.row_number().over(w) - 1).cast("bigint")
    )
    if max_per_host is not None:
        ranked = ranked.filter(F.col("slot") < max_per_host)
    if delays is not None:
        ranked = ranked.join(
            F.broadcast(delays.select("host", "delay_s")), "host", "left"
        )
        delay = F.coalesce(
            F.col("delay_s").cast("bigint"), F.lit(default_delay_s)
        )
    else:
        delay = F.lit(default_delay_s).cast("bigint")
    return ranked.select(
        "url",
        "host",
        "priority",
        "slot",
        delay.alias("delay_s"),
        (F.col("slot") * delay).cast("bigint").alias("fetch_at_s"),
    )


def frontier_stats(schedule: DataFrame) -> DataFrame:
    """Per-host schedule summary — queue depth and makespan (when the
    host's last scheduled fetch fires). The ops view that finds the
    long-pole hosts bounding a crawl round's wall clock: one hash
    aggregate, map-side combinable."""
    return schedule.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.max("fetch_at_s").alias("makespan_s"),
        F.max("delay_s").alias("delay_s"),
    )


def recrawl_schedule(
    diff: DataFrame,
    host_col: str = "host",
    status_col: str = "status",
    tiers: tuple[tuple[int, int, int], ...] = (
        (1, 2, 24),      # change_rate ≥ 1/2  → daily
        (1, 10, 168),    # change_rate ≥ 1/10 → weekly
    ),
    default_interval_h: int = 720,  # else monthly
) -> DataFrame:
    """Per-host recrawl scheduling from observed change rates — the
    freshness side of crawl budgeting: hosts whose pages churn get short
    revisit intervals, static archives get long ones (the classic
    uniform-refresh vs proportional-refresh tradeoff; Cho &
    Garcia-Molina 2003). Input is a snapshot diff's (host, status) rows
    (status ∈ new/gone/changed/unchanged, e.g. from
    :func:`~logsight_filebeat_spark.operators.dedup.snapshot_diff`
    joined to its url's host).

    Tier thresholds are RATIONAL (num, den, interval_h) triples compared
    as ``den·n_changed ≥ num·n_observed`` — pure integer arithmetic, so
    tier picks are bit-stable at any parallelism and engine. Returns one
    row per host: (host, n_urls, n_observed, n_changed, change_rate,
    interval_h, fetches_per_day) where fetches_per_day = n_urls·24 div
    interval_h is the host's contribution to daily recrawl load and
    change_rate = n_changed/n_observed rounded to 1e-6 (reporting only —
    decisions never touch the float). n_observed counts urls seen in
    BOTH snapshots (only those can witness change); new/gone rows count
    toward n_urls but not the rate.

    Scale shape: ONE hash aggregate on host (dimension-sized output),
    conditional sums as codegen'd CASE columns; the tier pick is a
    literal CASE chain — no joins, no windows."""
    changed = (F.col(status_col) == "changed").cast("bigint")
    observed = F.col(status_col).isin("changed", "unchanged").cast("bigint")
    agg = diff.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
        F.sum(observed).cast("bigint").alias("n_observed"),
        F.sum(changed).cast("bigint").alias("n_changed"),
    )
    interval = F.lit(default_interval_h).cast("bigint")
    for num, den, hours in reversed(tiers):
        interval = F.when(
            (F.col("n_observed") > 0)
            & (F.lit(den) * F.col("n_changed") >= F.lit(num) * F.col("n_observed")),
            F.lit(hours).cast("bigint"),
        ).otherwise(interval)
    return agg.select(
        "host",
        "n_urls",
        "n_observed",
        "n_changed",
        F.when(
            F.col("n_observed") > 0,
            F.round(F.col("n_changed") / F.col("n_observed"), 6),
        ).alias("change_rate"),
        interval.alias("interval_h"),
    ).withColumn(
        "fetches_per_day",
        F.expr("n_urls * 24 div interval_h").cast("bigint"),
    )
