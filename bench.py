#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline job: the north-rule pages pipeline (multiline join → grok parse →
validate → broadcast enrich → route → per-(sink,hour) aggregates) reading a
materialized parquet pages table (generated deterministically, written once
untimed — the timed job is the production shape: columnar scan → pipeline).
Plus the corpus suites (dedup / similarity / text / multimodal) over the
driver-provided tables at $SPARK_GRAFT_SF_DIR.

Also measures the BASELINE.md scaling criterion: the same pipeline job, same
parquet input, at local[N/4] vs local[N] (the sandbox stand-in for N vs 4N
executors), reporting events/sec at both and the scaling efficiency
(throughput_hi / throughput_lo / 4). Each scaling level runs in a CHILD
process pinned with ``taskset`` to exactly that many CPUs — without pinning,
the low-parallelism JVM still spends all 32 machine cores on GC/compiler/
shuffle threads, inflating its throughput and understating efficiency.
Timed runs are min-of-N after a JVM warm-up (steady state; the sandbox VM
injects first-touch memory-fault and CPU-steal outliers).

Output (stdout, single line):
  {"metric": "wall_seconds_total", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": <sf>, "events_per_sec": ..., "gb_per_sec": ...,
   "scaling": {...}}

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_SCALING=0 to
skip the two extra scaling sessions, SPARK_GRAFT_BENCH_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# pages per unit scale factor: sf0.1 → 200k pages (~300k logical events)
PAGES_PER_SF = 2_000_000


def _sf() -> float:
    base = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _noop(df) -> None:
    """Materialize every row/column of df without collecting to the driver."""
    df.write.mode("overwrite").format("noop").save()


def _session(cores: int):
    from logsight_filebeat_spark.session import get_spark

    return get_spark(
        app_name=f"bench-local-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )


def _pipeline_job(spark, pages_path: str):
    """The flagship DAG over a parquet pages table: routed events → per-
    (sink, hour) aggregates. Materializing the aggregate forces the full
    multiline/grok/validate/enrich/route work on every row."""
    from logsight_filebeat_spark.entry_queries_corpus import _pages_plan
    from logsight_filebeat_spark.operators.aggregate import sink_hour_aggregates

    plan = _pages_plan(spark)
    routed = plan.mapped(spark.read.parquet(pages_path))
    return sink_hour_aggregates(routed, ts_col="warc_ts", bytes_cols=("message",))


def _timed_pipeline(spark, pages_path: str, runs: int = RUNS) -> float:
    """Min of `runs` timed executions (steady state — the sandbox is a
    Firecracker microVM where first-touch memory faults and CPU steal inject
    tens-of-seconds outliers; min-of-N is the honest steady-state figure)."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        _noop(_pipeline_job(spark, pages_path))
        best = min(best, time.time() - t0)
    return best


def _materialize_pages(spark, n_pages: int, path: str) -> dict:
    """Write the deterministic pages table once (untimed) and collect input
    facts: logical event count (multiline events) and column byte totals."""
    from pyspark.sql import functions as F

    from logsight_filebeat_spark.sources.pages import pages

    pg = pages(spark, n_pages, partitions=max(CPUS * 4, 32))
    pg.write.mode("overwrite").parquet(path)
    pg = spark.read.parquet(path)
    lines = F.split("text", "\n")
    facts = pg.agg(
        F.sum(
            F.size(lines) - F.size(F.filter(lines, lambda l: l.rlike("^\\s")))
        ).alias("events"),
        F.sum(F.octet_length("text")).alias("text_bytes"),
        F.sum(F.octet_length("html")).alias("html_bytes"),
    ).first()
    return {
        "events": int(facts.events),
        "text_bytes": int(facts.text_bytes),
        "html_bytes": int(facts.html_bytes),
    }


def _pinned_pipeline_run(cores: int, pages_path: str) -> float:
    """Run the timed pipeline in a child process pinned to `cores` CPUs
    (taskset). Returns the best wall-clock seconds (child prints one float)."""
    import subprocess

    cmd = [
        "taskset",
        "-c",
        f"0-{cores - 1}",
        sys.executable,
        os.path.abspath(__file__),
        "--pipeline-child",
        pages_path,
        str(cores),
        str(RUNS),
    ]
    if shutil.which("taskset") is None:
        cmd = cmd[3:]  # degrade gracefully: unpinned child
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return float(out.stdout.strip().splitlines()[-1])


def _pipeline_child(pages_path: str, cores: int, runs: int) -> None:
    s = _session(cores)
    _noop(_pipeline_job(s, pages_path))  # JVM/codegen warm-up
    best = _timed_pipeline(s, pages_path, runs)
    s.stop()
    print(best)


CORPUS_QUERIES = (
    "pl_flagship",
    "pg_grok_vectorized",
    "dd_dedup_exact",
    "dd_minhash_lsh",
    "dd_simhash",
    "tx_stats",
    "tx_fingerprint",
    "ann_brute_topk",
    "ann_srp_candidates",
    "mm_media_meta",
)


def main() -> None:
    import __spark_entry__ as entry

    sf = _sf()
    # the pipeline job must run long enough (>~15 s at the low parallelism)
    # for a throughput-scaling comparison to measure compute, not fixed
    # overhead — hence 32× the sf-proportional page count for the timed runs
    n_pages = max(int(PAGES_PER_SF * sf) * 32, 64_000)
    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    pages_path = os.path.join(tmp, "pages.parquet")
    try:
        spark = _session(CPUS)
        queries = entry.queries()
        facts = _materialize_pages(spark, n_pages, pages_path)

        timings: dict[str, float] = {}
        for name in CORPUS_QUERIES:
            t0 = time.time()
            _noop(queries[name](spark, SF_DIR))
            timings[name] = round(time.time() - t0, 3)
            print(f"{name}: {timings[name]:.2f}s", file=sys.stderr)

        # html-column scan rate: the text pipeline prunes html away, so the
        # BASELINE "GB/s of html scanned" is measured by the multimodal
        # metadata pass (octet_length + magic + sha256 over every payload)
        from pyspark.sql import functions as F  # noqa: PLC0415

        from logsight_filebeat_spark.operators.multimodal import media_meta

        t0 = time.time()
        _noop(
            spark.read.parquet(pages_path).select(
                media_meta("html").alias("meta")
            )
        )
        timings["html_media_meta"] = round(time.time() - t0, 3)
        html_gbs = facts["html_bytes"] / timings["html_media_meta"] / 1e9
        print(
            f"html_media_meta: {timings['html_media_meta']:.2f}s "
            f"({html_gbs:.3f} GB/s html)",
            file=sys.stderr,
        )
        spark.stop()

        # pipeline throughput at two parallelism levels over the same parquet
        # input (BASELINE.md: local[N/4] vs local[N] stands in for N vs 4N
        # executors); the hi-cores run doubles as the headline measurement
        lo_cores, hi_cores = max(CPUS // 4, 2), CPUS
        # interleave lo/hi children so slow machine drift (VM steal, memory
        # faulting) lands on both parallelism levels, not just one block
        order = (
            (lo_cores, hi_cores, lo_cores, hi_cores)
            if RUN_SCALING
            else (hi_cores,)
        )
        best: dict[int, float] = {}
        for cores in order:
            sec = _pinned_pipeline_run(cores, pages_path)
            best[cores] = min(best.get(cores, float("inf")), sec)
            print(
                f"pipeline local[{cores}] (pinned to {cores} cpus): "
                f"{facts['events']} events in {sec:.2f}s "
                f"({facts['events'] / sec:,.0f} ev/s)",
                file=sys.stderr,
            )
        scale = {c: (facts["events"] / s, s) for c, s in best.items()}
        eps, pipe_sec = scale[hi_cores]
        gbs = facts["text_bytes"] / pipe_sec / 1e9
        timings["pipeline_pages"] = round(pipe_sec, 3)

        scaling = None
        if RUN_SCALING:
            ratio = hi_cores / lo_cores
            scaling = {
                "cores_lo": lo_cores,
                "cores_hi": hi_cores,
                "eps_lo": round(scale[lo_cores][0], 1),
                "eps_hi": round(scale[hi_cores][0], 1),
                "efficiency": round(
                    scale[hi_cores][0] / scale[lo_cores][0] / ratio, 3
                ),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "metric": "wall_seconds_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pages": n_pages,
        "events": facts["events"],
        "events_per_sec": round(eps, 1),
        "gb_per_sec": round(gbs, 4),
        "html_gb_per_sec": round(html_gbs, 4),
    }
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline-child":
        _pipeline_child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        main()
