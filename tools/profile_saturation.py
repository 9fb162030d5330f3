"""Profile the 8→32 saturation gap (VERDICT r2: the pipeline scores 0.579
of the pure-CPU ceiling at the 8→32 pair, vs ~1.0 at 2→8 — something beyond
the VM's vCPU contention is lost at full saturation).

Runs the SAME pipeline job as bench.py's pinned children under candidate
configs, each in a taskset-pinned child process, and measures per timed run:
wall seconds, JVM GC milliseconds (GarbageCollectorMXBeans delta), and JVM
process-CPU seconds (OperatingSystemMXBean delta). cpu/wall vs the core
count separates the hypotheses:

  * GC share high             → heap/collector tuning is the lever
  * cpu/wall ≈ cores, wall ↑  → memory-bandwidth/frequency contention
                                 (nothing Spark-side to fix on this box)
  * cpu/wall ≪ cores          → idle gaps: scheduling waves, skew, serial
                                 phases → partition-count lever

Usage: python tools/profile_saturation.py [pages_n]   (default 1,600,000)
       child mode is internal.

Results land as one JSON line per (variant, cores) on stdout; stderr
narrates. Findings for round 3 are summarized in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_JAVA = "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m"

VARIANTS: dict[str, dict[str, str]] = {
    # replicate the bench child exactly (shuffle=cores, AQE off, 12g)
    "base": {},
    # more, smaller shuffle partitions: shorter scheduling waves, less
    # per-task memory, better balance across 32 threads
    "shuffle64": {"spark.sql.shuffle.partitions": "64"},
    "shuffle128": {"spark.sql.shuffle.partitions": "128"},
    # throughput collector: fewer, longer pauses; G1 is the JDK17 default
    "parallelgc": {
        "spark.driver.extraJavaOptions": BASE_JAVA + " -XX:+UseParallelGC"
    },
    # bigger G1 regions: fewer cross-region references for the large
    # humongous strings the parse stage churns
    "g1region32m": {
        "spark.driver.extraJavaOptions": BASE_JAVA + " -XX:G1HeapRegionSize=32m"
    },
    # more GC headroom (bench children default to 12g)
    "heap24g": {"_driver_mem": "24g"},
    # off-heap execution memory: shuffle/agg buffers out of the GC's way
    "offheap8g": {
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "8g",
    },
}


def _child(pages_path: str, cores: int, conf_json: str, runs: int) -> None:
    conf = json.loads(conf_json)
    driver_mem = conf.pop("_driver_mem", None)
    if driver_mem:
        os.environ["SPARK_DRIVER_MEM"] = driver_mem
    import bench

    extra = {"spark.sql.session.timeZone": "UTC",
             "spark.sql.adaptive.enabled": "false", **conf}
    from logsight_filebeat_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf=extra,
    )
    jmx = spark._jvm.java.lang.management.ManagementFactory

    def gc_ms() -> int:
        return sum(
            b.getCollectionTime() for b in jmx.getGarbageCollectorMXBeans()
        )

    # getProcessCpuTime is a com.sun.management method py4j's reflection
    # cannot reach through the public interface; /proc utime+stime of the
    # JVM pid covers every executor thread (local mode: one JVM)
    jvm_pid = spark._jvm.java.lang.ProcessHandle.current().pid()
    tick = os.sysconf("SC_CLK_TCK")

    def cpu_s() -> float:
        with open(f"/proc/{jvm_pid}/stat") as f:
            parts = f.read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / tick

    df = bench._pipeline_df(spark, pages_path)
    bench._noop(df)  # warm-up
    out = []
    for _ in range(runs):
        g0, c0, t0 = gc_ms(), cpu_s(), time.time()
        bench._noop(df)
        out.append(
            {
                "wall": round(time.time() - t0, 3),
                "gc_ms": gc_ms() - g0,
                "cpu_s": round(cpu_s() - c0, 2),
            }
        )
    spark.stop()
    print(json.dumps(out))


def _run(pages_path: str, cores: int, variant: str, runs: int = 3) -> dict:
    cmd = [
        sys.executable, os.path.abspath(__file__), "--child",
        pages_path, str(cores), json.dumps(VARIANTS[variant]), str(runs),
    ]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "12g")
    p = subprocess.run(cmd, capture_output=True, text=True, env=env)
    if p.returncode != 0:
        return {"variant": variant, "cores": cores,
                "error": "\n".join(p.stderr.splitlines()[-3:])}
    samples = json.loads(p.stdout.strip().splitlines()[-1])
    best = min(samples, key=lambda s: s["wall"])
    return {
        "variant": variant,
        "cores": cores,
        "best_wall": best["wall"],
        "gc_share": round(best["gc_ms"] / 1000 / best["wall"], 3),
        "cpu_per_wall": round(best["cpu_s"] / best["wall"], 1),
        "samples": samples,
    }


def main() -> None:
    import bench
    from bench import _session

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    tmp = tempfile.mkdtemp(prefix="profile_pages_")
    pages_path = os.path.join(tmp, "pages.parquet")
    try:
        spark = _session(32)
        facts = bench._materialize_pages(spark, n_pages, pages_path)
        spark.stop()
        print(f"[profile] {n_pages} pages, {facts['events']} events",
              file=sys.stderr)
        results = []
        for variant in VARIANTS:
            r = _run(pages_path, 32, variant)
            results.append(r)
            print(json.dumps(r))
            print(f"[profile] 32-core {variant}: {r}", file=sys.stderr)
        # the winner also runs at 8 cores for the pair efficiency
        ok = [r for r in results if "best_wall" in r]
        if ok:
            win = min(ok, key=lambda r: r["best_wall"])
            r8 = _run(pages_path, 8, win["variant"])
            print(json.dumps(r8))
            if "best_wall" in r8:
                eff = (r8["best_wall"] / win["best_wall"]) / 4
                print(
                    f"[profile] winner {win['variant']}: 8->32 raw "
                    f"efficiency {eff:.3f}",
                    file=sys.stderr,
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], int(sys.argv[3]), sys.argv[4], int(sys.argv[5]))
    else:
        main()
