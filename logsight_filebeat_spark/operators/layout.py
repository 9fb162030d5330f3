"""Data layout for scan locality — Z-order (Morton) clustering.

At 100 TB the scan is the query: parquet row-group min/max stats prune
reads, but only if rows with similar key values sit in the same files.
Sorting clusters ONE column perfectly and the second not at all; the
Z-order interleave gives BOTH dimensions locality at once, so predicates
on either column (host AND time, language AND length) skip most of the
corpus. This is the same layout trick Delta/Iceberg expose as
``OPTIMIZE ... ZORDER BY``, built here from pure integer Column
expressions so the key — and therefore the layout decision — is
engine-portable and oracle-checkable.

Scale shapes:
* ``zorder_key`` is a compile-time-unrolled bit interleave: ~4 integer ops
  per bit, whole-stage-codegen'd in the scan projection. No UDF, no join.
* ``cluster_by_zorder`` is ONE range shuffle (repartitionByRange samples
  the key distribution, so output files are balanced even when the key
  space is skewed) + an in-partition sort. That is the exact cost of a
  plain global sort — you pay nothing extra for the second dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(a: Column | str, b: Column | str, bits: int = 12) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative int
    columns: bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Inputs are masked to ``bits`` bits (callers quantize/clamp first —
    see ``quantize_dim``); the result fits a bigint for bits ≤ 31.

    Pure integer arithmetic ⇒ identical in Spark and DuckDB; the mirror
    SQL comes from ``zorder_duck_sql``."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    ca = (F.col(a) if isinstance(a, str) else a).cast("bigint")
    cb = (F.col(b) if isinstance(b, str) else b).cast("bigint")
    mask = (1 << bits) - 1
    ca, cb = ca.bitwiseAND(F.lit(mask)), cb.bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def zorder_duck_sql(a_expr: str, b_expr: str, bits: int = 12) -> str:
    """DuckDB SQL fragment computing the identical Morton key from two
    integer SQL expressions — used by oracle builders."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(2):  # 0: a at even positions, 1: b at odd
        expr = f"(({a_expr if i == 0 else b_expr})::bigint & {mask})"
        terms += [
            f"((({expr} >> {j}) & 1) << {2 * j + i})" for j in range(bits)
        ]
    return "(" + " | ".join(terms) + ")"


def quantize_dim(col: Column | str, lo: int, hi: int, bits: int = 12) -> Column:
    """Clamp an integer column to [lo, hi] and rescale onto the ``bits``-bit
    grid — the dimension-prep step before interleaving (a raw 64-bit value
    would put all its variance in bits the interleave masks away)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("bigint")
    span = max(hi - lo, 1)
    cells = (1 << bits) - 1
    clamped = F.greatest(F.least(c, F.lit(hi)), F.lit(lo)) - F.lit(lo)
    # products stay ≤ (hi-lo)·2^bits ≪ 2^53, so the double division is
    # exact and floor() matches DuckDB's integer // to the last bit
    return F.floor(clamped * cells / F.lit(span)).cast("bigint")


def quantize_duck_sql(expr: str, lo: int, hi: int, bits: int = 12) -> str:
    """DuckDB mirror of ``quantize_dim`` (integer floor division)."""
    span = max(hi - lo, 1)
    cells = (1 << bits) - 1
    return (
        f"((greatest(least(({expr})::bigint, {hi}), {lo}) - {lo})"
        f" * {cells} // {span})"
    )


def cluster_by_zorder(
    df: DataFrame, key: Column, n_files: int = 200
) -> DataFrame:
    """Physically cluster rows by a Z-order key: ONE range shuffle
    (distribution-sampled → balanced output files under key skew) + an
    in-partition sort. Write the result with any sink; parquet min/max
    stats on BOTH interleaved dimensions then prune reads.

    ``n_files`` sizes output partitions — pick corpus_bytes/target_file_size
    at scale (the usual 0.5–1 GB parquet target)."""
    keyed = df.withColumn("_zkey", key)
    return (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-BUCKETED (and optionally bucket-sorted)
    managed parquet table: every row lands in bucket
    ``hash(key) mod n_buckets``, recorded in table metadata. This is the
    pay-once layout move for 100-TB fact tables that are joined or
    aggregated on the same key every day: the shuffle happens at WRITE
    time, once, and every subsequent join/agg on ``key`` between
    same-bucketed tables needs NO exchange at all (see
    :func:`bucketed_join`). Iceberg/Delta expose the identical idea as a
    ``bucket(n, key)`` partition transform / clustered write.

    ``n_buckets`` sizes the parallelism floor of every downstream
    bucket-local join — pick ~corpus_bytes / 1 GB at scale, and keep it
    IDENTICAL across the tables that join (Spark only elides the
    exchange when bucket counts match; a 2:1 ratio falls back to
    shuffling the smaller side)."""
    # Idempotence across SESSIONS, not just within one: the default
    # catalog is in-memory, so a previous process's managed-table files
    # survive in the warehouse dir while the catalog entry does not —
    # saveAsTable then fails with LOCATION_ALREADY_EXISTS even under
    # mode="overwrite" (observed: a stale spark-warehouse/ from an earlier
    # bench run killed the next one at warmup). Drop the catalog entry AND
    # clear the orphaned location through the Hadoop FS API (works on
    # HDFS/object stores too, where a driver-side shutil cannot).
    spark = df.sparkSession
    if mode == "overwrite":
        # The pre-clean is part of OVERWRITE semantics only — append/
        # ignore/error modes must never drop the table or touch its files.
        # Resolve the real location from the catalog entry when one
        # exists (db-qualified tables live at warehouse/<db>.db/<tbl>,
        # and external tables live wherever LOCATION says — a
        # hand-concatenated warehouse/<name> would miss both); fall back
        # to the default managed location only for the orphaned-files
        # case where the catalog has no entry at all.
        location = None
        if spark.catalog.tableExists(table):
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
                if r.col_name.strip() == "Location":
                    location = r.data_type.strip()
                    break
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if location is None:
            warehouse = spark.conf.get("spark.sql.warehouse.dir")
            parts = table.lower().split(".")
            rel = "/".join([f"{p}.db" for p in parts[:-1]] + [parts[-1]])
            location = f"{warehouse.rstrip('/')}/{rel}"
        jvm = spark._jvm
        jsc = spark._jsc
        path = jvm.org.apache.hadoop.fs.Path(location)
        fs = path.getFileSystem(jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Co-located join of two tables bucketed on the join key with equal
    bucket counts: each task sort-merges bucket i of the left against
    bucket i of the right, straight off the scan — ZERO Exchange in the
    plan (pinned by tests/test_plans_explain.py). At 10^12 rows this
    turns the daily fact-to-fact join from the cluster's biggest shuffle
    into an embarrassingly parallel per-bucket merge.

    The MERGE hint keeps the planner honest: without it a small-enough
    side would broadcast — also shuffle-free, but that plan stops
    working the day the side outgrows the driver, while the bucketed
    merge is size-oblivious. Bucket-SORTED tables (``sort_cols`` at
    write) additionally drop the per-task Sort when each bucket holds
    one file."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("MERGE").join(right, on, how)


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    file_col: str = "file",
    bytes_col: str = "bytes",
    partition_col: str | None = None,
    small_only: bool = True,
) -> DataFrame:
    """Small-files compaction planning — the Iceberg/Delta maintenance
    stage (``rewrite_data_files``-style bin packing) over a table's file
    listing: assign files to rewrite groups of ~``target_bytes`` each.
    Returns (partition?, grp, grp_bytes, n_files, files — a '|'-joined
    name-sorted list, engine-portable); singleton
    groups (one file that is already ≥ target, or a lone leftover small
    file) need no rewrite and callers skip them via n_files = 1.

    Grouping rule — deterministic and ORDER-BASED: files sort by name
    within a partition and ``grp = floor(preceding_bytes / target)`` —
    the cumulative byte axis is cut into target-sized bands and a file
    joins the band its start offset falls in. Each group's byte span is
    therefore < target + its largest member (< 2×target for small
    files); a first-fit-decreasing packer would pack marginally tighter,
    but it shuffles unrelated key ranges into one file — name order
    (usually write order) keeps rewritten row groups contiguous,
    preserving the sort/Z-order clustering the layout stage paid a range
    shuffle for.

    Scale shape: the file LISTING is metadata (rows = files, ~10^6 at
    100 TB), so one partitioned window over it costs nothing next to the
    rewrites it plans; the greedy close-at-target rule is a pure
    running-sum expression — engine-portable, oracle = the same window in
    SQL. ``small_only`` pre-drops files already ≥ target (they are their
    own group and rewriting them buys nothing).
    """
    from pyspark.sql import Window

    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    part = [partition_col] if partition_col else []
    df = files
    if small_only:
        df = df.filter(F.col(bytes_col) < target_bytes)
    w = (
        Window.partitionBy(*part)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # group index = how many targets the PRECEDING bytes already filled —
    # a file joins the group its predecessors left open; once the running
    # sum crosses target_bytes the next file starts a new group
    prev_sum = F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
    grp = F.floor(prev_sum / F.lit(target_bytes)).cast("bigint")
    planned = df.select(
        *part,
        F.col(file_col).alias("file"),
        F.col(bytes_col).cast("bigint").alias("bytes"),
        grp.alias("grp"),
    )
    return (
        planned.groupBy(*part, "grp")
        .agg(
            F.sum("bytes").alias("grp_bytes"),
            F.count(F.lit(1)).alias("n_files"),
            F.array_join(F.sort_array(F.collect_list("file")), "|").alias(
                "files"
            ),
        )
        .select(*part, "grp", "grp_bytes", "n_files", "files")
    )


def snapshot_expiry_plan(
    snapshots: DataFrame,
    retain_last: int = 5,
    daily_days: int = 7,
    id_col: str = "snapshot_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Snapshot retention planning — the Iceberg ``expire_snapshots``
    maintenance stage as a deterministic plan: every snapshot is labeled
    ``kept_last`` (one of the newest ``retain_last``), ``kept_daily``
    (the newest snapshot of its calendar day, for days within
    ``daily_days`` days of the newest snapshot), or ``expire``.
    Precedence kept_last > kept_daily > expire; ties break by id
    descending, so the plan is total-order deterministic.

    Scale shape: the snapshot LIST is metadata (one row per table
    snapshot — thousands at most, like the file listing in
    :func:`compaction_plan`), so the two unpartitioned windows here run
    over a bounded control-plane table, never data — the documented
    exception to the no-unpartitioned-window rule. The newest-ts anchor
    rides a broadcast 1-row aggregate."""
    from pyspark.sql import Window

    if retain_last < 0 or daily_days < 0:
        raise ValueError("retain_last and daily_days must be >= 0")
    w_all = Window.orderBy(F.col(ts_col).desc(), F.col(id_col).desc())
    w_day = Window.partitionBy(F.to_date(ts_col)).orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    anchor = snapshots.agg(F.max(ts_col).alias("_max_ts"))
    ranked = (
        snapshots.crossJoin(F.broadcast(anchor))
        .withColumn("_rk", F.row_number().over(w_all))
        .withColumn("_dk", F.row_number().over(w_day))
        .withColumn(
            "_recent_day",
            F.datediff(F.to_date("_max_ts"), F.to_date(ts_col))
            < F.lit(daily_days),
        )
    )
    reason = (
        F.when(F.col("_rk") <= retain_last, F.lit("kept_last"))
        .when(
            (F.col("_dk") == 1) & F.col("_recent_day"), F.lit("kept_daily")
        )
        .otherwise(F.lit("expire"))
    )
    return ranked.select(
        F.col(id_col).cast("bigint").alias("snapshot_id"),
        F.col(ts_col).alias("ts"),
        reason.alias("reason"),
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    part_col: str,
    mode: str = "overwrite",
) -> None:
    """Write a fact table hive-partitioned on ``part_col`` (one directory
    per value — the warc_ts day/hour layout every crawl store uses).
    Partitioning is the other half of the layout story next to
    :func:`write_bucketed`: bucketing kills the JOIN shuffle, partition
    directories kill the SCAN. A static predicate on ``part_col`` prunes
    at plan time; and — the part that needs no code at all — a JOIN
    against a filtered dimension prunes at RUNTIME via dynamic partition
    pruning: Spark broadcasts the dim, collects its distinct partition
    keys, and the fact scan reads only matching directories
    (``dynamicpruningexpression`` in the scan's PartitionFilters —
    plan-pinned in tests/test_plans_explain.py). At 10^12 rows ÷ ~10^3
    daily partitions, a 5-day dim join reads 0.5% of the corpus instead
    of 100%.

    Keep partition cardinality bounded (days/hours/langs, never urls):
    10^5+ directories drown the driver in file listing — that's what
    bucketing is for."""
    df.write.mode(mode).partitionBy(part_col).parquet(path)
