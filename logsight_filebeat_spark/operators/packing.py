"""Sequence packing — global prefix sums without a global sort.

Training pipelines lay tokenized documents head-to-tail into fixed-size
training sequences ("packing") and need each doc's global token offset.
The naive Spark form — ``sum().over(Window.orderBy(id))`` with no
partitionBy — funnels the whole table through ONE task (the exact
anti-pattern flagged for ivf_codebook in round 2). This module is the
classic two-phase distributed scan instead:

  1. bucket each row by id range (``bucket = id // bucket_size`` — a pure
     Column, deterministic, order-preserving);
  2. one hash aggregate → per-bucket totals; a window over THAT tiny table
     (n_buckets rows) produces each bucket's starting offset;
  3. broadcast-join offsets back and run the in-bucket running sum with a
     window PARTITIONED by bucket (bounded by bucket_size rows per task).

Pick ``bucket_size`` so n_buckets stays driver-tiny (e.g. 1e6 rows/bucket →
thousands of buckets for billions of rows); for truly astronomical tables
apply the same construction recursively to the bucket table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_prefix_sum(
    df: DataFrame,
    id_col: str = "doc_id",
    val_col: str = "n_tokens",
    bucket_size: int = 1_000_000,
    out: str = "offset",
) -> DataFrame:
    """Adds ``out`` = EXCLUSIVE prefix sum of ``val_col`` in ``id_col``
    order (each row's global starting offset), via the two-phase scan —
    no unpartitioned window over the data table. Ids must be non-negative
    (integer ``div``; double division + bigint cast would lose exactness
    past 2^53 and fold negative ids into double-width buckets)."""
    bucket = F.expr(f"CAST(`{id_col}` DIV {bucket_size} AS BIGINT)").alias(
        "_bucket"
    )
    d = df.withColumn("_bucket", bucket)
    totals = d.groupBy("_bucket").agg(F.sum(val_col).alias("_bucket_total"))
    # window over the BUCKET table only — n_buckets rows, not the data
    w_b = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_bucket_total").over(w_b), F.lit(0)).alias(
            "_bucket_offset"
        ),
    )
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offsets), ["_bucket"])
        .withColumn(
            out,
            F.col("_bucket_offset")
            + F.coalesce(F.sum(val_col).over(w_in), F.lit(0)),
        )
        .drop("_bucket", "_bucket_offset")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    bucket_size: int = 1_000_000,
) -> DataFrame:
    """Assigns each doc to a training pack: pack_id = global-token-offset //
    budget (contiguous fill in id order — a doc straddling a boundary
    belongs to the pack where its first token lands). Deterministic,
    rerun-stable, and engine-portable (one integer division over the
    non-negative prefix sum)."""
    return with_prefix_sum(
        df, id_col, token_col, bucket_size, out="offset"
    ).withColumn("pack_id", F.expr(f"CAST(offset DIV {budget} AS BIGINT)"))
