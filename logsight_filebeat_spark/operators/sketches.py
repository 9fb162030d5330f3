"""Deterministic distributed sketches for corpus statistics.

At 100 TB you cannot afford exact DISTINCT over high-cardinality columns
(vocabulary, urls, shingles) just to report a dataset-card number — the
full shuffle dwarfs the answer's value. Spark's builtin
``approx_count_distinct`` (HyperLogLog++) answers this but is not
cross-engine reproducible (engine-private hash + float register math), so
it can't be oracle-verified and two runs on different engines disagree.

KMV (k-minimum-values, Bar-Yossef et al. 2002) with a portable hash is the
deterministic alternative: keep the k smallest DISTINCT hash values of the
column; if the k-th smallest is ``kth`` over a hash space of size ``SPACE``,
the cardinality estimate is ``(k-1) * SPACE div kth``. Every step is
integer arithmetic over md5-derived hashes — identical in Spark and DuckDB,
identical at any parallelism, floors included.

Scale shapes:
* ``kmv_hashes``: hash in the scan projection → DISTINCT (one shuffle on
  the 8-byte hash only — never the value bytes) → ``orderBy().limit(k)``
  (TakeOrderedAndProject: per-partition top-k, tiny driver merge).
* Sketches MERGE: union two sketches' hash sets, distinct, keep k smallest
  — the union sketch equals the sketch of the union (min-wise property),
  so per-partition / per-day sketches roll up without touching raw data.
* 40-bit hash space (``SPACE`` = 2^40) keeps ``(k-1)*SPACE`` inside BIGINT
  for k ≤ ~8M and hash-collision bias negligible below ~10^9 distinct
  values; production at larger cardinalities widens to the 60-bit variant
  with DECIMAL(38) intermediates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KMV_SPACE = 1 << 40  # 40-bit hash space (see module docstring)


def kmv_hash(col: Column | str, seed: str = "kmv:v1") -> Column:
    """Portable 40-bit hash: first 10 md5-hex digits as a bigint.
    DuckDB mirror: ``('0x' || substr(md5('<seed>:' || x), 1, 10))::bigint``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.encode(F.concat(F.lit(seed + ":"), c), "UTF-8")), 1, 10),
        16,
        10,
    ).cast("bigint")


def kmv_hashes(
    df: DataFrame, col: Column | str, k: int = 256, seed: str = "kmv:v1"
) -> DataFrame:
    """The sketch itself: k smallest distinct hashes, one column ``h``."""
    return (
        df.select(kmv_hash(col, seed).alias("h")).distinct().orderBy("h").limit(k)
    )


def kmv_merge(*sketches: DataFrame, k: int = 256) -> DataFrame:
    """Union sketches into the sketch of the combined input (min-wise
    hashes: the k smallest of the union of per-part k-smallest sets are
    exactly the k smallest of the full union)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """1-row summary: (n_seen, kth_hash, est_distinct). Below k distinct
    values the sketch is exhaustive and the estimate exact; at and beyond
    k it is the integral KMV estimator (±~1/sqrt(k) relative error)."""
    return sketch.agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth_hash")
    ).select(
        "n_seen",
        "kth_hash",
        F.when(F.col("n_seen") < k, F.col("n_seen"))
        .otherwise(F.expr(f"{(k - 1) * KMV_SPACE}L div kth_hash"))
        .cast("long")
        .alias("est_distinct"),
    )
