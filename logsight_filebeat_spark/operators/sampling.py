"""Deterministic hash-based sampling — reproducible corpus splits.

Training pipelines need samples that are STABLE under re-execution,
repartitioning, and incremental reruns; Spark's `sample`/`sampleBy` draw
from per-partition RNG streams, so adding one input file reshuffles every
row's fate. Hash sampling decides each row from its own id alone:
row ∈ sample ⇔ h(seed:id) mod D < fraction·D. Same id ⇒ same decision,
on any cluster, any partitioning, any engine (the hash is the portable
md5-based family of functions/hashing.py, so DuckDB re-derives membership
bit-for-bit).

All pure Column filters inside the scan stage: zero shuffle, pushdown-
friendly, and composable (disjoint fractions of the same keyspace give
disjoint splits — the train/val/test construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logsight_filebeat_spark.functions.hashing import seeded_hash32

# hash bucket denominator: fractions resolve to an integer threshold out of
# this many buckets (1e6 ⇒ fraction granularity 1e-6, exact in both engines)
SAMPLE_BUCKETS = 1_000_000


def sample_bucket(id_col: Column | str, seed: int | str = 0) -> Column:
    """Stable per-row bucket in [0, SAMPLE_BUCKETS): the row's whole
    sampling fate. Derive every split from ONE bucket column so splits with
    disjoint ranges are disjoint by construction."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return seeded_hash32(c.cast("string"), seed) % SAMPLE_BUCKETS


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    fraction: float = 0.1,
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic ``fraction`` sample: rows whose bucket falls under
    fraction·SAMPLE_BUCKETS. Exactly reproducible anywhere."""
    thresh = int(fraction * SAMPLE_BUCKETS)
    return df.filter(sample_bucket(id_col, seed) < thresh)


def train_val_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_fraction: float = 0.1,
    seed: int | str = 0,
) -> tuple[DataFrame, DataFrame]:
    """(train, val) from one bucket draw: val = bucket < t, train = rest —
    disjoint and exhaustive by construction, stable under reruns."""
    thresh = int(val_fraction * SAMPLE_BUCKETS)
    b = sample_bucket(id_col, seed)
    return df.filter(b >= thresh), df.filter(b < thresh)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int | str = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mixture operator
    (e.g. keep 100% of books, 10% of web). One bucket compare against a
    stratum-dependent threshold; strata missing from ``fractions`` fall
    back to ``default_fraction``."""
    thresh = F.lit(int(default_fraction * SAMPLE_BUCKETS))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(frac * SAMPLE_BUCKETS))
        ).otherwise(thresh)
    return df.filter(sample_bucket(id_col, seed) < thresh)


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-stratum keep-thresholds for temperature resampling: sampling
    each stratum at rate (n_min / n_stratum)^(1-alpha) flattens the
    mixture toward p^alpha (the exponentiated-smoothing rebalance
    multilingual training uses — alpha=1 keeps the natural mixture,
    alpha=0 equalizes strata). The smallest stratum keeps 100% and larger
    ones downsample toward it; rates quantize to an integer bucket
    threshold out of SAMPLE_BUCKETS so membership is exact.

    Returns (strata_col, n, thresh). alpha=0.5 computes the rate via
    sqrt, which IEEE-754 rounds correctly in every engine — the
    bit-reproducible choice; other alphas go through pow (≤1 ulp, then
    the round-to-6 quantization absorbs it).

    Scale shape: one hash aggregate over the corpus (map-side partials,
    stratum cardinality is tiny), a broadcast of the 1-row min, and a
    tiny dim-table result for the caller to broadcast-join back."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
    n_min = counts.agg(F.min("n").alias("n_min"))
    ratio = F.col("n_min").cast("double") / F.col("n").cast("double")
    expo = 1.0 - alpha
    rate = F.sqrt(ratio) if expo == 0.5 else F.pow(ratio, F.lit(expo))
    return counts.crossJoin(F.broadcast(n_min)).select(
        strata_col,
        "n",
        F.floor(F.round(rate, 6) * SAMPLE_BUCKETS)
        .cast("bigint")
        .alias("thresh"),
    )


def temperature_resample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    seed: int | str = 0,
) -> DataFrame:
    """Temperature-resampled corpus: each row's fate is its deterministic
    hash bucket vs its stratum's threshold — stable under reruns and
    repartitioning like every sampler here, so the rebalanced mixture is
    reproducible anywhere. One aggregate for the rates, one broadcast
    equi-join back, a pure filter in the scan; the corpus shuffles zero
    times."""
    rates = temperature_rates(df, strata_col, alpha).select(
        strata_col, "thresh"
    )
    return df.join(F.broadcast(rates), strata_col).filter(
        sample_bucket(id_col, seed) < F.col("thresh")
    )
