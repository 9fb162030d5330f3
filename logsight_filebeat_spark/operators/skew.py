"""Skew handling — salted aggregation for hot keys (SURVEY §4.1).

The north rule calls out skew from hot domains: a handful of hosts take most
of the rows (the synthetic pages table gives host0 ~50%), so a plain
``groupBy(host)`` concentrates those rows in single shuffle partitions.
AQE's skew-join splitting covers JOINS; for AGGREGATIONS over hot keys the
standard remedy is salting: shard each key into S sub-keys, partially
aggregate per (key, salt) — so the hot key's rows spread over S tasks — then
merge the partials per key. Results are bit-identical to the unsalted
aggregate for decomposable aggregates (count/sum/min/max; avg as sum+count),
which is exactly the invariant SURVEY §7 requires ("salting must not break
per-sink aggregate counts") and the DuckDB oracle checks.

Note Spark's hash aggregate already does map-side partial aggregation, which
handles *aggregation* skew for low-cardinality keys; explicit salting is the
tool when per-key state is too big for one reducer (count-distinct-ish
payloads, collect-style aggregates, or key cardinality high enough that one
hot key still lands on one reducer). The operator exists so pipelines can
opt in per aggregate; it composes from stock groupBy — no custom shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial aggregate over (keys, salt), merge of partials over keys)
_DECOMPOSABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str | None]],
    salt_buckets: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: (out_name, kind, col) with kind ∈ count|sum|min|max (col is
    ignored for count). ``salt_on``: column/expression whose hash spreads a
    key's rows across buckets (default: a per-row spread via monotonically
    varying hash of all key cols + a row-local component is NOT possible
    purely deterministically, so default salts on the full row hash of the
    non-key payload columns — deterministic and partition-independent).

    Returns one row per key combination, identical to
    ``df.groupBy(keys).agg(...)``.
    """
    for _, kind, _ in aggs:
        if kind not in _DECOMPOSABLE:
            raise ValueError(
                f"aggregate kind {kind!r} is not decomposable; "
                f"supported: {sorted(_DECOMPOSABLE)}"
            )
    if salt_on is None:
        payload = [c for c in df.columns if c not in keys]
        salt_src = F.xxhash64(*[F.col(c) for c in payload]) if payload else F.lit(0)
    else:
        salt_src = F.xxhash64(F.col(salt_on) if isinstance(salt_on, str) else salt_on)
    salted = df.withColumn("_salt", F.pmod(salt_src, F.lit(salt_buckets)))

    partials = [
        _DECOMPOSABLE[kind][0](col if col is not None else "_salt").alias(f"_p_{name}")
        for name, kind, col in aggs
    ]
    merged = [
        _DECOMPOSABLE[kind][1](f"_p_{name}").alias(name) for name, kind, _ in aggs
    ]
    partial = salted.groupBy(*keys, "_salt").agg(*partials)
    return partial.groupBy(*keys).agg(*merged)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_col: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join by salting — the explicit remedy when AQE's
    runtime skew split isn't available (disabled, non-shuffle stage
    boundaries) and the dimension is too big to broadcast: the big side's
    rows shard into ``n_salt`` sub-keys via the deterministic hash of
    ``salt_col`` (any per-row identity column), the small side REPLICATES
    across all sub-keys, and the join key becomes (key, salt) — the hot
    key's rows spread over ``n_salt`` tasks instead of one.

    Row-for-row identical to the plain join (every big row still meets
    every matching small row exactly once, inside its salt bucket) at the
    cost of an n_salt× blow-up of the SMALL side only. Deterministic salt
    ⇒ identical physical placement on rerun.

    ``how`` is restricted to join types where unmatched SMALL-side rows
    are never emitted (inner / left / left_semi / left_anti / cross): the
    small side is replicated across all n_salt buckets, so a right/full
    outer join would emit each unmatched small row n_salt times — once
    per salt bucket — instead of once. For an outer join on the small
    side, use a plain join (the small side has no skew to fix)."""
    from logsight_filebeat_spark.functions.hashing import seeded_hash32

    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join how={how!r} would duplicate unmatched small-side "
            f"rows n_salt times (small side is replicated per salt bucket); "
            f"allowed: inner, left, left_semi, left_anti, cross"
        )

    b = big.withColumn(
        "_salt",
        (seeded_hash32(F.col(salt_col).cast("string"), "join-salt") % n_salt).cast(
            "int"
        ),
    )
    s = small.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>")
        ),
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")
