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

from pyspark.sql import Column, DataFrame
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
