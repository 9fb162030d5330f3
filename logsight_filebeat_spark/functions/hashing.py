"""Portable deterministic hashing — identical values in Spark and DuckDB.

Everything is built on md5 hex (identical across engines, unlike
xxhash64/murmur which are engine-specific), truncated to 32 bits via
``conv(substr(md5, 1, 8), 16, 10)``. This keeps every hash-based operator
(minhash, simhash, LSH buckets, fingerprints) oracle-checkable: the DuckDB
equivalent is ``('0x' || substr(md5(x), 1, 8))::bigint``.

Scale note: md5 is ~3× slower than xxhash64 but still JVM-side, codegen'd,
and amply fast relative to the shuffle these operators feed; swap
``portable_hash32`` for ``F.xxhash64`` in production if cross-engine
verifiability is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column) -> Column:
    """Lowercase md5 hex of the utf-8 bytes of a string column."""
    return F.md5(F.encode(col, "UTF-8"))


def portable_hash32(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative bigint — engine-portable."""
    return F.conv(F.substring(md5_hex(col), 1, 8), 16, 10).cast("bigint")


def seeded_hash32(col: Column, seed: int | str) -> Column:
    """Independent hash family member: hash of ``seed + ':' + value``."""
    return portable_hash32(F.concat(F.lit(f"{seed}:"), col))


# DuckDB SQL fragments mirroring the above (used by oracle_sql builders)
DUCK_MD5 = "md5({x})"
DUCK_HASH32 = "(('0x' || substr(md5({x}), 1, 8))::bigint)"
DUCK_SEEDED32 = "(('0x' || substr(md5('{seed}:' || {x}), 1, 8))::bigint)"
