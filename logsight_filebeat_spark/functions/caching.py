"""Tracked persist handles for self-join intermediates.

Several operators (jaccard_pairs, minhash_lsh_pairs, simhash_pairs,
srp_candidate_pairs, embedding_near_dups_lsh) must persist a projection that
feeds both sides of a self-join — recomputing the shingle/signature/bucket
projection per join side dominates everything else. A bare ``.persist()``
leaks: the returned DataFrame is lazy, so the operator cannot unpersist
before the caller's action, and cached blocks accumulate across queries in a
long-lived session or streaming loop.

The registry closes that: operators register the handle via
``track_persist``; callers release after the consuming action:

    pairs = simhash_pairs(docs)
    pairs.write...            # the action that needed the cache
    release_persisted()       # drop every block the operator pinned

``release_persisted`` is idempotent and safe to call between queries even if
nothing is tracked (bench.py and the test suite call it per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PERSISTED: list[DataFrame] = []


def track_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register the handle for later release."""
    df = df.persist(level)
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked handle; returns how many were released.
    Best-effort per handle: one dead session's handle (unpersist raises
    after spark.stop()) must not strand the remaining entries pinned."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # owning session already stopped — nothing left to unpin
    return n
