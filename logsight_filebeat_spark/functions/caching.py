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


def iteration_barrier(df: DataFrame) -> DataFrame:
    """Materialize ``df`` NOW and truncate its logical plan — the per-round
    barrier for iterative fixpoints whose round body references the
    previous state more than once.

    ``persist()`` alone is not enough for those loops: caching reuses the
    *physical* result but the *analyzed logical plan* still nests the full
    upstream lineage, so a round body with r references to the previous
    state grows the plan r× per round — r^n_iter after n rounds. Analysis,
    cache-key normalization, and even ``TreeNode.toString`` (which the
    cache manager runs to name the entry) then dominate or OOM the driver
    long before any data moves (observed: k-core's 3-reference round body
    OOMs the driver's plan stringification at round 3 on a 30 k-edge
    graph). ``localCheckpoint(eager=True)`` cuts the plan to a leaf
    ``LogicalRDD`` — O(1) plan size per round at any round count — and
    doubles as the materialization barrier that makes it safe to release
    the superseded round immediately.

    Local checkpoints store the round's blocks on executors without the
    fault-tolerance of reliable checkpoints; at 100 TB on a real cluster,
    set ``spark.sparkContext.setCheckpointDir(...)`` and flip
    ``reliable=True`` to trade one HDFS write per round for lost-executor
    recovery (the standard GraphX/GraphFrames iteration discipline).
    The handle joins the same release registry as :func:`track_persist`;
    checkpointed blocks are not CacheManager entries, so ``unpersist()``
    is a no-op for them — dropping the registry reference at
    ``release_persisted`` instead hands the RDD to Spark's
    ContextCleaner, which unpins the blocks on GC."""
    out = df.localCheckpoint(eager=True)
    _PERSISTED.append(out)
    return out


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
