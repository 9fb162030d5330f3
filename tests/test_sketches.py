from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from logsight_filebeat_spark.operators.sampling import per_key_cap
from logsight_filebeat_spark.operators.sketches import (
    KMV_SPACE,
    kmv_estimate,
    kmv_hashes,
    kmv_merge,
)


def _h40(v: str, seed: str = "kmv:v1") -> int:
    return int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:10], 16)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(f"v{i % 7}",) for i in range(100)], "x string")
    row = kmv_estimate(kmv_hashes(df, "x", k=16), k=16).first()
    assert row.n_seen == 7
    assert row.est_distinct == 7  # exhaustive regime: exact


def test_kmv_matches_python_sketch_and_estimates_within_error(spark):
    n = 5000
    df = spark.createDataFrame([(f"tok-{i}",) for i in range(n)], "x string")
    k = 128
    hs = sorted(_h40(f"tok-{i}") for i in range(n))[:k]
    got = [r.h for r in kmv_hashes(df, "x", k=k).collect()]
    assert got == hs  # sketch itself is bit-identical to the python model
    row = kmv_estimate(kmv_hashes(df, "x", k=k), k=k).first()
    assert row.kth_hash == hs[-1]
    assert row.est_distinct == (k - 1) * KMV_SPACE // hs[-1]
    assert abs(row.est_distinct - n) / n < 0.25  # ~1/sqrt(128) regime


def test_kmv_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "x string")
    b = spark.createDataFrame([(f"a{i}",) for i in range(150, 450)], "x string")
    k = 64
    merged = sorted(
        r.h for r in kmv_merge(kmv_hashes(a, "x", k=k), kmv_hashes(b, "x", k=k), k=k).collect()
    )
    direct = sorted(r.h for r in kmv_hashes(a.unionByName(b), "x", k=k).collect())
    assert merged == direct


def test_per_key_cap_two_phase_identical_to_single_phase(spark):
    rows = [(f"id{i}", f"k{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, key string")
    plain = {
        (r.doc_id, r.pos)
        for r in per_key_cap(df, "key", 20, "doc_id").collect()
    }
    salted = {
        (r.doc_id, r.pos)
        for r in per_key_cap(df, "key", 20, "doc_id", n_salt=5).collect()
    }
    assert plain == salted
    assert len(plain) == 60  # 20 per key × 3 keys


def test_per_key_cap_keeps_small_keys_whole_and_is_stable(spark):
    rows = [("a1", "small"), ("a2", "small")] + [
        (f"b{i}", "big") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id string, key string")
    kept = per_key_cap(df, "key", 10, "doc_id", n_salt=4)
    by_key = {
        k: v
        for k, v in kept.groupBy("key").count().rdd.map(lambda r: (r[0], r[1])).collect()
    }
    assert by_key == {"small": 2, "big": 10}
    # deterministic under repartitioning
    k1 = {r.doc_id for r in kept.collect()}
    k2 = {
        r.doc_id
        for r in per_key_cap(df.repartition(7), "key", 10, "doc_id", n_salt=4).collect()
    }
    assert k1 == k2
    # pos is 1..cap dense per key
    poss = sorted(
        r.pos for r in kept.filter(F.col("key") == "big").collect()
    )
    assert poss == list(range(1, 11))
