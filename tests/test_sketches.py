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


def test_quantile_threshold_exact_definition(spark):
    """Threshold = smallest v with count(<= v) >= ceil(q*n), on a value
    multiset with ties; python recomputes the same definition."""
    import math

    from logsight_filebeat_spark.operators.sampling import quantile_threshold

    vals = [0.1, 0.1, 0.2, 0.5, 0.5, 0.5, 0.7, 0.9, 0.9, 1.0]
    df = spark.createDataFrame([(v,) for v in vals], "score double")
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 1.0):
        got = quantile_threshold(df, "score", q).collect()[0].threshold
        need = math.ceil(q * len(vals))
        exp = min(
            v for v in set(vals)
            if sum(1 for x in vals if x <= v) >= need
        )
        assert got == exp, (q, got, exp)


def test_quantile_gate_keep_top_with_ties(spark):
    from logsight_filebeat_spark.operators.sampling import quantile_gate

    rows = [(i, float(i)) for i in range(1, 101)]  # scores 1..100, no ties
    df = spark.createDataFrame(rows, "id bigint, score double")
    kept = sorted(r.id for r in quantile_gate(df, "score", 0.25).collect())
    assert kept == list(range(75, 101))  # 0.75-quantile=75 → 75..100 kept
    # ties at the boundary ARE kept (documented semantics): with 80 docs at
    # score 1.0 the 0.75-quantile lands inside the tie block, so the whole
    # block survives — keep_top is a LOWER bound on the kept fraction
    tied = spark.createDataFrame(
        [(i, 1.0 if i <= 80 else 2.0) for i in range(1, 101)],
        "id bigint, score double",
    )
    kept2 = {r.id for r in quantile_gate(tied, "score", 0.25).collect()}
    assert kept2 == set(range(1, 101))
    # a tie block strictly below the threshold is excluded
    tied_lo = spark.createDataFrame(
        [(i, 1.0 if i <= 40 else float(i)) for i in range(1, 101)],
        "id bigint, score double",
    )
    kept_lo = {r.id for r in quantile_gate(tied_lo, "score", 0.25).collect()}
    assert kept_lo == set(range(75, 101))
    # repartitioning never changes the keep set
    kept3 = sorted(
        r.id for r in quantile_gate(df.repartition(13), "score", 0.25).collect()
    )
    assert kept3 == kept


def test_quantile_threshold_rejects_bad_q(spark):
    import pytest as _pytest

    from logsight_filebeat_spark.operators.sampling import quantile_threshold

    df = spark.createDataFrame([(1.0,)], "score double")
    with _pytest.raises(ValueError):
        quantile_threshold(df, "score", 0.0)
    with _pytest.raises(ValueError):
        quantile_threshold(df, "score", 1.5)


# ---------------------------------------------------------------------------
# heavy_hitters
# ---------------------------------------------------------------------------


def _hh_exact(values, k):
    from collections import Counter

    items = sorted(Counter(values).items(), key=lambda kv: (-kv[1], kv[0]))
    return [(v, c, i + 1) for i, (v, c) in enumerate(items[:k])]


def test_heavy_hitters_exact_topk(spark):
    from logsight_filebeat_spark.operators.sketches import heavy_hitters

    values = [f"w{i % 37}" for i in range(3000)] + ["hot"] * 500
    df = spark.createDataFrame([(v,) for v in values], "value string")
    got = [
        (r.value, r.cnt, r.rank)
        for r in heavy_hitters(df, "value", k=10).orderBy("rank").collect()
    ]
    assert got == _hh_exact(values, 10)
    assert got[0][0] == "hot"


def test_heavy_hitters_partitioning_invariant(spark):
    from logsight_filebeat_spark.operators.sketches import heavy_hitters

    values = [f"t{i % 101}" for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in values], "value string")
    one = [
        (r.value, r.cnt, r.rank)
        for r in heavy_hitters(df.repartition(1), "value", k=7)
        .orderBy("rank")
        .collect()
    ]
    many = [
        (r.value, r.cnt, r.rank)
        for r in heavy_hitters(df.repartition(13), "value", k=7)
        .orderBy("rank")
        .collect()
    ]
    assert one == many == _hh_exact(values, 7)


def test_heavy_hitters_undersized_budget_truncates_never_lies(spark):
    from logsight_filebeat_spark.operators.sketches import heavy_hitters

    # budget far below the distinct count: the emitted rows must be a
    # correct PREFIX of the true ranking (possibly shorter than k),
    # never wrong values or wrong ranks.
    values = [f"v{i % 211}" for i in range(4000)] + ["big"] * 300
    df = spark.createDataFrame([(v,) for v in values], "value string")
    exact = _hh_exact(values, 10)
    got = [
        (r.value, r.cnt, r.rank)
        for r in heavy_hitters(df.repartition(8), "value", k=10, budget=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == exact[: len(got)]
    assert got and got[0][0] == "big"  # the true heavy hitter survives


# ---------------------------------------------------------------------------
# z-order layout
# ---------------------------------------------------------------------------


def _morton(a: int, b: int, bits: int = 12) -> int:
    a &= (1 << bits) - 1
    b &= (1 << bits) - 1
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_model(spark):
    from logsight_filebeat_spark.operators.layout import zorder_key

    rows = [(i, (i * 37) % 4096, (i * 91) % 4096) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {r.id: r.z for r in df.select("id", zorder_key("a", "b", 12).alias("z")).collect()}
    assert got == {i: _morton(a, b) for i, a, b in rows}


def test_quantize_dim_clamps_and_scales(spark):
    from logsight_filebeat_spark.operators.layout import quantize_dim

    df = spark.createDataFrame(
        [(-5,), (0,), (2500,), (5000,), (99999,)], "v long"
    )
    got = [r.q for r in df.select(quantize_dim("v", 0, 5000, 12).alias("q")).collect()]
    assert got == [0, 0, 2500 * 4095 // 5000, 4095, 4095]


def test_cluster_by_zorder_shrinks_partition_key_spans(spark):
    import pyspark.sql.functions as F

    from logsight_filebeat_spark.operators.layout import (
        cluster_by_zorder,
        zorder_key,
    )

    rows = [(i, (i * 17) % 4096, (i * 53) % 4096) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    key = zorder_key("a", "b", 12)
    clustered = cluster_by_zorder(df, key, n_files=16)
    per_part = (
        clustered.select(key.alias("z"), F.spark_partition_id().alias("p"))
        .groupBy("p")
        .agg((F.max("z") - F.min("z")).alias("span"))
        .agg(F.avg("span"))
        .first()[0]
    )
    full = df.select(key.alias("z")).agg(F.max("z") - F.min("z")).first()[0]
    # real locality, not cosmetics: average per-file span ≪ global span
    assert per_part < full / 4
    # clustering is a layout change only — the row set is untouched
    assert clustered.count() == len(rows)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    from collections import Counter

    from logsight_filebeat_spark.operators.sketches import cms_estimate, cms_table

    values = [f"v{i % 23}" for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in values], "value string")
    truth = Counter(values)
    sk = cms_table(df, "value", depth=4, width=4096)
    probes = spark.createDataFrame([(v,) for v in truth], "value string")
    got = {r.value: r.est for r in cms_estimate(sk, probes, "value", depth=4, width=4096).collect()}
    assert all(got[v] >= c for v, c in truth.items())
    # 23 distinct values into 4096 buckets × 4 rows: collisions are
    # possible per-row but the min over 4 rows recovers exact counts here
    assert got == dict(truth)


def test_cms_merge_equals_sketch_of_union(spark):
    from logsight_filebeat_spark.operators.sketches import cms_merge, cms_table

    a = spark.createDataFrame([(f"a{i % 11}",) for i in range(500)], "value string")
    b = spark.createDataFrame([(f"a{i % 17}",) for i in range(400)], "value string")
    merged = {
        (r.d, r.w): r.cnt
        for r in cms_merge(
            cms_table(a, "value", width=256), cms_table(b, "value", width=256)
        ).collect()
    }
    direct = {
        (r.d, r.w): r.cnt
        for r in cms_table(a.unionByName(b), "value", width=256).collect()
    }
    assert merged == direct


def test_cms_overcounts_under_forced_collisions(spark):
    from collections import Counter

    from logsight_filebeat_spark.operators.sketches import cms_estimate, cms_table

    # 900 distinct values into width=32: collisions guaranteed — estimates
    # must sit at or above truth, never below
    values = [f"x{i % 900}" for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in values], "value string")
    truth = Counter(values)
    sk = cms_table(df, "value", depth=3, width=32)
    probes = spark.createDataFrame([(v,) for v in list(truth)[:50]], "value string")
    got = {r.value: r.est for r in cms_estimate(sk, probes, "value", depth=3, width=32).collect()}
    assert all(got[v] >= truth[v] for v in got)
    assert any(got[v] > truth[v] for v in got)  # collisions actually happened


def test_shard_manifest_detects_any_content_change(spark):
    from logsight_filebeat_spark.operators.sampling import (
        shard_assignments,
        shard_manifest,
    )

    rows = [(i, f"text body {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m = {r.shard: (r.n_docs, r.fp_a, r.fp_b) for r in shard_manifest(df, 8).collect()}
    # counts reconcile with the assignment table (same derivation)
    a = shard_assignments(df, n_shards=8)
    counts = {r.shard: r.n for r in a.groupBy("shard").agg(__import__("pyspark.sql.functions", fromlist=["count"]).count("pos").alias("n")).collect()}
    assert {s: n for s, (n, _, _) in m.items()} == counts
    # partitioning-independent
    m7 = {r.shard: (r.n_docs, r.fp_a, r.fp_b) for r in shard_manifest(df.repartition(7), 8).collect()}
    assert m7 == m
    # a single-byte change in one doc flips exactly that shard's fingerprints
    rows2 = [(i, t if i != 123 else t + "!") for i, t in rows]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    m2 = {r.shard: (r.n_docs, r.fp_a, r.fp_b) for r in shard_manifest(df2, 8).collect()}
    diff = {s for s in m if m[s] != m2[s]}
    assert len(diff) == 1
    s = diff.pop()
    assert m[s][0] == m2[s][0]  # same count, different fingerprint


def test_salted_join_identical_to_plain_join(spark):
    import pyspark.sql.functions as F

    from logsight_filebeat_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(f"u{i}", "hot" if i % 3 else f"k{i % 7}") for i in range(300)],
        "url string, host string",
    )
    dims = big.select("host").distinct().withColumn("v", F.length("host"))
    plain = {tuple(r) for r in big.join(dims, "host").collect()}
    for n_salt in (1, 4, 16):
        salted = {
            tuple(r)
            for r in salted_join(big, dims, "host", "url", n_salt).collect()
        }
        assert salted == plain
    # outer joins preserve non-matching rows too
    extra = spark.createDataFrame([("nohost", 99)], "host string, v int")
    dims2 = dims.unionByName(extra)
    left = {
        tuple(r) for r in salted_join(big, dims2, "host", "url", 4, "left").collect()
    }
    assert left == {tuple(r) for r in big.join(dims2, "host", "left").collect()}


def test_salted_join_rejects_joins_that_duplicate_small_side(spark):
    """Round-4 regression: the small side is replicated once per salt
    bucket, so right/full outer joins would emit every unmatched small
    row n_salt times — the operator must refuse instead of silently
    corrupting outer-join results."""
    import pytest

    from logsight_filebeat_spark.operators.skew import salted_join

    big = spark.createDataFrame([("u1", "h1")], "url string, host string")
    dims = spark.createDataFrame([("h1", 1), ("h2", 2)], "host string, v int")
    for how in ("right", "rightouter", "full", "full_outer", "outer"):
        with pytest.raises(ValueError):
            salted_join(big, dims, "host", "url", 4, how)
    # the semantics-preserving types still work
    assert salted_join(big, dims, "host", "url", 4, "left_semi").count() == 1
    assert salted_join(big, dims, "host", "url", 4, "inner").count() == 1


def test_per_key_cap_defaults_to_two_phase_salted_plan(spark):
    """Round-4 regression: the DEFAULT call must plan the salted phase-1
    window (hot key split across n_salt tasks) — single-phase is the
    opt-out (n_salt=None), not the default."""
    rows = [(f"id{i}", f"k{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, key string")

    def _plan(d):
        return d._jdf.queryExecution().explainString(
            d.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    default_plan = _plan(per_key_cap(df, "key", 5, "doc_id"))
    assert "_rn1" in default_plan  # phase-1 salted rank present
    single_plan = _plan(per_key_cap(df, "key", 5, "doc_id", n_salt=None))
    assert "_rn1" not in single_plan
    # both forms agree row-for-row
    a = {(r.doc_id, r.pos) for r in per_key_cap(df, "key", 5, "doc_id").collect()}
    b = {
        (r.doc_id, r.pos)
        for r in per_key_cap(df, "key", 5, "doc_id", n_salt=None).collect()
    }
    assert a == b and len(a) == 15


def _bloom_model(values, n_bits=4096, n_hashes=4, seed="bloom:v1"):
    """Single-threaded python model of the portable bloom hash family."""
    import hashlib

    def h(v, d):
        hx = hashlib.md5(f"{seed}:{d}:{v}".encode()).hexdigest()
        return int(hx[:8], 16) % n_bits

    bits = {h(v, d) for v in values for d in range(n_hashes)}

    def probe(v):
        return all(h(v, d) in bits for d in range(n_hashes))

    return bits, probe


def test_bloom_no_false_negatives_and_model_identity(spark):
    """Every inserted value must probe true (the bloom guarantee), and
    both the bit set and every probe verdict must equal the
    single-threaded python model of the same portable hashes — including
    any deterministic false positive the sizing produces."""
    from logsight_filebeat_spark.operators.sketches import bloom_bits, bloom_probe

    vals = [f"url-{i}" for i in range(300)]
    absent = [f"nope-{i}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    bloom = bloom_bits(df, "value", n_bits=2048, n_hashes=3)
    model_bits, model_probe = _bloom_model(vals, n_bits=2048, n_hashes=3)
    assert {r.bit for r in bloom.collect()} == model_bits

    probes = spark.createDataFrame(
        [(v,) for v in vals + absent], "value string"
    )
    got = {
        r.value: r.maybe_present
        for r in bloom_probe(bloom, probes, "value", n_bits=2048, n_hashes=3).collect()
    }
    assert all(got[v] for v in vals)  # no false negatives, ever
    for v in absent:
        assert got[v] == model_probe(v)  # identical FP decisions


def test_bloom_merge_equals_union_and_partition_stability(spark):
    from logsight_filebeat_spark.operators.sketches import (
        bloom_bits,
        bloom_merge,
    )

    a = spark.createDataFrame([(f"a{i}",) for i in range(100)], "value string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(100)], "value string")
    merged = {
        r.bit
        for r in bloom_merge(
            bloom_bits(a, "value", 1024, 3), bloom_bits(b, "value", 1024, 3)
        ).collect()
    }
    union = {
        r.bit for r in bloom_bits(a.unionByName(b), "value", 1024, 3).collect()
    }
    assert merged == union
    repart = {
        r.bit
        for r in bloom_bits(
            a.unionByName(b).repartition(7), "value", 1024, 3
        ).collect()
    }
    assert repart == union


def test_kmv_by_group_python_model_identity(spark):
    """Per-group sketches and estimates equal the single-threaded model of
    the same portable hashes: exhaustive (exact) below k, integral
    estimator at/above k; repartition-stable."""
    import hashlib

    from logsight_filebeat_spark.operators.sketches import (
        KMV_SPACE,
        kmv_by_group,
        kmv_estimate_by_group,
    )

    def h(v):
        return int(hashlib.md5(f"kmv:v1:{v}".encode()).hexdigest()[:10], 16)

    rows = [("big", f"tok{i}") for i in range(200)] + [
        ("small", f"tok{i}") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "lang string, tok string")
    k = 16
    sk = kmv_by_group(df, "tok", "lang", k=k)
    got = {}
    for r in sk.collect():
        got.setdefault(r.lang, []).append(r.h)
    model = {
        "big": sorted(h(f"tok{i}") for i in range(200))[:k],
        "small": sorted(h(f"tok{i}") for i in range(5)),
    }
    assert {g: sorted(v) for g, v in got.items()} == model

    est = {
        r.lang: (r.n_seen, r.kth_hash, r.est_distinct)
        for r in kmv_estimate_by_group(sk, "lang", k=k).collect()
    }
    assert est["small"] == (5, max(model["small"]), 5)  # exact below k
    kth = model["big"][-1]
    assert est["big"] == (k, kth, (k - 1) * KMV_SPACE // kth)
    # repartition-stable
    sk2 = kmv_by_group(df.repartition(7), "tok", "lang", k=k)
    assert sorted(map(tuple, sk2.collect())) == sorted(map(tuple, sk.collect()))


def _py_hll_registers(values, p=8, seed="hll:v1"):
    """Python model of hll_registers over the md5-derived 40-bit hash."""
    m = 1 << p
    w_bits = 40 - p
    regs = {}
    for v in set(values):
        h = int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:10], 16)
        reg, w = h % m, h >> p
        rho = (w_bits + 1) if w == 0 else (w_bits + 1 - w.bit_length())
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_hll_registers_match_python_model(spark):
    from logsight_filebeat_spark.operators.sketches import hll_registers

    vals = [f"tok{i}" for i in range(500)] * 3  # duplicates collapse
    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    got = {r.register: r.max_rho for r in hll_registers(df, "tok").collect()}
    assert got == _py_hll_registers(vals)
    # partition stability: max is order-free
    got2 = {
        r.register: r.max_rho
        for r in hll_registers(df.repartition(7), "tok").collect()
    }
    assert got2 == got


def test_hll_estimate_within_standard_error(spark):
    from logsight_filebeat_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    n = 20_000
    df = spark.range(n).select(F.concat(F.lit("v"), "id").alias("v"))
    est = hll_estimate(hll_registers(df, "v"), p=8).first()["est_distinct"]
    # raw HLL at m=256: sigma ~ 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert abs(est - n) / n < 0.26


def test_hll_merge_equals_sketch_of_union(spark):
    from logsight_filebeat_spark.operators.sketches import (
        hll_merge,
        hll_registers,
    )

    a = spark.range(0, 3000).select(F.concat(F.lit("x"), "id").alias("v"))
    b = spark.range(2000, 6000).select(F.concat(F.lit("x"), "id").alias("v"))
    merged = {
        r.register: r.max_rho
        for r in hll_merge(
            hll_registers(a, "v"), hll_registers(b, "v")
        ).collect()
    }
    whole = {
        r.register: r.max_rho
        for r in hll_registers(a.unionByName(b), "v").collect()
    }
    assert merged == whole


def test_hll_rejects_bad_p(spark):
    import pytest

    from logsight_filebeat_spark.operators.sketches import hll_registers

    with pytest.raises(ValueError):
        hll_registers(spark.range(1), "id", p=2)


# ---------------------------------------------------------------------------
# kmv_set_ops / winsorize
# ---------------------------------------------------------------------------

def test_kmv_set_ops_exact_below_k(spark):
    from logsight_filebeat_spark.operators.sketches import (
        kmv_hashes,
        kmv_set_ops,
    )

    # 30 and 25 values with 10 shared — well under k, so every estimate
    # must be EXACT (sketches hold the full sets)
    a_vals = [f"v{i}" for i in range(30)]
    b_vals = [f"v{i}" for i in range(20, 45)]
    a = kmv_hashes(spark.createDataFrame([(v,) for v in a_vals], "x string"), "x", k=256)
    b = kmv_hashes(spark.createDataFrame([(v,) for v in b_vals], "x string"), "x", k=256)
    r = kmv_set_ops(a, b, k=256).first()
    assert (r["n_a"], r["n_b"]) == (30, 25)
    assert r["n_union_seen"] == 45 and r["union_est"] == 45
    assert r["n_both"] == 10 and r["inter_est"] == 10
    assert abs(r["jaccard_est"] - round(10 / 45, 6)) < 1e-9


def test_kmv_set_ops_estimator_branch(spark):
    from logsight_filebeat_spark.operators.sketches import (
        kmv_hashes,
        kmv_set_ops,
    )

    # k=16 over 200/150 values sharing 100: estimates are approximate but
    # must be deterministic and ordered sanely
    a_vals = [f"v{i}" for i in range(200)]
    b_vals = [f"v{i}" for i in range(100, 250)]
    a = kmv_hashes(spark.createDataFrame([(v,) for v in a_vals], "x string"), "x", k=16)
    b = kmv_hashes(spark.createDataFrame([(v,) for v in b_vals], "x string"), "x", k=16)
    r1 = kmv_set_ops(a, b, k=16).first()
    r2 = kmv_set_ops(a, b, k=16).first()
    assert r1 == r2  # deterministic
    assert r1["n_union_seen"] == 16
    assert r1["union_est"] >= 16
    assert 0.0 <= r1["jaccard_est"] <= 1.0
    assert r1["inter_est"] <= r1["union_est"]


def test_winsorize_clamps_exact_thresholds(spark):
    from logsight_filebeat_spark.operators.sampling import winsorize

    # values 1..100: p10 threshold = 10, p90 = 90 under the
    # smallest-v-with-cum>=ceil(q*n) definition
    df = spark.createDataFrame([(i,) for i in range(1, 101)], "v int")
    got = {r["v"]: r["v_w"] for r in winsorize(df, "v", 0.10, 0.90).collect()}
    assert got[1] == 10 and got[9] == 10 and got[10] == 10
    assert got[11] == 11 and got[89] == 89
    assert got[90] == 90 and got[95] == 90 and got[100] == 90
    import pytest

    with pytest.raises(ValueError):
        winsorize(df, "v", 0.9, 0.1)


def test_hll_sliding_matches_per_window_merge(spark):
    import datetime as dt

    from logsight_filebeat_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
        hll_sliding,
    )
    from pyspark.sql import functions as F

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    # hours 0,1,2,4 (hour 3 empty): values overlap across hours
    data = {0: ["a", "b"], 1: ["b", "c"], 2: ["d"], 4: ["e"]}
    rows = [
        (base + dt.timedelta(hours=h), v)
        for h, vs in data.items()
        for v in vs
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v string")
    got = {
        r["hour"].hour: r["est_distinct"]
        for r in hll_sliding(df, "v", "ts", trailing_h=3, p=8).collect()
    }
    assert set(got) == {0, 1, 2, 4}
    # each window's sliding estimate must equal hll_estimate over the
    # union of that window's values (merge-exactness of register max)
    windows = {0: {"a", "b"}, 1: {"a", "b", "c"}, 2: {"a", "b", "c", "d"},
               4: {"d", "e"}}  # hour 4 window spans hours 2..4
    for h, vals in windows.items():
        ref = spark.createDataFrame([(v,) for v in vals], "v string")
        exp = hll_estimate(hll_registers(ref, "v", p=8), p=8).first()[
            "est_distinct"
        ]
        assert got[h] == exp, (h, got[h], exp)
