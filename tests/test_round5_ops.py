"""Round-5 operators: label propagation, edit-distance verify, multi-index
hamming near-dups, KS drift, exact-integer correlations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _release():
    from logsight_filebeat_spark.functions.caching import release_persisted

    release_persisted()


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

def test_lpa_two_cliques(spark):
    from logsight_filebeat_spark.operators.webgraph import label_propagation

    # two triangles joined by one bridge edge c-d: LPA must keep them as
    # two communities (the bridge is outvoted by each side's clique edges)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")],
        "src string, dst string",
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges, 3).collect()}
    _release()
    assert len(set(got.values())) == 2
    assert got["a"] == got["b"] == got["c"]
    assert got["d"] == got["e"] == got["f"]


def test_lpa_deterministic_tiebreak(spark):
    from logsight_filebeat_spark.operators.webgraph import label_propagation

    # star: center 'm' sees neighbors {a, z} with equal counts — the tie
    # must go to the MINIMUM label, and the result must not depend on
    # partitioning
    edges = spark.createDataFrame(
        [("m", "a"), ("m", "z")], "src string, dst string"
    )
    one = {r["node"]: r["label"]
           for r in label_propagation(edges, 1).collect()}
    _release()
    assert one["m"] == "a"  # min of the tied {a, z}
    re4 = {r["node"]: r["label"]
           for r in label_propagation(edges.repartition(4), 1).collect()}
    _release()
    assert re4 == one


def test_lpa_ignores_self_loops(spark):
    from logsight_filebeat_spark.operators.webgraph import label_propagation

    edges = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "src string, dst string"
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges, 2).collect()}
    _release()
    assert set(got) == {"a", "b"}  # the self-loop adds no phantom votes
    assert got == {"a": "a", "b": "a"}


# ---------------------------------------------------------------------------
# edit_distance_verify
# ---------------------------------------------------------------------------

def test_edit_verify_exact_dups_zero(spark):
    from logsight_filebeat_spark.operators.dedup import edit_distance_verify

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " EXTRA")],
        "doc_id bigint, text string",
    )
    rows = {(r["id_a"], r["id_b"]): r["edit_dist"]
            for r in edit_distance_verify(docs).collect()}
    _release()
    assert rows[(1, 2)] == 0  # byte-identical pair
    assert rows[(1, 3)] == 6 and rows[(2, 3)] == 6  # " EXTRA" appended


def test_edit_verify_prefix_bounds_cost(spark):
    from logsight_filebeat_spark.operators.dedup import edit_distance_verify

    # differ only beyond the prefix window -> distance 0 under prefix=20;
    # 30 shared tokens keep shingle-Jaccard high enough that LSH pairs them
    base = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, base + " " + "x" * 9), (2, base + " " + "y" * 9)],
        "doc_id bigint, text string",
    )
    rows = edit_distance_verify(docs, prefix=20).collect()
    _release()
    assert [(r["id_a"], r["id_b"], r["edit_dist"]) for r in rows] == [(1, 2, 0)]
    rows_full = edit_distance_verify(docs, prefix=None).collect()
    _release()
    assert rows_full[0]["edit_dist"] == 9


def test_edit_verify_max_dist_filter(spark):
    from logsight_filebeat_spark.operators.dedup import edit_distance_verify

    base = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base.replace("ten", "zzz"))],
        "doc_id bigint, text string",
    )
    rows = edit_distance_verify(docs, max_dist=0).collect()
    _release()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]


# ---------------------------------------------------------------------------
# phash_near_dups (multi-index hamming)
# ---------------------------------------------------------------------------

def test_phash_near_dups_recall_vs_bruteforce(spark):
    from logsight_filebeat_spark.operators.multimodal import phash_near_dups

    # deterministic spread of 40 fingerprints; pigeonhole guarantees the
    # banded join finds EVERY pair within max_hamming < bands
    import hashlib

    fps = [
        (i, int(hashlib.md5(f"fp:{i}".encode()).hexdigest()[:4], 16))
        for i in range(40)
    ]
    df = spark.createDataFrame(fps, "doc_id bigint, phash bigint")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in phash_near_dups(df, bands=4, max_hamming=3).collect()}
    _release()
    want = {}
    for i, a in fps:
        for j, b in fps:
            if i < j and bin(a ^ b).count("1") <= 3:
                want[(i, j)] = bin(a ^ b).count("1")
    assert got == want and len(want) > 0


def test_phash_near_dups_rejects_lossy_params(spark):
    from logsight_filebeat_spark.operators.multimodal import phash_near_dups

    df = spark.createDataFrame([(1, 3)], "doc_id bigint, phash bigint")
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_dups(df, bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="divide"):
        phash_near_dups(df, bits=16, bands=3, max_hamming=1)


# ---------------------------------------------------------------------------
# ks_statistic
# ---------------------------------------------------------------------------

def test_ks_identical_distributions_zero(spark):
    from logsight_filebeat_spark.operators.curation import ks_statistic

    rows = [(v, flag) for v in (1, 2, 3, 4, 5) for flag in (True, False)]
    df = spark.createDataFrame(rows, "v bigint, flag boolean")
    out = ks_statistic(df, "v", "flag").collect()
    assert len(out) == 1 and out[0]["ks"] == 0.0 and out[0]["ks_num"] == 0


def test_ks_matches_python_model(spark):
    from logsight_filebeat_spark.operators.curation import ks_statistic

    a = [1, 1, 2, 3, 5, 8, 13]
    b = [2, 4, 4, 6, 9]
    df = spark.createDataFrame(
        [(v, True) for v in a] + [(v, False) for v in b],
        "v bigint, flag boolean",
    )
    out = ks_statistic(df, "v", "flag").collect()[0]
    vals = sorted(set(a + b))
    best = max(
        abs(sum(1 for x in a if x <= v) * len(b)
            - sum(1 for x in b if x <= v) * len(a))
        for v in vals
    )
    assert out["ks_num"] == best
    assert out["ks"] == round(best / (len(a) * len(b)), 6)
    assert out["n_a"] == len(a) and out["n_b"] == len(b)


# ---------------------------------------------------------------------------
# signal_correlations
# ---------------------------------------------------------------------------

def test_corr_perfect_and_null(spark):
    from logsight_filebeat_spark.operators.curation import signal_correlations

    df = spark.createDataFrame(
        [(i, 2 * i + 1, 7) for i in range(1, 20)],
        "x bigint, y bigint, k bigint",
    )
    got = {(r["col_x"], r["col_y"]): r["r"]
           for r in signal_correlations(df, ["x", "y", "k"]).collect()}
    assert got[("x", "y")] == 1.0  # affine -> exactly 1 after rounding
    assert got[("x", "k")] is None and got[("y", "k")] is None  # zero variance


def test_corr_matches_python_model(spark):
    import math

    from logsight_filebeat_spark.operators.curation import signal_correlations

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    ys = [2, 7, 1, 8, 2, 8, 1, 8, 2, 8]
    df = spark.createDataFrame(list(zip(xs, ys)), "x bigint, y bigint")
    r = signal_correlations(df, ["x", "y"]).collect()[0]["r"]
    n = len(xs)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    vx = n * sum(x * x for x in xs) - sum(xs) ** 2
    vy = n * sum(y * y for y in ys) - sum(ys) ** 2
    assert r == round(num / math.sqrt(vx * vy), 6)
