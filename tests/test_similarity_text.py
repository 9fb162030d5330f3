"""Similarity-search and text-analysis operator semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from logsight_filebeat_spark.functions import text as tx
from logsight_filebeat_spark.operators import similarity as sim


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_brute_force_topk_exact_order(spark):
    vecs = _vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
    )
    q = vecs.filter(F.col("vec_id") == 0)
    out = sim.brute_force_topk(vecs, q, k=2).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [1, 2]
    assert out[0].rank == 1
    assert math.isclose(out[0].cosine, 0.9 / math.hypot(0.9, 0.1), rel_tol=1e-6)


def test_srp_buckets_deterministic_and_sane(spark):
    rows = [(i, [float((i * 7 + d * 3) % 11 - 5) for d in range(8)]) for i in range(30)]
    a = sorted(map(tuple, sim.srp_buckets(_vecs(spark, rows), 8).collect()))
    b = sorted(map(tuple, sim.srp_buckets(_vecs(spark, rows).repartition(5), 8).collect()))
    assert a == b  # partitioning-independent
    assert all(0 <= bucket < 2**8 for _, bucket in a)


def test_srp_identical_vectors_share_bucket_and_candidates(spark):
    rows = [(1, [0.5, -0.2, 0.8]), (2, [0.5, -0.2, 0.8]), (3, [-0.5, 0.2, -0.8])]
    cands = {(r.id_a, r.id_b) for r in sim.srp_candidate_pairs(_vecs(spark, rows), 6).collect()}
    assert (1, 2) in cands
    # 3 is the exact negation ⇒ opposite side of every hyperplane
    assert (1, 3) not in cands and (2, 3) not in cands


def test_srp_topk_ranks_within_bucket(spark):
    rows = [(i, [1.0 + 0.01 * i, 0.5 - 0.01 * i, 0.1]) for i in range(6)]
    vecs = _vecs(spark, rows)
    out = sim.srp_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=3, num_planes=2)
    got = out.orderBy("rank").collect()
    assert len(got) <= 3
    assert [r.rank for r in got] == list(range(1, len(got) + 1))


def test_multiprobe_recall_at_least_exact_bucket(spark):
    # neighbors that land one sign-flip away from the query's bucket are
    # invisible to exact-bucket srp_topk but found by Hamming-1 multi-probe;
    # recall vs brute force can only go up
    rows = [
        (i, [float((i * 13 + d * 5) % 17 - 8) / 8 for d in range(6)])
        for i in range(60)
    ]
    vecs = _vecs(spark, rows)
    qs = vecs.filter(F.col("vec_id") < 8)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(vecs, qs, k=5).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.srp_topk(vecs, qs, k=5, num_planes=4).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in sim.srp_multiprobe_topk(vecs, qs, k=5, num_planes=4).collect()
    }
    assert len(multi & truth) >= len(exact & truth)
    # every exact-bucket candidate's pair is still reachable via probe 0,
    # so per-query result size never shrinks
    from collections import Counter

    n_exact = Counter(q for q, _ in exact)
    n_multi = Counter(q for q, _ in multi)
    assert all(n_multi[q] >= n for q, n in n_exact.items())


def test_embedding_near_dups_lsh_is_exact_restricted_to_buckets(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.999, 0.01]),
        (5, [-1.0, 0.0, 0.0]),
    ]
    from logsight_filebeat_spark.operators import dedup

    vecs = _vecs(spark, rows)
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in dedup.embedding_near_dups(vecs, threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in sim.embedding_near_dups_lsh(
            vecs, threshold=0.9, num_planes=4
        ).collect()
    }
    assert set(lsh) <= set(exact)  # candidates never invent pairs
    assert all(lsh[p] == exact[p] for p in lsh)  # verify stage is exact
    # near-identical vectors share every hyperplane side ⇒ always recalled
    assert (1, 2) in lsh and (3, 4) in lsh


def test_ivf_full_probe_equals_brute_force(spark):
    """The IVF dial is explicit: probing EVERY inverted list is brute force
    — identical rows, not just identical recall."""
    rows = [
        (i, [float((i * 11 + d * 3) % 13 - 6) / 6 for d in range(5)])
        for i in range(40)
    ]
    vecs = _vecs(spark, rows)
    qs = vecs.filter(F.col("vec_id") < 6)
    brute = sorted(
        map(tuple, sim.brute_force_topk(vecs, qs, k=4).collect())
    )
    full_probe = sorted(
        map(tuple, sim.ivf_topk(vecs, qs, k=4, n_centroids=6, nprobe=6).collect())
    )
    assert brute == full_probe
    # nprobe=1 returns ≤ k per query and only true vectors
    narrow = sim.ivf_topk(vecs, qs, k=4, n_centroids=6, nprobe=1).collect()
    from collections import Counter

    per_q = Counter(r.query_id for r in narrow)
    assert all(n <= 4 for n in per_q.values())
    assert {r.neighbor_id for r in narrow} <= {i for i, _ in rows}


def test_ivf_assign_one_list_per_vector(spark):
    rows = [(i, [float(i % 5), 1.0]) for i in range(20)]
    vecs = _vecs(spark, rows)
    cb = sim.ivf_codebook(vecs, n_centroids=4)
    assert cb.count() == 4
    # centroid_id is the seed's own id — the 4 lowest ids here
    assert sorted(r.centroid_id for r in cb.collect()) == [0, 1, 2, 3]
    asg = sim.ivf_assign(vecs, cb)
    assert asg.count() == 20  # every vector lands in exactly one list
    assert asg.select("id").distinct().count() == 20
    assert asg.filter(~F.col("centroid_id").between(0, 3)).count() == 0


def test_ivf_train_codebook_converges_to_cluster_means(spark):
    """Two orthogonal blobs with one seed in each (ids 0 and 1 — the two
    lowest, so they ARE the seeds): one Lloyd round lands each centroid on
    its blob's exact mean, and a second round is a fixed point because the
    blob assignment can't change."""
    blob_a = [(i, [1.0 + 0.01 * i, 0.0]) for i in (0, 10, 11, 12)]
    blob_b = [(i, [0.0, 1.0 + 0.01 * i]) for i in (1, 20, 21, 22)]
    vecs = _vecs(spark, blob_a + blob_b)
    cb1 = {
        r.centroid_id: tuple(r.cv)
        for r in sim.ivf_train_codebook(vecs, n_centroids=2, iterations=1).collect()
    }
    cb2 = {
        r.centroid_id: tuple(r.cv)
        for r in sim.ivf_train_codebook(vecs, n_centroids=2, iterations=2).collect()
    }
    mean_a = (round(sum(1.0 + 0.01 * i for i, _ in blob_a) / 4, 6), 0.0)
    mean_b = (0.0, round(sum(1.0 + 0.01 * i for i, _ in blob_b) / 4, 6))
    assert cb1 == {0: mean_a, 1: mean_b}
    assert cb2 == cb1  # converged — iteration 2 is a fixed point


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def _doc(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id bigint, text string")


def test_token_counts(spark):
    df = _doc(spark, "Hello world, this  has   six tokens")
    [r] = df.select(
        tx.token_count("text").alias("n"),
        tx.bpe_ish_token_count("text").alias("b"),
    ).collect()
    assert r.n == 6
    # alpha runs: Hello world this has six tokens (6) + one comma
    assert r.b == 7


def test_ratios_and_quality_bounds(spark):
    good = "the quick brown fox jumps over a lazy dog in the misty morning light"
    junk = "!!! ??? ... ###"
    df = spark.createDataFrame([(1, good), (2, junk)], "doc_id bigint, text string")
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            tx.stopword_ratio("text").alias("sw"),
            tx.punct_ratio("text").alias("punct"),
            tx.quality_score("text").alias("q"),
        ).collect()
    }
    assert 0 < rows[1].sw < 0.5
    assert rows[1].punct == 0.0
    assert rows[1].q == 1.0  # hits every heuristic band
    # junk: 4 tokens (0.16) + avg len 3 (0.3); fails stopword + punct bands
    assert rows[2].q < 0.5


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house is here"),
            (2, "der Hund und die Katze das ist gut"),
            (3, "qwerty zzz xxx"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r.lang for r in df.select("doc_id", tx.lang_id("text").alias("lang")).collect()}
    assert rows[1] == "en"
    assert rows[2] == "de"
    assert rows[3] == "und"


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma ALPHA beta"), (3, "alpha beta delta")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r.fp for r in df.select("doc_id", tx.fingerprint("text").alias("fp")).collect()}
    assert rows[1] == rows[2]  # order + case insensitive
    assert rows[1] != rows[3]


def test_gopher_signals_and_gate(spark):
    """Each Gopher signal fires on its designed pathology; the composed
    gate passes a normal paragraph and rejects each pathology."""
    good = ("the quick brown fox jumps over a lazy dog and runs into the "
            "green field where it rests in the warm sun of a summer day "
            "and then it is off again to explore the wide world")
    rows = [
        (1, good),
        (2, "- one\n- two\n- three\n- four"),            # bullets
        (3, "read more... see more... click here... and..."),  # ellipses
        (4, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 23 "
            "24 25 26 27 28 29 30 31 32 33 34 35 36 37 38 39 40 41 42 43 "
            "44 45 46 47 48 49 50"),                      # no alpha words
        (5, "#### #### #### " + good),                   # symbol-heavy
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            tx.bullet_line_frac("text").alias("bullet"),
            tx.ellipsis_line_frac("text").alias("ellipsis"),
            tx.alpha_word_frac("text").alias("alpha"),
            tx.symbol_word_ratio("text").alias("symbol"),
            tx.distinct_stopword_count("text").alias("stops"),
            tx.gopher_pass("text", min_words=20).alias("passes"),
        ).collect()
    }
    assert got[1].passes and got[1].stops >= 2
    assert got[2].bullet == 1.0 and not got[2].passes
    assert got[3].ellipsis == 1.0 and not got[3].passes
    assert got[4].alpha == 0.0 and not got[4].passes
    assert got[5].symbol > 0.1 and not got[5].passes


def test_quantize_roundtrip_error_bounded(spark):
    """int8 quantization: codes within [-127,127], per-element round-trip
    error ≤ scale/2, zero vectors stay zero with scale 0."""
    rows = [
        (1, [0.5, -1.0, 0.25, 0.125]),
        (2, [0.0, 0.0, 0.0]),
        (3, [3.7]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {
        r.id: r
        for r in sim.dequantize_embeddings(
            sim.quantize_embeddings(df, keep_vec=True)
        ).collect()
    }
    for rid, r in out.items():
        assert all(-127 <= c <= 127 for c in r.q)
        for orig, deq in zip(r.orig, r.v):
            assert abs(orig - deq) <= r.scale / 2 + 1e-12
    assert out[2].scale == 0.0 and out[2].q == [0, 0, 0]
    assert out[3].q == [127]  # max element always hits full scale


def test_clean_text_markup_and_pii(spark):
    """Tags stripped, whitespace collapsed (newlines kept), PII masked in
    the right order (emails before phone digit-runs)."""
    from logsight_filebeat_spark.functions.cleaning import clean_text

    rows = [
        (1, "Hello  <b>world</b>\tnow"),
        (2, "mail bob.smith+x@example.co.uk please"),
        (3, "server at 192.168.0.1 port"),
        (4, "call +1 555 123 4567 today"),
        (5, "line one\nline  two"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.c for r in df.select("doc_id", clean_text("text").alias("c")).collect()}
    assert got[1] == "Hello world now"
    assert got[2] == "mail <EMAIL> please"
    assert got[3] == "server at <IP> port"
    assert got[4] == "call <PHONE> today"
    assert got[5] == "line one\nline two"


def test_chunk_tokens_overlap_and_tail(spark):
    """Chunks stride by width−overlap, carry the overlap verbatim, and the
    tail chunk is short; empty docs chunk to nothing."""
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "")], "doc_id bigint, text string")
    rows = (
        df.select("doc_id", F.explode(tx.chunk_tokens("text", width=4, overlap=1)).alias("c"))
        .select("doc_id", "c.*")
        .collect()
    )
    assert all(r.doc_id == 1 for r in rows)  # empty doc yields no chunks
    chunks = [r.chunk_text for r in sorted(rows, key=lambda r: r.idx)]
    # a 4th chunk at t9 would contain ONLY overlap (no new tokens) — never
    # emitted
    assert chunks == [
        "t0 t1 t2 t3",   # starts 0, stride 3
        "t3 t4 t5 t6",   # overlap carries t3
        "t6 t7 t8 t9",
    ]
    assert [r.n_tokens for r in sorted(rows, key=lambda r: r.idx)] == [4, 4, 4]


def test_semantic_dedup_drops_higher_pair_ids(spark):
    """Survivors = corpus minus the higher id of every intra-cluster pair
    at/above threshold; ids in no pair are untouched."""
    from logsight_filebeat_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    rows = [
        (1, [1.0, 0.0, 0.05]), (2, [1.0, 0.02, 0.0]), (3, [0.95, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.03]), (5, [0.02, 1.0, 0.0]),
        (6, [0.5, 0.5, 3.0]),  # near neither cluster axis
    ]
    vecs = _vecs(spark, rows)
    pairs = semantic_dedup_pairs(
        vecs, n_centroids=2, iterations=1, threshold=0.9
    )
    drops = {r.id_b for r in pairs.collect()}
    kept = {
        r.vec_id
        for r in semantic_dedup(
            vecs, n_centroids=2, iterations=1, threshold=0.9
        ).collect()
    }
    assert kept == {r[0] for r in rows} - drops and drops


def test_semantic_dedup_pairs_plan_no_cartesian(spark):
    """The intra-cluster pair generator must plan as a hash equi-join on
    centroid_id — never a CartesianProduct over the corpus (training's
    constant-k codebook scoring broadcasts <=k rows and is fine)."""
    from logsight_filebeat_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    vecs = _vecs(spark, [(i, [float(i), 1.0, 0.0]) for i in range(1, 7)])
    plan = (
        semantic_dedup_pairs(vecs, n_centroids=2, iterations=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_readability_formula(spark):
    from logsight_filebeat_spark.functions.text import (
        flesch_reading_ease,
        sentence_count,
        syllable_count,
        token_count,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("The cat sat. The dog ran!",), ("",), ("no terminal punctuation",)],
        "t string",
    )
    rows = df.select(
        token_count(F.col("t")).alias("w"),
        sentence_count(F.col("t")).alias("s"),
        syllable_count(F.col("t")).alias("sy"),
        flesch_reading_ease(F.col("t")).alias("f"),
    ).collect()
    w, s, sy, f = rows[0]
    assert (w, s, sy) == (6, 2, 6)
    assert abs(f - round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)) < 1e-9
    assert rows[1]["w"] == 0 and rows[1]["f"] is None  # empty → NULL score
    assert rows[2]["s"] == 1  # sentence floor


def test_char_class_entropy(spark):
    import math

    from pyspark.sql import functions as F

    from logsight_filebeat_spark.functions.text import char_class_entropy

    df = spark.createDataFrame(
        [("aaaa",), ("a1 .\x07",), ("",)], "t string"
    )
    got = [
        r["e"]
        for r in df.select(char_class_entropy(F.col("t")).alias("e")).collect()
    ]
    assert got[0] == 0.0  # single class → zero entropy
    # 5 chars, one per class → uniform over 5 → log2(5)
    assert abs(got[1] - round(math.log2(5), 6)) < 1e-9
    assert got[2] is None  # empty → NULL


def test_pq_encode_and_adc_topk(spark):
    from logsight_filebeat_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    # 3 well-separated directions in 4-dim space, m=2 subspaces of 2 dims
    # keep every SUBVECTOR non-zero: cosine of a zero-norm slice is a
    # division by zero under ANSI (same contract as the ivf/cosine suite)
    base = {
        0: [1.0, 0.1, 1.0, 0.1],
        1: [0.1, 1.0, 0.1, 1.0],
        2: [1.0, 1.0, 0.1, 0.1],
    }
    rows = []
    for vid in range(12):
        b = base[vid % 3]
        rows.append((vid, [x + 0.01 * (vid // 3) for x in b]))
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb = pq_train(vecs, dim=4, m=2, ks=3, iterations=1)
    assert {r["subspace"] for r in cb.select("subspace").distinct().collect()} == {0, 1}
    codes = pq_encode(vecs, cb, dim=4, m=2)
    assert codes.count() == 24  # one code per (vector, subspace)
    out1 = sorted(map(tuple, pq_topk(vecs, vecs.filter("vec_id < 3"),
                                     dim=4, m=2, ks=3, k=3,
                                     iterations=1).collect()))
    out2 = sorted(map(tuple, pq_topk(vecs, vecs.filter("vec_id < 3"),
                                     dim=4, m=2, ks=3, k=3,
                                     iterations=1).collect()))
    assert out1 == out2  # deterministic end to end
    by_q = {}
    for qid, nid, cos, rank in out1:
        assert qid != nid  # self excluded
        by_q.setdefault(qid, []).append((rank, nid, cos))
    for qid, lst in by_q.items():
        lst.sort()
        # same-direction vectors (vid ≡ qid mod 3) must fill the top ranks:
        # the quantizer collapses each direction cluster to one centroid
        top = [nid for _, nid, _ in lst[:3]]
        same = [n for n in top if n % 3 == qid % 3]
        assert len(same) >= 2

    import pytest

    with pytest.raises(ValueError):
        pq_train(vecs, dim=5, m=2)


def test_ivfpq_prunes_to_probed_lists(spark):
    from logsight_filebeat_spark.operators.similarity import (
        ivf_assign,
        ivf_codebook,
        ivfpq_topk,
    )

    rows = []
    for vid in range(16):
        rows.append(
            (vid, [1.0 + 0.05 * (vid % 4), 0.2 + 0.1 * (vid % 3),
                   0.7 + 0.05 * vid, 1.0])
        )
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    qs = vecs.filter("vec_id < 2")
    out1 = sorted(map(tuple, ivfpq_topk(
        vecs, qs, dim=4, m=2, ks=3, k=3, n_centroids=4, nprobe=2,
        iterations=1).collect()))
    out2 = sorted(map(tuple, ivfpq_topk(
        vecs, qs, dim=4, m=2, ks=3, k=3, n_centroids=4, nprobe=2,
        iterations=1).collect()))
    assert out1 == out2 and len(out1) > 0
    # pruning property: every returned neighbor lives in one of its
    # query's nprobe probed coarse lists
    coarse = ivf_codebook(vecs, 4)
    asg = {r["id"]: r["centroid_id"]
           for r in ivf_assign(vecs, coarse).collect()}
    from logsight_filebeat_spark.operators.dedup import cosine_sim
    from pyspark.sql import functions as F
    probes = (
        qs.select(F.col("vec_id").alias("q"), F.col("embedding").cast("array<double>").alias("qv"))
        .crossJoin(F.broadcast(coarse))
        .withColumn("s", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
    ).collect()
    by_q = {}
    for r in probes:
        by_q.setdefault(r["q"], []).append((-r["s"], r["centroid_id"]))
    probed = {q: {c for _, c in sorted(v)[:2]} for q, v in by_q.items()}
    for qid, nid, _, _ in out1:
        assert qid != nid
        assert asg[nid] in probed[qid]
