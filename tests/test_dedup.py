"""Dedup operator semantics (operators/dedup.py) on in-memory fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from logsight_filebeat_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_word_shingles_basic(spark):
    df = _docs(spark, [(1, "A quick brown Fox jumps")])
    [row] = df.select(dedup.word_shingles("text", 3).alias("s")).collect()
    assert row.s == [
        "a quick brown",
        "quick brown fox",
        "brown fox jumps",
    ]


def test_word_shingles_short_text_is_empty_not_error(spark):
    # regression: sequence(1, 0) descends in Spark — 2 tokens with n=3 used
    # to feed slice() an illegal start of 0 and fail the task
    df = _docs(spark, [(1, "a b"), (2, ""), (3, "x y z")])
    rows = {
        r.doc_id: r.s
        for r in df.select("doc_id", dedup.word_shingles("text", 3).alias("s")).collect()
    }
    assert rows[1] == []
    assert rows[2] == []
    assert rows[3] == ["x y z"]


def test_exact_dup_groups_and_dedup(spark):
    df = _docs(
        spark,
        [(1, "same text"), (2, "same text"), (5, "same text"), (9, "unique")],
    )
    groups = dedup.exact_dup_groups(df).collect()
    assert len(groups) == 1
    assert groups[0].dup_count == 3
    assert groups[0].keep_id == 1

    kept = sorted(r.doc_id for r in dedup.dedup_exact(df).collect())
    assert kept == [1, 9]


def test_jaccard_pairs_identical_and_disjoint(spark):
    df = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words entirely here now"),
        ],
    )
    pairs = {(r.id_a, r.id_b): r.jaccard for r in dedup.jaccard_pairs(df, threshold=0.5).collect()}
    assert pairs == {(1, 2): 1.0}


def test_minhash_identical_docs_share_all_bands(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
        ],
    )
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_signature_is_order_invariant_wrt_partitioning(spark):
    rows = [(i, f"w{i} w{i+1} w{i+2} w{i+3} common tail tokens") for i in range(20)]
    a = dedup.minhash_signatures(_docs(spark, rows))
    b = dedup.minhash_signatures(_docs(spark, rows).repartition(7))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_simhash_properties(spark):
    df = _docs(
        spark,
        [
            (1, "log parsing pipeline with spark streaming enabled"),
            (2, "log parsing pipeline with spark streaming enabled"),
            (3, "TOTALLY unrelated cryptographic hash content xyz"),
        ],
    )
    vals = {r.doc_id: r.sh for r in df.select("doc_id", dedup.simhash("text").alias("sh")).collect()}
    assert vals[1] == vals[2]  # identical text ⇒ identical fingerprint
    assert vals[1] != vals[3]
    assert 0 <= vals[1] < 2**32

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_pairs(df, max_hamming=0).collect()
    }
    assert pairs == {(1, 2): 0}


def test_simhash_blocked_equals_exact_all_pairs(spark):
    # the pigeonhole-blocked production form must return EXACTLY the pairs
    # of the O(n²) reference form — same ids, same hamming distances
    rows = [
        (i, f"token{i % 7} alpha beta gamma {('x ' * (i % 5))}delta epsilon")
        for i in range(40)
    ] + [(100 + i, "shared near duplicate payload text here") for i in range(4)]
    df = _docs(spark, rows)
    for max_h in (0, 2, 3):
        blocked = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_pairs(df, max_hamming=max_h).collect()
        }
        exact = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_pairs_exact(df, max_hamming=max_h).collect()
        }
        assert blocked == exact


def test_simhash_chunks_cover_fingerprint(spark):
    df = _docs(spark, [(1, "alpha beta gamma delta")])
    s = df.select(F.col("doc_id").alias("id"), dedup.simhash("text").alias("sh"))
    chunks = dedup.simhash_chunks(s, bits=32, max_hamming=3).collect()
    assert len(chunks) == 4  # max_hamming + 1 disjoint slices
    sh = chunks[0].sh
    # reassembling the slices reproduces the fingerprint
    total = sum(c.chunk_val << (c.chunk_idx * 8) for c in chunks)
    assert total == sh


def test_jaccard_capped_drops_hot_shingles(spark):
    # docs 1-4 share ONLY the hot shingle "common glue words" (df=4 > cap);
    # docs 5,6 share rare shingles. With max_doc_freq=3 the hot shingle is
    # pruned: 1-4 pairs vanish, 5-6 survives with jaccard over rare shingles.
    hot = "common glue words"
    rows = [
        (1, f"{hot} aa bb cc"),
        (2, f"{hot} dd ee ff"),
        (3, f"{hot} gg hh ii"),
        (4, f"{hot} jj kk ll"),
        (5, "rare one two three four"),
        (6, "rare one two three nine"),
    ]
    df = _docs(spark, rows)
    uncapped = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_pairs(df, threshold=0.05).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_pairs(df, threshold=0.05, max_doc_freq=3).collect()
    }
    assert (1, 2) in uncapped
    assert all(p not in capped for p in [(1, 2), (1, 3), (2, 3), (3, 4)])
    assert (5, 6) in capped


def test_release_persisted_clears_tracked_caches(spark):
    from logsight_filebeat_spark.functions.caching import release_persisted

    release_persisted()  # drop anything earlier tests pinned
    df = _docs(spark, [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(10)])
    dedup.simhash_pairs(df).count()  # operator pins its chunk projection
    assert release_persisted() >= 1
    assert release_persisted() == 0  # idempotent, registry drained


def test_curate_corpus_chain(spark):
    """Composed curation pipeline: exact dups collapse, LSH near-dups drop
    the higher id, junk and language-less docs are gated out."""
    from logsight_filebeat_spark.operators.curation import (
        curate_corpus,
        curation_report,
    )

    good = (
        "the quick brown fox jumps over a lazy dog in the misty morning light"
    )
    near = good + " tonight"  # near-dup of `good` (one appended token)
    rows = [
        (1, good),
        (2, good),            # exact dup of 1 → dropped at step 1
        (3, near),            # near-dup of 1 → dropped by LSH (higher id)
        (4, "!!! ??? ### ..."),  # junk → quality gate
        (5, "qzx wvu jkl mno pqr stu vwx yzq abc def ghi jkl mno pqr stu"),
        # ↑ wordlike but no language markers → lang gate ('und')
        (6, "der Hund und die Katze spielen gerne zusammen in dem grossen Garten draussen heute"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # bands=4 (2 rows/band): higher collision probability per band — the
    # recall-leaning config appropriate for a high-similarity pair
    kept = curate_corpus(df, min_quality=0.5, num_hashes=8, bands=4)
    got = {r.doc_id: r for r in kept.collect()}
    assert set(got) == {1, 6}
    assert got[1].lang_pred == "en" and got[6].lang_pred == "de"
    assert all(r.quality >= 0.5 for r in got.values())

    rep = {r.lang_pred: r for r in curation_report(kept).collect()}
    assert rep["en"].n_docs == 1 and rep["de"].n_docs == 1
    assert 0 < rep["en"].avg_quality <= 1.0

    from logsight_filebeat_spark.functions.caching import release_persisted

    release_persisted()


def test_curation_funnel_accounts_for_every_doc(spark):
    """Funnel labels each doc with its first-failing gate; counts reconcile
    with the survivor set curate_corpus returns on the same fixture."""
    from logsight_filebeat_spark.operators.curation import (
        curate_corpus,
        curation_funnel,
    )
    from logsight_filebeat_spark.functions.caching import release_persisted

    good = (
        "the quick brown fox jumps over a lazy dog in the misty morning light"
    )
    rows = [
        (1, good),
        (2, good),                # exact dup
        (3, good + " tonight"),   # near-dup (higher id)
        (4, "!!! ??? ### ..."),   # quality gate
        (5, "qzx wvu jkl mno pqr stu vwx yzq abc def ghi jkl mno pqr stu"),
        (6, "der Hund und die Katze spielen gerne zusammen in dem grossen Garten draussen heute"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fun = {
        r.stage: r
        for r in curation_funnel(df, num_hashes=8, bands=4).collect()
    }
    assert fun["exact_dup"].n_docs == 1
    assert fun["near_dup"].n_docs == 1
    assert fun["low_quality"].n_docs == 1
    assert fun["lang_unknown"].n_docs == 1
    assert fun["kept"].n_docs == 2
    assert sum(r.n_docs for r in fun.values()) == len(rows)
    assert abs(sum(r.pct for r in fun.values()) - 1.0) < 1e-5
    assert [fun[s].stage_idx for s in
            ("exact_dup", "near_dup", "low_quality", "lang_unknown", "kept")
            ] == [0, 1, 2, 3, 4]
    # kept count reconciles with the survivor set of the same chain
    kept = curate_corpus(df, min_quality=0.5, num_hashes=8, bands=4).count()
    assert fun["kept"].n_docs == kept
    release_persisted()


def test_substring_dup_stats(spark):
    """Docs sharing a verbatim width-token run are flagged position-exactly;
    short docs have zero windows; unrelated docs have zero dup windows."""
    from logsight_filebeat_spark.functions.caching import release_persisted
    from logsight_filebeat_spark.operators.dedup import substring_dup_stats

    shared = "one two three four"  # width=4 → exactly this window is shared
    rows = [
        (1, "intro " + shared + " tail1 tail2"),
        (2, "other lead-in words " + shared),
        (3, "completely different words that never repeat anywhere else"),
        (4, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.id: r for r in substring_dup_stats(df, width=4).collect()}
    release_persisted()
    # doc1: 7 tokens → 4 windows; the shared run starts at pos 1
    assert got[1].n_windows == 4 and got[1].dup_windows == 1
    # doc2: 7 tokens → 4 windows; shared run at the end
    assert got[2].n_windows == 4 and got[2].dup_windows == 1
    assert got[3].dup_windows == 0 and got[3].n_windows > 0
    assert got[4].n_windows == 0 and got[4].dup_ratio == 0.0


def test_connected_components_exact_min_id(spark):
    """Min-label propagation finds the exact component minimum, including
    across transitive links that the greedy rule cannot see: the path
    1-3, 2-3 is ONE cluster, so cc keeps only id 1 while greedy keeps 1
    AND 2 (2 is never a pair's higher member)."""
    from logsight_filebeat_spark.operators.curation import connected_components
    from logsight_filebeat_spark.functions.caching import release_persisted

    pairs = spark.createDataFrame(
        [(1, 3), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a bigint, id_b bigint",
    )
    comp = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert comp == {
        1: 1, 2: 1, 3: 1,          # transitive cluster → min id 1
        10: 10, 11: 10,            # simple pair
        20: 20, 21: 20, 22: 20, 23: 20,  # 4-node path (needs >1 round)
    }
    release_persisted()


def test_curate_corpus_cc_vs_greedy(spark):
    """On a transitively-linked near-dup triple, clustering='cc' keeps only
    the component minimum while 'greedy' may keep non-minimum members."""
    from logsight_filebeat_spark.operators.curation import curate_corpus
    from logsight_filebeat_spark.functions.caching import release_persisted

    base = (
        "the quick brown fox jumps over a lazy dog in the misty morning light"
    )
    rows = [
        (1, base + " one"),
        (2, base + " two"),
        (3, base + " ray"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kept_cc = {
        r.doc_id
        for r in curate_corpus(
            df, min_quality=0.5, num_hashes=8, bands=4, clustering="cc"
        ).collect()
    }
    release_persisted()
    assert kept_cc == {1}
    kept_greedy = {
        r.doc_id
        for r in curate_corpus(
            df, min_quality=0.5, num_hashes=8, bands=4
        ).collect()
    }
    release_persisted()
    # greedy is a superset containing the minimum; with a fully-connected
    # triangle it also collapses to {1}, so only assert the invariants
    assert 1 in kept_greedy and kept_cc <= kept_greedy


def test_embedding_near_dups(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # nearly parallel to 1
        (3, [0.0, 1.0, 0.0]),  # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    pairs = {(r.id_a, r.id_b): r.cosine for r in dedup.embedding_near_dups(df, threshold=0.95).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] > 0.999


def test_repetition_stats(spark):
    """Repeated lines and the dominant bigram are measured exactly."""
    from logsight_filebeat_spark.operators.curation import repetition_stats

    text1 = "same line\nsame line\nunique one\nanother line"  # 4 lines, 2 dup
    text2 = "go go go go stop"  # top bigram "go go" ×3
    df = spark.createDataFrame(
        [(1, text1), (2, text2)], "doc_id bigint, text string"
    )
    got = {r.id: r for r in repetition_stats(df).collect()}
    assert got[1].n_lines == 4
    assert got[1].dup_line_frac == 0.5
    # dup chars: 2×9 of (9+9+10+12)=40 line chars
    assert got[1].dup_line_char_frac == round(18 / 40, 6)
    assert got[2].top_ngram == "go go"
    # 3 × len("go go")=5 over len(text2)=16
    assert got[2].top_ngram_char_frac == round(15 / 16, 6)
    assert got[2].dup_line_frac == 0.0


def test_hash_sampling_deterministic_and_disjoint(spark):
    """Hash sampling is stable under repartitioning; train/val splits are
    disjoint and exhaustive; stratified fractions land near target."""
    from logsight_filebeat_spark.operators.sampling import (
        hash_sample,
        stratified_hash_sample,
        train_val_split,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(2000)],
        "doc_id bigint, lang string",
    )
    s1 = {r.doc_id for r in hash_sample(df, fraction=0.2).collect()}
    s2 = {r.doc_id for r in hash_sample(df.repartition(13), fraction=0.2).collect()}
    assert s1 == s2  # partitioning-independent membership
    assert 0.15 < len(s1) / 2000 < 0.25
    # a smaller fraction of the same seed is a subset (nested samples)
    s_small = {r.doc_id for r in hash_sample(df, fraction=0.05).collect()}
    assert s_small <= s1

    train, val = train_val_split(df, val_fraction=0.25)
    t = {r.doc_id for r in train.collect()}
    v = {r.doc_id for r in val.collect()}
    assert t.isdisjoint(v) and len(t) + len(v) == 2000

    strat = stratified_hash_sample(
        df, "lang", {"de": 1.0, "en": 0.1}
    ).groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in strat}
    assert counts["de"] == 1000  # fraction 1.0 keeps everything
    assert 50 < counts.get("en", 0) < 200


def test_prefix_sum_and_packing(spark):
    """Two-phase distributed prefix sum equals the single-node cumsum, is
    stable under repartitioning, and pack assignment fills contiguously."""
    from logsight_filebeat_spark.operators.packing import (
        pack_sequences,
        with_prefix_sum,
    )

    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    expect, acc = {}, 0
    for i, n in rows:
        expect[i] = acc
        acc += n
    for d in (df, df.repartition(11)):
        got = {
            r.doc_id: r.offset
            for r in with_prefix_sum(d, bucket_size=16).collect()
        }
        assert got == expect
    packs = pack_sequences(df, budget=50, bucket_size=16).collect()
    by_id = sorted(packs, key=lambda r: r.doc_id)
    assert by_id[0].pack_id == 0
    assert all(r.pack_id == r.offset // 50 for r in by_id)
    # pack ids are monotone in id order (contiguous fill)
    assert all(
        a.pack_id <= b.pack_id for a, b in zip(by_id, by_id[1:])
    )


def test_contamination_cross_table(spark):
    """Corpus docs sharing a verbatim window with the benchmark are flagged
    with exact window/bench-doc counts; clean docs are absent."""
    from logsight_filebeat_spark.functions.caching import release_persisted

    shared = "alpha beta gamma delta"
    corpus = _docs(spark, [
        (1, "lead " + shared + " tail"),
        (2, "totally unrelated corpus document text"),
    ])
    bench = _docs(spark, [
        (100, shared + " with extra benchmark words"),
        (101, "other benchmark entry " + shared),
    ])
    got = {r.id: r for r in dedup.contamination(corpus, bench, width=4).collect()}
    release_persisted()
    assert set(got) == {1}
    assert got[1].hit_windows == 1       # one contaminated position
    assert got[1].benchmark_docs == 2    # hits both benchmark docs
    assert got[1].n_windows == 3         # 6 tokens, width 4


def test_minhash_estimate_bounds_and_identity(spark):
    """Identical docs estimate 1.0; estimates live in [0,1] and only
    LSH candidates are scored."""
    from logsight_filebeat_spark.functions.caching import release_persisted

    df = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "one two three four five six seven"),
    ])
    got = {(r.id_a, r.id_b): r.est_jaccard
           for r in dedup.minhash_estimate_pairs(df, threshold=0.0).collect()}
    release_persisted()
    assert got[(1, 2)] == 1.0
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_tfidf_top_terms(spark):
    """Rare distinguishing terms outrank corpus-wide common ones; ranks are
    dense per doc and capped at k."""
    from logsight_filebeat_spark.operators.curation import tfidf_top_terms

    df = _docs(spark, [
        (1, "common common zebra zebra"),
        (2, "common common yak yak"),
        (3, "common plain words"),
    ])
    rows = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append(r)
    for recs in by_doc.values():
        assert [r.rank for r in sorted(recs, key=lambda r: r.rank)] == list(
            range(1, len(recs) + 1)
        )
        assert len(recs) <= 2
    top1 = {i: min(rs, key=lambda r: r.rank).term for i, rs in by_doc.items()}
    # at equal tf the rare term (df=1, idf=ln(2)+1) beats the ubiquitous
    # one (df=3, idf=1)
    assert top1[1] == "zebra"
    assert top1[2] == "yak"


def test_doc_bigrams_pairs_and_short_docs(spark):
    from logsight_filebeat_spark.operators.curation import doc_bigrams

    df = spark.createDataFrame(
        [(1, "The cat  sat"), (2, "word"), (3, "")],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r.id, r.bigram) for r in doc_bigrams(df).collect()
    )
    # lowercased, multi-space collapsed; <2-token docs emit nothing
    assert got == [(1, "cat sat"), (1, "the cat")]


def test_lm_familiarity_mean_training_counts(spark):
    """Self-scored corpus: 'a b' appears in docs 1 and 2 (model count 2),
    'b c' only in doc 1 (count 1). Doc 1 mean = (2+1)/2, doc 2 = 2/1;
    the bigram-less doc scores the -1.0 sentinel."""
    from logsight_filebeat_spark.operators.curation import lm_familiarity

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "x")],
        "doc_id bigint, text string",
    )
    got = {
        r.id: (r.n_bigrams, r.familiarity)
        for r in lm_familiarity(df).collect()
    }
    assert got == {1: (2, 1.5), 2: (1, 2.0), 3: (0, -1.0)}


def test_cut_duplicated_spans_keeps_first_occurrence_only(spark):
    """Two docs share a 3-token span: the lower (id, pos) occurrence
    survives verbatim, the other loses exactly those tokens; an untouched
    doc passes through byte-identical."""
    df = _docs(
        spark,
        [
            (1, "x y z tail one"),
            (2, "head x y z tail2"),
            (3, "totally different words here"),
        ],
    )
    out = {
        r.id: r
        for r in dedup.cut_duplicated_spans(df, width=3).collect()
    }
    # doc 1 holds the canonical (min (id,pos)) occurrence of "x y z"
    assert out[1].text == "x y z tail one" and out[1].n_cut == 0
    # doc 2's copy is cut: positions 1..3 ("x y z") removed
    assert out[2].text == "head tail2" and out[2].n_cut == 3
    assert out[3].text == "totally different words here"
    assert out[3].n_tokens == 4 and out[3].n_cut == 0


def test_cut_duplicated_spans_within_doc_repeat_and_full_cut(spark):
    """A span repeated INSIDE one doc is cut at its second occurrence
    (total-occurrence rule, not distinct-docs); a doc that is entirely a
    duplicate of an earlier doc is cut to the empty string."""
    df = _docs(
        spark,
        [(1, "a b c a b c"), (2, "a b c")],
    )
    out = {
        r.id: r
        for r in dedup.cut_duplicated_spans(df, width=3).collect()
    }
    # doc 1: windows at pos 0..3; "a b c" occurs at pos 0 and 3 — pos 3's
    # copy is cut (positions 3,4,5). Overlapping windows ("b c a" etc.)
    # occur once each and cut nothing.
    assert out[1].text == "a b c" and out[1].n_cut == 3
    # doc 2 duplicates doc 1's canonical span entirely
    assert out[2].text == "" and out[2].n_cut == 3 and out[2].n_tokens == 3


def test_linear_quality_scores_explicit_weights(spark):
    """Score = (bias + sum of feature-bucket weights) / (1000 * n_feats)
    with an explicit tiny weight table; featureless docs get the bare
    bias and still appear in the output."""
    from logsight_filebeat_spark.functions.hashing import seeded_hash32
    from logsight_filebeat_spark.operators.curation import (
        hashed_features,
        linear_quality_scores,
    )

    df = _docs(spark, [(1, "Good good"), (2, "")])
    # doc 1 features: unigrams [good, good] + bigram [good_good]
    feats = [
        r.feat for r in hashed_features(df).filter(F.col("id") == 1).collect()
    ]
    assert sorted(feats) == ["good", "good", "good_good"]

    dim = 8
    buckets = {
        r.feat: r.b
        for r in spark.createDataFrame(
            [("good",), ("good_good",)], "feat string"
        )
        .select("feat", (seeded_hash32(F.col("feat"), 0) % dim).alias("b"))
        .collect()
    }
    w = {buckets["good"]: 500, buckets["good_good"]: -100}
    weights = spark.createDataFrame(
        [(b, w.get(b, 0)) for b in range(dim)], "bucket bigint, w_milli bigint"
    )
    out = {
        r.id: r
        for r in linear_quality_scores(
            df, weights, dim=dim, bias_milli=100, threshold=0.2
        ).collect()
    }
    if buckets["good"] == buckets["good_good"]:  # collision: both 500
        expected = round((100 + 3 * 500) / 3000.0, 6)
    else:
        expected = round((100 + 500 + 500 - 100) / 3000.0, 6)
    assert out[1].n_feats == 3 and out[1].score == expected
    assert out[1].keep == (expected >= 0.2)
    assert out[2].n_feats == 0 and out[2].score == 0.1 and not out[2].keep


def test_linear_quality_scores_weights_broadcast(spark):
    """The weight vector must ride a broadcast hash join — the corpus side
    never shuffles for the weight lookup."""
    from logsight_filebeat_spark.operators.curation import (
        linear_quality_scores,
    )

    df = _docs(spark, [(1, "a b c"), (2, "d e")])
    plan = (
        linear_quality_scores(df, dim=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bucket-keyed weight lookup broadcasts; the final per-id outer
    # join back to the doc base may legitimately shuffle on id
    assert "BroadcastHashJoin [bucket" in plan
    assert "SortMergeJoin [bucket" not in plan


def test_temperature_rates_and_resample(spark):
    """Smallest stratum keeps 100%; a 4x stratum at alpha=0.5 keeps
    sqrt(1/4)=50% of buckets; alpha=1 preserves the natural mixture
    (every threshold = SAMPLE_BUCKETS); membership is stable under
    repartitioning."""
    from logsight_filebeat_spark.operators import sampling as smp

    rows = [(i, "x", "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    rates = {
        r.lang: r.thresh
        for r in smp.temperature_rates(df, "lang", alpha=0.5).collect()
    }
    assert rates["small"] == smp.SAMPLE_BUCKETS
    assert rates["big"] == int(round((20 / 80) ** 0.5, 6) * smp.SAMPLE_BUCKETS)

    natural = {
        r.thresh for r in smp.temperature_rates(df, "lang", alpha=1.0).collect()
    }
    assert natural == {smp.SAMPLE_BUCKETS}

    kept = {
        r.doc_id for r in smp.temperature_resample(df, "lang").collect()
    }
    kept_repart = {
        r.doc_id
        for r in smp.temperature_resample(df.repartition(7), "lang").collect()
    }
    assert kept == kept_repart
    # all of the smallest stratum survives
    assert {i for i in range(80, 100)} <= kept


def test_incremental_dedup_four_stages(spark):
    # existing corpus: doc 1 (kept earlier), doc 2 near-dup anchor
    existing = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
    )
    incoming = _docs(
        spark,
        [
            # (a) exact dup WITHIN incoming — 10 survives (min id), 11 drops
            (10, "brand new unique document text here"),
            (11, "brand new unique document text here"),
            # (b) exact dup of existing doc 1 — drops at the anti-join
            (12, "alpha beta gamma delta epsilon zeta"),
            # (c) near-dup of existing doc 2: different raw text (double
            # space ⇒ different md5, survives the exact anti-join) but
            # identical token shingles ⇒ identical buckets ⇒ probe drop
            (13, "one  two three four five six seven"),
            # (d) genuinely new
            (14, "totally unrelated fresh content words"),
        ],
    )
    kept = sorted(
        r.doc_id
        for r in dedup.incremental_dedup(
            existing, incoming, n=3, num_hashes=8, bands=2
        ).collect()
    )
    assert kept == [10, 14]
    # empty incoming stays empty; full-overlap incoming drops everything
    assert (
        dedup.incremental_dedup(existing, existing, n=3, num_hashes=8, bands=2).count()
        == 0
    )


def test_line_dedup_removes_hot_lines_keeps_order(spark):
    mk = lambda *lines: "\n".join(lines)
    df = _docs(
        spark,
        [
            (1, mk("COOKIE BANNER TEXT", "doc one body", "fin")),
            (2, mk("COOKIE BANNER TEXT", "doc two body")),
            (3, mk("doc three body", "COOKIE BANNER TEXT", "tail line x")),
            (4, mk("COOKIE BANNER TEXT")),  # all-boilerplate doc
        ],
    )
    out = {
        r.doc_id: (r.text, r.n_lines_cut)
        for r in dedup.line_dedup(df, min_doc_freq=3, min_line_chars=5).collect()
    }
    assert out[1] == ("doc one body\nfin", 1)  # "fin" < 5 chars: never hot
    assert out[2] == ("doc two body", 1)
    assert out[3] == ("doc three body\ntail line x", 1)
    assert out[4] == ("", 1)  # empty survivor, not a dropped row
    # below the doc-freq threshold nothing is cut
    intact = dedup.line_dedup(df, min_doc_freq=5, min_line_chars=5)
    assert intact.filter(F.col("n_lines_cut") > 0).count() == 0


def test_dsir_weights_favor_target_like_docs(spark):
    from logsight_filebeat_spark.operators import sampling as smp

    rows = [
        (1, "alpha beta alpha beta alpha beta"),   # target-like
        (2, "gamma delta gamma delta gamma delta"),  # raw-only
        (3, "alpha beta gamma delta"),               # mixed
        (4, ""),                                     # no grams
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # an INDEPENDENT target corpus (not a subset of raw) whose profile
    # matches doc 1 — the DSIR setting: steer raw toward a reference set
    target = spark.createDataFrame(
        [(100 + i, "alpha beta alpha beta alpha beta") for i in range(5)],
        "doc_id bigint, text string",
    )
    w = {r.doc_id: r for r in smp.dsir_log_weights(df, target).collect()}
    assert w[1].logw > 0       # pure target profile scores positive
    assert w[2].logw < w[1].logw and w[2].logw < 0  # target-absent profile
    assert w[2].logw < w[3].logw < w[1].logw        # mixed in between
    assert w[4].logw == 0.0 and w[4].n_grams == 0

    kept = {r.doc_id for r in smp.dsir_select(df, target).collect()}
    assert 1 in kept and 2 not in kept and 4 not in kept

    # repartition-stable (weights are content hashes + global counts)
    w2 = {
        r.doc_id: r.logw
        for r in smp.dsir_log_weights(df.repartition(5), target).collect()
    }
    assert w2 == {k: v.logw for k, v in w.items()}


def test_shard_assignments_deterministic_and_dense(spark):
    from logsight_filebeat_spark.operators import sampling as smp

    df = _docs(spark, [(i, f"t{i}") for i in range(200)])
    a = sorted(map(tuple, smp.shard_assignments(df, n_shards=8).collect()))
    b = sorted(
        map(tuple, smp.shard_assignments(df.repartition(13), n_shards=8).collect())
    )
    assert a == b  # permutation is a pure function of ids
    by_shard = {}
    for _id, shard, pos in a:
        assert 0 <= shard < 8
        by_shard.setdefault(shard, []).append(pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))  # dense 1..n


# ---------------------------------------------------------------------------
# weighted_sample (A-ES)
# ---------------------------------------------------------------------------


def _aes_key(doc_id, w, seed="aes:v1"):
    import hashlib

    h = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8], 16)
    return ((h + 1) / 4294967297.0) ** (1.0 / w)


def test_weighted_sample_matches_python_model_per_stratum(spark):
    from logsight_filebeat_spark.operators.sampling import weighted_sample

    rows = [(i, f"g{i % 3}", 10 + (i * 7) % 90) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    got = {
        (r.grp, r.doc_id, r.rank)
        for r in weighted_sample(
            df, k=4, weight_col="w", strata_col="grp"
        ).collect()
    }
    want = set()
    for g in ("g0", "g1", "g2"):
        members = [(i, w) for i, grp, w in rows if grp == g]
        ranked = sorted(members, key=lambda t: (-_aes_key(t[0], t[1]), t[0]))
        want |= {(g, i, r + 1) for r, (i, _) in enumerate(ranked[:4])}
    assert got == want


def test_weighted_sample_global_and_weight_monotonicity(spark):
    from logsight_filebeat_spark.operators.sampling import weighted_sample

    rows = [(i, 1 if i < 900 else 1000) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    picked = [r.doc_id for r in weighted_sample(df, k=50, weight_col="w").collect()]
    assert len(picked) == 50
    # the 100 heavy rows (1000× weight) should dominate the sample
    assert sum(1 for i in picked if i >= 900) > 40
    # zero/negative weights are never sampleable
    rows2 = [(1, 0), (2, -5), (3, 10)]
    df2 = spark.createDataFrame(rows2, "doc_id long, w long")
    assert [r.doc_id for r in weighted_sample(df2, k=3, weight_col="w").collect()] == [3]


def test_weighted_sample_stable_under_repartition(spark):
    from logsight_filebeat_spark.operators.sampling import weighted_sample

    rows = [(i, f"s{i % 2}", 1 + i % 13) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    a = sorted(
        (r.grp, r.doc_id, r.rank)
        for r in weighted_sample(
            df.repartition(1), k=6, weight_col="w", strata_col="grp"
        ).collect()
    )
    b = sorted(
        (r.grp, r.doc_id, r.rank)
        for r in weighted_sample(
            df.repartition(11), k=6, weight_col="w", strata_col="grp"
        ).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# stratified quantiles + CCNet buckets
# ---------------------------------------------------------------------------


def _terciles(scores):
    import math

    n = len(scores)
    s = sorted(scores)
    r1, r2 = math.ceil(n / 3), math.ceil(2 * n / 3)
    return s[r1 - 1], s[r2 - 1]


def test_stratified_quantile_thresholds_match_python_model(spark):
    from logsight_filebeat_spark.operators.sampling import (
        stratified_quantile_thresholds,
    )

    rows = [(i, f"g{i % 3}", float((i * 37) % 100)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    got = {
        (r.grp, r.q_num): r.threshold
        for r in stratified_quantile_thresholds(df, "grp", "score").collect()
    }
    for g in ("g0", "g1", "g2"):
        t1, t2 = _terciles([s for _, grp, s in rows if grp == g])
        assert got[(g, 1)] == t1 and got[(g, 2)] == t2


def test_ccnet_buckets_label_by_stratum_terciles(spark):
    from logsight_filebeat_spark.operators.sampling import ccnet_buckets

    rows = [(i, "a" if i < 90 else "b", float(i)) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    got = {r.id: r.bucket for r in ccnet_buckets(df, "grp", "score").collect()}
    assert len(got) == 120
    # stratum a: scores 0..89 → terciles at 29/59
    assert got[0] == "tail" and got[29] == "tail"
    assert got[30] == "middle" and got[59] == "middle"
    assert got[60] == "head" and got[89] == "head"
    # stratum b: scores 90..119 → terciles at 99/109
    assert got[90] == "tail" and got[99] == "tail"
    assert got[100] == "middle" and got[109] == "middle"
    assert got[110] == "head" and got[119] == "head"


def test_ccnet_buckets_ties_take_lower_bucket_and_repartition_stable(spark):
    from logsight_filebeat_spark.operators.sampling import ccnet_buckets

    # one stratum, 9 rows, all-equal scores: everything ties at the
    # tercile thresholds and must land in the LOWEST bucket
    df = spark.createDataFrame([(i, "g", 5.0) for i in range(9)], "id long, grp string, score double")
    got = {r.bucket for r in ccnet_buckets(df, "grp", "score").collect()}
    assert got == {"tail"}
    rows = [(i, f"g{i % 2}", float((i * 13) % 50)) for i in range(200)]
    df2 = spark.createDataFrame(rows, "id long, grp string, score double")
    a = sorted((r.id, r.bucket) for r in ccnet_buckets(df2.repartition(1), "grp", "score").collect())
    b = sorted((r.id, r.bucket) for r in ccnet_buckets(df2.repartition(16), "grp", "score").collect())
    assert a == b


def test_pmi_collocations_match_python_model(spark):
    import math
    from collections import Counter

    from logsight_filebeat_spark.operators.curation import pmi_collocations

    docs = [
        (1, "new york new york city hall"),
        (2, "san francisco bay area san francisco"),
        (3, "new york is not san francisco at all"),
        (4, "the city the bay the hall the area"),
    ] * 3
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = [t for _, s in docs for t in s.split()]
    uni = Counter(toks)
    bis = Counter()
    for _, s in docs:
        w = s.split()
        bis.update(f"{a} {b}" for a, b in zip(w, w[1:]))
    nu, nb = sum(uni.values()), sum(bis.values())
    want = []
    for bg, c in bis.items():
        if c < 3:
            continue
        w1, w2 = bg.split(" ")
        pmi = round(
            math.log(c) + 2 * math.log(nu) - math.log(nb)
            - math.log(uni[w1]) - math.log(uni[w2]),
            6,
        )
        want.append((bg, c, pmi))
    want.sort(key=lambda t: (-t[2], t[0]))
    got = [
        (r.bigram, r.cnt, r.pmi, r.rank)
        for r in pmi_collocations(df, min_count=3, k=5).orderBy("rank").collect()
    ]
    assert got == [(bg, c, p, i + 1) for i, (bg, c, p) in enumerate(want[:5])]
    # sticky pairs must outscore promiscuous stopword pairs: every "the X"
    # bigram (the appears with 4 different successors) scores below the
    # exclusive pairs that top the ranking
    the_pmis = [p for bg, c, p in want if bg.startswith("the ")]
    assert the_pmis and max(the_pmis) < got[0][2]


def test_js_divergence_python_model_symmetry_and_zero(spark):
    import math
    from collections import Counter

    from logsight_filebeat_spark.operators.curation import (
        JSD_SCALE,
        js_divergence,
    )

    a_docs = [(1, "a a b c"), (2, "a b b d")]
    b_docs = [(3, "c c d e"), (4, "e e a c")]
    a = spark.createDataFrame(a_docs, "doc_id long, text string")
    b = spark.createDataFrame(b_docs, "doc_id long, text string")

    def dist(docs):
        c = Counter(t for _, s in docs for t in s.split())
        n = sum(c.values())
        return c, n

    ca, na = dist(a_docs)
    cb, nb = dist(b_docs)
    total = 0
    for tok in set(ca) | set(cb):
        p, q = ca[tok] / na, cb[tok] / nb
        m = (p + q) / 2
        term = (p * math.log(p / m) if p else 0.0) + (
            q * math.log(q / m) if q else 0.0
        )
        total += int(round(term * JSD_SCALE))
    want = round(total / (2 * JSD_SCALE), 6)

    row = js_divergence(a, b).first()
    assert (row.n_a, row.n_b) == (na, nb)
    assert row.vocab_union == len(set(ca) | set(cb))
    assert row.jsd == want
    assert 0.0 < row.jsd < math.log(2) + 1e-9
    # symmetry and identity
    assert js_divergence(b, a).first().jsd == row.jsd
    assert js_divergence(a, a).first().jsd == 0.0
    # partitioning independence (the exact-integer sum guarantee)
    assert (
        js_divergence(a.repartition(7), b.repartition(5)).first().jsd == row.jsd
    )


def test_lm_familiarity_external_model_scores_oov_as_zero(spark):
    """Round-4 regression: with an EXTERNAL model, OOV bigrams must pull
    the familiarity mean DOWN (count 0) and n_bigrams must count every
    bigram — an inner join would average only the matched ones and
    inflate exactly the garbled docs the fluency gate exists to reject."""
    from logsight_filebeat_spark.operators.curation import lm_familiarity

    model = spark.createDataFrame([("a b", 5)], "bigram string, cnt bigint")
    df = spark.createDataFrame(
        [(1, "a b"), (2, "x y z"), (3, "a b q")],
        "doc_id bigint, text string",
    )
    got = {
        r.id: (r.n_bigrams, r.familiarity)
        for r in lm_familiarity(df, model=model).collect()
    }
    assert got == {
        1: (1, 5.0),     # fully in-model
        2: (2, 0.0),     # fully OOV → floor, not excluded
        3: (2, 2.5),     # (5 + 0) / 2 — OOV dilutes, not inflates
    }


def test_incremental_dedup_replays_persisted_index_identically(spark):
    """Production replays a stored (hash, bucket) index instead of
    re-minhashing the kept corpus — the injected-index path must keep the
    exact same rows as in-place derivation, and must never touch the
    existing corpus' text (it works even when `existing` is unusable)."""
    existing = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
    )
    incoming = _docs(
        spark,
        [
            (10, "brand new unique document text here"),
            (12, "alpha beta gamma delta epsilon zeta"),
            (13, "one  two three four five six seven"),
            (14, "totally unrelated fresh content words"),
        ],
    )
    hashes, buckets = dedup.existing_index(existing, n=3, num_hashes=8, bands=2)
    direct = sorted(
        r.doc_id
        for r in dedup.incremental_dedup(
            existing, incoming, n=3, num_hashes=8, bands=2
        ).collect()
    )
    # existing=None proves the text is never consulted on the replay path
    replay = sorted(
        r.doc_id
        for r in dedup.incremental_dedup(
            None,
            incoming,
            n=3,
            num_hashes=8,
            bands=2,
            existing_hashes=hashes,
            existing_buckets=buckets,
        ).collect()
    )
    assert direct == replay == [10, 14]


def test_group_split_no_group_straddles(spark):
    """Every group lands wholly on one side (the leakage guard), sides are
    disjoint+exhaustive, NULL groups go to train, split is repartition-
    stable."""
    from logsight_filebeat_spark.operators.sampling import group_split

    rows = [(i, f"host{i % 37}") for i in range(500)] + [(999, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, host string")
    train, val = group_split(df, "host", val_fraction=0.3, seed="s1")
    t = {(r.doc_id, r.host) for r in train.collect()}
    v = {(r.doc_id, r.host) for r in val.collect()}
    assert t | v == {(i, f"host{i % 37}") for i in range(500)} | {(999, None)}
    assert not (t & v)
    assert (999, None) in t  # NULL group defaults to train
    t_hosts = {h for _, h in t if h is not None}
    v_hosts = {h for _, h in v}
    assert not (t_hosts & v_hosts)  # no host on both sides
    assert v_hosts  # the 30% draw over 37 hosts is non-empty
    # stable under repartitioning
    t2, v2 = group_split(df.repartition(7), "host", 0.3, "s1")
    assert {(r.doc_id, r.host) for r in v2.collect()} == v


def test_snapshot_diff_statuses(spark):
    from logsight_filebeat_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "dropped")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "fresh")],
        "url string, text string",
    )
    got = {r.url: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "gone",
        "u4": "new",
    }


def test_containment_catches_subset_duplication_jaccard_misses(spark):
    """A short doc fully embedded in a long one: containment = 1.0 while
    Jaccard = |A|/|B| sits below any reasonable gate — the measure exists
    precisely for this case. id_small must be the embedded (smaller) doc."""
    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"word{i}" for i in range(40))
    df = _docs(spark, [(1, short), (2, short + " " + filler)])

    pairs = dedup.containment_pairs(df, n=3, threshold=0.9, max_doc_freq=None)
    [r] = pairs.collect()
    assert (r.id_small, r.id_big, r.containment) == (1, 2, 1.0)

    # the same pair scores far below a Jaccard gate
    jp = dedup.jaccard_pairs(df, n=3, threshold=0.0, max_doc_freq=None)
    [j] = jp.collect()
    assert j.jaccard < 0.1

    # non-overlapping docs emit nothing
    df2 = _docs(spark, [(1, "a b c d e"), (2, "v w x y z")])
    assert dedup.containment_pairs(df2, n=3, threshold=0.1).count() == 0


def test_rendezvous_shard_minimal_movement(spark):
    """The HRW guarantee: growing n_shards 8 → 9, every moved key moves TO
    the new shard (9th, index 8), and ~1/9 of keys move — vs mod-n where
    ~8/9 reshuffle. Assignment is a pure function of the id (repartition-
    stable) and always lands in [0, n)."""
    from logsight_filebeat_spark.operators.sampling import rendezvous_shard

    df = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id bigint"
    )
    rows = df.select(
        "doc_id",
        rendezvous_shard("doc_id", 8).alias("s8"),
        rendezvous_shard("doc_id", 9).alias("s9"),
    ).collect()
    assert all(0 <= r.s8 < 8 and 0 <= r.s9 < 9 for r in rows)
    moved = [r for r in rows if r.s8 != r.s9]
    assert all(r.s9 == 8 for r in moved)  # moves only TO the new shard
    frac = len(moved) / len(rows)
    assert 0.06 < frac < 0.17  # ≈ 1/9, loose band
    # contrast: mod-n moves ~8/9 of keys on the same growth
    mod_moved = sum(1 for r in rows if r.doc_id % 8 != r.doc_id % 9)
    assert mod_moved / len(rows) > 0.8
    # repartition-stable
    again = {
        r.doc_id: r.s8
        for r in df.repartition(7)
        .select("doc_id", rendezvous_shard("doc_id", 8).alias("s8"))
        .collect()
    }
    assert again == {r.doc_id: r.s8 for r in rows}


def test_lsh_plan_s_curve_optimization():
    """The planner picks a factorization whose S-curve midpoint
    (1/b)^(1/r) tracks the target threshold: higher thresholds get more
    rows per band (steeper, right-shifted curves); degenerate and
    out-of-range inputs refuse."""
    import pytest

    from logsight_filebeat_spark.operators.dedup import lsh_plan

    b8, r8 = lsh_plan(0.8, num_hashes=128)
    assert b8 * r8 == 128
    mid8 = (1 / b8) ** (1 / r8)
    assert abs(mid8 - 0.8) < 0.15

    b3, r3 = lsh_plan(0.3, num_hashes=128)
    assert b3 * r3 == 128
    assert r3 < r8  # lower threshold → shallower curve → fewer rows
    assert (1 / b3) ** (1 / r3) < mid8

    # the repo's own default banding (8 hashes, 2 bands → r=4) is what the
    # planner picks for a mid-high threshold at that budget
    assert lsh_plan(0.72, num_hashes=8) == (2, 4)

    with pytest.raises(ValueError):
        lsh_plan(0.0)
    with pytest.raises(ValueError):
        lsh_plan(1.0)


def test_mixture_plan_compiles_weights_to_rates_and_epochs(spark):
    from logsight_filebeat_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("web", "a b c d"), ("web", "e f"), ("wiki", "g h i"), ("junk", "z")],
        "source string, text string",
    )
    got = {
        r.source: r
        for r in mixture_plan(
            df, {"web": 3.0, "wiki": 1.0}, budget_tokens=12
        ).collect()
    }
    web, wiki, junk = got["web"], got["wiki"], got["junk"]
    assert (web.n_docs, web.tokens) == (2, 6)
    assert web.target_share == 0.75 and web.tokens_needed == 9
    assert web.rate == 1.5 and web.epochs == 2  # upsample: repeat twice
    assert wiki.tokens_needed == 3 and wiki.rate == 1.0 and wiki.epochs == 1
    assert junk.target_share == 0.0 and junk.rate == 0.0 and junk.epochs == 0
    # weights normalize: same plan if given as (0.75, 0.25)
    again = {
        r.source: (r.rate, r.epochs)
        for r in mixture_plan(
            df, {"web": 0.75, "wiki": 0.25}, budget_tokens=12
        ).collect()
    }
    assert again == {s: (r.rate, r.epochs) for s, r in got.items()}


def test_domain_quality_rollup_and_blocklist(spark):
    from logsight_filebeat_spark.operators.curation import (
        apply_domain_blocklist,
        domain_quality,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "in the park with many words of plain prose to read aloud"
    )
    spam = "# " * 30 + "buy now"
    rows = (
        [(f"https://good.example/{i}", good) for i in range(4)]
        + [(f"https://spam.example/{i}", spam) for i in range(4)]
        # mixed host: 1 good page + 3 spam -> pass_rate 0.25 -> blocked
        + [("https://mixed.example/0", good)]
        + [(f"https://mixed.example/{i}", spam) for i in range(1, 4)]
        # tiny host: all spam but only 2 pages -> below min_pages, spared
        + [(f"https://tiny.example/{i}", spam) for i in range(2)]
    )
    pg = spark.createDataFrame(rows, "url string, text string")
    q = domain_quality(pg, min_words=20, min_pages=3, min_pass_rate=0.5)
    got = {r.host: r for r in q.collect()}
    assert got["good.example"].n_pages == 4
    assert got["good.example"].n_pass == 4
    assert got["good.example"].pass_rate == 1.0
    assert not got["good.example"].blocked
    assert got["spam.example"].blocked
    assert got["mixed.example"].pass_rate == 0.25
    assert got["mixed.example"].blocked
    assert got["tiny.example"].n_pass == 0
    assert not got["tiny.example"].blocked  # min_pages mercy
    # integral sums: alpha_frac from exact integer totals
    assert got["good.example"].sum_words == got["good.example"].sum_alpha_words
    kept = apply_domain_blocklist(pg, q)
    hosts = {r.url.split("/")[2] for r in kept.select("url").collect()}
    assert hosts == {"good.example", "tiny.example"}
    assert kept.count() == 6
    assert kept.columns == pg.columns  # helper column dropped
    # blocklist side broadcasts: corpus never shuffles for the anti-join
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_compaction_plan_bands_and_order(spark):
    import pyspark.sql.functions as F

    from logsight_filebeat_spark.operators.layout import compaction_plan

    rows = [
        ("p1", "f1", 9), ("p1", "f2", 9), ("p1", "f3", 9), ("p1", "f4", 9),
        ("p1", "f5", 12),  # >= target: dropped by small_only
        ("p2", "f1", 3),
    ]
    df = spark.createDataFrame(rows, "part string, file string, bytes long")
    plan = compaction_plan(
        df, target_bytes=10, partition_col="part"
    ).collect()
    got = {(r.part, r.grp): (r.grp_bytes, r.n_files, r.files) for r in plan}
    # prev sums in p1: 0,9,18,27 -> grps 0,0,1,2 (floor bands)
    assert got[("p1", 0)] == (18, 2, "f1|f2")
    assert got[("p1", 1)] == (9, 1, "f3")
    assert got[("p1", 2)] == (9, 1, "f4")
    assert ("p1", 3) not in got  # the big file was excluded
    assert got[("p2", 0)] == (3, 1, "f1")
    # keep-big-files mode: f5 forms its own band
    plan_all = compaction_plan(
        df, target_bytes=10, partition_col="part", small_only=False
    ).collect()
    by_file = {
        (r.part, r.grp): r.files for r in plan_all if "f5" in r.files
    }
    assert any("f5" in fs for fs in by_file.values())
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compaction_plan(df, target_bytes=0)


def test_classifier_calibration_confusion_counts(spark):
    from logsight_filebeat_spark.operators.curation import (
        classifier_calibration,
    )

    rows = [
        (0.5, True), (0.5, False), (-0.5, True), (-0.5, False),
        (0.0, True),
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = {
        r.threshold: r
        for r in classifier_calibration(
            df, "label", thresholds=(0.0, 1.0)
        ).collect()
    }
    t0 = got[0.0]  # keep: 0.5,0.5,0.0 -> tp=2 (0.5T,0.0T) fp=1 fn=1 tn=1
    assert (t0.tp, t0.fp, t0.fn, t0.tn) == (2, 1, 1, 1)
    assert t0.precision == round(2 / 3, 6) and t0.recall == round(2 / 3, 6)
    assert t0.f1 == round(2 / 3, 6)
    t1 = got[1.0]  # nothing kept
    assert (t1.tp, t1.fp, t1.fn, t1.tn) == (0, 0, 3, 2)
    assert t1.precision == 0.0 and t1.recall == 0.0 and t1.f1 == 0.0


def test_stride_interleave_even_merge(spark):
    from logsight_filebeat_spark.operators.sampling import stride_interleave

    rows = [(i, "a") for i in range(6)] + [(i + 100, "b") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stride_interleave(df, "source", {"a": 2, "b": 1}).collect()
    order = [
        r.source
        for r in sorted(out, key=lambda r: (r.interleave_key, r.source, r.doc_id))
    ]
    # a at rate 2, b at rate 1: pattern ~ a b a a b a a b a
    assert order == ["a", "b", "a", "a", "b", "a", "a", "b", "a"]
    # unknown sources are dropped, bad weights rejected
    df2 = df.withColumn("source", F.lit("zz"))
    assert stride_interleave(df2, "source", {"a": 1}).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        stride_interleave(df, "source", {"a": 0})


def test_snapshot_expiry_plan_policy(spark):
    import datetime as dt

    from logsight_filebeat_spark.operators.layout import snapshot_expiry_plan

    base = dt.datetime(2025, 6, 1, 0, 0, 0)
    rows = []
    sid = 0
    # 10 days, 3 snapshots/day (08:00, 12:00, 20:00)
    for d in range(10):
        for h in (8, 12, 20):
            rows.append((sid, base + dt.timedelta(days=d, hours=h)))
            sid += 1
    df = spark.createDataFrame(rows, "snapshot_id long, ts timestamp")
    got = {
        r.snapshot_id: r.reason
        for r in snapshot_expiry_plan(df, retain_last=5, daily_days=7).collect()
    }
    # newest 5 by ts: ids 29,28,27,26,25
    for i in (29, 28, 27, 26, 25):
        assert got[i] == "kept_last", i
    # newest-of-day within 7 days of the max (days 3..9): ids 11,14,...;
    # day 9's newest (29) already kept_last; day 3's newest is id 11
    assert got[11] == "kept_daily" and got[14] == "kept_daily"
    # old days (0-2) and non-newest snapshots expire
    assert got[2] == "expire" and got[0] == "expire" and got[12] == "expire"
    # every snapshot labeled, exactly once
    assert len(got) == 30
    import pytest as _pytest

    with _pytest.raises(ValueError):
        snapshot_expiry_plan(df, retain_last=-1)


def test_scd2_history_intervals(spark):
    # snapshots 1..3: A unchanged throughout; B changes at 2; C deleted at 2
    # and reappears at 3 with IDENTICAL attrs (gap => new interval); D only
    # in 2 (closed, not current); E appears first at 3 (current)
    rows = spark.createDataFrame(
        [
            ("A", 1, "a"), ("A", 2, "a"), ("A", 3, "a"),
            ("B", 1, "b1"), ("B", 2, "b2"), ("B", 3, "b2"),
            ("C", 1, "c"), ("C", 3, "c"),
            ("D", 2, "d"),
            ("E", 3, "e"),
        ],
        "url string, snap int, text string",
    )
    out = {
        (r.url, r.valid_from): r
        for r in dedup.scd2_history(rows).collect()
    }
    assert len(out) == 7
    a = out[("A", 1)]
    assert (a.valid_to, a.is_current, a.n_snapshots) == (None, True, 3)
    b1, b2 = out[("B", 1)], out[("B", 2)]
    assert (b1.valid_to, b1.is_current) == (2, False)
    assert (b2.valid_to, b2.is_current) == (None, True)
    assert b1.version_hash != b2.version_hash
    c1, c3 = out[("C", 1)], out[("C", 3)]
    assert (c1.valid_to, c1.is_current) == (2, False)  # gap closes at 2
    assert (c3.valid_to, c3.is_current) == (None, True)
    assert c1.version_hash == c3.version_hash  # same attrs, separate runs
    d = out[("D", 2)]
    assert (d.valid_to, d.is_current) == (3, False)
    e = out[("E", 3)]
    assert (e.valid_to, e.is_current) == (None, True)


def test_scd2_history_null_attr_and_multi_attr(spark):
    # NULL attribute values fingerprint null-safely: NULL -> 'x' is a
    # version change, and two attr columns both feed the fingerprint
    rows = spark.createDataFrame(
        [("K", 1, None, "m"), ("K", 2, "x", "m"), ("K", 3, "x", "n")],
        "url string, snap int, a string, b string",
    )
    out = sorted(
        dedup.scd2_history(rows, attr_cols=("a", "b")).collect(),
        key=lambda r: r.valid_from,
    )
    assert [(r.valid_from, r.valid_to) for r in out] == [
        (1, 2), (2, 3), (3, None)
    ]


# ---------------------------------------------------------------------------
# apply_changes (CDC merge-apply)
# ---------------------------------------------------------------------------

def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "url string, seq bigint, op string, text string"
    )


def test_apply_changes_latest_upsert_wins(spark):
    out = dedup.apply_changes(
        _changes(
            spark,
            [
                ("a", 1, "upsert", "v1"),
                ("a", 2, "upsert", "v2"),
                ("b", 1, "upsert", "only"),
            ],
        )
    ).collect()
    state = {r.url: (r.text, r.last_seq, r.n_changes) for r in out}
    assert state == {"a": ("v2", 2, 2), "b": ("only", 1, 1)}


def test_apply_changes_delete_last_removes_key(spark):
    out = dedup.apply_changes(
        _changes(
            spark,
            [
                ("a", 1, "upsert", "v1"),
                ("a", 2, "delete", ""),
                ("b", 1, "delete", ""),
            ],
        )
    ).collect()
    assert out == []


def test_apply_changes_reinsert_after_delete(spark):
    [r] = dedup.apply_changes(
        _changes(
            spark,
            [
                ("a", 1, "upsert", "v1"),
                ("a", 2, "delete", ""),
                ("a", 3, "upsert", "back"),
            ],
        )
    ).collect()
    assert (r.url, r.text, r.last_seq, r.n_changes) == ("a", "back", 3, 3)


def test_apply_changes_plan_is_single_partial_aggregate(spark):
    # the merge must be ONE hash aggregate with map-side partial agg —
    # no window (which would shuffle every raw change before ranking)
    df = dedup.apply_changes(_changes(spark, [("a", 1, "upsert", "v1")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") <= 1


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------

def test_ngram_novelty_first_doc_owns_everything(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),       # grams: abc, bcd — all first
            (2, "alpha beta gamma delta"),       # exact echo: novelty 0
            (3, "alpha beta gamma NEW tail here"),  # mixes seen + new grams
            (4, "xs"),                           # < n tokens: (0, 0, 0.0)
        ],
    )
    out = {r.id: (r.n_grams, r.n_novel, r.novelty) for r in
           dedup.ngram_novelty(df, n=3).collect()}
    assert out[1] == (2, 2, 1.0)
    assert out[2] == (2, 0, 0.0)
    assert out[4] == (0, 0, 0.0)
    n_grams, n_novel, nov = out[3]
    assert n_grams == 4 and 0 < n_novel < 4
    assert nov == round(n_novel / n_grams, 6)


# ---------------------------------------------------------------------------
# cdc_chunks (content-defined chunking)
# ---------------------------------------------------------------------------

def test_cdc_chunks_cover_and_resync(spark):
    base = "one two three four five six seven eight nine ten " * 5
    edited = "INSERTED " + base  # one-token prefix edit
    df = _docs(spark, [(1, base), (2, edited)])
    out = dedup.cdc_chunks(df, avg_words=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.id, []).append((r.chunk_idx, r.n_words, r.chunk_hash))
    # chunks tile the doc: word counts sum to token count, idx contiguous 0..k
    for doc_id, text in [(1, base), (2, edited)]:
        chunks = sorted(by_doc[doc_id])
        assert sum(n for _, n, _ in chunks) == len(text.split())
        assert [c for c, _, _ in chunks] == list(range(len(chunks)))
    # content-defined: after the edit's own chunk, hashes resync — the
    # edited doc shares all but at most one of the base doc's chunk hashes
    h1 = [h for _, _, h in sorted(by_doc[1])]
    h2 = [h for _, _, h in sorted(by_doc[2])]
    assert len(set(h1) - set(h2)) <= 1
    # repeated content produces repeated chunk hashes (the dedup signal)
    assert len(set(h1)) < len(h1)


# ---------------------------------------------------------------------------
# poisson_bootstrap
# ---------------------------------------------------------------------------

def test_poisson_bootstrap_is_deterministic_and_sane(spark):
    from logsight_filebeat_spark.operators.sampling import poisson_bootstrap

    df = _docs(spark, [(i, "x") for i in range(200)]).select(
        "doc_id", (F.col("doc_id") % 10).cast("double").alias("v")
    )
    out1 = sorted(map(tuple, poisson_bootstrap(df, "v", n_reps=20).collect()))
    out2 = sorted(map(tuple, poisson_bootstrap(df, "v", n_reps=20).collect()))
    assert out1 == out2                      # pure function of (seed, rep, id)
    assert len(out1) == 20
    true_mean = sum(i % 10 for i in range(200)) / 200
    means = [m for _, _, m in out1]
    n_effs = [n for _, n, _ in out1]
    # resample sizes concentrate around n (Poisson(1) multiplicities)
    assert all(150 < n < 250 for n in n_effs)
    # replicate means scatter AROUND the truth and are not all identical
    assert min(means) < true_mean < max(means)
    assert abs(sum(means) / len(means) - true_mean) < 0.5


# ---------------------------------------------------------------------------
# mirror_candidates
# ---------------------------------------------------------------------------

def test_mirror_candidates_pairs_and_cap(spark):
    rows = []
    for i in range(10):
        rows.append(("site-a", f"page {i}"))
        rows.append(("mirror-a", f"page {i}"))          # full mirror of a
    rows += [("site-b", f"other {i}") for i in range(10)]
    # boilerplate page served by EVERY host: must be capped out, else it
    # fabricates overlap between unrelated sites
    for h in ("site-a", "mirror-a", "site-b"):
        rows.append((h, "cookie banner"))
    df = spark.createDataFrame(rows, "host string, text string")
    out = dedup.mirror_candidates(
        df, threshold=0.5, max_hosts_per_hash=2
    ).collect()
    assert len(out) == 1
    [r] = out
    assert (r.host_a, r.host_b) == ("mirror-a", "site-a")
    assert r.common_pages == 10 and r.jaccard == 1.0


def test_normalized_dedup_best_groups_and_survivor(spark):
    from logsight_filebeat_spark.operators.dedup import normalized_dedup_best

    rows = [
        (1, "Hello   World", 13),   # normalizes like 2 and 3
        (2, "hello world", 11),
        (3, "HELLO\nWORLD", 20),    # richest copy → survives
        (4, "unrelated", 9),
        (5, "hello world", 11),     # ties 2 on score → min id 2... but 3 wins the group anyway
    ]
    out = normalized_dedup_best(
        spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")
    )
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [3, 4]


def test_normalized_dedup_best_tie_breaks_min_id(spark):
    from logsight_filebeat_spark.operators.dedup import normalized_dedup_best

    rows = [(7, "a  b", 5), (2, "A B", 5)]
    out = normalized_dedup_best(
        spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")
    )
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_bloom_gate_dedup_verdicts_and_no_false_negatives(spark):
    from logsight_filebeat_spark.operators.dedup import bloom_gate_dedup

    old = spark.createDataFrame(
        [(f"doc {i}",) for i in range(40)], "text string"
    )
    rows = [(i, f"doc {i}") for i in range(40)]          # all dups
    rows += [(100 + i, f"fresh {i}") for i in range(20)]  # all new
    new = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["verdict"] for r in bloom_gate_dedup(
        old, new, n_bits=256, n_hashes=4  # undersized → some new_fp
    ).collect()}
    assert len(got) == 60
    # NO false negatives: every true dup is verdict 'dup', never new_*
    assert all(got[i] == "dup" for i in range(40))
    # every fresh doc is new_certain or new_fp, never dup
    fresh = {got[100 + i] for i in range(20)}
    assert fresh <= {"new_certain", "new_fp"}
    assert "new_certain" in fresh
