"""BM25 / inverted-index retrieval (operators/retrieval.py).

Hand-computed BM25 oracle on a 4-doc corpus, plus plan-shape checks:
the query-term join must broadcast and the ranking window must
partition by query_id (no global single-task sort).
"""

from __future__ import annotations

import math

import pytest

from logsight_filebeat_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    doc_term_freqs,
    doc_tokens,
    term_doc_freqs,
)

DOCS = [
    (1, "spark join join hash"),
    (2, "spark window agg"),
    (3, "hash hash hash merge"),
    (4, "customer query plan"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_doc_tokens_and_tf(spark, docs):
    tf = {
        (r.doc_id, r.tok): r.tf
        for r in doc_term_freqs(doc_tokens(docs)).collect()
    }
    assert tf[(1, "join")] == 2
    assert tf[(3, "hash")] == 3
    assert tf[(2, "spark")] == 1
    assert (1, "window") not in tf


def test_term_doc_freqs(spark, docs):
    dfreq = {
        r.tok: r.df
        for r in term_doc_freqs(doc_term_freqs(doc_tokens(docs))).collect()
    }
    assert dfreq["spark"] == 2
    assert dfreq["hash"] == 2
    assert dfreq["merge"] == 1


def _bm25(tf: int, df: int, dl: int, n: int = 4, avgdl: float = 14 / 4,
          k1: float = 1.2, b: float = 0.75) -> float:
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (1 + k1)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_scores_hand_oracle(spark, docs):
    qt = spark.createDataFrame(
        [("q1", "spark"), ("q1", "hash")], "query_id string, tok string"
    )
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_scores(docs, qt).collect()
    }
    # doc 1: spark tf=1 + hash tf=1, dl=4; doc 2: spark tf=1, dl=3;
    # doc 3: hash tf=3, dl=4; doc 4: no match.
    exp1 = round(_bm25(1, 2, 4) + _bm25(1, 2, 4), 6)
    exp2 = round(_bm25(1, 2, 3), 6)
    exp3 = round(_bm25(3, 2, 4), 6)
    assert got[("q1", 1)] == pytest.approx(exp1, abs=2e-6)
    assert got[("q1", 2)] == pytest.approx(exp2, abs=2e-6)
    assert got[("q1", 3)] == pytest.approx(exp3, abs=2e-6)
    assert ("q1", 4) not in got


def test_bm25_topk_rank_and_tiebreak(spark, docs):
    qt = spark.createDataFrame(
        [("q1", "spark"), ("q1", "hash"), ("q2", "merge")],
        "query_id string, tok string",
    )
    rows = bm25_topk(docs, qt, k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id))
    assert sorted(by_q["q2"]) == [(1, 3)]
    ranks = sorted(by_q["q1"])
    assert len(ranks) == 2 and [r for r, _ in ranks] == [1, 2]
    # tie-break: equal rounded scores rank by doc_id ascending
    tie_docs = spark.createDataFrame(
        [(10, "alpha"), (5, "alpha"), (7, "beta")], "doc_id bigint, text string"
    )
    tq = spark.createDataFrame([("q", "alpha")], "query_id string, tok string")
    tie = sorted((r.rank, r.doc_id) for r in bm25_topk(tie_docs, tq, k=5).collect())
    assert tie == [(1, 5), (2, 10)]


def test_bm25_plan_broadcasts_queries(spark, docs):
    qt = spark.createDataFrame([("q1", "spark")], "query_id string, tok string")
    plan = bm25_topk(docs, qt)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the ranking window partitions on query_id — not a global sort
    assert "query_id" in plan


def test_rrf_fuse_hand_oracle(spark):
    from logsight_filebeat_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query_id string, doc_id bigint, rank int",
    )
    den = spark.createDataFrame(
        [("q", 2, 1), ("q", 4, 2)],
        "query_id string, doc_id bigint, rank int",
    )
    got = {r.doc_id: r for r in rrf_fuse([lex, den], k_rrf=60).collect()}
    # doc 2 appears in both lists → highest fused score
    assert got[2].rrf_score == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-9
    )
    assert got[1].rrf_score == pytest.approx(round(1 / 61, 6), abs=1e-9)
    assert got[4].rrf_score == pytest.approx(round(1 / 62, 6), abs=1e-9)
    assert got[2].rank == 1
    # single-list docs ranked by score then doc_id: 1/61 (doc 1) > 1/62
    # (doc 4) > 1/63 (doc 3)
    assert [got[i].rank for i in (1, 4, 3)] == [2, 3, 4]


def test_rrf_fuse_topk_and_partition_stability(spark):
    from logsight_filebeat_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [("q", i, i) for i in range(1, 20)],
        "query_id string, doc_id bigint, rank int",
    )
    den = spark.createDataFrame(
        [("q", 100 - i, i) for i in range(1, 20)],
        "query_id string, doc_id bigint, rank int",
    )
    a = sorted(
        (r.query_id, r.doc_id, r.rrf_score, r.rank)
        for r in rrf_fuse([lex, den], topk=5).collect()
    )
    b = sorted(
        (r.query_id, r.doc_id, r.rrf_score, r.rank)
        for r in rrf_fuse(
            [lex.repartition(7), den.repartition(3)], topk=5
        ).collect()
    )
    assert a == b and len(a) == 5


def test_negative_samples_share_no_query_terms_and_are_stable(spark):
    from logsight_filebeat_spark.operators.retrieval import negative_samples

    docs = spark.createDataFrame(
        [
            (1, "spark join merge plans"),
            (2, "hash window agg run"),
            (3, "totally unrelated words"),
            (4, "more unrelated content here"),
            (5, "spark appears here too"),
            (6, "nothing in common at all"),
        ],
        "doc_id long, text string",
    )
    qt = spark.createDataFrame(
        [("q1", "spark"), ("q1", "join"), ("q2", "hash")],
        "query_id string, tok string",
    )
    got = {
        (r.query_id, r.doc_id)
        for r in negative_samples(docs, qt, k=10).collect()
    }
    # q1 negatives exclude docs 1 and 5 (contain spark/join), q2 excludes 2
    assert {d for q, d in got if q == "q1"} == {2, 3, 4, 6}
    assert {d for q, d in got if q == "q2"} == {1, 3, 4, 5, 6}
    # deterministic under repartitioning
    again = {
        (r.query_id, r.doc_id, r.rank)
        for r in negative_samples(docs.repartition(5), qt, k=10).collect()
    }
    first = {
        (r.query_id, r.doc_id, r.rank)
        for r in negative_samples(docs, qt, k=10).collect()
    }
    assert again == first


def test_phrase_match_hand_oracle(spark):
    """Exact-phrase semantics: consecutive positions only, duplicate
    phrase tokens stay exact, overlapping occurrences each count, case
    folds, bag-of-words co-occurrence does NOT match."""
    from logsight_filebeat_spark.operators.retrieval import phrase_match

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "brown the quick"),        # tokens present, order wrong
            (3, "THE QUICK the quick x"),  # two occurrences, mixed case
            (4, "aa aa aa"),               # overlapping duplicate-token hits
            (5, "quick the"),              # reversed
        ],
        "doc_id bigint, text string",
    )
    phrases = spark.createDataFrame(
        [("p1", "the quick"), ("p2", "aa aa")],
        "query_id string, phrase string",
    )
    got = {
        (r.query_id, r.doc_id): (r.n_matches, r.first_pos)
        for r in phrase_match(docs, phrases).collect()
    }
    assert got == {
        ("p1", 1): (1, 0),
        ("p1", 2): (1, 1),   # "the quick" at positions 1-2
        ("p1", 3): (2, 0),   # both occurrences, case-insensitive
        ("p2", 4): (2, 0),   # "aa aa" anchors 0 and 1 overlap
    }


def test_phrase_match_positions_survive_whitespace_runs(spark):
    """\\s+ split leaves no interior empty tokens, so multi-space and
    tab-separated words stay position-adjacent."""
    from logsight_filebeat_spark.operators.retrieval import phrase_match

    docs = spark.createDataFrame(
        [(1, "alpha   beta\t\tgamma")], "doc_id bigint, text string"
    )
    phrases = spark.createDataFrame(
        [("p1", "alpha beta gamma")], "query_id string, phrase string"
    )
    [r] = phrase_match(docs, phrases).collect()
    assert (r.n_matches, r.first_pos) == (1, 0)


def test_phrase_match_plan_broadcasts_phrases(spark):
    from logsight_filebeat_spark.operators.retrieval import phrase_match

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(50)], "doc_id bigint, text string"
    )
    phrases = spark.createDataFrame(
        [("p1", "a b")], "query_id string, phrase string"
    )
    plan = phrase_match(docs, phrases)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def _ql(doc_tfs: dict, dl: int, qtoks: list, cf: dict, ctot: int,
        mu: float = 2000.0) -> float:
    """Python model of the decomposed Dirichlet QL score (in-corpus terms)."""
    qin = [t for t in qtoks if cf.get(t, 0) > 0]
    s = len(qin) * math.log(mu / (dl + mu))
    s += sum(math.log(cf[t] / ctot) for t in qin)
    s += sum(
        math.log(1 + doc_tfs.get(t, 0) / (mu * cf[t] / ctot)) for t in qin
    )
    return round(s, 6)


def test_ql_scores_hand_oracle(spark, docs):
    from logsight_filebeat_spark.operators.retrieval import ql_scores

    # corpus stats over DOCS: 14 tokens total
    cf = {"spark": 2, "join": 2, "hash": 4, "window": 1, "agg": 1,
          "merge": 1, "customer": 1, "query": 1, "plan": 1}
    qt = spark.createDataFrame(
        [("qa", "spark"), ("qa", "hash"), ("qb", "merge"), ("qb", "zzz")],
        "query_id string, tok string",
    )
    got = {
        (r.query_id, r.doc_id): r.score
        for r in ql_scores(docs, qt).collect()
    }
    # doc1 "spark join join hash": candidate for qa via spark+hash
    assert got[("qa", 1)] == pytest.approx(
        _ql({"spark": 1, "join": 2, "hash": 1}, 4, ["spark", "hash"], cf, 14),
        abs=2e-6,
    )
    # doc3 "hash hash hash merge": qa candidate via hash only — the
    # unmatched 'spark' still contributes its smoothing addend
    assert got[("qa", 3)] == pytest.approx(
        _ql({"hash": 3, "merge": 1}, 4, ["spark", "hash"], cf, 14), abs=2e-6
    )
    # OOV term 'zzz' dropped: qb scores as the 1-term query 'merge'
    assert got[("qb", 3)] == pytest.approx(
        _ql({"hash": 3, "merge": 1}, 4, ["merge"], cf, 14), abs=2e-6
    )
    # matching more query terms with equal dl beats matching fewer
    assert got[("qa", 1)] > got[("qa", 2)]  # doc2 matches only spark


def test_ql_topk_rank_stability(spark, docs):
    from logsight_filebeat_spark.operators.retrieval import ql_topk

    qt = spark.createDataFrame([("q", "hash")], "query_id string, tok string")
    r1 = [(r.doc_id, r.rank) for r in ql_topk(docs, qt, k=3).collect()]
    r2 = [
        (r.doc_id, r.rank)
        for r in ql_topk(docs.repartition(5), qt, k=3).collect()
    ]
    assert sorted(r1) == sorted(r2)
    ranks = dict(r1)
    assert ranks[3] == 1  # tf=3 of 'hash' dominates


def test_reciprocal_rank_known_answers(spark):
    from logsight_filebeat_spark.operators.retrieval import reciprocal_rank

    ranked = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3),
         ("q2", 10, 1), ("q2", 13, 2)],
        "query_id string, doc_id bigint, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 11), ("q1", 12), ("q2", 99)],
        "query_id string, doc_id bigint",
    )
    got = {r.query_id: r.rr for r in reciprocal_rank(ranked, qrels).collect()}
    assert got["q1"] == 0.5  # first relevant at rank 2
    assert got["q2"] == 0.0  # nothing relevant retrieved


def test_ndcg_known_answers(spark):
    from logsight_filebeat_spark.operators.retrieval import ndcg_at_k

    ranked = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3)],
        "query_id string, doc_id bigint, rank int",
    )
    # two relevant docs, retrieved at ranks 2 and 3
    qrels = spark.createDataFrame(
        [("q1", 11), ("q1", 12)], "query_id string, doc_id bigint"
    )
    got = {r.query_id: r.ndcg for r in ndcg_at_k(ranked, qrels, k=3).collect()}
    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert got["q1"] == pytest.approx(round(dcg / idcg, 6), abs=2e-6)
    # perfect ranking scores exactly 1
    qrels2 = spark.createDataFrame(
        [("q1", 10), ("q1", 11), ("q1", 12)], "query_id string, doc_id bigint"
    )
    got2 = {
        r.query_id: r.ndcg for r in ndcg_at_k(ranked, qrels2, k=3).collect()
    }
    assert got2["q1"] == 1.0


def test_ndcg_rejects_bad_k(spark):
    from logsight_filebeat_spark.operators.retrieval import ndcg_at_k

    with pytest.raises(ValueError):
        ndcg_at_k(None, None, k=0)


def test_mmr_rerank_greedy_trajectory(spark):
    from logsight_filebeat_spark.operators.retrieval import mmr_rerank

    # q: doc 1 rel 10, doc 2 rel 9 but near-dup of 1 (sim .9),
    #    doc 3 rel 5 dissimilar → MMR (λ=.5) picks 1, then 3 over 2:
    #    doc2: .5*9 - .5*.9 = 4.05 < doc3: .5*5 - 0 = 2.5? no — 4.05 > 2.5.
    #    Use sim 0.9 → doc2 4.05 beats doc3 2.5; bump doc3 rel to 9:
    #    doc2: 4.05 vs doc3: 4.5 → 3 wins; round 3 picks 2.
    cand = spark.createDataFrame(
        [("q", 1, 10), ("q", 2, 9), ("q", 3, 9)],
        "query_id string, doc_id bigint, rel bigint",
    )
    sims = spark.createDataFrame(
        [("q", 2, 1, 0.9), ("q", 1, 2, 0.9)],
        "query_id string, doc_id bigint, other_id bigint, sim double",
    )
    got = sorted(
        (r["rank"], r["doc_id"], r["mmr"])
        for r in mmr_rerank(cand, sims, k=3, lam=0.5).collect()
    )
    assert got == [(1, 1, 5.0), (2, 3, 4.5), (3, 2, 4.05)]


def test_mmr_rerank_ties_break_on_doc_id_and_short_lists(spark):
    from logsight_filebeat_spark.operators.retrieval import mmr_rerank

    # two equal-rel docs, no sims → rank order by doc_id; k beyond the
    # candidate count just stops emitting
    cand = spark.createDataFrame(
        [("q", 7, 3), ("q", 2, 3)],
        "query_id string, doc_id bigint, rel bigint",
    )
    sims = spark.createDataFrame(
        [], "query_id string, doc_id bigint, other_id bigint, sim double"
    )
    got = sorted(
        (r["rank"], r["doc_id"])
        for r in mmr_rerank(cand, sims, k=5, lam=0.5).collect()
    )
    assert got == [(1, 2), (2, 7)]


def test_candidate_sims_jaccard(spark):
    from logsight_filebeat_spark.operators.retrieval import candidate_sims

    cand = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 1), ("q", 3, 1)],
        "query_id string, doc_id bigint, rel bigint",
    )
    dtok = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "b"), (2, "c"), (3, "z")],
        "doc_id bigint, tok string",
    )
    got = {
        (r["doc_id"], r["other_id"]): r["sim"]
        for r in candidate_sims(cand, dtok).collect()
    }
    # J(1,2) = |{b}| / |{a,b,c}| = 1/3, both directions; 3 shares nothing
    assert set(got) == {(1, 2), (2, 1)}
    assert abs(got[(1, 2)] - 1 / 3) < 1e-12 and got[(1, 2)] == got[(2, 1)]
