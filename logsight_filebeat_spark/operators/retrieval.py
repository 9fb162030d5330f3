"""Sparse keyword retrieval: inverted-index statistics and BM25 top-k.

Complements the dense ANN stack (operators/similarity.py) with the lexical
half of corpus search — the workhorse for decontamination forensics,
targeted corpus audits ("show me the docs that score for this phrase"),
and hybrid retrieval baselines.

Scale shapes (100 TB corpus, small query set):

* ``doc_term_freqs`` / ``term_doc_freqs`` are explode + hash aggregates on
  (doc, term) / term — map-side partials, no joins.
* ``bm25_scores`` joins the tf table against the BROADCAST query-term list
  first, so only postings of queried terms survive into the score path
  (the corpus-wide tf table never joins anything big); corpus constants
  (N, avgdl) ride a broadcast 1-row aggregate.
* ``bm25_topk``'s per-query window partitions on query_id over candidate
  docs only (docs sharing ≥1 query term). For pathological stop-word
  queries cap candidates with a tf floor or drop ubiquitous terms first
  (`max_doc_freq`-style, see operators/dedup.py::jaccard_pairs).

Determinism: scores are doubles (idf is a log), so exact cross-engine
equality is NOT guaranteed bit-for-bit by IEEE alone; scores round to 1e-6
(the dsir precedent) and ties rank by doc_id, which keeps the top-k and its
ordering stable across engines and partitionings in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOKEN_SPLIT_RE = r"\s+"


def doc_tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tok): lowercased whitespace tokens, empties dropped."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )


def doc_token_positions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, tok): positional postings for phrase search. ``pos``
    is the ORIGINAL 0-based split index — with a ``\\s+`` split the only
    possible empty tokens are a leading/trailing one, so consecutive words
    always carry consecutive positions and phrase adjacency survives the
    empty-token filter."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
        ).alias("pos", "tok"),
    ).filter(F.col("tok") != "")


def phrase_match(
    docs: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase search over positional postings: (query_id, doc_id,
    n_matches, first_pos) for every document containing the phrase's
    tokens at consecutive positions — the positional-index capability a
    Lucene-style engine adds over bag-of-words BM25, and the precise tool
    for decontamination forensics ("which training docs contain this
    benchmark sentence verbatim?").

    ``phrases`` is a small (query_id, phrase) DataFrame.

    Scale shape — the classic positional-intersection, shaped for Spark:
    the phrase set explodes to (query_id, offset, token) and BROADCASTS
    into ONE equi-join against the positional postings on token (only
    postings of the phrase vocabulary survive into the match path; the
    corpus-wide postings table never joins anything big). Each surviving
    posting votes for the anchor position ``pos - offset``; ONE hash
    aggregate counts votes per (query, doc, anchor), and an anchor with
    exactly phrase-length votes is a full occurrence ((doc, pos) is
    unique, so votes can't double-count — duplicate phrase tokens like
    "table table" stay exact). No per-term self-join chain, no window,
    no Python."""
    qsplit = F.split(F.lower(F.col("phrase")), TOKEN_SPLIT_RE)
    # qlen counts NON-EMPTY tokens: edge whitespace makes split emit ''
    # entries that the filter below drops — sizing on the raw split would
    # demand more votes than any anchor can collect, silently matching
    # nothing. (\s+ splitting yields empties only at the edges, so the
    # surviving offsets keep one uniform shift and anchors stay aligned.)
    q = (
        phrases.select(
            "query_id",
            F.posexplode(qsplit).alias("offset", "qtok"),
            F.size(F.filter(qsplit, lambda x: x != "")).alias("qlen"),
        )
        .filter(F.col("qtok") != "")
    )
    post = doc_token_positions(docs, text_col, id_col)
    hits = post.join(F.broadcast(q), post["tok"] == q["qtok"]).select(
        "query_id",
        id_col,
        (F.col("pos") - F.col("offset")).alias("anchor"),
        "qlen",
    )
    anchors = hits.groupBy("query_id", id_col, "anchor", "qlen").agg(
        F.count(F.lit(1)).alias("n_terms")
    )
    return (
        anchors.filter(F.col("n_terms") == F.col("qlen"))
        .groupBy("query_id", id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("anchor").cast("bigint").alias("first_pos"),
        )
    )


def doc_term_freqs(toks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tok, tf) — one hash aggregate."""
    return toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))


def term_doc_freqs(tf: DataFrame) -> DataFrame:
    """(tok, df) document frequencies — tf is already distinct per (doc,
    term), so a plain count."""
    return tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))


def doc_lengths(toks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) token counts."""
    return toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))


def bm25_scores(
    docs: DataFrame,
    query_terms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, score): BM25 with the non-negative idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``; score rounded to 1e-6.

    ``query_terms`` is a small (query_id, tok) DataFrame — broadcast into
    the postings join so the corpus-side tf table is filtered to queried
    terms before anything else happens.
    """
    toks = doc_tokens(docs, text_col, id_col)
    tf = doc_term_freqs(toks, id_col)
    dfreq = term_doc_freqs(tf)
    dl = doc_lengths(toks, id_col)
    consts = toks.agg(
        F.countDistinct(id_col).alias("n_docs"),
        (F.count(F.lit(1)) / F.countDistinct(id_col)).alias("avgdl"),
    )

    matched = (
        tf.join(F.broadcast(query_terms), "tok")
        .join(F.broadcast(dfreq.join(F.broadcast(query_terms.select("tok").distinct()), "tok")), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(consts))
    )
    comp = matched.select(
        "query_id",
        id_col,
        (
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            )
            * (F.col("tf") * (1.0 + k1))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        ).alias("c"),
    )
    return comp.groupBy("query_id", id_col).agg(
        F.round(F.sum("c"), 6).alias("score")
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k_rrf: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (Cormack et al. 2009):
    (query_id, doc_id, rrf_score, rank) with
    ``rrf_score = Σ_lists 1/(k_rrf + rank_in_list)`` over the lists a doc
    appears in.

    Each input is a (query_id, id_col, rank) DataFrame (e.g. ``bm25_topk``
    and a dense ANN top-k) — the hybrid-retrieval baseline.

    Determinism: lists are folded with full-outer equi-joins on
    (query_id, id) and contributions are ADDED IN LIST ORDER as a fixed
    Column expression — never a floating-point SUM aggregate whose
    accumulation order depends on partitioning — so the fused score is
    bit-identical at any parallelism and across engines. Scale shape:
    every join keys on (query_id, id) over candidate rows only (≤ topk ×
    n_queries per list), so the fuse stage is tiny regardless of corpus
    size; the cost lives in the upstream retrievers."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    cur = None
    for i, df in enumerate(ranked):
        r = df.select("query_id", id_col, F.col("rank").alias(f"_r{i}"))
        cur = r if cur is None else cur.join(
            r, ["query_id", id_col], "full_outer"
        )
    score = None
    for i in range(len(ranked)):
        c = F.coalesce(
            F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(f"_r{i}")), F.lit(0.0)
        )
        score = c if score is None else score + c
    scores = cur.select(
        "query_id", id_col, F.round(score, 6).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", id_col, "rrf_score", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, score, rank): top-k per query; ties and the
    window order break on doc_id AFTER score rounding, so ranks are
    engine- and partitioning-stable."""
    scores = bm25_scores(docs, query_terms, text_col, id_col, k1, b)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def negative_samples(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "negatives",
) -> DataFrame:
    """Deterministic easy-negative mining for retrieval training pairs:
    per query, the k documents sharing NO query term, chosen by seeded
    hash of (query_id, doc_id) — the draw is a pure function of ids, so
    the training set rebuilds identically anywhere (hard negatives come
    from `bm25_topk` minus the positives; this supplies the easy tail).

    Scale shape: positives = one equi-join of the token table against the
    broadcast query terms; the per-query doc universe is a broadcast
    cross-join against the tiny query list (linear in |docs|·|queries|),
    anti-joined against positives; per-query top-k is a window shuffled
    BY QUERY over hash order."""
    from logsight_filebeat_spark.functions.hashing import seeded_hash32

    toks = doc_tokens(docs, text_col, id_col)
    pos = (
        toks.join(F.broadcast(query_terms), ["tok"])
        .select("query_id", id_col)
        .distinct()
    )
    universe = docs.select(id_col).crossJoin(
        F.broadcast(query_terms.select("query_id").distinct())
    )
    neg = universe.join(pos, ["query_id", id_col], "left_anti")
    h = seeded_hash32(
        F.concat(F.col("query_id"), F.lit(":"), F.col(id_col).cast("string")),
        seed,
    )
    w = Window.partitionBy("query_id").orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        neg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank")
    )


def ql_scores(
    docs: DataFrame,
    query_terms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mu: float = 2000.0,
) -> DataFrame:
    """(query_id, doc_id, score): Dirichlet-smoothed query-likelihood
    language-model retrieval (Zhai & Lafferty, SIGIR 2001) — the standard
    probabilistic counterpart to BM25 and the second leg of a hybrid
    baseline. For query q and doc d:

        score = Σ_{t∈q} ln( (tf_td + μ·P(t|C)) / (dl_d + μ) )

    with P(t|C) = cf_t / |C| (collection frequency over total tokens).
    Decomposed so UNMATCHED terms never need postings:

        score = |q|·ln(μ/(dl+μ)) + Σ_{t∈q} ln(P(t|C))
                + Σ_{t∈q, tf>0} ln(1 + tf/(μ·P(t|C)))

    — the first addend is per-(query, doc-length), the second a per-query
    constant, and only the third touches the postings table, filtered
    through the BROADCAST query-term list first exactly like
    :func:`bm25_scores`. Docs scored = candidates sharing ≥1 query term
    (the universal top-k retrieval contract; a doc matching nothing can
    never enter a top-k that any matching doc enters, because its missing
    match-sum is 0 and candidates' are > 0... strictly, with all-smoothing
    scores every candidate outranks every non-candidate of equal dl, and
    non-candidates' ordering is pure dl — irrelevant for retrieval).

    Query terms with ZERO corpus occurrences are DROPPED (P(t|C)=0 makes
    every score -inf; the convention every Dirichlet implementation uses).
    Scores round to 1e-6 (float ln; same cross-engine precedent as BM25).
    """
    toks = doc_tokens(docs, text_col, id_col)
    tf = doc_term_freqs(toks, id_col)
    dl = doc_lengths(toks, id_col)
    qt = query_terms.select("query_id", "tok").distinct()

    # collection frequencies for queried terms only (broadcast-filtered)
    cf = (
        tf.join(F.broadcast(qt.select("tok").distinct()), "tok")
        .groupBy("tok")
        .agg(F.sum("tf").alias("cf"))
    )
    total = toks.agg(F.count(F.lit(1)).cast("double").alias("ctot"))
    # per-query constants over IN-CORPUS terms: n_terms, sum ln P(t|C)
    qconst = (
        qt.join(F.broadcast(cf), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("qn"),
            F.sum(F.log(F.col("cf") / F.col("ctot"))).alias("qlogpc"),
        )
    )
    # matched-postings addend
    match = (
        tf.join(F.broadcast(qt), "tok")
        .join(F.broadcast(cf), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("query_id", id_col)
        .agg(
            F.sum(
                F.log(
                    F.lit(1.0)
                    + F.col("tf") / (F.lit(mu) * F.col("cf") / F.col("ctot"))
                )
            ).alias("msum")
        )
    )
    return (
        match.join(dl, id_col)
        .join(F.broadcast(qconst), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(
                F.col("qn") * F.log(F.lit(mu) / (F.col("dl") + F.lit(mu)))
                + F.col("qlogpc")
                + F.col("msum"),
                6,
            ).alias("score"),
        )
    )


def ql_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    mu: float = 2000.0,
) -> DataFrame:
    """(query_id, doc_id, score, rank): Dirichlet-QL top-k per query; ties
    break on doc_id after rounding, mirroring :func:`bm25_topk`."""
    scores = ql_scores(docs, query_terms, text_col, id_col, mu)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def reciprocal_rank(
    ranked: DataFrame, qrels: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(query_id, rr): reciprocal rank of the FIRST relevant doc per query
    (the MRR addend), 0.0 when no relevant doc is retrieved. ``ranked`` is
    (query_id, id, rank); ``qrels`` is the binary-relevance (query_id, id)
    ground truth. Both tables are top-k-sized — the whole evaluation is a
    broadcast join + one min aggregate, corpus never touched."""
    hit = ranked.join(qrels.select("query_id", id_col), ["query_id", id_col])
    best = hit.groupBy("query_id").agg(F.min("rank").alias("r1"))
    return (
        ranked.select("query_id")
        .distinct()
        .join(best, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.when(F.col("r1").isNotNull(), F.lit(1.0) / F.col("r1"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("rr"),
        )
    )


def ndcg_at_k(
    ranked: DataFrame, qrels: DataFrame, k: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """(query_id, ndcg): binary-relevance nDCG@k.

        DCG  = Σ_{i ≤ k, doc_i relevant} 1/log2(i + 1)
        IDCG = Σ_{i = 1..min(k, R)}      1/log2(i + 1),  R = |relevant(q)|

    IDCG's closed sum is built from a per-query R count + a posexploded
    1..k sequence (k rows per query — constant work). Queries with R = 0
    score 0.0 by convention. Rounded to 1e-6 (float log2; BM25
    precedent)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    rel = qrels.select("query_id", id_col)
    dcg = (
        ranked.filter(F.col("rank") <= k)
        .join(rel, ["query_id", id_col])
        .groupBy("query_id")
        .agg(F.sum(F.lit(1.0) / F.log2(F.col("rank") + 1)).alias("dcg"))
    )
    rcount = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("r"))
    ideal = (
        rcount.select(
            "query_id",
            F.explode(F.sequence(F.lit(1), F.least(F.col("r"), F.lit(k)))).alias("i"),
        )
        .groupBy("query_id")
        .agg(F.sum(F.lit(1.0) / F.log2(F.col("i") + 1)).alias("idcg"))
    )
    return (
        ranked.select("query_id")
        .distinct()
        .join(dcg, "query_id", "left")
        .join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.when(
                    F.col("idcg").isNotNull(),
                    F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg"),
        )
    )


def candidate_sims(
    cand: DataFrame,
    dtok: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Directed token-set Jaccard similarities between CANDIDATE pairs of
    the same query — the redundancy signal :func:`mmr_rerank` consumes.
    ``cand`` is (query_id, doc_id, …); ``dtok`` is the distinct
    (doc_id, tok) inverted rows of candidate docs. Returns
    (query_id, doc_id, other_id, sim); pairs with an EMPTY token
    intersection are simply absent (the re-ranker reads absent as 0).

    Scale shape: intersections come from ONE inverted-list self-join on
    tok over candidate docs only (candidates are top-k-bounded per query,
    so this is dimension-sized at any corpus size), one pair-keyed hash
    aggregate, set sizes joined back; the per-query pair fan-out is then
    an equi-join of the bounded candidate list with itself."""
    sz = dtok.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    a = dtok.select(F.col(id_col).alias("_da"), "tok")
    b = dtok.select(F.col(id_col).alias("_db"), "tok")
    isect = (
        a.join(b, ["tok"])
        .filter(F.col("_da") < F.col("_db"))
        .groupBy("_da", "_db")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    j = (
        isect.join(sz.select(F.col(id_col).alias("_da"), F.col("_n").alias("_na")), ["_da"])
        .join(sz.select(F.col(id_col).alias("_db"), F.col("_n").alias("_nb")), ["_db"])
        .select(
            "_da",
            "_db",
            (F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i"))).alias("sim"),
        )
    )
    jd = j.unionByName(
        j.select(F.col("_db").alias("_da"), F.col("_da").alias("_db"), "sim")
    )
    pairs = cand.select(query_col, F.col(id_col).alias("_da")).join(
        cand.select(query_col, F.col(id_col).alias("_db")), [query_col]
    ).filter(F.col("_da") != F.col("_db"))
    return pairs.join(jd, ["_da", "_db"]).select(
        query_col,
        F.col("_da").alias(id_col),
        F.col("_db").alias("other_id"),
        "sim",
    )


def mmr_rerank(
    cand: DataFrame,
    sims: DataFrame,
    k: int = 5,
    lam: float = 0.5,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "rel",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    greedily select k results per query maximizing
    ``λ·rel − (1−λ)·max_sim(candidate, already-selected)`` — the
    diversity-aware top-k that keeps near-duplicate hits from crowding a
    result list (and, in the training-data setting, picks DIVERSE
    few-shot exemplars / eval negatives instead of k copies of one
    document). First pick is plain argmax relevance; ties break on doc
    id everywhere, so the greedy trajectory is deterministic at any
    parallelism and reproducible in a SQL oracle (all score arithmetic
    is fixed-shape double expressions over integral inputs — no FP-sum
    aggregates).

    ``cand``: (query, doc, rel) — top-N-bounded per query upstream.
    ``sims``: directed (query, doc, other, sim) from
    :func:`candidate_sims`; absent pair ⇒ similarity 0. Returns
    (query, doc, rank 1..k, mmr) with mmr rounded to 1e-6 for output.

    Scale shape: after the bounded candidate retrieval everything here is
    dimension-sized (queries × N candidates); each greedy round is one
    anti-join + one max-aggregate + one argmax aggregate, with the
    selected set behind an iteration barrier (it feeds three consumers
    per round — O(1) plan growth, same discipline as resolve_chains)."""
    from logsight_filebeat_spark.functions.caching import iteration_barrier

    first = (
        cand.groupBy(query_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col(rel_col)).cast("double").alias("s"),
                    F.col(id_col).alias("i"),
                )
            ).alias("_k")
        )
        .select(
            query_col,
            F.col("_k.i").alias(id_col),
            F.lit(1).cast("int").alias("rank"),
            F.round(F.lit(lam) * (-F.col("_k.s")), 6).alias("mmr"),
        )
    )
    sel = iteration_barrier(first)
    for r in range(2, k + 1):
        rem = cand.join(
            sel.select(query_col, id_col), [query_col, id_col], "left_anti"
        )
        ssel = (
            sims.join(
                sel.select(
                    query_col, F.col(id_col).alias("other_id")
                ),
                [query_col, "other_id"],
            )
            .groupBy(query_col, id_col)
            .agg(F.max("sim").alias("_ms"))
        )
        scored = rem.join(ssel, [query_col, id_col], "left").withColumn(
            "_mmr",
            F.lit(lam) * F.col(rel_col)
            - F.lit(1.0 - lam) * F.coalesce("_ms", F.lit(0.0)),
        )
        pick = (
            scored.groupBy(query_col)
            .agg(
                F.min(
                    F.struct(
                        (-F.col("_mmr")).alias("s"), F.col(id_col).alias("i")
                    )
                ).alias("_k")
            )
            .select(
                query_col,
                F.col("_k.i").alias(id_col),
                F.lit(r).cast("int").alias("rank"),
                F.round(-F.col("_k.s"), 6).alias("mmr"),
            )
        )
        sel = iteration_barrier(sel.unionByName(pick))
    return sel


def phrase_snippets(
    docs: DataFrame,
    phrases: DataFrame,
    window: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Search-result snippets: for every exact-phrase occurrence found by
    :func:`phrase_match`, the ±``window``-token passage around the FIRST
    match — what a search UI (or a decontamination reviewer) actually
    reads next to a hit. Returns (query_id, doc_id, first_pos, snippet).

    Scale shape: matches come from phrase_match's broadcast equi-join;
    the snippet tokens come from ONE positional-postings equi-join on
    doc_id with the window bounds as a residual range filter (≤
     2·window + phrase_len rows survive per match BEFORE the aggregate),
    then one ordered re-assembly per (query, doc) via the array_sort
    struct trick — never a per-doc window sort of the corpus."""
    q = phrases.select(
        "query_id",
        F.size(
            F.filter(
                F.split(F.lower(F.col("phrase")), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("_qlen"),
    )
    m = (
        phrase_match(docs, phrases, text_col, id_col)
        .join(F.broadcast(q), ["query_id"])
        .select("query_id", id_col, "first_pos", "_qlen")
    )
    pos = doc_token_positions(docs, text_col, id_col)
    toks = pos.join(m, [id_col]).filter(
        (F.col("pos") >= F.col("first_pos") - window)
        & (F.col("pos") <= F.col("first_pos") + F.col("_qlen") - 1 + window)
    )
    return (
        toks.groupBy("query_id", id_col, "first_pos")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("snippet")
        )
        .select(
            "query_id",
            id_col,
            F.col("first_pos").cast("bigint").alias("first_pos"),
            "snippet",
        )
    )
