"""Composed corpus-curation pipeline — the training-data path in one call.

The individual operators (exact dedup, MinHash+LSH near-dup candidates,
quality scoring, language-ID) each exist standalone in operators/dedup.py
and functions/text.py; this module wires them into the shape an actual
LLM-training-data pipeline runs over a raw crawl corpus:

    raw docs
      → exact dedup            (byte-identical copies: keep min-id survivor)
      → near-dup removal       (MinHash signatures → banded LSH bucket join;
                                drop the HIGHER id of every candidate pair —
                                deterministic survivor, no pair materialized
                                beyond the candidate list)
      → quality gate           (composite heuristic ≥ min_quality)
      → language gate          (marker-word language-ID ≠ 'und')

Scale shape (the reason this composition is safe at 10^12 docs): every step
is a bounded-shuffle primitive — one 128-bit hash groupBy + semi-join, one
O(docs × bands) bucket equi-join, one distinct on the drop list, one
left-anti join, then pure-Column filters that run inside the scan stage.
There is no cross join and no driver-side collect anywhere in the chain.

Near-dup removal semantics, two rules:

  * greedy (default): drop `id_b` of every (id_a < id_b) candidate pair —
    keeps, per cluster, every doc that is no pair's higher member. Cheap
    (one distinct + anti-join) and the rule large corpora actually use,
    but transitively-linked docs that never appear as a higher member
    survive (pairs (1,3),(2,3) keep BOTH 1 and 2).
  * cc: exact connected components (min-id label propagation,
    ``connected_components``) — per cluster exactly the minimum id
    survives, the cluster-true rule, at the cost of a bounded iterative
    join (iterations ≤ cluster diameter, which for near-dup graphs is
    small; each round is one equi-join + one hash aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logsight_filebeat_spark.functions import text as tx
from logsight_filebeat_spark.functions.caching import (
    iteration_barrier,
    track_persist,
)
from logsight_filebeat_spark.operators.dedup import dedup_exact, minhash_lsh_pairs


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, comp) for every id in ``pairs``; comp = the minimum id of the
    node's connected cluster. Min-label propagation: each round every node
    takes min(own label, neighbors' labels); converges in ≤ graph-diameter
    rounds, checked with a cheap existence probe (``limit(1).count()`` on
    the changed set — a driver-side loop over ITERATIONS, never over rows).

    Scale shape: per round one equi-join (edges ⋈ labels on node id) + one
    hash aggregate — both shuffle on node id, no cross product, no collect
    of node data. Each round's label table references the previous one
    THREE times (message join, union, convergence probe), so the analyzed
    plan would grow 3^rounds under persist alone (persist caches physics,
    not the nested logical plan — at max_iterations=20 that is 3^20 plan
    copies and a dead driver); every round therefore ends at
    ``iteration_barrier`` (eager localCheckpoint): O(1) plan size per
    round, blocks release via release_persisted after the caller's
    action. ``max_iterations`` bounds the worst case (a path graph) — on
    real near-dup graphs 3-5 rounds close."""
    edges = track_persist(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).union(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
    )
    labels = iteration_barrier(
        edges.select(F.col("src").alias("id")).distinct().withColumn(
            "comp", F.col("id")
        )
    )
    changed = 1
    for _ in range(max_iterations):
        msgs = (
            edges.join(labels, edges["dst"] == labels["id"])
            .select(F.col("src").alias("id"), F.col("comp"))
        )
        new_labels = iteration_barrier(
            labels.union(msgs).groupBy("id").agg(F.min("comp").alias("comp"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # returning partially-propagated labels would silently violate the
        # "exactly the minimum id survives" contract (and diverge from the
        # recursive-CTE oracle) on a component wider than max_iterations hops
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations; raise max_iterations (component diameter exceeds it)"
        )
    return labels


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    min_quality: float = 0.5,
    clustering: str = "greedy",
) -> DataFrame:
    """Run the full curation chain; returns the surviving documents as
    (id, quality, lang_pred) — id column keeps its input name. Caller
    releases the tracked LSH signature cache after its action
    (functions/caching.py::release_persisted). ``clustering``: "greedy"
    (higher-pair-member drop) or "cc" (connected components — exactly the
    min id per near-dup cluster survives); see the module docstring."""
    if clustering not in ("greedy", "cc"):
        raise ValueError(f"clustering {clustering!r}: 'greedy' or 'cc'")
    d1 = dedup_exact(df, text_col, id_col)
    pairs = minhash_lsh_pairs(
        d1, text_col=text_col, id_col=id_col, n=n,
        num_hashes=num_hashes, bands=bands,
    )
    if clustering == "cc":
        comp = connected_components(pairs)
        drop = comp.filter(F.col("id") != F.col("comp")).select(
            F.col("id").alias(id_col)
        )
    else:
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    d2 = d1.join(drop, [id_col], "left_anti")
    quality = tx.quality_score(text_col)
    lang = tx.lang_id(text_col)
    return (
        d2.select(
            F.col(id_col),
            quality.alias("quality"),
            lang.alias("lang_pred"),
        )
        .filter((F.col("quality") >= min_quality) & (F.col("lang_pred") != "und"))
    )


def curation_report(curated: DataFrame) -> DataFrame:
    """Per-language survivor counts + mean quality — the summary a pipeline
    operator actually monitors. One low-cardinality hash aggregate."""
    return curated.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


FUNNEL_STAGES = ("exact_dup", "near_dup", "low_quality", "lang_unknown", "kept")


def curation_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    min_quality: float = 0.5,
) -> DataFrame:
    """Stage-by-stage attrition accounting for the curation chain — the
    FineWeb/Dolma-style ablation report an operator reads before trusting a
    filtered corpus. Each document is labeled with the FIRST gate that
    removes it (exact_dup → near_dup → low_quality → lang_unknown, in chain
    order; survivors are 'kept'); output is one row per stage:
    (stage, stage_idx, n_docs, pct).

    Scale shape: the labeling is one pass over the same bounded-shuffle
    primitives ``curate_corpus`` runs — the md5 keep-min aggregate joins
    back on the 128-bit hash (equi-join), the greedy LSH drop list joins
    back on id (left join against a distinct id set), quality/lang are
    pure Columns in the scan — then ONE low-cardinality hash aggregate
    (≤5 groups). The grand total for pct rides a broadcast 1-row
    aggregate, not an unpartitioned window over data.
    """
    h = F.md5(F.col(text_col)).alias("_h")
    base = df.select(F.col(id_col), F.col(text_col), h)
    keep_min = base.groupBy("_h").agg(F.min(id_col).alias("_keep"))
    labeled = base.join(keep_min, "_h").withColumn(
        "_exact_dup", F.col(id_col) != F.col("_keep")
    )

    d1 = labeled.filter(~F.col("_exact_dup")).select(id_col, text_col)
    pairs = minhash_lsh_pairs(
        d1, text_col=text_col, id_col=id_col, n=n,
        num_hashes=num_hashes, bands=bands,
    )
    drop = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_near_dup", F.lit(True))
    )

    stage = (
        F.when(F.col("_exact_dup"), F.lit("exact_dup"))
        .when(F.coalesce(F.col("_near_dup"), F.lit(False)), F.lit("near_dup"))
        .when(tx.quality_score(text_col) < min_quality, F.lit("low_quality"))
        .when(tx.lang_id(text_col) == "und", F.lit("lang_unknown"))
        .otherwise(F.lit("kept"))
    )
    per_stage = (
        labeled.join(drop, [id_col], "left")
        .select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    total = per_stage.agg(F.sum("n_docs").alias("_total"))
    idx = F.lit(None).cast("int")
    for i, name in enumerate(FUNNEL_STAGES):
        idx = F.when(F.col("stage") == name, F.lit(i)).otherwise(idx)
    return (
        per_stage.crossJoin(F.broadcast(total))
        .select(
            "stage",
            idx.alias("stage_idx"),
            "n_docs",
            F.round(F.col("n_docs") / F.col("_total"), 6).alias("pct"),
        )
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 Appendix A), the
    shuffle-safe way: (id, n_lines, dup_line_frac, dup_line_char_frac,
    top_ngram, top_ngram_char_frac).

      * dup_line_frac       — fraction of line INSTANCES whose line text
                              occurs more than once in the doc
      * dup_line_char_frac  — fraction of line characters in those lines
      * top_ngram_char_frac — chars covered by the most frequent word
                              n-gram (count × gram length / doc length);
                              ties broken by the lexicographically largest
                              gram so both engines agree deterministically

    Shape: lines and n-grams explode to O(doc tokens) rows and everything
    after is hash aggregates keyed on (id, line|gram) then id — no windows,
    no joins back to the text, safe for pathological million-line docs
    that would make the per-row array-expression form O(n²)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("n_chars"),
        F.split(text_col, "\n").alias("lines"),
        tx.tokens(text_col).alias("toks"),
    )
    lines = base.select("id", F.explode("lines").alias("line"))
    line_counts = lines.groupBy("id", "line").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    line_agg = line_counts.groupBy("id").agg(
        F.sum("cnt").alias("n_lines"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "dup_lines"
        ),
        F.sum(F.col("cnt") * F.length("line")).alias("line_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.length("line")).otherwise(0)
        ).alias("dup_line_chars"),
    )
    idx = F.sequence(F.lit(1), F.size("toks") - (ngram_n - 1))
    grams = base.select(
        "id",
        F.explode(
            F.when(
                F.size("toks") >= ngram_n,
                F.transform(
                    idx, lambda i: F.array_join(F.slice("toks", i, ngram_n), " ")
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    top_gram = (
        grams.groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("id")
        .agg(F.max(F.struct("cnt", "gram")).alias("top"))
        .select(
            "id",
            F.col("top.gram").alias("top_ngram"),
            F.col("top.cnt").alias("top_cnt"),
        )
    )
    return (
        base.select("id", "n_chars")
        .join(line_agg, ["id"], "left")
        .join(top_gram, ["id"], "left")
        .select(
            "id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.round(
                F.coalesce("dup_lines", F.lit(0))
                / F.greatest(F.coalesce("n_lines", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.coalesce("dup_line_chars", F.lit(0))
                / F.greatest(F.coalesce("line_chars", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_line_char_frac"),
            F.coalesce("top_ngram", F.lit("")).alias("top_ngram"),
            F.round(
                F.coalesce(F.col("top_cnt") * F.length("top_ngram"), F.lit(0))
                / F.greatest("n_chars", F.lit(1)),
                6,
            ).alias("top_ngram_char_frac"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Per-doc top-k TF-IDF keywords: (id, term, tf, score, rank) with the
    smoothed idf ln((N+1)/(df+1)) + 1 and a deterministic tie rule (score
    desc, term asc). Shape: one explode to (id, term) rows, hash aggregates
    for tf/df, the corpus size N as a broadcast one-row cross join (never a
    driver collect), idf broadcast back by term, and the top-k window
    partitioned BY DOC — bounded by each doc's distinct terms, no global
    sort."""
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.transform(tx.tokens(text_col), F.lower)).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).alias("_n")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df")).filter(
        F.col("_df") >= min_df
    )
    scored = (
        tf.join(dfreq, ["term"])
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1) / (F.col("_df") + 1)) + 1), 6
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", "score", "rank")
    )


def doc_bigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, bigram) rows: adjacent lowercase whitespace-token pairs as
    "w1 w2" strings — the standard n-gram LM event. Pure array expressions
    in the scan (slice + transform with the positional lambda index), one
    explode; a document shorter than two tokens yields no rows."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, F.lit(1), F.size(toks) - 1),
            lambda w, i: F.concat_ws(
                " ", w, F.element_at(toks, (i + 2).cast("int"))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("id"), F.explode(pairs).alias("bigram")
    )


def bigram_model(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus bigram frequency table (bigram, cnt): ONE hash aggregate over
    the exploded bigrams — map-side partial aggregation collapses each
    partition's repeats before the shuffle. This is n-gram LM training as
    a DataFrame op; counts are exact integers, so downstream scoring is
    engine-reproducible (no float-summation order anywhere)."""
    return doc_bigrams(df, text_col, id_col).groupBy("bigram").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def lm_familiarity(
    df: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM familiarity score (the CCNet-style fluency gate,
    with corpus bigram frequency standing in for a pretrained KenLM): each
    doc's mean training-count of its bigrams. High = phrasing common in
    the training corpus; low = rare/garbled text. ``model`` defaults to
    self-scoring (train on ``df`` itself).

    Scale shape: explode → equi-join on bigram → hash aggregate per doc.
    The model rides a hash join keyed on bigram (AQE broadcasts it when
    it's small; at corpus scale it shuffles like any dimension its size),
    and the mean is an exact-integer sum / count — bit-stable across
    engines and partitionings. Docs with no bigrams score -1.0.

    The model join is a LEFT join with OOV bigrams counted at 0: with an
    external model, a mostly-OOV (garbled) doc must score LOW — an inner
    join would average over the few matched bigrams only and inflate
    exactly the docs the gate exists to reject. Self-scoring (default) is
    unaffected (every bigram is in its own training set)."""
    if model is None:
        model = bigram_model(df, text_col, id_col)
    bg = doc_bigrams(df, text_col, id_col)
    scored = (
        bg.join(model, "bigram", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.coalesce("cnt", F.lit(0))), 6).alias("familiarity"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("familiarity", F.lit(-1.0)).alias("familiarity"),
        )
    )


def hashed_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, feat) rows: the fastText-style feature set — lowercase
    whitespace unigrams plus adjacent-pair bigrams ("w1_w2") — as plain
    strings, before hashing. Pure array expressions in the scan (concat of
    the token array and a slice/transform bigram array), one explode; a
    doc shorter than two tokens contributes unigrams only, an empty doc
    contributes nothing."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, F.lit(1), F.size(toks) - 1),
            lambda w, i: F.concat_ws(
                "_", w, F.element_at(toks, (i + 2).cast("int"))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.concat(toks, pairs)).alias("feat"),
    )


def feature_weights_demo(spark, dim: int, seed: str = "w") -> DataFrame:
    """Deterministic stand-in for a trained weight vector: (bucket,
    w_milli) for every bucket in [0, dim), w_milli = portable hash of the
    bucket index mapped into [-1000, 1000] (integer milli-units, so sums
    stay exact in any engine). A production caller passes its actual
    trained vector as the same two-column table."""
    from logsight_filebeat_spark.functions.hashing import seeded_hash32

    return spark.range(dim).select(
        F.col("id").alias("bucket"),
        (seeded_hash32(F.col("id").cast("string"), seed) % 2001 - 1000)
        .cast("bigint")
        .alias("w_milli"),
    )


def linear_quality_scores(
    df: DataFrame,
    weights: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 16,
    hash_seed: int | str = 0,
    bias_milli: int = 0,
    threshold: float = 0.0,
) -> DataFrame:
    """fastText-architecture quality classifier (the linear
    bag-of-hashed-ngrams filter CCNet/DCLM-style pipelines score web text
    with): every unigram/bigram feature hashes into one of ``dim``
    buckets, the doc's score is the mean bucket weight plus bias, and
    ``keep`` applies the threshold. Returns (id, n_feats, score, keep)
    for EVERY input doc — featureless docs score the bare bias.

    Weights are integer milli-units so the per-doc sum is exact in any
    engine; the single division happens once at the end (bit-stable, same
    trick as lm_familiarity). ``weights`` defaults to the deterministic
    demo vector — pass a trained (bucket, w_milli) table in production.

    Scale shape: features explode map-side, the weight vector (``dim``
    rows, a few MB even at 2^20) broadcasts into a hash equi-join on
    bucket, and the per-doc mean is one hash aggregate on id — one
    shuffle total, corpus side never moves twice."""
    from logsight_filebeat_spark.functions.hashing import seeded_hash32

    if weights is None:
        weights = feature_weights_demo(df.sparkSession, dim)
    feats = hashed_features(df, text_col, id_col).select(
        "id", (seeded_hash32(F.col("feat"), hash_seed) % dim).alias("bucket")
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w_milli").alias("sum_milli"),
        )
        .select(
            "id",
            "n_feats",
            F.round(
                (F.lit(bias_milli) + F.col("sum_milli"))
                / (F.lit(1000.0) * F.col("n_feats")),
                6,
            ).alias("score"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
            F.coalesce(
                "score", F.round(F.lit(bias_milli / 1000.0), 6)
            ).alias("score"),
        )
        .withColumn("keep", F.col("score") >= F.lit(threshold))
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information — the classic
    corpus-statistics pass (phrase mining, tokenizer seeding, quality
    audits): PMI(w1, w2) = ln p(w1 w2) − ln p(w1) − ln p(w2), computed as
    ln(b) + 2·ln(Nu) − ln(Nb) − ln(u1) − ln(u2) so no integer product can
    overflow at corpus scale. ``min_count`` suppresses the unstable
    low-frequency tail (a hapax pair otherwise maxes the score).

    Returns (bigram, cnt, pmi, rank), pmi rounded 1e-6, ties by bigram.

    Scale shape: two hash aggregates (unigram + bigram counts, map-side
    partials), the 1-row totals broadcast, the unigram table rides two
    equi-joins keyed on the words; top-k is a distributed TakeOrdered and
    the final rank window orders ≤k rows."""
    from pyspark.sql import Window

    toks = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("tok")
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("u"))
    bi = bigram_model(df, text_col, id_col)  # (bigram, cnt)
    totals = uni.agg(F.sum("u").alias("nu")).crossJoin(
        bi.agg(F.sum("cnt").alias("nb"))
    )
    parts = bi.filter(F.col("cnt") >= min_count).select(
        "bigram",
        "cnt",
        F.split(F.col("bigram"), " ").getItem(0).alias("_w1"),
        F.split(F.col("bigram"), " ").getItem(1).alias("_w2"),
    )
    scored = (
        parts.join(uni.select(F.col("tok").alias("_w1"), F.col("u").alias("_u1")), "_w1")
        .join(uni.select(F.col("tok").alias("_w2"), F.col("u").alias("_u2")), "_w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "bigram",
            "cnt",
            F.round(
                F.log("cnt")
                + 2 * F.log("nu")
                - F.log("nb")
                - F.log("_u1")
                - F.log("_u2"),
                6,
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(
        F.col("pmi").desc(), F.col("bigram").asc()
    ).limit(k)
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        ),
    )


# per-token JSD terms are rounded onto this integer grid before summing:
# exact bigint addition makes the divergence partitioning- and engine-
# independent (a raw double sum is order-dependent). Quantization error is
# ≤ vocab·5e-16 — below the 1e-6 output rounding up to ~1e9 distinct tokens;
# the scaled sum itself stays < 2·ln2·1e15, inside both bigint and the
# 2^53 double-exact range for the final division.
JSD_SCALE = 10**15


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(tok, cnt) corpus token counts — one hash aggregate."""
    return (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def js_divergence(
    a: DataFrame, b: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Jensen–Shannon divergence between two corpora's token
    distributions — the dataset-drift monitor (snapshot-over-snapshot
    distribution shift, source-mix audits): 1-row
    (n_a, n_b, vocab_union, jsd), jsd ∈ [0, ln 2] rounded 1e-6.

    Scale shape: one hash aggregate per side, a full-outer equi-join on
    the token (each side contributes its count table, never raw text),
    1-row totals broadcast, and ONE exact-integer sum of grid-rounded
    per-token terms (see JSD_SCALE) — deterministic at any parallelism
    and re-derivable in SQL."""
    ca = token_counts(a, text_col).withColumnRenamed("cnt", "ca")
    cb = token_counts(b, text_col).withColumnRenamed("cnt", "cb")
    joined = ca.join(cb, ["tok"], "full_outer").select(
        "tok",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    totals = ca.agg(F.sum("ca").alias("na")).crossJoin(
        cb.agg(F.sum("cb").alias("nb"))
    )
    t = joined.crossJoin(F.broadcast(totals))
    p = F.col("ca") / F.col("na")
    q = F.col("cb") / F.col("nb")
    m = (p + q) / 2
    term = F.when(F.col("ca") > 0, p * F.log(p / m)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("cb") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    grid = F.round(term * F.lit(JSD_SCALE), 0).cast("bigint")
    return (
        t.select(
            "na", "nb", grid.alias("_g")
        )
        .groupBy("na", "nb")
        .agg(
            F.count(F.lit(1)).alias("vocab_union"),
            F.round(
                F.sum("_g") / F.lit(float(2 * JSD_SCALE)), 6
            ).alias("jsd"),
        )
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            "vocab_union",
            "jsd",
        )
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Dataset profiler — one row per column: (column, n_rows, n_null,
    n_distinct, min_val, max_val), min/max rendered as strings so mixed
    column types share one result schema. The release-QA table that
    catches schema drift, null floods, and cardinality surprises before
    training does.

    Scale shape: ONE pass over the scan; the multi-column exact distinct
    uses Spark's expand (rows × |cols|), fine for profiling passes — swap
    the KMV sketch (operators/sketches.py) per column when exact
    cardinality at 10^12 rows isn't worth its shuffle. The unpivot is a
    stack over a 1-row aggregate."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            F.countDistinct(c).alias(f"_dist_{c}"),
            F.min(F.col(c).cast("string")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return one.selectExpr(
        "_n as n_rows",
        f"stack({len(cols)}, {stack}) as "
        "(column_name, n_null, n_distinct, min_val, max_val)",
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


def domain_quality(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_words: int = 20,
    min_pages: int = 3,
    min_pass_rate: float = 0.5,
) -> DataFrame:
    """Per-domain quality rollup + blocklist flag — the FineWeb/Dolma-style
    curation stage that acts on HOSTS, not documents: a domain whose pages
    mostly fail the Gopher gate is boilerplate/spam wholesale, and
    dropping it also removes its pages that happened to squeak past the
    per-document gate. Returns one row per host: (host, n_pages, n_pass,
    sum_words, sum_alpha_words, pass_rate, alpha_frac, blocked).

    ``blocked`` = pass_rate < ``min_pass_rate`` with at least
    ``min_pages`` pages (low-volume hosts get the benefit of the doubt —
    one bad page must not blocklist a domain).

    Scale shape: per-page signals are pure codegen Columns in the scan
    stage; ONE host hash aggregate with map-side partials; every
    aggregated value is an exact INTEGER (counts and token sums), and the
    rates derive per-row from those integers — no float ever crosses an
    order-dependent aggregate, so results are identical at any
    parallelism and in any engine. Hot hosts: the aggregate is a pure
    count/sum, so map-side combine already collapses a hot host's rows
    per task (salting buys nothing a combiner hasn't)."""
    c = F.col(text_col)
    toks = tx.tokens(c)
    per_page = pages.select(
        F.regexp_extract(F.col(url_col), "https://([^/]+)/", 1).alias("host"),
        F.size(toks).cast("bigint").alias("_words"),
        F.size(
            F.filter(toks, lambda t: t.rlike(r"[A-Za-z]"))
        ).cast("bigint").alias("_alpha"),
        tx.gopher_pass(c, min_words=min_words).cast("int").alias("_pass"),
    )
    agg = per_page.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("_pass").cast("bigint").alias("n_pass"),
        F.sum("_words").alias("sum_words"),
        F.sum("_alpha").alias("sum_alpha_words"),
    )
    pass_rate = F.round(F.col("n_pass") / F.col("n_pages"), 6)
    alpha_frac = F.round(
        F.col("sum_alpha_words") / F.greatest("sum_words", F.lit(1)), 6
    )
    return agg.select(
        "host",
        "n_pages",
        "n_pass",
        "sum_words",
        "sum_alpha_words",
        pass_rate.alias("pass_rate"),
        alpha_frac.alias("alpha_frac"),
        (
            (pass_rate < min_pass_rate) & (F.col("n_pages") >= min_pages)
        ).alias("blocked"),
    )


def apply_domain_blocklist(
    pages: DataFrame, quality: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop every page whose host is blocked in a :func:`domain_quality`
    rollup. The blocklist side is domain-sized (tiny next to the corpus),
    so the anti-join broadcasts; the corpus never shuffles."""
    blocked = F.broadcast(
        quality.filter(F.col("blocked")).select("host")
    )
    with_host = pages.withColumn(
        "_dq_host", F.regexp_extract(F.col(url_col), "https://([^/]+)/", 1)
    )
    return (
        with_host.join(
            blocked, with_host["_dq_host"] == blocked["host"], "left_anti"
        ).drop("_dq_host")
    )


def classifier_calibration(
    scored: DataFrame,
    label_col: str,
    score_col: str = "score",
    thresholds: tuple = (-0.02, -0.01, 0.0, 0.01, 0.02),
) -> DataFrame:
    """Calibration / PR report for a quality classifier against reference
    labels (e.g. the Gopher gate as pseudo-labels): for each candidate
    decision threshold t, the confusion counts of the rule
    ``keep ⇔ score ≥ t`` and the derived precision/recall/F1 — the table
    a curation team reads before picking the filter's operating point
    (DCLM/CCNet-style classifier tuning).

    Scale shape: one broadcast of the tiny threshold list against the
    per-doc (score, label) projection, then ONE hash aggregate keyed on
    threshold — counts are exact integers, precision/recall/F1 derive per
    row from them (no float crosses an aggregate)."""
    thr = F.explode(
        F.array(*[F.lit(float(t)) for t in thresholds])
    ).alias("threshold")
    pred = F.col(score_col) >= F.col("threshold")
    lab = F.col(label_col)
    agg = (
        scored.select(F.col(score_col), lab.alias("_lab"))
        .select("*", thr)
        .groupBy("threshold")
        .agg(
            F.sum((pred & F.col("_lab")).cast("int")).alias("tp"),
            F.sum((pred & ~F.col("_lab")).cast("int")).alias("fp"),
            F.sum((~pred & F.col("_lab")).cast("int")).alias("fn"),
            F.sum((~pred & ~F.col("_lab")).cast("int")).alias("tn"),
        )
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp")))
    rec = F.when(F.col("tp") + F.col("fn") > 0,
                 F.col("tp") / (F.col("tp") + F.col("fn")))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        2 * prec * rec / (prec + rec),
    )
    return agg.select(
        "threshold",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.col("tn").cast("bigint").alias("tn"),
        F.round(F.coalesce(prec, F.lit(0.0)), 6).alias("precision"),
        F.round(F.coalesce(rec, F.lit(0.0)), 6).alias("recall"),
        F.round(F.coalesce(f1, F.lit(0.0)), 6).alias("f1"),
    )


def blockword_scores(
    df: DataFrame,
    lexicon: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: int = 3,
) -> DataFrame:
    """Weighted content-blocklist gate — the C4/UT1-style "bad words"
    filter next to the domain blocklist (enrich.filter_blocked_hosts):
    ``lexicon`` is a (word, weight) table; every doc scores
    Σ weight·occurrences over its lowercase tokens and ``blocked`` fires
    at ``score ≥ threshold`` (severity-weighted so one strong term or
    several mild ones both trip). All-integer arithmetic.

    Scale shape: tokens explode in the scan and hit the BROADCAST lexicon
    on a token equi-join — only matching tokens survive into the one
    per-doc hash aggregate (the lexicon is dimension-sized; the corpus
    never reshuffles on anything wider than doc_id). Docs with zero hits
    ride a left join back, score 0."""
    from logsight_filebeat_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok"),
    )
    hits = (
        toks.join(
            F.broadcast(lexicon.select(F.col("word").alias("_tok"), "weight")),
            ["_tok"],
        )
        .groupBy(id_col)
        .agg(
            F.sum("weight").cast("bigint").alias("block_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        )
    )
    return (
        df.select(id_col)
        .join(hits, [id_col], "left")
        .select(
            id_col,
            F.coalesce("block_score", F.lit(0)).alias("block_score"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        )
        .withColumn("blocked", F.col("block_score") >= threshold)
    )


def ks_statistic(
    df: DataFrame,
    value_col: str,
    flag_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the integer
    ``value_col`` distributions of the ``flag_col``-true vs -false slices
    — the distribution-shift gate JS divergence (token-level) can't
    express for NUMERIC signals (doc length drift, quality-score drift
    between snapshots or sources). 1-row output
    (n_a, n_b, ks_num, ks, at_value): ks = max over values of
    |CDF_a − CDF_b|, with at_value the smallest value attaining it.

    Exactness discipline: the comparison runs on the INTEGER lattice —
    the max is over |cum_a·n_b − cum_b·n_a| (bigint), divided once at the
    end — so the statistic is bit-stable at any partitioning and equal to
    the DuckDB oracle's. Scale shape: one hash aggregate onto the distinct
    value histogram, then ONE unpartitioned window over that histogram —
    bounded by the value domain, never by row count (same documented
    bounded-histogram discipline as quantile_threshold) — and a final
    ordered-struct max (plain aggregate, map-side partial)."""
    from pyspark.sql import Window

    a = F.when(F.col(flag_col), 1).otherwise(0)
    hist = (
        df.select(F.col(value_col).cast("bigint").alias("v"), a.alias("_a"))
        .groupBy("v")
        .agg(
            F.sum("_a").cast("bigint").alias("ca"),
            F.sum(F.lit(1) - F.col("_a")).cast("bigint").alias("cb"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    totals = hist.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    diff = cum.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("d"),
        "v",
    )
    # argmax d, tie -> min v: max over the lexicographic struct (d, -v).
    best = diff.groupBy("n_a", "n_b").agg(
        F.max(
            F.struct(F.col("d").alias("d"), (-F.col("v")).alias("nv"))
        ).alias("s")
    )
    return best.select(
        "n_a",
        "n_b",
        F.col("s.d").alias("ks_num"),
        F.round(F.col("s.d") / (F.col("n_a") * F.col("n_b")), 6).alias("ks"),
        (-F.col("s.nv")).alias("at_value"),
    )


def signal_correlations(
    df: DataFrame, cols: list[str], decimals: int = 6
) -> DataFrame:
    """Pearson correlation matrix over INTEGER signal columns — the
    quality-signal redundancy audit (two signals correlating at 0.98 gate
    the same documents; drop one before fitting mixture weights). One row
    per unordered column pair: (col_x, col_y, n, r).

    Why not ``F.corr``: float running sums are partition-order-dependent,
    so the last bits differ run-to-run and engine-to-engine. Here every
    moment (Σx, Σy, Σxy, Σx², Σy²) accumulates as BIGINT — associative,
    bit-exact at any parallelism — and the float formula runs ONCE on the
    1-row totals. Inputs must be integral (cast enforced); overflow needs
    n·max(x)·max(y) < 2^63, satisfied by any per-document count signal.
    Scale shape: ONE aggregate over the data (all pairs' moments in the
    same pass, map-side partials), then a constant-width 1-row expansion."""
    ints = [F.col(c).cast("bigint").alias(c) for c in cols]
    d = df.select(*ints)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    for x, y in pairs:
        aggs.append(F.sum(F.col(x) * F.col(y)).alias(f"sxy_{x}_{y}"))
    moments = d.agg(*aggs)
    rows = []
    for x, y in pairs:
        n = F.col("n")
        num = n * F.col(f"sxy_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        vx = n * F.col(f"ss_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")
        vy = n * F.col(f"ss_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")
        rows.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                n.alias("n"),
                F.when(
                    (vx > 0) & (vy > 0),
                    F.round(
                        num / F.sqrt(vx.cast("double") * vy.cast("double")),
                        decimals,
                    ),
                ).alias("r"),
            )
        )
    return moments.select(
        F.explode(F.array(*rows)).alias("p")
    ).select("p.col_x", "p.col_y", "p.n", "p.r")
