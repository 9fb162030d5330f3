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

Near-dup removal semantics: dropping `id_b` of every (id_a < id_b) candidate
pair keeps, per connected near-dup cluster, exactly the docs that are no
pair's higher member — the minimum id always survives. This is the standard
greedy survivor rule (transitive clustering via connected components costs
an iterative join; the greedy rule is the one large corpora actually use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logsight_filebeat_spark.functions import text as tx
from logsight_filebeat_spark.operators.dedup import dedup_exact, minhash_lsh_pairs


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    min_quality: float = 0.5,
) -> DataFrame:
    """Run the full curation chain; returns the surviving documents as
    (id, quality, lang_pred) — id column keeps its input name. Caller
    releases the tracked LSH signature cache after its action
    (functions/caching.py::release_persisted)."""
    d1 = dedup_exact(df, text_col, id_col)
    pairs = minhash_lsh_pairs(
        d1, text_col=text_col, id_col=id_col, n=n,
        num_hashes=num_hashes, bands=bands,
    )
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
