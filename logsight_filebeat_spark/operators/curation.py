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
from logsight_filebeat_spark.functions.caching import track_persist
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
    of node data. Labels persist per round through the tracked-cache
    registry (caller frees with release_persisted after its action);
    ``max_iterations`` bounds the worst case (a path graph) — on real
    near-dup graphs 3-5 rounds close."""
    edges = track_persist(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).union(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
    )
    labels = track_persist(
        edges.select(F.col("src").alias("id")).distinct().withColumn(
            "comp", F.col("id")
        )
    )
    for _ in range(max_iterations):
        msgs = (
            edges.join(labels, edges["dst"] == labels["id"])
            .select(F.col("src").alias("id"), F.col("comp"))
        )
        new_labels = track_persist(
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
