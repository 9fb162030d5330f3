"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline query at sf0.001;
``queries()``/``oracle_sql()`` expose the operator registry from
logsight_filebeat_spark.entry_queries, verified against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: the full north-rule pages pipeline
    (multiline join → grok parse → map+validate → broadcast enrich → route →
    per-(sink, warc_ts-hour) aggregates) over the input_hint pages table."""
    from logsight_filebeat_spark.entry_queries import QUERIES

    return QUERIES["pg_flagship"](spark, "/root/testdata/sf0.001")


def _driver_verified() -> set[str]:
    """Names already green in a past round's driver artifact. The driver's
    correctness window covers the FIRST 50 registry entries only, so
    ``queries()`` rotates never-driver-verified entries to the front each
    round — otherwise the newest ~70 queries would never get a driver
    verdict. Read dynamically from the committed CORRECTNESS_r*.json so
    the rotation continues automatically in later rounds. (Every query,
    windowed or not, is additionally value-exact-verified each round by
    tools/check_correctness.py; the sweep is committed as
    CORRECTNESS_local_r*.json.)"""
    import glob
    import json

    seen: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                seen.update(json.load(fh).keys())
        except (OSError, ValueError):
            continue
    return seen


# Queries whose IMPLEMENTATION or oracle changed in the current round —
# they outrank plain never-verified entries in the driver window (a changed
# query needs a fresh driver verdict even if an old artifact covered the
# previous behavior). Maintained per round.
_ROUND_CHANGED = [
    # round 4 final batch (newest first: the window is the first 50
    # entries, so order here is the priority order): BFS/reciprocity/
    # CUSUM/recrawl/winsorize/keep-best/KMV-ops/readability/entropy/MMR/
    # bloom-gate/PQ, plus tx_bucketed_join's idempotent-write change
    "wg_spam_mass", "ir_snippets", "dd_lsh_curve", "tx_pii_audit", "tx_blockwords", "tx_mojibake", "dd_soft_dedup", "mm_phash", "ev_abtest", "ann_ivfpq_topk", "st_hll", "ir_prf", "op_base64", "st_bloom", "pg_mirror_families", "ev_hll_sliding", "wg_bfs", "wg_recip", "ev_cusum", "pg_recrawl", "tx_winsorize",
    "dd_norm_best", "tx_kmv_ops", "tx_readability", "tx_entropy",
    "ir_mmr", "dd_bloom_gate", "ann_pq_topk",
    # round 4 late additions + iteration-barrier plan changes
    "pg_mirrors", "ev_outliers", "pg_path_rollup", "tx_bootstrap", "pg_dpp", "dd_cdc_chunks", "dd_novelty", "wg_walks", "pg_frontier", "tx_bucketed_join", "pg_cdc_apply", "pg_scd2",
    "wg_kcore", "st_ewma", "pg_domain_quality", "lf_ndjson", "st_ndjson",
    "tx_compaction", "tx_snapshot_expiry", "ev_seasonal", "wg_host_features",
    "dd_interleave",
    "tx_classifier_eval", "en_useragent", "en_url_parts", "op_severity",
    "dd_curation_cc",
    "wg_canonical",
    # round 4: new surface
    "op_dissect_ordered", "st_multiline", "ir_phrase", "tx_bloom",
    "warc_harvest", "pg_group_split", "pg_crawl_diff", "dd_containment",
    "dd_hrw_shards", "tx_vocab_by_lang", "dd_mixture_plan", "dd_lsh_eval",
    "op_kv", "op_kv_pairs", "op_syslog", "pg_robots", "st_sessions",
    "st_ss_join", "ev_funnel", "ev_retention",
    # round 4: Beats processor suite
    "op_when", "op_proc_chain", "op_decode_json", "op_decode_csv",
    "op_fingerprint", "op_truncate", "op_urldecode", "op_rate_limit",
    "op_mime", "op_network", "op_timestamp", "op_proc_chain2",
    "ev_community_id", "ev_ewma", "en_geoip", "ev_transitions",
    "ev_state_runs", "ev_quantiles", "ev_paths", "wg_triangles",
    "wg_trustrank", "wg_cocitation", "tx_vocab_hll", "tx_vocab_hll_est", "ir_ql", "ir_eval", "ev_hopping",
    # round 4: behavior/plan changes (persist+hint, densified baseline,
    # left-join model, PSL depth, salted default, index replay)
    "wg_canonical", "ev_anomaly", "tx_lm_score", "pg_etld1", "pg_host_cap",
    "dd_incremental", "dd_sample",
]


def _rotated(mapping: dict) -> dict:
    seen = _driver_verified()
    changed = {k: mapping[k] for k in _ROUND_CHANGED if k in mapping}
    unseen = {
        k: v for k, v in mapping.items() if k not in seen and k not in changed
    }
    rest = {
        k: v for k, v in mapping.items() if k in seen and k not in changed
    }
    return {**changed, **unseen, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logsight_filebeat_spark.entry_queries import QUERIES

    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from logsight_filebeat_spark.entry_queries import ORACLES

    return _rotated(dict(ORACLES))
