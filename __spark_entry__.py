"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's harness-query catalog
(fhc_rco_etl_scalable_spark/plans/harness_queries.py): one entry per
implemented operator from SURVEY.md §2, each paired with a DuckDB
oracle twin.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from fhc_rco_etl_scalable_spark.plans import harness_queries as hq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: attribute-dependent gap sessionization + session agg
    (SURVEY §2.7) on /root/testdata/sf0.001."""
    return hq.q_co_sessionize(spark, "/root/testdata/sf0.001")


# The driver grades at most the first 50 registry entries per round.  Entries
# added after round 2 therefore never received an official CORRECTNESS row
# (they are green under tools/check_oracle.py, the repo's replica of the same
# gate).  Rotate them to the front so round 5 certifies them officially; the
# displaced entries have two rounds of green driver history (CORRECTNESS_r02
# .. r04) and remain covered by the local gate + pytest.
_CERTIFY_FIRST = [
    # ungraded as of CORRECTNESS_r04.json (registry positions 50-69)
    "site_catalog_predicate",
    "streaming_sessionize_harness",
    "flag_lattice",
    "count_distinct_machines",
    "max_positive_per_key",
    "yes_no_decode",
    "dynamic_round",
    "json_flatten",
    "tumbling_window",
    "dedup_clusters",
    "deterministic_sample",
    "stratified_split",
    "corpus_prep",
    "streaming_tumbling_harness",
    "pack_sequences",
    "pii_scrub",
    "session_window_native",
    "percentile_stats",
    "sql_api_pricing_summary",
    "rollup_aggregate",
    # new in round 5 — need their first official row
    "approx_percentile_stats",
    "dedup_clusters_star",
    "sql_api_sessionize",
    "sql_api_asof",
    "sql_api_runtime_per_day",
    "approx_distinct_stats",
    "winnow_fingerprints",
    "tpch_shipping_priority",
    "tpch_local_supplier_volume",
    "cube_aggregate",
    "pivot_event_counts",
    "sliding_time_window",
    "salted_replicate_join",
    "streaming_dedup",
    # re-certify: implementation changed in round 5 (map-side packed
    # vote fold replaced the explode+groupBy signature computation)
    "simhash_dups",
    "simhash_near_dups",
    "dq_profile",
    "tpch_customer_distribution",
    "sql_api_correlated_scalar",
    "sql_api_exists_semi",
    "streaming_interval_join",
    "chunk_documents",
    "build_vocab",
    "winnow_near_dups",
    "embedding_topk_l2",
    "value_histogram",
    "sql_api_interval_join",
    "token_budget_stats",
]


def _rotated(mapping: dict) -> dict:
    front = {n: mapping[n] for n in _CERTIFY_FIRST if n in mapping}
    rest = {n: v for n, v in mapping.items() if n not in front}
    return {**front, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(hq.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(hq.ORACLES))
