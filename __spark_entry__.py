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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(hq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(hq.ORACLES)
