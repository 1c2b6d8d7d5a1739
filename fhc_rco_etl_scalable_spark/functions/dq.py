"""Data-quality profiling: per-column null/distinct/range stats in ONE
table scan — the ingest-validation primitive for 100 TB loads (schema
drift, null explosions, and key-cardinality regressions surface here
before they poison downstream joins).

Shape: all per-column aggregates ride a single global aggregation
(map-side partials, one reduce), then unpivot to the tall
(column, metric...) frame with ``stack`` — no per-column scans, no
driver loop over columns issuing N jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, numeric_cols: Sequence[str]) -> DataFrame:
    """Profile ``numeric_cols``: (column, n_rows, n_nulls, n_distinct,
    min_v, max_v) per column, computed in one pass.

    ``n_distinct`` is exact here (it's the oracle-comparable contract);
    swap ``countDistinct`` for ``approx_count_distinct`` at the scale
    where exact NDV's per-column shuffle dominates — the HLL variant is
    certified separately (``approx_distinct_stats``).
    """
    cols = list(numeric_cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nulls_{c}`, `__nd_{c}`, `__min_{c}`, `__max_{c}`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_v, max_v)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v")
