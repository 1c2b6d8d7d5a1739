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


def robust_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD outlier flagging per key group (the robust z-score:
    a point is an outlier when ``|x - median| > k * 1.4826 * MAD``).

    Mean/stddev outlier rules break on the very anomalies they hunt —
    one 1e9 spike drags the mean past every real outlier. Median and
    MAD have a 50% breakdown point, so the fences hold under heavy
    contamination; 1.4826 rescales MAD to sigma-equivalence under
    normality (Hampel's constant).

    Exactness: both statistics are Spark ``percentile`` (exact
    interpolated), matching DuckDB ``quantile_cont`` bit-for-bit —
    that is what makes the fence hashable by an oracle. At 100 TB
    swap both for ``approx_percentile``: the fences become
    sketch-approximate but the plan shape is unchanged.

    Shape: two (keys)-grouped aggregates with the per-row frame joined
    back each time. The group-stat frames are tiny (one row per key) —
    both joins broadcast, so the raw rows never shuffle.

    NULL semantics (explicit, not accidental): rows with a NULL key
    are DROPPED (the stat joins are equi-joins; a NULL group has no
    meaningful fence — pre-fill keys if those rows must survive), and
    a NULL value is flagged ``is_outlier = false``, never NULL, so
    ``filter(~is_outlier)`` keeps rather than silently discards it.
    """
    keys = list(keys)
    v = F.col(value_col).cast("double")
    med = df.groupBy(*keys).agg(F.percentile(v, F.lit(0.5)).alias("__med"))
    dev = df.join(F.broadcast(med), on=keys).withColumn(
        "__absdev", F.abs(v - F.col("__med"))
    )
    mad = dev.groupBy(*keys).agg(
        F.percentile(F.col("__absdev"), F.lit(0.5)).alias("__mad")
    )
    fenced = dev.join(F.broadcast(mad), on=keys)
    return fenced.withColumn(
        "is_outlier",
        F.coalesce(
            F.col("__absdev") > F.lit(k) * F.lit(1.4826) * F.col("__mad"),
            F.lit(False),
        ),
    )
