"""Time-series gap-fill: dense bucket grids with LOCF / linear
interpolation (the hypertable ``time_bucket_gapfill`` pattern).

The reference's per-day KPI tables assume a dense day grid per LINE —
days with no MDC rows simply vanish from ``Runtime_Hours_Day``
(reference data_from_mdc.py:237-249), and the downstream R plots
paper over the holes. This operator makes the grid explicit: every
bucket between a key's first and last observation exists in the
output, with the fill policy (NULL / last-observation-carried-forward
/ linear interpolation) a declared column rather than a plotting
accident.

Scale shape (100 TB): the aggregate shuffles once on
``(key, bucket)``; the per-key grid derives from a ``(key)``-keyed
min/max aggregate of the SAME pre-aggregated (tiny) frame, and
``sequence()`` + ``explode`` generates buckets JVM-side with no
driver materialization. Grid size is bounded by
``keys x (span / bucket)`` — independent of raw row count. Both fill
policies are single ordered window passes per key. No Python in the
plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts: Column | str, bucket_seconds: int) -> Column:
    """Truncate a timestamp to a fixed-width bucket (epoch-aligned).

    Integer epoch arithmetic — exact parity with DuckDB's
    ``time_bucket(INTERVAL, ts)`` for widths that divide a day.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    us = F.unix_micros(c)
    width = F.lit(int(bucket_seconds) * 1_000_000).cast("long")
    return F.timestamp_micros((us - ((us % width) + width) % width))


def gapfill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    bucket_seconds: int,
    agg: Column,
    value_name: str = "v",
) -> DataFrame:
    """Aggregate ``agg`` per (keys, bucket), densify each key's bucket
    range, and attach ``<v>_locf`` and ``<v>_interp`` fill columns.

    Output columns: ``keys..., bucket, <v>`` (NULL on gap rows),
    ``<v>_locf`` (last non-null carried forward; NULL before the first
    observation — impossible here since grids start at each key's
    first observed bucket), ``<v>_interp`` (linear interpolation
    between the surrounding observations; equals ``<v>`` on observed
    rows and ``<v>_locf`` after the last observation).

    Interpolation arithmetic is pure IEEE-double on identical inputs
    (bucket epoch seconds + the already-rounded aggregate), so an
    oracle computing the same formula hashes identically.
    """
    keys = list(keys)
    bucket = time_bucket(ts_col, bucket_seconds)
    aggd = (
        df.na.drop(subset=[ts_col])
        .groupBy(*keys, bucket.alias("bucket"))
        .agg(agg.alias(value_name))
    )
    step = F.expr(f"INTERVAL {int(bucket_seconds)} SECOND")
    grid = (
        aggd.groupBy(*keys)
        .agg(F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx"))
        .select(
            *keys,
            F.explode(F.sequence(F.col("__mn"), F.col("__mx"), step)).alias("bucket"),
        )
    )
    dense = grid.join(aggd, on=[*keys, "bucket"], how="left")

    v = F.col(value_name)
    t = F.unix_seconds(F.col("bucket")).cast("double")
    w_back = (
        Window.partitionBy(*keys).orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*keys).orderBy("bucket").rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(w_fwd)
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(
            next_v.isNotNull() & prev_v.isNotNull(),
            prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t),
        ).otherwise(prev_v)
    )
    return dense.select(
        *keys,
        "bucket",
        v.alias(value_name),
        prev_v.alias(f"{value_name}_locf"),
        interp.alias(f"{value_name}_interp"),
    )
