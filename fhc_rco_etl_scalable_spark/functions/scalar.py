"""Scalar column helpers (SURVEY.md §2.9) — all native, zero UDFs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scrub_text(col: Column | str) -> Column:
    """SQL/report-safety scrub: quotes and line breaks → spaces.

    Reference scrubs operator comments with chained str.replace of
    ``'`` , ``\\r\\n`` and ``\\n`` (App/etl/overall_etl.py:147-161,
    App/etl/transform/mes_etl.py:252-253).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"['\r\n]+", " ")


def minutes_between(later: Column, earlier: Column) -> Column:
    """Fractional minutes between two timestamps (reference
    ``.total_seconds()/60``, mes_etl.py:72-73)."""
    return (later.cast("double") - earlier.cast("double")) / 60.0


def ts_plus_minutes(ts: Column, minutes: Column | float) -> Column:
    """Timestamp + fractional minutes (reference ``pd.Timedelta``
    arithmetic, mes_etl.py:182-183). Kept in microsecond integer math
    so sub-second DOWNTIME values survive exactly."""
    m = F.lit(minutes) if not isinstance(minutes, Column) else minutes
    return F.timestamp_micros(
        (F.unix_micros(ts) + (m * 60_000_000).cast("long"))
    )


def ts_plus_seconds(ts: Column, seconds: Column | float) -> Column:
    s = F.lit(seconds) if not isinstance(seconds, Column) else seconds
    return F.timestamp_micros((F.unix_micros(ts) + (s * 1_000_000).cast("long")))


def dynamic_round(df: DataFrame, columns: list[str]) -> DataFrame:
    """R's dataframe_decimal_reducer (ref/RCO_Overall_orchestrator.R:119-131):
    per-column precision keyed on mean magnitude (<0.1→5dp, <1→4dp,
    <10→3dp, <100→2dp, else 1dp).

    One aggregate action computes every mean, then a single select
    applies the rounds — 2 jobs total regardless of column count.
    """
    present = [c for c in columns if c in df.columns]
    if not present:
        return df
    means = df.agg(
        *[F.avg(F.abs(F.col(c))).alias(c) for c in present]
    ).first()

    def digits(mean: float | None) -> int:
        if mean is None:
            return 1
        for bound, d in ((0.1, 5), (1, 4), (10, 3), (100, 2)):
            if mean < bound:
                return d
        return 1

    return df.select(
        *[
            F.round(F.col(c), digits(means[c])).alias(c) if c in present else F.col(c)
            for c in df.columns
        ]
    )
