"""Stream-stream interval join: the hardest Structured-Streaming join
shape — both sides unbounded, matched on an equi key PLUS an event-time
range, state bounded by watermarks on BOTH inputs.

Spark's planner derives each side's state retention from the time-range
predicate: a view joins purchases within [purchase_ts - lookback,
purchase_ts], so views must be buffered for ``lookback`` past their
event time and purchases until their lookback window's views have
certainly arrived (watermark delay + lookback). Without the range
predicate the join would be rejected (unbounded state on both sides).

The batch twin is a plain equi+range join, so the harness certifies
stream==batch exactly when the watermark delay exceeds the source's
disorder (an availableNow ordered replay has none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lookback: str = "1 hour",
    delay: str = "7 days",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events to left-side events with the same ``key``
    whose time lies in ``[left_time - lookback, left_time]``.

    Both inputs get watermarks (required for state cleanup on a
    stream-stream inner join, and for RESULT COMPLETENESS on an outer
    one); the caller projects/renames columns so the two sides share
    only ``key``.

    ``how='left_outer'`` additionally emits unmatched left rows with
    NULL right columns — but only once the watermark proves no match
    can still arrive (right watermark past ``left_time``), so outer
    results trail the watermark by construction. A replay that must
    drain ALL outer results needs its event-time watermark pushed past
    the last left row's match window — in a bounded harness feed, a
    max-timestamp sentinel row per side does exactly that.
    """
    lw = left.withWatermark(left_time, delay)
    rw = right.withWatermark(right_time, delay)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}"))
        & (
            F.col(f"r.{right_time}")
            >= F.col(f"l.{left_time}") - F.expr(f"INTERVAL {lookback}")
        )
    )
    return lw.alias("l").join(rw.alias("r"), cond, how)
