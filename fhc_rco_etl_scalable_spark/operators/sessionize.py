"""Sessionization — the engine's signature operator.

The reference assigns every changeover (CO) event to a session via a
row-loop over a globally sorted frame with a 4-clause gap/attribute
trigger rule (reference: App/etl/transform/mes_etl.py:68-129,
ref/RCO_MES_ETL.R:100-147). Here the same semantics are two window
passes over ``(partition, order)`` — lag to fetch the previous row's
attributes, a boolean trigger expression, a running sum of triggers as
the session number, then ``first(...)`` per session for the ID. All
stages stay inside whole-stage codegen; one shuffle on the partition
key, reused by every subsequent window over the same key.

Scale notes: partitioning is per-LINE (reference compares
``LINE == Previous_LINE`` explicitly over a global sort — per-LINE
window partitions make that guard implicit and the operator
horizontally scalable). A production line emits bounded events/day, so
per-partition data is bounded; if LINE cardinality ≪ cores, composite
partitioning ``(LINE, month)`` with session stitching would apply —
not needed at reference data rates.

Streaming variant: ``session_window`` cannot express the
attribute-dependent gap; see streaming/sessionize_stream.py for the
``applyInPandasWithState`` form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def co_trigger_column(
    c1: str = "CAUSE_LEVELS_1_NAME",
    c2: str = "CAUSE_LEVELS_2_NAME",
    c3: str = "CAUSE_LEVELS_3_NAME",
) -> Column:
    """Cause concatenation used for same-cause comparison.

    Follows the R semantics (ref/RCO_MES_ETL.R:82-87): ``' - '``
    separators with NA→''. (The Python port concatenates raw,
    mes_etl.py:49 — separator choice only affects collision odds; the
    R form is strictly safer.)
    """
    return F.concat_ws(
        " - ", *(F.coalesce(F.col(c), F.lit("")) for c in (c1, c2, c3))
    )


def rco_session_trigger(
    gap_minutes: Column,
    same_line: Column,
    same_trigger_col: Column,
    same_brandcode: Column,
    p: Column | float,
    *,
    split_on_cause_change: bool = False,
    suppress_changeover_failure: Column | None = None,
) -> Column:
    """The 4-clause CO continuation rule → 1 if the row STARTS a new
    session, 0 if it continues the previous one.

    Continuation clauses (reference mes_etl.py:96-108 /
    ref/RCO_MES_ETL.R:112-124) — continue iff any of:

    1. gap < P            and same cause-trigger column and same LINE
    2. gap < P*4/3        and same cause-trigger column and same
                          BRANDCODE and same LINE
    3. gap < P            and same BRANDCODE and same LINE
    4. gap < P*2/3        and same LINE

    Clause 4 follows the documented R semantics ``P/3*2`` (R:111); the
    Python port's ``P*3/2`` (mes_etl.py:106) is a flagged divergence.

    ``split_on_cause_change`` (Split_COs_based_on_Cause_Model,
    mes_etl.py:114-115 / R:126-132) forces a split whenever the cause
    trigger column changes, i.e. clauses 3-4 only count when the cause
    matches too.

    ``suppress_changeover_failure``: optional extra continuation
    predicate (site 'Lima SUD', mes_etl.py:119-122 / R:134-139 —
    implemented with the R operator precedence; the Python port has a
    precedence bug we do not replicate).

    A NULL gap (first row in partition) always starts a session.
    """
    p = F.lit(p) if not isinstance(p, Column) else p
    cont = (
        (same_trigger_col & same_line & (gap_minutes < p))
        | (same_trigger_col & same_brandcode & same_line & (gap_minutes < p * 4 / 3))
    )
    if split_on_cause_change:
        cont = cont | (
            same_trigger_col
            & same_line
            & ((gap_minutes < p) & same_brandcode | (gap_minutes < p * 2 / 3))
        )
    else:
        cont = cont | (
            (same_brandcode & same_line & (gap_minutes < p))
            | (same_line & (gap_minutes < p * 2 / 3))
        )
    if suppress_changeover_failure is not None:
        cont = cont | suppress_changeover_failure
    return F.when(gap_minutes.isNull() | ~cont.eqNullSafe(F.lit(True)), 1).otherwise(0)


def sessionize(
    df: DataFrame,
    trigger: Column,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    session_col: str = "session_num",
    session_id: Column | None = None,
    session_id_col: str = "session_id",
) -> DataFrame:
    """Attach a session number (cumulative trigger sum) and optionally a
    stable session ID (first row's ``session_id`` expression,
    forward-filled — replaces the reference's ffill,
    mes_etl.py:126-129 / R fill(.direction='down') :141-147).

    ``df`` must already contain any lag columns the trigger needs.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn(session_col, F.sum(trigger).over(w))
    if session_id is not None:
        w_sess = (
            Window.partitionBy(*partition_by, session_col)
            .orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = out.withColumn(session_id_col, F.first(session_id).over(w_sess))
    return out


def sessionize_simple_gap(
    df: DataFrame,
    ts_col: str,
    partition_by: Sequence[str],
    gap_minutes: float,
    order_by: Sequence[str] | None = None,
    session_col: str = "session_num",
) -> DataFrame:
    """Plain gap-only sessionization (the degenerate single-threshold
    case; streaming twin is ``F.session_window``)."""
    order_by = list(order_by or [ts_col])
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    prev_ts = F.lag(ts_col).over(w)
    gap_min = (F.col(ts_col).cast("double") - prev_ts.cast("double")) / 60.0
    trigger = F.when(prev_ts.isNull() | (gap_min >= gap_minutes), 1).otherwise(0)
    return sessionize(df, trigger, partition_by, order_by, session_col)
