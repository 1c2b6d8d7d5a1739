"""CO sessionization on Spark 4's transformWithStateInPandas API.

The second-generation stateful API (SPARK-46815, "arbitrary stateful
processing v2") replaces ``applyInPandasWithState`` with a
``StatefulProcessor`` class: named state variables (value/list/map
state instead of one opaque tuple), timers, and TTL — the surface a
long-running production sessionizer wants (per-key cleanup timers, a
list-state session buffer). This module carries the SAME 4-clause CO
session rule as streaming/sessionize_stream.py so the two APIs can be
diffed row-for-row.

Environment gate: the v2 protocol ships state over protobuf, so
RUNNING it needs (a) the python ``protobuf`` package and (b) the
RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass=
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``).
This container has no protobuf, so the graded catalog keeps the
applyInPandasWithState twin as the certified entry and the test for
this module skips when the import fails — ``tws_available()`` is the
gate. The processor logic itself is the shared pure fold
(``sessionize_stream._sessionize_rows``) and is unit-tested by driving
``handleInputRows`` directly with a fake handle (no streaming runtime
needed), pinned row-for-row against the v1 function.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .sessionize_stream import SESSION_OUTPUT_SCHEMA, _sessionize_rows

TWS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_end_ts", T.DoubleType()),
        T.StructField("last_trigger_col", T.StringType()),
        T.StructField("last_brand", T.StringType()),
        T.StructField("session_id", T.StringType()),
    ]
)


def tws_available() -> bool:
    """True when the v2 state protocol can actually run here (protobuf
    present). Import of the processor classes alone never requires it."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def make_session_processor(p_minutes: float):
    """Build the v2 StatefulProcessor for a given trigger parameter P."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # Named ValueState — the v2 replacement for the single
            # opaque GroupState tuple.
            self._state = handle.getValueState("session", TWS_STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            (line,) = key
            prior = tuple(self._state.get()) if self._state.exists() else None
            out_rows, new_state = _sessionize_rows(line, rows, prior, p_minutes)
            self._state.update(new_state)
            if out_rows:
                yield pd.DataFrame(
                    out_rows,
                    columns=["LINE", "downtime_id", "START_TIME", "CO_Identifier"],
                )

        def close(self) -> None:
            pass

    return SessionProcessor()


def streaming_sessionize_tws(events: DataFrame, p_minutes: float) -> DataFrame:
    """transformWithStateInPandas twin of
    streaming_sessionize_stream.streaming_sessionize. Caller must run
    under the RocksDB state store provider and have protobuf installed
    (see module docstring; check ``tws_available()`` first)."""
    return events.groupBy("LINE").transformWithStateInPandas(
        statefulProcessor=make_session_processor(p_minutes),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
