"""State Data Source readers: inspect a streaming checkpoint's state
stores as DataFrames (Spark 4's ``statestore`` / ``state-metadata``
formats).

Production ops surface the reference's scheduled-batch design never
needed but a live streaming deployment does: answer "which sessions
are OPEN right now / what watermark bound is each line carrying"
WITHOUT stopping the query — the reader works on the checkpoint files
beside a running stream, and ``batch_id`` time-travels to any retained
snapshot (state-store versions are kept alongside the commit log, so
debugging 'what did the operator believe at batch N' is a read, not a
replay). At scale the read is partition-parallel over the store files
— no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_operators(spark: SparkSession, checkpoint: str) -> DataFrame:
    """The checkpoint's stateful-operator inventory (operatorId/name,
    store names, partition counts, retained batch range) — the
    ``state-metadata`` format; start here to find operator ids for
    :func:`read_state`."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """Raw state rows (key struct, value struct, partition_id) of one
    operator's store. ``batch_id`` reads a historical snapshot instead
    of the latest committed one."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint)


def open_sessions(
    spark: SparkSession, checkpoint: str, batch_id: int | None = None
) -> DataFrame:
    """The sessionizer's OPEN session per line, decoded from the
    applyInPandasWithState store (streaming/sessionize_stream.py state
    schema): (LINE, session_id, last_end_time, last_trigger_col,
    last_brand). The python state round-trips through the store typed
    — the reader exposes it as ``value.groupState``."""
    st = read_state(spark, checkpoint, batch_id=batch_id)
    g = F.col("value.groupState")
    return st.select(
        F.col("key.LINE").alias("LINE"),
        g["session_id"].alias("session_id"),
        F.timestamp_seconds(g["last_end_ts"]).alias("last_end_time"),
        g["last_trigger_col"].alias("last_trigger_col"),
        g["last_brand"].alias("last_brand"),
    )
