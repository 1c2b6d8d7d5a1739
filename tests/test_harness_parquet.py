"""Regression tests that read the REAL harness parquet from disk.

Round 3 lesson: every other test builds in-memory frames with
``TimestampType``, so 123/123 pytest green coexisted with 18 red driver
rows when the harness regenerated ``events.parquet`` with a different
physical timestamp encoding (micros, no timezone → Spark 4 infers
TIMESTAMP_NTZ → ``unix_micros`` fails at analysis time). These tests pin
the ingestion contract: whatever the parquet writer emitted, ``load_table``
must surface ``TimestampType`` (LTZ) with UTC wall-clock values.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fhc_rco_etl_scalable_spark.sources.parquet import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_events_ts_loads_as_timestamp_ltz(spark):
    ev = load_table(spark, "events", SF_DIR)
    assert dict(ev.dtypes)["ts"] == "timestamp", (
        "ingestion contract: ts must be TIMESTAMP (ltz), got "
        + dict(ev.dtypes)["ts"]
    )
    # The exact call-site pattern that broke in round 3 must analyze.
    from pyspark.sql import functions as F

    out = ev.select(
        F.timestamp_micros(F.unix_micros(F.col("ts")) + F.lit(1)).alias("t")
    )
    assert out.count() > 0


@pytest.mark.parametrize("unit,tz", [("ns", None), ("us", None), ("us", "UTC")])
def test_load_table_normalizes_any_parquet_encoding(spark, tmp_path, unit, tz):
    """nanos / micros-naive / micros-UTC all load as the same ltz values."""
    ts_type = pa.timestamp(unit, tz=tz)
    micros = [1704067200_000000, 1704070800_123456]  # 2024-01-01T00/+1h UTC
    scale = 1000 if unit == "ns" else 1
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([m * scale for m in micros], ts_type),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    df = load_table(spark, "events", sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    from pyspark.sql import functions as F

    got = sorted(
        r["u"] for r in df.select(F.unix_micros("ts").alias("u")).collect()
    )
    assert got == micros, f"encoding {unit}/{tz} not value-preserving: {got}"


def test_all_registered_queries_run_on_harness_parquet(spark):
    """Smoke-run EVERY __spark_entry__.queries() entry at sf0.001.

    This is a miniature of the driver correctness gate: each registered
    query must at least analyze + execute against the real on-disk
    parquet. Catches analysis-time regressions (like the r3 NTZ break)
    across the whole registry, not just the handful with dedicated tests.
    """
    import __spark_entry__ as entry

    failures = {}
    for name, fn in entry.queries().items():
        try:
            n = fn(spark, SF_DIR).count()
            assert n >= 0
        except Exception as e:  # noqa: BLE001 - collect all failures
            failures[name] = f"{type(e).__name__}: {str(e)[:200]}"
    assert not failures, f"{len(failures)} queries failed: {failures}"
