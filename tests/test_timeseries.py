"""Gap-fill (time_bucket_gapfill-style) truth tables on tiny frames."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.operators.timeseries import gapfill, time_bucket

DAY = 86_400


def _events(spark):
    # k1: days 1,2,5,6 observed (gap at 3,4); k2: single day.
    rows = [
        ("k1", datetime(2024, 1, 1, 8), 10.0),
        ("k1", datetime(2024, 1, 1, 20), 20.0),  # day1 avg 15
        ("k1", datetime(2024, 1, 2, 12), 30.0),  # day2 avg 30
        ("k1", datetime(2024, 1, 5, 1), 60.0),  # day5 avg 60
        ("k1", datetime(2024, 1, 6, 9), 0.0),  # day6 avg 0
        ("k2", datetime(2024, 1, 3, 3), 7.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, x double")


def _fill(spark):
    out = gapfill(
        _events(spark),
        keys=["k"],
        ts_col="ts",
        bucket_seconds=DAY,
        agg=F.round(F.avg("x"), 6),
        value_name="x",
    )
    return {
        (r["k"], r["bucket"].day): (r["x"], r["x_locf"], r["x_interp"])
        for r in out.collect()
    }


def test_time_bucket_epoch_aligned(spark):
    df = spark.range(1).select(
        time_bucket(F.lit("2024-03-07 13:45:12").cast("timestamp"), DAY).alias("d"),
        time_bucket(F.lit("2024-03-07 13:45:12").cast("timestamp"), 3600).alias("h"),
    )
    row = df.first()
    assert row["d"] == datetime(2024, 3, 7)
    assert row["h"] == datetime(2024, 3, 7, 13)


def test_grid_is_dense_per_key(spark):
    got = _fill(spark)
    assert {d for (k, d) in got if k == "k1"} == {1, 2, 3, 4, 5, 6}
    assert {d for (k, d) in got if k == "k2"} == {3}


def test_observed_rows_pass_through(spark):
    got = _fill(spark)
    for day, v in [(1, 15.0), (2, 30.0), (5, 60.0), (6, 0.0)]:
        x, locf, interp = got[("k1", day)]
        assert x == v and locf == v and interp == v


def test_gap_rows_locf_and_linear_interp(spark):
    got = _fill(spark)
    # gap days 3,4 sit between day2=30 and day5=60: interp 40, 50.
    for day, want in [(3, 40.0), (4, 50.0)]:
        x, locf, interp = got[("k1", day)]
        assert x is None
        assert locf == 30.0
        assert interp == pytest.approx(want)


def test_single_observation_key_has_no_gap_rows(spark):
    got = _fill(spark)
    assert got[("k2", 3)] == (7.0, 7.0, 7.0)


def _series(spark, vals):
    from datetime import timedelta

    t0 = datetime(2024, 1, 1)
    rows = [
        ("k", t0 + timedelta(seconds=i), float(v), i) for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, x double, id long")


def test_lttb_keeps_endpoints_and_widest_swing(spark):
    from fhc_rco_etl_scalable_spark.operators.timeseries import lttb_downsample

    # 9 points, 3 buckets (rn*3 DIV 9): {0,1,2} {3,4,5} {6,7,8}.
    # Flat except a spike at rn=4 — the interior bucket must pick it
    # (area = |at0 - at2| * v against flat zero anchors).
    df = _series(spark, [0, 0, 0, 1, 100, 2, 0, 0, 0])
    out = lttb_downsample(df, ["k"], "ts", "x", "id", n_out=3)
    got = sorted((r["bucket"], r["ts"].second, r["x"]) for r in out.collect())
    assert got == [(0, 0, 0.0), (1, 4, 100.0), (2, 8, 0.0)]


def test_lttb_short_series_keeps_both_endpoints(spark):
    from fhc_rco_etl_scalable_spark.operators.timeseries import lttb_downsample

    # A series shorter than n_out never reaches bucket n_out-1:
    # endpoint retention is positional, not bucket-indexed.
    df = _series(spark, [5, 7])
    out = lttb_downsample(df, ["k"], "ts", "x", "id", n_out=12)
    assert sorted(r["x"] for r in out.collect()) == [5.0, 7.0]


def test_lttb_downsamples_to_n_out(spark):
    from fhc_rco_etl_scalable_spark.operators.timeseries import lttb_downsample

    df = _series(spark, list(range(100)))
    out = lttb_downsample(df, ["k"], "ts", "x", "id", n_out=10)
    rows = out.collect()
    assert len(rows) == 10
    xs = {r["x"] for r in rows}
    assert {0.0, 99.0} <= xs  # endpoints survive
