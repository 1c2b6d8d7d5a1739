"""End-to-end domain pipeline test with hand-computed expectations.

Timeline (minutes from T0=2024-01-01 06:00), line L1, P=30:
  CO events (cause2='Changeover'): d01@0(dt10,A) d02@20(dt5,B) d03@60(dt5,B)
    -> one session (gaps 10<30; 35<40 same-cause+brand), then d04@120(dt20,B)
    -> new session (gap 55)
  Context stops (cause2='Failure'): f01@-30(A,up50) f02@90(B,up20,dt2)
    f03@160(C,up10,dt3)
Line L2: e01@50 CO (X); g01@10(X,up100) g02@100(X,up40,dt4) -> brand
never changes.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.plans.rco_pipeline import SiteParams, mes_etl

T0 = datetime(2024, 1, 1, 6, 0)


def _ev(did, line, start_min, dt_min, up_min, brand, cause2, planned=0, idle=0, excl=False):
    start = T0 + timedelta(minutes=start_min)
    return (
        did, line, start, start + timedelta(minutes=dt_min), float(dt_min),
        float(up_min), brand, "Unplanned Downtime", cause2, None, None,
        f"{line} M1", f"comment 'quoted'\nline", planned, idle, excl,
    )


SCHEMA = (
    "downtime_id string, LINE string, START_TIME timestamp, END_TIME timestamp,"
    " DOWNTIME double, UPTIME double, BRANDCODE string, CAUSE_LEVELS_1_NAME string,"
    " CAUSE_LEVELS_2_NAME string, CAUSE_LEVELS_3_NAME string,"
    " CAUSE_LEVELS_4_NAME string, MACHINE string,"
    " OPERATOR_COMMENT string, Planned_Stop_Check int, Idle_Check int, isExcluded boolean"
)

ROWS = [
    _ev("d01", "L1", 0, 10, 35, "A", "Changeover"),
    _ev("d02", "L1", 20, 5, 5, "B", "Changeover"),
    _ev("d03", "L1", 60, 5, 5, "B", "Changeover"),
    _ev("d04", "L1", 120, 20, 55, "B", "Changeover"),
    _ev("f01", "L1", -30, 2, 50, "A", "Failure"),
    _ev("f02", "L1", 90, 2, 20, "B", "Failure"),
    _ev("f03", "L1", 160, 3, 10, "C", "Failure"),
    _ev("e01", "L2", 50, 10, 30, "X", "Changeover"),
    _ev("g01", "L2", 10, 2, 100, "X", "Failure"),
    _ev("g02", "L2", 100, 4, 40, "X", "Failure"),
]


@pytest.fixture(scope="module")
def outputs(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    site = SiteParams(server="SRV", co_trigger_parameter=30.0)
    outs = mes_etl(line_dt=df, line_dt_full=df, site=site)
    return {k: v.collect() for k, v in outs.items()}


def test_sessions(outputs):
    agg = {r.CO_Identifier: r for r in outputs["CO_Aggregated_Data"]}
    assert set(agg) == {
        "L1 - 2024-01-01 - d01", "L1 - 2024-01-01 - d04", "L2 - 2024-01-01 - e01",
    }
    s1 = agg["L1 - 2024-01-01 - d01"]
    assert s1.Number_of_CO_Events == 3
    assert s1.CO_StartTime == T0
    assert s1.CO_EndTime == T0 + timedelta(minutes=65)
    assert s1.CO_DOWNTIME == 20.0
    assert s1.First_CO_Event_ID == "d01" and s1.Last_CO_Event_ID == "d03"
    s2 = agg["L1 - 2024-01-01 - d04"]
    assert s2.Number_of_CO_Events == 1 and s2.CO_DOWNTIME == 20.0


def test_brandcode_resolution(outputs):
    agg = {r.CO_Identifier: r for r in outputs["CO_Aggregated_Data"]}
    s1 = agg["L1 - 2024-01-01 - d01"]
    # backward: f01 @ -30 in (-60, 0]; forward: d02 uptime-start 15 in (0,120), B != A
    assert s1.Current_BRANDCODE == "A"
    assert s1.Next_BRANDCODE == "B"
    assert s1.Brandcode_Status == "OK"
    s2 = agg["L1 - 2024-01-01 - d04"]
    # backward: f02 @ 90 in (65, 120]; forward: f03 uptime-start 150 in (120, 200), C != B
    assert s2.Current_BRANDCODE == "B"
    assert s2.Next_BRANDCODE == "C"
    assert s2.Brandcode_Status == "OK"
    s3 = agg["L2 - 2024-01-01 - e01"]
    # backward: g01 @ 10 in (-10, 50]; forward: no different brand -> falls back
    assert s3.Current_BRANDCODE == "X"
    assert s3.Next_BRANDCODE == "X"
    assert s3.Brandcode_Status == "Not Changed"


def test_first_stop(outputs):
    fs = {r.CO_Identifier: r for r in outputs["First_Stop_after_CO_Data"]}
    s1 = fs["L1 - 2024-01-01 - d01"]
    assert s1.First_Stop_downtime_id == "f02"
    assert s1.First_Stop_Time == T0 + timedelta(minutes=90)
    assert s1.Uptime_before_First_Stop == 20.0
    assert s1.First_Stop_DOWNTIME == 2.0
    s2 = fs["L1 - 2024-01-01 - d04"]
    assert s2.First_Stop_downtime_id == "f03"
    assert s2.Uptime_before_First_Stop == 10.0
    s3 = fs["L2 - 2024-01-01 - e01"]
    assert s3.First_Stop_downtime_id == "g02"
    assert s3.Uptime_before_First_Stop == 40.0


def test_total_uptime_backfill(outputs):
    agg = {r.CO_Identifier: r for r in outputs["CO_Aggregated_Data"]}
    # S1: slice uptime (f02=20) + next CO first-event uptime (d04=55)
    assert agg["L1 - 2024-01-01 - d01"].Total_Uptime_till_Next_CO == 75.0
    # S2: slice f03=10, no next CO
    assert agg["L1 - 2024-01-01 - d04"].Total_Uptime_till_Next_CO == 10.0
    assert agg["L2 - 2024-01-01 - e01"].Total_Uptime_till_Next_CO == 40.0


def test_event_log(outputs):
    log = outputs["CO_Event_Log"]
    assert {r.downtime_id for r in log} == {"d01", "d02", "d03", "d04", "e01"}
    by_id = {r.downtime_id: r for r in log}
    assert by_id["d02"].CO_Identifier == "L1 - 2024-01-01 - d01"
    # comment scrub: quotes and newlines gone
    assert "'" not in by_id["d01"].OPERATOR_COMMENT
    assert "\n" not in by_id["d01"].OPERATOR_COMMENT
    assert all(r.Server == "SRV" for r in log)


def test_session_bucket_knob_matches_plain(spark, outputs):
    """SiteParams(session_bucket=...) routes detect_changeovers through
    the stitched sessionizer; every output table must match the plain
    plan row-for-row. The hour bucket forces real stitching here: L1's
    first session (d01@06:00 .. d03@07:00) crosses an hour boundary."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    site = SiteParams(server="SRV", co_trigger_parameter=30.0, session_bucket="hour")
    outs = mes_etl(line_dt=df, line_dt_full=df, site=site)
    for name, plain_rows in outputs.items():
        got = outs[name]
        want_cols = plain_rows[0].asDict().keys() if plain_rows else got.columns
        key = lambda rows: sorted(
            tuple(r.asDict()[c] for c in want_cols) for r in rows
        )
        assert key(got.collect()) == key(plain_rows), name
