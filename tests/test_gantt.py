"""Gantt point generation parity: the Spark array+explode generator vs
a direct in-test transcription of the reference loop semantics
(machine_level.py:93-196 + clamp :179-180 + repair :388-394)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.operators.gantt import (
    attach_stops_to_windows,
    generate_gantt_points,
)

T0 = datetime(2024, 1, 1, 6, 0, 0)


def _t(sec):
    return T0 + timedelta(seconds=sec)


def oracle_points(stops, min_t, max_t):
    """Reference loop semantics for one (CO, machine) group.
    stops: ordered [(start_s, dt_s, up_s, id)]; returns (ts, status, id)."""
    one = timedelta(seconds=1)
    pts = []
    s0_start, s0_dt, s0_up, s0_id = stops[0]
    start0, end0 = _t(s0_start), _t(s0_start + s0_dt)
    prev_up_end0 = _t(s0_start - s0_up)
    if min_t < start0 and min_t > prev_up_end0:
        pts += [(min_t, 3.0, s0_id), (start0 - one, 3.0, s0_id), (start0, 2.0, s0_id)]
        if s0_dt > 1:
            pts.append((end0, 2.0, s0_id))
    else:
        pts.append((min_t, 2.0, s0_id))
        if s0_dt > 1:
            pts.append((end0, 2.0, s0_id))
    for start_s, dt_s, up_s, pk in stops[1:]:
        start, end = _t(start_s), _t(start_s + dt_s)
        if up_s >= 2:
            pts.append((pts[-1][0] + one, 3.0, pk))
            pts.append((start - one, 3.0, pk))
        if dt_s > 1:
            pts.append((start, 2.0, pk))
            pts.append((end, 2.0, pk))
    if pts[-1][0] > max_t:
        pts[-1] = (max_t, pts[-1][1], pts[-1][2])
    else:
        pts.append((pts[-1][0] + one, 3.0, ""))
        pts.append((max_t, 3.0, ""))
    # repair pass (engine group-local semantics)
    for i in range(len(pts)):
        if i + 1 < len(pts) and pts[i][0] > pts[i + 1][0] and pts[i][1] != pts[i + 1][1]:
            if i == 0 or pts[i][0] > pts[i - 1][0] + one:
                pts[i] = (pts[i][0] - one, pts[i][1], pts[i][2])
    return pts


def _run(spark, co_start_s, co_end_s, stops):
    co_agg = spark.createDataFrame(
        [("L1", "CO1", _t(co_start_s), _t(co_end_s))],
        "LINE string, CO_Identifier string, CO_StartTime timestamp, CO_EndTime timestamp",
    )
    rows = [
        ("L1", "M1", _t(s), _t(s + dt), dt / 60.0, up / 60.0, pk)
        for s, dt, up, pk in stops
    ]
    st = spark.createDataFrame(
        rows,
        "LINE string, MACHINE string, START_TIME timestamp, END_TIME timestamp,"
        " DOWNTIME double, UPTIME double, downtime_id string",
    )
    windowed = attach_stops_to_windows(co_agg, st)
    out = generate_gantt_points(windowed, status=F.lit(2.0))
    return [
        (r.StartTime, r.Downtime_Status, r.downtime_id)
        for r in out.orderBy("StartTime", "downtime_id").collect()
    ]


CASES = {
    # window start inside preceding uptime; a <=1s downtime skip and a
    # <2s uptime skip mid-stream; tail sentinels
    "in_uptime_with_skips": (
        400, 600,
        [(400, 120, 350, "a"), (700, 60, 180, "b"), (800, 0.5, 30, "c"), (900, 30, 1, "d")],
    ),
    # window start NOT in uptime (stop straddles it); final point
    # overruns the window -> clamp
    "straddle_and_clamp": (400, 600, [(50, 600, 10, "a"), (1400, 300, 700, "b")]),
    # single tiny stop: nothing but the first point + sentinels
    "single_tiny_stop": (400, 600, [(400, 0.5, 500, "a")]),
    # two stops back-to-back with zero uptime between
    "back_to_back": (400, 600, [(400, 100, 400, "a"), (500, 100, 0, "b")]),
}


@pytest.mark.parametrize("name", list(CASES))
def test_gantt_parity(spark, name):
    co_start_s, co_end_s, stops = CASES[name]
    got = _run(spark, co_start_s, co_end_s, stops)
    min_t, max_t = _t(co_start_s - 300), _t(co_end_s + 900)
    want = oracle_points(stops, min_t, max_t)
    want = sorted(want, key=lambda p: (p[0], p[2]))
    assert got == want, f"{name}:\n got={got}\nwant={want}"
