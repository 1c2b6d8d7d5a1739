"""As-of joins (J5/J6) and interval-overlap joins (J7/J8) on tiny frames."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.operators.asof import asof_join, asof_join_range
from fhc_rco_etl_scalable_spark.operators.interval_join import interval_overlap_join

T0 = datetime(2024, 1, 1)


def _ts(m):
    return T0 + timedelta(minutes=m)


def _left(spark):
    return spark.createDataFrame(
        [("k1", _ts(10), "a1"), ("k1", _ts(30), "a2"), ("k2", _ts(5), "a3")],
        "k string, lts timestamp, lid string",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            ("k1", _ts(0), "r0"),
            ("k1", _ts(10), "r1"),  # ties a1's ts exactly
            ("k1", _ts(20), "r2"),
            ("k2", _ts(50), "r3"),
        ],
        "k string, rts timestamp, rid string",
    )


def test_asof_backward_nonstrict_includes_tie(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["rid"], direction="backward", strict=False, tie_break=["rid"],
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got == {"a1": "r1", "a2": "r2", "a3": None}


def test_asof_backward_strict_excludes_tie(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["rid"], direction="backward", strict=True, tie_break=["rid"],
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got == {"a1": "r0", "a2": "r2", "a3": None}


def test_asof_forward_strict(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["rid"], direction="forward", strict=True, tie_break=["rid"],
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got == {"a1": "r2", "a2": None, "a3": "r3"}


def test_asof_forward_nonstrict_includes_tie(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["rid"], direction="forward", strict=False, tie_break=["rid"],
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got == {"a1": "r1", "a2": None, "a3": "r3"}


def test_asof_range_with_preference(spark):
    # Reference J5: last event in (lower, upper], preferring flagged rows
    # (mes_etl.py:198-207 prefers START_TIME_of_Uptime < CO start).
    anchors = spark.createDataFrame(
        [("k1", _ts(0), _ts(25), 1)], "k string, lo timestamp, hi timestamp, __anchor_id int"
    )
    events = spark.createDataFrame(
        [("k1", _ts(10), "e1", True), ("k1", _ts(20), "e2", False)],
        "k string, ets timestamp, eid string, pref boolean",
    )
    out = asof_join_range(
        anchors, events, on=["k"], lower=F.col("lo"), upper=F.col("hi"),
        event_ts="ets", pick="last", prefer=F.col("ev_pref") == True,  # noqa: E712
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].ev_eid == "e1"  # preferred beats later


def _intervals(spark):
    return spark.createDataFrame(
        [("k1", _ts(0), _ts(10), "i1"), ("k1", _ts(20), _ts(30), "i2")],
        "k string, s timestamp, e timestamp, iid string",
    )


def _points(spark):
    return spark.createDataFrame(
        [("k1", _ts(0), "p0"), ("k1", _ts(9), "p1"), ("k1", _ts(10), "p2"),
         ("k1", _ts(25), "p3"), ("k2", _ts(5), "p4")],
        "k string, pts timestamp, pid string",
    )


def test_interval_overlap_half_open(spark):
    out = interval_overlap_join(
        _intervals(spark), _points(spark), on=["k"],
        interval_start="s", interval_end="e", point_ts="pts",
    )
    got = sorted((r.iid, r.pid) for r in out.collect())
    # p2 at exactly e of i1 excluded (half-open); p4 wrong key excluded
    assert got == [("i1", "p0"), ("i1", "p1"), ("i2", "p3")]


def test_interval_overlap_bucketed_matches_plain(spark):
    plain = interval_overlap_join(
        _intervals(spark), _points(spark), on=["k"],
        interval_start="s", interval_end="e", point_ts="pts",
    )
    bucketed = interval_overlap_join(
        _intervals(spark), _points(spark), on=["k"],
        interval_start="s", interval_end="e", point_ts="pts",
        bucketed=True, bucket_seconds=300,
    )
    a = sorted((r.iid, r.pid) for r in plain.collect())
    b = sorted((r.iid, r.pid) for r in bucketed.select("iid", "pid").collect())
    assert a == b


def test_asof_null_value_and_multi_col_atomicity(spark):
    # ADVICE r1: the nearest right row must win ATOMICALLY — a NULL
    # field of that row stays NULL (no older value leaking through),
    # and multiple value_cols always come from the same right row.
    left = spark.createDataFrame(
        [("k1", _ts(25), "a1")], "k string, lts timestamp, lid string"
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts(0), "old", 1.0),
            ("k1", _ts(20), None, 2.0),  # nearest row: NULL rid, real val
        ],
        "k string, rts timestamp, rid string, val double",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["rid", "val"], direction="backward", tie_break=["val"],
    )
    row = out.collect()[0]
    assert row.rid is None  # NOT 'old' — nearest row's NULL is kept
    assert row.val == 2.0  # both picks from the same (nearest) row
