"""Sessionization truth table (SURVEY §2.7, reference mes_etl.py:96-110 /
ref/RCO_MES_ETL.R:112-124) on tiny in-memory frames."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.operators.sessionize import (
    co_trigger_column,
    rco_session_trigger,
    sessionize,
    sessionize_simple_gap,
)

T0 = datetime(2024, 1, 1, 6, 0, 0)
P = 30.0  # trigger parameter, minutes


def _frame(spark, rows):
    """rows: (line, start_min, cause, brand). END = start (zero duration)."""
    data = [
        (f"e{i}", line, T0 + timedelta(minutes=m), T0 + timedelta(minutes=m), c, b)
        for i, (line, m, c, b) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "id string, LINE string, START_TIME timestamp, END_TIME timestamp, cause string, BRANDCODE string"
    )


def _sessions(spark, rows, split_on_cause=False):
    df = _frame(spark, rows)
    w = Window.partitionBy("LINE").orderBy("START_TIME", "id")
    df = (
        df.withColumn("prev_end", F.lag("END_TIME").over(w))
        .withColumn("prev_cause", F.lag("cause").over(w))
        .withColumn("prev_brand", F.lag("BRANDCODE").over(w))
    )
    gap = (F.col("START_TIME").cast("double") - F.col("prev_end").cast("double")) / 60.0
    trig = rco_session_trigger(
        gap_minutes=gap,
        same_line=F.lit(True),
        same_trigger_col=F.col("cause").eqNullSafe(F.col("prev_cause")),
        same_brandcode=F.col("BRANDCODE").eqNullSafe(F.col("prev_brand")),
        p=P,
        split_on_cause_change=split_on_cause,
    )
    out = sessionize(df, trig, ["LINE"], ["START_TIME", "id"])
    return [
        (r.id, r.session_num)
        for r in out.orderBy("LINE", "START_TIME", "id").collect()
    ]


def test_clause1_same_cause_within_p(spark):
    # gap 29 < P with same cause/brand -> continue; gap 31 same cause, diff
    # brand -> clause 1 still continues (cause+line only)
    rows = [("L1", 0, "CO", "A"), ("L1", 29, "CO", "A"), ("L1", 29 + 29.5, "CO", "B")]
    assert [s for _, s in _sessions(spark, rows)] == [1, 1, 1]


def test_clause2_same_cause_brand_within_4_3p(spark):
    # gap 35 (P..4/3P): same cause+brand continues, same cause diff brand splits
    rows = [("L1", 0, "CO", "A"), ("L1", 35, "CO", "A"), ("L1", 70, "CO", "B")]
    assert [s for _, s in _sessions(spark, rows)] == [1, 1, 2]


def test_clause3_same_brand_within_p(spark):
    # diff cause, same brand, gap 25 < P -> continue
    rows = [("L1", 0, "CO", "A"), ("L1", 25, "Fail", "A")]
    assert [s for _, s in _sessions(spark, rows)] == [1, 1]


def test_clause4_any_within_2_3p(spark):
    # diff cause+brand: gap 19 (<2/3P=20) continues, gap 21 splits
    rows = [("L1", 0, "CO", "A"), ("L1", 19, "Fail", "B"), ("L1", 19 + 21, "Jam", "C")]
    assert [s for _, s in _sessions(spark, rows)] == [1, 1, 2]


def test_gap_at_least_4_3p_always_splits(spark):
    rows = [("L1", 0, "CO", "A"), ("L1", 40.0001, "CO", "A")]
    assert [s for _, s in _sessions(spark, rows)] == [1, 2]


def test_lines_are_independent(spark):
    rows = [("L1", 0, "CO", "A"), ("L2", 1, "CO", "A"), ("L1", 5, "CO", "A")]
    got = dict(_sessions(spark, rows))
    assert got["e0"] == 1 and got["e2"] == 1  # same L1 session
    assert got["e1"] == 1  # L2 starts its own numbering


def test_split_on_cause_model_forces_split(spark):
    # Split_COs_based_on_Cause_Model: cause change always splits even
    # within 2/3P (reference mes_etl.py:114-115, R:126-132)
    rows = [("L1", 0, "CO", "A"), ("L1", 10, "Fail", "A")]
    assert [s for _, s in _sessions(spark, rows, split_on_cause=True)] == [1, 2]
    # same cause still merges
    rows2 = [("L1", 0, "CO", "A"), ("L1", 10, "CO", "A")]
    assert [s for _, s in _sessions(spark, rows2, split_on_cause=True)] == [1, 1]


def test_null_brand_is_not_equal(spark):
    # NULL brandcode: pandas NaN==NaN is False in the reference loop ->
    # brand clauses don't fire; clause 4 (19<20) still merges
    rows = [("L1", 0, "CO", None), ("L1", 19, "Fail", None)]
    assert [s for _, s in _sessions(spark, rows)] == [1, 1]


def test_every_event_in_exactly_one_session(spark):
    rows = [("L1", i * 13.0, "CO" if i % 3 else "Fail", "A" if i % 2 else "B") for i in range(20)]
    got = _sessions(spark, rows)
    assert len(got) == 20
    nums = [s for _, s in got]
    assert nums == sorted(nums)  # monotone per line


def test_co_trigger_column_concat(spark):
    df = spark.createDataFrame(
        [("a", "b", None)], "CAUSE_LEVELS_1_NAME string, CAUSE_LEVELS_2_NAME string, CAUSE_LEVELS_3_NAME string"
    )
    assert df.select(co_trigger_column().alias("t")).first().t == "a - b - "


def test_simple_gap_sessionize(spark):
    df = _frame(spark, [("L1", 0, "x", "A"), ("L1", 10, "x", "A"), ("L1", 100, "x", "A")])
    out = sessionize_simple_gap(df, "START_TIME", ["LINE"], gap_minutes=30.0, order_by=["START_TIME", "id"])
    nums = [r.session_num for r in out.orderBy("START_TIME").collect()]
    assert nums == [1, 1, 2]


def test_changeover_failure_suppression_gap(spark):
    # Lima SUD rule (reference mes_etl.py:119-122, R:134-139): a
    # 'Changeover Failure' within the suppression gap continues the
    # session even when every normal continuation clause fails.
    from datetime import datetime, timedelta

    from fhc_rco_etl_scalable_spark.plans.rco_pipeline import (
        SiteParams,
        detect_changeovers,
    )

    t0 = datetime(2024, 1, 1)
    schema = (
        "downtime_id string, LINE string, START_TIME timestamp, END_TIME timestamp,"
        " DOWNTIME double, UPTIME double, BRANDCODE string,"
        " CAUSE_LEVELS_1_NAME string, CAUSE_LEVELS_2_NAME string,"
        " CAUSE_LEVELS_3_NAME string, CAUSE_LEVELS_4_NAME string,"
        " MACHINE string, OPERATOR_COMMENT string"
    )

    def row(i, start_min, c2):
        start = t0 + timedelta(minutes=start_min)
        return (
            f"e{i}", "L1", start, start + timedelta(minutes=5.0), 5.0, 1.0,
            "A", "Planned Downtime", c2, None, None, "L1 CM", "c",
        )

    rows = [
        row(0, 0, "Changeover"),
        # gap 50 min: cause differs so clauses 1-2 fail, clause 3
        # (same brand, gap<P=30) fails, clause 4 (gap<20) fails.
        row(1, 55, "Changeover Failure"),
        # gap 75 min from e1's end (65): beyond the suppression gap,
        # and the cause no longer mentions 'Changeover Failure'.
        row(2, 140, "Changeover"),
    ]
    df = spark.createDataFrame(rows, schema)

    plain = detect_changeovers(df, SiteParams())
    assert plain.select("CO_Identifier").distinct().count() == 3

    suppressed = detect_changeovers(
        df, SiteParams(changeover_failure_suppression_gap_min=60.0)
    )
    assert suppressed.select("CO_Identifier").distinct().count() == 2


def _stitched_vs_plain(spark, rows, bucket_minutes):
    """Run plain and stitched sessionization (with session IDs) on the
    same fixture; return both [(id, session_num, session_id)] lists."""
    from fhc_rco_etl_scalable_spark.operators.sessionize import sessionize_stitched

    df = _frame(spark, rows)
    trig_expr = rco_session_trigger(
        gap_minutes=(F.col("START_TIME").cast("double") - F.col("prev_end").cast("double")) / 60.0,
        same_line=F.lit(True),
        same_trigger_col=F.col("cause").eqNullSafe(F.col("prev_cause")),
        same_brandcode=F.col("BRANDCODE").eqNullSafe(F.col("prev_brand")),
        p=P,
    )
    sess_id = F.concat_ws("-", F.col("LINE"), F.col("id"))

    w = Window.partitionBy("LINE").orderBy("START_TIME", "id")
    plain = sessionize(
        df.withColumn("prev_end", F.lag("END_TIME").over(w))
        .withColumn("prev_cause", F.lag("cause").over(w))
        .withColumn("prev_brand", F.lag("BRANDCODE").over(w)),
        trig_expr, ["LINE"], ["START_TIME", "id"],
        session_id=sess_id,
    )
    stitched = sessionize_stitched(
        df, trig_expr, ["LINE"], ["START_TIME", "id"],
        bucket=F.window("START_TIME", f"{bucket_minutes} minutes").getField("start"),
        prev_cols={"prev_end": "END_TIME", "prev_cause": "cause", "prev_brand": "BRANDCODE"},
        session_id=sess_id,
    )
    key = lambda out: [
        (r.id, r.session_num, r.session_id)
        for r in out.orderBy("LINE", "START_TIME", "id").collect()
    ]
    return key(plain), key(stitched)


def test_stitched_equals_plain_across_boundaries(spark):
    # Sessions deliberately straddle 60-min buckets; L2 has a long gap
    # spanning EMPTY buckets (carry must come from the last non-empty
    # bucket, not the adjacent one).
    rows = [
        ("L1", 0, "CO", "A"), ("L1", 50, "CO", "A"), ("L1", 75, "CO", "A"),
        ("L1", 100, "CO", "A"),  # one session across 2 boundaries
        ("L1", 200, "XX", "B"), ("L1", 215, "XX", "B"),  # new session
        ("L2", 30, "CO", "A"), ("L2", 59, "CO", "A"),
        ("L2", 400, "CO", "A"),  # 5+ empty buckets later -> new session
        ("L2", 410, "CO", "A"),
    ]
    plain, stitched = _stitched_vs_plain(spark, rows, bucket_minutes=60)
    assert plain == stitched
    nums = dict((i, n) for i, n, _ in plain)
    # e1@50..e3@100 (gaps 25) straddle the 60- and 120-min boundaries
    assert nums["e1"] == nums["e3"]  # straddling session stayed merged
    assert nums["e0"] != nums["e1"]  # gap 50 splits (all clauses miss)


def test_stitched_equals_plain_randomized(spark):
    import random

    rng = random.Random(42)
    rows = []
    for line in ("A", "B", "C"):
        t = 0.0
        for _ in range(60):
            t += rng.choice([3, 10, 25, 45, 70])
            rows.append(
                (line, t, rng.choice(["CO", "ST"]), rng.choice(["X", "Y"]))
            )
    plain, stitched = _stitched_vs_plain(spark, rows, bucket_minutes=47)
    assert plain == stitched


def test_sessionize_rejects_output_name_collisions(spark):
    """ADVICE r12 discipline generalized (schemas.ensure_absent):
    sessionize/sessionize_stitched/interval_overlap_join fail fast
    when the input already carries an output or working column name —
    withColumn would silently replace the user's data."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from fhc_rco_etl_scalable_spark.operators.interval_join import (
        interval_overlap_join,
    )
    from fhc_rco_etl_scalable_spark.operators.sessionize import (
        sessionize,
        sessionize_stitched,
    )

    df = spark.createDataFrame(
        [("L1", 1, 7)], "LINE string, ts long, session_num long"
    )
    with _pytest.raises(ValueError, match="collide"):
        sessionize(df, F.lit(1), ["LINE"], ["ts"])
    # custom name avoids the clash
    out = sessionize(df, F.lit(1), ["LINE"], ["ts"], session_col="sn")
    assert out.columns == ["LINE", "ts", "session_num", "sn"]
    df2 = spark.createDataFrame(
        [("L1", 1, 5)], "LINE string, ts long, __bkt long"
    )
    with _pytest.raises(ValueError, match="collide"):
        sessionize_stitched(
            df2, F.lit(1), ["LINE"], ["ts"], F.lit(0), {"prev_ts": "ts"}
        )
    iv = spark.createDataFrame(
        [("L1", 0, 10, 1)], "LINE string, s long, e long, __bucket long"
    )
    pt = spark.createDataFrame([("L1", 5)], "LINE string, ts long")
    with _pytest.raises(ValueError, match="collide"):
        interval_overlap_join(
            iv, pt, ["LINE"], "s", "e", "ts", bucketed=True
        )
