"""Full-pipeline DuckDB oracle: randomized (seeded) domain events run
through mes_etl, compared field-by-field against an independent SQL
implementation of sessionization + neighbor context + as-of brandcode
resolution (reference semantics per SURVEY §2.7/J5/J6)."""

import random
from datetime import datetime, timedelta

import duckdb
import pytest

from fhc_rco_etl_scalable_spark.plans.rco_pipeline import SiteParams, mes_etl

T0 = datetime(2024, 1, 1, 0, 0)
P = 30.0
PAD_MIN = 60.0

SCHEMA = (
    "downtime_id string, LINE string, START_TIME timestamp, END_TIME timestamp,"
    " DOWNTIME double, UPTIME double, BRANDCODE string, CAUSE_LEVELS_1_NAME string,"
    " CAUSE_LEVELS_2_NAME string, CAUSE_LEVELS_3_NAME string, CAUSE_LEVELS_4_NAME string,"
    " MACHINE string, OPERATOR_COMMENT string, Planned_Stop_Check int, Idle_Check int,"
    " isExcluded boolean"
)


def _gen_events(seed: int, n: int = 220):
    rng = random.Random(seed)
    rows = []
    for line in ("L1", "L2", "L3"):
        t = 0.0
        for i in range(n // 3):
            # gaps straddle the trigger thresholds {2/3P, P, 4/3P}
            t += rng.choice([5, 15, 19, 21, 29, 31, 35, 39, 41, 90, 300])
            dt = rng.choice([0.5, 2.0, 5.0, 12.0])
            up = rng.choice([1.0, 3.0, 30.0, 120.0])
            cause2 = rng.choice(["Changeover", "Changeover", "Failure", "Jam"])
            brand = rng.choice(["A", "B", "C", None])
            start = T0 + timedelta(minutes=t)
            rows.append(
                (
                    f"{line}-e{i:03d}", line, start,
                    start + timedelta(minutes=dt), dt, up, brand,
                    "Planned Downtime" if cause2 == "Changeover" else "Unplanned Downtime",
                    cause2, None, None, f"{line} CM", "c", 0, 0, False,
                )
            )
            t += dt
    return rows


ORACLE_SQL = f"""
WITH co AS (
  SELECT * FROM events WHERE CAUSE_LEVELS_2_NAME LIKE '%Changeover%'
),
lagged AS (
  SELECT *,
    concat_ws(' - ', coalesce(CAUSE_LEVELS_1_NAME, ''), coalesce(CAUSE_LEVELS_2_NAME, ''),
              coalesce(CAUSE_LEVELS_3_NAME, '')) AS trig_col,
    lag(END_TIME) OVER w AS prev_end,
    lag(concat_ws(' - ', coalesce(CAUSE_LEVELS_1_NAME, ''), coalesce(CAUSE_LEVELS_2_NAME, ''),
                  coalesce(CAUSE_LEVELS_3_NAME, ''))) OVER w AS prev_trig,
    lag(BRANDCODE) OVER w AS prev_brand
  FROM co
  WINDOW w AS (PARTITION BY LINE ORDER BY START_TIME, downtime_id)
),
trig AS (
  SELECT *,
    CASE WHEN prev_end IS NULL THEN 1
         WHEN (
            (trig_col = prev_trig AND epoch(START_TIME - prev_end)/60.0 < {P})
         OR (trig_col = prev_trig AND (BRANDCODE IS NOT DISTINCT FROM prev_brand)
             AND epoch(START_TIME - prev_end)/60.0 < {P}*4/3)
         OR ((BRANDCODE IS NOT DISTINCT FROM prev_brand)
             AND epoch(START_TIME - prev_end)/60.0 < {P})
         OR (epoch(START_TIME - prev_end)/60.0 < {P}*2/3)
         ) THEN 0 ELSE 1 END AS trg
  FROM lagged
),
sess AS (
  SELECT *, sum(trg) OVER (PARTITION BY LINE ORDER BY START_TIME, downtime_id
                           ROWS UNBOUNDED PRECEDING) AS sn
  FROM trig
),
sid AS (
  SELECT *, first_value(concat_ws(' - ', LINE, strftime(START_TIME, '%Y-%m-%d'), downtime_id))
        OVER (PARTITION BY LINE, sn ORDER BY START_TIME, downtime_id
              ROWS UNBOUNDED PRECEDING) AS co_id
  FROM sess
),
agg AS (
  SELECT LINE, co_id, min(START_TIME) AS co_start, max(END_TIME) AS co_end,
         round(sum(DOWNTIME), 2) AS co_downtime, count(*) AS n_events
  FROM sid GROUP BY LINE, co_id
),
ctx AS (
  SELECT *,
    coalesce(lag(co_end) OVER wl, co_start - INTERVAL {int(PAD_MIN)} MINUTE) AS prev_co_end,
    coalesce(lead(co_start) OVER wl, co_end + INTERVAL {int(PAD_MIN)} MINUTE) AS next_co_start
  FROM agg
  WINDOW wl AS (PARTITION BY LINE ORDER BY co_start, co_id)
),
ev AS (
  SELECT LINE, START_TIME, BRANDCODE, downtime_id,
         START_TIME - to_microseconds(CAST(UPTIME * 60000000 AS BIGINT)) AS uptime_start
  FROM events WHERE START_TIME IS NOT NULL
),
cur AS (
  SELECT c.co_id, e.BRANDCODE,
         row_number() OVER (PARTITION BY c.co_id
             ORDER BY (e.uptime_start < c.co_start) DESC, e.START_TIME DESC,
                      e.downtime_id DESC) AS rn
  FROM ctx c JOIN ev e
    ON e.LINE = c.LINE AND e.START_TIME > c.prev_co_end AND e.START_TIME <= c.co_start
),
cur1 AS (SELECT co_id, BRANDCODE AS current_brand FROM cur WHERE rn = 1),
nxt AS (
  SELECT c.co_id, e.BRANDCODE,
         row_number() OVER (PARTITION BY c.co_id
             ORDER BY e.uptime_start ASC, e.downtime_id ASC) AS rn
  FROM ctx c
  LEFT JOIN cur1 ON cur1.co_id = c.co_id
  JOIN ev e
    ON e.LINE = c.LINE AND e.uptime_start > c.co_start AND e.uptime_start < c.next_co_start
   AND e.BRANDCODE IS DISTINCT FROM cur1.current_brand
),
nxt1 AS (SELECT co_id, BRANDCODE AS next_brand_raw FROM nxt WHERE rn = 1)
SELECT a.co_id AS CO_Identifier, a.LINE, a.co_start AS CO_StartTime,
       a.co_end AS CO_EndTime, a.co_downtime AS CO_DOWNTIME,
       a.n_events AS Number_of_CO_Events,
       cur1.current_brand AS Current_BRANDCODE,
       coalesce(nxt1.next_brand_raw, cur1.current_brand) AS Next_BRANDCODE
FROM agg a LEFT JOIN cur1 USING (co_id) LEFT JOIN nxt1 USING (co_id)
"""


@pytest.mark.parametrize("seed", [11, 42, 99])
def test_pipeline_matches_duckdb_oracle(spark, seed):
    rows = _gen_events(seed)
    df = spark.createDataFrame(rows, SCHEMA)
    outs = mes_etl(df, df, SiteParams(server="S", co_trigger_parameter=P,
                                      run_first_stop_analysis=False))
    got = {
        r.CO_Identifier: (
            r.LINE, r.CO_StartTime, r.CO_EndTime, r.CO_DOWNTIME,
            r.Number_of_CO_Events, r.Current_BRANDCODE, r.Next_BRANDCODE,
        )
        for r in outs["CO_Aggregated_Data"].collect()
    }

    con = duckdb.connect()
    con.register("events_src", con.from_df(__import__("pandas").DataFrame(
        rows, columns=[c.split()[0] for c in SCHEMA.split(",")])))
    con.execute("CREATE VIEW events AS SELECT * FROM events_src")
    want = {
        r[0]: (r[1], r[2], r[3], r[4], r[5], r[6], r[7])
        for r in con.execute(ORACLE_SQL).fetchall()
    }
    assert set(got) == set(want), (
        f"session sets differ: extra={set(got)-set(want)} missing={set(want)-set(got)}"
    )
    for cid in got:
        assert got[cid] == want[cid], f"{cid}: spark={got[cid]} duck={want[cid]}"


# ---------------------------------------------------------------------------
# Multi-constraint mode (A8 + the detect-dedup; reference
# data_from_mdc.py:93-94, mes_etl.py:225-230): lines record one stop
# per constraint machine — dedup CO rows on (LINE, START_TIME) keeping
# min downtime_id, and normalize CO_DOWNTIME by the number of distinct
# machines in the session.
# ---------------------------------------------------------------------------

def _gen_mc_events(seed: int, n: int = 150):
    rng = random.Random(seed)
    rows = []
    for line in ("L1", "L2"):
        t = 0.0
        for i in range(n // 2):
            t += rng.choice([5, 15, 25, 35, 90, 300])
            dt = rng.choice([0.5, 2.0, 5.0])
            up = rng.choice([1.0, 30.0])
            cause2 = rng.choice(["Changeover", "Changeover", "Failure"])
            brand = rng.choice(["A", "B", None])
            start = T0 + timedelta(minutes=t)
            machine = f"{line} CM{1 + i % 2}"  # alternate constraint machines
            rows.append(
                (
                    f"{line}-e{i:03d}a", line, start,
                    start + timedelta(minutes=dt), dt, up, brand,
                    "Planned Downtime" if cause2 == "Changeover" else "Unplanned Downtime",
                    cause2, None, None, machine, "c", 0, 0, False,
                )
            )
            if i % 3 == 0:  # duplicate stop recorded by the OTHER machine
                rows.append(
                    (
                        f"{line}-e{i:03d}b", line, start,
                        start + timedelta(minutes=dt), dt, up, brand,
                        "Planned Downtime" if cause2 == "Changeover" else "Unplanned Downtime",
                        cause2, None, None, f"{line} CM{2 - i % 2}", "c", 0, 0, False,
                    )
                )
            t += dt
    return rows


MC_ORACLE_SQL = ORACLE_SQL.replace(
    """),
lagged AS (""",
    """),
dd AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY LINE, START_TIME
                                 ORDER BY downtime_id) AS __dd
    FROM co
  ) WHERE __dd = 1
),
lagged AS (""",
).replace(
    "  FROM co\n  WINDOW w AS", "  FROM dd\n  WINDOW w AS"
).replace(
    "round(sum(DOWNTIME), 2) AS co_downtime",
    "round(sum(DOWNTIME) / count(DISTINCT MACHINE), 2) AS co_downtime",
)


@pytest.mark.parametrize("seed", [7, 23])
def test_multi_constraint_pipeline_matches_oracle(spark, seed):
    rows = _gen_mc_events(seed)
    df = spark.createDataFrame(rows, SCHEMA)
    outs = mes_etl(
        df, df,
        SiteParams(server="S", co_trigger_parameter=P,
                   run_multi_constraint_analysis=True,
                   run_first_stop_analysis=False),
    )
    got = {
        r.CO_Identifier: (
            r.LINE, r.CO_StartTime, r.CO_EndTime, round(r.CO_DOWNTIME, 2),
            r.Number_of_CO_Events, r.Current_BRANDCODE, r.Next_BRANDCODE,
        )
        for r in outs["CO_Aggregated_Data"].collect()
    }
    con = duckdb.connect()
    con.register("events_src", con.from_df(__import__("pandas").DataFrame(
        rows, columns=[c.split()[0] for c in SCHEMA.split(",")])))
    con.execute("CREATE VIEW events AS SELECT * FROM events_src")
    want = {
        r[0]: (r[1], r[2], r[3], float(r[4]), r[5], r[6], r[7])
        for r in con.execute(MC_ORACLE_SQL).fetchall()
    }
    assert set(got) == set(want), (
        f"session sets differ: extra={set(got)-set(want)} missing={set(want)-set(got)}"
    )
    for cid in got:
        assert got[cid] == want[cid], f"{cid}: spark={got[cid]} duck={want[cid]}"
