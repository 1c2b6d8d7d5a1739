"""The shipped per-site CO predicate catalog: every rule compiles,
references only known columns, is JSON-round-trippable (config-table
safe), resolves like the reference's dispatch chain, and behaves on
data (incl. NULL null-safety of none-of rules)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhc_rco_etl_scalable_spark.config import (
    EXTENDED_PREDICATE_COLUMNS,
    SITE_ALIASES,
    SITE_CO_RULES,
    catalog_frame,
    co_predicate,
    referenced_columns,
    resolve_site,
)
from fhc_rco_etl_scalable_spark.functions.predicates import compile_rule
from fhc_rco_etl_scalable_spark.schemas import DOWNTIME_EVENTS


def _predicate_schema() -> T.StructType:
    fields = list(DOWNTIME_EVENTS.fields) + [
        T.StructField(c, T.StringType()) for c in EXTENDED_PREDICATE_COLUMNS
    ]
    return T.StructType(fields)


def test_catalog_covers_reference_sites():
    # every branch of ref/RCO_MES_ETL.R:7-69 + the notes-only sites
    assert len(SITE_CO_RULES) >= 30
    for expected in (
        "Lima SUD", "Rakona LIQ", "Rakona DL", "Amiens SUD", "Alex SUD",
        "Amiens", "Novo", "Tabler HDW", "Tabler HC", "StLouis Proficy",
        "StLouis Maple", "Takasaki SUD", "Gattatico", "London HDW",
        "Gebze HDW", "Gebze DL", "Cabuyao", "Lima LIQ", "Chengdu",
        "Binh Duong", "Gebze BabyCare", "Gebze FemCare", "Alexandria HDL",
        "Alexandria DL", "Urlati BC", "Cairo", "Cairo FemCare",
        "Urlati SUD", "Takasaki LIQ", "Pomezia", "Dammam", "Mechelen",
    ):
        assert expected in SITE_CO_RULES, expected


@pytest.mark.parametrize("site", sorted(SITE_CO_RULES))
def test_every_rule_compiles_and_resolves(spark, site):
    rule = SITE_CO_RULES[site]
    # JSON round-trip: the catalog must survive a config table
    assert json.loads(json.dumps(rule)) == rule
    # only known columns (canonical schema + documented source extras)
    known = {f.name for f in _predicate_schema().fields}
    assert referenced_columns(rule) <= known, referenced_columns(rule) - known
    # Catalyst-resolves against the full predicate schema (driver-only)
    empty = spark.createDataFrame([], _predicate_schema())
    empty.filter(compile_rule(rule)).schema


def test_dispatch_order_matches_reference():
    # exact beats the Amiens catch-all (R checks 'Amiens SUD' first)
    assert resolve_site("Amiens SUD") == "Amiens SUD"
    assert resolve_site("Amiens HDL") == "Amiens"
    assert resolve_site("Amiens FE") == "Amiens"
    assert resolve_site("Alex SUD Proficy") == "Alex SUD"
    assert resolve_site("Euskirchen") == "Gebze BabyCare"
    assert resolve_site("Narnia") is None
    with pytest.raises(KeyError):
        co_predicate("Narnia")


def test_rules_behave_on_data(spark):
    rows = [
        # (C1, C2, C3, C4, SUBSTATE)
        ("Planned Downtime", "Changeover", None, None, "Some CO state"),
        ("Planned Downtime", "Brand Change x", None, None, None),
        ("Unplanned Downtime", "Failure", None, None, None),
        ("PLANOVANE ZASTAVENI", "prejizdeni linky", None, None, None),
        ("PROCES PLAN", "x", "Prejizdeni + Cisteni stolku", None, None),
        ("Planned Downtime", None, "Change over here", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "CAUSE_LEVELS_1_NAME string, CAUSE_LEVELS_2_NAME string,"
        " CAUSE_LEVELS_3_NAME string, CAUSE_LEVELS_4_NAME string,"
        " LINE_SUBSTATE string",
    ).withColumn("rid", F.monotonically_increasing_id())
    ids = lambda site: {
        r.CAUSE_LEVELS_2_NAME for r in df.filter(co_predicate(site)).collect()
    }
    assert ids("StLouis Maple") == {"Changeover", "Brand Change x"}
    # Rakona LIQ: row 4 matches (prejizdeni in C2, C3 NULL passes the
    # none-of guards — null-safe negation); row 5 is killed by the
    # 'Cisteni stolku' disqualifier despite Prejizdeni in C3.
    assert ids("Rakona LIQ") == {"prejizdeni linky"}
    assert ids("Chengdu") == {None}  # C3 'Change over', C2 NULL row kept
    assert ids("Lima SUD") == {"Changeover"}  # needs SUBSTATE ' CO' too


def test_catalog_frame_is_config_table(spark):
    cat = catalog_frame(spark)
    assert cat.columns == ["site", "rule_json"]
    rows = {r.site: json.loads(r.rule_json) for r in cat.collect()}
    assert rows == SITE_CO_RULES
    for site in SITE_ALIASES.values():
        assert site in rows


def test_rlike_leaf_matches_grepl_regex(spark):
    # the DSL's rlike leaf covers grepl-with-metacharacters if a future
    # site needs one (all current needles are literal -> contains)
    df = spark.createDataFrame(
        [("Changeover",), ("Jam",), ("Changeover Failure",), (None,)],
        "CAUSE_LEVELS_2_NAME string",
    )
    rule = {"col": "CAUSE_LEVELS_2_NAME", "rlike": "^(Changeover|Jam)$"}
    got = {r[0] for r in df.filter(compile_rule(rule)).collect()}
    assert got == {"Changeover", "Jam"}
