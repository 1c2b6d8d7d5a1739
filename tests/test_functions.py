"""Function-library units: rule DSL compiler, dynamic rounding,
predicate validation."""

import pytest
from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.functions.predicates import (
    compile_rule,
    validate_predicate,
)
from fhc_rco_etl_scalable_spark.functions.scalar import dynamic_round


@pytest.fixture(scope="module")
def causes(spark):
    return spark.createDataFrame(
        [
            ("1", "Planned Downtime", "Changeover", None),
            ("2", "Planned Downtime", "SCO cleaning", "Cisteni A"),
            ("3", "Unplanned Downtime", "Failure", None),
            ("4", None, "changeover minor", None),
        ],
        "id string, c1 string, c2 string, c3 string",
    )


def _ids(df, rule):
    return sorted(r.id for r in df.filter(compile_rule(rule)).collect())


def test_rule_dsl_catalog_shapes(causes):
    # the per-site catalog shapes (ref/condition_management_notes.md:18-124):
    # conjunction + substring + negation
    rule = {
        "all": [
            {"col": "c1", "eq": "Planned Downtime"},
            {"col": "c2", "icontains": "change"},
            {"not": {"col": "c3", "contains": "Cisteni"}},
        ]
    }
    assert _ids(causes, rule) == ["1"]
    # disjunction + case-insensitive + in-list
    rule2 = {
        "any": [
            {"col": "c2", "rlike": "(?i)^changeover"},
            {"col": "c2", "in": ["Failure"]},
        ]
    }
    assert _ids(causes, rule2) == ["1", "3", "4"]
    # null handling: ne treats NULL as 'not equal'
    assert _ids(causes, {"col": "c1", "ne": "Planned Downtime"}) == ["3", "4"]
    assert _ids(causes, {"col": "c3", "null": True}) == ["1", "3", "4"]


def test_rule_dsl_rejects_malformed():
    with pytest.raises(ValueError):
        compile_rule({"col": "c1"})  # no op
    with pytest.raises(ValueError):
        compile_rule({"col": "c1", "eq": "x", "ne": "y"})  # two ops
    with pytest.raises(ValueError):
        compile_rule({})


def test_validate_predicate_fails_fast(causes):
    col = validate_predicate(causes, "c1 = 'Planned Downtime' AND c2 LIKE '%Change%'")
    assert causes.filter(col).count() == 1
    with pytest.raises(Exception):
        validate_predicate(causes, "nope = 1")


def test_dynamic_round_precision_tiers(spark):
    # R dataframe_decimal_reducer tiers (ref/RCO_Overall_orchestrator.R:119-131)
    df = spark.createDataFrame(
        [(0.0123456, 5.123456, 555.123456)], "tiny double, mid double, big double"
    )
    out = dynamic_round(df, ["tiny", "mid", "big"]).first()
    assert out.tiny == 0.01235  # mean < 0.1 -> 5dp
    assert out.mid == 5.123    # mean < 10 -> 3dp
    assert out.big == 555.1    # mean >= 100 -> 1dp
