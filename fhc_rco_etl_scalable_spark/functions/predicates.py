"""Per-site changeover predicate handling (F1/F2 in SURVEY.md §2.3).

The reference stores predicate TEXT per site in config and evaluates it
at runtime with pandas ``df.query`` (App/etl/transform/mes_etl.py:9-20);
the per-site catalog is conjunctions/disjunctions of equality, substring
and case-insensitive matches over cause-level columns
(ref/RCO_MES_ETL.R:7-69, ref/condition_management_notes.md:18-124).

Two engine surfaces:

- ``validate_predicate``: predicate text is ANSI SQL, parsed by
  Catalyst against the frame's schema BEFORE the job runs (fail fast
  at submit time, not mid-pipeline on an executor).
- ``compile_rule``: a structured rule DSL → Column, for config that
  shouldn't carry raw SQL. Shape:
  ``{"all": [...]}, {"any": [...]}, {"not": rule}`` and leaves
  ``{"col": name, "eq"/"ne": v, "contains": s, "icontains": s,
  "in": [...], "rlike": pattern, "null": bool}``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_predicate(df: DataFrame, predicate: str) -> Column:
    """Parse + resolve predicate text against ``df``'s schema; raises
    AnalysisException on malformed/unresolvable predicates."""
    col = F.expr(predicate)
    # Force resolution without executing: plan a filter and ask for the
    # analyzed schema (driver-side only).
    df.filter(col).schema
    return col


_LEAF_OPS = ("eq", "ne", "contains", "icontains", "in", "rlike", "null")


def compile_rule(rule: dict) -> Column:
    if not isinstance(rule, dict) or not rule:
        raise ValueError(f"bad rule: {rule!r}")
    if "all" in rule:
        out = None
        for r in rule["all"]:
            c = compile_rule(r)
            out = c if out is None else (out & c)
        return out
    if "any" in rule:
        out = None
        for r in rule["any"]:
            c = compile_rule(r)
            out = c if out is None else (out | c)
        return out
    if "not" in rule:
        # null-safe negation: the catalog's none-of rules must accept
        # rows where the column is NULL (grepl(NA) is no-match, so
        # !no-match passes); bare ~NULL would three-valued-logic the
        # row out of existence.
        return ~F.coalesce(compile_rule(rule["not"]), F.lit(False))

    name = rule.get("col")
    if not name:
        raise ValueError(f"leaf rule missing 'col': {rule!r}")
    col = F.col(name)
    ops = [k for k in rule if k in _LEAF_OPS]
    if len(ops) != 1:
        raise ValueError(f"leaf rule needs exactly one op: {rule!r}")
    op = ops[0]
    v = rule[op]
    if op == "eq":
        return col == F.lit(v)
    if op == "ne":
        # NULL-safe: a NULL cell is 'not equal' (R grepl/!= semantics
        # treat NA as no-match; engine makes that explicit).
        return ~col.eqNullSafe(F.lit(v))
    if op == "contains":
        return col.contains(v)
    if op == "icontains":
        return F.upper(col).contains(str(v).upper())
    if op == "in":
        return col.isin(list(v))
    if op == "rlike":
        return col.rlike(v)
    if op == "null":
        return col.isNull() if v else col.isNotNull()
    raise AssertionError(op)
