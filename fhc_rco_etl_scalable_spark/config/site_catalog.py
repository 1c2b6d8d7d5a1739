"""The per-site changeover predicate catalog AS DATA.

Transcribes the reference's ~30-site if/else chain
(ref/RCO_MES_ETL.R:7-69; superset entries from
ref/condition_management_notes.md:18-124 — Tabler HC, Euskirchen,
Urlati BC/SUD, Cairo, Cairo FemCare, Takasaki LIQ, Pomezia, Dammam,
Mechelen) into the structured rule DSL of
:func:`fhc_rco_etl_scalable_spark.functions.predicates.compile_rule`.
Every rule is a plain JSON-serializable dict, so the catalog can live
in a config table / SharePoint list exactly like the reference's
``querySL`` column (App/rco_main.py:135-162, schemas.SITE_CONFIG) —
shipped here as checked-in data so a deployment starts from the full
catalog instead of re-keying ~30 sites by hand.

Semantics notes (documented engine choices):

- R ``grepl`` is case-sensitive → ``contains`` leaves; the reference's
  explicit double-spellings (``Change``/``change``) stay two leaves.
- R indexing with an NA condition materializes NA rows (the artifact
  the reference patches per-site with ``!is.na`` — Alex SUD, Urlati
  SUD). Spark's filter drops NULL-condition rows like pandas
  ``df.query``, so those patches are no-ops here and are not encoded.
- Negated leaves (``{"not": {... "contains": ...}}``) are null-safe in
  compile_rule: a NULL cell passes a none-of condition, matching
  ``!grepl(NA)`` = TRUE after R's NA-row cleanup and pandas' behavior.

Columns: most rules use the canonical CAUSE_LEVELS_1..4_NAME; a few
sites filter on source-system extras (``LINE_SUBSTATE``,
``Reason1..4Category``) that their MES exposes —
``EXTENDED_PREDICATE_COLUMNS`` below. ``referenced_columns`` lets a
deployment check a site's rule against its actual schema before
submitting (pair with predicates.validate_predicate for SQL text).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession

from ..functions.predicates import compile_rule

C1, C2, C3, C4 = (f"CAUSE_LEVELS_{i}_NAME" for i in (1, 2, 3, 4))
SUB = "LINE_SUBSTATE"
R1, R2, R3, R4 = (f"Reason{i}Category" for i in (1, 2, 3, 4))

#: Source-system columns beyond the canonical downtime schema that some
#: site rules filter on (present in those sites' raw feeds only).
EXTENDED_PREDICATE_COLUMNS = [SUB, R1, R2, R3, R4]


def _contains_any(col: str, *needles: str) -> dict:
    if len(needles) == 1:
        return {"col": col, "contains": needles[0]}
    return {"any": [{"col": col, "contains": n} for n in needles]}


SITE_CO_RULES: dict[str, dict] = {
    # ref/RCO_MES_ETL.R:7-12
    "Lima SUD": {
        "all": [
            _contains_any(SUB, " CO", "Code Date Change", "Changeover"),
            {"col": C1, "eq": "Planned Downtime"},
            {"any": [{"col": C2, "eq": "Changeover"}, {"col": C2, "contains": " CO"}]},
        ]
    },
    # R:13-18
    "Rakona LIQ": {
        "all": [
            {"col": C1, "in": ["Planned Downtime", "PLANOVANE ZASTAVENI", "PROCES PLAN"]},
            {
                "any": [
                    _contains_any(C2, "Prejizdeni", "prejizdeni", "prestavba"),
                    _contains_any(C3, "Prejizdeni", "prejizdeni", "prestavba"),
                ]
            },
            {"not": {"col": C3, "contains": "Cisteni stolku"}},
            {"not": {"col": C3, "contains": "Odhad tun"}},
            {"not": {"col": C4, "contains": "Odhad tun"}},
        ]
    },
    # R:19-21
    "Rakona DL": {
        "all": [
            _contains_any(SUB, " CO", "Changeover"),
            {"col": C2, "eq": "PREJIZDENI"},
        ]
    },
    # R:22-23
    "Amiens SUD": {
        "all": [
            {"col": C1, "eq": "Planned Downtime"},
            {"any": [{"col": C2, "eq": "Changeover"}, {"col": C2, "contains": "CO"}]},
        ]
    },
    # R:24-26 (the !is.na patch is a Spark no-op, see module docstring)
    "Alex SUD": {
        "all": [
            {"col": C1, "eq": "Planned Downtime"},
            {"any": [{"col": C2, "eq": "Changeover"}, {"col": C2, "contains": "CO"}]},
        ]
    },
    # R:27-30 — the catch-all grepl("Amiens", Server_Name) group
    "Amiens": {
        "all": [
            {"any": [{"col": SUB, "eq": "Changeover"}, {"col": SUB, "contains": "CO"}]},
            {"col": C1, "contains": "Planned "},
            {"col": C2, "contains": " CO"},
        ]
    },
    # R:31-32
    "Novo": {
        "all": [
            {"col": R3, "contains": "C/O"},
            {"col": R2, "contains": "-Planned"},
            {"not": {"col": R3, "contains": "Change Material"}},
        ]
    },
    # R:33-35
    "Tabler HDW": {
        "all": [
            {"col": C1, "contains": "Planned downtime"},
            {"col": C2, "contains": "Change Over"},
            _contains_any(C3, "Change", "change"),
        ]
    },
    # notes:66-67
    "Tabler HC": {
        "all": [
            {"col": C1, "contains": "Planned downtime"},
            {"col": C2, "eq": "Changeover"},
        ]
    },
    # R:36-37
    "StLouis Proficy": {"col": C2, "contains": "Changeover"},
    # R:38-40
    "StLouis Maple": {
        "all": [
            {"col": C1, "eq": "Planned Downtime"},
            _contains_any(C2, "Changeover", "Brand Change"),
        ]
    },
    # R:41-42
    "Takasaki SUD": {
        "all": [{"col": C1, "eq": "Planned Downtime"}, {"col": C2, "contains": "Changeover"}]
    },
    # R:43-44
    "Gattatico": {
        "all": [{"col": C1, "eq": "Planned Downtime"}, {"col": C2, "contains": "Changeover"}]
    },
    # R:45-46
    "London HDW": {
        "all": [{"col": C1, "eq": "Planned Downtime"}, {"col": C2, "contains": " Change"}]
    },
    # R:47-48
    "Gebze HDW": {
        "all": [
            {"col": C2, "in": ["SCO", "BCO"]},
            {"col": C1, "contains": "PLANLI DURUS"},
        ]
    },
    # R:49-52
    "Gebze DL": {
        "all": [
            {"col": C2, "contains": "DEGISIM"},
            {"col": C1, "contains": "PLANLI DURUS"},
            {"not": {"col": C2, "contains": "PAKETLEME MALZEMESI"}},
        ]
    },
    # R:53-55
    "Cabuyao": {
        "any": [{"col": C2, "contains": "Changeover"}, {"col": C3, "contains": "Changeover"}]
    },
    # R:56-57
    "Lima LIQ": {
        "any": [{"col": C1, "eq": "Changeover"}, {"col": C1, "contains": "Changeover Failure"}]
    },
    # R:58-59
    "Chengdu": {"col": C3, "contains": "Change over"},
    # R:60-62
    "Binh Duong": {
        "any": [
            {"all": [{"col": C1, "eq": "Planned Downtime"}, {"col": C2, "eq": "Changeover"}]},
            {"col": C1, "eq": "Planned Changeover"},
        ]
    },
    # R:63-64 (notes:92 adds Euskirchen to this rule)
    "Gebze BabyCare": _contains_any(C1, "990", "991", "992"),
    # R:65-66
    "Gebze FemCare": {
        "all": [
            {"col": R1, "eq": "Planned Downtime"},
            {"col": C2, "contains": "CHANGEOVER"},
        ]
    },
    # R:67
    "Alexandria HDL": {"col": C1, "contains": "Changeover"},
    # R:68-69
    "Alexandria DL": {
        "all": [{"col": C1, "eq": "Planned Downtime"}, {"col": C2, "contains": "Changeover"}]
    },
    # notes:96-99
    "Urlati BC": {
        "all": [
            {"col": R2, "contains": "-Planned"},
            {
                "any": [
                    {"col": R3, "contains": "C/O"},
                    {"col": R4, "contains": "C/O"},
                    {"col": C3, "contains": "3D"},
                ]
            },
            {"not": {"col": R3, "contains": "Folie"}},
            {"not": {"col": R3, "contains": "End of tank"}},
            {"not": {"col": R4, "contains": "Graphics"}},
        ]
    },
    # notes:100-105 (the active, uncommented rule)
    "Cairo": _contains_any(C3, "Changeover", "CHANGE OVER"),
    # notes:106-107
    "Cairo FemCare": _contains_any(C2, "Change", "CHANGE"),
    # notes:108-110
    "Urlati SUD": {
        "all": [
            {"col": C1, "eq": "Planned Downtime"},
            {"any": [{"col": C2, "eq": "Changeover"}, {"col": C2, "contains": "CO"}]},
        ]
    },
    # notes:111-113
    "Takasaki LIQ": {
        "any": [
            {"all": [{"col": C1, "eq": "Planned Downtime"}, {"col": C2, "contains": "Change"}]},
            {"col": C1, "eq": "Changeover"},
        ]
    },
    # notes:114-115
    "Pomezia": {
        "all": [{"col": C1, "contains": "Planned"}, {"col": C2, "contains": "Cambio"}]
    },
    # notes:116-120
    "Dammam": {
        "all": [
            {"col": R1, "contains": "-Planned"},
            {
                "any": [
                    {"col": R2, "contains": "C/O"},
                    {"col": R3, "contains": "C/O"},
                    {"col": R4, "contains": "C/O"},
                    _contains_any(C3, "Changeover", "changeover"),
                    _contains_any(C4, "Changeover", "changeover"),
                ]
            },
        ]
    },
    # notes:121-122
    "Mechelen": {
        "all": [{"col": C1, "contains": "Planned"}, {"col": C2, "eq": "Changeover"}]
    },
}

#: Server names the reference folds into another site's rule
#: (R:24 `Server_Name=="Alex SUD Proficy"`, notes:92 Euskirchen).
SITE_ALIASES: dict[str, str] = {
    "Alex SUD Proficy": "Alex SUD",
    "Euskirchen": "Gebze BabyCare",
}


def resolve_site(server_name: str) -> str | None:
    """Catalog key for a server name, following the reference's
    dispatch order: exact match, declared alias, then the
    ``grepl("Amiens", Server_Name)`` catch-all (R:27 — checked AFTER
    the specific 'Amiens SUD' branch, which exact-match already won).
    None if uncataloged (the reference would fall through with
    CO_Event_Log unset)."""
    if server_name in SITE_CO_RULES:
        return server_name
    if server_name in SITE_ALIASES:
        return SITE_ALIASES[server_name]
    if "Amiens" in server_name:
        return "Amiens"
    return None


def co_predicate(server_name: str) -> Column:
    """The site's changeover predicate as a Catalyst Column."""
    key = resolve_site(server_name)
    if key is None:
        raise KeyError(f"no CO predicate cataloged for site {server_name!r}")
    return compile_rule(SITE_CO_RULES[key])


def referenced_columns(rule: dict) -> set[str]:
    """Every column name a rule reads — pre-flight schema check."""
    cols: set[str] = set()
    if "col" in rule:
        cols.add(rule["col"])
    for k in ("all", "any"):
        for sub in rule.get(k, ()):  # type: ignore[union-attr]
            cols |= referenced_columns(sub)
    if "not" in rule:
        cols |= referenced_columns(rule["not"])
    return cols


def catalog_frame(spark: SparkSession) -> DataFrame:
    """The catalog as a (site, rule_json) config table — the shape a
    deployment would load from its config store (SITE_CONFIG.querySL
    analog, but structured instead of raw predicate text)."""
    rows = [(site, json.dumps(rule, sort_keys=True)) for site, rule in sorted(SITE_CO_RULES.items())]
    return spark.createDataFrame(rows, "site string, rule_json string")
