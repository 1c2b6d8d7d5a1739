from .site_catalog import (
    EXTENDED_PREDICATE_COLUMNS,
    SITE_ALIASES,
    SITE_CO_RULES,
    catalog_frame,
    co_predicate,
    referenced_columns,
    resolve_site,
)

__all__ = [
    "EXTENDED_PREDICATE_COLUMNS",
    "SITE_ALIASES",
    "SITE_CO_RULES",
    "catalog_frame",
    "co_predicate",
    "referenced_columns",
    "resolve_site",
]
