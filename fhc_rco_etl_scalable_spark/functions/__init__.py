from .predicates import compile_rule, validate_predicate
from .scalar import (
    dynamic_round,
    minutes_between,
    scrub_text,
    ts_plus_minutes,
    ts_plus_seconds,
)

__all__ = [
    "compile_rule",
    "validate_predicate",
    "dynamic_round",
    "minutes_between",
    "scrub_text",
    "ts_plus_minutes",
    "ts_plus_seconds",
]
