from .sessionize import (
    co_trigger_column,
    rco_session_trigger,
    sessionize,
    sessionize_simple_gap,
)

__all__ = [
    "co_trigger_column",
    "rco_session_trigger",
    "sessionize",
    "sessionize_simple_gap",
]
