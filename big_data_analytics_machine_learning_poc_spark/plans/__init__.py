"""Plan-inspection helpers: the 100 TB design gate is plan *shape*, not just
row correctness. See explain.py."""

from .explain import (
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_line,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_line",
]
