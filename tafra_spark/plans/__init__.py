from .inspect import (
    count_exchanges,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "count_exchanges",
    "has_broadcast_join",
]
