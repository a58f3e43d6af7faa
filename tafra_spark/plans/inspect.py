"""Physical-plan introspection helpers.

The engine's scale contract is checked, not assumed: tests assert that
filters reach the parquet scan (``PushedFilters``), projections prune
the read schema (``ReadSchema``), small dimensions broadcast, and plans
don't shuffle more than the logical exchange count requires. The
reference has no plan layer at all (SURVEY.md §4.1) — this module is the
Spark-side replacement for "trust me, it's vectorized".
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "count_exchanges",
    "has_broadcast_join",
]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema (column-pruning check)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of DISTINCT shuffle exchanges (excludes broadcast
    exchanges).

    Counted on a FRESH QueryExecution (``df.select("*")`` re-wraps the
    logical plan): an ALREADY-EXECUTED AQE DataFrame renders each
    materialized shuffle stage twice (the query-stage subtree and its
    re-instantiated final-plan reference, under different plan_ids), so
    counting its cached execution double-counts — and memoized ANN
    plans (functions/_memo.py) are routinely already-executed when a
    test inspects them. The rewrap costs one analysis pass and always
    yields the pre-execution plan.
    """
    text = explain_str(df.select("*"), "simple")
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            text,
        )
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)
