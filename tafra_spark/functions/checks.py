"""Declarative data-quality constraint checking (the Deequ/dbt-test
family): a rule list is compiled into ONE aggregate pass over the table,
returning a per-rule violation report.

The public data-quality tools (AWS Deequ, Great Expectations, dbt
tests) all converge on the same shape — declare constraints, scan once,
report violations — because at 100 TB the scan is the cost and the
rules are nearly free on top of it: every rule below is a conditional
count inside the SAME aggregate, so N rules cost one pass and zero
extra shuffles. The only exception is ``unique``, which needs a
distinct count per key — expressed as ``count(*) − count(DISTINCT k)``
inside the same aggregate (Spark plans multi-distinct aggregates as one
expand + two-stage agg; still a single scan).

Rule spec (dict): ``{"rule": <kind>, "col": <name>, ...}`` with kinds:

- ``not_null`` — violations = NULL values in ``col``.
- ``unique`` — violations = rows beyond the first per ``col`` value
  (count − distinct count; NULLs count as a value).
- ``min`` / ``max`` — numeric bound ``value``; violations = rows
  outside the bound (NULL passes — pair with not_null to forbid).
- ``in_set`` — ``values`` list; violations = non-NULL values outside.
- ``not_in_set`` — ``values`` list; violations = non-NULL values
  inside (forbidden sentinels: 'N/A', -999, ...).
- ``between`` — ``lo``/``hi`` inclusive bounds; violations = non-NULL
  values outside the band.
- ``min_length`` — string ``value``; violations = non-NULL strings
  shorter than ``value`` characters.
- ``matches`` — Java∩RE2 ``pattern``; violations = non-NULL values
  not fully matching.

Returns (rule, col, n_violations, passed) — one row per rule, driver-
safe regardless of table size.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["constraint_report"]


def _violations(rule: Mapping) -> Column:
    kind = rule["rule"]
    col = F.col(rule["col"])
    if kind == "not_null":
        return F.sum(col.isNull().cast("long"))
    if kind == "unique":
        # rows beyond the first per value: non-null dups are
        # count_nonnull − distinct; NULL dups are n_null − (1 if any).
        # Summed: count(*) − countDistinct − max(isNull).
        return (
            F.count(F.lit(1))
            - F.countDistinct(col)
            - F.max(col.isNull().cast("long"))
        )
    if kind == "min":
        return F.sum(
            (col.isNotNull() & (col < F.lit(rule["value"]))).cast("long")
        )
    if kind == "max":
        return F.sum(
            (col.isNotNull() & (col > F.lit(rule["value"]))).cast("long")
        )
    if kind == "in_set":
        vals = list(rule["values"])
        return F.sum(
            (col.isNotNull() & ~col.isin(vals)).cast("long")
        )
    if kind == "not_in_set":
        vals = list(rule["values"])
        return F.sum(
            (col.isNotNull() & col.isin(vals)).cast("long")
        )
    if kind == "between":
        return F.sum(
            (
                col.isNotNull()
                & (
                    (col < F.lit(rule["lo"]))
                    | (col > F.lit(rule["hi"]))
                )
            ).cast("long")
        )
    if kind == "min_length":
        return F.sum(
            (
                col.isNotNull()
                & (F.length(col) < F.lit(int(rule["value"])))
            ).cast("long")
        )
    if kind == "matches":
        return F.sum(
            (
                col.isNotNull()
                & ~col.rlike("^(?:" + rule["pattern"] + ")$")
            ).cast("long")
        )
    raise ValueError(f"constraint_report: unknown rule kind {kind!r}")


def constraint_report(
    df: DataFrame,
    rules: Sequence[Mapping],
    n_rows_col: str | None = None,
) -> DataFrame:
    """Compile ``rules`` into one aggregate; see module docstring.

    The report rows come back in rule-list order via an index column so
    the output is deterministic without depending on aggregate-alias
    ordering. ``n_rows_col`` adds the scanned row count as a column on
    every report row — inside the SAME aggregate, so the monitoring
    sink gets it without a second pass.
    """
    if not rules:
        raise ValueError("constraint_report: rules must be non-empty")
    aggs = []
    for i, rule in enumerate(rules):
        if rule["col"] not in df.columns:
            raise ValueError(
                f"constraint_report: unknown column {rule['col']!r}"
            )
        aggs.append(
            F.coalesce(_violations(rule), F.lit(0)).alias(f"__v{i}__")
        )
    if n_rows_col is not None:
        aggs.append(F.count(F.lit(1)).alias("__nrows__"))
    one = df.agg(*aggs)
    reports = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("rule_idx"),
                F.lit(str(r["rule"])).alias("rule"),
                F.lit(str(r["col"])).alias("col"),
                F.col(f"__v{i}__").cast("long").alias("n_violations"),
                (F.col(f"__v{i}__") == 0).alias("passed"),
            )
            for i, r in enumerate(rules)
        ]
    )
    out = one.select(
        F.explode(reports).alias("r"),
        *([F.col("__nrows__")] if n_rows_col is not None else []),
    ).select(
        "r.rule_idx",
        "r.rule",
        "r.col",
        "r.n_violations",
        "r.passed",
        *(
            [F.col("__nrows__").cast("long").alias(n_rows_col)]
            if n_rows_col is not None
            else []
        ),
    )
    return out
