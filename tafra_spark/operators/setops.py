"""Set operations: UNION ALL with the reference's strict schema check.

Reference (SURVEY.md §2.4; ``tafra/group.py:56-145``): union is UNION ALL
(no dedup), and validation is strict — same column count, same names in
the same order, and exactly equal dtypes (``tafra/group.py:62-96``).
Spark would silently widen mismatched types through ``unionByName``; the
facade pre-check preserves the reference's error behavior (SURVEY.md
§2.8.6).

Extensions beyond the reference (free in Spark): ``distinct``,
``intersect``, ``except_all``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["union_all", "validate_union_schemas"]


def validate_union_schemas(left: DataFrame, right: DataFrame) -> None:
    lcols, rcols = left.columns, right.columns
    if len(lcols) != len(rcols):
        raise ValueError(
            f"union requires equal column counts: {len(lcols)} != {len(rcols)}"
        )
    if lcols != rcols:
        raise ValueError(
            f"union requires identical column names/order: {lcols} != {rcols}"
        )
    for name in lcols:
        lt = left.schema[name].dataType
        rt = right.schema[name].dataType
        if lt != rt:
            raise TypeError(
                f"union requires exactly equal dtypes for {name!r}: "
                f"{lt.simpleString()} != {rt.simpleString()}"
            )


def union_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """UNION ALL with strict schema equality (reference ``Union.apply``)."""
    validate_union_schemas(left, right)
    return left.unionByName(right)
