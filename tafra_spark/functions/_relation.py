"""Pure-JVM literal relations for small driver-side row sets.

``spark.createDataFrame(python_rows)`` keeps a PythonRDD lineage: every
later action that touches the frame — a broadcast build, a ``collect``,
an iterative loop's re-read — forks Python workers and pays seconds of
latency per job in exchange for shipping a handful of rows. For tiny
control tables (codebooks, centroids, weight specs) the right shape is
a literal relation the JVM evaluates once: ``inline`` over ONE parsed
struct-array expression (a single py4j call regardless of row count).

Doubles are embedded as ``CAST('<repr>' AS DOUBLE)``: ``repr``
round-trips the value exactly and decimal parse is correctly rounded,
so the inlined constants are bit-identical to the source floats —
the same portability discipline the oracle queries rely on.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["literal_relation", "literal_array"]


def _sql_value(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_sql_value(x) for x in v) + ")"
    raise TypeError(f"literal_relation: unsupported value type {type(v)!r}")


def literal_relation(
    spark: SparkSession, rows: Sequence[Sequence[object]], columns: Sequence[str]
) -> DataFrame:
    """One-expression literal DataFrame: ``rows`` of int/float/str/bool/
    None/flat-or-nested list values become a relation with ``columns``.
    Ints map to BIGINT, floats to DOUBLE (exact via repr round-trip),
    lists to arrays. Empty ``rows`` is rejected — a literal relation
    has no schema to stand on without values."""
    if not rows:
        raise ValueError("literal_relation: rows must be non-empty")
    for i, r in enumerate(rows):
        if len(r) != len(columns):
            # zip would silently truncate extra values and a short row
            # would fail later with an opaque inline() type error
            raise ValueError(
                f"literal_relation: row {i} has {len(r)} values for "
                f"{len(columns)} columns"
            )
    structs = [
        "struct("
        + ", ".join(
            f"{_sql_value(v)} AS `{c}`" for v, c in zip(r, columns)
        )
        + ")"
        for r in rows
    ]
    return spark.range(0, 1, 1, 1).select(
        F.expr("inline(array(" + ", ".join(structs) + "))")
    )


def literal_array(values: Sequence[object]):
    """One-expression literal array Column (nested lists welcome).

    ``F.lit`` on a nested Python list builds a Column object per leaf
    value — measured at ~0.7 s of pure driver latency for a 4×16×16
    codebook. Rendering the same values through :func:`_sql_value` and
    parsing ONCE is a single py4j call with identical (bit-exact)
    constants.
    """
    return F.expr(_sql_value(list(values)))
