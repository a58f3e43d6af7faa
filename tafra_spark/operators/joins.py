"""Joins: inner / left / cross with (left_col, right_col, op) predicates.

Reference semantics (SURVEY.md §2.3; ``tafra/group.py:29-36,421-663``):

- Predicates are a conjunction of ``(left, right, op)`` triples with ops
  ``== != < <= > >=`` — equi and theta joins share one code path.
- Key dtypes must match exactly (``Join._validate_dtypes``,
  ``tafra/group.py:392-408``) — int64 vs float64 keys raise.
- Output keeps all columns of both sides unless ``select`` is given; on a
  name collision the LEFT side wins (``tafra/group.py:481-484``).
- LeftJoin fills unmatched right columns with NULL. (The reference also
  promotes those columns to object dtype — Spark keeps typed nullable
  columns, a documented divergence, SURVEY.md §2.8.3.)
- CrossJoin: we implement the *documented* SQL CROSS JOIN semantics, not
  the reference's np.tile artifact (SURVEY.md §2.8.1).

Scale notes: the triples compile to a single Column conjunction, so
Catalyst is free to pick broadcast-hash or sort-merge for the equi subset
and push the theta terms into the join condition; a pure-theta predicate
degrades to broadcast-nested-loop, which is the correct distributed
answer. The reference's own execution is an O(|L|·|R|) nested loop —
never reproduce that shape.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "JOIN_OPS",
    "inner_join",
    "left_join",
    "cross_join",
    "semi_anti_join",
    "salted_join",
    "compile_predicate",
]

JOIN_OPS = ("==", "!=", "<", "<=", ">", ">=")

_RIGHT_SUFFIX = "__tafra_r__"


def _validate_triples(
    left: DataFrame, right: DataFrame, on: Sequence[tuple]
) -> list[tuple[str, str, str]]:
    triples: list[tuple[str, str, str]] = []
    for item in on:
        if len(item) == 2:
            lcol, rcol, op = item[0], item[1], "=="
        elif len(item) == 3:
            lcol, rcol, op = item
        else:
            raise ValueError(f"join spec must be (left, right[, op]), got {item!r}")
        if op not in JOIN_OPS:
            raise ValueError(f"join op {op!r} not one of {JOIN_OPS}")
        if lcol not in left.columns:
            raise KeyError(f"join column {lcol!r} not in left table")
        if rcol not in right.columns:
            raise KeyError(f"join column {rcol!r} not in right table")
        ltype = left.schema[lcol].dataType
        rtype = right.schema[rcol].dataType
        if ltype != rtype:
            raise TypeError(
                f"join key dtypes must match exactly: {lcol!r} is "
                f"{ltype.simpleString()} but {rcol!r} is {rtype.simpleString()}"
            )
        triples.append((lcol, rcol, op))
    return triples


def compile_predicate(
    left: DataFrame, right_renamed: DataFrame, triples: list[tuple[str, str, str]]
) -> Column:
    """Compile validated triples into one Column conjunction against the
    suffix-renamed right side."""
    pred: Column | None = None
    for lcol, rcol, op in triples:
        lc = left[lcol]
        rc = right_renamed[rcol + _RIGHT_SUFFIX]
        term = {
            "==": lc == rc,
            "!=": lc != rc,
            "<": lc < rc,
            "<=": lc <= rc,
            ">": lc > rc,
            ">=": lc >= rc,
        }[op]
        pred = term if pred is None else (pred & term)
    if pred is None:
        raise ValueError("join requires at least one (left, right, op) triple")
    return pred


def _join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[tuple],
    how: str,
    select: Iterable[str] | None = None,
) -> DataFrame:
    triples = _validate_triples(left, right, on)
    # rename every right column with a private suffix so the predicate is
    # unambiguous, then resolve collisions left-wins on projection
    right_r = right.select(
        *[F.col(c).alias(c + _RIGHT_SUFFIX) for c in right.columns]
    )
    joined = left.join(right_r, on=compile_predicate(left, right_r, triples), how=how)

    left_cols = list(left.columns)
    out_cols: list[Column] = [joined[c] for c in left_cols]
    for c in right.columns:
        if c in left_cols:
            continue  # left side wins on name collision
        out_cols.append(joined[c + _RIGHT_SUFFIX].alias(c))
    result = joined.select(*out_cols)

    if select is not None:
        select = [select] if isinstance(select, str) else list(select)
        available = set(left.columns) | set(right.columns)
        for c in select:
            if c not in available:
                raise KeyError(f"select column {c!r} in neither join side")
        result = result.select(*select)
    return result


def semi_anti_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[tuple],
    how: str,
) -> DataFrame:
    """LEFT SEMI (EXISTS) / LEFT ANTI (NOT EXISTS) with the same
    (l, r, op)-triple predicates. Output = left columns only, so no
    collision handling is needed."""
    assert how in ("left_semi", "left_anti")
    triples = _validate_triples(left, right, on)
    right_r = right.select(
        *[F.col(c).alias(c + _RIGHT_SUFFIX) for c in right.columns]
    )
    return left.join(
        right_r, on=compile_predicate(left, right_r, triples), how=how
    )


def inner_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[tuple],
    select: Iterable[str] | None = None,
) -> DataFrame:
    """SQL INNER JOIN (reference ``InnerJoin.apply``,
    ``tafra/group.py:421-509``)."""
    return _join(left, right, on, "inner", select)


def left_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[tuple],
    select: Iterable[str] | None = None,
) -> DataFrame:
    """SQL LEFT OUTER JOIN (reference ``LeftJoin.apply``,
    ``tafra/group.py:512-600``). Unmatched right columns are NULL and stay
    typed (divergence from the reference's object-promotion, §2.8.3)."""
    return _join(left, right, on, "left", select)


def cross_join(
    left: DataFrame,
    right: DataFrame,
    select: Iterable[str] | None = None,
) -> DataFrame:
    """SQL CROSS JOIN — documented semantics of the reference's
    ``CrossJoin`` (``tafra/group.py:603-663``), NOT its np.tile pairing
    artifact (SURVEY.md §2.8.1)."""
    right_r = right.select(
        *[F.col(c).alias(c + _RIGHT_SUFFIX) for c in right.columns]
    )
    joined = left.crossJoin(right_r)
    left_cols = list(left.columns)
    out_cols: list[Column] = [joined[c] for c in left_cols]
    for c in right.columns:
        if c in left_cols:
            continue
        out_cols.append(joined[c + _RIGHT_SUFFIX].alias(c))
    result = joined.select(*out_cols)
    if select is not None:
        select = [select] if isinstance(select, str) else list(select)
        available = set(left.columns) | set(right.columns)
        for c in select:
            if c not in available:
                raise KeyError(f"select column {c!r} in neither join side")
        result = result.select(*select)
    return result


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[tuple],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the LEFT (skewed) side's rows scatter
    across ``n_salts`` sub-keys; the RIGHT side replicates once per salt.
    The shuffle key becomes (key, salt), splitting a hot key's partition
    ``n_salts`` ways.

    Complements AQE's skew-join handling (which splits oversized
    partitions at runtime for sort-merge joins): salting fixes the skew
    at plan time, works for any join the optimizer picks, and bounds the
    per-task row count deterministically. Cost: the right side shuffles
    ``n_salts`` copies — use only when right ≪ left and a hot left key is
    known. Equi predicates only; results equal the unsalted join.

    The salt is a deterministic hash of the whole left row (not rand()),
    so task retries reproduce the same partitioning.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    triples = _validate_triples(left, right, on)
    if any(op != "==" for _, _, op in triples):
        raise ValueError("salted_join supports equi predicates only")

    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)
    ).alias("__salt__")
    l_salted = left.select("*", salt)
    r_replicated = right.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt__"),
    )
    cond = F.col("l.__salt__") == F.col("r.__salt__")
    for lcol, rcol, _ in triples:
        cond = cond & (F.col(f"l.{lcol}") == F.col(f"r.{rcol}"))
    joined = l_salted.alias("l").join(r_replicated.alias("r"), cond, how)
    left_cols = [F.col(f"l.{c}") for c in left.columns]
    right_cols = [
        F.col(f"r.{c}").alias(c)
        for c in right.columns
        if c not in left.columns
    ]
    return joined.select(*left_cols, *right_cols)
