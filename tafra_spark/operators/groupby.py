"""Grouped aggregation: GROUP BY, grouped transform (window), iterate_by.

Reference semantics (SURVEY.md §2.4; ``tafra/group.py``):

- ``group_by(keys, {'col': fn} | {'new': (fn, 'col')}, {'n': iter_fn})`` —
  one output row per unique key combo; ``fn`` is any callable
  ``ndarray -> scalar``; ``iter_fn`` receives the group's row-index
  enumeration (``{'count': len}`` == COUNT(*)).
- ``transform(...)`` — same spec, result broadcast back to every input row
  (SQL windowed aggregate over an unbounded partition frame).
- ``iterate_by(keys)`` — generator of (key, mask, sub-table) per group.

Spark re-expression: well-known callables (builtins + numpy reductions)
translate to JVM-side ``pyspark.sql.functions`` aggregates so the hot path
stays inside whole-stage codegen with map-side partial aggregation — the
single most important property at 100 TB (a Python-callable fallback would
move every group through Arrow). Unknown callables fall back to
``applyInPandas`` with a schema derived from the reference's
result-dtype-equals-source-dtype rule (``tafra/group.py:255-256``).
"""

from __future__ import annotations

import builtins
import functools
import statistics
from collections.abc import Callable, Mapping
from typing import Any, Union

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..schema import normalize_dtype_name, numpy_dtype_for, to_spark_type

__all__ = [
    "compile_agg_spec",
    "group_by",
    "transform",
    "iter_fn_needs_order",
    "AggSpecError",
    "KNOWN_AGGS",
]

AggFn = Union[Callable, str]
AggValue = Union[AggFn, tuple]


class AggSpecError(ValueError):
    pass


def _fq(fn: Callable[[Column], Column], name: str):
    return (fn, name)


# callable / name → (Column aggregate builder, canonical name).
# Population vs sample variants matter: numpy std/var default to ddof=0
# (population) while SQL STDDEV is sample — map numpy to the *_pop forms.
KNOWN_AGGS: dict[Any, tuple] = {
    builtins.sum: _fq(F.sum, "sum"),
    np.sum: _fq(F.sum, "sum"),
    builtins.len: _fq(F.count, "count"),
    builtins.max: _fq(F.max, "max"),
    np.max: _fq(F.max, "max"),
    builtins.min: _fq(F.min, "min"),
    np.min: _fq(F.min, "min"),
    np.mean: _fq(F.avg, "avg"),
    np.average: _fq(F.avg, "avg"),
    statistics.mean: _fq(F.avg, "avg"),
    np.std: _fq(F.stddev_pop, "stddev_pop"),
    np.var: _fq(F.var_pop, "var_pop"),
    statistics.stdev: _fq(F.stddev_samp, "stddev_samp"),
    statistics.variance: _fq(F.var_samp, "var_samp"),
    np.median: _fq(F.median, "median"),
    statistics.median: _fq(F.median, "median"),
    np.prod: _fq(F.product, "product"),
    builtins.any: _fq(F.max, "any"),
    builtins.all: _fq(F.min, "all"),
    "sum": _fq(F.sum, "sum"),
    "count": _fq(F.count, "count"),
    "len": _fq(F.count, "count"),
    "max": _fq(F.max, "max"),
    "min": _fq(F.min, "min"),
    "mean": _fq(F.avg, "avg"),
    "avg": _fq(F.avg, "avg"),
    "std": _fq(F.stddev_pop, "stddev_pop"),
    "stddev": _fq(F.stddev_samp, "stddev_samp"),
    "var": _fq(F.var_pop, "var_pop"),
    "median": _fq(F.median, "median"),
    "first": _fq(F.first, "first"),
    "last": _fq(F.last, "last"),
    "count_distinct": _fq(F.countDistinct, "count_distinct"),
    "approx_count_distinct": _fq(F.approx_count_distinct, "approx_count_distinct"),
    "collect_list": _fq(F.collect_list, "collect_list"),
    "collect_set": _fq(F.collect_set, "collect_set"),
    "product": _fq(F.product, "product"),
}

# numpy method-style ufunc reduce names users sometimes pass
for _alias, _target in [
    (np.nansum, F.sum),
    (np.nanmax, F.max),
    (np.nanmin, F.min),
    (np.nanmean, F.avg),
    (np.nanmedian, F.median),
    (np.nanstd, F.stddev_pop),
]:
    KNOWN_AGGS[_alias] = (_target, getattr(_target, "__name__", "agg"))


def _parse_spec(
    aggregation: Mapping[str, AggValue],
) -> list[tuple[str, AggFn, str]]:
    """Normalize ``{'col': fn}`` / ``{'new': (fn, 'col')}`` into
    ``[(out_name, fn, src_col)]``. Mirrors the reference's spec parser
    (``tafra/group.py:180-193``) including its validation errors.
    """
    parsed: list[tuple[str, AggFn, str]] = []
    for out_name, value in aggregation.items():
        if not isinstance(out_name, str):
            # reference raises for inverted specs like {sum: 'x'}
            # (test_tafra.py:693-704)
            raise AggSpecError(
                f"aggregation keys must be column-name strings, got "
                f"{out_name!r} — the spec is {{'col': fn}} or "
                f"{{'new_col': (fn, 'col')}}"
            )
        if isinstance(value, tuple):
            if len(value) != 2 or not callable(value[0]) or not isinstance(value[1], str):
                raise AggSpecError(
                    f"aggregation value for {out_name!r} must be a callable or "
                    f"(callable, column) 2-tuple, got {value!r}"
                )
            parsed.append((out_name, value[0], value[1]))
        elif callable(value) or isinstance(value, str):
            parsed.append((out_name, value, out_name))
        else:
            raise AggSpecError(
                f"aggregation value for {out_name!r} must be a callable or "
                f"(callable, column) 2-tuple, got {value!r}"
            )
    return parsed


def compile_agg_spec(
    df: DataFrame,
    aggregation: Mapping[str, AggValue],
    iter_fn: Mapping[str, AggFn] | None = None,
    dtype_compat: bool = False,
) -> tuple[list[Column], list[tuple[str, Callable, str]], list[tuple[str, AggFn]]]:
    """Compile an aggregation spec into Spark Column aggregates.

    Returns ``(columns, fallbacks, index_fns)``: Column expressions for
    every entry translatable to a built-in, (out_name, callable, src_col)
    entries needing the applyInPandas fallback, and iter_fn entries that
    need the first-occurrence group index (the reference passes
    ``fn(i * ones[group_size])`` — the group's enumeration index repeated
    group-size times, ``tafra/group.py:260-271``; only ``len``/count is
    index-independent).
    """
    dtypes = dict(df.dtypes)
    cols: list[Column] = []
    fallbacks: list[tuple[str, Callable, str]] = []
    index_fns: list[tuple[str, AggFn]] = []

    for out_name, fn, src in _parse_spec(aggregation):
        if src not in dtypes:
            raise KeyError(f"aggregation column {src!r} not in table")
        hit = _lookup(fn)
        if hit is not None:
            builder, _ = hit
            expr = builder(F.col(src))
            if dtype_compat:
                expr = expr.cast(df.schema[src].dataType)
            cols.append(expr.alias(out_name))
        else:
            fallbacks.append((out_name, fn, src))

    for out_name, fn in (iter_fn or {}).items():
        if not isinstance(out_name, str):
            raise AggSpecError(
                f"iter_fn keys must be new-column-name strings, got "
                f"{out_name!r} — the spec is {{'new_col': fn}}"
            )
        hit = _lookup(fn)
        if hit is not None and hit[1] == "count":
            # len(i * ones[group_size]) == group size — COUNT(*)
            cols.append(F.count(F.lit(1)).alias(out_name))
        else:
            index_fns.append((out_name, fn))
    return cols, fallbacks, index_fns


def iter_fn_needs_order(iter_fn: Mapping[str, AggFn] | None) -> bool:
    """True when any iter_fn entry needs the first-occurrence group index
    (i.e. anything but count/len)."""
    for fn in (iter_fn or {}).values():
        hit = _lookup(fn)
        if hit is None or hit[1] != "count":
            return True
    return False


def _iter_index_udf(fn: Callable):
    """Arbitrary iter_fn callable applied to ``np.full(n, i)`` per group —
    exactly the array the reference hands it (``tafra/group.py:270-271``).
    Arrow-batched over the (small) aggregated result, one row per group."""

    def _apply(gi: pd.Series, n: pd.Series) -> pd.Series:
        return pd.Series(
            [
                int(fn(np.full(int(c), int(g), dtype=np.int64)))
                for g, c in zip(gi, n)
            ]
        )

    return F.pandas_udf(_apply, "long")


def _iter_fn_expr(fn: AggFn, gi: Column, n: Column) -> Column:
    """The reference hands iter_fn callables ``np.full(n, i)`` — translate
    the known reductions of that array, else evaluate via Arrow UDF."""
    hit = _lookup(fn)
    name = hit[1] if hit else None
    if name in ("max", "min", "avg", "median", "first", "last"):
        expr = gi  # every element is i
    elif name == "sum":
        expr = gi * n  # sum(i * ones[n]) = i*n
    else:
        expr = _iter_index_udf(fn)(gi, n)
    return expr.cast("long")


def _apply_index_fns(
    agg: DataFrame, index_fns: list[tuple[str, AggFn]]
) -> DataFrame:
    """Attach iter_fn columns that depend on the group enumeration index.

    ``__first__`` (min source ordinal) and ``__n__`` (group size) must be
    present. The first-occurrence index is a global rank over
    ``__first__`` — an order-parity convenience over the (small)
    one-row-per-group aggregate, never a scan-sized sort.
    """
    gi = (F.row_number().over(Window.orderBy("__first__")) - 1).cast("long")
    agg = agg.withColumn("__gi__", gi)
    for out_name, fn in index_fns:
        agg = agg.withColumn(
            out_name, _iter_fn_expr(fn, F.col("__gi__"), F.col("__n__"))
        )
    return agg.drop("__first__", "__n__", "__gi__")


def _lookup(fn: AggFn):
    if isinstance(fn, str):
        return KNOWN_AGGS.get(fn)
    hit = KNOWN_AGGS.get(fn)
    if hit is not None:
        return hit
    # numpy dispatches some callables through np.<fn> vs ufunc identity;
    # match by (module, name) as a second chance
    name = getattr(fn, "__name__", None)
    mod = getattr(fn, "__module__", "") or ""
    if name and mod.startswith("numpy") and name in KNOWN_AGGS:
        return KNOWN_AGGS[name]
    return None


def _fallback_apply(
    df: DataFrame,
    keys: list[str],
    builtin_cols: list[Column],
    fallbacks: list[tuple[str, Callable, str]],
    dtype_compat: bool,
) -> DataFrame:
    """applyInPandas path for arbitrary Python agg callables.

    Output schema: reference rule — result dtype equals source column
    dtype (``tafra/group.py:255-256``); iter_fn callables yield int64.
    Runs one Arrow batch per group; this is the documented slow path.
    """
    from pyspark.sql import types as T

    key_fields = [df.schema[k] for k in keys]
    out_fields = list(key_fields)
    for out_name, _fn, src in fallbacks:
        out_fields.append(T.StructField(out_name, df.schema[src].dataType))
    schema = T.StructType(out_fields)

    fb = list(fallbacks)
    key_names = list(keys)

    def agg_one(pdf):
        import pandas as pd

        row: dict[str, Any] = {k: [pdf[k].iloc[0]] for k in key_names}
        for out_name, fn, src in fb:
            row[out_name] = [fn(pdf[src].to_numpy())]
        return pd.DataFrame(row)

    fallback_df = df.groupBy(*key_names).applyInPandas(agg_one, schema=schema)
    if builtin_cols:
        builtin_df = df.groupBy(*key_names).agg(*builtin_cols)
        # null-safe key equality: NULL-keyed groups are valid under
        # GROUP BY and must survive the recombination join
        fb_out = [o for o, _, _ in fb]
        renamed = fallback_df.select(
            *[F.col(k).alias(f"__k_{k}__") for k in key_names],
            *[F.col(c) for c in fb_out],
        )
        cond = functools.reduce(
            lambda a, b: a & b,
            [F.col(k).eqNullSafe(F.col(f"__k_{k}__")) for k in key_names],
        )
        joined = builtin_df.join(renamed, on=cond, how="inner")
        return joined.drop(*[f"__k_{k}__" for k in key_names])
    return fallback_df


def group_by(
    df: DataFrame,
    keys: list[str],
    aggregation: Mapping[str, AggValue],
    iter_fn: Mapping[str, AggFn] | None = None,
    dtype_compat: bool = False,
    ord_col: str | None = None,
) -> DataFrame:
    """SQL GROUP BY with the reference's spec format.

    Scale notes: translated aggregates get map-side partial aggregation
    (hash aggregate) and stay in codegen; only the group keys shuffle.
    iter_fn callables other than count need the first-occurrence group
    index and therefore ``ord_col`` (the source ordinal).
    """
    for k in keys:
        if k not in df.columns:
            raise KeyError(f"group key {k!r} not in table")
    cols, fallbacks, index_fns = compile_agg_spec(
        df, aggregation, iter_fn, dtype_compat
    )
    if index_fns:
        if ord_col is None or ord_col not in df.columns:
            raise AggSpecError(
                "iter_fn callables other than count/len depend on "
                "first-occurrence group order, which requires the source "
                "ordinal; table was scanned without one"
            )
        cols = cols + [
            F.min(F.col(ord_col)).alias("__first__"),
            F.count(F.lit(1)).alias("__n__"),
        ]
    if fallbacks:
        agg = _fallback_apply(df, keys, cols, fallbacks, dtype_compat)
    else:
        agg = df.groupBy(*keys).agg(*cols)
    if index_fns:
        agg = _apply_index_fns(agg, index_fns)
    return agg


def transform(
    df: DataFrame,
    keys: list[str],
    aggregation: Mapping[str, AggValue],
    iter_fn: Mapping[str, AggFn] | None = None,
    dtype_compat: bool = False,
    ord_col: str | None = None,
) -> DataFrame:
    """Grouped aggregate broadcast back to every row (reference
    ``Transform.apply``, ``tafra/group.py:277-338``).

    Spark: window aggregate over ``Window.partitionBy(keys)`` with the
    default unbounded frame — a single shuffle on the keys, no join.
    """
    for k in keys:
        if k not in df.columns:
            raise KeyError(f"group key {k!r} not in table")
    w = Window.partitionBy(*keys)
    out = df
    parsed = _parse_spec(aggregation)
    for out_name, fn, src in parsed:
        if src not in df.columns:
            raise KeyError(f"aggregation column {src!r} not in table")
        hit = _lookup(fn)
        if hit is None:
            # window-over-arbitrary-callable: fall back to group_by + join;
            # null-safe key equality so NULL-keyed groups keep their values
            agg = group_by(df, keys, {f"__t_{out_name}": (fn, src)}, None, dtype_compat)
            renamed = agg.select(
                *[F.col(k).alias(f"__k_{k}__") for k in keys],
                F.col(f"__t_{out_name}"),
            )
            cond = functools.reduce(
                lambda a, b: a & b,
                [F.col(k).eqNullSafe(F.col(f"__k_{k}__")) for k in keys],
            )
            out = (
                out.join(renamed, on=cond, how="left")
                .drop(*[f"__k_{k}__" for k in keys])
                .withColumnRenamed(f"__t_{out_name}", out_name)
            )
            continue
        expr = hit[0](F.col(src)).over(w)
        if dtype_compat:
            expr = expr.cast(df.schema[src].dataType)
        out = out.withColumn(out_name, expr)
    index_fns: list[tuple[str, AggFn]] = []
    for out_name, fn in (iter_fn or {}).items():
        hit = _lookup(fn)
        if hit is not None and hit[1] == "count":
            out = out.withColumn(out_name, F.count(F.lit(1)).over(w))
        else:
            index_fns.append((out_name, fn))
    if index_fns:
        # reference broadcasts fn(i * ones[group_size]) to every group row
        # (tafra/group.py:333-335); i = first-occurrence group index.
        # Compute (keys → gi, n) on the ONE-ROW-PER-GROUP aggregate (the
        # global rank sorts groups, not rows) and broadcast it back —
        # never a scan-sized single-partition window.
        if ord_col is None or ord_col not in out.columns:
            raise AggSpecError(
                "transform iter_fn callables other than count/len depend on "
                "first-occurrence group order, which requires the source "
                "ordinal; table was scanned without one"
            )
        gmap = df.groupBy(*keys).agg(
            F.min(F.col(ord_col)).alias("__first__"),
            F.count(F.lit(1)).alias("__n__"),
        )
        gmap = gmap.withColumn(
            "__gi__",
            (F.row_number().over(Window.orderBy("__first__")) - 1).cast("long"),
        ).drop("__first__")
        renamed = gmap.select(
            *[F.col(k).alias(f"__k_{k}__") for k in keys], "__gi__", "__n__"
        )
        cond = functools.reduce(
            lambda a, b: a & b,
            [F.col(k).eqNullSafe(F.col(f"__k_{k}__")) for k in keys],
        )
        out = out.join(F.broadcast(renamed), on=cond, how="left").drop(
            *[f"__k_{k}__" for k in keys]
        )
        for out_name, fn in index_fns:
            out = out.withColumn(
                out_name, _iter_fn_expr(fn, F.col("__gi__"), F.col("__n__"))
            )
        out = out.drop("__gi__", "__n__")
    return out
