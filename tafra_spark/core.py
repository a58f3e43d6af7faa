"""The ``Tafra`` facade: the reference's full API surface over a lazy
``pyspark.sql.DataFrame``.

The reference (petbox-dev/tafra) is an eager, mutable, single-node
columnar table — ``Dict[str, np.ndarray]`` + dtypes (``tafra/base.py:88-137``).
This class re-expresses every public method (SURVEY.md §2) on an immutable
lazy DataFrame:

- ``*_inplace`` variants rebind ``self._df`` (immutability under the hood).
- Positional semantics (int/slice indexing, ``update``'s row alignment)
  use a hidden ordinal column ``__ord__`` attached at local construction;
  for external scans it is materialized lazily — and positional ops on
  unordered distributed data are documented small-data conveniences, not
  the scale path.
- Eager properties that require an action (``rows``) cache their result.

Nothing here copies the reference's execution strategy: filters, joins,
groupbys are declarative plans handed to Catalyst.
"""

from __future__ import annotations

import itertools as _it
from collections.abc import Callable, Iterable, Iterator, Mapping, Sequence
from typing import Any, NamedTuple, Optional, Union

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .formatter import ObjectFormatter, object_formatter
from .operators import groupby as _groupby
from .operators import joins as _joins
from .operators import setops as _setops
from .schema import (
    normalize_dtype_name,
    numpy_dtype_for,
    spark_schema_to_dtypes,
    to_spark_type,
)
from .session import get_spark

__all__ = ["Tafra", "ORD"]

#: hidden ordinal column preserving source row order (SURVEY.md §2.8.4)
ORD = "__ord__"

_InitData = Union[
    Mapping[str, Any],
    Sequence[tuple],
    Iterator,
    DataFrame,
    pd.DataFrame,
    "Tafra",
    None,
]


class GroupDescription(NamedTuple):
    """Yielded by :meth:`Tafra.iterate_by` — mirrors the reference's
    ``GroupDescription`` (``tafra/group.py:49-53``)."""

    group: Any
    rows: Optional[np.ndarray]
    tafra: "Tafra"


def _normalize_init(data: _InitData) -> Optional[dict[str, Any]]:
    """Normalize dict / sequence-of-pairs / iterator / enumerate into a
    plain dict, stringifying non-str keys — reference ``_check_initvar``
    semantics (``tafra/base.py:189-308``)."""
    if data is None:
        return None
    if isinstance(data, Mapping):
        items = list(data.items())
    else:
        if isinstance(data, enumerate) or (
            isinstance(data, Iterator) and not isinstance(data, (str, bytes))
        ):
            data = list(data)
        if not isinstance(data, Sequence) or isinstance(data, (str, bytes)):
            raise TypeError(f"cannot construct Tafra from {type(data).__name__}")
        items = []
        for pair in data:
            if not isinstance(pair, Sequence) or len(pair) != 2:
                raise ValueError(
                    f"sequence initializer must contain (name, values) pairs, got {pair!r}"
                )
            items.append((pair[0], pair[1]))
    return {str(k): v for k, v in items}


def _ensure_column_values(name: str, value: Any, n_rows: Optional[int]) -> np.ndarray:
    """Coerce one column's values to a 1-D array; broadcast scalars and
    length-1 values to the table's row count; squeeze ndim>1 — reference
    ``_ensure_valid`` semantics (``tafra/base.py:708-782``)."""
    if isinstance(value, np.ndarray):
        arr = value
    elif isinstance(value, (list, tuple)):
        arr = np.asarray(value)
    elif isinstance(value, pd.Series):
        arr = value.to_numpy()
    elif isinstance(value, Iterator):
        arr = np.asarray(list(value))
    elif np.isscalar(value) or value is None or not isinstance(value, Iterable):
        count = 1 if n_rows is None else n_rows
        arr = np.full(count, value, dtype=object if isinstance(value, str) else None)
        if not isinstance(value, str):
            arr = np.asarray([value] * count)
    elif isinstance(value, str):
        count = 1 if n_rows is None else n_rows
        arr = np.asarray([value] * count, dtype=object)
    else:
        arr = np.asarray(list(value))
    if arr.ndim > 1:
        squeezed = np.squeeze(arr)
        if squeezed.ndim > 1:
            raise ValueError(f"column {name!r} must be 1-dimensional, got {arr.ndim}-D")
        arr = squeezed
    if arr.ndim == 0:
        arr = arr.reshape(1)
    if n_rows is not None and len(arr) == 1 and n_rows != 1:
        arr = np.repeat(arr, n_rows)
    if n_rows is not None and len(arr) != n_rows:
        raise ValueError(
            f"column {name!r} has {len(arr)} rows, expected {n_rows}"
        )
    return arr


class Tafra:
    """A minimalist dataframe facade over a PySpark DataFrame.

    Construction accepts everything the reference accepts
    (``tafra/base.py:88-187``): a dict of columns (values may be arrays,
    lists, scalars — scalars broadcast), a sequence of (name, values)
    pairs, an iterator of pairs, an ``enumerate``, plus (new here) a
    pandas or Spark DataFrame.
    """

    _df: DataFrame
    _formatter: ObjectFormatter

    def __init__(
        self,
        data: _InitData = None,
        dtypes: Optional[Mapping[str, Any]] = None,
        validate: bool = True,
        check_rows: bool = True,
        *,
        df: Optional[DataFrame] = None,
        spark: Optional[SparkSession] = None,
        _rows: Optional[int] = None,
    ) -> None:
        self._formatter = object_formatter
        self._cached_rows: Optional[int] = _rows
        if df is not None:
            self._df = df
            if dtypes:
                self.update_dtypes_inplace(dtypes)
            return
        if isinstance(data, Tafra):
            self._df = data._df
            self._cached_rows = data._cached_rows
            if dtypes:
                self.update_dtypes_inplace(dtypes)
            return
        if isinstance(data, DataFrame):
            self._df = data
            if dtypes:
                self.update_dtypes_inplace(dtypes)
            return
        if isinstance(data, pd.DataFrame):
            self._df = self._from_pandas(data, spark)
            if dtypes:
                self.update_dtypes_inplace(dtypes)
            return

        if not validate and isinstance(data, Mapping):
            # reference validate=False contract (tafra/base.py:150,178-186):
            # trust the caller — data is a well-formed dict of equal-length
            # arrays; skip normalization, scalar broadcast, and the
            # ObjectFormatter pass
            mapping = {str(k): v for k, v in data.items()}
        else:
            mapping = _normalize_init(data)
        if mapping is None:
            raise ValueError("Tafra requires data to construct")
        # determine row count from the first non-scalar column
        n_rows: Optional[int] = None
        for v in mapping.values():
            if isinstance(v, (np.ndarray, list, tuple, pd.Series)) and not isinstance(
                v, str
            ):
                n_rows = len(v)
                break
        arrays: dict[str, np.ndarray] = {}
        for name, value in mapping.items():
            arr = (
                np.asarray(value)
                if not validate
                else _ensure_column_values(name, value, n_rows)
            )
            if n_rows is None:
                n_rows = len(arr)
            if check_rows and len(arr) != n_rows:
                raise ValueError(
                    f"column {name!r} has {len(arr)} rows, expected {n_rows}"
                )
            arrays[name] = arr
        pdf = pd.DataFrame()
        for name, arr in arrays.items():
            series = pd.Series(arr)
            if validate and series.dtype == object:
                series = self._formatter.apply(series)
            pdf[name] = series
        # formatter already applied above (or deliberately skipped under
        # validate=False) — _from_pandas must not re-apply it
        self._df = self._from_pandas(pdf, spark, apply_formatter=False)
        self._cached_rows = int(n_rows or 0)
        if dtypes:
            self.update_dtypes_inplace(dtypes)

    # ------------------------------------------------------------------ #
    # construction helpers

    @staticmethod
    def _spark() -> SparkSession:
        return SparkSession.getActiveSession() or get_spark()

    def _from_pandas(
        self,
        pdf: pd.DataFrame,
        spark: Optional[SparkSession],
        apply_formatter: bool = True,
    ) -> DataFrame:
        spark = spark or self._spark()
        pdf = pdf.copy()
        if apply_formatter:
            for col in pdf.columns:
                if pdf[col].dtype == object:
                    pdf[col] = self._formatter.apply(pdf[col])
        if ORD not in pdf.columns:
            pdf.insert(0, ORD, np.arange(len(pdf), dtype=np.int64))
        self._cached_rows = len(pdf)
        # map object columns that remain non-string to strings only if mixed;
        # let Arrow handle the rest
        fields = []
        for col in pdf.columns:
            dtype = pdf[col].dtype
            if dtype == object:
                non_null = pdf[col].dropna()
                sample = non_null.iloc[0] if len(non_null) else None
                if isinstance(sample, str) or sample is None:
                    fields.append(T.StructField(col, T.StringType(), True))
                elif isinstance(sample, bool):
                    fields.append(T.StructField(col, T.BooleanType(), True))
                elif isinstance(sample, int):
                    fields.append(T.StructField(col, T.LongType(), True))
                elif isinstance(sample, float):
                    fields.append(T.StructField(col, T.DoubleType(), True))
                elif isinstance(sample, bytes):
                    fields.append(T.StructField(col, T.BinaryType(), True))
                else:
                    import datetime as _dt

                    if isinstance(sample, _dt.datetime):
                        fields.append(T.StructField(col, T.TimestampType(), True))
                    elif isinstance(sample, _dt.date):
                        fields.append(T.StructField(col, T.DateType(), True))
                    else:
                        pdf[col] = pdf[col].map(
                            lambda v: None if v is None else str(v)
                        )
                        fields.append(T.StructField(col, T.StringType(), True))
            else:
                fields.append(
                    T.StructField(col, to_spark_type(str(dtype)), True)
                )
        return spark.createDataFrame(pdf, schema=T.StructType(fields))

    @classmethod
    def _wrap(cls, df: DataFrame, rows: Optional[int] = None) -> "Tafra":
        return cls(df=df, _rows=rows)

    def _plain(self) -> DataFrame:
        """The user-visible DataFrame: hidden ordinal stripped."""
        if ORD in self._df.columns:
            return self._df.drop(ORD)
        return self._df

    @property
    def df(self) -> DataFrame:
        """Escape hatch: the underlying Spark DataFrame (no ordinal)."""
        return self._plain()

    def _has_ord(self) -> bool:
        return ORD in self._df.columns

    def _ensure_ord(self) -> DataFrame:
        """Materialize the ordinal for positional ops on scanned data.

        Uses ``row_number`` over ``monotonically_increasing_id`` — a
        global sort, i.e. a small-data convenience, never the scale path.
        """
        if self._has_ord():
            return self._df
        w = Window.orderBy(F.monotonically_increasing_id())
        return self._df.withColumn(ORD, F.row_number().over(w) - 1)

    def _dense_ord(self) -> DataFrame:
        """Ordinal re-normalized to a dense 0..n-1 in current source order.

        Row-subsetting ops (filter, positional indexing) preserve the
        *original* ordinals — correct for ordering, but positional ops and
        array assignment need positions of the CURRENT table. Global
        window; positional semantics are a driver-side convenience, never
        the scale path (SURVEY.md §1.4).
        """
        df = self._ensure_ord()
        w = Window.orderBy(ORD)
        return df.withColumn(ORD, F.row_number().over(w) - 1)

    # ------------------------------------------------------------------ #
    # alternate constructors (reference ``tafra/base.py:886-1114``)

    @classmethod
    def from_records(
        cls,
        records: Iterable[tuple],
        columns: Sequence[str],
        dtypes: Optional[Mapping[str, Any]] = None,
        spark: Optional[SparkSession] = None,
    ) -> "Tafra":
        """Column-pivot an iterable of row tuples (reference
        ``tafra/base.py:886-917``)."""
        rows = list(records)
        if not rows:
            pdf = pd.DataFrame({c: [] for c in columns})
        else:
            pdf = pd.DataFrame(rows, columns=list(columns))
        t = cls(pdf, spark=spark)
        if dtypes:
            t.update_dtypes_inplace(dtypes)
        return t

    @classmethod
    def from_dataframe(
        cls,
        df: Union[pd.DataFrame, DataFrame],
        dtypes: Optional[Mapping[str, Any]] = None,
    ) -> "Tafra":
        """Ingest a pandas or Spark DataFrame (reference
        ``tafra/base.py:919-976``)."""
        return cls(df, dtypes=dtypes)

    @classmethod
    def from_series(
        cls, series: pd.Series, dtypes: Optional[Mapping[str, Any]] = None
    ) -> "Tafra":
        name = series.name if series.name is not None else "0"
        return cls({str(name): series.to_numpy()}, dtypes=dtypes)

    @classmethod
    def as_tafra(cls, maybe_tafra: Any) -> "Tafra":
        """Polymorphic coercion (reference ``tafra/base.py:1075-1114``)."""
        if isinstance(maybe_tafra, Tafra):
            return maybe_tafra
        if isinstance(maybe_tafra, (pd.DataFrame, DataFrame)):
            return cls(maybe_tafra)
        if isinstance(maybe_tafra, pd.Series):
            return cls.from_series(maybe_tafra)
        if isinstance(maybe_tafra, Mapping):
            return cls(maybe_tafra)
        raise TypeError(f"cannot coerce {type(maybe_tafra).__name__} to Tafra")

    @classmethod
    def read_parquet(
        cls, path: str, spark: Optional[SparkSession] = None
    ) -> "Tafra":
        """Scan a parquet file/directory (scale-path source; the reference
        has no parquet reader — extension)."""
        spark = spark or cls._spark()
        return cls(df=spark.read.parquet(path))

    @classmethod
    def read_jsonl(
        cls,
        path: str,
        schema: Optional[str] = None,
        spark: Optional[SparkSession] = None,
    ) -> "Tafra":
        """Scan newline-delimited JSON (the standard raw-corpus interchange
        format for training-data pipelines; extension — no reference
        counterpart). Pass ``schema`` (DDL string) to skip the inference
        scan: at 100 TB, schema-on-read inference is a full extra pass.
        """
        spark = spark or cls._spark()
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return cls(df=reader.json(path))

    @classmethod
    def read_text(
        cls,
        path: str,
        whole_file: bool = False,
        line_col: str = "text",
        spark: Optional[SparkSession] = None,
    ) -> "Tafra":
        """Scan raw text (extension — no reference counterpart): one row
        per LINE by default, or one row per FILE with ``whole_file``
        (columns ``path``, ``text`` — small-doc corpora stored
        file-per-document).

        Line mode is the splittable scale path: Spark splits text files
        on block boundaries, so a 100 TB line corpus parallelizes like
        any other scan. Whole-file mode reads each file on ONE task —
        correct for file-per-document layouts, a bottleneck for a few
        giant files; it exists for ingest, not analytics (convert to
        parquet/JSONL downstream).
        """
        spark = spark or cls._spark()
        if whole_file:
            # wholetext keeps one row per file; attach the path for the
            # doc identity the downstream pipeline will key on
            df = spark.read.text(path, wholetext=True).select(
                F.input_file_name().alias("path"),
                F.col("value").alias("text"),
            )
            return cls(df=df)
        return cls(
            df=spark.read.text(path).select(F.col("value").alias(line_col))
        )

    @classmethod
    def read_orc(
        cls, path: str, spark: Optional[SparkSession] = None
    ) -> "Tafra":
        """Scan an ORC file/directory (columnar source parity with
        parquet; extension — no reference counterpart). Predicate
        pushdown and column pruning reach the ORC reader exactly as
        they do the parquet one."""
        spark = spark or cls._spark()
        return cls(df=spark.read.orc(path))

    @classmethod
    def read_sql(cls, query: str, cur: Any = None, *, url: str | None = None,
                 spark: Optional[SparkSession] = None, **jdbc_options: str) -> "Tafra":
        """Execute SELECT and fetch (reference ``tafra/base.py:978-1005``).

        Two paths: a DB-API cursor (parity with the reference — single
        fetch through the driver) or JDBC (``url=...`` — the scale path
        where executors read partitioned ranges directly).
        """
        from .sources.sql import read_sql as _read_sql

        return _read_sql(cls, query, cur, url=url, spark=spark, **jdbc_options)

    @classmethod
    def read_sql_chunks(
        cls, query: str, cur: Any, chunksize: int = 100,
        spark: Optional[SparkSession] = None,
    ) -> Iterator["Tafra"]:
        """Yield one Tafra per ``chunksize`` rows (reference
        ``tafra/base.py:1007-1040``)."""
        from .sources.sql import read_sql_chunks as _chunks

        return _chunks(cls, query, cur, chunksize, spark=spark)

    @classmethod
    def read_csv(
        cls,
        csv_file: Any,
        guess_rows: int = 5,
        missing: Optional[str] = "",
        dtypes: Optional[Mapping[str, Any]] = None,
        spark: Optional[SparkSession] = None,
        **csvkw: Any,
    ) -> "Tafra":
        """CSV scan with tafra-parity type inference (reference
        ``tafra/base.py:1042-1073`` + ``tafra/csvreader.py``)."""
        from .sources.csv import read_csv as _read_csv

        return _read_csv(
            cls, csv_file, guess_rows=guess_rows, missing=missing,
            dtypes=dtypes, spark=spark, **csvkw
        )

    # ------------------------------------------------------------------ #
    # metadata properties (reference ``tafra/base.py:1116-1227``)

    @property
    def columns(self) -> tuple[str, ...]:
        return tuple(c for c in self._df.columns if c != ORD)

    @columns.setter
    def columns(self, _: Any) -> None:
        raise ValueError("cannot assign to `columns`; use rename()")

    @property
    def rows(self) -> int:
        if self._cached_rows is None:
            self._cached_rows = self._df.count()
        return self._cached_rows

    @rows.setter
    def rows(self, _: Any) -> None:
        raise ValueError("cannot assign to `rows`")

    @property
    def dtypes(self) -> dict[str, str]:
        return {
            name: dtype
            for name, dtype in spark_schema_to_dtypes(self._df.schema).items()
            if name != ORD
        }

    @dtypes.setter
    def dtypes(self, _: Any) -> None:
        raise ValueError("cannot assign to `dtypes`; use update_dtypes()")

    @property
    def data(self) -> dict[str, np.ndarray]:
        """Collect all columns as numpy arrays (action!). Mirrors the
        reference's ``.data`` view; on Spark this is an explicit collect."""
        pdf = self.to_pandas()
        return {c: pdf[c].to_numpy() for c in pdf.columns}

    @data.setter
    def data(self, _: Any) -> None:
        raise ValueError("cannot assign to `data`")

    @property
    def size(self) -> int:
        return self.rows * len(self.columns)

    @property
    def ndim(self) -> int:
        return 2

    @property
    def shape(self) -> tuple[int, int]:
        return (self.rows, len(self.columns))

    # dict-like views (reference ``tafra/base.py:1395-1447``)
    def keys(self):
        return self.dtypes.keys()

    def values(self):
        return self.data.values()

    def items(self):
        return self.data.items()

    def get(self, key: str, default: Any = None) -> Any:
        if key in self.columns:
            return self[key]
        return default

    # ------------------------------------------------------------------ #
    # indexing (reference ``tafra/base.py:310-495``)

    def __getitem__(self, item: Any):
        if isinstance(item, str):
            if item not in self.columns:
                raise KeyError(f"column {item!r} not in table")
            return F.col(item)
        if isinstance(item, Column):
            return self.filter(item)
        if isinstance(item, int):
            return self._positional([item])
        if isinstance(item, slice):
            n = self.rows
            idx = list(range(*item.indices(n)))
            return self._positional(idx)
        if isinstance(item, np.ndarray):
            if item.dtype == bool:
                idx = np.flatnonzero(item).tolist()
                return self._positional(idx)
            return self._positional([int(i) for i in item.tolist()])
        if isinstance(item, Sequence) and not isinstance(item, (str, bytes)):
            items = list(item)
            if items and all(isinstance(i, str) for i in items):
                return self.select(items)
            if items and all(isinstance(i, (bool, np.bool_)) for i in items):
                return self._positional([i for i, b in enumerate(items) if b])
            return self._positional([int(i) for i in items])
        raise TypeError(f"cannot index Tafra with {type(item).__name__}")

    def _positional(self, indices: list[int]) -> "Tafra":
        """Row selection by position via the hidden ordinal. Small-data
        convenience (SURVEY.md §1.4 row-position note)."""
        n = self.rows
        norm = [i + n if i < 0 else i for i in indices]
        for i in norm:
            if i < 0 or i >= n:
                raise IndexError(f"row index {i} out of range for {n} rows")
        df = self._dense_ord()
        if not norm:  # empty selection: keep schema, zero rows
            return Tafra._wrap(df.filter(F.lit(False)), rows=0)
        # position join (not isin): numpy advanced indexing preserves
        # DUPLICATE indices and selection order (reference ``_aindex``,
        # ``tafra/base.py:454-472``) — found by property testing
        spark = self._spark()
        sel = pd.DataFrame(
            {ORD: np.asarray(norm, dtype=np.int64),
             "__pos__": np.arange(len(norm), dtype=np.int64)}
        )
        seldf = spark.createDataFrame(sel)
        out = (
            df.join(F.broadcast(seldf), on=ORD, how="inner")
            .drop(ORD)
            .withColumnRenamed("__pos__", ORD)
        )
        return Tafra._wrap(out, rows=len(norm))

    def __setitem__(self, name: str, value: Any) -> None:
        if isinstance(value, Column):
            self._df = self._df.withColumn(name, value)
            return
        if np.isscalar(value) or value is None:
            self._df = self._df.withColumn(name, F.lit(value))
            return
        arr = _ensure_column_values(name, value, self.rows)
        # position-aligned array assignment: DENSE ordinal zip join (the
        # ordinal must be 0..n-1 of the CURRENT table, not stale pre-filter
        # values, or the join misses and fills NULLs)
        df = self._dense_ord()
        spark = self._spark()
        pdf = pd.DataFrame({ORD: np.arange(len(arr), dtype=np.int64), name: arr})
        if pdf[name].dtype == object:
            pdf[name] = self._formatter.apply(pdf[name])
        other = spark.createDataFrame(pdf)
        other = other.withColumnRenamed(name, name + "__new__")
        joined = df.drop(name) if name in df.columns else df
        joined = joined.join(F.broadcast(other), on=ORD, how="left")
        self._df = joined.withColumnRenamed(name + "__new__", name)

    def __delitem__(self, name: str) -> None:
        self.delete_inplace([name] if isinstance(name, str) else name)

    def __len__(self) -> int:
        return self.rows

    def __contains__(self, name: str) -> bool:
        return name in self.columns

    def __iter__(self) -> Iterator[str]:
        return iter(self.columns)

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, Tafra):
            return NotImplemented
        if self.columns != other.columns or self.dtypes != other.dtypes:
            return False
        a, b = self.to_pandas(), other.to_pandas()
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
            return True
        except AssertionError:
            return False

    def __rshift__(self, fn: Callable[["Tafra"], Any]) -> Any:
        return self.pipe(fn)

    def __repr__(self) -> str:
        return f"Tafra(columns={list(self.columns)}, dtypes={self.dtypes})"

    # ------------------------------------------------------------------ #
    # projections / filters / row ops (SURVEY.md §2.2)

    def select(self, columns: Union[str, Iterable[str]]) -> "Tafra":
        """Column projection (reference ``tafra/base.py:1354-1378``)."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        for c in cols:
            if c not in self.columns:
                raise KeyError(f"column {c!r} not in table")
        keep = ([ORD] if self._has_ord() else []) + cols
        return Tafra._wrap(self._df.select(*keep), rows=self._cached_rows)

    def filter(self, predicate: Column) -> "Tafra":
        """Boolean-predicate filter — the ``t[t['x'] <= 4]`` idiom
        (reference ``_ndindex``, ``tafra/base.py:474-495``)."""
        return Tafra._wrap(self._df.filter(predicate))

    def head(self, n: int = 5) -> "Tafra":
        """First n rows in source order (reference ``tafra/base.py:1380-1393``)."""
        if self._has_ord():
            # orderBy + limit → TakeOrderedAndProject; correct even when
            # filtering left non-dense ordinals (stale-ord bug)
            out = self._df.orderBy(ORD).limit(n)
            return Tafra._wrap(out)
        return Tafra._wrap(self._df.limit(n))

    def rename(self, renames: Mapping[str, str]) -> "Tafra":
        for old in renames:
            if old not in self.columns:
                raise KeyError(f"column {old!r} not in table")
        return Tafra._wrap(
            self._df.withColumnsRenamed(dict(renames)), rows=self._cached_rows
        )

    def rename_inplace(self, renames: Mapping[str, str]) -> "Tafra":
        self._df = self.rename(renames)._df
        return self

    def delete(self, columns: Union[str, Iterable[str]]) -> "Tafra":
        cols = [columns] if isinstance(columns, str) else list(columns)
        for c in cols:
            if c not in self.columns:
                raise KeyError(f"column {c!r} not in table")
        return Tafra._wrap(self._df.drop(*cols), rows=self._cached_rows)

    def delete_inplace(self, columns: Union[str, Iterable[str]]) -> "Tafra":
        self._df = self.delete(columns)._df
        return self

    def copy(self, order: str = "C") -> "Tafra":
        """Immutability makes this a new handle (reference deep-copies,
        ``tafra/base.py:1652-1673``)."""
        return Tafra._wrap(self._df, rows=self._cached_rows)

    def update(self, other: Union["Tafra", Mapping, pd.DataFrame]) -> "Tafra":
        t = self.copy()
        t.update_inplace(other)
        return t

    def update_inplace(
        self, other: Union["Tafra", Mapping, pd.DataFrame]
    ) -> "Tafra":
        """Overwrite/add columns from another Tafra (or anything
        ``as_tafra`` accepts — the reference takes raw data dicts too,
        ``test_tafra.py:527``), position-aligned; row counts must match
        (reference ``tafra/base.py:1449-1496``)."""
        if not isinstance(other, Tafra):
            other = Tafra.as_tafra(other)
        if other.rows != self.rows:
            raise ValueError(
                f"row count mismatch: other has {other.rows}, self has {self.rows}"
            )
        left = self._dense_ord()
        right = other._dense_ord()
        new_cols = [c for c in other.columns]
        right_sel = right.select(
            ORD, *[F.col(c).alias(c + "__upd__") for c in new_cols]
        )
        joined = left.drop(*[c for c in new_cols if c in left.columns]).join(
            right_sel, on=ORD, how="inner"
        )
        for c in new_cols:
            joined = joined.withColumnRenamed(c + "__upd__", c)
        self._df = joined
        return self

    def update_dtypes(self, dtypes: Mapping[str, Any]) -> "Tafra":
        t = self.copy()
        t.update_dtypes_inplace(dtypes)
        return t

    def update_dtypes_inplace(self, dtypes: Mapping[str, Any]) -> "Tafra":
        """Cast columns; empty-string values become NULL when a direct
        cast would fail (reference ``tafra/base.py:1530-1558``)."""
        df = self._df
        for name, dtype in dtypes.items():
            if name not in self.columns:
                raise KeyError(f"column {name!r} not in table")
            target = to_spark_type(dtype)
            src_type = df.schema[name].dataType
            col = F.col(name)
            if isinstance(src_type, T.StringType) and not isinstance(
                target, T.StringType
            ):
                # '' → NULL before cast (reference's ValueError fallback)
                col = F.when(F.trim(col) == "", None).otherwise(col)
            df = df.withColumn(name, col.cast(target))
        self._df = df
        return self

    def parse_object_dtypes(self) -> "Tafra":
        t = self.copy()
        t.parse_object_dtypes_inplace()
        return t

    def parse_object_dtypes_inplace(self) -> "Tafra":
        """Re-run the ObjectFormatter over string columns (reference
        ``tafra/base.py:784-802``). String-typed engine ⇒ no-op unless a
        converter is registered for ``str``."""
        fn = self._formatter.get("str")
        if fn is None:
            return self
        for name, dtype in self.dtypes.items():
            if dtype == "str":
                pdf_fn = fn

                def apply_series(batch: pd.Series) -> pd.Series:
                    return pdf_fn(batch)

                udf = F.pandas_udf(apply_series, T.StringType())
                self._df = self._df.withColumn(name, udf(F.col(name)))
        return self

    def coalesce(
        self, column: str, fills: Sequence[Any]
    ) -> "Tafra":
        t = self.copy()
        t.coalesce_inplace(column, fills)
        return t

    def coalesce_inplace(self, column: str, fills: Sequence[Any]) -> "Tafra":
        """SQL COALESCE / fillna: fill None-or-NaN positions left to right
        from scalars, arrays, or column names; may create a brand-new
        column (reference ``tafra/base.py:1675-1741``)."""
        exists = column in self.columns
        exprs: list[Column] = []
        if exists:
            base = F.col(column)
            if self.dtypes.get(column) in ("float32", "float64"):
                base = F.when(F.isnan(base), None).otherwise(base)
            exprs.append(base)
        for i, fill in enumerate(fills):
            if isinstance(fill, Column):
                exprs.append(fill)
            elif isinstance(fill, str) and fill in self.columns:
                exprs.append(F.col(fill))
            elif np.isscalar(fill) or fill is None:
                exprs.append(F.lit(fill))
            else:
                # array fill: attach via ordinal zip join
                arr = _ensure_column_values(f"__fill_{i}__", fill, self.rows)
                tmp = f"__fill_{i}__"
                self[tmp] = arr
                nn = F.col(tmp)
                if pd.Series(arr).dtype.kind == "f":
                    nn = F.when(F.isnan(nn), None).otherwise(nn)
                exprs.append(nn)
        self._df = self._df.withColumn(column, F.coalesce(*exprs))
        drop = [c for c in self._df.columns if c.startswith("__fill_")]
        if drop:
            self._df = self._df.drop(*drop)
        return self

    # ------------------------------------------------------------------ #
    # grouping (SURVEY.md §2.4)

    def group_by(
        self,
        group_by: Sequence[str],
        aggregation: Mapping[str, Any] = {},
        iter_fn: Mapping[str, Any] = {},
        dtype_compat: bool = False,
    ) -> "Tafra":
        """SQL GROUP BY (reference ``GroupBy.apply``,
        ``tafra/group.py:215-274``). ``dtype_compat=True`` reproduces the
        reference's result-dtype-equals-source-dtype rule."""
        if _groupby.iter_fn_needs_order(iter_fn):
            # index-dependent iter_fn: reference semantics need the
            # first-occurrence group order → keep/materialize the ordinal
            out = _groupby.group_by(
                self._ensure_ord(), list(group_by), aggregation, iter_fn,
                dtype_compat, ord_col=ORD,
            )
        else:
            out = _groupby.group_by(
                self._plain(), list(group_by), aggregation, iter_fn, dtype_compat
            )
        return Tafra._wrap(out)

    def transform(
        self,
        group_by: Sequence[str],
        aggregation: Mapping[str, Any] = {},
        iter_fn: Mapping[str, Any] = {},
        dtype_compat: bool = False,
    ) -> "Tafra":
        """Grouped aggregate broadcast to all rows (reference
        ``Transform.apply``, ``tafra/group.py:277-338``)."""
        keep_ord = self._has_ord()
        needs_ord = _groupby.iter_fn_needs_order(iter_fn)
        src = self._ensure_ord() if needs_ord else (
            self._df if keep_ord else self._plain()
        )
        out = _groupby.transform(
            src, list(group_by), aggregation, iter_fn, dtype_compat,
            ord_col=ORD if (keep_ord or needs_ord) else None,
        )
        if needs_ord and not keep_ord:
            out = out.drop(ORD)
        return Tafra._wrap(out, rows=self._cached_rows)

    def iterate_by(
        self, group_by: Sequence[str], collect_masks: bool = False
    ) -> Iterator[GroupDescription]:
        """Generator of (group, rows, sub-Tafra) per unique key, in
        first-occurrence order (reference ``IterateBy.apply``,
        ``tafra/group.py:341-381``). Driver-side iteration — small-data
        convenience; use :meth:`apply_by` for the distributed analogue."""
        keys = list(group_by)
        for k in keys:
            if k not in self.columns:
                raise KeyError(f"group key {k!r} not in table")
        # dense ordinal: masks index 0..rows-1 of the CURRENT table
        df = self._dense_ord()
        key_order = (
            df.groupBy(*keys)
            .agg(F.min(ORD).alias("__first__"))
            .orderBy("__first__")
            .collect()
        )
        for row in key_order:
            vals = tuple(row[k] for k in keys)
            pred = None
            for k, v in zip(keys, vals):
                term = F.col(k).isNull() if v is None else (F.col(k) == F.lit(v))
                pred = term if pred is None else (pred & term)
            sub = df.filter(pred)
            mask = None
            if collect_masks:
                ords = [r[0] for r in sub.select(ORD).collect()]
                mask = np.zeros(self.rows, dtype=bool)
                mask[ords] = True
            group = vals[0] if len(vals) == 1 else vals
            yield GroupDescription(group, mask, Tafra._wrap(sub))

    def apply_by(
        self,
        group_by: Sequence[str],
        fn: Callable[[pd.DataFrame], pd.DataFrame],
        schema: Union[str, T.StructType],
    ) -> "Tafra":
        """Distributed grouped-map (``applyInPandas``) — the scale path
        corresponding to ``iterate_by`` (SURVEY.md §2.4 mapping)."""
        out = self._plain().groupBy(*list(group_by)).applyInPandas(fn, schema=schema)
        return Tafra._wrap(out)

    # ------------------------------------------------------------------ #
    # joins (SURVEY.md §2.3)

    def inner_join(
        self,
        right: "Tafra",
        on: Sequence[tuple],
        select: Optional[Iterable[str]] = None,
        auto_band: bool = True,
    ) -> "Tafra":
        """Pure-theta conjunctions with a band pattern (one column
        bounded below AND above by the other side) auto-rewrite into the
        range-bucketed hash join of :meth:`band_join` — result-exact,
        avoids the O(|L|·|R|) nested loop; ``auto_band=False`` opts out."""
        out = _joins.inner_join(
            self._plain(), right._plain(), on, select, auto_band=auto_band
        )
        return Tafra._wrap(out)

    def left_join(
        self,
        right: "Tafra",
        on: Sequence[tuple],
        select: Optional[Iterable[str]] = None,
    ) -> "Tafra":
        out = _joins.left_join(self._plain(), right._plain(), on, select)
        return Tafra._wrap(out)

    def cross_join(
        self, right: "Tafra", select: Optional[Iterable[str]] = None
    ) -> "Tafra":
        out = _joins.cross_join(self._plain(), right._plain(), select)
        return Tafra._wrap(out)

    # join extensions the reference lacks (SURVEY.md §2.3 last row) —
    # free in Spark, same (l, r, op)-triple predicate compiler
    def semi_join(self, right: "Tafra", on: Sequence[tuple]) -> "Tafra":
        """SQL EXISTS — left rows with ≥1 match; right columns dropped."""
        out = _joins.semi_anti_join(self._plain(), right._plain(), on, "left_semi")
        return Tafra._wrap(out)

    def band_join(
        self,
        right: "Tafra",
        on: Sequence[tuple],
        bucket_width: int,
        select: Optional[Iterable[str]] = None,
    ) -> "Tafra":
        """Range-bucketed band join: same (l, r, op)-triple language as
        ``inner_join``, but when the conjunction bounds one side's
        orderable key inside the other side's interval, the plan is a
        bucket equi-join + residual filter instead of the O(|L|·|R|)
        nested loop ``inner_join`` correctly degrades to for pure-theta
        predicates. Pick ``bucket_width`` ≈ the typical interval
        length. See ``operators/joins.py:band_join``."""
        out = _joins.band_join(
            self._plain(), right._plain(), on, bucket_width, select
        )
        return Tafra._wrap(out)

    def global_row_number(
        self,
        order_by: Sequence[str],
        out: str = "rn",
        num_partitions: Optional[int] = None,
    ) -> "Tafra":
        """Exact total-order ``row_number`` WITHOUT the single-partition
        window trap: range exchange + per-partition rank + offsets, so
        every stage stays cluster-parallel. ``order_by`` must be a
        total order (end with a unique id). See
        ``operators/order.py:global_row_number``."""
        from .operators.order import global_row_number as _grn

        return Tafra._wrap(
            _grn(self._plain(), list(order_by), out, num_partitions)
        )

    def sorted_neighborhood(
        self,
        key_cols: Sequence[str],
        window: int,
        id_col: str = "doc_id",
    ) -> "Tafra":
        """Sorted-neighborhood (SNM) blocking candidates: all id pairs
        within ``window`` positions of the ``(key_cols, id)`` sort
        order — constant per-record candidate volume, immune to
        equality blocking's hot-key quadratic blowup. See
        ``operators/order.py:sorted_neighborhood_pairs``."""
        from .operators.order import sorted_neighborhood_pairs as _snm

        return Tafra._wrap(
            _snm(self._plain(), list(key_cols), window, id_col)
        )

    def anti_join(self, right: "Tafra", on: Sequence[tuple]) -> "Tafra":
        """SQL NOT EXISTS — left rows with zero matches."""
        out = _joins.semi_anti_join(self._plain(), right._plain(), on, "left_anti")
        return Tafra._wrap(out)

    def full_join(
        self,
        right: "Tafra",
        on: Sequence[tuple],
        select: Optional[Iterable[str]] = None,
    ) -> "Tafra":
        """SQL FULL OUTER JOIN."""
        out = _joins._join(self._plain(), right._plain(), on, "full", select)
        return Tafra._wrap(out)

    def asof_join(
        self,
        right: "Tafra",
        by: Sequence[str],
        left_on: str,
        right_on: Optional[str] = None,
        direction: str = "backward",
    ) -> "Tafra":
        """LEFT as-of join (nearest right row at-or-before each left
        timestamp per key) — union-and-window, one shuffle on the key.
        Extension; the reference has no temporal joins (SURVEY.md §2.3)."""
        from .operators.temporal import asof_join as _asof

        out = _asof(self._plain(), right._plain(), by, left_on, right_on, direction)
        return Tafra._wrap(out)

    def range_join(
        self,
        intervals: "Tafra",
        point_col: str,
        start_col: str,
        end_col: str,
        bucket_width: int = 3600,
    ) -> "Tafra":
        """Point-in-interval join via bucketed equi-join (no nested-loop
        range predicate). Extension operator."""
        from .operators.temporal import range_join_points as _range

        out = _range(
            self._plain(), intervals._plain(), point_col, start_col, end_col,
            bucket_width,
        )
        return Tafra._wrap(out)

    # ------------------------------------------------------------------ #
    # set ops (SURVEY.md §2.4-2.5)

    def union(self, other: "Tafra") -> "Tafra":
        out = _setops.union_all(self._plain(), other._plain())
        return Tafra._wrap(out)

    def union_inplace(self, other: "Tafra") -> "Tafra":
        self._df = self.union(other)._df
        self._cached_rows = None
        return self

    # extensions (free in Spark; absent in the reference, SURVEY.md §2.5)
    def distinct(self) -> "Tafra":
        return Tafra._wrap(self._plain().distinct())

    def upsert(self, other: "Tafra", keys: Sequence[str]) -> "Tafra":
        """Keyed merge (SQL MERGE shape): rows of ``other`` replace
        same-key rows of ``self``; new keys append. Expressed as
        anti-join + UNION ALL — two narrow schema-checked plans, one
        shuffle on the keys. Complements the reference's positional
        ``update`` with the keyed variant a real pipeline needs."""
        key_list = list(keys)
        for k in key_list:
            if k not in self.columns or k not in other.columns:
                raise KeyError(f"upsert key {k!r} must exist in both tables")
        if tuple(self.columns) != tuple(other.columns):
            raise ValueError("upsert requires identical schemas")
        kept = _joins.semi_anti_join(
            self._plain(), other._plain(),
            [(k, k, "==") for k in key_list], "left_anti",
        )
        return Tafra._wrap(_setops.union_all(kept, other._plain()))

    def rollup(
        self,
        group_by: Sequence[str],
        aggregation: Mapping[str, Any] = {},
        iter_fn: Mapping[str, Any] = {},
    ) -> "Tafra":
        """GROUP BY ROLLUP with the reference's aggregation spec format."""
        cols, fallbacks, index_fns = _groupby.compile_agg_spec(
            self._plain(), aggregation, iter_fn
        )
        if fallbacks or index_fns:
            raise _groupby.AggSpecError(
                "rollup supports translatable aggregates only"
            )
        return Tafra._wrap(self._plain().rollup(*list(group_by)).agg(*cols))

    def cube(
        self,
        group_by: Sequence[str],
        aggregation: Mapping[str, Any] = {},
        iter_fn: Mapping[str, Any] = {},
    ) -> "Tafra":
        """GROUP BY CUBE with the reference's aggregation spec format."""
        cols, fallbacks, index_fns = _groupby.compile_agg_spec(
            self._plain(), aggregation, iter_fn
        )
        if fallbacks or index_fns:
            raise _groupby.AggSpecError("cube supports translatable aggregates only")
        return Tafra._wrap(self._plain().cube(*list(group_by)).agg(*cols))

    def pivot(
        self,
        group_by: Sequence[str],
        pivot_col: str,
        values: Sequence[Any],
        aggregation: Mapping[str, Any],
    ) -> "Tafra":
        """Pivot ``pivot_col`` into one output column per value. Explicit
        ``values`` keep the plan single-pass (no distinct-scan)."""
        cols, fallbacks, _idx = _groupby.compile_agg_spec(self._plain(), aggregation)
        if fallbacks:
            raise _groupby.AggSpecError("pivot supports translatable aggregates only")
        out = (
            self._plain()
            .groupBy(*list(group_by))
            .pivot(pivot_col, list(values))
            .agg(*cols)
        )
        return Tafra._wrap(out)

    def melt(
        self,
        id_vars: Sequence[str],
        value_vars: Sequence[str],
        var_name: str = "variable",
        value_name: str = "value",
    ) -> "Tafra":
        """Wide→long unpivot (the inverse of :meth:`pivot`; pandas
        ``melt`` naming). Each row becomes ``len(value_vars)`` rows of
        (id_vars..., variable, value). A pure narrow projection —
        Spark's ``unpivot`` is a generator expression over the row, no
        shuffle, so it maps a 100 TB table at scan cost. Value columns
        are coerced to their common promoted type by Spark; mixing
        incompatible types raises at analysis, matching the eager
        reference's array-concat failure mode."""
        out = self._plain().unpivot(
            [F.col(c) for c in id_vars],
            [F.col(c) for c in value_vars],
            var_name,
            value_name,
        )
        return Tafra._wrap(out)

    def sort(self, *cols: str, ascending: bool = True) -> "Tafra":
        return Tafra._wrap(
            self._plain().orderBy(*cols, ascending=ascending),
            rows=self._cached_rows,
        )

    def explain_plan(self) -> dict:
        """Structured physical-plan summary: the scale contract as a
        user-facing API instead of a raw ``explain()`` wall of text.
        Returns ``{"pushed_filters": [...], "read_schemas": [[cols]],
        "n_exchanges": int, "has_broadcast_join": bool,
        "has_cartesian": bool}`` — the five facts that decide whether a
        query survives a 100× scale-up (are filters on the scan, is the
        read pruned, how many shuffles, did the small side broadcast,
        did anything go quadratic). The same helpers back the
        plan-shape test suite (``tests/test_plans.py``), so what CI
        asserts and what a user inspects are one implementation.
        """
        from .plans.inspect import (
            count_exchanges,
            explain_str,
            has_broadcast_join,
            pushed_filters,
            read_schema_columns,
        )

        plan = explain_str(self.df, "simple")
        return {
            "pushed_filters": pushed_filters(self.df),
            "read_schemas": read_schema_columns(self.df),
            "n_exchanges": count_exchanges(self.df),
            "has_broadcast_join": has_broadcast_join(self.df),
            "has_cartesian": (
                "CartesianProduct" in plan
                or "BroadcastNestedLoopJoin" in plan
            ),
        }

    def hint(self, name: str, *params) -> "Tafra":
        """Join-strategy / partitioning hint passthrough (extension — no
        reference counterpart): ``t.hint("merge")``,
        ``t.hint("broadcast")``, ``t.hint("rebalance")``. The hint
        attaches to THIS side of a subsequent join, exactly like
        ``DataFrame.hint`` — the escape hatch when Catalyst's automatic
        strategy choice must be overridden (e.g. forcing SMJ on a
        broadcast-sized build side that will grow 1000× in production).
        """
        return Tafra._wrap(self._df.hint(name, *params), rows=self._cached_rows)

    def intersect(self, other: "Tafra") -> "Tafra":
        return Tafra._wrap(self._plain().intersect(other._plain()))

    def except_all(self, other: "Tafra") -> "Tafra":
        return Tafra._wrap(self._plain().exceptAll(other._plain()))

    # ------------------------------------------------------------------ #
    # functional surface (SURVEY.md §2.6)

    def pipe(self, fn: Callable[["Tafra"], Any], *args: Any, **kwargs: Any) -> Any:
        """``fn(tafra, *args)`` chaining (reference ``tafra/base.py:1330-1352``)."""
        return fn(self, *args, **kwargs)

    def row_map(self, fn: Callable, *args: Any) -> Iterator[Any]:
        """Lazily map ``fn`` over 1-row Tafras (reference
        ``tafra/base.py:1229-1250``). Driver-side; prefer
        :meth:`map_in_pandas` at scale."""
        for pdf_row in self.to_pandas().itertuples(index=False):
            one = Tafra({c: [v] for c, v in zip(self.columns, pdf_row)})
            yield fn(one, *args)

    def tuple_map(self, fn: Callable, *args: Any, name: Optional[str] = "Row") -> Iterator[Any]:
        """Map over namedtuples (reference ``tafra/base.py:1252-1279``)."""
        pdf = self.to_pandas()
        if name is None:
            for row in pdf.itertuples(index=False, name=None):
                yield fn(row, *args)
        else:
            for row in pdf.itertuples(index=False, name=name):
                yield fn(row, *args)

    def col_map(self, fn: Callable, *args: Any) -> Iterator[Any]:
        """Map ``fn(ndarray)`` over columns (reference ``tafra/base.py:1281-1303``)."""
        data = self.data
        for c in self.columns:
            yield fn(data[c], *args)

    def key_map(self, fn: Callable, *args: Any) -> Iterator[tuple[str, Any]]:
        """col_map yielding (name, result) pairs (reference
        ``tafra/base.py:1305-1328``)."""
        data = self.data
        for c in self.columns:
            yield c, fn(data[c], *args)

    def map_in_pandas(
        self, fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
        schema: Union[str, T.StructType],
    ) -> "Tafra":
        """Distributed batch map — the scale path for row/tuple maps."""
        return Tafra._wrap(self._plain().mapInPandas(fn, schema=schema))

    def iterrows(self) -> Iterator[dict[str, Any]]:
        for row in self._plain().toLocalIterator():
            yield row.asDict()

    def itertuples(self, name: Optional[str] = "Row") -> Iterator[tuple]:
        pdf = self.to_pandas()
        return pdf.itertuples(index=False, name=name)

    def itercols(self) -> Iterator[tuple[str, np.ndarray]]:
        data = self.data
        for c in self.columns:
            yield c, data[c]

    # ------------------------------------------------------------------ #
    # sinks (SURVEY.md §2.7)

    def _ordered_df(self) -> DataFrame:
        """Export view: source order restored when an ordinal exists."""
        if self._has_ord():
            return self._df.orderBy(ORD).drop(ORD)
        return self._plain()

    def to_pandas(self) -> pd.DataFrame:
        pdf = self._ordered_df().toPandas()
        return pdf

    def to_records(
        self, columns: Optional[Iterable[str]] = None, cast_null: bool = True
    ) -> Iterator[tuple]:
        """Iterator of row tuples for DB insertion (reference
        ``tafra/base.py:1772-1804``): date/datetime → ISO strings (the
        reference's ``RECORD_TYPE`` map, ``tafra/base.py:59-67``), and
        NaN→None when ``cast_null``."""
        import datetime as _dt

        pdf = self.to_pandas()
        if columns is not None:
            cols = [columns] if isinstance(columns, str) else list(columns)
            for c in cols:
                if c not in pdf.columns:
                    raise KeyError(f"column {c!r} not in table")
            pdf = pdf[cols]

        def _cast(v: Any) -> Any:
            if v is pd.NaT or v is None:
                return None
            if isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
                return v.isoformat()
            if cast_null and isinstance(v, float) and np.isnan(v):
                return None
            return v

        for row in pdf.itertuples(index=False, name=None):
            yield tuple(_cast(v) for v in row)

    def to_list(
        self, columns: Optional[Iterable[str]] = None, inner: bool = False
    ) -> list:
        """Columns as a list of arrays (or list of lists with ``inner``;
        reference ``tafra/base.py:1806-1876``)."""
        pdf = self.to_pandas()
        cols = list(columns) if columns is not None else list(self.columns)
        arrays = [pdf[c].to_numpy() for c in cols]
        if inner:
            return [a.tolist() for a in arrays]
        return arrays

    def to_tuple(
        self,
        columns: Optional[Iterable[str]] = None,
        inner: bool = False,
        name: Optional[str] = "Tafra",
    ) -> tuple:
        from collections import namedtuple

        cols = list(columns) if columns is not None else list(self.columns)
        arrays = self.to_list(cols, inner=inner)
        if name is None:
            return tuple(arrays)
        nt = namedtuple(name, cols, rename=True)
        return nt(*arrays)

    def to_array(self, columns: Optional[Iterable[str]] = None) -> np.ndarray:
        pdf = self.to_pandas()
        if columns is not None:
            pdf = pdf[list(columns)]
        return pdf.to_numpy(dtype=object)

    def to_csv(self, filename: Any, columns: Optional[Iterable[str]] = None) -> None:
        """Single-file CSV with header (parity path; reference
        ``tafra/base.py:1930-1967``). Use :meth:`write_csv` for the
        distributed sink."""
        pdf = self.to_pandas()
        if columns is not None:
            pdf = pdf[list(columns)]
        pdf.to_csv(filename, index=False)

    def write_csv(self, path: str, mode: str = "overwrite") -> None:
        self._plain().write.mode(mode).option("header", True).csv(path)

    def write_jsonl(self, path: str, mode: str = "overwrite") -> None:
        """Write newline-delimited JSON (one object per line, distributed
        multi-part output — the raw-corpus interchange format)."""
        self._plain().write.mode(mode).json(path)

    def write_parquet(
        self, path: str, mode: str = "overwrite",
        partition_by: Optional[Sequence[str]] = None,
    ) -> None:
        w = self._plain().write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def write_orc(
        self, path: str, mode: str = "overwrite",
        partition_by: Optional[Sequence[str]] = None,
    ) -> None:
        """Write ORC (columnar sink parity with parquet)."""
        w = self._plain().write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.orc(path)

    def write_parquet_clustered(
        self,
        path: str,
        cluster_by: Sequence[str],
        mode: str = "overwrite",
    ) -> None:
        """Write parquet laid out for data skipping on ``cluster_by``:
        ``repartitionByRange`` gives each output file a disjoint key
        range and ``sortWithinPartitions`` orders rows inside it, so
        every file's min/max footer statistics are TIGHT on those
        columns. A later filtered scan then prunes whole files/row
        groups instead of reading them — at 100 TB the difference
        between touching one range's files and scanning the corpus.
        (Range partitioning samples the key distribution, so skewed
        keys still split into balanced files.)"""
        cols = list(cluster_by)
        (
            self._plain()
            .repartitionByRange(*cols)
            .sortWithinPartitions(*cols)
            .write.mode(mode)
            .parquet(path)
        )

    def write_parquet_zorder(
        self,
        path: str,
        cluster_by: Sequence[str],
        bits: int = 12,
        n_files: Optional[int] = None,
        mode: str = "overwrite",
    ) -> None:
        """Multi-dimensional clustered write (Z-order): interleave the
        bits of the min/max-normalized ``cluster_by`` columns into one
        Z-value and range-write on it, so every output file covers a
        small HYPER-RECTANGLE of the key space — min/max footer
        statistics come out tight on ALL cluster columns at once, and a
        filtered scan on ANY of them skips most files/row groups.
        ``write_parquet_clustered`` (1-D range) gives a tight footer on
        its leading column only; Z-order is the layout for tables
        queried by several independent dimensions (the Delta/Iceberg
        OPTIMIZE ZORDER design, built from plain Spark primitives).

        Normalization bounds come from one tiny min/max aggregate; the
        Z-value is a pure integer expression (shift/mask interleave,
        one parsed SQL string), computed map-side and dropped before
        the write. ``repartitionByRange`` samples the Z distribution,
        so skew still yields balanced files.

        ``bits`` is clamped so the interleaved value fits in 63 bits
        (``bits * len(cluster_by) ≤ 63``): a shift past 63 would wrap
        (Spark's ``<<`` is mod-64) and a bit landing on position 63
        flips the Z-value negative — both silently destroy the
        hyper-rectangle property. Constant and all-null columns (a
        non-numeric column casts to null) contribute no bits; an empty
        table writes through unclustered.
        """
        cols = list(cluster_by)
        if not cols:
            raise ValueError("write_parquet_zorder: cluster_by is empty")
        df = self._plain()
        aggs = []
        for c in cols:
            aggs += [
                F.min(F.col(c).cast("double")).alias(f"__mn_{c}__"),
                F.max(F.col(c).cast("double")).alias(f"__mx_{c}__"),
            ]
        stats = df.agg(*aggs).collect()[0]
        n_cols = len(cols)
        bits = min(bits, 63 // n_cols)
        if bits < 1:
            raise ValueError(
                f"write_parquet_zorder: {n_cols} cluster columns leave no "
                "bit budget (need len(cluster_by) <= 63)"
            )
        levels = (1 << bits) - 1
        terms = []
        for ci, c in enumerate(cols):
            mn_raw = stats[f"__mn_{c}__"]
            mx_raw = stats[f"__mx_{c}__"]
            if mn_raw is None or mx_raw is None:
                continue  # empty table or all-null cast: no bits
            mn, mx = float(mn_raw), float(mx_raw)
            span = mx - mn
            if span <= 0:
                continue  # constant column contributes no bits
            norm = (
                f"CAST(floor((CAST(`{c}` AS DOUBLE) - {mn!r}) / {span!r}"
                f" * {levels}) AS BIGINT)"
            )
            for b in range(bits):
                terms.append(
                    f"(((({norm}) >> {b}) & 1) << {b * n_cols + ci})"
                )
        z = F.expr(" + ".join(terms)) if terms else F.lit(0)
        ranged = df.withColumn("__z__", z)
        if n_files is not None:
            ranged = ranged.repartitionByRange(n_files, "__z__")
        else:
            ranged = ranged.repartitionByRange("__z__")
        (
            ranged.sortWithinPartitions("__z__")
            .drop("__z__")
            .write.mode(mode)
            .parquet(path)
        )

    @classmethod
    def layout_stats(
        cls, path: str, spark: Optional[SparkSession] = None
    ) -> "Tafra":
        """Per-file layout health of a parquet directory: (file, n_rows,
        n_bytes) read from the footers — the diagnostic that drives
        compaction decisions (the small-file problem: a 100 TB table in
        1 MB files spends more time opening files than scanning).
        Footer reads are driver-side metadata ops on a LOCAL path (the
        test/bench contract); cluster object stores would swap in their
        own listing."""
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        from .functions._relation import literal_relation

        spark = spark or cls._spark()
        # recursive: partitioned datasets keep their files in key=value
        # subdirectories — a top-level-only glob would miss all of them
        files = sorted(
            _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not files:
            raise ValueError(f"layout_stats: no parquet files in {path!r}")
        rows = [
            (
                _os.path.relpath(f, path),
                int(_pq.ParquetFile(f).metadata.num_rows),
                int(_os.path.getsize(f)),
            )
            for f in files
        ]
        return Tafra._wrap(
            literal_relation(spark, rows, ["file", "n_rows", "n_bytes"])
        )

    @classmethod
    def schema_diff(
        cls,
        path_a: str,
        path_b: str,
        spark: Optional[SparkSession] = None,
    ) -> "Tafra":
        """Schema drift between two parquet datasets: one row per
        column that was added, removed, or changed type between
        ``path_a`` (old) and ``path_b`` (new) — the data-contract
        check a pipeline runs before pointing jobs at a new snapshot
        (a silently-widened int32→int64 or a dropped column breaks
        downstream readers long after the write succeeded).

        Schemas come from parquet FOOTERS (driver-side metadata, no
        scan — the :meth:`layout_stats` contract), unified across all
        files of each dataset so a mid-dataset schema change inside
        one snapshot also surfaces: a column missing from some files
        reports its type as the footer union and is still comparable.
        Returns (column, change, type_a, type_b) with change ∈
        {'added', 'removed', 'type_changed'}; an empty result means
        the contract holds.
        """
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq
        import pyarrow.types as _pt  # noqa: F401  (doc pointer)

        from .functions._relation import literal_relation

        spark = spark or cls._spark()

        def _schema(path: str) -> dict:
            files = sorted(
                _glob.glob(
                    _os.path.join(path, "**", "*.parquet"), recursive=True
                )
            ) or ([path] if path.endswith(".parquet") else [])
            if not files:
                raise ValueError(f"schema_diff: no parquet files in {path!r}")
            out: dict[str, str] = {}
            for f in files:
                sch = _pq.read_schema(f)
                for field in sch:
                    t = str(field.type)
                    prev = out.get(field.name)
                    if prev is None:
                        out[field.name] = t
                    elif prev != t:
                        # mid-dataset drift INSIDE one snapshot: keep
                        # both, pipe-joined, deterministic order
                        parts = sorted(set(prev.split("|")) | {t})
                        out[field.name] = "|".join(parts)
            return out

        sa, sb = _schema(path_a), _schema(path_b)
        rows = []
        for c in sorted(set(sa) | set(sb)):
            ta, tb = sa.get(c), sb.get(c)
            if ta is None:
                rows.append([c, "added", None, tb])
            elif tb is None:
                rows.append([c, "removed", ta, None])
            elif ta != tb:
                rows.append([c, "type_changed", ta, tb])
        if not rows:
            rows = [["__no_drift__", "none", None, None]]
            df = literal_relation(
                spark, rows, ["column", "change", "type_a", "type_b"]
            ).filter("change <> 'none'")
            return Tafra._wrap(df)
        return Tafra._wrap(
            literal_relation(
                spark, rows, ["column", "change", "type_a", "type_b"]
            )
        )

    @classmethod
    def compact_parquet(
        cls,
        src: str,
        dst: str,
        target_files: Optional[int] = None,
        target_mb: int = 128,
        mode: str = "overwrite",
        spark: Optional[SparkSession] = None,
    ) -> int:
        """Small-file compaction: rewrite ``src`` into ``dst`` as
        ``target_files`` balanced files (default: total bytes /
        ``target_mb``, sized from the source footers). Round-robin
        ``repartition`` — one shuffle, balanced output regardless of
        input skew; for sort-order-preserving compaction use
        :meth:`write_parquet_clustered` / :meth:`write_parquet_zorder`
        instead. Returns the file count written."""
        import glob as _glob
        import os as _os

        spark = spark or cls._spark()
        df = spark.read.parquet(src)
        if target_files is None:
            # recursive glob: spark.read.parquet reads partitioned
            # subdirectories, so the sizing walk must see them too — a
            # top-level-only glob would compute total=0 and silently
            # squash a partitioned dataset into one file
            sizes = [
                _os.path.getsize(f)
                for f in _glob.glob(
                    _os.path.join(src, "**", "*.parquet"), recursive=True
                )
            ]
            total = sum(sizes)
            if total == 0:
                raise ValueError(
                    f"compact_parquet: no parquet files found under {src!r} "
                    "for auto-sizing; pass target_files explicitly"
                )
            target_files = max(1, -(-total // (target_mb * 1024 * 1024)))
        df.repartition(int(target_files)).write.mode(mode).parquet(dst)
        return int(target_files)

    def write_bucketed(
        self,
        table: str,
        n_buckets: int,
        by: Union[str, Sequence[str]],
        sort_by: Optional[Union[str, Sequence[str]]] = None,
        mode: str = "overwrite",
    ) -> None:
        """Persist as a bucketed (+ optionally sorted) table: repeated
        joins/aggregations on the bucket key then run with ZERO shuffle
        (SortMergeJoin reads co-located buckets directly) — the
        pre-partitioning strategy for fact-to-fact joins at 100 TB that
        are too big to broadcast."""
        cols = [by] if isinstance(by, str) else list(by)
        w = self._plain().write.mode(mode).bucketBy(n_buckets, *cols)
        if sort_by is not None:
            s = [sort_by] if isinstance(sort_by, str) else list(sort_by)
            w = w.sortBy(*s)
        w.format("parquet").saveAsTable(table)

    @classmethod
    def read_table(cls, name: str, spark: Optional[SparkSession] = None) -> "Tafra":
        """Read a saved (possibly bucketed) table from the catalog."""
        spark = spark or cls._spark()
        return cls(df=spark.table(name))

    def create_view(self, name: str) -> "Tafra":
        """Register this table as a temp view for :meth:`sql`."""
        self._plain().createOrReplaceTempView(name)
        return self

    @classmethod
    def sql(cls, query: str, spark: Optional[SparkSession] = None) -> "Tafra":
        """Full Spark SQL over registered views — the declarative entry
        point the reference delegates to an external DB (``read_sql``);
        here the engine itself is the SQL engine."""
        spark = spark or cls._spark()
        return cls(df=spark.sql(query))

    def to_html(self, n: int = 20) -> str:
        """HTML table with the dtype header row (reference
        ``tafra/base.py:497-706``)."""
        pdf = self.head(n).to_pandas()
        dtypes = self.dtypes
        header = "".join(f"<th>{c}<br/><em>{dtypes[c]}</em></th>" for c in pdf.columns)
        rows = "".join(
            "<tr>" + "".join(f"<td>{v}</td>" for v in row) + "</tr>"
            for row in pdf.itertuples(index=False, name=None)
        )
        return f"<table><thead><tr>{header}</tr></thead><tbody>{rows}</tbody></table>"

    def _repr_html_(self) -> str:
        return self.to_html()

    def _repr_pretty_(self, p: Any, cycle: bool) -> None:
        """IPython pretty-printer hook (reference registers one alongside
        ``_repr_html_``, ``tafra/base.py:497-706``)."""
        if cycle:
            p.text("Tafra(...)")
        else:
            p.text(self.pformat())

    def pformat(self, n: int = 20) -> str:
        pdf = self.head(n).to_pandas()
        dtypes = self.dtypes
        headed = pd.DataFrame(
            [[dtypes[c] for c in pdf.columns]], columns=list(pdf.columns)
        )
        return pd.concat([headed, pdf.astype(object)], ignore_index=True).to_string(
            index=False
        )

    def pprint(self, n: int = 20) -> None:
        print(self.pformat(n))

    # plan introspection (extension; no reference analogue)
    def explain(self, mode: str = "formatted") -> None:
        self._plain().explain(mode=mode)

    def plan_summary(self) -> dict[str, Any]:
        """Scale-contract diagnostics: shuffle exchange count, broadcast
        usage, filters pushed to the scans, and per-scan read schemas —
        the numbers the plan tests assert, exposed for interactive use."""
        from .plans.inspect import (
            count_exchanges,
            has_broadcast_join,
            pushed_filters,
            read_schema_columns,
        )

        df = self._plain()
        return {
            "shuffle_exchanges": count_exchanges(df),
            "broadcast_join": has_broadcast_join(df),
            "pushed_filters": pushed_filters(df),
            "scan_columns": read_schema_columns(df),
        }

    def profile(self) -> "Tafra":
        """Per-column data profile: one row per column with the total
        row count, null count, EXACT distinct count, and canonical
        min/max representations.

        Representations are engine-portable strings so the whole profile
        hashes identically cross-engine: numerics are fixed-point
        ``floor(x*1e6+0.5)`` longs rendered as strings (monotonic, so
        min/max commute with the encoding), temporals are ISO casts,
        everything else is a raw string cast.

        Scale: ONE distributed aggregate (Spark expands the
        multi-distinct into a constant number of passes — constant in
        the column count, linear in rows), then an explode of a
        column-count-sized array on the single result row. No collect,
        no per-column jobs. Extension (no reference analogue — the
        closest is pandas ``describe``).
        """
        df = self._plain()
        numeric = {"integer", "long", "double", "float", "short", "byte"}

        def rep(expr: Column, type_name: str) -> Column:
            if type_name in numeric or type_name.startswith("decimal"):
                return (
                    F.floor(expr.cast("double") * F.lit(1_000_000.0) + F.lit(0.5))
                    .cast("long")
                    .cast("string")
                )
            return expr.cast("string")

        aggs: list[Column] = [F.count(F.lit(1)).alias("__nr__")]
        structs: list[Column] = []
        for i, fld in enumerate(df.schema.fields):
            c, t = F.col(fld.name), fld.dataType.typeName()
            aggs += [
                # coalesce: sum over zero rows is NULL; an empty table
                # must profile as honest zeros
                F.coalesce(F.sum(c.isNull().cast("long")), F.lit(0)).alias(
                    f"__nn{i}__"
                ),
                F.count_distinct(c).alias(f"__nd{i}__"),
                rep(F.min(c), t).alias(f"__mn{i}__"),
                rep(F.max(c), t).alias(f"__mx{i}__"),
            ]
            structs.append(
                F.struct(
                    F.lit(fld.name).alias("col_name"),
                    F.col("__nr__").alias("n_rows"),
                    F.col(f"__nn{i}__").alias("n_nulls"),
                    F.col(f"__nd{i}__").alias("n_distinct"),
                    F.col(f"__mn{i}__").alias("min_repr"),
                    F.col(f"__mx{i}__").alias("max_repr"),
                )
            )
        out = (
            df.agg(*aggs)
            .select(F.explode(F.array(*structs)).alias("p"))
            .select("p.*")
        )
        return Tafra._wrap(out, rows=len(df.schema.fields))

    def cache(self) -> "Tafra":
        self._df = self._df.cache()
        return self

    def repartition(self, n: int, *cols: str) -> "Tafra":
        if cols:
            return Tafra._wrap(
                self._df.repartition(n, *cols), rows=self._cached_rows
            )
        return Tafra._wrap(self._df.repartition(n), rows=self._cached_rows)
