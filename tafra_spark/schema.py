"""Dtype-name normalization layer: tafra dtype names ⇄ Spark SQL types.

The reference stores ``_dtypes: Dict[str, str]`` of normalized numpy
scalar-type names (see SURVEY.md §1.2; reference ``tafra/base.py:840-861``).
We expose the same *names* to users while the engine stores Spark types.

Mapping (SURVEY.md §1.4):
    int8/16/32/64 → Byte/Short/Integer/LongType
    float32/64    → Float/DoubleType
    bool          → BooleanType
    str / object  → StringType
    datetime64    → TimestampType;  date → DateType
    Decimal       → DecimalType (or cast to float64 by the default
                    object-formatter, reference ``tafra/base.py:45-46``)
"""

from __future__ import annotations

from typing import Union

import numpy as np
from pyspark.sql import types as T

__all__ = [
    "to_spark_type",
    "to_tafra_dtype",
    "normalize_dtype_name",
    "spark_schema_to_dtypes",
    "numpy_dtype_for",
]

_TAFRA_TO_SPARK: dict[str, T.DataType] = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "int": T.LongType(),
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.LongType(),
    "float16": T.FloatType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "bool": T.BooleanType(),
    "bool_": T.BooleanType(),
    "str": T.StringType(),
    "str_": T.StringType(),
    "string": T.StringType(),
    "unicode": T.StringType(),
    "object": T.StringType(),
    "datetime64": T.TimestampType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "decimal": T.DecimalType(38, 18),
    "binary": T.BinaryType(),
    "bytes": T.BinaryType(),
}

_SPARK_TO_TAFRA: dict[type, str] = {
    T.ByteType: "int8",
    T.ShortType: "int16",
    T.IntegerType: "int32",
    T.LongType: "int64",
    T.FloatType: "float32",
    T.DoubleType: "float64",
    T.BooleanType: "bool",
    T.StringType: "str",
    T.TimestampType: "datetime64",
    T.TimestampNTZType: "datetime64",
    T.DateType: "date",
    T.BinaryType: "bytes",
    T.NullType: "object",
}

# numpy dtype to use when exporting a column back to arrays/pandas
_TAFRA_TO_NUMPY: dict[str, str] = {
    "int8": "int8",
    "int16": "int16",
    "int32": "int32",
    "int64": "int64",
    "float32": "float32",
    "float64": "float64",
    "bool": "bool",
    "str": "object",
    "object": "object",
    "datetime64": "datetime64[ns]",
    "date": "object",
    "bytes": "object",
}


def normalize_dtype_name(dtype: Union[str, type, np.dtype, T.DataType]) -> str:
    """Normalize a user-supplied dtype spec to the tafra-style name.

    Mirrors the reference's ``_format_dtype`` semantics
    (``tafra/base.py:840-861``): numpy scalar-type name with ``str_`` →
    ``'str'`` and trailing underscores stripped.
    """
    if isinstance(dtype, T.DataType):
        return to_tafra_dtype(dtype)
    if isinstance(dtype, str) and dtype in _TAFRA_TO_SPARK:
        return "str" if dtype in ("string", "unicode", "str_") else dtype.rstrip("_")
    try:
        name = np.dtype(dtype).type.__name__
    except TypeError:
        name = getattr(dtype, "__name__", str(dtype))
    if name in ("str_", "unicode_", "string_"):
        name = "str"
    name = name.rstrip("_")
    if name.startswith("datetime64"):
        name = "datetime64"
    return name


def to_spark_type(dtype: Union[str, type, np.dtype, T.DataType]) -> T.DataType:
    """tafra/numpy dtype spec → Spark DataType."""
    if isinstance(dtype, T.DataType):
        return dtype
    name = normalize_dtype_name(dtype)
    if name in _TAFRA_TO_SPARK:
        return _TAFRA_TO_SPARK[name]
    raise ValueError(f"Unsupported dtype: {dtype!r} (normalized: {name!r})")


def to_tafra_dtype(spark_type: T.DataType) -> str:
    """Spark DataType → tafra-style dtype name."""
    cls = type(spark_type)
    if cls in _SPARK_TO_TAFRA:
        return _SPARK_TO_TAFRA[cls]
    if isinstance(spark_type, T.DecimalType):
        return "decimal"
    # nested types (array/map/struct) have no tafra analogue; report 'object'
    return "object"


def spark_schema_to_dtypes(schema: T.StructType) -> dict[str, str]:
    return {f.name: to_tafra_dtype(f.dataType) for f in schema.fields}


def numpy_dtype_for(tafra_dtype: str) -> str:
    return _TAFRA_TO_NUMPY.get(tafra_dtype, "object")
