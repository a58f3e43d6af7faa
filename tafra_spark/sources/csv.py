"""CSV source with tafra-parity type inference, executed scalably.

Reference semantics (SURVEY.md §2.1/F6; ``tafra/csvreader.py``):

- header row; duplicate headers renamed ``b`` → ``b (2)``, ``b (3)`` …
  (``csvreader.py:201-210``);
- type inference over the first ``guess_rows`` rows with precedence
  ``int32 → int64 → float64 → bool → object`` (``csvreader.py:41-51``);
- booleans accept true/false/yes/no/t/f case-insensitively
  (``csvreader.py:32-38``);
- mid-file type promotion when a later value fails the guessed parser
  (``csvreader.py:177-184``);
- ``missing`` marker decoded to null (``csvreader.py:193-199``);
- ragged rows raise ``ValueError``;
- explicit ``dtypes`` overrides skip inference for those columns.

Spark re-expression — two-pass, no driver materialization of data:

1. a tiny driver-side head sample (``guess_rows`` lines) establishes the
   header (with dedup-renaming) only;
2. the full file is scanned as all-strings; ONE aggregation pass computes,
   per column, the counts needed to decide the final dtype under the same
   precedence. Because the precedence is a total order and promotion only
   moves down the chain, guess-then-promote converges to exactly this
   whole-file inference — same answer, but embarrassingly parallel.
3. a final projection casts each column — the cast is pushed to the scan.

Ragged-row detection uses Spark's PERMISSIVE corrupt-record channel, which
marks rows whose token count mismatches the schema.
"""

from __future__ import annotations

import csv as _csv
import io
import os
from collections.abc import Mapping
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import normalize_dtype_name, to_spark_type

_BOOL_FORMS = ["true", "false", "yes", "no", "t", "f"]
_TRUE_FORMS = ["true", "yes", "t"]
_INT_RE = r"^[+-]?[0-9]+$"
_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1
_CORRUPT = "__corrupt__"


def _dedup_headers(names: list[str]) -> list[str]:
    """``b`` → ``b (2)`` → ``b (3)`` duplicate renaming
    (reference ``csvreader.py:201-210``)."""
    seen: dict[str, int] = {}
    out: list[str] = []
    for name in names:
        if name in seen:
            seen[name] += 1
            out.append(f"{name} ({seen[name]})")
        else:
            seen[name] = 1
            out.append(name)
    return out


def _resolve_header_file(path: str) -> str:
    """For directory / glob inputs (multi-file CSV datasets — the normal
    shape at scale), pick one real part file to read the header from; all
    parts share the header and Spark's header=true skips one line per
    file."""
    import glob as _glob

    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.startswith(("_", ".")):
                continue
            full = os.path.join(path, name)
            if os.path.isfile(full):
                return full
        raise FileNotFoundError(f"no data files in CSV directory {path!r}")
    # a literal file wins over glob interpretation ('results[2024].csv')
    if os.path.isfile(path):
        return path
    if any(ch in path for ch in "*?["):
        matches = sorted(
            p
            for p in _glob.glob(path)
            if os.path.isfile(p)
            and not os.path.basename(p).startswith(("_", "."))
        )
        if not matches:
            raise FileNotFoundError(f"no files match CSV glob {path!r}")
        return matches[0]
    return path


def _read_header(csv_file: Any, **csvkw: Any) -> list[str]:
    dialect_kw = {
        k: v
        for k, v in csvkw.items()
        if k in ("delimiter", "quotechar", "escapechar", "doublequote", "skipinitialspace")
    }
    if hasattr(csv_file, "read"):
        pos = csv_file.tell()
        reader = _csv.reader(csv_file, **dialect_kw)
        header = next(reader)
        csv_file.seek(pos)
        return header
    with open(csv_file, newline="") as fh:
        reader = _csv.reader(fh, **dialect_kw)
        return next(reader)


def read_csv(
    cls,
    csv_file: Any,
    guess_rows: int = 5,
    missing: Optional[str] = "",
    dtypes: Optional[Mapping[str, Any]] = None,
    spark: Optional[SparkSession] = None,
    **csvkw: Any,
):
    spark = spark or cls._spark()
    dtypes = dict(dtypes or {})

    # the reference forwards **csvkw verbatim to csv.reader
    # (tafra/csvreader.py), which rejects unknown keywords — mirror that
    # contract instead of silently ignoring typos
    _CSV_READER_KW = {
        "dialect", "delimiter", "quotechar", "escapechar", "doublequote",
        "skipinitialspace", "lineterminator", "quoting", "strict",
    }
    unknown = set(csvkw) - _CSV_READER_KW
    if unknown:
        raise TypeError(
            f"{sorted(unknown)[0]!r} is an invalid keyword argument for "
            "read_csv (csv.reader dialect keys only)"
        )

    if hasattr(csv_file, "read"):
        # file-like: small/local by definition — buffer to a temp file so
        # Spark can scan it
        import tempfile

        content = csv_file.read()
        tmp = tempfile.NamedTemporaryFile(
            "w", suffix=".csv", delete=False, newline=""
        )
        tmp.write(content)
        tmp.close()
        path = tmp.name
        header = _read_header(io.StringIO(content), **csvkw)
    else:
        path = os.fspath(csv_file)
        header = _read_header(_resolve_header_file(path), **csvkw)

    names = _dedup_headers([str(h) for h in header])

    schema = T.StructType(
        [T.StructField(n, T.StringType(), True) for n in names]
        + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    reader = (
        spark.read.schema(schema)
        # header=true with an explicit schema (enforceSchema default) makes
        # Spark skip exactly ONE header line per file — a data row that
        # happens to repeat the header values is NOT dropped (unlike
        # value-matching the header strings)
        .option("header", "true")
        .option("enforceSchema", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("delimiter", csvkw.get("delimiter", ","))
        .option("quote", csvkw.get("quotechar", '"'))
        # preserve '' as a real value: Spark's default nullValue is "";
        # the reference decodes missing markers itself, so we must too
        .option("nullValue", "__tafra_never__")
        .option("emptyValue", "")
    )
    if "escapechar" in csvkw:
        reader = reader.option("escape", csvkw["escapechar"])
    # lineterminator is ACCEPTED but ignored, exactly like csv.reader
    # ("hard-coded to recognise \r or \n" per the stdlib docs) — mapping
    # it to Spark's lineSep would silently drop every row of a normal
    # \n-terminated file when callers pass the csv-module default \r\n.
    if csvkw.get("skipinitialspace"):
        # csv.reader only skips whitespace AFTER a delimiter; Spark trims
        # every field including the first of each line. Documented edge
        # divergence: a leading space on the first column is trimmed here.
        reader = reader.option("ignoreLeadingWhiteSpace", "true")
    raw = reader.csv(path)

    # ragged rows → ValueError (reference EARLY_EOF/parse error behavior).
    # A data column must appear in the projection — Spark disallows
    # queries referencing only the corrupt-record column.
    bad = (
        raw.filter(F.col(_CORRUPT).isNotNull())
        .select(*[F.col(n) for n in names], F.col(_CORRUPT))
        .first()
    )
    if bad is not None:
        # the corrupt raw record is the LAST projected column
        raise ValueError(f"malformed CSV row (wrong field count): {bad[-1]!r}")
    raw = raw.drop(_CORRUPT)

    # Spark reads unquoted empty fields as NULL unconditionally; the
    # reference sees them as ''. Restore '' unless '' IS the missing
    # marker, then decode the marker to NULL — exact reference semantics
    # (``csvreader.py:193-199``).
    if missing != "":
        for n in names:
            raw = raw.withColumn(
                n, F.when(F.col(n).isNull(), F.lit("")).otherwise(F.col(n))
            )
    if missing is not None and missing != "":
        for n in names:
            raw = raw.withColumn(
                n, F.when(F.col(n) == F.lit(missing), None).otherwise(F.col(n))
            )

    # explicit dtype overrides skip inference
    override = {n: dtypes[n] for n in names if n in dtypes}
    candidates = [n for n in names if n not in override]

    inferred: dict[str, str] = {}
    if candidates:
        aggs = []
        for n in candidates:
            c = F.col(n)
            nn = c.isNotNull()
            aggs += [
                F.count(F.when(nn, 1)).alias(f"{n} n"),
                F.count(F.when(nn & ~c.rlike(_INT_RE), 1)).alias(f"{n} ni"),
                F.min(F.when(c.rlike(_INT_RE), c.try_cast("long"))).alias(f"{n} lo"),
                F.max(F.when(c.rlike(_INT_RE), c.try_cast("long"))).alias(f"{n} hi"),
                F.count(F.when(nn & c.try_cast("double").isNull(), 1)).alias(
                    f"{n} nf"
                ),
                F.count(F.when(nn & ~F.lower(c).isin(_BOOL_FORMS), 1)).alias(
                    f"{n} nb"
                ),
            ]
        stats = raw.agg(*aggs).first().asDict()
        for n in candidates:
            total = stats[f"{n} n"]
            if total == 0:
                inferred[n] = "object"
                continue
            if stats[f"{n} ni"] == 0:
                lo, hi = stats[f"{n} lo"], stats[f"{n} hi"]
                if lo is not None and lo >= _INT32_MIN and hi <= _INT32_MAX:
                    inferred[n] = "int32"
                else:
                    inferred[n] = "int64"
            elif stats[f"{n} nf"] == 0:
                inferred[n] = "float64"
            elif stats[f"{n} nb"] == 0:
                inferred[n] = "bool"
            else:
                inferred[n] = "object"

    out_cols = []
    final_dtypes: dict[str, str] = {}
    for n in names:
        c = F.col(n)
        if n in override:
            target = to_spark_type(override[n])
            c = F.when(F.trim(c) == "", None).otherwise(c)
            out_cols.append(c.try_cast(target).alias(n))
            final_dtypes[n] = normalize_dtype_name(override[n])
        else:
            dtype = inferred[n]
            final_dtypes[n] = dtype
            if dtype in ("int32", "int64", "float64"):
                out_cols.append(c.try_cast(to_spark_type(dtype)).alias(n))
            elif dtype == "bool":
                out_cols.append(
                    F.when(c.isNull(), None)
                    .otherwise(F.lower(c).isin(_TRUE_FORMS))
                    .alias(n)
                )
            else:
                out_cols.append(c.alias(n))
    return cls(df=raw.select(*out_cols))
