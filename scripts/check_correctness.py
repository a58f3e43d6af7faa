"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
same scale factor, compare row count + column names + order-insensitive
value hash. Usage: python scripts/check_correctness.py [sf_dir] [name...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entry
from tafra_spark import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by value — NO float canonicalization.

    The round-1 replica rounded floats to 6 sig figs, which was WEAKER
    than the driver's hash and masked the q3/transform_window rounding
    flips. Full-precision comparison: if this passes, any driver float
    formatting passes (the query discipline guarantees bit-identical
    doubles on both sides).
    """
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: None if v is None else str(v))
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


_PORTABLE_TYPES = {
    "BIGINT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN",
    "INTEGER", "FLOAT",
}


def _portable_type(t: str) -> bool:
    """True when a DuckDB result type hashes identically to its Spark
    counterpart under the driver's canonicalization. LIST types are
    portable when their element is (array columns round-trip through
    pandas as python lists on both engines)."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return _portable_type(t[:-2])
    return t in _PORTABLE_TYPES


def value_hash(pdf: pd.DataFrame) -> str:
    body = pdf.to_csv(index=False, float_format="%.17g").encode()
    return hashlib.md5(body).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="correctness", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            # The driver's hash distinguishes integer widths that pandas
            # stringifies identically (r2 red rows were DuckDB HUGEINT
            # sums vs Spark BIGINT). Reject any oracle column outside the
            # portable type set so width drift fails HERE, not at the
            # driver.
            bad = [
                f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                if not _portable_type(str(t))
            ]
            if bad:
                print(f"FAIL {name}: non-portable oracle types {bad} "
                      "(CAST sums to BIGINT / doubles explicitly)")
                n_fail += 1
                continue
            duck_pdf = rel.df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_pdf), canon(duck_pdf)
        problems = []
        if len(a) != len(b):
            problems.append(f"rows {len(a)} != {len(b)}")
        if list(a.columns) != list(b.columns):
            problems.append(f"cols {list(a.columns)} != {list(b.columns)}")
        if not problems and value_hash(a) != value_hash(b):
            problems.append("value hash mismatch")
            diff = a.compare(b) if a.shape == b.shape else None
            if diff is not None and len(diff):
                problems.append(f"first diffs:\n{diff.head(5)}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
