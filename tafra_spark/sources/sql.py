"""SQL sources: DB-API cursor (parity) and JDBC (scale path).

Reference (SURVEY.md §2.1; ``tafra/base.py:978-1040``): ``read_sql``
executes a SELECT on a DB-API cursor and fetches all rows — the one
process boundary in the reference; the SQL is optimized by the external
database. ``read_sql_chunks`` yields one table per ``chunksize`` rows —
an artifact of single-node memory limits.

Spark re-expression: the cursor path is kept for drop-in parity (rows
flow through the driver — small result sets only). The scale path is
JDBC (``url=...``): executors read partition ranges directly from the
database (``partitionColumn``/``lowerBound``/``upperBound``/
``numPartitions``), so a 100 TB extract never bottlenecks on the driver.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Optional

from pyspark.sql import SparkSession


def _columns_from_description(cur: Any) -> list[str]:
    if cur.description is None:
        raise ValueError("cursor has no result description; was a SELECT executed?")
    return [d[0] for d in cur.description]


def read_sql(
    cls,
    query: str,
    cur: Any = None,
    *,
    url: Optional[str] = None,
    spark: Optional[SparkSession] = None,
    **jdbc_options: str,
):
    if url is not None:
        spark = spark or cls._spark()
        reader = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("query", query)
        )
        for k, v in jdbc_options.items():
            reader = reader.option(k, v)
        return cls(df=reader.load())
    if cur is None:
        raise ValueError("read_sql requires either a DB-API cursor or url=...")
    cur.execute(query)
    columns = _columns_from_description(cur)
    rows = cur.fetchall()
    return cls.from_records(rows, columns, spark=spark)


def read_sql_chunks(
    cls,
    query: str,
    cur: Any,
    chunksize: int = 100,
    spark: Optional[SparkSession] = None,
) -> Iterator:
    cur.execute(query)
    columns = _columns_from_description(cur)
    while True:
        rows = cur.fetchmany(chunksize)
        if not rows:
            break
        yield cls.from_records(rows, columns, spark=spark)
