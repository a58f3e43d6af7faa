"""DuckDB proxy benchmark: run the ORACLE SQL of every bench.py headline
query on DuckDB over the same parquet, and print the Spark-vs-DuckDB
wall-clock ratio.

BASELINE.md publishes only 6-row ``%timeit`` microlatencies ("not
meaningful targets" per its own text), so a same-work single-node DuckDB
run is the honest quantitative anchor: both engines execute the same
fixed-point/md5 arithmetic over the same files. Usage:

    python scripts/proxy_bench.py [sf_dir] [spark_bench_json]

If a ``BENCH_r*.json``/bench.py JSON line is provided (file path), the
per-query and total ratios are printed alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from bench import HEADLINE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark_times: dict[str, float] = {}
    if len(sys.argv) > 2:
        with open(sys.argv[2]) as fh:
            blob = json.load(fh)
        spark_times = blob.get("queries") or blob.get("parsed", {}).get(
            "queries", {}
        )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = entry.oracle_sql()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        sql = oracles[name]
        t0 = time.time()
        # .df() = columnar materialization, the mirror of bench.py's
        # Arrow toPandas(); row-tuple fetchall() taxed DuckDB ~2x on
        # wide results while Spark paid the same tax ~4x — columnar on
        # both sides is the symmetric action
        n = len(con.sql(sql).df())
        timings[name] = round(time.time() - t0, 3)
        ratio = (
            f"  spark/duck={spark_times[name] / max(timings[name], 1e-3):.1f}x"
            if name in spark_times
            else ""
        )
        print(f"# {name}: {timings[name]}s ({n} rows){ratio}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {"metric": "duckdb_proxy_total_wall", "value": total, "unit": "sec",
           "queries": timings}
    if spark_times:
        spark_total = sum(v for k, v in spark_times.items() if k in timings)
        out["spark_total"] = round(spark_total, 3)
        out["ratio"] = round(spark_total / total, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
