"""Capture ``explain("formatted")`` output for named headline queries.

Usage: python scripts/capture_plans.py <out_dir> <query...>
Writes <out_dir>/<query>.txt for each query. Used by the optimization
rounds to pin before/after plan shapes (plans/r12/...).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from tafra_spark import get_spark


def explain_formatted(df) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def main() -> int:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    queries = entry.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        text = explain_formatted(df)
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
