"""Scale-adaptive input spreading for CPU-bound per-row stages.

A small parquet table (or any single-row-group file) arrives as 1-2
scan partitions, which serializes every expensive projection stacked
above the scan — regex chains, shingle/hash folds, tokenization — on
one core of the whole cluster. :func:`spread_input` repartitions the
*narrow* input to the session's default parallelism so those stages
fan out; on a real multi-file 100 TB table the scan already yields
thousands of splits and the helper is a no-op (the adaptivity the
optimization guide §2.5 "input skew" / §6 asks for — never a constant
tuned to one box).

This is the shared home of the pattern ``functions/dedup.py`` has
carried since r5 (``dedup._spread`` now delegates here); r12 wires it
into the heavy text/tokenizer query entries whose zero-shuffle plans
otherwise run their whole regex chain inside a 1-task scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_input"]


def spread_input(df: DataFrame, target: int | None = None) -> DataFrame:
    """Ensure CPU-bound per-row stages get full parallelism.

    Repartitions ``df`` round-robin to ``target`` partitions (default:
    ``sparkContext.defaultParallelism``) ONLY when the underlying scan
    cannot already feed that many tasks:

    - a file source with >= ``target`` input files is returned as-is
      (each file is at least one split, so the scan parallelizes);
    - a non-file source (or in-memory plan) with >= ``target`` RDD
      partitions is returned as-is — the partition count is
      authoritative and inserting a shuffle would be pure cost.

    Call it on the *narrow* projection (ids + the text/payload column
    the downstream stage actually needs) so the exchange never carries
    unused columns (guide §2.3 "project before the exchange").
    """
    sc = df.sparkSession.sparkContext
    if target is None:
        target = sc.defaultParallelism
    try:
        # composition guard: a plan that already carries an explicit
        # Repartition (an entry-level spread, a library barrier) is
        # already fanned out — a second round-robin exchange on top
        # would be pure shuffle cost. ``inputFiles()`` alone cannot see
        # this (it reports the underlying scan's files through any
        # number of exchanges). The match is LINE-ANCHORED on the
        # analyzed plan's operator lines (r13, advice): a raw substring
        # test also fired on a string LITERAL containing the word
        # (silently disabling the fan-out for a 1-split scan — a
        # perf-only false negative that is hard to diagnose). Operator
        # names start a line after the tree-drawing prefix; literals
        # only ever appear inside an operator's argument list.
        import re as _re

        plan = df._jdf.queryExecution().analyzed().toString()
        if _re.search(r"(?m)^[\s:+-]*'?Repartition", plan):
            return df
    except Exception:  # noqa: BLE001 - plan introspection is best-effort
        pass
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 - non-file plans raise
        n_files = 0
    if n_files >= target:
        return df
    if n_files == 0:
        # non-file source: the partition count is authoritative — don't
        # insert a shuffle for inputs that are already parallel
        if df.rdd.getNumPartitions() >= target:
            return df
    return df.repartition(target)
