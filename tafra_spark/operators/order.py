"""Global-order utilities that avoid the single-partition window trap.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is the most
common accidental serialization in Spark: the plan inserts an
``Exchange SinglePartition`` and one task sorts (and ranks) the entire
table. These helpers compute the SAME total-order ranks with
cluster-wide parallelism: range-repartition on the order key (each
partition owns a contiguous key range), rank WITHIN partitions, then
add per-partition offsets (one bounded collect of #partitions counts).
The rank depends only on the total order — ties broken by the caller's
trailing key columns — so the result is partitioning-independent and
engine-deterministic whenever the order is total.

The reference (petbox-dev/tafra) has no ordering surface at all; this
module exists because distributed users need total-order ranks for
sorted-neighborhood dedup, quantile assignment, and stable sharding,
and the naive spelling silently stops scaling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_number", "sorted_neighborhood_pairs"]


def _local_ranked(
    df: DataFrame, order_by: list[str], num_partitions: int | None
) -> DataFrame:
    """The pre-checkpoint plan of :func:`global_row_number`: range
    exchange on the order key + per-(range-)partition rank. Factored
    out so the plan tests can assert its shape (the eager checkpoint
    in the caller hides the executed plan from later explains)."""
    sc = df.sparkSession.sparkContext
    n_parts = int(num_partitions or sc.defaultParallelism)
    ranged = df.repartitionByRange(n_parts, *[F.col(c) for c in order_by])
    w = Window.partitionBy(F.spark_partition_id()).orderBy(
        *[F.col(c) for c in order_by]
    )
    return ranged.select(
        "*",
        F.spark_partition_id().alias("__pid__"),
        F.row_number().over(w).alias("__lrn__"),
    )


def global_row_number(
    df: DataFrame,
    order_by: list[str],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based ``row_number`` over the TOTAL order ``order_by``
    without a single-partition exchange.

    Requirements: ``order_by`` must be a total order (append a unique
    id as the last column; equal full keys would get an arbitrary but
    valid tie order, breaking determinism). Plan shape: one range
    exchange + per-partition sort/rank + one #partitions-row collect
    for the offsets — every stage is cluster-parallel, and the plan
    contains NO ``Exchange SinglePartition`` (plan-asserted in
    tests/test_plans.py).
    """
    for c in order_by:
        if c not in df.columns:
            raise KeyError(f"global_row_number: unknown column {c!r}")
    # localCheckpoint, not persist: (a) the offsets below are collected
    # from THIS materialization, and a cache-evicted recompute would
    # re-sample repartitionByRange's boundaries — ranks and offsets
    # could then disagree; the checkpoint pins the data; (b) the
    # ContextCleaner reclaims it once unreferenced, so repeated calls
    # don't pin storage memory for the session lifetime
    local = _local_ranked(df, order_by, num_partitions).localCheckpoint(
        eager=True
    )
    counts = {
        r["__pid__"]: r["n"]
        for r in local.groupBy("__pid__")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # offsets as a literal CASE map: #partitions entries, tiny
    off_col: Column = F.lit(0).cast("long")
    expr = None
    for pid, off in offsets.items():
        cond = F.col("__pid__") == pid
        expr = (
            F.when(cond, F.lit(off)) if expr is None else expr.when(cond, F.lit(off))
        )
    off_col = expr.otherwise(F.lit(0)).cast("long") if expr is not None else off_col
    return (
        local.withColumn(out, (off_col + F.col("__lrn__")).cast("long"))
        .drop("__pid__", "__lrn__")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_cols: list[str],
    window: int,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood (SNM) candidate pairs: all (id_a, id_b) whose
    positions in the ``(key_cols, id)`` sort order differ by at most
    ``window`` — the classic entity-resolution blocking strategy
    (Hernández & Stolfo 1995): records likely to match sort near each
    other under a well-chosen key, so candidate volume is ``n*window``
    instead of the blocking-key-skew blowup of equality blocking (a
    hot key contributes its full quadratic block; SNM's per-record
    candidate count is CONSTANT by construction).

    Plan shape: one :func:`global_row_number` pass (range exchange, no
    single-partition stage), then the rank band joins through
    :func:`..joins.band_join` — a rank-bucket equi-join, never a
    nested loop. Output: (id_a, id_b, rank_gap) with id_a's rank below
    id_b's, plus each side's key columns (suffixed ``_a``/``_b``) for
    downstream verification.
    """
    from .joins import band_join

    if window < 1:
        raise ValueError("sorted_neighborhood_pairs: window must be >= 1")
    order = [*key_cols, id_col]
    ranked = global_row_number(
        df.select(id_col, *key_cols), order, out="__rn__",
        num_partitions=num_partitions,
    )
    left = ranked.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in key_cols],
        F.col("__rn__").alias("__ra__"),
        (F.col("__rn__") + 1).alias("__lo__"),
        (F.col("__rn__") + window).alias("__hi__"),
    )
    right = ranked.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in key_cols],
        F.col("__rn__").alias("__rb__"),
    )
    pairs = band_join(
        left,
        right,
        [("__lo__", "__rb__", "<="), ("__hi__", "__rb__", ">=")],
        bucket_width=max(1, window),
    )
    return pairs.select(
        "id_a",
        "id_b",
        (F.col("__rb__") - F.col("__ra__")).cast("long").alias("rank_gap"),
        *[f"{c}_a" for c in key_cols],
        *[f"{c}_b" for c in key_cols],
    )
