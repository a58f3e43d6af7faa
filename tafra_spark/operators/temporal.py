"""Temporal joins: as-of (nearest-past match) and range (point-in-interval).

The reference has neither operator (SURVEY.md §2.3 lists them as absent);
Spark has no native ASOF/RANGE join either — a naive formulation becomes
a BroadcastNestedLoopJoin (quadratic). These are the scale-correct
compositions:

- **as-of join** — the union-and-window trick: tag both sides, union,
  and take ``last(right_payload, ignorenulls)`` over a per-key window
  ordered by (time, side). ONE shuffle on the key, no range
  explosion; each left row sees the most recent right row at-or-before
  its timestamp. This is how every large-scale tick-data system
  expresses ASOF on a shuffle engine.
- **range join** — bucketize: intervals explode to the fixed-width
  buckets they cover, points map to exactly one bucket, and an
  EQUI-join on the bucket key replaces the nested-loop range predicate;
  an exact containment filter runs after the join. Shuffle volume is
  linear in (points + interval-bucket covers); pick ``bucket_width``
  near the typical interval length so covers stay O(1) per interval.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_points"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_on: str,
    right_on: str | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """LEFT as-of join: for each left row, attach the right row with the
    largest ``right_on`` ≤ ``left_on`` (direction='backward') or smallest
    ≥ (direction='forward') within the same ``by`` key.

    Ties on the right timestamp are broken by the LAST row in union
    order — pre-aggregate the right side to one row per (key, ts) for
    deterministic payloads. Unmatched left rows keep NULL right columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_on = right_on or left_on
    by = list(by)

    r_payload = [c for c in right.columns if c not in by]
    l_cols = list(left.columns)
    # collision-proof output names for right payload
    out_names = {
        c: (c + suffix if c in l_cols else c) for c in r_payload
    }

    tagged_r = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__t__"),
        F.lit(0).alias("__side__"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__rp__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols
          if c not in by],
    )
    tagged_l = left.select(
        *[F.col(c) for c in by],
        F.col(left_on).alias("__t__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast(
            tagged_r.schema["__rp__"].dataType
        ).alias("__rp__"),
        *[F.col(c) for c in l_cols if c not in by],
    )
    unioned = tagged_r.unionByName(tagged_l)

    if direction == "backward":
        # right rows sort before left at equal t → inclusive t_r ≤ t_l
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t__").asc(), F.col("__side__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__rp__", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t__").desc(), F.col("__side__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__rp__", ignorenulls=True).over(w)

    out = (
        unioned.withColumn("__m__", matched)
        .filter(F.col("__side__") == 1)
        .select(
            *[F.col(c) for c in by],
            *[F.col(c) for c in l_cols if c not in by],
            *[
                F.col("__m__").getField(c).alias(out_names[c])
                for c in r_payload
            ],
        )
    )
    return out


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int = 3600,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start ≤ point < end`` (end-exclusive), via bucketed equi-join.

    ``point_col``/``start_col``/``end_col`` are timestamp columns;
    ``bucket_width`` is in seconds. Each point maps to exactly one
    bucket, so no post-join dedup is needed; each interval is listed
    once per covered bucket.
    """
    # intermediate cast("timestamp"): TIMESTAMP_NTZ inputs cannot cast to
    # BIGINT directly; no-op for TIMESTAMP, lossless for NTZ under UTC.
    p_sec = F.col(point_col).cast("timestamp").cast("long")
    s_sec = F.col(start_col).cast("timestamp").cast("long")
    e_sec = F.col(end_col).cast("timestamp").cast("long")
    w = F.lit(bucket_width)

    p = points.withColumn("__bucket__", F.floor(p_sec / w))
    iv = intervals.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(F.floor(s_sec / w), F.floor((e_sec - 1) / w))
        ),
    )
    joined = p.join(iv, on="__bucket__", how="inner").filter(
        (F.col(start_col) <= F.col(point_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("__bucket__")
