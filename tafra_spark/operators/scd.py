"""Slowly-changing-dimension maintenance (SCD type 2).

The warehouse-side complement of ``Tafra.upsert``: instead of replacing
same-key rows, a type-2 merge preserves history — the incoming change
CLOSES the key's open row (stamps its ``valid_to``) and appends a new
open row, so every past state stays queryable with an as-of predicate
(``valid_from <= t AND (valid_to IS NULL OR t < valid_to)``).

The reference (petbox-dev/tafra) has no temporal-table concept at all;
this is a scale extension in the same family as the temporal joins
(`operators/temporal.py`).

Scale shape: ONE key-partitioned shuffle. The open slice of the
dimension joins the (latest-per-key) update batch with a full outer
join on the key; closed history never moves — it is unioned back
untouched. At 100 TB the dimension is stored partitioned by
``is_current`` so the closed majority is not even scanned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_merge"]


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    effective_col: str = "effective_ts",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply one batch of updates to an SCD2 dimension table.

    ``current`` carries (keys…, tracked…, valid_from, valid_to,
    is_current); ``updates`` carries (keys…, tracked…, effective_col).
    Multiple updates per key in one batch collapse to the LATEST by
    ``effective_col`` (ties broken by the tracked values themselves so
    the reduction is deterministic). Rules, per key:

    - unchanged tracked values → open row passes through untouched;
    - changed values → the open row closes at the update's effective
      time and a new open row starts there;
    - unknown key → a brand-new open row;
    - an update not newer than the open row's ``valid_from`` is ignored
      (out-of-order protection: history is append-only).

    Closed history rows (``is_current = false``) are returned as-is.
    Edge rules: a NULL ``valid_from`` on an open row means "history
    start unknown" and any update counts as newer; NULL key values are
    matched null-safely (one NULL key is one key); updates with a NULL
    effective time are ignored.
    """
    key_list = list(keys)
    tracked_list = list(tracked)
    if not key_list:
        raise ValueError("scd2_merge: keys must be non-empty")
    if not tracked_list:
        # an empty tracked set would leave the change predicate
        # undefined and surface as an opaque TypeError deep in
        # expression construction — fail loudly at the boundary
        raise ValueError("scd2_merge: tracked must be non-empty")
    for k in key_list + tracked_list:
        if k not in current.columns:
            raise KeyError(f"scd2_merge: column {k!r} missing from current")
        if k not in updates.columns:
            raise KeyError(f"scd2_merge: column {k!r} missing from updates")

    out_cols = (
        key_list + tracked_list + [valid_from_col, valid_to_col, current_col]
    )
    closed = current.filter(~F.col(current_col)).select(*out_cols)
    open_rows = current.filter(F.col(current_col)).select(*out_cols)

    w = Window.partitionBy(*key_list).orderBy(
        F.col(effective_col).desc(), *[F.col(c).desc() for c in tracked_list]
    )
    latest = (
        # a NULL effective time cannot order against history — such
        # updates are ignored rather than poisoning the newer-than
        # comparison with NULL booleans
        updates.filter(F.col(effective_col).isNotNull())
        .select(*key_list, *tracked_list, effective_col)
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )

    # explicit presence markers: existence after the full outer join
    # must NOT be inferred from nullable data columns (a NULL
    # valid_from — the initial-load "history unknown" convention — or a
    # NULL effective time would silently drop rows)
    cur = open_rows.select(
        *[F.col(k).alias(f"__ck_{k}") for k in key_list],
        *[F.col(c).alias(f"__cv_{c}") for c in tracked_list],
        F.col(valid_from_col).alias("__c_from"),
        F.lit(True).alias("__c_has"),
    )
    upd = latest.select(
        *[F.col(k).alias(f"__uk_{k}") for k in key_list],
        *[F.col(c).alias(f"__uv_{c}") for c in tracked_list],
        F.col(effective_col).alias("__u_eff"),
        F.lit(True).alias("__u_has"),
    )
    cond = None
    for k in key_list:
        # null-safe: a NULL dimension key is still ONE key and must
        # match its update, or the one-open-row invariant breaks
        c = F.col(f"__ck_{k}").eqNullSafe(F.col(f"__uk_{k}"))
        cond = c if cond is None else (cond & c)
    j = cur.join(upd, cond, "full_outer")

    has_cur = F.coalesce(F.col("__c_has"), F.lit(False))
    has_upd = F.coalesce(F.col("__u_has"), F.lit(False))
    changed = None
    for c in tracked_list:
        d = ~F.col(f"__cv_{c}").eqNullSafe(F.col(f"__uv_{c}"))
        changed = d if changed is None else (changed | d)
    # NULL valid_from on an existing row = unknown history start:
    # any update is newer than it
    newer = F.col("__c_from").isNull() | (
        F.col("__u_eff") > F.col("__c_from")
    )
    applies = has_upd & (~has_cur | newer)
    takes_effect = applies & (~has_cur | changed)

    def _key(k: str):
        return F.coalesce(F.col(f"__ck_{k}"), F.col(f"__uk_{k}")).alias(k)

    # the (possibly closed) prior row, for keys that had one
    prior = j.filter(has_cur).select(
        *[F.col(f"__ck_{k}").alias(k) for k in key_list],
        *[F.col(f"__cv_{c}").alias(c) for c in tracked_list],
        F.col("__c_from").alias(valid_from_col),
        F.when(takes_effect, F.col("__u_eff")).alias(valid_to_col),
        (~takes_effect).alias(current_col),
    )
    fresh = j.filter(takes_effect).select(
        *[_key(k) for k in key_list],
        *[F.col(f"__uv_{c}").alias(c) for c in tracked_list],
        F.col("__u_eff").alias(valid_from_col),
        F.lit(None).cast(
            latest.schema[effective_col].dataType
        ).alias(valid_to_col),
        F.lit(True).alias(current_col),
    )
    return closed.unionByName(prior).unionByName(fresh)
