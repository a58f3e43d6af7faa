"""Event-stream analytics and shuffle diagnostics.

Classic product-analytics operators over an (event_id, ts, user_id,
event_type, ...) stream — absent from the reference (which has no
time-ordered operators at all) and implemented Spark-first:

- ``funnel_conversion``: ordered step progression per user (step N
  counts only after step N-1's first completion), as chained
  conditional-min windows over ONE user partition.
- ``retention_cohorts``: users grouped by first-activity week, counted
  per subsequent activity week.
- ``event_transitions``: Markov-style (type → next type) counts with
  outgoing shares from one lead() window.
- ``key_skew_stats``: top-k heaviest values of a prospective shuffle
  key — the salting/AQE pre-flight check.

All are exact, deterministic, and DuckDB-expressible, so they carry
value-hash oracles like every other driver query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "funnel_conversion",
    "retention_cohorts",
    "event_transitions",
    "key_skew_stats",
    "rate_spikes",
    "decayed_activity",
    "sliding_active_users",
    "distribution_drift",
    "concurrency_profile",
    "corr_matrix",
    "grouped_trend",
    "resample_ffill",
    "value_histogram",
    "cusum_changepoints",
    "funnel_step_latency",
    "user_burstiness",
    "exact_group_median",
    "triangle_counts",
    "exact_group_quantiles",
    "basket_rules",
    "winsorize",
    "degree_assortativity",
    "edge_assortativity",
    "markov_next_event_eval",
    "markov_attribution",
    "seasonal_anomalies",
    "funnel_within",
    "silence_streaks",
    "zipf_fit",
    "mad_outliers",
    "pagerank_nodes",
    "top_paths",
    "histogram_quantiles",
    "position_attribution",
    "clustering_coefficient",
    "k_core",
    "shapley_attribution",
    "benford_profile",
    "gini_concentration",
]


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str] = ("click", "view", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: a user completes step i at the earliest event of
    ``steps[i]`` at-or-after their step i-1 completion time.

    Implementation: chained conditional-min WINDOW aggregates over the
    user partition — step i's column references step i-1's, and Catalyst
    evaluates all of them over the SAME user-key exchange (one shuffle
    total, no self-joins, no per-user collect). Output: one row per step
    with the user count and the conversion from step 1, fixed to 6
    places (exact integer ratio — hash-stable).

    Scale: the single shuffle is on the user key; state per user is one
    timestamp per step. Skewed power users are just wider partitions of
    a narrow projection (ts + type only), and AQE splits them.
    """
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev: F.Column | None = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) >= prev)
        df = df.withColumn(f"__t{i}__", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(f"__t{i}__")
    per_user = df.groupBy(user_col).agg(
        *[F.max(f"__t{i}__").alias(f"t{i}") for i in range(len(steps))]
    )
    # coalesce: sum over ZERO users is NULL, and an empty (or fully
    # filtered) input must still report honest 0 counts per step
    counts = per_user.agg(
        *[
            F.coalesce(
                F.sum(F.col(f"t{i}").isNotNull().cast("long")), F.lit(0)
            ).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    rows = [
        F.struct(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(step).alias("step_name"),
            F.col(f"n{i}").alias("n_users"),
            # ANSI divide-by-zero guard: conversion from zero entrants
            # is undefined — NULL, not a job abort
            F.when(
                F.col("n0") > 0,
                F.round(
                    F.col(f"n{i}").cast("double")
                    / F.col("n0").cast("double"),
                    6,
                ),
            ).alias("conversion"),
        )
        for i, step in enumerate(steps)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int = 8,
) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-activity week
    (their cohort), counted per subsequent activity week.

    Two aggregates: per-user first-activity week (window min over the
    user key), then a distinct-user count per (cohort_week, week_no).
    ``week_no`` is whole weeks since the cohort week — day-difference
    floor-div 7, which is engine-portable (date_trunc week boundaries
    are Monday-start on both engines). Output weeks capped at
    ``max_weeks`` to bound the triangle.

    Scale: one user-key shuffle + one (cohort, week) aggregate; both
    keys are low-cardinality relative to the event stream, and the
    distinct-count runs on (cohort, week, user) triples — linear.
    """
    w = Window.partitionBy(user_col)
    wk = F.date_trunc("week", F.col(ts_col))
    base = events.select(
        F.col(user_col),
        wk.alias("act_week"),
    ).withColumn("cohort_week", F.min("act_week").over(w))
    out = (
        base.withColumn(
            "week_no",
            F.floor(
                F.datediff(F.col("act_week"), F.col("cohort_week")) / F.lit(7)
            ).cast("long"),
        )
        .filter(F.col("week_no") <= max_weeks)
        .groupBy("cohort_week", "week_no")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_no",
            "n_users",
        )
    )
    return out


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Markov-style transition counts: for each user's time-ordered
    event sequence, count (event_type → next event_type) pairs
    corpus-wide, with each source type's outgoing transition share.

    One lead() window over the user partition (single shuffle) feeding a
    (from, to) count — the standard path-analysis primitive. The tie
    order inside equal timestamps is pinned by ``id_col`` so both
    engines see the same sequence.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("from_type")
    return pairs.withColumn(
        "share",
        F.round(F.col("n").cast("double") / F.sum("n").over(w_tot), 6),
    )


def key_skew_stats(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Shuffle-skew diagnosis for a prospective join/agg key: the top-k
    heaviest key values with their row share, plus the overall
    key-count / distinct-key ratio context on every row.

    This is the pre-flight check before shuffling 100 TB on a key —
    the output tells you whether to salt (`operators.joins.salted_join`)
    or rely on AQE skew splitting. One count aggregate + a tiny top-k
    window; NULL keys are counted too (they are the classic skew
    culprit), labeled '<null>'.
    """
    counts = (
        df.select(
            F.coalesce(F.col(key_col).cast("string"), F.lit("<null>")).alias(
                "key"
            )
        )
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total__"),
        F.count(F.lit(1)).alias("__distinct__"),
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            "rank",
            "key",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("__total__"), 6
            ).alias("row_share"),
            F.col("__distinct__").alias("n_distinct_keys"),
        )
    )


def rate_spikes(
    events: DataFrame,
    window: str = "1 hour",
    type_col: str = "event_type",
    ts_col: str = "ts",
    sigma: int = 3,
) -> DataFrame:
    """Per-type rate-spike detection over windowed event counts: a
    window is a spike when its count sits more than ``sigma`` standard
    deviations above/below the type's mean rate.

    The test is evaluated in EXACT integer algebra — no float mean or
    variance anywhere: with per-type totals n, s = Σcnt, q = Σcnt²,
    ``(cnt·n − s)² > sigma²·(n·q − s²)`` is the σ-threshold comparison
    multiplied through by n², so the flag is bit-reproducible on any
    engine and insensitive to summation order (the same discipline as
    the fixed-point money sums).

    Scale: one windowed count aggregate (streaming-compatible shape) +
    one per-type stats aggregate joined back — both keys tiny relative
    to the event stream.
    """
    counts = (
        events.groupBy(
            F.window(ts_col, window).alias("w"), F.col(type_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            type_col,
            "n_events",
        )
    )
    stats = counts.groupBy(type_col).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum("n_events").alias("__s__"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("__q__"),
    )
    dev = F.col("n_events") * F.col("__n__") - F.col("__s__")
    spread = F.col("__n__") * F.col("__q__") - F.col("__s__") * F.col("__s__")
    return (
        counts.join(F.broadcast(stats), on=type_col)
        .withColumn(
            "is_spike", dev * dev > F.lit(int(sigma) ** 2) * spread
        )
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            type_col,
            "n_events",
            "is_spike",
        )
    )

def decayed_activity(
    events: DataFrame,
    tau_hours: float = 24.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    kernel: str = "harmonic",
) -> DataFrame:
    """Per-user time-decayed activity score: recent events count more.

    Each event contributes a weight that decays with its age relative
    to the corpus's most recent event (so the score is a pure function
    of the data — no wall-clock dependency, reproducible forever):

    - ``kernel="harmonic"``: w = 1 / (1 + age/τ). Pure IEEE add+divide,
      which are correctly-rounded and therefore BIT-IDENTICAL across
      engines — this is the oracle-checkable default. exp()/pow() are
      NOT correctly-rounded by spec (JVM StrictMath vs libm may differ
      in the last ulp), so the classic exponential kernel cannot carry
      a cross-engine value hash.
    - ``kernel="exp"``: w = exp(-age/τ), the standard half-lifeish
      kernel, for pure-Spark use.

    Per-row weights are fixed-pointed (floor(w·1e6 + 0.5) — identical
    longs both engines) and summed exactly, so the aggregate is
    order-independent. The reference timestamp comes from a one-row
    broadcast cross-join, NOT a driver collect: the plan stays fully
    lazy and cluster-side.

    Scale: one global max (partial-agg, bytes of traffic), one
    broadcast, one groupBy(user) shuffle. Skewed users are plain AQE
    fodder — the weight expression is map-side.
    """
    tau_s = F.lit(float(tau_hours) * 3600.0)
    ref = events.agg(F.max(F.col(ts_col).cast("timestamp")).alias("__ref__"))
    age_s = (
        F.col("__ref__").cast("long") - F.col(ts_col).cast("timestamp").cast("long")
    ).cast("double")
    if kernel == "harmonic":
        w = F.lit(1.0) / (F.lit(1.0) + age_s / tau_s)
    elif kernel == "exp":
        w = F.exp(-age_s / tau_s)
    else:
        raise ValueError(f"unknown kernel: {kernel!r}")
    return (
        events.crossJoin(F.broadcast(ref))
        .select(
            F.col(user_col),
            F.floor(w * F.lit(1e6) + F.lit(0.5)).cast("long").alias("__w6__"),
        )
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("__w6__") / F.lit(1e6)).alias("activity"),
        )
    )


def sliding_active_users(
    events: DataFrame,
    window_hours: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Distinct active users per trailing ``window_hours``-hour window,
    one row per window-END hour: a user active in hour h counts toward
    the windows ending at h, h+1, …, h+window_hours−1.

    COUNT(DISTINCT) over a sliding window is the classic unsupported
    case for both window functions (no DISTINCT) and streaming (holistic
    state); the scalable reformulation is set-shrink-then-replicate:
    dedup to (hour, user) pairs FIRST (one shuffle on the pair — the big
    cardinality drop happens before any replication), then explode each
    pair to its ≤``window_hours`` target windows and count distinct
    users per target (second shuffle, on data already deduped per hour).
    Replication factor is the window width, not the event rate.

    Emits every window whose count is nonzero, including the
    ``window_hours−1`` windows trailing past the last event hour.
    """
    if int(window_hours) < 1:
        # window_hours=0 builds a stop-before-start sequence() that only
        # fails at job execution; fail at call time instead
        raise ValueError(
            f"sliding_active_users: window_hours must be >= 1, "
            f"got {window_hours}"
        )
    hour = F.date_trunc("hour", F.col(ts_col).cast("timestamp"))
    pairs = events.select(
        hour.alias("__h__"), F.col(user_col)
    ).distinct()
    targets = pairs.select(
        F.explode(
            F.sequence(
                F.col("__h__"),
                F.col("__h__") + F.expr(f"INTERVAL {int(window_hours) - 1} HOURS"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("window_end_hour"),
        F.col(user_col),
    )
    return targets.groupBy("window_end_hour").agg(
        F.count_distinct(F.col(user_col)).alias("n_active_users")
    )


def distribution_drift(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 10,
) -> DataFrame:
    """Distribution drift of ``value_col`` between the first and second
    half of the time range — the ingest-monitoring question "did this
    week's data shift?" answered as per-bin share deltas (the total
    variation distance is half their sum). The classic metric here is
    PSI, but PSI needs ``log`` — not cross-engine hash-stable — and its
    decision content at the gate is the same: flag when shares move.

    Deterministic and fully distributed: the time split is the midpoint
    of (min, max) event time and the bins are ``n_bins`` equal-width
    slices of the global value range — both from ONE tiny min/max
    aggregate attached by broadcast (no driver collect, no RNG, no
    quantile estimation). Everything after is a single (side, bin)
    count aggregate: two shuffles total regardless of data size.

    Shares are fixed-point ``floor(n_bin / n_side * 1e6 + 0.5)`` — an
    exact integer on any IEEE engine (ratio of ints < 2^53). Rows with
    NULL value or timestamp are excluded. Output: one row per bin
    (bin, n_before, n_after, share_before_q6, share_after_q6,
    delta_q6); empty bins on one side report share 0.
    """
    base = events.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us__"),
        F.col(value_col).cast("double").alias("__v__"),
    )
    stats = base.agg(
        F.min("__us__").alias("mnt"),
        F.max("__us__").alias("mxt"),
        F.min("__v__").alias("mnv"),
        F.max("__v__").alias("mxv"),
    )
    mid = F.floor((F.col("mnt") + F.col("mxt")) / F.lit(2.0)).cast("long")
    span = F.col("mxv") - F.col("mnv")
    bin_ = F.when(span > 0, F.least(
        F.floor((F.col("__v__") - F.col("mnv")) / span * n_bins),
        F.lit(n_bins - 1),
    )).otherwise(0).cast("long")
    sided = base.crossJoin(F.broadcast(stats)).select(
        (F.col("__us__") <= mid).alias("__before__"), bin_.alias("bin")
    )
    counts = sided.groupBy("bin").agg(
        F.sum(F.when(F.col("__before__"), 1).otherwise(0))
        .cast("long")
        .alias("n_before"),
        F.sum(F.when(F.col("__before__"), 0).otherwise(1))
        .cast("long")
        .alias("n_after"),
    )
    totals = counts.agg(
        F.sum("n_before").alias("tb"), F.sum("n_after").alias("ta")
    )
    share = lambda n, t: F.when(  # noqa: E731
        t > 0, F.floor(n / t * 1000000 + F.lit(0.5))
    ).otherwise(0).cast("long")
    return (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("share_before_q6", share(F.col("n_before"), F.col("tb")))
        .withColumn("share_after_q6", share(F.col("n_after"), F.col("ta")))
        .withColumn(
            "delta_q6",
            F.abs(F.col("share_before_q6") - F.col("share_after_q6")),
        )
        .select(
            "bin", "n_before", "n_after",
            "share_before_q6", "share_after_q6", "delta_q6",
        )
    )


def concurrency_profile(
    intervals: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end",
    key_col: str = "user_id",
    bucket: str = "hour",
) -> DataFrame:
    """Peak concurrency per time bucket: how many intervals (sessions,
    connections, jobs) are simultaneously open — the capacity-planning
    profile. Intervals are half-open ``[start, end)``: a session ending
    exactly when another starts does not overlap it.

    The classic formulation is a GLOBAL ordered cumulative sum over
    ±1 boundary events — a single-partition sort that dies at scale.
    This is the two-level prefix-sum decomposition instead: boundary
    deltas cumsum WITHIN their bucket (bounded partitions, one shuffle
    on the bucket key), bucket totals cumsum ACROSS buckets (a
    buckets-sized table — thousands of rows for years of hours — where
    a single-partition window is fine and documented), and concurrency
    = carry-in + local running sum. Identical result to the global
    sort, shuffles bounded by the bucket cardinality.

    Tie order at equal timestamps is pinned (−1 before +1, then
    ``key_col``) so the profile is deterministic and engine-portable.
    Zero-length intervals (a one-event session has start == end) are
    widened to one microsecond so the interval still registers — a
    capacity profile that reports 0 for an hour of single-event users
    would be misleading. The carry-in value AT bucket start is a max
    candidate too: a bucket whose only events are interval ENDS still
    saw the carried concurrency before its first event.

    Output: (bucket_start, max_concurrency) for buckets containing at
    least one boundary event.
    """
    start_ts = F.col(start_col).cast("timestamp")
    end_raw = F.col(end_col).cast("timestamp")
    end_ts = F.when(
        end_raw == start_ts, end_raw + F.expr("INTERVAL 1 MICROSECOND")
    ).otherwise(end_raw)
    starts = intervals.select(
        start_ts.alias("ts"), F.lit(1).alias("d"), F.col(key_col).alias("k")
    )
    ends = intervals.select(
        end_ts.alias("ts"), F.lit(-1).alias("d"), F.col(key_col).alias("k")
    )
    ev = starts.unionByName(ends).withColumn(
        "b", F.date_trunc(bucket, F.col("ts"))
    )
    w_in = (
        Window.partitionBy("b")
        .orderBy("ts", "d", "k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ev.withColumn("run", F.sum("d").over(w_in))
    # bucket totals: tiny table; the cross-bucket prefix sum may run
    # single-partition — documented as fine at bucket cardinality
    tot = ev.groupBy("b").agg(F.sum("d").alias("bt"))
    w_carry = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = tot.withColumn(
        "carry", F.coalesce(F.sum("bt").over(w_carry), F.lit(0))
    ).select("b", "carry")
    return (
        local.join(carry, on="b")
        .withColumn("conc", F.col("carry") + F.col("run"))
        .groupBy("b")
        .agg(
            # greatest(carry, max(conc)): the pre-first-event level is
            # part of the bucket's profile (an all-ends bucket would
            # otherwise underreport)
            F.greatest(F.first("carry"), F.max("conc"))
            .cast("long")
            .alias("max_concurrency")
        )
        .select(
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "max_concurrency",
        )
    )

def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    scales=1,
) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns — the
    profiling step after :meth:`Tafra.profile`: which measures move
    together?

    Engine-portable by the fixed-point-component discipline: each value
    is quantized to an exact integer (``floor(x·scale + 0.5)``;
    ``scales`` is one int or a per-column mapping — pick each column's
    scale to cover its decimals, e.g. 100 for a 2-decimal discount, 1
    for an already-integer quantity), and the five sufficient
    statistics per pair (Σx, Σy, Σxy, Σx², Σy², n) are
    order-independent INTEGER sums. The final correlation converts the
    exact sums to doubles through one mirrored expression (sqrt is a
    correctly-rounded IEEE op), so both engines emit the same bits.
    Correlation is scale-invariant, so quantization granularity only
    rounds the inputs — it never biases the mirrored comparison.

    ONE aggregate pass regardless of the pair count — the same
    single-scan shape as :func:`~tafra_spark.functions.checks.
    constraint_report`; rows with a NULL in either column of a pair are
    excluded from THAT pair's sums (pairwise deletion, the standard
    profiling convention). Integer-overflow budget: Σ(x·scale)² must
    stay under 2⁶³ — size each column's scale so
    n·max(|x|·scale)² < 9·10¹⁸ (ANSI mode aborts loudly rather than
    wrapping if you overshoot). Returns (col_a, col_b, n, corr),
    pairs in column-list order.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix: need at least two columns")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"corr_matrix: unknown column {c!r}")
    scale_of = (
        dict(scales)
        if not isinstance(scales, (int, float))
        else {c: scales for c in cols}
    )

    def q(c: str):
        return F.floor(
            F.col(c).cast("double") * F.lit(float(scale_of.get(c, 1)))
            + F.lit(0.5)
        ).cast("long")

    aggs = []
    pairs = [
        (i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))
    ]
    for i, j in pairs:
        a, b = cols[i], cols[j]
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        xa = F.when(both, q(a))
        xb = F.when(both, q(b))
        tag = f"__{i}_{j}"
        aggs += [
            F.count(xa).alias(f"n{tag}"),
            F.sum(xa).alias(f"sx{tag}"),
            F.sum(xb).alias(f"sy{tag}"),
            F.sum(xa * xb).alias(f"sxy{tag}"),
            F.sum(xa * xa).alias(f"sxx{tag}"),
            F.sum(xb * xb).alias(f"syy{tag}"),
        ]
    one = df.agg(*aggs)

    def corr_expr(tag: str):
        n = F.col(f"n{tag}").cast("double")
        sx = F.col(f"sx{tag}").cast("double")
        sy = F.col(f"sy{tag}").cast("double")
        sxy = F.col(f"sxy{tag}").cast("double")
        sxx = F.col(f"sxx{tag}").cast("double")
        syy = F.col(f"syy{tag}").cast("double")
        den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
        return F.when(
            den > 0, F.round((n * sxy - sx * sy) / den, 6)
        )
    reports = F.array(
        *[
            F.struct(
                F.lit(cols[i]).alias("col_a"),
                F.lit(cols[j]).alias("col_b"),
                F.col(f"n__{i}_{j}").cast("long").alias("n"),
                corr_expr(f"__{i}_{j}").alias("corr"),
            )
            for i, j in pairs
        ]
    )
    return one.select(F.explode(reports).alias("r")).select(
        "r.col_a", "r.col_b", "r.n", "r.corr"
    )


def grouped_trend(
    df: DataFrame,
    key_cols: Sequence[str],
    x_col: str,
    y_col: str,
    x_scale: int = 1,
    y_scale: int = 100,
) -> DataFrame:
    """Per-group ordinary-least-squares trend (slope + intercept) of
    ``y`` against ``x`` — "is revenue per nation rising?", "is this
    source's quality drifting?" — the grouped regression every metrics
    pipeline reinvents.

    Same exact-component discipline as :func:`corr_matrix` (quantized
    integer sums per group, one mirrored double expression at the end),
    so the slope survives the cross-engine value hash. ONE group-by
    aggregate; slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) in the ORIGINAL
    units (the scales cancel through the mirrored division), intercept
    = ȳ − slope·x̄. Groups with < 2 points or zero x-variance yield
    NULL slope. Returns key cols + (n, slope, intercept).
    """
    for c in [*key_cols, x_col, y_col]:
        if c not in df.columns:
            raise ValueError(f"grouped_trend: unknown column {c!r}")
    both = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    qx = F.when(
        both,
        F.floor(
            F.col(x_col).cast("double") * F.lit(float(x_scale)) + F.lit(0.5)
        ).cast("long"),
    )
    qy = F.when(
        both,
        F.floor(
            F.col(y_col).cast("double") * F.lit(float(y_scale)) + F.lit(0.5)
        ).cast("long"),
    )
    g = df.groupBy(*key_cols).agg(
        F.count(qx).alias("__n__"),
        F.sum(qx).alias("__sx__"),
        F.sum(qy).alias("__sy__"),
        F.sum(qx * qy).alias("__sxy__"),
        F.sum(qx * qx).alias("__sxx__"),
    )
    n = F.col("__n__").cast("double")
    sx = F.col("__sx__").cast("double")
    sy = F.col("__sy__").cast("double")
    sxy = F.col("__sxy__").cast("double")
    sxx = F.col("__sxx__").cast("double")
    den = n * sxx - sx * sx
    # slope in original units: quantized slope × (x_scale / y_scale)
    slope_q = (n * sxy - sx * sy) / den
    slope = slope_q * F.lit(float(x_scale) / float(y_scale))
    xbar = sx / n / F.lit(float(x_scale))
    ybar = sy / n / F.lit(float(y_scale))
    valid = (F.col("__n__") >= 2) & (den > 0)
    return g.select(
        *key_cols,
        F.col("__n__").cast("long").alias("n"),
        F.when(valid, F.round(slope, 6)).alias("slope"),
        F.when(valid, F.round(ybar - slope * xbar, 6)).alias("intercept"),
    )

def resample_ffill(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    bucket_minutes: int = 60,
) -> DataFrame:
    """Resample an irregular event series onto a regular per-key time
    grid with forward fill — the gap-filling step before any
    fixed-step time-series computation (rates, rolling models,
    dashboarding): every key gets one row per bucket between its first
    and last event; empty buckets carry the last observed value.

    Per (key, bucket) the LAST event wins (ties broken by the full
    (ts, value) order so the pick is deterministic on both engines);
    the grid is a per-key ``sequence`` explode (bounded by the key's
    own time span — no corpus-wide calendar join); the fill is one
    ``last(value, ignorenulls)`` running window per key. Two linear
    shuffles on the key. Returns (key, bucket_ts, value, filled).
    """
    sec = bucket_minutes * 60
    bucket = F.floor(
        F.col(ts_col).cast("timestamp").cast("long") / F.lit(sec)
    ).cast("long")
    w_pick = Window.partitionBy(key_col, "__b__").orderBy(
        F.col(ts_col).desc(), F.col(value_col).desc()
    )
    per_bucket = (
        df.select(F.col(key_col), bucket.alias("__b__"), F.col(ts_col), F.col(value_col))
        .withColumn("__rn__", F.row_number().over(w_pick))
        .filter(F.col("__rn__") == 1)
        .select(key_col, "__b__", F.col(value_col).alias("__v__"))
    )
    spans = per_bucket.groupBy(key_col).agg(
        F.min("__b__").alias("__b0__"), F.max("__b__").alias("__b1__")
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("__b0__"), F.col("__b1__"))
        ).alias("__b__"),
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("__b__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(per_bucket, on=[key_col, "__b__"], how="left")
    return (
        joined.withColumn(
            "value", F.last("__v__", ignorenulls=True).over(w_fill)
        )
        .withColumn("filled", F.col("__v__").isNull())
        .select(
            key_col,
            F.timestamp_seconds(F.col("__b__") * sec).alias("bucket_ts"),
            "value",
            "filled",
        )
    )

def value_histogram(
    df: DataFrame,
    col: str,
    bins: int = 20,
) -> DataFrame:
    """Exact equal-width histogram of a numeric column — the profiling
    primitive behind :func:`distribution_drift`, exposed standalone.

    Bin edges come from ONE broadcast min/max aggregate; each row then
    maps to ``least(floor((x−min)/width), bins−1)`` (the max value
    closes into the last bin) in a narrow projection, and a single
    count aggregate finishes. Empty bins are materialized with zero
    counts via a sequence explode so the output is always exactly
    ``bins`` rows — a histogram with silent holes misleads. Bounds are
    q6-fixed-pointed for the cross-engine hash. NULLs are excluded
    (count them with a ``not_null`` constraint if they matter). A
    constant column degenerates to all mass in bin 0.
    """
    if bins < 1:
        raise ValueError("value_histogram: bins must be >= 1")
    x = F.col(col).cast("double")
    bounds = df.filter(x.isNotNull()).agg(
        F.min(x).alias("__lo__"), F.max(x).alias("__hi__")
    )
    width = (F.col("__hi__") - F.col("__lo__")) / F.lit(float(bins))
    binned = (
        df.filter(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.when(
                F.col("__hi__") > F.col("__lo__"),
                F.least(
                    F.floor((x - F.col("__lo__")) / width).cast("long"),
                    F.lit(bins - 1).cast("long"),
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin"),
        "__lo__",
        "__hi__",
    )
    w = (F.col("__hi__") - F.col("__lo__")) / F.lit(float(bins))
    return (
        grid.join(binned, on="bin", how="left")
        .select(
            F.col("bin"),
            F.floor(
                (F.col("__lo__") + F.col("bin") * w) * 1e6 + F.lit(0.5)
            ).cast("long").alias("lo_q6"),
            F.floor(
                (F.col("__lo__") + (F.col("bin") + 1) * w) * 1e6 + F.lit(0.5)
            ).cast("long").alias("hi_q6"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )

def cusum_changepoints(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    bucket_minutes: int = 60,
) -> DataFrame:
    """CUSUM changepoint localization on per-type event rates (Page
    1954): for each event type, the bucket where the cumulative sum of
    deviations from the mean rate peaks — the standard "WHEN did the
    rate shift" answer that :func:`rate_spikes`' pointwise z-scores
    can't give (a sustained level change never spikes).

    The statistic is exact where it matters: per-bucket counts are
    integers on a COMPLETE per-type bucket grid (missing buckets count
    0 — skipping them would silently splice time), the prefix count is
    an integer window sum, and S_i = prefix_i − i·mean needs one
    double multiply per row. Peak = max |S_i|, earliest bucket on
    ties. Plan: one (type, bucket) count, a types×buckets grid from
    one broadcast bounds row, two windows over the type partition.
    Returns (type, peak_ts, cusum_peak_q6, total_events, n_buckets).
    """
    sec = bucket_minutes * 60
    b = F.floor(
        F.col(ts_col).cast("timestamp").cast("long") / F.lit(sec)
    ).cast("long")
    counts = (
        events.select(F.col(type_col), b.alias("__b__"))
        .groupBy(type_col, "__b__")
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    bounds = counts.agg(
        F.min("__b__").alias("__b0__"), F.max("__b__").alias("__b1__")
    )
    types = counts.select(type_col).distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        type_col,
        F.explode(F.sequence(F.col("__b0__"), F.col("__b1__"))).alias("__b__"),
    )
    full = grid.join(counts, on=[type_col, "__b__"], how="left").withColumn(
        "__n__", F.coalesce(F.col("__n__"), F.lit(0))
    )
    w_type = Window.partitionBy(type_col)
    w_cum = (
        Window.partitionBy(type_col)
        .orderBy("__b__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        full.withColumn("__tot__", F.sum("__n__").over(w_type))
        .withColumn("__nb__", F.count(F.lit(1)).over(w_type))
        .withColumn("__cum__", F.sum("__n__").over(w_cum))
        .withColumn("__i__", F.row_number().over(
            Window.partitionBy(type_col).orderBy("__b__")
        ))
        .withColumn(
            "__s__",
            F.col("__cum__").cast("double")
            - F.col("__i__").cast("double")
            * (F.col("__tot__").cast("double") / F.col("__nb__").cast("double")),
        )
    )
    w_peak = Window.partitionBy(type_col).orderBy(
        F.abs(F.col("__s__")).desc(), F.col("__b__")
    )
    return (
        scored.withColumn("__rk__", F.row_number().over(w_peak))
        .filter(F.col("__rk__") == 1)
        .select(
            F.col(type_col),
            F.date_format(
                F.timestamp_seconds(F.col("__b__") * sec),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("peak_ts"),
            F.floor(F.col("__s__") * 1e6 + F.lit(0.5)).cast("long").alias(
                "cusum_peak_q6"
            ),
            F.col("__tot__").alias("total_events"),
            F.col("__nb__").cast("long").alias("n_buckets"),
        )
    )

def funnel_step_latency(
    events: DataFrame,
    steps: Sequence[str] = ("click", "view", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-to-convert per funnel transition: for users who complete
    step i, the quartiles of (step i time − step i−1 time) in whole
    seconds — the "WHERE does the funnel stall" companion to
    :func:`funnel_conversion`'s "how many convert".

    Same chained conditional-min fold over ONE user-key exchange as the
    conversion op (step times are computed identically, so the two
    reports always agree on who converted); the deltas are exact
    integer seconds (micros truncated on both engines) and the
    quartiles are the R-7 interpolation both engines share. One extra
    tiny aggregate over the per-user row set. Returns one row per
    transition: (step, step_name, n_converted, p25_s, p50_s, p75_s).
    """
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) >= prev)
        df = df.withColumn(
            f"__t{i}__", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = F.col(f"__t{i}__")
    per_user = df.groupBy(user_col).agg(
        *[F.max(f"__t{i}__").alias(f"t{i}") for i in range(len(steps))]
    )
    aggs = []
    for i in range(1, len(steps)):
        delta = (
            F.col(f"t{i}").cast("timestamp").cast("long")
            - F.col(f"t{i-1}").cast("timestamp").cast("long")
        ).cast("double")
        d = F.when(F.col(f"t{i}").isNotNull(), delta)
        aggs += [
            F.coalesce(
                F.sum(F.col(f"t{i}").isNotNull().cast("long")), F.lit(0)
            ).alias(f"n{i}"),
            F.percentile(d, F.lit(0.25)).alias(f"p25_{i}"),
            F.percentile(d, F.lit(0.5)).alias(f"p50_{i}"),
            F.percentile(d, F.lit(0.75)).alias(f"p75_{i}"),
        ]
    one = per_user.agg(*aggs)
    rows = [
        F.struct(
            F.lit(i).cast("long").alias("step"),
            F.lit(steps[i]).alias("step_name"),
            F.col(f"n{i}").alias("n_converted"),
            F.round(F.col(f"p25_{i}"), 6).alias("p25_s"),
            F.round(F.col(f"p50_{i}"), 6).alias("p50_s"),
            F.round(F.col(f"p75_{i}"), 6).alias("p75_s"),
        )
        for i in range(1, len(steps))
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")

def user_burstiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gaps: int = 5,
) -> DataFrame:
    """Inter-arrival burstiness per user: the Fano factor (variance /
    mean) of the gaps between consecutive events — ≈mean for a Poisson
    user, ≫mean for bursty bots/batch importers, ≈0 for metronomic
    schedulers. The behavioral-fingerprint feature fraud and bot
    pipelines compute first.

    Gaps are exact integer seconds from one lag() window over the user
    partition (ties pinned by ``id_col``); variance comes from exact
    (Σx, Σx², n) component sums — integers until one mirrored double
    expression, same discipline as :func:`corr_matrix`. Users with
    fewer than ``min_gaps`` gaps are dropped (a two-event Fano factor
    is noise). One user-key exchange total. Returns (user, n_gaps,
    mean_gap_s, fano_s) with q6 rounding.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ts_s = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(ts_col).over(w).cast("timestamp").cast("long")
    gaps = (
        events.select(F.col(user_col), F.col(ts_col), F.col(id_col))
        .withColumn("__g__", ts_s - prev)
        .filter(F.col("__g__").isNotNull())
    )
    agg = gaps.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("__g__").alias("__s__"),
        F.sum(F.col("__g__") * F.col("__g__")).alias("__ss__"),
    )
    n = F.col("n_gaps").cast("double")
    s = F.col("__s__").cast("double")
    ss = F.col("__ss__").cast("double")
    mean = s / n
    var = ss / n - mean * mean
    return (
        agg.filter(F.col("n_gaps") >= min_gaps)
        .select(
            F.col(user_col),
            F.col("n_gaps"),
            F.round(mean, 6).alias("mean_gap_s"),
            F.when(mean > 0, F.round(var / mean, 6)).alias("fano_s"),
        )
    )


def exact_group_median(
    df: DataFrame,
    key_col: str,
    value_col: str,
    buckets: int = 1024,
) -> DataFrame:
    """Exact per-group median with NO full-group sort — distributed
    rank selection by histogram routing.

    The classic two-level selection (per the distributed selection
    literature; cf. Spark's own approx_percentile, which trades
    exactness away — unacceptable here because the result must
    value-hash against other engines):

    1. per-group (min, max, n) — one hash aggregation;
    2. assign each row a histogram bucket (affine map is weakly
       monotone under IEEE round-to-nearest, so bucket order respects
       value order) and count rows per (group, bucket) — one hash
       aggregation emitting ≤ ``buckets`` rows per group;
    3. cumulate bucket counts (a window over ≤ ``buckets`` rows per
       group) to find which bucket holds each of the two middle ranks
       ``lo = ceil(n/2)`` and ``hi = floor(n/2)+1``;
    4. re-scan only rows in target buckets, collapse them to DISTINCT
       values with counts (hash aggregation — kills the all-equal-value
       skew case outright), cumulate within the bucket, and pick the
       values covering ranks lo/hi;
    5. median = (value@lo + value@hi) / 2 — for odd n the same value
       covers both ranks and 2v/2 == v exactly (exponent shift).

    The data-proportional work is ONE hash aggregation (the distinct-
    value collapse); everything after runs on the (group, value,
    count) table, whose size is bounded by value cardinality, not row
    count. The only sorts are over ≤ ``buckets`` histogram rows and
    the distinct values inside one bucket. NaN/degenerate ranges fall
    back to bucket 0, which degrades to distinct-value collapse —
    still exact. Tiny-table joins carry no broadcast hint: AQE picks
    broadcast from runtime stats, so the helper is safe for
    high-cardinality groups too.

    Returns one row per group: (key_col, __med__, __n__).
    """
    vc = df.groupBy(key_col, value_col).agg(
        F.count(F.lit(1)).alias("__cnt__")
    )
    return weighted_group_median(vc, key_col, value_col, "__cnt__", buckets)


def weighted_group_median(
    vc: DataFrame,
    key_col: str,
    value_col: str,
    cnt_col: str,
    buckets: int = 1024,
) -> DataFrame:
    """Exact median over a pre-aggregated (group, value, count) table
    — the workhorse behind :func:`exact_group_median`; see its
    docstring for the algorithm. ``vc`` must hold one row per
    (group, value) with a positive count. Returns
    (key_col, __med__, __n__).
    """
    key = F.col(key_col)
    val = F.col(value_col)
    cnt = F.col(cnt_col)
    stats = vc.groupBy(key_col).agg(
        F.min(value_col).alias("__mn__"),
        F.max(value_col).alias("__mx__"),
        F.sum(cnt_col).alias("__n__"),
    )
    width = F.col("__mx__") - F.col("__mn__")
    bid = (
        F.when(
            width > 0,
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(buckets - 1),
                    F.floor(
                        (val - F.col("__mn__")) / width * F.lit(float(buckets))
                    ).cast("int"),
                ),
            ),
        )
        .otherwise(F.lit(0))
    )
    bucketed = vc.join(stats, on=key_col).select(
        key, val, cnt, bid.alias("__b__")
    )
    bc = bucketed.groupBy(key_col, "__b__").agg(
        F.sum(cnt_col).alias("__bc__")
    )
    w_cum = Window.partitionBy(key_col).orderBy("__b__")
    cum = bc.select(
        key,
        F.col("__b__"),
        F.col("__bc__"),
        (F.sum("__bc__").over(w_cum) - F.col("__bc__")).alias("__before__"),
    )
    ranks = stats.select(
        key,
        F.expr("(__n__ + 1) div 2").alias("__lo__"),
        F.expr("__n__ div 2 + 1").alias("__hi__"),
    )
    in_bucket = lambda r: (r > F.col("__before__")) & (  # noqa: E731
        r <= F.col("__before__") + F.col("__bc__")
    )
    targets = (
        cum.join(ranks, on=key_col)
        .filter(in_bucket(F.col("__lo__")) | in_bucket(F.col("__hi__")))
        .select(key, "__b__", "__before__", "__lo__", "__hi__")
    )
    w_val = Window.partitionBy(key_col, "__b__").orderBy(value_col)
    ranked = (
        bucketed.join(targets, on=[key_col, "__b__"])
        .select(
            key,
            val,
            cnt,
            F.col("__lo__"),
            F.col("__hi__"),
            (
                F.col("__before__")
                + F.sum(cnt_col).over(w_val)
                - cnt
            ).alias("__vb__"),
        )
    )
    covers = lambda r: (r > F.col("__vb__")) & (  # noqa: E731
        r <= F.col("__vb__") + cnt
    )
    contrib = ranked.select(
        key,
        (
            F.when(covers(F.col("__lo__")), val).otherwise(F.lit(0.0))
            + F.when(covers(F.col("__hi__")), val).otherwise(F.lit(0.0))
        ).alias("__c__"),
    )
    med = contrib.groupBy(key_col).agg(
        (F.sum("__c__") / F.lit(2.0)).alias("__med__")
    )
    return med.join(stats.select(key, "__n__"), on=key_col)


def mad_outliers(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    k: float = 3.0,
    route: str = "auto",
    distinct_threshold: int = 1_000_000,
    buckets: int = 1024,
) -> DataFrame:
    """Robust per-group outlier profile: exact median, exact MAD
    (median absolute deviation), and the count of values farther than
    ``k * 1.4826 * MAD`` from the median — the standard
    normal-consistent robust z-score gate, immune to the outliers it
    hunts (mean/stddev gates are not).

    Exactness is the point: approximate quantiles differ across
    engines, so both medians come from exact weighted rank selection
    over the distinct-value collapse: a cumulative-count window picks
    the values covering ranks ``ceil(n/2)`` and ``floor(n/2)+1``, and
    the median is their ``sum/2`` (one correctly-rounded double add +
    exponent shift). The deviation threshold compare is a fixed chain
    of correctly-rounded IEEE ops, so the outlier counts — and the q6
    fixed-point outlier fraction — hash identically on any engine.

    Scale contract: the only data-proportional stage is the
    map-side-combinable ``groupBy(key, value)`` collapse, so
    low-cardinality keys (the profiled ``event_type`` has ~5) never
    sort their raw rows anywhere. Everything downstream — both rank
    selections, the MAD, the outlier count — runs in ONE further
    exchange: all windows share the key partitioning and the final
    aggregation reuses it, with the sorts confined to a group's
    DISTINCT values inside its partition. The ceiling is therefore
    value cardinality per group (~10^8 distinct (value, count) pairs
    ≈ 1.6 GB a partition), unbounded for quantized metrics like the
    profiled q2 ``value``. For adversarial groups of continuous
    never-repeating doubles the function AUTO-ROUTES (``route="auto"``,
    the default): a cheap ``approx_count_distinct`` probe per group
    picks the window path below when every group's distinct-value
    count fits one partition (≤ ``distinct_threshold``), and otherwise
    the histogram-selection path of :func:`weighted_group_median`,
    whose per-partition sorts are bounded by ``buckets`` regardless of
    value cardinality. Both paths run the IDENTICAL float arithmetic
    (rank-select + sum/2 + abs + compare), so the routing never
    changes a value — only the plan. ``route="window"`` /
    ``route="histogram"`` force a path (the probe job is skipped).

    Returns (key, n, median, mad, n_outliers, outlier_frac_q6) with
    ``median``/``mad`` rounded to 6dp for display (counts are computed
    on the UNrounded values).
    """
    base = events.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("__k__"), F.col(value_col).alias("__v__")
    )
    # The ONE data-proportional stage: collapse to (key, value, count).
    # All median/MAD/outlier arithmetic runs weighted on this table,
    # whose size is bounded by value cardinality, not row count.
    vc = base.groupBy("__k__", "__v__").agg(
        F.count(F.lit(1)).alias("__cnt__")
    )

    if route not in ("auto", "window", "histogram"):
        raise ValueError(
            f"mad_outliers: route must be auto|window|histogram, got "
            f"{route!r}"
        )
    if route == "auto":
        # routing probe: one narrow map-side-combinable aggregation
        # over the raw rows, collected as a single number. Approximate
        # is fine — the route changes the PLAN, never the answer.
        # NOTE: "auto" EXECUTES this probe job at construction time
        # (routing is a plan decision, and plans are built eagerly) —
        # one extra scan-and-agg pass. Callers that build plans
        # without acting on them, or that know their value shape,
        # should pass route="window"/"histogram" to stay fully lazy.
        # r12: the one-row probe result is served through the session
        # memo (`cached_collect` — the standing bounded-control-relation
        # contract): re-profiling the same immutable input must not
        # re-scan it for a routing constant.
        from ._memo import cached_collect

        rows = cached_collect(
            base.groupBy("__k__")
            .agg(F.approx_count_distinct("__v__").alias("__d__"))
            .agg(F.max("__d__").alias("__m__"))
        )
        probe = rows[0] if rows else None
        max_distinct = (probe["__m__"] if probe is not None else 0) or 0
        route = "histogram" if max_distinct > distinct_threshold else "window"
    if route == "histogram":
        return _mad_outliers_histogram(vc, key_col, k, buckets)

    # Single exchange for everything downstream: every window below
    # partitions by __k__, and the final groupBy("__k__") reuses the
    # same hash partitioning, so Catalyst plans exactly one shuffle
    # after the collapse. The orderBy sorts are IN-partition, over a
    # group's distinct values only.
    w_all = Window.partitionBy("__k__")
    w_cum_v = (
        Window.partitionBy("__k__")
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # group total over the SAME (k, v)-ordered frame as the cumulative
    # sum, so the window exec needs no extra key-only pre-sort pass
    n = F.sum("__cnt__").over(
        Window.partitionBy("__k__")
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    lo = F.expr("(__n__ + 1) div 2")
    hi = F.expr("__n__ div 2 + 1")
    vb = F.sum("__cnt__").over(w_cum_v) - F.col("__cnt__")
    t1 = vc.select(
        "__k__",
        "__v__",
        "__cnt__",
        n.alias("__n__"),
        vb.alias("__vb__"),
    )
    in_span = lambda r: (r > F.col("__vb__")) & (  # noqa: E731
        r <= F.col("__vb__") + F.col("__cnt__")
    )
    c = F.when(in_span(lo), F.col("__v__")).otherwise(F.lit(0.0)) + F.when(
        in_span(hi), F.col("__v__")
    ).otherwise(F.lit(0.0))
    t2 = t1.withColumn(
        "__median__", F.sum(c).over(w_all) / F.lit(2.0)
    ).withColumn("__d__", F.abs(F.col("__v__") - F.col("__median__")))
    # MAD: weighted median of |v - median| — same partitioning, a new
    # in-partition sort by deviation, no new exchange. Ties in __d__
    # (the two sides of the median fold together) are safe: any row
    # order within a tie selects the same deviation value.
    w_cum_d = (
        Window.partitionBy("__k__")
        .orderBy("__d__", "__v__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t3 = t2.withColumn(
        "__db__", F.sum("__cnt__").over(w_cum_d) - F.col("__cnt__")
    )
    d_span = lambda r: (r > F.col("__db__")) & (  # noqa: E731
        r <= F.col("__db__") + F.col("__cnt__")
    )
    dc = F.when(d_span(lo), F.col("__d__")).otherwise(F.lit(0.0)) + F.when(
        d_span(hi), F.col("__d__")
    ).otherwise(F.lit(0.0))
    t4 = t3.withColumn("__madv__", F.sum(dc).over(w_all) / F.lit(2.0))
    thresh = F.col("__madv__") * F.lit(float(k) * 1.4826)
    flagged = t4.groupBy("__k__").agg(
        F.first("__n__").alias("n"),
        F.first("__median__").alias("__median__"),
        F.first("__madv__").alias("__madv__"),
        F.sum(
            F.when(F.col("__d__") > thresh, F.col("__cnt__")).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("n_outliers"),
    )
    return _mad_finalize(flagged, key_col)


def _mad_finalize(flagged: DataFrame, key_col: str) -> DataFrame:
    """Shared output shaping for both :func:`mad_outliers` routes —
    one definition so the routes cannot drift apart."""
    return flagged.select(
        F.col("__k__").alias(key_col),
        F.col("n").cast("long").alias("n"),
        F.round("__median__", 6).alias("median"),
        F.round("__madv__", 6).alias("mad"),
        "n_outliers",
        F.floor(F.col("n_outliers") * F.lit(1000000.0) / F.col("n"))
        .cast("long")
        .alias("outlier_frac_q6"),
    )


def _mad_outliers_histogram(
    vc: DataFrame, key_col: str, k: float, buckets: int
) -> DataFrame:
    """:func:`mad_outliers`' high-cardinality route: both rank
    selections go through :func:`weighted_group_median`'s histogram
    routing, so no partition ever sorts more than one bucket's
    distinct values — the per-group distinct-value ceiling of the
    window route disappears. Identical float arithmetic to the window
    route: (v@lo + v@hi)/2 medians, abs-deviation, one threshold
    compare — so the two routes value-hash identically.
    ``vc`` is the (``__k__``, ``__v__``, ``__cnt__``) collapse.
    """
    med = weighted_group_median(vc, "__k__", "__v__", "__cnt__", buckets)
    dev = vc.join(med, on="__k__").select(
        "__k__",
        "__v__",
        "__cnt__",
        "__n__",
        F.col("__med__").alias("__median__"),
        F.abs(F.col("__v__") - F.col("__med__")).alias("__d__"),
    )
    # MAD = weighted median of |v - median|: collapse equal deviations
    # (the two sides of the median fold together) then rank-select.
    dvc = dev.groupBy("__k__", "__d__").agg(
        F.sum("__cnt__").alias("__dc__")
    )
    mad = weighted_group_median(dvc, "__k__", "__d__", "__dc__", buckets)
    mad = mad.select("__k__", F.col("__med__").alias("__madv__"))
    thresh = F.col("__madv__") * F.lit(float(k) * 1.4826)
    flagged = (
        dev.join(mad, on="__k__")
        .groupBy("__k__")
        .agg(
            F.first("__n__").alias("n"),
            F.first("__median__").alias("__median__"),
            F.first("__madv__").alias("__madv__"),
            F.sum(
                F.when(F.col("__d__") > thresh, F.col("__cnt__")).otherwise(
                    F.lit(0)
                )
            ).cast("long").alias("n_outliers"),
        )
    )
    return _mad_finalize(flagged, key_col)


def _pagerank_literal(
    edges: DataFrame,
    deg_rows: list,
    node_rows: list,
    iterations: int,
    d: int,
) -> DataFrame:
    """:func:`pagerank_nodes`' bounded-|V| fast path: the rank vector
    is exact Python ints on the driver; each power iteration inlines
    the per-source constants ``(d·p(src)) div 100`` and ``out(src)`` as
    a map literal and runs ONE integer aggregation over the (persisted)
    edge table. Python ``//`` and SQL ``div`` agree on the non-negative
    longs involved, so the recurrence is bit-identical to the
    broadcast-join loop's."""
    from ._relation import literal_relation

    spark = edges.sparkSession
    out_w = {str(r[0]): int(r[1]) for r in deg_rows}
    nodes = sorted(str(r[0]) for r in node_rows)
    n_v = len(nodes)
    pr = {v: 10**9 // n_v for v in nodes}
    teleport = ((100 - d) * 10**9) // (100 * n_v)

    def _esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    for _ in range(iterations):
        entries = ", ".join(
            f"'{_esc(src)}', CAST({(d * pr[src]) // 100} AS BIGINT)"
            for src in out_w
        )
        omap = ", ".join(
            f"'{_esc(src)}', CAST({ow} AS BIGINT)"
            for src, ow in out_w.items()
        )
        contrib = F.expr(
            f"(element_at(map({entries}), src) * w)"
            f" div element_at(map({omap}), src)"
        )
        incoming = {
            str(r[0]): int(r[1])
            for r in edges.groupBy("dst")
            .agg(F.sum(contrib).alias("__in__"))
            .collect()
        }
        pr = {v: teleport + incoming.get(v, 0) for v in nodes}
    ranked = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = [
        [node, pr_q9, i + 1] for i, (node, pr_q9) in enumerate(ranked)
    ]
    return literal_relation(spark, rows, ["node", "pr_q9", "rank"])


def pagerank_nodes(
    events: DataFrame,
    iterations: int = 2,
    damping_pct: int = 85,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_literal_nodes: int = 4096,
) -> DataFrame:
    """PageRank over the event-transition graph (nodes = event types,
    edge u→v weighted by how often v follows u in a user's stream) —
    the iterative-algorithm pattern done Spark-first: each power
    iteration is one broadcast join + one aggregation over the edge
    table, with the rank vector staying a (node, rank) DataFrame
    throughout. Web-scale curation pipelines use exactly this loop for
    URL/host authority weighting; here the graph is small but the plan
    is the billion-edge one — edges never leave their partitions, only
    the O(|V|) rank table moves.

    Portability: ranks are q9 fixed-point LONGS and every update is
    integer arithmetic — ``p' = (15·1e9) div (100·N) + Σ_u (85·p(u)·
    w(u,v)) div (100·out(u))`` — so after any number of iterations the
    result hashes identically on any engine (float PageRank would drift
    by summation order). Damping is therefore a percentage, not a
    float. Dangling mass is dropped (standard simplification; rank sums
    to < 1e9, ordering unaffected for connected graphs like this one).

    Returns (node, pr_q9, rank) ordered deterministically.

    Two physical strategies by |V| (same integers either way):

    - ``|V| <= max_literal_nodes`` (event-type graphs, host graphs up
      to a few thousand): the rank vector lives driver-side as exact
      Python ints and each iteration is ONE narrow aggregation over the
      persisted edge table with the per-source constants inlined as a
      map literal — no joins, no broadcast builds, |V| rows collected
      per iteration. This is the centroid-literal pattern: O(|V|)
      build-time state serving a data-sized scan.
    - larger graphs: the broadcast-join loop — each iteration joins the
      edge table against the O(|V|) rank/out-degree frames by
      broadcast; edges still never shuffle.
    """
    from ._memo import _sem_hash, _session_key, cached_collect, plan_memo

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)

    def _build_edges() -> DataFrame:
        e = (
            events.select(
                F.col(type_col).alias("src"),
                F.lead(type_col).over(w).alias("dst"),
            )
            .filter(F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("w"))
        )
        # persisted because 2+iterations reads hang off it (out-deg,
        # one contribution pass per iteration). The cached state is the
        # POST-aggregation (src, dst, w) table — at most |V|² rows, not
        # the event stream — so session-lifetime retention is bytes;
        # the plan memo below hands the SAME persisted frame to every
        # identical call instead of stacking fresh cache entries.
        return e.persist()

    edges = plan_memo(
        (
            "pagerank_edges",
            _session_key(events),
            _sem_hash(events),
            user_col,
            type_col,
            ts_col,
            id_col,
        ),
        _build_edges,
    )
    d = int(damping_pct)
    deg_rows = cached_collect(
        edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    )
    node_rows = cached_collect(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if 0 < len(node_rows) <= int(max_literal_nodes):
        return _pagerank_literal(
            edges, deg_rows, node_rows, int(iterations), d
        )

    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # |V| rides along as a broadcast one-row frame — no collect()
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_v"))
    d = int(damping_pct)
    teleport = F.expr(
        f"(CAST({100 - d} AS BIGINT) * 1000000000) div (100 * n_v)"
    )
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", "n_v", F.expr("(1000000000 div n_v)").alias("pr_q9")
    )
    for _ in range(int(iterations)):
        contrib = (
            edges.join(F.broadcast(ranks), edges["src"] == ranks["node"])
            .join(F.broadcast(out_deg), on="src")
            .select(
                F.col("dst"),
                # ((d·p div 100) · w) div out_w: the intermediate stays
                # ≤ 8.5e8·w instead of 85·p·w — no int64 overflow until
                # w ~ 1e10 (the naive order wrapped at w ~ 1e8, real
                # for billion-edge transition counts). Cost: one extra
                # floor at the 1-in-8.5e8 level, far below q9 noise.
                F.expr(
                    f"(((CAST({d} AS BIGINT) * pr_q9) div 100) * w)"
                    " div out_w"
                ).alias("__c__"),
            )
            .groupBy("dst")
            .agg(F.sum("__c__").alias("__in__"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_nodes))
            .join(F.broadcast(contrib), nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                "n_v",
                (teleport + F.coalesce(F.col("__in__"), F.lit(0)))
                .cast("long")
                .alias("pr_q9"),
            )
        )
    w_rank = Window.orderBy(F.col("pr_q9").desc(), F.col("node").asc())
    return ranks.select(
        "node", "pr_q9", F.row_number().over(w_rank).cast("long").alias("rank")
    )


def top_paths(
    events: DataFrame,
    steps: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k most common ``steps``-long event paths (user-journey
    mining, the n-step generalization of :func:`event_transitions`):
    every window of ``steps`` consecutive events in a user's
    time-ordered stream counts as one path occurrence.

    One lead() window per extra step over the SAME user partition (one
    exchange, one sort — Spark collapses same-spec windows), then a
    path-string count and a global top-k via TakeOrdered (no
    single-partition sort of the full path table; ties broken by the
    path string for determinism). At 100 TB the path cardinality after
    map-side combine is bounded by |event types|^steps, not by rows.

    Returns (path, n, rank) with ``path`` as "a>b>c".
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    cols = [F.col(type_col)]
    for i in range(1, int(steps)):
        cols.append(F.lead(type_col, i).over(w))
    path = F.concat_ws(">", *cols)
    # EVERY component must be non-null: concat_ws silently skips NULLs,
    # so a NULL event_type mid-stream would otherwise count a truncated
    # 2-step string as a complete 3-step path
    complete = None
    for c in cols:
        nn = c.isNotNull()
        complete = nn if complete is None else (complete & nn)
    counted = (
        events.select(path.alias("path"), complete.alias("__complete__"))
        .filter(F.col("__complete__"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counted.orderBy(F.col("n").desc(), F.col("path").asc()).limit(k)
    w_rank = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return top.withColumn("rank", F.row_number().over(w_rank).cast("long"))


def histogram_quantiles(
    df: DataFrame,
    col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    bins: int = 200,
) -> DataFrame:
    """Mergeable DISTRIBUTED quantile estimation: read quantiles off the
    exact equal-width histogram of :func:`value_histogram`.

    ``approxQuantile`` (Greenwald-Khanna) returns its result to the
    DRIVER and its state is opaque; this keeps the sketch as a
    ``bins``-row DataFrame — mergeable by adding counts, storable,
    streamable — and its estimates are DETERMINISTIC (bin lower edges),
    so unlike GK the whole path carries a value-hash oracle. Rank error
    is bounded by the largest single bin (≤ range/bins in value terms);
    for heavy-tailed data raise ``bins`` — the sketch stays tiny.

    Estimate rule: quantile p = the lower edge (q6 fixed-point) of the
    first bin whose cumulative count reaches ``ceil(p·n)``. One
    min/max broadcast + one count aggregate (the histogram) + a
    bins-row cumulative window. Returns (prob_q4, rank_target, est_q6).
    """
    hist = value_histogram(df, col, bins=bins)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin", "lo_q6", F.sum("n").over(w).alias("cum")
    )
    total = hist.agg(F.sum("n").alias("__n__"))
    # ONE plan for all probs: a per-prob union of limit(1) branches
    # would re-run the histogram scan+aggregate once per probability
    # (Spark does not dedupe common subplans across union branches).
    # Instead the probs ride as an inline literal array, the rank
    # target is ceil(p_q4·n/10000) in positive-operand integer form
    # (floor-div and trunc-div engines agree), and each prob picks its
    # first qualifying bin with one min-aggregate.
    p_q4s = sorted({int(round(p * 10000)) for p in probs})
    probs_lit = F.explode(
        F.array(*[F.lit(p).cast("long") for p in p_q4s])
    ).alias("prob_q4")
    targets = total.select(probs_lit, "__n__").select(
        "prob_q4",
        F.expr("CAST((prob_q4 * __n__ + 9999) div 10000 AS BIGINT)").alias(
            "rank_target"
        ),
    )
    picks = (
        cum.crossJoin(F.broadcast(targets))
        .filter(F.col("cum") >= F.col("rank_target"))
        .groupBy("prob_q4", "rank_target")
        # min struct = first qualifying bin, edge carried along so cum
        # is referenced exactly once in the whole plan
        .agg(F.min(F.struct("bin", "lo_q6")).alias("__pick__"))
    )
    return picks.select(
        "prob_q4",
        "rank_target",
        F.col("__pick__.lo_q6").alias("est_q6"),
    )


def position_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    window_hours: int = 24,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Position-weighted (U-shaped) multi-touch attribution: every
    conversion distributes 100% of its credit over the user's
    preceding touches inside ``window_hours`` — 40% to the first
    touch, 40% to the last, 20% split over the middles (the standard
    U-shape; 1 touch takes 100%, 2 touches split 50/50). Last-touch
    and first-touch models are the degenerate window ranks of the
    same plan.

    Credit is INTEGER q4 per touch, with the middle-split remainder
    (20% does not always divide evenly) assigned to the last middle
    touch — deterministic, so each conversion's credits sum to exactly
    10000 and the per-channel totals are engine-portable integers.

    Plan: one user-keyed join pairs conversions with their window's
    touches (bounded by the window, never the user's full history),
    one per-conversion window ranks them, one aggregate sums credit
    per channel. Returns (event_type, n_touches, credit_q4).
    """
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__cu__"),
        F.col(ts_col).alias("__ct__"),
        F.col(id_col).alias("__cid__"),
    )
    touches = events.filter(F.col(type_col) != conversion_type).select(
        F.col(user_col).alias("__tu__"),
        F.col(type_col).alias("channel"),
        F.col(ts_col).alias("__tt__"),
        F.col(id_col).alias("__tid__"),
    )
    win_s = int(window_hours) * 3600
    t_s = F.col("__tt__").cast("timestamp").cast("long")
    c_s = F.col("__ct__").cast("timestamp").cast("long")
    paired = conv.join(
        touches,
        (F.col("__cu__") == F.col("__tu__")),
    ).filter((t_s < c_s) & (c_s - t_s <= win_s))
    w = Window.partitionBy("__cid__").orderBy(
        F.col("__tt__").asc(), F.col("__tid__").asc()
    )
    wn = Window.partitionBy("__cid__")
    ranked = paired.select(
        "__cid__",
        "channel",
        F.row_number().over(w).alias("__r__"),
        F.count(F.lit(1)).over(wn).alias("__n__"),
    )
    n, r = F.col("__n__"), F.col("__r__")
    mid_each = F.expr("2000 div (__n__ - 2)")
    mid_rem = F.lit(2000) - (n - 2) * mid_each
    weight = (
        F.when(n == 1, F.lit(10000))
        .when(n == 2, F.lit(5000))
        .when(r == 1, F.lit(4000))
        .when(r == n, F.lit(4000))
        .when(r == n - 1, mid_each + mid_rem)  # last middle absorbs
        .otherwise(mid_each)
    )
    return (
        ranked.select("channel", weight.cast("long").alias("__w__"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("__w__").cast("long").alias("credit_q4"),
        )
        .select(
            F.col("channel").alias("event_type"), "n_touches", "credit_q4"
        )
    )


def _transition_edges(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """DISTINCT undirected event-transition edges (u, v) with
    u < v — the shared graph construction of :func:`triangle_counts`,
    :func:`degree_assortativity`, :func:`clustering_coefficient` and
    :func:`k_core`: per-user consecutive event-type pairs under
    (ts, id) order, self-loops dropped, undirected-deduped."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    raw = (
        events.select(
            F.col(type_col).alias("__a__"),
            F.lead(type_col).over(w).alias("__b__"),
        )
        .filter(F.col("__b__").isNotNull() & (F.col("__a__") != F.col("__b__")))
    )
    return raw.select(
        F.least("__a__", "__b__").alias("u"),
        F.greatest("__a__", "__b__").alias("v"),
    ).distinct()


def triangle_counts(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-node triangle counts over the undirected event-transition
    graph — the degree-ordered node-iterator (Schank & Wagner 2005; the
    distributed formulation of Suri & Vassilvitskii 2011): orient every
    undirected edge from its lower-rank endpoint under the total order
    (degree asc, node asc), join wedges out of each source, and close
    them against the oriented edge set. Orientation bounds the wedge
    fan-out by the oriented out-degree — O(sqrt(m)) for any graph — so
    the join never enumerates the quadratic neighborhood of a hub node,
    which is the classic skew failure of naive triangle joins.

    Plan: one window pass builds transitions, a distinct-edge
    aggregation and a |V|-row degree rank (tiny global window), then
    two joins on node keys with the rank table attached by broadcast-
    sized join. Each triangle is found exactly once and credited to
    all three corners. Returns (node, n_triangles), nodes with zero
    triangles included.
    """
    # persisted: three consumers (degrees, orientation, and the final
    # zero-count join) would otherwise each re-run the transition
    # window + distinct — at billion-edge scale that triples the
    # dominant cost (ContextCleaner frees it with the plan)
    und = _transition_edges(
        events, user_col, type_col, ts_col, id_col
    ).persist()
    counts, _ = _triangles_and_degrees(und)
    return counts


def _triangles_and_degrees(und: DataFrame):
    """Degree-ordered triangle counting over a PERSISTED distinct
    undirected edge set — the shared core of :func:`triangle_counts`
    and :func:`clustering_coefficient` (which needs the degree table
    too and must not rebuild the edge set a second time). Returns
    ``(counts_df, deg_df)`` where counts is (node, n_triangles) with
    zero-triangle nodes included and deg is (node, __d__)."""
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("__d__"))
    )
    # total order (degree asc, node asc) as a rank — |V| rows through a
    # single-partition window, fine for any real vertex-TYPE graph; for
    # billion-node ID graphs swap in zipWithIndex on the sorted ids
    w_rank = Window.orderBy(F.col("__d__").asc(), F.col("node").asc())
    rank = deg.select(
        "node", F.row_number().over(w_rank).alias("__r__")
    )
    ru = rank.select(F.col("node").alias("u"), F.col("__r__").alias("__ru__"))
    rv = rank.select(F.col("node").alias("v"), F.col("__r__").alias("__rv__"))
    # also persisted: the wedge join reads it twice and the closing
    # join a third time
    oriented = (
        und.join(ru, on="u")
        .join(rv, on="v")
        .select(
            F.when(F.col("__ru__") < F.col("__rv__"), F.col("u"))
            .otherwise(F.col("v"))
            .alias("src"),
            F.when(F.col("__ru__") < F.col("__rv__"), F.col("v"))
            .otherwise(F.col("u"))
            .alias("dst"),
            F.least("__ru__", "__rv__").alias("__rs__"),
            F.greatest("__ru__", "__rv__").alias("__rd__"),
        )
        .persist()
    )
    e1 = oriented.select(
        F.col("src"), F.col("dst").alias("y"), F.col("__rd__").alias("__ry__")
    )
    e2 = oriented.select(
        F.col("src"), F.col("dst").alias("z"), F.col("__rd__").alias("__rz__")
    )
    wedges = e1.join(e2, on="src").filter(F.col("__ry__") < F.col("__rz__"))
    closing = oriented.select(
        F.col("src").alias("y"), F.col("dst").alias("z")
    )
    tri = wedges.join(closing, on=["y", "z"]).select(
        F.col("src").alias("x"), "y", "z"
    )
    corners = tri.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    counts = corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    out = (
        deg.select("node")
        .join(counts, on="node", how="left")
        .select(
            "node",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
        )
    )
    return out, deg


def exact_group_quantiles(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    probs_pct: Sequence[int] = (25, 50, 75, 99),
) -> DataFrame:
    """EXACT per-group quantiles at arbitrary integer percentiles —
    nearest-rank (type-1) definition: the value whose cumulative count
    first reaches ``ceil(p/100 · n)``. The exact complement to the
    mergeable-but-approximate paths (:func:`histogram_quantiles`, the
    GK sketch): approximate quantiles differ across engines and
    parameterizations, while the type-1 rank value is a single exact
    row — so this output carries a cross-engine value hash.

    Same physical shape as :func:`mad_outliers`' median: ONE
    data-proportional hash-agg collapse to (key, value, count), then
    one key exchange where a cumulative window routes every requested
    rank; the per-partition sort touches a group's DISTINCT values
    only, so the ceiling is value cardinality, not row count. All rank
    arithmetic is integer (``ceil(p·n/100) = (p·n + 99) div 100``).

    Returns (key, p_pct, q_value) — one row per (group, percentile).
    """
    probs = sorted({int(p) for p in probs_pct})
    if not probs or probs[0] < 1 or probs[-1] > 100:
        raise ValueError(
            "exact_group_quantiles: probs_pct must be ints in [1, 100]"
        )
    base = events.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("__k__"), F.col(value_col).alias("__v__")
    )
    vc = base.groupBy("__k__", "__v__").agg(
        F.count(F.lit(1)).alias("__cnt__")
    )
    w_ord = (
        Window.partitionBy("__k__")
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_n = (
        Window.partitionBy("__k__")
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    t = vc.select(
        "__k__",
        "__v__",
        "__cnt__",
        (F.sum("__cnt__").over(w_ord) - F.col("__cnt__")).alias("__vb__"),
        F.sum("__cnt__").over(w_n).alias("__n__"),
    )
    # a distinct value serves percentile p iff its cumulative span
    # (vb, vb+cnt] covers rank ceil(p·n/100); emit one row per served p
    served = F.filter(
        F.array(*[F.lit(p) for p in probs]),
        lambda p: (
            ((p * F.col("__n__") + 99) / 100).cast("long") > F.col("__vb__")
        )
        & (
            ((p * F.col("__n__") + 99) / 100).cast("long")
            <= F.col("__vb__") + F.col("__cnt__")
        ),
    )
    return (
        t.select(
            F.col("__k__").alias(key_col),
            F.explode(served).alias("p_pct"),
            F.col("__v__").alias("q_value"),
        )
        .select(key_col, F.col("p_pct").cast("long"), "q_value")
    )


def basket_rules(
    events: DataFrame,
    basket_col: str = "user_id",
    item_col: str = "event_type",
    min_pair_support: int = 2,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Pairwise association rules over (basket, item) co-occurrence —
    the k=2 frequent-itemset core of market-basket analysis (Agrawal &
    Srikant 1994), emitted with the three standard rule metrics:
    support P(a,b), confidence P(b|a), and lift P(a,b)/(P(a)P(b)).
    Over an event log, baskets are users and items event types or
    property values; rules surface "users who do X also do Y" structure
    for recommendation, funnel design, and anomaly triage.

    Plan shape: the item stream collapses to DISTINCT (basket, item)
    map-side before any shuffle; item supports are one hash aggregate;
    candidate pairs come from a self-join ON THE BASKET KEY — fan-out
    is per-basket item cardinality squared, never corpus², and
    ``max_basket_items`` (drop baskets above the cap, the standard
    degenerate-basket guard — a basket holding every item relates
    nothing) bounds the worst basket when item cardinality is high.
    Basket count rides as a one-row broadcast frame. Both rule
    directions are emitted (confidence/lift are asymmetric in a, b...
    lift is symmetric; confidence is not).

    All metrics are exact integer fixed-point: support_q6 =
    n_ab·1e6 div n_baskets, confidence_q6 = n_ab·1e6 div n_a, and
    lift_q6 = (n_ab·1e6 div n_a)·n_baskets div n_b — the FLOOR-
    COMPOSED lift, i.e. confidence_q6 scaled by n_baskets/n_b. It can
    sit up to ~n_baskets/n_b q6 units below the single-floor
    ``n_ab·n_baskets·1e6 div (n_a·n_b)``; the composed form is used
    because that single-floor numerator overflows BIGINT once
    n_ab·n_baskets exceeds ~9.2e12 (Spark non-ANSI wraps silently,
    DuckDB errors), while the composed intermediates are bounded by
    1e6·n_baskets. Engine-portable with no float anywhere. Returns
    (antecedent, consequent, n_ab, n_a, n_b, n_baskets, support_q6,
    confidence_q6, lift_q6).
    """
    if int(min_pair_support) < 1:
        raise ValueError("basket_rules: min_pair_support must be >= 1")
    # four consumers (basket count, item supports, both self-join
    # sides) read the distinct (basket, item) table; persist so the
    # distinct collapse runs once, not once per branch
    bi = (
        events.filter(
            F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(
            F.col(basket_col).alias("__b__"), F.col(item_col).alias("__i__")
        )
        .distinct()
        .persist()
    )
    if max_basket_items is not None:
        sizes = bi.groupBy("__b__").agg(F.count(F.lit(1)).alias("__bn__"))
        bi = bi.join(
            sizes.filter(F.col("__bn__") <= int(max_basket_items)).select(
                "__b__"
            ),
            on="__b__",
        )
    n_baskets = bi.select("__b__").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("__nb__")
    )
    item_n = bi.groupBy("__i__").agg(
        F.count(F.lit(1)).cast("long").alias("__n__")
    )
    pairs = (
        bi.alias("a")
        .join(
            bi.alias("b"),
            (F.col("a.__b__") == F.col("b.__b__"))
            & (F.col("a.__i__") < F.col("b.__i__")),
        )
        .groupBy(
            F.col("a.__i__").alias("__ia__"), F.col("b.__i__").alias("__ib__")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_pair_support))
        .persist()  # read twice: once per rule direction
    )
    # both rule directions from each unordered pair
    directed = pairs.select(
        F.col("__ia__").alias("antecedent"),
        F.col("__ib__").alias("consequent"),
        "n_ab",
    ).unionByName(
        pairs.select(
            F.col("__ib__").alias("antecedent"),
            F.col("__ia__").alias("consequent"),
            "n_ab",
        )
    )
    na = item_n.select(
        F.col("__i__").alias("antecedent"), F.col("__n__").alias("n_a")
    )
    nb = item_n.select(
        F.col("__i__").alias("consequent"), F.col("__n__").alias("n_b")
    )
    return (
        directed.join(F.broadcast(na), on="antecedent")
        .join(F.broadcast(nb), on="consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            "n_a",
            "n_b",
            F.col("__nb__").alias("n_baskets"),
            F.expr("CAST(n_ab * 1000000 div __nb__ AS BIGINT)").alias(
                "support_q6"
            ),
            F.expr("CAST(n_ab * 1000000 div n_a AS BIGINT)").alias(
                "confidence_q6"
            ),
            # divide before the final multiply: the naive
            # n_ab*n_baskets*1e6 numerator overflows BIGINT (and Spark
            # non-ANSI mode wraps silently where DuckDB errors) once
            # n_ab*n_baskets exceeds ~9.2e12 — realistic at corpus
            # scale. (n_ab*1e6 div n_a) is bounded by 1e6, so the
            # rearranged intermediate only overflows past ~9.2e12
            # BASKETS. All operands are non-negative counts, so div
            # (truncation) == floor on both engines.
            F.expr(
                "CAST((n_ab * 1000000 div n_a) * __nb__ div n_b AS BIGINT)"
            ).alias("lift_q6"),
        )
    )


def winsorize(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-group winsorization: clip each value to its group's exact
    [lo_pct, hi_pct] nearest-rank percentile band — the standard
    robust pre-scaling step before averaging, trend fitting, or
    feature normalization on heavy-tailed telemetry (a handful of
    pathological values otherwise own the mean; dropping them biases,
    clipping bounds).

    Percentiles are the EXACT type-1 (nearest-rank) values from
    :func:`exact_group_quantiles` — approximate quantiles differ
    across engines, exact ranks hash identically — so the clip bounds
    and therefore every output row are engine-portable with no
    tolerance.

    Plan shape: the bounds table is one (key, value-cardinality)
    aggregate + rank-routing window (exact_group_quantiles' shape, per
    -partition sorts bounded by DISTINCT value cardinality), then ONE
    broadcast join back onto the row stream — the data pays no extra
    exchange beyond its scan, and the group-count of bounds rows is
    what broadcasts. Returns the input rows plus
    (value_clipped, was_clipped_lo, was_clipped_hi).
    """
    lo, hi = int(lo_pct), int(hi_pct)
    if not 1 <= lo < hi <= 100:
        raise ValueError("winsorize: need 1 <= lo_pct < hi_pct <= 100")
    q = exact_group_quantiles(
        events, key_col=key_col, value_col=value_col, probs_pct=(lo, hi)
    )
    bounds = (
        q.groupBy(key_col)
        .pivot("p_pct", [lo, hi])
        .agg(F.first("q_value"))
        .select(
            F.col(key_col),
            F.col(str(lo)).alias("__lo__"),
            F.col(str(hi)).alias("__hi__"),
        )
    )
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("__lo__")), F.col("__hi__")
    )
    return (
        events.join(F.broadcast(bounds), on=key_col, how="left")
        .withColumn(
            "value_clipped",
            F.when(F.col(value_col).isNotNull(), clipped),
        )
        .withColumn(
            "was_clipped_lo",
            (F.col(value_col) < F.col("__lo__")).cast("boolean"),
        )
        .withColumn(
            "was_clipped_hi",
            (F.col(value_col) > F.col("__hi__")).cast("boolean"),
        )
        .drop("__lo__", "__hi__")
    )


def degree_assortativity(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Degree assortativity of the undirected event-transition graph
    (Newman 2002): the Pearson correlation of endpoint degrees over
    edge ends. Positive → hubs link to hubs (assortative, social-style
    mixing); negative → hubs link to leaves (disassortative, the usual
    shape of dependency/interaction graphs). One scalar that
    fingerprints graph topology drift between ingests.

    Same edge construction as :func:`triangle_counts` (per-user
    transition pairs → distinct undirected edges); every undirected
    edge contributes BOTH ordered ends, which is what makes the
    statistic symmetric.

    Cross-engine discipline: degrees are integers, so every Pearson
    component (n, Σx, Σx², Σxy) is an EXACT order-independent integer
    sum; the final r is one mirrored double expression over those
    integers — bit-identical on any engine, the :func:`corr_matrix`
    recipe with no fixed-point quantization needed at all. Returns one
    row (n_nodes, n_edges, assortativity); NULL assortativity for a
    degree-regular graph (zero variance).

    Plan: one transition window + distinct-edge aggregate (persisted:
    degrees and the component sum both read it), a degree aggregate,
    two broadcast joins of the |V|-row degree table onto the edge
    list, one scalar aggregate. Edges shuffle once, nothing quadratic.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    raw = (
        events.select(
            F.col(type_col).alias("__a__"),
            F.lead(type_col).over(w).alias("__b__"),
        )
        .filter(
            F.col("__b__").isNotNull() & (F.col("__a__") != F.col("__b__"))
        )
    )
    und = raw.select(
        F.least("__a__", "__b__").alias("u"),
        F.greatest("__a__", "__b__").alias("v"),
    ).distinct()
    return edge_assortativity(und, u_col="u", v_col="v")


def edge_assortativity(
    edges: DataFrame, u_col: str = "u", v_col: str = "v"
) -> DataFrame:
    """Core of :func:`degree_assortativity` on an explicit undirected
    edge list (one row per edge, any orientation; duplicates and
    self-loops are removed here). Use directly for graphs that do not
    come from event transitions — bipartite user-item incidence,
    kNN-graph audits, dependency graphs.
    """
    und = (
        edges.filter(
            F.col(u_col).isNotNull()
            & F.col(v_col).isNotNull()
            & (F.col(u_col) != F.col(v_col))
        )
        .select(
            F.least(u_col, v_col).alias("u"),
            F.greatest(u_col, v_col).alias("v"),
        )
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("__d__"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("__d__").alias("__du__"))
    dv = deg.select(F.col("node").alias("v"), F.col("__d__").alias("__dv__"))
    ends0 = (
        und.join(F.broadcast(du), on="u")
        .join(F.broadcast(dv), on="v")
        .select(F.col("__du__").alias("x"), F.col("__dv__").alias("y"))
    )
    # each undirected edge contributes BOTH ordered ends; instead of
    # materializing the doubled list (a union that replays the edge
    # subtree), fold the symmetry into the aggregate: over ordered
    # ends, n = 2m, Σx = Σ(x+y), Σx² = Σ(x²+y²), Σxy = 2·Σxy₀ — one
    # pass over m rows, identical integers
    comp = ends0.agg(
        F.count(F.lit(1)).cast("long").alias("__m__"),
        F.sum(F.col("x") + F.col("y")).cast("long").alias("__sx__"),
        F.sum(F.col("x") * F.col("x") + F.col("y") * F.col("y"))
        .cast("long")
        .alias("__sxx__"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("__sxy0__"),
    )
    nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    # r = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)  — x and y are the same
    # multiset (both edge ends), so Σy = Σx and Σy² = Σx²: the
    # denominator collapses to the variance term and the whole
    # expression is one double division over exact integers
    n = F.lit(2).cast("long") * F.col("__m__")
    num = (
        n * (F.lit(2).cast("long") * F.col("__sxy0__"))
        - F.col("__sx__") * F.col("__sx__")
    ).cast("double")
    den = (
        n * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__")
    ).cast("double")
    return (
        comp.crossJoin(F.broadcast(nodes))
        .select(
            "n_nodes",
            F.col("__m__").alias("n_edges"),
            F.when(den != 0.0, F.round(num / den, 6)).alias("assortativity"),
        )
    )


def markov_next_event_eval(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Train/eval a first-order Markov next-event predictor on the
    event stream: transition counts from the FIRST time half predict
    argmax next-type; accuracy is measured on the second half — the
    standard backtest for "is user behavior stable enough for a
    sequence model", and a drift alarm when a previously-accurate
    matrix decays (cf. :func:`event_transitions`, which reports the
    matrix itself without the predictive-quality readout).

    Split point = midpoint of the observed time range, computed as
    exact epoch-microsecond integer arithmetic from ONE broadcast
    min/max row (the :func:`distribution_drift` recipe); a transition
    belongs to the half containing its FIRST event. Self-transitions
    count (predicting "another page view" is a real prediction).
    Prediction ties break (count desc, type asc) — fully
    deterministic. Accuracy is exact integer q6. Returns per type:
    (event_type, predicted_next, n_train, n_eval, n_correct,
    accuracy_q6); types never seen in training carry NULL predictions
    and zero correct.

    Plan: one user-keyed transition window feeds both halves; train
    counts are a tiny (|types|²) aggregate whose argmax window runs on
    the aggregated table; the eval half joins the broadcast prediction
    table. Nothing beyond the one user exchange touches raw rows.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(type_col).alias("__a__"),
            F.lead(type_col).over(w).alias("__b__"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us__"),
        )
        .filter(F.col("__b__").isNotNull())
        .persist()  # train and eval branches both read the pairs
    )
    bounds = events.agg(
        F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("__lo__"),
        F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("__hi__"),
    )
    mid = F.expr("CAST((__lo__ + __hi__) div 2 AS BIGINT)")
    tagged = pairs.crossJoin(F.broadcast(bounds)).withColumn(
        "__train__", F.col("__us__") < mid
    )
    train = (
        tagged.filter(F.col("__train__"))
        .groupBy("__a__", "__b__")
        .agg(F.count(F.lit(1)).cast("long").alias("__n__"))
    )
    w_pred = Window.partitionBy("__a__").orderBy(
        F.col("__n__").desc(), F.col("__b__")
    )
    pred = (
        train.withColumn("__rk__", F.row_number().over(w_pred))
        .filter(F.col("__rk__") == 1)
        .select(
            F.col("__a__"),
            F.col("__b__").alias("predicted_next"),
        )
    )
    n_train = train.groupBy("__a__").agg(
        F.sum("__n__").cast("long").alias("n_train")
    )
    ev = tagged.filter(~F.col("__train__"))
    out = (
        ev.join(F.broadcast(pred), on="__a__", how="left")
        .join(F.broadcast(n_train), on="__a__", how="left")
        .groupBy("__a__", "predicted_next")
        .agg(
            F.first("n_train").alias("__nt__"),
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum(
                F.when(F.col("__b__") == F.col("predicted_next"), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_correct"),
        )
    )
    return out.select(
        F.col("__a__").alias(type_col),
        "predicted_next",
        F.coalesce("__nt__", F.lit(0).cast("long")).alias("n_train"),
        "n_eval",
        "n_correct",
        F.expr("CAST(n_correct * 1000000 div n_eval AS BIGINT)").alias(
            "accuracy_q6"
        ),
    )


def markov_attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    iterations: int = 10,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Data-driven (Markov removal-effect) multi-touch attribution:
    model user journeys as a first-order Markov chain over channels
    with CONV / NULL absorbing states, estimate P(conversion) by
    iterating the absorption recurrence, and credit each channel by
    how much P(conversion) DROPS when that channel is removed — the
    standard alternative to positional rules
    (:func:`position_attribution`'s U-shape) that lets the data, not a
    40/20/40 convention, set the weights.

    Journey semantics: each user's events in (ts, id) order up to and
    including their FIRST ``conv_type`` event (later events don't
    influence an already-won conversion); a synthetic START precedes
    the first touch; non-converting journeys absorb into NULL at their
    last event. Removing channel c redirects every visit to c into
    NULL (the Anderl et al. 2014 formulation). The reserved state
    names START/CONV/NULL must not collide with real channel names.

    Exactness: the absorption recurrence runs in q9 integer fixed
    point — v'(s) = (Σ_dst n(s,dst)·val(dst)) div n_out(s) with
    val(CONV) = 1e9 — so ``iterations`` steps are bit-reproducible on
    any engine (the :func:`pagerank_nodes` discipline; the oracle
    unrolls the same recurrence relationally). Monotone convergence:
    each iteration only adds newly-reachable conversion mass, and 10
    iterations bound journeys of 10 hops.

    Plan: the distributed work is the journey construction — one user
    exchange for the windows, one tiny (|channels|+2)² transition
    aggregate. The chain solves run on that collected matrix as exact
    Python ints (bounded like pagerank's |V|-literal path: channels
    are event TYPES, not users) and return as a literal relation.
    Returns per channel: (channel, p_removed_q9, p_full_q9,
    removal_effect_q6, attribution_q6), NULL effects when no
    conversions exist.
    """
    if iterations < 1:
        raise ValueError("markov_attribution: iterations must be >= 1")
    from ._relation import literal_relation

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    rn = events.select(
        F.col(user_col).alias("__u__"),
        F.col(type_col).alias("__t__"),
        F.row_number().over(w).alias("__rn__"),
    )
    crn = (
        rn.filter(F.col("__t__") == conv_type)
        .groupBy("__u__")
        .agg(F.min("__rn__").alias("__crn__"))
    )
    kept = (
        rn.join(crn, on="__u__", how="left")
        .filter(F.col("__crn__").isNull() | (F.col("__rn__") <= F.col("__crn__")))
        .select(
            "__u__",
            F.when(F.col("__t__") == conv_type, F.lit("CONV"))
            .otherwise(F.col("__t__"))
            .alias("__m__"),
            "__rn__",
        )
    )
    w2 = Window.partitionBy("__u__").orderBy("__rn__")
    seq = kept.withColumn("__nxt__", F.lead("__m__").over(w2))
    trans = (
        seq.filter(F.col("__rn__") == 1)
        .select(F.lit("START").alias("src"), F.col("__m__").alias("dst"))
        .unionByName(
            seq.filter(F.col("__nxt__").isNotNull()).select(
                F.col("__m__").alias("src"), F.col("__nxt__").alias("dst")
            )
        )
        .unionByName(
            seq.filter(
                F.col("__nxt__").isNull() & (F.col("__m__") != "CONV")
            ).select(
                F.col("__m__").alias("src"), F.lit("NULL").alias("dst")
            )
        )
    )
    edges = [
        (str(r["src"]), str(r["dst"]), int(r["n"]))
        for r in trans.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # bounded: (|channels|+2)² rows
    ]
    n_out: dict[str, int] = {}
    for s, _, n in edges:
        n_out[s] = n_out.get(s, 0) + n
    states = sorted(n_out)
    channels = [s for s in states if s != "START"]
    Q9 = 10**9

    def _solve(rm: str | None) -> int:
        v = {s: 0 for s in states}
        for _ in range(int(iterations)):
            nv = {}
            for s in states:
                if s == rm:
                    nv[s] = 0
                    continue
                acc = 0
                for src, dst, n in edges:
                    if src != s:
                        continue
                    if dst == "CONV":
                        val = Q9
                    elif dst == "NULL" or dst == rm:
                        val = 0
                    else:
                        val = v.get(dst, 0)
                    acc += n * val
                nv[s] = acc // n_out[s]
            v = nv
        return v.get("START", 0)

    p_full = _solve(None)
    p_rm = {c: _solve(c) for c in channels}
    re = {c: max(p_full - p_rm[c], 0) for c in channels}
    tot = sum(re.values())
    rows = []
    for c in channels:
        rows.append(
            [
                c,
                p_rm[c],
                p_full,
                (re[c] * 1_000_000) // p_full if p_full > 0 else None,
                (re[c] * 1_000_000) // tot if tot > 0 else None,
            ]
        )
    if not rows:
        rows = [["__none__", 0, p_full, None, None]]
    return literal_relation(
        events.sparkSession,
        rows,
        ["channel", "p_removed_q9", "p_full_q9", "removal_effect_q6",
         "attribution_q6"],
    )


def seasonal_anomalies(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    spike_factor_pct: int = 200,
    drop_factor_pct: int = 50,
) -> DataFrame:
    """Seasonal-baseline anomaly cells: bucket the stream into
    (type, day, hour) counts on a COMPLETE grid, build each
    (type, weekday, hour) slot's baseline from all same-slot cells,
    and flag cells running above ``spike_factor_pct``% or below
    ``drop_factor_pct``% of their slot baseline. Weekday-hour
    seasonality is the first-order structure of any human-driven
    stream; a plain global threshold (:func:`rate_spikes`) pages on
    every Monday morning and misses a silent Saturday night — the
    seasonal profile is the fix, and the empty-cell handling is the
    point: a zero-event hour in a normally-busy slot IS the incident.

    All-integer discipline: the flags compare
    ``n·slot_cells·100 vs factor·slot_sum`` — cross-multiplied
    integers, no division anywhere, hash-identical on any engine.
    Weekday is computed as ``(days_since_epoch + 4) mod 7``
    (0 = Sunday) rather than an engine weekday function — Spark and
    DuckDB disagree on weekday numbering conventions, epoch-day
    arithmetic they agree on.

    Plan: the grid (types × days × 24) comes from one broadcast
    min/max row + sequence explodes (the :func:`cusum_changepoints`
    recipe) — bounded by span, not rows; counts are one hash
    aggregate; the slot baseline is a window over the grid keyed by
    (type, dow, hour). Returns only the anomalous cells:
    (event_type, day, hour, n, slot_dow, slot_sum, slot_cells,
    is_spike, is_drop).
    """
    if not (spike_factor_pct > 100 and 0 < drop_factor_pct < 100):
        raise ValueError(
            "seasonal_anomalies: need spike_factor_pct > 100 and"
            " 0 < drop_factor_pct < 100"
        )
    ts = F.col(ts_col).cast("timestamp")
    base = events.select(
        F.col(type_col).alias("__t__"),
        F.to_date(ts).alias("__d__"),
        F.hour(ts).alias("__h__"),
    )
    bounds = base.agg(
        F.min("__d__").alias("__lo__"), F.max("__d__").alias("__hi__")
    )
    types = base.select("__t__").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "__t__",
            F.explode(F.expr("sequence(__lo__, __hi__)")).alias("__d__"),
        )
        .select(
            "__t__",
            "__d__",
            F.explode(F.expr("sequence(0, 23)")).alias("__h__"),
        )
    )
    counts = base.groupBy("__t__", "__d__", "__h__").agg(
        F.count(F.lit(1)).cast("long").alias("__n__")
    )
    cells = grid.join(counts, on=["__t__", "__d__", "__h__"], how="left").select(
        "__t__",
        "__d__",
        "__h__",
        F.coalesce("__n__", F.lit(0).cast("long")).alias("__n__"),
        (
            (F.datediff(F.col("__d__"), F.lit("1970-01-01").cast("date"))
             + F.lit(4)) % 7
        ).cast("long").alias("__dow__"),
    )
    w_slot = Window.partitionBy("__t__", "__dow__", "__h__")
    slotted = cells.select(
        "__t__",
        "__d__",
        "__h__",
        "__n__",
        "__dow__",
        F.sum("__n__").over(w_slot).cast("long").alias("__ss__"),
        F.count(F.lit(1)).over(w_slot).cast("long").alias("__sc__"),
    )
    spike = (
        F.col("__n__") * F.col("__sc__") * F.lit(100)
        > F.lit(int(spike_factor_pct)) * F.col("__ss__")
    )
    drop = (
        F.col("__n__") * F.col("__sc__") * F.lit(100)
        < F.lit(int(drop_factor_pct)) * F.col("__ss__")
    )
    return (
        slotted.filter(spike | drop)
        .select(
            F.col("__t__").alias(type_col),
            F.date_format("__d__", "yyyy-MM-dd").alias("day"),
            F.col("__h__").cast("long").alias("hour"),
            F.col("__n__").alias("n"),
            F.col("__dow__").alias("slot_dow"),
            F.col("__ss__").alias("slot_sum"),
            F.col("__sc__").alias("slot_cells"),
            spike.alias("is_spike"),
            drop.alias("is_drop"),
        )
    )


def funnel_within(
    events: DataFrame,
    steps: Sequence[str] = ("click", "view", "purchase"),
    within_seconds: int = 3600,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-bounded ordered funnel: step i counts only if it happens
    within ``within_seconds`` of the user's step i-1 completion — the
    "purchased within an hour of clicking" formulation every product
    funnel actually uses (:func:`funnel_conversion` is the unbounded
    special case; without the bound, a purchase three months after a
    click still "converts", which overstates every step).

    Semantics — anchored greedy, stated precisely: step i anchors on
    the user's EARLIEST qualifying completion of step i-1. A user
    whose first click's window expires but who re-clicks later and
    converts from the re-entry is NOT counted ("strict first-touch"
    funnel products behave this way). The alternative
    exists-any-chain semantics needs per-event dynamic matching; for
    the UNBOUNDED funnel the two coincide (earliest completion is
    optimal by exchange argument), which is why
    :func:`funnel_conversion` needs no such caveat.

    Same physical shape as the unbounded funnel: chained
    conditional-min window aggregates over ONE user-key exchange —
    step i's condition references step i-1's window result, Catalyst
    evaluates the chain over the same partition, no self-joins. The
    time bound compares exact epoch microseconds
    (``unix_micros(ts) ≤ unix_micros(prev) + within·1e6`` — integer
    arithmetic both engines agree on). Output: one row per step with
    (step, step_name, n_users, conversion_q6), conversion as an exact
    integer q6 share of step-1 entrants.
    """
    if int(within_seconds) < 1:
        raise ValueError("funnel_within: within_seconds must be >= 1")
    bound_us = int(within_seconds) * 1_000_000
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = (
                cond
                & (F.col(ts_col) >= prev)
                & (
                    F.unix_micros(F.col(ts_col).cast("timestamp"))
                    <= F.unix_micros(prev.cast("timestamp"))
                    + F.lit(bound_us)
                )
            )
        df = df.withColumn(
            f"__t{i}__", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = F.col(f"__t{i}__")
    per_user = df.groupBy(user_col).agg(
        *[F.max(f"__t{i}__").alias(f"t{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[
            F.coalesce(
                F.sum(F.col(f"t{i}").isNotNull().cast("long")), F.lit(0)
            ).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    rows = [
        F.struct(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(step).alias("step_name"),
            F.col(f"n{i}").alias("n_users"),
            F.when(
                F.col("n0") > 0,
                F.expr(f"CAST(n{i} * 1000000 div n0 AS BIGINT)"),
            ).alias("conversion_q6"),
        )
        for i, step in enumerate(steps)
    ]
    return counts.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.step", "r.step_name", "r.n_users", "r.conversion_q6")


def silence_streaks(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Longest silent streak per event type, in hours, over the
    COMPLETE hour grid of the observed time range — the
    outage/ingest-gap detector: event-driven gap analysis (lag over
    observed events) cannot tell "no events for 30 hours" from "table
    ends here", and sorting raw events per type to find gaps pays an
    event-scale sort. The grid formulation works on hour CELLS: empty
    cells are first-class rows, streaks are gaps-and-islands runs over
    the cell index, and everything is span-bounded, never row-bounded.

    Cell index = ``days_since_epoch·24 + hour`` — an absolute integer,
    so run grouping needs no pre-window; the classic
    ``idx − row_number()`` trick groups consecutive empty cells into
    streaks. Returns per type: (event_type, n_cells,
    n_silent_cells, max_silent_hours) — types with no silent cell
    report 0.

    Plan: one (type, day, hour) count aggregate joined onto the
    types × broadcast-bounds sequence grid (the
    :func:`seasonal_anomalies` recipe), one row_number window over the
    type partition's EMPTY cells only, one aggregate. All integers.
    """
    ts = F.col(ts_col).cast("timestamp")
    base = events.select(
        F.col(type_col).alias("__t__"),
        F.to_date(ts).alias("__d__"),
        F.hour(ts).alias("__h__"),
    )
    bounds = base.agg(
        F.min("__d__").alias("__lo__"), F.max("__d__").alias("__hi__")
    )
    types = base.select("__t__").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "__t__",
            F.explode(F.expr("sequence(__lo__, __hi__)")).alias("__d__"),
        )
        .select(
            "__t__",
            "__d__",
            F.explode(F.expr("sequence(0, 23)")).alias("__h__"),
        )
    )
    counts = base.groupBy("__t__", "__d__", "__h__").agg(
        F.count(F.lit(1)).cast("long").alias("__n__")
    )
    cells = grid.join(
        counts, on=["__t__", "__d__", "__h__"], how="left"
    ).select(
        "__t__",
        (
            F.datediff(F.col("__d__"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            * 24
            + F.col("__h__")
        ).alias("__idx__"),
        F.coalesce("__n__", F.lit(0).cast("long")).alias("__n__"),
    )
    empty = cells.filter(F.col("__n__") == 0)
    w = Window.partitionBy("__t__").orderBy("__idx__")
    streaks = (
        empty.withColumn(
            "__grp__", F.col("__idx__") - F.row_number().over(w)
        )
        .groupBy("__t__", "__grp__")
        .agg(F.count(F.lit(1)).cast("long").alias("__len__"))
    )
    per_type = streaks.groupBy("__t__").agg(
        F.sum("__len__").cast("long").alias("n_silent_cells"),
        F.max("__len__").cast("long").alias("max_silent_hours"),
    )
    totals = cells.groupBy("__t__").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells")
    )
    return (
        totals.join(per_type, on="__t__", how="left")
        .select(
            F.col("__t__").alias(type_col),
            "n_cells",
            F.coalesce("n_silent_cells", F.lit(0).cast("long")).alias(
                "n_silent_cells"
            ),
            F.coalesce("max_silent_hours", F.lit(0).cast("long")).alias(
                "max_silent_hours"
            ),
        )
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    key_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Rank-frequency power-law (Zipf) fit per key: OLS of ln(freq)
    against ln(rank) over the key's word frequency table. Natural text
    sits near slope −1; a source whose slope is much flatter is
    vocabulary-uniform (symptomatic of templated/synthetic text), much
    steeper means a few tokens dominate (boilerplate) — a one-number
    corpus-health dial per source.

    Exactness: ranks and frequencies are integers, so ``ln`` is
    evaluated on identical operands in any engine; both logs are
    quantized to 1e-6 fixed point and every OLS component sum is an
    exact 64-bit integer (order-independent across partitions/engines).
    The slope/intercept/r2 doubles are computed by ONE mirrored final
    expression, so results survive the cross-engine value hash — the
    same discipline as :func:`corr_matrix`/:func:`grouped_trend`.

    Plan: corpus → per-key word counts is one map-side-combined
    shuffle; the rank window partitions by key over the VOCAB-sized
    table (|V| rows per key, ≪ corpus — the window never sees raw
    text); the OLS aggregate reuses the same key partitioning. Returns
    (key…, n_terms, slope, intercept, r2), ratios rounded to 6 places.
    """
    key_cols = list(key_cols)
    for c in [*key_cols, text_col]:
        if c not in df.columns:
            raise ValueError(f"zipf_fit: unknown column {c!r}")
    freq = (
        df.select(
            *key_cols,
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
                "word"
            ),
        )
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy(*key_cols, "word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc("freq"), F.asc("word")
    )
    ranked = freq.select(
        *key_cols,
        F.row_number().over(w).alias("rank"),
        F.col("freq"),
    ).select(
        *key_cols,
        F.floor(F.log(F.col("rank").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("qx"),
        F.floor(F.log(F.col("freq").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("qy"),
    )
    g = ranked.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("qx").alias("__sx__"),
        F.sum("qy").alias("__sy__"),
        F.sum(F.col("qx") * F.col("qy")).alias("__sxy__"),
        F.sum(F.col("qx") * F.col("qx")).alias("__sxx__"),
        F.sum(F.col("qy") * F.col("qy")).alias("__syy__"),
    )
    n = F.col("n_terms").cast("double")
    sx = F.col("__sx__").cast("double")
    sy = F.col("__sy__").cast("double")
    sxy = F.col("__sxy__").cast("double")
    sxx = F.col("__sxx__").cast("double")
    syy = F.col("__syy__").cast("double")
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    valid = (F.col("n_terms") >= 2) & (denx > 0)
    slope = num / denx
    # intercept back in ln units: ybar − slope·xbar, the 1e6 quanta cancel
    intercept = (sy / n - slope * (sx / n)) / F.lit(1e6)
    r2 = F.when(deny > 0, (num * num) / (denx * deny))
    return g.select(
        *key_cols,
        "n_terms",
        F.when(valid, F.round(slope, 6)).alias("slope"),
        F.when(valid, F.round(intercept, 6)).alias("intercept"),
        F.when(valid, F.round(r2, 6)).alias("r2"),
    )


def clustering_coefficient(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Local clustering coefficient per node of the undirected
    event-transition graph: closed wedges over possible wedges,
    ``cc = 2·T / (d·(d-1))`` — the per-node cohesion readout on top of
    :func:`triangle_counts` (how clique-like each event type's
    neighborhood is; a collapsing coefficient under data drift means
    transition diversity is disappearing). Triangle counts come from
    the degree-ordered node-iterator (see :func:`triangle_counts`);
    degrees from the same shared :func:`_transition_edges`
    construction, so both sides of the ratio describe the identical
    graph.

    Cross-engine exactness: T and d are exact integers, and the
    coefficient is published as q6 fixed point
    ``2·T·1e6 div (d·(d-1))`` (non-negative operands — div == floor on
    both engines); degree-0/1 nodes have no possible wedges and report
    NULL. Returns (node, degree, n_triangles, clustering_q6).

    Plan: triangle pipeline + one degree aggregation + a node-keyed
    join — all bounded by the |V|-row node table beyond the shared
    edge build.
    """
    und = _transition_edges(
        events, user_col, type_col, ts_col, id_col
    ).persist()
    tri, deg_raw = _triangles_and_degrees(und)
    deg = deg_raw.select(
        "node", F.col("__d__").cast("long").alias("degree")
    )
    return (
        deg.join(tri, on="node")
        .select(
            "node",
            "degree",
            "n_triangles",
            F.expr(
                "CASE WHEN degree >= 2 THEN "
                "CAST(2 * n_triangles * 1000000 div (degree * (degree - 1))"
                " AS BIGINT) END"
            ).alias("clustering_q6"),
        )
    )


def k_core(
    events: DataFrame,
    k: int = 2,
    rounds: int = 8,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_driver_edges: int = 1_000_000,
) -> DataFrame:
    """k-core peeling of the undirected event-transition graph: run
    ``rounds`` rounds of "drop every node with degree < k (and its
    edges)" and return the surviving nodes with their within-subgraph
    degrees — the standard dense-substructure extraction (Seidman
    1983) behind spam-ring detection, community seeding, and
    hub-vs-periphery traffic profiling.

    STATIC round count, deliberately: true k-core iterates to a
    data-dependent fixpoint, which an unrolled cross-engine oracle
    cannot replicate (the BPE batching lesson, r6). With a fixed
    ``rounds`` both engines compute the identical peel prefix; peeling
    is monotone (each round only removes), so a converged graph passes
    later rounds unchanged and ``rounds`` ≥ the peel depth gives the
    exact k-core. Raise ``rounds`` for deep onion graphs.

    Scale contract (r8 redesign): the ONLY data-scale work is the
    shared distinct-edge aggregation — nodes are the ``type_col``
    vocabulary, so the distinct adjacency is a BOUNDED CONTROL
    RELATION (≤ |V|² rows, the coalition-mask/centroid class) and the
    peel itself runs driver-side over it in microseconds; the result
    is a literal ≤|V|-row relation (the :func:`shapley_attribution`
    pattern). 10× the events changes only the distinct scan. The r7
    distributed loop (8 jobs × eager checkpoint ≈ 1.2 s of pure
    scheduler floor at sf0.1, and lineage that must checkpoint every
    round because each round references the edge table three times)
    is kept as the fallback for graphs whose node set ISN'T a small
    vocabulary (``max_driver_edges`` exceeded — e.g. user-id nodes).

    Returns (node, core_degree), the degree INSIDE the surviving
    subgraph.
    """
    if k < 1:
        raise ValueError("k_core: k must be >= 1")
    if rounds < 1:
        raise ValueError("k_core: rounds must be >= 1")
    edges = _transition_edges(events, user_col, type_col, ts_col, id_col)
    # r9 (ADVICE): probe via Arrow (toPandas), not collect() — a
    # wrong-guess graph at the limit materializes two compact object
    # arrays (tens of MB at the 1M default, vs hundreds of MB of Row
    # objects), and the SAME single job still decides the route; the
    # 1M driver cap itself is unchanged from r8
    head = edges.limit(int(max_driver_edges) + 1).toPandas()
    if len(head) > max_driver_edges:
        return _k_core_distributed(edges, k, rounds)
    alive = list(zip(head["u"].tolist(), head["v"].tolist()))
    for _ in range(rounds):
        deg: dict = {}
        for u, v in alive:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        alive = [
            (u, v) for u, v in alive if deg[u] >= k and deg[v] >= k
        ]
    out: dict = {}
    for u, v in alive:
        out[u] = out.get(u, 0) + 1
        out[v] = out.get(v, 0) + 1
    import pandas as pd

    spark = events.sparkSession
    schema = T.StructType(
        [
            T.StructField("node", edges.schema["u"].dataType),
            T.StructField("core_degree", T.LongType()),
        ]
    )
    items = sorted(out.items())
    # pandas -> Arrow -> LocalRelation: a literal relation with no
    # parallelize job behind it (a list createDataFrame schedules
    # defaultParallelism tasks just to count 5 rows)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "node": [n for n, _ in items],
                "core_degree": pd.array(
                    [int(d) for _, d in items], dtype="int64"
                ),
            }
        ),
        schema=schema,
    )


def _k_core_distributed(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """The big-|V| peel: per round one map-side-combinable degree agg
    + two AQE-broadcast semi-joins on the shrinking edge table, eagerly
    checkpointed (each round references ``alive`` three times, so an
    un-checkpointed lineage triples per round)."""
    alive = edges.localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = (
            alive.select(F.col("u").alias("node"))
            .union(alive.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("__d__"))
        )
        keep = deg.filter(F.col("__d__") >= int(k)).select("node")
        alive = (
            alive.join(
                keep.select(F.col("node").alias("u")), on="u", how="left_semi"
            )
            .join(
                keep.select(F.col("node").alias("v")), on="v", how="left_semi"
            )
            .localCheckpoint(eager=True)
        )
    return (
        alive.select(F.col("u").alias("node"))
        .union(alive.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


def shapley_attribution(
    events: DataFrame,
    channels: Sequence[str],
    conversion: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """EXACT Shapley-value conversion credit per channel — the third
    classic multi-touch attribution next to :func:`ushape_attribution`
    (positional) and :func:`markov_attribution` (removal effect). The
    coalition value is the standard set-based one: ``v(S)`` = number
    of CONVERTING users whose touched-channel set is a subset of S
    (they would still have converted with only S available), and
    ``φ_i = Σ_{S ⊆ N\\{i}} |S|!(n-1-|S|)!/n! · (v(S∪{i}) − v(S))``.

    Exact integers all the way: the published ``shapley_num`` is the
    n!-scaled numerator ``Σ s!(n-1-s)!·Δ`` (v is monotone, so every Δ
    and numerator is a non-negative integer — floor == truncate on
    both engines), and ``share_q6 = num·1e6 div (n!·(v(N) − v(∅)))``
    so the shares sum to ~1e6. NULL shares when no converter touched
    any channel.

    Scale contract: ONE map-side-combinable per-user aggregation
    (bitmask of touched channels + converted flag) and one ≤2^n-row
    mask-count aggregation; the 2^n coalition sums and the Shapley
    fold run on the driver over that bounded control relation, and the
    result is a literal |channels|-row relation — the
    :func:`markov_attribution` pattern. ``n = len(channels)`` is
    capped at 8 (256 coalitions): Shapley over more channels than that
    is statistically meaningless anyway.

    Returns (channel, n_converters, shapley_num, share_q6) in the
    given channel order.
    """
    from math import factorial

    chans = list(channels)
    n = len(chans)
    if not 1 <= n <= 8:
        raise ValueError("shapley_attribution: need 1..8 channels")
    if len(set(chans)) != n or conversion in chans:
        raise ValueError(
            "shapley_attribution: channels must be distinct and exclude "
            "the conversion type"
        )
    mask = None
    for i, ch in enumerate(chans):
        bit = F.max(
            F.when(F.col(type_col) == ch, F.lit(1)).otherwise(F.lit(0))
        ) * F.lit(1 << i)
        mask = bit if mask is None else mask + bit
    users = (
        events.filter(F.col(user_col).isNotNull())
        .groupBy(user_col)
        .agg(
            mask.alias("__m__"),
            F.max(
                F.when(F.col(type_col) == conversion, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("__conv__"),
        )
    )
    mcnt = (
        users.filter(F.col("__conv__") == 1)
        .groupBy("__m__")
        .agg(F.count(F.lit(1)).alias("__c__"))
        .collect()  # bounded: <= 2^n rows
    )
    cnt = {int(r["__m__"]): int(r["__c__"]) for r in mcnt}
    full = (1 << n) - 1
    v = [0] * (1 << n)
    for s in range(1 << n):
        v[s] = sum(c for m, c in cnt.items() if m & ~s & full == 0)
    denom = factorial(n) * (v[full] - v[0])
    rows = []
    for i, ch in enumerate(chans):
        num = 0
        for s in range(1 << n):
            if s & (1 << i):
                continue
            w = factorial(bin(s).count("1")) * factorial(
                n - 1 - bin(s).count("1")
            )
            num += w * (v[s | (1 << i)] - v[s])
        share = (num * 1_000_000) // denom if denom > 0 else None
        rows.append((ch, v[full], num, share))
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("channel", StringType(), False),
            StructField("n_converters", LongType(), False),
            StructField("shapley_num", LongType(), False),
            StructField("share_q6", LongType(), True),
        ]
    )
    return events.sparkSession.createDataFrame(rows, schema)


#: Benford expected first-digit shares, q6 fixed point: these are the
#: CONSTANTS floor(log10(1 + 1/d) * 1e6), inlined as literals on both
#: engines so no runtime log/float enters the compare
_BENFORD_Q6 = {
    d: int(__import__("math").floor(
        __import__("math").log10(1.0 + 1.0 / d) * 1_000_000
    ))
    for d in range(1, 10)
}


def benford_profile(
    events: DataFrame,
    value_col: str = "value",
) -> DataFrame:
    """Benford's-law first-digit profile — the classic fabricated-data
    / anomalous-feed screen: naturally-occurring multiplicative
    quantities put ~30.1% of first significant digits at 1, and a feed
    whose digit histogram deviates hard (uniform generators, capped
    fields, unit mix-ups) flags for audit. Reports, per digit 1–9, the
    observed count and q6 share next to the Benford expectation and
    the absolute deviation.

    Exactness: the first significant digit of ``floor(|v|)`` (rows
    with |v| ≥ 1) is taken from the BIGINT's decimal string — integer
    → string is culture-free and identical on every engine, unlike
    float formatting or log10 of a double. Shares are integer q6
    (``cnt·1e6 div n``); the Benford expectations are PRE-COMPUTED
    constants inlined as literals on both sides, so no runtime
    transcendental enters the hash.

    Plan: one filter + digit projection + 9-row hash aggregation
    (map-side combined), left-joined onto a literal digit spine so all
    9 digits always appear. Returns (digit, n, observed_q6,
    expected_q6, deviation_q6) ascending.
    """
    v = F.col(value_col)
    digit = F.expr(
        f"CAST(substr(CAST(CAST(floor(abs({value_col})) AS BIGINT)"
        " AS STRING), 1, 1) AS INT)"
    )
    # the upper bound does double duty: it keeps the BIGINT cast from
    # overflowing (ANSI mode would throw) AND excludes NaN/inf on BOTH
    # engines — Spark and DuckDB each order NaN above every number, so
    # `abs(v) < 9e18` is false for NaN identically (a bare isnan()
    # would need engine-specific spelling)
    base = events.filter(
        v.isNotNull() & (F.abs(v) >= 1) & (F.abs(v) < 9.0e18)
    ).select(digit.alias("__d__"))
    counts = base.groupBy("__d__").agg(F.count(F.lit(1)).alias("__c__"))
    # total from the 9-row counts table, NOT a second base aggregation:
    # both consumers then share the counts subplan, so Spark reuses the
    # shuffle exchange and the input is scanned once
    total = counts.agg(F.sum("__c__").cast("long").alias("__n__"))
    spine = (
        events.sparkSession.range(1, 10)
        .select(F.col("id").cast("int").alias("__d__"))
        .withColumn(
            "__e__",
            F.element_at(
                F.array(*[F.lit(_BENFORD_Q6[d]) for d in range(1, 10)]),
                F.col("__d__"),
            ).cast("long"),
        )
    )
    return (
        spine.join(counts, on="__d__", how="left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("__d__").cast("long").alias("digit"),
            F.coalesce(F.col("__c__"), F.lit(0)).cast("long").alias("n"),
            F.expr(
                "CASE WHEN __n__ > 0 THEN CAST(coalesce(__c__, 0) * 1000000"
                " div __n__ AS BIGINT) END"
            ).alias("observed_q6"),
            F.col("__e__").alias("expected_q6"),
            F.expr(
                "CASE WHEN __n__ > 0 THEN CAST(abs(coalesce(__c__, 0)"
                " * 1000000 div __n__ - __e__) AS BIGINT) END"
            ).alias("deviation_q6"),
        )
        .orderBy("digit")
    )


def gini_concentration(
    df: DataFrame,
    key_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative integer measure —
    the concentration screen a corpus owner reads next to
    :func:`key_skew`: a source whose length (or token-count) Gini
    approaches 1 is a few giant documents wearing a big row count
    (dedup/packing behave pathologically there), while ~0 means
    uniform sizing. Uses the exact rank formulation
    ``G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)`` over the ascending sort.

    Cross-engine exactness: the collapse to (key, value, count) bounds
    every sort by distinct-value cardinality (the :func:`mad_outliers`
    recipe), and the position-weighted sum folds a value run in closed
    form — a run of ``c`` copies of ``x`` after ``p`` predecessors
    contributes ``x·c·(2p + c + 1)`` to ``2·Σ i·x_(i)`` — so A, S, n
    are exact integers and ``gini_q6 = (2A − (n+1)·S)·1e6 div (n·S)``
    is engine-identical. BIGINT ceiling: the q6 numerator overflows
    past ~9.2e12 · (n·S) — with per-group n·S up to ~10¹² (e.g. 10⁶
    docs × 10⁶ chars) headroom is ample; beyond that, pre-scale the
    measure down. NULL/negative values are excluded (Gini is defined
    on a non-negative measure).

    Returns (key, n, total, gini_q6); groups with zero total report
    NULL gini.
    """
    base = df.filter(
        F.col(value_col).isNotNull() & (F.col(value_col) >= 0)
    ).select(
        F.col(key_col).alias("__k__"),
        F.col(value_col).cast("long").alias("__v__"),
    )
    vc = base.groupBy("__k__", "__v__").agg(
        F.count(F.lit(1)).cast("long").alias("__c__")
    )
    w_cum = (
        Window.partitionBy("__k__")
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = vc.withColumn(
        "__p__", (F.sum("__c__").over(w_cum) - F.col("__c__"))
    ).withColumn(
        "__a2__",
        F.expr("__v__ * __c__ * (2 * __p__ + __c__ + 1)"),
    )
    agg = t.groupBy("__k__").agg(
        F.sum("__c__").cast("long").alias("n"),
        F.sum(F.expr("__v__ * __c__")).cast("long").alias("total"),
        F.sum("__a2__").cast("long").alias("__twoA__"),
    )
    return agg.select(
        F.col("__k__").alias(key_col),
        "n",
        "total",
        F.expr(
            "CASE WHEN total > 0 THEN CAST((__twoA__ - (n + 1) * total)"
            " * 1000000 div (n * total) AS BIGINT) END"
        ).alias("gini_q6"),
    )
