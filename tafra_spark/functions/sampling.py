"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is engine- and partition-layout-
dependent — unusable when a pipeline must be reproducible or verified
against an independent engine. These operators sample by KEY HASH
instead: a row is kept iff ``hash(key) mod 100 < rate_pct``. Properties
that matter at 100 TB:

- **reproducible** — same keys → same sample, on any engine, any
  partitioning, any run;
- **stable under growth** — re-running on an appended dataset keeps
  every previously-sampled row (no resampling churn);
- **narrow** — a per-row codegen'd predicate, no shuffle, pushes
  through joins;
- **stratified** — per-stratum rates (e.g. downsample the dominant
  language, keep the tail) via one ``when`` chain.

The hash is the first 60 bits of md5 (engine-portable, same family as
the dedup fingerprints) salted with a seed.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_mod",
    "hash_sample",
    "stratified_hash_sample",
    "exact_k_per_stratum",
    "weighted_mix",
    "epoch_plan",
    "dataset_split",
    "weighted_sample_k",
    "distribution_match_weights",
]


def hash_mod(key: Column, buckets: int = 100, seed: int = 42) -> Column:
    """Deterministic bucket in [0, buckets) from the md5 of (seed, key).
    DuckDB mirror: ``CAST(concat('0x', substr(md5(seed || '|' || key),
    1, 15)) AS BIGINT) % buckets``."""
    digest = F.md5(
        F.concat(F.lit(f"{seed}|"), key.cast("string")).cast("binary")
    )
    h = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def hash_sample(
    df: DataFrame, key_col: str, rate_pct: float, seed: int = 42
) -> DataFrame:
    """Keep ~``rate_pct``% of rows, deterministically by key hash."""
    return df.filter(hash_mod(F.col(key_col), 100, seed) < F.lit(rate_pct))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 100.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps stratum value →
    keep percentage; unlisted strata keep ``default_rate``%.

    The canonical corpus-balancing op: downsample the dominant stratum
    (e.g. English web text) while keeping the tail complete.
    """
    rate = F.lit(float(default_rate))
    for value, pct in rates.items():
        rate = F.when(F.col(strata_col) == value, F.lit(float(pct))).otherwise(
            rate
        )
    return df.filter(hash_mod(F.col(key_col), 100, seed) < rate)


def exact_k_per_stratum(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Keep EXACTLY min(k, stratum size) rows per stratum,
    deterministically — the distributed equivalent of a per-group
    reservoir sample, without RNG state.

    Rows are ranked inside each stratum by their key's salted hash
    (uniform, engine-portable) with the raw key as tie-break, and the
    first ``k`` survive. One shuffle on the stratum column; the window
    never materializes more than a partition. Rate-based
    :func:`stratified_hash_sample` keeps a *fraction* — this keeps a
    *count* (caps a dominant stratum at a fixed budget).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_mod(F.col(key_col), 1_000_000_000, seed), F.col(key_col)
    )
    return (
        df.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .drop("__rk__")
    )


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic down-sampling to target source weights — the
    data-mixing step that turns raw per-source counts into a training
    mix ("50% web, 30% books, 20% code").

    Finds the largest total T every listed source can supply
    (T = min over s of n_s / w_s), then keeps floor(w_s * T) docs per
    source by salted-hash rank (the :func:`exact_k_per_stratum`
    ordering). Sources absent from ``weights`` are dropped. A LISTED
    source with zero rows makes T = 0 and the result EMPTY — the
    honest reading of the formula; silently renormalizing over the
    present sources would ship a mix that violates the requested
    weights. Fully distributed: the count/limit tables are one row per
    source, joined broadcast — no driver-side collect, no RNG.

    Scale: one count aggregate over the corpus, then one stratum-window
    shuffle over ONLY the listed sources (the broadcast take-join runs
    before the window, so unlisted sources never enter the shuffle);
    the weight and take tables stay tiny. Reproducible across runs and
    engines (md5 rank ordering).
    """
    from ._relation import literal_relation

    if not all(isinstance(s, str) for s in weights):
        # a non-string key would build a BIGINT strata column and the
        # join would cast the string side — silently dropping weights
        # for names like '007'; fail loudly like the old explicit schema
        raise TypeError(
            "weighted_mix: weights keys must be strings (source names)"
        )
    spark = df.sparkSession
    # literal relation, not createDataFrame: this tiny spec table feeds
    # two broadcast joins, and a Python-rows frame forks Python workers
    # on every broadcast build
    wdf = literal_relation(
        spark,
        [(s, float(w)) for s, w in sorted(weights.items())],
        [strata_col, "__w__"],
    ).filter(F.col("__w__") > 0)
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n__"))
    # LEFT join from the weights: a listed-but-absent source keeps its
    # row with n = 0, forcing T = 0 below
    j = wdf.join(counts, on=strata_col, how="left").withColumn(
        "__n__", F.coalesce(F.col("__n__"), F.lit(0))
    )
    total = j.agg(
        F.min(F.col("__n__").cast("double") / F.col("__w__")).alias("__T__")
    )
    takes = (
        j.crossJoin(F.broadcast(total))
        .select(
            strata_col,
            F.floor(F.col("__w__") * F.col("__T__")).cast("long").alias(
                "__take__"
            ),
        )
    )
    w = Window.partitionBy(strata_col).orderBy(
        hash_mod(F.col(key_col), 1_000_000_000, seed), F.col(key_col)
    )
    return (
        df.join(F.broadcast(takes), on=strata_col)
        .withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= F.col("__take__"))
        .drop("__rk__", "__take__")
    )


def epoch_plan(
    df: DataFrame,
    weights: dict,
    target_tokens: int,
    text_col: str = "text",
    strata_col: str = "source",
    max_epochs: float = 4.0,
) -> DataFrame:
    """Training-mix epoch planner: given target mix ``weights`` and a
    total token budget, how many PASSES (epochs) over each source does
    the mix imply, and is that achievable under ``max_epochs``? This is
    the sizing step before :func:`weighted_mix` — the public data-mix
    recipes (Pile/LLaMA-style) express exactly this as per-source
    epoch factors, with an over-repetition cap because repeating a
    small source too often measurably hurts.

    One token-count aggregate over the corpus (map-side partial sum of
    a narrow token-count projection); the weight spec attaches as a
    literal relation. All outputs are exact fixed-point: requested
    share, available tokens, implied epochs (q4), granted epochs
    (capped, q4), and granted tokens under the cap.
    """
    from ._relation import literal_relation
    from .text import token_count

    if not all(isinstance(s, str) for s in weights):
        raise TypeError("epoch_plan: weights keys must be strings")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("epoch_plan: weights must sum > 0")
    spark = df.sparkSession
    wdf = literal_relation(
        spark,
        [(s, float(w) / total_w) for s, w in sorted(weights.items())],
        [strata_col, "__share__"],
    ).filter(F.col("__share__") > 0)
    avail = (
        df.groupBy(strata_col)
        .agg(F.sum(token_count(F.col(text_col))).cast("long").alias("avail_tokens"))
    )
    j = wdf.join(avail, on=strata_col, how="left").withColumn(
        "avail_tokens", F.coalesce(F.col("avail_tokens"), F.lit(0))
    )
    want = F.floor(F.col("__share__") * F.lit(float(target_tokens)) + F.lit(0.5)).cast("long")
    implied = F.when(
        F.col("avail_tokens") > 0,
        F.col("want_tokens") / F.col("avail_tokens"),
    ).otherwise(F.lit(None))
    return (
        j.withColumn("want_tokens", want)
        .withColumn(
            "implied_epochs_q4",
            F.floor(implied * 10000 + F.lit(0.5)).cast("long"),
        )
        .withColumn(
            "granted_epochs_q4",
            # gate on non-NULL: least() SKIPS NULLs (both engines), so
            # an empty source would otherwise report a full-cap grant
            F.when(
                F.col("implied_epochs_q4").isNotNull(),
                F.least(
                    F.col("implied_epochs_q4"),
                    F.lit(int(round(float(max_epochs) * 10000))),
                ),
            ),
        )
        .withColumn(
            "granted_tokens",
            F.when(
                F.col("implied_epochs_q4").isNotNull(),
                F.floor(
                    F.col("granted_epochs_q4") / 10000 * F.col("avail_tokens")
                    + F.lit(0.5)
                ).cast("long"),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "share_q6",
            F.floor(F.col("__share__") * 1000000 + F.lit(0.5)).cast("long"),
        )
        .select(
            strata_col, "share_q6", "avail_tokens", "want_tokens",
            "implied_epochs_q4", "granted_epochs_q4", "granted_tokens",
        )
    )

def dataset_split(
    df: DataFrame,
    fractions: Mapping[str, float] | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment by key hash.

    Each row's 60-bit md5 key (salted with ``seed``) is reduced to a
    bucket in [0, 1e6); cumulative-fraction thresholds over the splits
    (in the caller's dict order) map buckets to split names. The same
    properties as :func:`hash_sample` carry over, and they are exactly
    what an ML data pipeline needs from a splitter at 100 TB:

    - **no leakage under growth** — appending new documents never moves
      an existing document between splits (assignment depends only on
      the row's own key), so eval sets stay frozen as the corpus grows;
    - **reproducible across engines/runs** — no RNG, no partition-order
      dependence; the DuckDB oracle reproduces assignments exactly;
    - **narrow** — one codegen'd projection, zero shuffles; the split
      predicate pushes down through any later scan of the split corpus.

    ``fractions`` must sum to ≤ 1; any remainder is assigned to the
    LAST split (so the default 0.9/0.05/0.05 is exhaustive and rounding
    residue lands in "test"). Returns the input plus ``out_col``.
    """
    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(fractions)
    if len(names) < 2:
        raise ValueError("dataset_split: need at least two splits")
    fracs = [float(fractions[n]) for n in names]
    if any(f < 0 for f in fracs) or sum(fracs) > 1.0 + 1e-9:
        raise ValueError("dataset_split: fractions must be >=0, sum <= 1")
    # integer thresholds in millionths: cum[i] = floor(sum(f[:i+1])*1e6)
    cum, acc = [], 0.0
    for f in fracs[:-1]:
        acc += f
        cum.append(int(acc * 1e6 + 0.5))
    bucket = hash_mod(F.col(id_col), 1_000_000, seed)
    # build from the last boundary outward so the TIGHTEST threshold
    # binds last: bucket < cum[0] -> names[0] wins over all
    expr = F.lit(names[-1])
    for name, thr in list(zip(names[:-1], cum))[::-1]:
        expr = F.when(bucket < thr, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)

def weighted_sample_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    strata_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministically — the
    Efraimidis–Spirakis A-ES scheme: each row draws a uniform u from
    its salted key hash and gets priority u^(1/w); the k largest
    priorities are the sample. Inclusion probability is proportional
    to weight, repeated runs and engines agree exactly (no RNG state),
    and — like every sampler here — appends never perturb the draws of
    existing rows.

    Implementation compares ln(u)/w instead of u^(1/w) (same order,
    monotone transform) because ``pow`` is not a correctly-rounded IEEE
    op while ``ln`` and division are — the cross-engine ranking
    contract would not survive pow. The uniform is built from the top
    53 bits of the 60-bit md5 key (``(h >> 7) + 1) / 2^53`` — exactly
    representable, strictly positive).

    Rows with NULL or non-positive weight are excluded (a zero-weight
    row can never be drawn; a negative weight is a caller bug surfaced
    by absence). Global draws use distributed TakeOrdered (orderBy +
    limit — never a single-partition window); pass ``strata_col`` for
    an independent top-k per stratum via one partitioned window.
    Returns the sampled rows + (priority ranking) ``rank``.
    """
    if k < 1:
        raise ValueError("weighted_sample_k: k must be >= 1")
    w = F.col(weight_col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}|"), F.col(key_col).cast("string")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (F.shiftright(h, 7) + 1).cast("double") / F.lit(float(2**53))
    priority = F.log(u) / w
    base = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "__pri__", priority
    )
    if strata_col is None:
        top = base.orderBy(F.col("__pri__").desc(), F.col(key_col)).limit(k)
        rank_w = Window.orderBy(F.col("__pri__").desc(), F.col(key_col))
    else:
        rank_w = Window.partitionBy(strata_col).orderBy(
            F.col("__pri__").desc(), F.col(key_col)
        )
        top = base.withColumn(
            "__rk__", F.row_number().over(rank_w)
        ).filter(F.col("__rk__") <= k).drop("__rk__")
    return (
        top.withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .drop("__pri__")
    )


def distribution_match_weights(
    df: DataFrame,
    value_col: str,
    part_col: str = "source",
    bins: int = 10,
) -> DataFrame:
    """Importance weights that reshape every partition's value
    distribution onto the GLOBAL one: a row in (partition p, bin b)
    gets weight ``global_share(b) / partition_share(b | p)``, so
    weighted sampling from any single source reproduces the corpus-wide
    distribution — the classic covariate-shift / data-mixing correction
    (a source of only short documents gets its few long ones upweighted
    instead of being thresholded away). Complements
    :func:`tafra_spark.functions.pipeline.quantile_normalize` (which
    rewrites VALUES; this leaves values alone and reweights rows) and
    :func:`weighted_mix` (which takes explicit weights; this derives
    them from the data).

    Binning follows :func:`tafra_spark.functions.analytics
    .value_histogram`: equal-width over the global min/max from one
    broadcast bounds row, ``least(floor((x−lo)/width), bins−1)``.
    Weights are exact integer q6 ratios —
    ``n_b·n_p·1e6 div (N·n_pb)`` — so output hashes identically on
    any engine (the division sequence is pure integer).

    Plan: one (part, bin) count aggregate + three tiny broadcast
    tables joined back onto the narrow binned projection; the data
    pays its scan plus one broadcast join, no extra exchange. Returns
    the input rows plus (bin, weight_q6); NULL values carry NULL
    weights.
    """
    if int(bins) < 1:
        raise ValueError("distribution_match_weights: bins must be >= 1")
    x = F.col(value_col).cast("double")
    bounds = df.filter(F.col(value_col).isNotNull()).agg(
        F.min(x).alias("__lo__"), F.max(x).alias("__hi__")
    )
    width = (F.col("__hi__") - F.col("__lo__")) / F.lit(float(bins))
    binned = df.crossJoin(F.broadcast(bounds)).withColumn(
        "bin",
        F.when(
            F.col(value_col).isNotNull(),
            F.when(
                F.col("__hi__") == F.col("__lo__"), F.lit(0).cast("long")
            ).otherwise(
                F.least(
                    F.floor((x - F.col("__lo__")) / width).cast("long"),
                    F.lit(int(bins) - 1).cast("long"),
                )
            ),
        ),
    ).drop("__lo__", "__hi__")
    pb = (
        binned.filter(F.col("bin").isNotNull())
        .groupBy(part_col, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("__npb__"))
    )
    pn = pb.groupBy(part_col).agg(F.sum("__npb__").cast("long").alias("__np__"))
    bn = pb.groupBy("bin").agg(F.sum("__npb__").cast("long").alias("__nb__"))
    nt = pb.agg(F.sum("__npb__").cast("long").alias("__nt__"))
    wtab = (
        pb.join(F.broadcast(pn), on=part_col)
        .join(F.broadcast(bn), on="bin")
        .crossJoin(F.broadcast(nt))
        .select(
            part_col,
            "bin",
            F.expr(
                "CAST(__nb__ * __np__ * 1000000 div (__nt__ * __npb__)"
                " AS BIGINT)"
            ).alias("weight_q6"),
        )
    )
    return binned.join(F.broadcast(wtab), on=[part_col, "bin"], how="left")


def temperature_mix(
    df: DataFrame,
    text_col: str = "text",
    strata_col: str = "source",
    budget_tokens: int | None = None,
) -> DataFrame:
    """Temperature-based source mixing at ``alpha = 0.5`` — the
    multilingual up-sampling rule (XLM-family: sample source ``s``
    with probability proportional to ``n_tokens(s)^alpha``, flattening
    the head and boosting the tail). Fixed at 0.5 because ``sqrt`` is
    the one power IEEE 754 requires correctly rounded — the same
    double on every engine — while general ``pow`` is not
    cross-engine-stable (the decayed_activity exp() lesson); other
    exponents belong in driver-side planning, not an oracle-graded
    kernel.

    Each stratum's weight is ``floor(sqrt(n_tokens)·1e6 + 0.5)``
    quantized BEFORE summation (integer sums are order-independent),
    shares and the optional ``budget_tokens`` allocation are exact
    integer divisions. One map-side-combined aggregate over the token
    counts; everything after runs on the |strata|-row relation.
    Returns (strata, n_docs, n_tokens, raw_share_q6, temp_share_q6[,
    planned_tokens]).
    """
    from .text import word_tokens

    per = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(word_tokens(F.lower(F.col(text_col)))))
            .cast("long")
            .alias("n_tokens"),
        )
    )
    w_q6 = F.floor(
        F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    weighted = per.withColumn("__w__", w_q6)
    # totals via an unpartitioned window over the AGGREGATED relation
    # — |strata| rows (a bounded control relation: sources/languages),
    # so the single-partition window is free; a crossJoin of two
    # frames sharing the `per` subtree trips Spark 4's relation dedup
    # into an ambiguous __w__ reference
    # NB: Spark resolves column names case-insensitively by default,
    # so the totals must NOT be named __W__/__T__ (they would collide
    # with __w__ and make every reference ambiguous)
    wall = Window.partitionBy()
    out = weighted.withColumn(
        "__tok_total__", F.sum("n_tokens").over(wall)
    ).withColumn("__wt_total__", F.sum("__w__").over(wall)).select(
        strata_col,
        "n_docs",
        "n_tokens",
        F.expr(
            "CAST(n_tokens * 1000000 div __tok_total__ AS BIGINT)"
        ).alias("raw_share_q6"),
        F.expr(
            "CAST(__w__ * 1000000 div __wt_total__ AS BIGINT)"
        ).alias("temp_share_q6"),
        F.col("__w__"),
        F.col("__wt_total__"),
    )
    if budget_tokens is not None:
        out = out.withColumn(
            "planned_tokens",
            F.expr(
                f"CAST({int(budget_tokens)} * __w__ div __wt_total__"
                " AS BIGINT)"
            ),
        )
    return out.drop("__w__", "__wt_total__")
