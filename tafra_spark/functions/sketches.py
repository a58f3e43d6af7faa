"""Approximate sketches for cardinality / quantiles / frequency / membership.

At 100 TB, exact answers to these questions cost a full shuffle of the
key space; sketches bound memory and return mergeable partial states.
``approx_distinct`` / ``approx_quantiles`` / ``freq_items`` wrap Spark's
built-ins (HyperLogLog++, Greenwald-Khanna, KPS heavy hitters). The
Count-Min and Bloom sketches are DataFrame-NATIVE compositions — the
sketch state is itself a (tiny) DataFrame of counters / bitmap words
built with one codegen'd explode + aggregate, so it shuffles O(depth ×
width) rows regardless of input size, merges by union + re-aggregate,
and probes with a broadcast join. No JVM sketch objects (removed from
the PySpark 4 stat API), no driver-side state.

Engine-internal sketches (HLL++/GK/KPS) admit no DuckDB oracle —
different implementations estimate differently by design — so tests
assert their published error bounds against exact answers
(`tests/test_sketches.py`). The PORTABLE md5-family sketches (KMV,
portable Count-Min/Bloom, and the r7 HyperLogLog below) are
deterministic bit-for-bit on any engine, so their estimates themselves
carry value-hash oracles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "approx_distinct",
    "approx_quantiles",
    "freq_items",
    "count_min_build",
    "count_min_estimate",
    "count_min_join_size",
    "bloom_build",
    "bloom_contains",
    "kmv_distinct",
    "kmv_set_ops",
    "hll_alpha",
    "hll_registers",
    "hll_distinct",
]


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct count: relative standard deviation ``rsd``
    with O(1/rsd²) bytes of state regardless of cardinality."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_nd"))


def approx_quantiles(
    df: DataFrame, col: str, probs: Sequence[float], rel_err: float = 0.01
) -> list[float]:
    """Greenwald-Khanna quantiles: rank error ≤ rel_err·n, single pass,
    mergeable across partitions. Driver-side result (small)."""
    return df.approxQuantile(col, list(probs), rel_err)


def freq_items(
    df: DataFrame, cols: Sequence[str], support: float = 0.01
) -> DataFrame:
    """Items appearing in more than ``support`` fraction of rows
    (Karp-Papadimitriou-Shenker single-pass heavy hitters; may include
    false positives, never false negatives)."""
    return df.freqItems(list(cols), support)


# --------------------------------------------------------------------------- #
# Count-Min: counter-table formulation


def _cm_cells(
    col: Column, depth: int, width: int, seed: int, portable: bool = False
) -> Column:
    """array<struct<i, b>> — one (row, bucket) cell per hash function.

    ``portable`` swaps xxhash64 (fast, JVM-only) for the md5-60bit
    family every dedup/sampling operator uses — bit-reproducible in
    DuckDB, so the counter table itself carries a value-hash oracle.
    Same estimate guarantees either way (both families are uniform);
    choose portable when the sketch must be verified or shared across
    engines, xxhash for pure-Spark throughput."""
    if portable:
        from .sampling import hash_mod

        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    hash_mod(col, width, seed + i).alias("b"),
                )
                for i in range(depth)
            ]
        )
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(
                    F.xxhash64(F.lit(seed + i), col), F.lit(width)
                ).alias("b"),
            )
            for i in range(depth)
        ]
    )


def count_min_build(
    df: DataFrame, col: str, depth: int = 5, width: int = 1024, seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Build a Count-Min sketch as a (i, b, cnt) counter DataFrame.

    One explode + hash-aggregate; the result has ≤ depth·width rows no
    matter the input size. Merge two sketches with
    ``a.unionByName(b).groupBy("i","b").agg(F.sum("cnt").alias("cnt"))``.
    Estimates never undercount; overcount ≤ e/width·n with prob
    1-e^-depth.
    """
    ex = df.select(
        F.explode(
            _cm_cells(F.col(col), depth, width, seed, portable)
        ).alias("c")
    )
    return (
        ex.select(F.col("c.i").alias("i"), F.col("c.b").alias("b"))
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 1024,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Estimate each probe value's frequency: min over the depth rows of
    its counters. The sketch is tiny → broadcast; missing cells = 0."""
    p = probes.select(
        F.col(col).alias("value"),
        F.explode(
            _cm_cells(F.col(col), depth, width, seed, portable)
        ).alias("c"),
    ).select("value", F.col("c.i").alias("i"), F.col("c.b").alias("b"))
    joined = p.join(F.broadcast(sketch), on=["i", "b"], how="left").fillna(
        0, subset=["cnt"]
    )
    return joined.groupBy("value").agg(F.min("cnt").alias("estimate"))


# --------------------------------------------------------------------------- #
# Bloom: bitmap-word formulation


def _bloom_positions(
    col: Column, k: int, m_bits: int, seed: int, portable: bool = False
) -> Column:
    """array<struct<word, bit>> — k bit positions per key, packed as
    (long word index, bit-within-word). ``portable`` as in
    :func:`_cm_cells`."""
    if portable:
        from .sampling import hash_mod
    out = []
    for i in range(k):
        pos = (
            hash_mod(col, m_bits, seed + i)
            if portable
            else F.pmod(F.xxhash64(F.lit(seed + i), col), F.lit(m_bits))
        )
        out.append(
            F.struct(
                F.floor(pos / 64).cast("long").alias("word"),
                (pos % 64).cast("int").alias("bit"),
            )
        )
    return F.array(*out)


#: single-bit mask from the exploded ``bit`` column (shiftleft's Python
#: wrapper only takes literal shift amounts)
_MASK = "shiftleft(CAST(1 AS BIGINT), bit)"


def bloom_build(
    df: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 5, seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Build a Bloom filter as a (word, bits) bitmap DataFrame: explode k
    positions per key, OR the masks per 64-bit word. ≤ m_bits/64 rows.
    Merge filters with
    ``a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))``.
    No false negatives; false-positive rate ≈ (1 - e^{-kn/m})^k."""
    ex = df.select(
        F.explode(
            _bloom_positions(F.col(col), k, m_bits, seed, portable)
        ).alias("p")
    )
    return (
        ex.select(F.col("p.word").alias("word"), F.col("p.bit").alias("bit"))
        .withColumn("mask", F.expr(_MASK))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_contains(
    bloom: DataFrame,
    probes: DataFrame,
    col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(value, might_contain) per probe: every one of the k bits must be
    set. The classic use is semi-join reduction — build on the small
    side's keys, pre-filter the big side before its shuffle."""
    p = probes.select(
        F.col(col).alias("value"),
        F.explode(
            _bloom_positions(F.col(col), k, m_bits, seed, portable)
        ).alias("p"),
    ).select(
        "value", F.col("p.word").alias("word"), F.col("p.bit").alias("bit")
    ).withColumn("mask", F.expr(_MASK))
    joined = p.join(F.broadcast(bloom), on="word", how="left").fillna(
        0, subset=["bits"]
    )
    hit = (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")).cast("int")
    return (
        joined.withColumn("__hit__", hit)
        .groupBy("value")
        .agg((F.min("__hit__") == 1).alias("might_contain"))
    )


# --------------------------------------------------------------------------- #
# KMV: k-minimum-values distinct estimation (deterministic, oracle-able)


def kmv_distinct(
    df: DataFrame,
    col: str,
    group_cols: list | None = None,
    k: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Distinct-count estimation via the k-minimum-values sketch
    (Bar-Yossef et al. 2002): keep each group's ``k`` smallest salted
    value hashes; the estimate is (k−1)/u_k where u_k is the k-th
    smallest hash normalized to (0,1]. Unlike HLL, KMV with the
    portable md5 family is fully DETERMINISTIC — the same inputs give
    the same estimate on any engine, so the estimate itself carries a
    value-hash oracle (and two sketches merge by keeping the k
    smallest of the union).

    Groups with fewer than ``k`` distinct values report the EXACT
    count (the sketch holds every hash). Standard error ≈ 1/√(k−2).
    Plan: distinct (group, hash) collapse — the shuffle carries one
    row per distinct value, not the raw stream — then one rank window
    and a tiny per-group aggregate. Returns group cols + (n_hashes,
    est_distinct).
    """
    from pyspark.sql import Window as W

    from .sampling import hash_mod  # noqa: F401  (same md5 family)

    if k < 2:
        raise ValueError("kmv_distinct: k must be >= 2")
    group_cols = list(group_cols or [])
    digest = F.md5(
        F.concat(
            F.lit(f"{seed}|"), F.col(col).cast("string")
        ).cast("binary")
    )
    h = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    d = df.filter(F.col(col).isNotNull()).select(
        *group_cols, h.alias("__h__")
    ).distinct()
    if group_cols:
        w = W.partitionBy(*group_cols).orderBy("__h__")
        ranked = d.withColumn("__rk__", F.row_number().over(w)).filter(
            F.col("__rk__") <= k
        ).drop("__rk__")
    else:
        # ungrouped: distributed TakeOrdered, never a global
        # single-partition window over the distinct-hash stream
        ranked = d.orderBy("__h__").limit(k)
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("__h__").alias("__hk__"),
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        * F.lit(float(2**60))
        / F.col("__hk__").cast("double")
    )
    return agg.select(
        *group_cols,
        "n_hashes",
        F.round(est, 6).alias("est_distinct"),
    )


def count_min_join_size(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    depth: int = 5,
    width: int = 1024,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Equi-join cardinality estimate from two Count-Min sketches
    (Cormode & Muthukrishnan 2005 §4.2, the AMS inner-product trick):
    ``|L ⋈ R| = Σ_v f_L(v)·f_R(v)``, estimated as the MIN over the
    depth hash rows of the sketches' per-row inner product. Never
    undercounts; overcount ≤ e/width · |L|·|R| with prob 1-e^-depth.

    This is the planner's use of sketches: decide whether a join is
    safe to materialize — or needs salting / pre-aggregation — from two
    O(depth·width) counter tables, without paying the join's shuffle.
    Each side is one scan + hash-aggregate; the inner product itself
    touches ≤ depth·width rows no matter how big the inputs are.

    With ``portable=True`` every counter — and therefore the estimate,
    which is pure integer arithmetic over them — is bit-reproducible
    across engines. Returns one row: (join_size_est).
    """
    l_sk = count_min_build(left, left_col, depth, width, seed, portable)
    r_sk = count_min_build(right, right_col, depth, width, seed, portable)
    prod = (
        l_sk.select("i", "b", F.col("cnt").alias("lc"))
        .join(r_sk.select("i", "b", F.col("cnt").alias("rc")), on=["i", "b"])
        .groupBy("i")
        .agg(F.sum(F.col("lc") * F.col("rc")).alias("ip"))
    )
    # a hash row with NO bucket collisions has inner product 0 — the
    # exact estimate — and must participate in the min (the inner join
    # dropped it). Every row of a non-empty left sketch populates all
    # depth i values, so l_sk's distinct i is the full row set; the
    # final coalesce covers two empty inputs (estimate 0, not NULL).
    per_row = (
        l_sk.select("i")
        .distinct()
        .join(prod, on="i", how="left")
        .select(F.coalesce(F.col("ip"), F.lit(0)).alias("ip"))
    )
    return per_row.agg(
        F.coalesce(F.min("ip"), F.lit(0)).cast("long").alias("join_size_est")
    )


def kmv_set_ops(
    df: DataFrame,
    col: str,
    part_col: str,
    k: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Pairwise distinct-set UNION / INTERSECTION / Jaccard estimates
    between partitions from k-minimum-values sketches — the sketch
    ALGEBRA on top of :func:`kmv_distinct` (Beyer et al., SIGMOD 2007):
    merge two KMV sketches by keeping the k smallest of their hash
    union; |A∪B| estimates from the merged sketch exactly like a plain
    KMV; ρ = (fraction of merged-sketch hashes present in BOTH input
    sketches) estimates Jaccard, and |A∩B| ≈ ρ·|A∪B|. This answers
    "how much would deduplicating sources X and Y together save" from
    k·|sources| longs instead of a corpus-scale distinct join — the
    sketch-sized complement to the exact
    :func:`tafra_spark.functions.pipeline.source_overlap` matrix.

    Deterministic md5-60bit hashing makes every estimate itself
    value-hash verifiable cross-engine (same property as
    ``kmv_distinct``'s portable mode). Pairs where the merged sketch
    holds fewer than k hashes report EXACT union/intersection counts.

    Plan: one distinct (part, hash) collapse (the shuffle carries one
    row per distinct value), a per-part top-k rank window, then all
    pair arithmetic runs on k-row sketches — |parts|²·k rows total,
    never corpus². Returns (part_a, part_b, est_a, est_b, est_union,
    est_intersect, jaccard_est) with part_a < part_b.
    """
    if k < 2:
        raise ValueError("kmv_set_ops: k must be >= 2")
    digest = F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(col).cast("string")).cast("binary")
    )
    h = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    d = (
        df.filter(F.col(col).isNotNull() & F.col(part_col).isNotNull())
        .select(F.col(part_col).alias("__p__"), h.alias("__h__"))
        .distinct()
    )
    w = Window.partitionBy("__p__").orderBy("__h__")
    sk = (
        d.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .drop("__rk__")
        .persist()  # per-part estimates + both pair-merge sides
    )
    est_col = F.when(
        F.col("__nh__") < k, F.col("__nh__").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(2**60)) / F.col("__hk__").cast("double")
    )
    per = sk.groupBy("__p__").agg(
        F.count(F.lit(1)).alias("__nh__"), F.max("__h__").alias("__hk__")
    ).select("__p__", est_col.alias("__est__"))
    pairs = (
        per.select(F.col("__p__").alias("part_a"), F.col("__est__").alias("est_a"))
        .crossJoin(
            per.select(
                F.col("__p__").alias("part_b"), F.col("__est__").alias("est_b")
            )
        )
        .filter(F.col("part_a") < F.col("part_b"))
    )
    ra = sk.select(
        F.col("__p__").alias("part_a"), F.col("__h__"), F.lit(1).alias("__ia__")
    )
    rb = sk.select(
        F.col("__p__").alias("part_b"), F.col("__h__"), F.lit(1).alias("__ib__")
    )
    merged = (
        pairs.select("part_a", "part_b")
        .join(ra, on="part_a")
        .unionByName(
            pairs.select("part_a", "part_b")
            .join(rb, on="part_b")
            .select("part_a", "part_b", "__h__", F.lit(0).alias("__ia__"),
                    F.lit(1).alias("__ib__")),
            allowMissingColumns=True,
        )
        .na.fill({"__ib__": 0})
        .groupBy("part_a", "part_b", "__h__")
        .agg(F.max("__ia__").alias("__a__"), F.max("__ib__").alias("__b__"))
    )
    w_m = Window.partitionBy("part_a", "part_b").orderBy("__h__")
    kept = merged.withColumn("__rk__", F.row_number().over(w_m)).filter(
        F.col("__rk__") <= k
    )
    agg = kept.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).alias("__nk__"),
        F.max("__h__").alias("__uk__"),
        F.sum(F.col("__a__") * F.col("__b__")).alias("__nboth__"),
    )
    est_union = F.when(
        F.col("__nk__") < k, F.col("__nk__").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(2**60)) / F.col("__uk__").cast("double")
    )
    est_inter = F.when(
        F.col("__nk__") < k, F.col("__nboth__").cast("double")
    ).otherwise(
        (F.col("__nboth__").cast("double") / F.col("__nk__").cast("double"))
        * est_union
    )
    jac = F.col("__nboth__").cast("double") / F.col("__nk__").cast("double")
    return (
        agg.join(F.broadcast(pairs), on=["part_a", "part_b"])
        .select(
            "part_a",
            "part_b",
            F.round("est_a", 6).alias("est_a"),
            F.round("est_b", 6).alias("est_b"),
            F.round(est_union, 6).alias("est_union"),
            F.round(est_inter, 6).alias("est_intersect"),
            F.round(jac, 6).alias("jaccard_est"),
        )
    )


def hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias constant for m registers (m >= 16)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str] | None = None,
    b: int = 10,
    seed: int = 42,
) -> DataFrame:
    """HyperLogLog register table over the portable md5-60bit hash
    family: bucket = top ``b`` hash bits, register value = position of
    the leftmost 1-bit in the remaining ``60-b`` bits (``60-b+1`` for
    an all-zero tail). ``max`` per (group, bucket) IS the sketch — a
    distributive aggregate, so partial states map-side combine and two
    sketches merge by union + re-``max`` (the property that makes HLL
    the warehouse-standard distinct sketch). Unlike engine-internal
    HLL++ (``approx_distinct``), the md5 family makes every register —
    and therefore the estimate — bit-identical on ANY engine, so this
    one IS oracle-checkable. Shuffle volume: one row per distinct
    (group, bucket) ≤ groups x 2^b, regardless of input size."""
    if not (4 <= b <= 16):
        raise ValueError("hll_registers: b must be in [4, 16]")
    group_cols = list(group_cols or [])
    w_bits = 60 - b
    digest = F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(col).cast("string")).cast("binary")
    )
    h = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    bucket = F.shiftrightunsigned(h, w_bits)
    rest = h.bitwiseAND(F.lit((1 << w_bits) - 1))
    # leftmost-1 position via bit_length == length(bin(v)) — exact
    # integer arithmetic on both engines (no float log2 edge cases)
    rho = F.when(rest == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(rest))
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            *group_cols,
            bucket.alias("bucket"),
            rho.cast("long").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_distinct(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str] | None = None,
    b: int = 10,
    seed: int = 42,
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group (Flajolet, Fusy,
    Gandouet & Meunier 2007) from :func:`hll_registers`, with the
    standard small-range linear-counting correction. DETERMINISTIC and
    engine-portable: the harmonic sum is computed as the EXACT integer
    ``sum(2^(61-b-M))`` (every term a power of two, total < 2^62 — no
    float-summation-order drift between engines), empty registers
    contribute their ``2^(61-b)`` term via ``zeros``, and the only
    float steps are one division, the alpha multiply, and the
    linear-counting ``ln`` on exact integer operands — all bit-stable
    across engines. Returns group cols + (n_empty_registers,
    est_distinct). The large-range correction is omitted: with a
    60-bit hash it binds only beyond ~2^55 distinct values."""
    group_cols = list(group_cols or [])
    m = 1 << b
    scale = 61 - b  # max register value is w_bits+1 = 61-b
    regs = hll_registers(df, col, group_cols, b=b, seed=seed)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__ne__"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST({scale} - register AS INT))"
            )
        ).alias("__s__"),
    )
    zeros = (F.lit(m) - F.col("__ne__")).cast("long")
    s_total = F.col("__s__") + zeros * F.lit(1 << scale)
    e_raw = (
        F.lit(hll_alpha(m) * m * m * float(1 << scale))
        / s_total.cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        zeros.alias("n_empty_registers"),
        F.floor(est).cast("long").alias("est_distinct"),
    )
