"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (the whole point of these):

- **exact**: hash-groupBy on a fingerprint — one shuffle on the hash, no
  sort. ``keep='min'`` keeps the smallest id per group deterministically.
- **MinHash+LSH**: shingle → minhash signature → band → bucket-join.
  Signatures are zero-shuffle per-document folds (``array_min`` over the
  hashed shingle array — no explode, no aggregate, all JVM-side).
  Candidate pairs come from a self-join on (band_id, band_hash) buckets,
  so the join key cardinality is ~n_docs × n_bands, never the quadratic
  document-pair space.
- **SimHash**: 64-bit majority-vote of token hashes, computed as a
  zero-shuffle higher-order-function fold (no UDF); near-dups = hamming
  distance ≤ k via a band-join on 4 16-bit chunks (pigeonhole:
  distance ≤3 ⇒ some chunk equal).
- **n-gram Jaccard**: exact verification on LSH candidates only — the
  quadratic step runs on the (tiny) candidate set.
- **embedding cosine**: delegates to functions.similarity.

MinHash here uses md5-based hash functions so the DuckDB oracle can
reproduce signatures bit-for-bit (portable across engines), at a small
constant cost vs xxhash64. For pure-Spark pipelines pass
``portable=False`` to use xxhash64 (faster).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint, word_tokens

__all__ = [
    "exact_dedup",
    "exact_dup_groups",
    "shingles",
    "shingle_table",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "fuzzy_dedup_pairs",
    "simhash_table",
    "simhash_pairs",
    "dup_clusters",
    "dedup_incremental",
    "prefix_dup_groups",
    "band_table",
    "minhash_recall",
    "edit_distance_pairs",
    "dedup_keep_best",
    "prefix_jaccard_pairs",
]


def _spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-bound per-row stages (shingling, hashing) get full
    parallelism: a small parquet arrives as 1-2 scan partitions, which
    would serialize the expensive projection on one core. Repartitioning
    the *narrow* input (just ids + text) is far cheaper than running the
    shingle explosion serially. On a real multi-file 100 TB table the
    scan already yields thousands of partitions and this is a no-op.

    r12: the shared implementation lives in :mod:`.spread` so the query
    entries can wire the same pattern; this alias keeps every existing
    dedup-internal call site and import working unchanged.
    """
    from .spread import spread_input

    return spread_input(df)


# --------------------------------------------------------------------------- #
# exact

def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per duplicated fingerprint: (fp, n_dups, keep_id)."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Drop exact duplicates, keeping the min-id row per fingerprint.

    Implemented as a window rank over the fingerprint partition — one
    shuffle; with AQE the skewed empty-document fingerprint splits.
    """
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


# --------------------------------------------------------------------------- #
# shingling + MinHash

def shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of a text column as array<string>.

    Built with sequence+transform on the token array — codegen'd, no UDF.
    Documents shorter than k words yield their full token join (one
    shingle), matching the common MinHash convention of never producing
    an empty set for non-empty text.
    """
    # r13 (guide §1.2 per-task work): the token array is BOUND once via
    # a single-element transform before the per-position lambda reads
    # it. HOF lambdas evaluate interpreted, outside codegen CSE, so the
    # old form re-evaluated the whole split+filter tokenize per shingle
    # POSITION (``slice(toks, i+1, k)`` with ``toks`` the raw
    # expression) — O(words²) per row, the dominant cost of every
    # shingle consumer (source_overlap/minhash/ngram family; measured
    # 0.54 s → 0.29 s warm, 3.1 s → 0.45 s cold on the sf0.1 shingle
    # pass at 32 cores, byte-identical output).
    toks = word_tokens(F.lower(col))
    k_lit = F.lit(k)

    def _body(t: Column) -> Column:
        n = F.size(t)
        full = F.array_join(t, " ")
        shingled = F.transform(
            F.sequence(F.lit(0), n - k_lit),
            lambda i: F.array_join(F.slice(t, i + 1, k), " "),
        )
        return F.when(n >= k_lit, F.array_distinct(shingled)).otherwise(
            F.when(n > 0, F.array(full)).otherwise(
                F.array().cast("array<string>")
            )
        )

    return F.element_at(F.transform(F.array(toks), _body), 1)


def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sh: array<string>) — the shared shingling pass.

    At 100 TB the scan + shingle explosion dominates a fuzzy-dedup
    pipeline; every downstream stage (signatures, verification) must
    derive from ONE such table rather than re-shingling the corpus.

    Docs with no tokens are dropped here, at the pipeline root (cheap
    raw-text predicate): keeping them would give every empty doc a NULL
    signature, which concat_ws silently skips during banding — ALL empty
    docs would land in one '' bucket, pair quadratically, and the 0/0
    Jaccard would abort the job under ANSI mode.

    Plan-build note: profiling shows per-call build cost here is eager
    JVM ANALYSIS per DataFrame transformation (~15 ms each), not the
    HOF-lambda Column construction — so unlike the hyperplane-signature
    case (similarity.py) a single-parse ``F.expr`` rewrite does NOT pay
    for itself; the Column form is kept.
    """
    return _spread(
        df.select(id_col, text_col).filter(
            F.length(F.trim(F.col(text_col))) > 0
        )
    ).select(
        F.col(id_col), shingles(F.col(text_col), shingle_k).alias("sh")
    )


def _hof_signatures(
    base: DataFrame, id_col: str, num_hashes: int, portable: bool
) -> DataFrame:
    """Fold ``base.sh`` (a shingle array column) into h0..h{n-1} minhash
    columns with each md5 digest array computed ONCE.

    The digest arrays are materialized in their own projection and the
    four per-slot ``array_min`` folds reference them from the next one:
    because a digest column is expensive and referenced four times,
    Catalyst's CollapseProject keeps the boundary instead of re-inlining
    (SPARK-36718), so the md5 pass runs once per group — naively nesting
    the transforms re-evaluated shingling+md5 per hash slot (measured 3×
    slower at sf0.1)."""
    # closure factories, NOT default-arg lambdas: pyspark passes a second
    # (index) argument to any 2-parameter lambda, which would clobber a
    # default-bound loop variable
    if not portable:
        def _xxh(j: int):
            return lambda s: F.xxhash64(F.concat(F.lit(f"{j}|"), s))

        return base.select(
            F.col(id_col),
            *[
                F.array_min(F.transform(F.col("sh"), _xxh(i))).alias(f"h{i}")
                for i in range(num_hashes)
            ],
        )

    def _digester(g: int):
        return lambda s: F.md5(F.concat(F.lit(f"{g}|"), s).cast("binary"))

    def _slicer(off: int):
        return lambda d: F.substring(d, off, 8)

    n_groups = (num_hashes + 3) // 4
    with_digs = base.select(
        F.col(id_col),
        *[
            F.transform(F.col("sh"), _digester(g)).alias(f"__digs{g}__")
            for g in range(n_groups)
        ],
    )
    mins: list[Column] = []
    for j in range(num_hashes):
        g, slot = j // 4, j % 4
        mins.append(
            F.array_min(
                F.transform(F.col(f"__digs{g}__"), _slicer(1 + 8 * slot))
            ).alias(f"h{j}")
        )
    return with_digs.select(F.col(id_col), *mins)


def _combined_shingle_state(
    sets: DataFrame, id_col: str, num_hashes: int, portable: bool
) -> DataFrame:
    """(id, sh: array<long>, h0..h{n-1}) — hashed shingle arrays AND
    minhash signature columns from ONE pass over the shingle strings,
    for :func:`fuzzy_dedup_pairs`' single persisted state table. Same
    digest-group sharing as :func:`_hof_signatures`; the xxhash64
    array rides in the outer projection off the same string column.
    """
    if not portable:
        def _xxh(j: int):
            return lambda s: F.xxhash64(F.concat(F.lit(f"{j}|"), s))

        return sets.select(
            F.col(id_col),
            F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("__hs__"),
            *[
                F.array_min(F.transform(F.col("sh"), _xxh(i))).alias(f"h{i}")
                for i in range(num_hashes)
            ],
        ).withColumnRenamed("__hs__", "sh")

    def _digester(g: int):
        return lambda s: F.md5(F.concat(F.lit(f"{g}|"), s).cast("binary"))

    def _slicer(off: int):
        return lambda d: F.substring(d, off, 8)

    n_groups = (num_hashes + 3) // 4
    with_digs = sets.select(
        F.col(id_col),
        F.col("sh"),
        *[
            F.transform(F.col("sh"), _digester(g)).alias(f"__digs{g}__")
            for g in range(n_groups)
        ],
    )
    mins: list[Column] = []
    for j in range(num_hashes):
        g, slot = j // 4, j % 4
        mins.append(
            F.array_min(
                F.transform(F.col(f"__digs{g}__"), _slicer(1 + 8 * slot))
            ).alias(f"h{j}")
        )
    return with_digs.select(
        F.col(id_col),
        F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("__hs__"),
        *mins,
    ).withColumnRenamed("__hs__", "sh")


def _signatures_from_shingles(
    sets: DataFrame, id_col: str, num_hashes: int, portable: bool
) -> DataFrame:
    """Minhash signatures derived from a (persisted) :func:`shingle_table`.

    Minhash is a PER-DOCUMENT function of the shingle set, so this is a
    zero-shuffle projection: ``array_min`` folds over the stored shingle
    array. The r2 explode→min-aggregate formulation paid a corpus×shingles
    shuffle for what a per-row fold computes in place (and needed a cache
    barrier against ``InferFiltersFromGenerate`` re-evaluation — with no
    Generate node there is nothing to infer from).
    """
    return _hof_signatures(sets, id_col, num_hashes, portable)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
    portable: bool = True,
) -> DataFrame:
    """(id, h0..h{n-1}) minhash signature per document.

    Zero-shuffle per-row fold: ``array_min`` over the hashed shingle
    array (one md5 per 4 hash slots, materialized once via ``transform``).
    ``portable=True`` uses md5 (oracle-reproducible); otherwise xxhash64.
    Docs whose text yields no shingles are dropped, matching the explode
    semantics of earlier rounds and the oracle's trim filter.
    """
    # the no-shingles filter is expressed on the RAW text (shingles are
    # empty iff the trimmed text is): filtering on size(shingles)>0
    # after the projection lets predicate pushdown re-evaluate the whole
    # shingle expression below the _spread repartition — i.e. serially,
    # on the scan partitions (measured 4× at sf0.1). The raw-text
    # predicate is scan-cheap and pushes down harmlessly.
    base = (
        _spread(
            df.select(id_col, text_col).filter(
                F.length(F.trim(F.col(text_col))) > 0
            )
        )
        .select(
            F.col(id_col),
            shingles(F.col(text_col), shingle_k).alias("sh"),
        )
    )
    return _hof_signatures(base, id_col, num_hashes, portable)


def band_table(
    sig: DataFrame, id_col: str, num_hashes: int, band_size: int
) -> DataFrame:
    """(id, band, val) rows from a signature table — the LSH index
    representation: one row per (document, band), ``val`` the band's
    concatenated hash slots. This is both the self-join input for
    :func:`_band_pairs` and the persisted-ledger format for
    :func:`~tafra_spark.streaming.ops.fuzzy_ledger_dedup_sink`."""
    n_bands = num_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"h{i}") for i in range(b * band_size, (b + 1) * band_size)]
        bands.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("_", *cols).alias("val"))
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("b")
    ).select(id_col, F.col("b.band").alias("band"), F.col("b.val").alias("val"))


def _band_pairs(
    sig: DataFrame,
    id_col: str,
    num_hashes: int,
    band_size: int,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) from a signature table via banding.

    ``max_bucket`` drops (band, value) buckets holding more than that
    many docs BEFORE the self-join. A degenerate hot bucket (boilerplate
    corpora collapse many near-identical docs onto one band value) makes
    the join quadratic in the bucket size — at 1 B docs a 1 M-doc bucket
    alone is 5·10^11 candidate pairs. Large public dedup pipelines cap
    the bucket and accept the recall loss: docs in an over-full bucket
    are almost always caught by one of their OTHER bands, and a bucket
    that hot is itself a signal the docs are exact-dup-able first.
    """
    banded = band_table(sig, id_col, num_hashes, band_size)
    if max_bucket is not None:
        # one window count over the (band, val) shuffle the join needs
        # anyway — AQE reuses the exchange for the join build side
        w = Window.partitionBy("band", "val")
        banded = banded.withColumn(
            "__bn__", F.count(F.lit(1)).over(w)
        ).filter(F.col("__bn__") <= max_bucket).drop("__bn__")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 3,
    portable: bool = True,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via LSH banding.

    Documents sharing ANY band (a ``band_size``-wide slice of the
    signature) become a candidate pair. The self-join key is
    (band_index, band_value) — bucket sizes stay small under uniform
    hashing, so the shuffle is linear in corpus size. ``max_bucket``
    caps degenerate hot buckets (see :func:`_band_pairs`).

    A ``repartition(id)`` barrier sits between the signature projection
    and the band self-join: the join's two branches then hang off
    IDENTICAL shuffle stages, which AQE computes once and reuses — the
    zero-shuffle signature pipeline would otherwise be evaluated twice
    (once per branch; measured 4× slower at sf0.1). One narrow extra
    exchange, no cache to manage, and the sharing survives at any scale.
    """
    sig = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, portable
    ).repartition(id_col)
    return _band_pairs(sig, id_col, num_hashes, band_size, max_bucket)


# --------------------------------------------------------------------------- #
# n-gram Jaccard (exact verification of candidates)

def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.7,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over word k-shingle sets.

    With ``candidates`` (id_a, id_b — e.g. from LSH) the quadratic step
    only touches the candidate set: two broadcast-able joins fetch each
    side's shingle array, and the intersection/union sizes are computed
    with codegen'd array intrinsics. Without candidates, falls back to a
    full self-join on a shared-shingle bucket (small corpora only).

    ``sets`` accepts a precomputed :func:`shingle_table` so a pipeline
    that already shingled the corpus (for signatures) never re-shingles —
    see :func:`fuzzy_dedup_pairs`.
    """
    if sets is None:
        sets = shingle_table(df, text_col, id_col, shingle_k)
    # Verification compares HASHED shingles (xxhash64 longs), not the raw
    # strings: |A∩B| and |A∪B| are preserved (64-bit collisions are
    # ~1e-16 per doc pair), the per-element comparison is an 8-byte long
    # instead of a ~25-byte UTF8String, and the join phase allocates no
    # string garbage.
    hsets = sets.select(
        F.col(id_col), F.transform("sh", lambda s: F.xxhash64(s)).alias("sh")
    )
    if candidates is None:
        ex = hsets.select(id_col, F.explode("sh").alias("s"))
        candidates = (
            ex.alias("l")
            .join(
                ex.alias("r"),
                (F.col("l.s") == F.col("r.s"))
                & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            )
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
            )
            .distinct()
        )
    return _verify_jaccard(candidates, hsets, id_col, threshold)


def _verify_jaccard(
    candidates: DataFrame, hsets: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard over candidate pairs given (id, sh: array<long>)
    hashed shingle sets. Union size is derived as |A|+|B|−|A∩B| so only
    ONE array intrinsic runs per pair — the same formula the oracle uses.
    """
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        candidates.join(
            hsets.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")),
            on="id_a",
        )
        .join(
            hsets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")),
            on="id_b",
        )
        .withColumn("__i__", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("__i__")
                / (F.size("sh_a") + F.size("sh_b") - F.col("__i__")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def fuzzy_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 3,
    portable: bool = True,
    threshold: float = 0.7,
    max_bucket: int | None = None,
) -> DataFrame:
    """The full fuzzy-dedup pipeline with ONE shingling pass.

    shingle_table → (a) minhash signatures → LSH band candidates,
                    (b) exact Jaccard verification of those candidates —
    all four consumers (band join l/r, verify join a/b) derive from the
    SAME shingle pass. The naive composition (``minhash_lsh_pairs`` +
    ``ngram_jaccard_pairs``) scans and shingles the corpus twice; at
    100 TB that duplicated scan is the dominant cost.

    Sharing mechanism (r5; supersedes the r4 two-persist form): ONE
    persisted state table ``(id, sh: array<long>, h0..h{n-1})`` holds
    both derived forms the consumers read — the xxhash64-hashed shingle
    arrays (8-byte longs, ~3× smaller than the raw UTF8 strings) and
    the per-doc minhash signature — computed in a single pass over the
    shingle strings (the r4 form persisted them as two tables, and each
    persist re-ran the scan+shingle projection: two shingle passes for
    one pipeline). Band join branches prune to the signature columns,
    verify joins prune to the hashed arrays — InMemoryTableScan column
    pruning serves both from the one cache entry. The r3
    ``repartition(id)`` barrier alternative re-ran every post-exchange
    hash projection per branch (measured 2-4× slower).
    ContextCleaner auto-unpersists when the plan is dereferenced.
    """
    from pyspark import StorageLevel

    sets = shingle_table(df, text_col, id_col, shingle_k)
    state = _combined_shingle_state(
        sets, id_col, num_hashes, portable
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sig = state.select(
        F.col(id_col), *[F.col(f"h{i}") for i in range(num_hashes)]
    )
    hsets = state.select(F.col(id_col), F.col("sh"))
    cands = _band_pairs(sig, id_col, num_hashes, band_size, max_bucket)
    return _verify_jaccard(cands, hsets, id_col, threshold)


# --------------------------------------------------------------------------- #
# SimHash

def simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 63,
    portable: bool = False,
) -> DataFrame:
    """(id, sh) SimHash per document: per-bit majority vote over a hash
    of each distinct token.

    Columnar formulation for scale: explode tokens → one hash per
    (doc, token) row → a single hash-aggregate with one SUM(±1) per bit
    (all codegen'd, map-side partial agg) → reassemble the ``bits``-wide
    value from the sign of each sum. This replaces a naive per-row
    O(bits × tokens) expression tree with one shuffle on the doc id.

    ``portable=True`` hashes tokens with the first 60 bits of md5 (use
    ``bits=60``) so a DuckDB oracle reproduces signatures bit-for-bit;
    the default is xxhash64 (the mask probe never touches the sign bit
    for ``bits`` ≤ 63, so negative hashes are fine).

    SimHash is a PER-DOCUMENT function, so this is a zero-shuffle
    higher-order-function fold: hash the distinct tokens in place
    (``transform``), fold them into a per-bit counter array
    (``aggregate`` + ``zip_with`` against a constant mask array), then
    reassemble the signature — no explode, no groupBy, embarrassingly
    parallel. The previous explode→hash-aggregate formulation (r2,
    packed 3-per-long vote counters) paid a corpus×tokens shuffle and a
    ~2s Catalyst compile for its 20-sum aggregate; this plan moves zero
    rows and was measured ~2× faster end-to-end at sf0.1.

    Docs whose text has no tokens are dropped (matches the explode
    semantics and the oracle's ``length(trim(text)) > 0`` filter).
    """
    if portable:
        def tok_hash(t: Column) -> Column:
            return F.conv(
                F.substring(F.md5(t.cast("binary")), 1, 15), 16, 10
            ).cast("long")
    else:
        def tok_hash(t: Column) -> Column:
            return F.xxhash64(t)

    # constant-folded once by Catalyst; zip_with against it gives every
    # lambda step its bit mask without a per-index shift (shift builtins
    # need literal shift amounts)
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    # empty-token docs are dropped via a RAW-text predicate (tokens are
    # empty iff the trimmed text is): a size(__hs__)>0 filter after the
    # projection would be pushed below the _spread repartition and
    # re-evaluate the tokenize+hash transform serially on the scan
    # partitions
    base = (
        _spread(
            df.select(id_col, text_col).filter(
                F.length(F.trim(F.col(text_col))) > 0
            )
        )
        .select(
            F.col(id_col),
            F.transform(
                F.array_distinct(word_tokens(F.lower(F.col(text_col)))),
                tok_hash,
            ).alias("__hs__"),
        )
    )
    n = F.size(F.col("__hs__"))
    # bit b wins iff 2*cnt_b > n (≡ sum(±1) > 0, ties → 0)
    counts = F.aggregate(
        F.col("__hs__"),
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda c, m: c + F.when(h.bitwiseAND(m) != 0, 1).otherwise(0),
        ),
    )
    terms = F.zip_with(
        counts,
        masks,
        lambda c, m: F.when(c * 2 > n, m).otherwise(F.lit(0).cast("long")),
    )
    sh = F.aggregate(terms, F.lit(0).cast("long"), lambda a, t: a + t)
    return base.select(F.col(id_col), sh.alias("sh"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 63,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split the ``bits``-wide hash into
    ``max_hamming + 1`` chunks; any pair within the distance bound must
    agree on ≥1 chunk, so the self-join runs on (chunk_idx, chunk_value)
    buckets — linear shuffle, no quadratic compare.
    """
    n_chunks = max_hamming + 1
    chunk_bits = (bits + n_chunks - 1) // n_chunks
    mask = F.lit((1 << chunk_bits) - 1)

    def chunk(col: Column, j: int) -> Column:
        return F.shiftrightunsigned(col, j * chunk_bits).bitwiseAND(mask)

    # persist the signature table: the self-join below otherwise
    # recomputes the tokenize→hash→vote fold on BOTH branches. A
    # repartition(id) barrier (the minhash/fuzzy sharing mechanism) was
    # MEASURED 8× SLOWER here (10.2s vs 1.2s at sf0.1): with the
    # persist, the banded join sides are InMemoryTableScans with known
    # small sizes and AQE picks a broadcast join; behind an exchange the
    # sizes are unknown until runtime and the skewed chunk-value key
    # (common vote patterns collapse onto few values) lands in a
    # sort-merge join. One narrow row per doc (~16 B + id), so at 1 B
    # docs this is ~tens of GB across a cluster's storage tier; the
    # ContextCleaner auto-unpersists once the plan is unreferenced.
    from pyspark import StorageLevel

    h = simhash_table(
        df, text_col, id_col, bits=bits, portable=portable
    ).persist(StorageLevel.MEMORY_AND_DISK)
    chunks = [
        F.struct(F.lit(i).alias("idx"), chunk(F.col("sh"), i).alias("val"))
        for i in range(n_chunks)
    ]
    banded = h.select(
        id_col, "sh", F.explode(F.array(*chunks)).alias("c")
    ).select(id_col, "sh", F.col("c.idx").alias("idx"), F.col("c.val").alias("val"))
    joined = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.idx") == F.col("r.idx"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
            F.col("l.idx").alias("idx"),
        )
    )
    # dedup by construction instead of DISTINCT: a pair matching on
    # several chunks is kept only at its FIRST matching chunk — a codegen
    # filter replaces a shuffle of the (pre-filter) candidate set
    any_prior = None
    for j in range(n_chunks - 1):
        term = (F.col("idx") > j) & (
            chunk(F.col("sh_a"), j) == chunk(F.col("sh_b"), j)
        )
        any_prior = term if any_prior is None else (any_prior | term)
    # max_hamming=0 → a single chunk → no duplicate matches to drop
    deduped = joined if any_prior is None else joined.filter(~any_prior)
    pairs = (
        deduped
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs


# --------------------------------------------------------------------------- #
# duplicate clusters (connected components)

def dup_clusters(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Group near-duplicate PAIRS into CLUSTERS: (node, cluster_id) where
    ``cluster_id`` is the smallest doc id reachable through the pair
    graph (singletons map to themselves). This is the step between
    candidate pairs and "keep one document per duplicate group".

    Iterative min-label propagation — each round every node adopts the
    smallest label among itself and its neighbors; converges in
    O(cluster diameter) rounds. Spark-first shape: one join + one
    min-aggregate per round over the (src, dst) edge table, with
    ``localCheckpoint`` truncating the lineage so the plan does not grow
    with iterations. Near-dup clusters are dense (diameter 2-4 in
    practice), so the loop is short; ``max_iterations`` bounds
    pathological chain graphs, raising rather than silently returning
    unconverged labels. The driver-side loop controls ITERATION COUNT
    only — each round's data flow is fully distributed (the same shape
    as GraphX/GraphFrames connected components).

    The output covers ids ∪ every node appearing in ``pairs`` — ids
    absent from ``ids`` still relay labels and receive a row, so a
    filtered ids set cannot silently split clusters.
    """
    fwd = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    rev = pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    edges = fwd.unionByName(rev)
    # the node universe is ids ∪ edge endpoints: if pairs reference an id
    # missing from ``ids``, a propagation round that merely relays a
    # label THROUGH that node would otherwise look like "no change" to
    # the convergence check (new nodes don't join against the previous
    # round) and the loop would stop with split clusters
    nodes = (
        ids.select(F.col(id_col).alias("node"))
        .unionByName(edges.select(F.col("src").alias("node")))
        .distinct()
    )
    labels = nodes.select(
        F.col("node"), F.col("node").alias("label")
    ).localCheckpoint()
    for _ in range(max_iterations):
        neigh = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("label"))
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("node").alias(id_col), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(
        f"dup_clusters did not converge in {max_iterations} iterations "
        "(pathologically long chain in the pair graph); raise "
        "max_iterations"
    )


def dedup_incremental(
    batch: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup of a NEW batch against an already-ingested corpus —
    the incremental-ingest shape: the historical side contributes only
    its fingerprint set, never its text.

    A batch doc survives iff (a) its normalized-text fingerprint does
    not appear in ``seen`` and (b) it is the minimum ``id_col`` among
    batch docs sharing that fingerprint (in-batch dedup runs in the
    same pass). Returns per-doc flags: ``in_seen``, ``batch_dup``,
    ``keep`` = neither.

    Scale: at 100 TB the ``seen`` side is a fingerprint-only table
    (16-byte md5 per historical doc, written once at ingest) — the
    anti-join shuffles fingerprints, not documents, and AQE broadcasts
    it whenever a day's batch dwarfs the delta. One fingerprint shuffle
    total: the window (in-batch min) and the join share the same key.
    """
    seen_fp = seen.select(
        fingerprint(F.col(text_col)).alias("fp")
    ).distinct()
    w = Window.partitionBy("fp")
    return (
        batch.select(
            F.col(id_col), fingerprint(F.col(text_col)).alias("fp")
        )
        .join(seen_fp.withColumn("__seen__", F.lit(True)), on="fp", how="left")
        .withColumn("in_seen", F.col("__seen__").isNotNull())
        .withColumn(
            "batch_dup", F.col(id_col) != F.min(id_col).over(w)
        )
        .select(
            id_col,
            "in_seen",
            "batch_dup",
            (~F.col("in_seen") & ~F.col("batch_dup")).alias("keep"),
        )
    )


def prefix_dup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_tokens: int = 32,
) -> DataFrame:
    """Duplicate groups by PREFIX: documents sharing their first
    ``prefix_tokens`` (lowercased, whitespace-split) tokens. Catches the
    truncation family exact dedup misses — the same page captured at
    different lengths, a document and its clipped re-crawl, partial
    re-extractions — which agree on a long prefix but not the full
    fingerprint. Docs shorter than the prefix window key on their full
    token join, so two docs group iff they agree on min(len, window)
    tokens AND have the same length when under the window — a short doc
    never groups with a longer doc (their keyed token counts differ);
    cross-length containment is the fuzzy pipeline's job.

    Same shape (and scale story) as :func:`exact_dup_groups`: one
    md5-fingerprint hash aggregate with map-side partials; the prefix
    projection is narrow. Output: (prefix_fp, n_dups, keep_id) for
    groups with 2+ members, keep = min id.
    """
    toks = word_tokens(F.lower(F.col(text_col)))
    prefix = F.array_join(F.slice(toks, 1, prefix_tokens), " ")
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.md5(prefix.cast("binary")).alias("prefix_fp"))
        .groupBy("prefix_fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def minhash_recall(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 8,
    band_size: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Recall of MinHash-LSH candidate generation against brute-force
    Jaccard truth — the quality dial for the banding trade, mirroring
    :func:`~tafra_spark.functions.similarity.ann_recall` /
    ``pq_recall``: n_true (pairs with exact shingle-Jaccard ≥
    ``threshold``), n_candidates (LSH proposals), n_hit (their
    intersection), recall fixed-point.

    EVAL-ONLY by design: the truth side is a deliberate ALL-PAIRS
    Jaccard — quadratic, exactly what the LSH path exists to avoid —
    run at validation scale (thousands of docs) to calibrate
    ``num_hashes``/``band_size`` before a production run, never on the
    full corpus (the same posture as the simhash brute-force oracle).

    Returns ONE row: (n_true, n_candidates, n_hit, recall_q6).
    """
    from pyspark import StorageLevel

    sets = shingle_table(df, text_col, id_col, shingle_k)
    hsets = sets.select(
        F.col(id_col), F.transform("sh", lambda s: F.xxhash64(s)).alias("hs")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = hsets.select(F.col(id_col).alias("id_a"), F.col("hs").alias("ha"))
    b = hsets.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hb"))
    inter = F.size(F.array_intersect("ha", "hb"))
    union = F.size("ha") + F.size("hb") - inter
    truth = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter((inter / union) >= F.lit(float(threshold)))
        .select("id_a", "id_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cand = minhash_lsh_pairs(
        df,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        band_size=band_size,
        shingle_k=shingle_k,
        portable=True,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    hits = truth.join(cand, on=["id_a", "id_b"], how="left_semi")
    t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    c = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    h = hits.agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    return (
        t.crossJoin(c)
        .crossJoin(h)
        .withColumn(
            "recall_q6",
            F.when(
                F.col("n_true") > 0,
                F.floor(
                    F.col("n_hit") / F.col("n_true") * 1000000 + F.lit(0.5)
                ).cast("long"),
            ),
        )
    )

def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 10,
    num_hashes: int = 8,
    band_size: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs verified by LEVENSHTEIN distance — the
    edit-metric member of the dedup family (MinHash verifies set
    Jaccard, SimHash verifies hamming; this verifies character edits,
    the right metric for short fields and OCR/typo corruption).

    Candidates come from the SAME MinHash-LSH banding as
    :func:`fuzzy_dedup_pairs` (linear shuffle, never all-pairs); only
    candidates pay the O(len·len) edit-distance compare, and Spark's
    bounded ``levenshtein(l, r, threshold)`` abandons a row as soon as
    the running distance exceeds ``max_dist`` — the standard
    banded-DP cutoff, O(len·max_dist) per pair. At corpus scale the
    quadratic-in-length step is therefore confined to LSH-similar
    pairs with a per-pair cost ceiling. Returns (id_a, id_b, dist),
    id_a < id_b, dist ≤ ``max_dist``.
    """
    cand = minhash_lsh_pairs(
        df, text_col, id_col, num_hashes, band_size, shingle_k
    )
    texts = df.select(F.col(id_col), F.col(text_col))
    la = texts.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta__")
    )
    lb = texts.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb__")
    )
    # bounded levenshtein returns -1 when the threshold is exceeded
    dist = F.levenshtein(F.col("__ta__"), F.col("__tb__"), max_dist)
    return (
        cand.join(la, on="id_a")
        .join(lb, on="id_b")
        .withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )


def dedup_keep_best(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_col: Column | None = None,
) -> DataFrame:
    """Quality-aware canonical selection: within each exact-duplicate
    group (same :func:`fingerprint`), keep the HIGHEST-quality copy
    instead of :func:`exact_dedup`'s min-id copy. Real corpora carry
    the same text at different extraction quality (one copy truncated,
    one with boilerplate stripped); production dedup keeps the best
    copy, not an arbitrary one.

    ``quality_col`` defaults to the q4 fixed-point of
    :func:`tafra_spark.functions.text.quality_score`, so the keep rule
    is engine-portable (ranking on a raw float would hash-drift);
    ``id_col`` breaks quality ties. Same plan as exact_dedup — ONE
    window shuffle keyed by the fingerprint, AQE splitting any skewed
    (e.g. empty-text) group.

    Returns the kept rows plus ``group_n`` (the duplicate-group size),
    so downstream weighting can up-sample texts that appeared often.
    """
    from .text import quality_score

    if quality_col is None:
        quality_col = F.floor(
            quality_score(F.col(text_col)) * F.lit(10000.0) + F.lit(0.5)
        ).cast("long")
    # materialize fingerprint + quality as COLUMNS before windowing:
    # partitioning two windows by the raw md5 EXPRESSION makes Catalyst
    # treat each occurrence as distinct and plan a second exchange (and
    # re-hash the corpus); partitioned by the column, both windows and
    # the row filter share ONE exchange and one md5 pass
    w = Window.partitionBy("__fp__").orderBy(
        F.col("__q__").desc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy("__fp__")
    return (
        df.withColumn("__q__", quality_col)
        .withColumn("__fp__", fingerprint(F.col(text_col)))
        .withColumn("__rn__", F.row_number().over(w))
        .withColumn("group_n", F.count(F.lit(1)).over(wn).cast("long"))
        .filter(F.col("__rn__") == 1)
        .withColumn("quality_q4", F.col("__q__"))
        .drop("__rn__", "__q__", "__fp__")
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_pct: int = 60,
    shingle_k: int | None = None,
) -> DataFrame:
    """EXACT set-similarity join by prefix filtering (the PPJoin family
    — Chaudhuri et al. 2006 "A Primitive Operator for Similarity
    Joins"; Xiao et al. 2008): every document pair whose distinct-token
    Jaccard ≥ ``threshold_pct``/100, with NO recall loss — the exact
    complement to :func:`minhash_lsh_pairs`' probabilistic recall dial.

    The prefix-filtering lemma: order each doc's distinct tokens by a
    GLOBAL total order (document frequency asc, token asc — rarest
    first) and keep only the first ``n - ceil(t*n) + 1`` as its prefix;
    any two sets with Jaccard ≥ t must share at least one PREFIX token.
    Candidates therefore come from a token self-join over prefixes
    only, and an exact intersect verifies. High thresholds make
    prefixes short (t=0.9 → ~10% of tokens), and because prefixes hold
    each doc's RAREST tokens, the join key distribution is maximally
    skew-hostile — ubiquitous tokens (the LSH degenerate-bucket hazard)
    are exactly the ones prefixes exclude.

    Plan: token explode + df count (one shuffle), frequency-ordered
    array rebuild (one shuffle, aggregating (df, token) structs
    per doc), prefix self-join (shuffle keyed by rare tokens, fan-out
    bounded by prefix df), distinct pair set, verify join. All
    exchanges linear in corpus tokens; the quadratic blow-up LSH bounds
    with ``max_bucket`` is bounded here by the rarest-token df — a
    structural guarantee, not a cap.

    All arithmetic is integer (``100·|A∩B| >= t_pct·|A∪B|`` and a q6
    fixed-point Jaccard via integer div), so results hash identically
    on any engine. Returns (id_a, id_b, n_a, n_b, n_common,
    jaccard_q6) with id_a < id_b.
    """
    if not 0 < int(threshold_pct) <= 100:
        raise ValueError("prefix_jaccard_pairs: threshold_pct in (0, 100]")
    t_pct = int(threshold_pct)
    # set elements: distinct unigram tokens (shingle_k=None) or distinct
    # word k-shingles — shingles are the discriminative choice for
    # near-duplicate text (unigram SETS converge on corpora drawn from
    # a shared vocabulary; 3-gram sets do not), and match the Jaccard
    # the LSH pipeline verifies
    elems = (
        F.array_distinct(word_tokens(F.lower(F.col(text_col))))
        if shingle_k is None
        else shingles(F.col(text_col), int(shingle_k))
    )
    base = _spread(
        df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
            F.col(id_col), F.col(text_col)
        )
    ).select(F.col(id_col), elems.alias("__ws__"))
    ex = base.select(F.col(id_col), F.explode("__ws__").alias("__w__"))
    dfreq = ex.groupBy("__w__").agg(F.count(F.lit(1)).alias("__df__"))
    ordered = (
        ex.join(dfreq, on="__w__")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__df__", "__w__"))
            ).alias("__o__")
        )
        .select(
            F.col(id_col),
            F.transform("__o__", lambda s: s["__w__"]).alias("__ows__"),
        )
    )
    n = F.size("__ows__")
    # prefix length p = n - ceil(t*n) + 1, integer-exact:
    # ceil(t_pct*n/100) = (t_pct*n + 99) div 100
    p = n - F.expr(f"({t_pct} * size(__ows__) + 99) div 100") + F.lit(1)
    pre = ordered.select(
        F.col(id_col),
        F.col("__ows__"),
        n.cast("long").alias("__n__"),
        F.slice("__ows__", 1, p).alias("__prefix__"),
    )
    pex = pre.select(F.col(id_col), F.explode("__prefix__").alias("__w__"))
    cand = (
        pex.alias("a")
        .join(
            pex.alias("b"),
            (F.col("a.__w__") == F.col("b.__w__"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    pa = pre.select(
        F.col(id_col).alias("id_a"),
        F.col("__ows__").alias("__wa__"),
        F.col("__n__").alias("n_a"),
    )
    pb = pre.select(
        F.col(id_col).alias("id_b"),
        F.col("__ows__").alias("__wb__"),
        F.col("__n__").alias("n_b"),
    )
    inter = F.size(F.array_intersect("__wa__", "__wb__")).cast("long")
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return (
        cand.join(pa, on="id_a")
        .join(pb, on="id_b")
        .withColumn("n_common", inter)
        .filter(F.lit(100) * F.col("n_common") >= F.lit(t_pct) * union)
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr(
                "CAST(n_common * 1000000 div (n_a + n_b - n_common)"
                " AS BIGINT)"
            ).alias("jaccard_q6"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_pct: int = 80,
    shingle_k: int | None = 3,
) -> DataFrame:
    """EXACT set-CONTAINMENT similarity join: every ORDERED pair
    (a, b), a ≠ b, with ``|S(a) ∩ S(b)| / |S(a)| ≥ threshold_pct/100``
    — document a's shingle set is (nearly) contained in b's.

    Containment is the asymmetric complement to Jaccard dedup
    (:func:`prefix_jaccard_pairs`): a short document quoted inside a
    much longer one scores near-zero Jaccard (the union is dominated by
    the container) but containment ≈ 1. It is the signal for
    quote/excerpt extraction, snippet-inclusion contamination, and
    "this page embeds that page" relations that symmetric dedup
    structurally cannot see (Broder 1997 distinguishes resemblance vs
    containment for exactly this reason).

    Prefix-filtering lemma (asymmetric form): order all shingles by a
    global total order (document frequency asc, shingle asc). If
    ``|A ∩ B| ≥ ceil(t·|A|)`` then A's prefix — its first
    ``|A| − ceil(t·|A|) + 1`` rarest shingles — must contain at least
    one element of B (otherwise every shared element sits in A's
    ``ceil(t·|A|) − 1``-long suffix, too few). So candidates come from
    joining A-side PREFIX tokens against B-side FULL token postings;
    exact ``array_intersect`` verifies. No recall loss.

    Plan: one token-df shuffle, one per-doc frequency-ordered rebuild,
    then the candidate join keyed by A's rarest shingles: fan-out per
    key = (#prefixes holding the shingle) × df(shingle), and prefixes
    hold only LOW-df shingles, so the product stays linear — the
    B-side posting list of a ubiquitous shingle is long exactly when
    the A-side prefix occurrence count is ~zero. A cheap
    ``|B| ≥ ceil(t·|A|)`` size filter prunes candidates before the
    verify join. All arithmetic integer; returns (id_a, id_b, n_a,
    n_b, n_common, containment_q6) where id_a is the contained side.
    """
    if not 0 < int(threshold_pct) <= 100:
        raise ValueError("containment_pairs: threshold_pct in (0, 100]")
    t_pct = int(threshold_pct)
    elems = (
        F.array_distinct(word_tokens(F.lower(F.col(text_col))))
        if shingle_k is None
        else shingles(F.col(text_col), int(shingle_k))
    )
    base = _spread(
        df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
            F.col(id_col), F.col(text_col)
        )
    ).select(F.col(id_col), elems.alias("__ws__"))
    ex = base.select(F.col(id_col), F.explode("__ws__").alias("__w__"))
    dfreq = ex.groupBy("__w__").agg(F.count(F.lit(1)).alias("__df__"))
    ordered = (
        ex.join(dfreq, on="__w__")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__df__", "__w__"))
            ).alias("__o__")
        )
        .select(
            F.col(id_col),
            F.transform("__o__", lambda s: s["__w__"]).alias("__ows__"),
        )
    )
    n = F.size("__ows__")
    # prefix length p = n - ceil(t*n) + 1; ceil(t_pct*n/100) exact as
    # (t_pct*n + 99) div 100
    p = n - F.expr(f"({t_pct} * size(__ows__) + 99) div 100") + F.lit(1)
    pre = ordered.select(
        F.col(id_col),
        F.col("__ows__"),
        n.cast("long").alias("__n__"),
        F.slice("__ows__", 1, p).alias("__prefix__"),
    )
    # A side: prefix postings only; B side: FULL postings (the shared
    # element can sit anywhere in the container's order)
    pex = pre.select(F.col(id_col), F.explode("__prefix__").alias("__w__"))
    cand = (
        pex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.__w__") == F.col("b.__w__"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    pa = pre.select(
        F.col(id_col).alias("id_a"),
        F.col("__ows__").alias("__wa__"),
        F.col("__n__").alias("n_a"),
    )
    pb = pre.select(
        F.col(id_col).alias("id_b"),
        F.col("__ows__").alias("__wb__"),
        F.col("__n__").alias("n_b"),
    )
    inter = F.size(F.array_intersect("__wa__", "__wb__")).cast("long")
    return (
        cand.join(pa, on="id_a")
        .join(pb, on="id_b")
        # size prune: |A∩B| ≤ |B|, so containment ≥ t needs 100·n_b ≥ t·n_a
        .filter(F.lit(100) * F.col("n_b") >= F.lit(t_pct) * F.col("n_a"))
        .withColumn("n_common", inter)
        .filter(F.lit(100) * F.col("n_common") >= F.lit(t_pct) * F.col("n_a"))
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr("CAST(n_common * 1000000 div n_a AS BIGINT)").alias(
                "containment_q6"
            ),
        )
    )
