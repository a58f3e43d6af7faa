"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY.md §1.4) — streaming is a scale
extension. The events table (``event_id, ts, user_id, event_type,
value, props``) doubles as a replayable stream source: read the same
parquet directory with ``readStream`` and every operator below works
identically in batch and streaming mode (same DataFrame expressions),
which is the Structured Streaming contract.

Operators:
- ``windowed_counts`` — tumbling-window event counts with a watermark
  for late data.
- ``sessionize`` — gap-based session assignment. In batch mode this is
  the classic lag/cumsum window; in streaming it is
  ``applyInPandasWithState``-shaped (per-user state) — here we expose
  the batch formulation, which also serves as the oracle for the
  stateful variant.
- ``stream_events`` / ``run_to_memory_sink`` — harness helpers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "EVENTS_SCHEMA",
    "stream_events",
    "windowed_counts",
    "sessionize",
    "sessionize_stateful",
    "dedup_stream",
    "interval_join",
    "corpus_gate_stream",
    "ledger_dedup_sink",
    "fuzzy_ledger_dedup_sink",
    "quality_monitor_sink",
    "k_anonymity_monitor_sink",
    "countmin_ledger_sink",
    "countmin_read",
    "scd2_dim_sink",
    "scd2_dim_read",
    "run_to_memory_sink",
]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """Replay an events parquet directory as a stream (file source).
    ``maxFilesPerTrigger=1`` keeps micro-batches bounded."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    fixed_point: int | None = None,
) -> DataFrame:
    """Tumbling-window counts + value sum per event_type.

    With a streaming input the watermark bounds state: windows older
    than (max event time − watermark) are finalized and evicted —
    mandatory for an unbounded 100 TB/day stream. The same expression
    runs in batch mode (watermark is a no-op there).

    ``fixed_point=s`` sums ``floor(value*s + 0.5)`` as exact longs and
    divides back — an order-independent (hence engine-reproducible) sum;
    the default is the engine-native double sum.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    if fixed_point:
        sum_value = (
            F.sum(F.floor(F.col("value") * F.lit(float(fixed_point)) + F.lit(0.5)))
            / F.lit(float(fixed_point))
        ).alias("sum_value")
    else:
        sum_value = F.sum("value").alias("sum_value")
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_value,
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch formulation).

    A new session starts when the gap to the user's previous event
    exceeds ``gap_minutes``. One shuffle on user_id; the per-user sort
    happens inside the window operator. Returns per-session rows:
    (user_id, session_id, session_start, session_end, n_events).
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = gap_minutes * 60
    # cast("timestamp") first: TIMESTAMP_NTZ (Spark 4's inference for
    # tz-naive parquet) cannot cast to BIGINT directly; the intermediate
    # cast is a no-op for TIMESTAMP and lossless for NTZ under UTC.
    ts_s = F.col("ts").cast("timestamp").cast("long")
    prev_s = F.lag("ts").over(w).cast("timestamp").cast("long")
    with_gap = events.withColumn(
        "new_session",
        (F.coalesce(ts_s - prev_s, F.lit(gap_s + 1)) > gap_s).cast("int"),
    )
    with_sid = with_gap.withColumn(
        "session_seq", F.sum("new_session").over(w)
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumnRenamed("session_seq", "session_id")
    )


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once ingest dedup: drop rows whose ``keys`` were already
    seen, with state bounded by the watermark.

    Streaming: ``dropDuplicatesWithinWatermark`` keeps one state entry
    per key only until the watermark passes — mandatory for an unbounded
    stream (plain dropDuplicates would grow state forever). Batch: plain
    ``dropDuplicates`` (same result on a bounded input whose duplicates
    arrive within the watermark).
    """
    key_list = list(keys)
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(key_list)
    return events.dropDuplicates(key_list)


#: (session_start_us, last_event_us, n_events, session_seq)
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)

_SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming-native gap sessionization via ``applyInPandasWithState``.

    Per-user state = (open-session start, last event time, count, seq).
    A micro-batch's events are folded into the state in timestamp order;
    sessions CLOSE (and emit) when the gap to the next event exceeds
    ``gap_minutes`` — the still-open session stays in state, so emitted
    rows are exactly the closed sessions. State is four longs per user:
    bounded, shuffle is one exchange on user_id per micro-batch.

    The batch formulation (:func:`sessionize`) is the oracle: on a
    fully-replayed in-order stream, the closed sessions here equal the
    batch sessions minus each user's final (still-open) session.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdfs, state) -> "Iterator[pd.DataFrame]":  # noqa: F821
        import pandas as pd

        (user_id,) = key
        if state.exists:
            start_us, last_us, n, seq = state.get
        else:
            start_us, last_us, n, seq = None, None, 0, 0
        closed: list[tuple] = []
        # concatenate ALL Arrow chunks before sorting: a large group spans
        # several pdfs (arrow.maxRecordsPerBatch) and per-chunk sorting
        # would fold out-of-order timestamps into the state
        chunks = list(pdfs)
        if chunks:
            batch = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            for ts in batch.sort_values("ts")["ts"]:
                t = ts.value // 1000  # pandas ns → µs
                if last_us is None:
                    start_us, last_us, n, seq = t, t, 1, 1
                elif t - last_us > gap_us:
                    closed.append((user_id, seq, start_us, last_us, n))
                    seq += 1
                    start_us, last_us, n = t, t, 1
                else:
                    last_us = t
                    n += 1
        state.update((start_us, last_us, n, seq))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_id", "session_start", "session_end",
                    "n_events",
                ],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_to_memory_sink(
    streaming_df: DataFrame,
    query_name: str,
    timeout_s: int = 60,
    output_mode: str = "complete",
) -> DataFrame:
    """Run a streaming query to completion against a memory sink and
    return the materialized result (testing harness)."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = streaming_df.sparkSession
    return spark.table(query_name)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    within_minutes: int = 60,
    watermark: str = "2 hours",
    left_type: str = "view",
    right_type: str = "purchase",
) -> DataFrame:
    """Stream-stream (or batch) interval join: pair each ``left_type``
    event with the same user's ``right_type`` events that follow within
    ``within_minutes`` — the view→purchase attribution shape.

    In streaming mode BOTH sides carry a watermark and the join
    condition bounds event time from both directions, which is exactly
    what Structured Streaming requires to evict join state: a buffered
    left row can be dropped once the right watermark passes
    ``l_ts + within_minutes``. Unbounded conditions would accumulate
    state forever at 100 TB/day. In batch mode the same expression is
    an ordinary range-predicated equi-join on user_id (one shuffle,
    AQE-skew-splittable).
    """
    l = left.filter(F.col("event_type") == left_type)
    r = right.filter(F.col("event_type") == right_type)
    if l.isStreaming:
        l = l.withWatermark("ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("ts", watermark)
    l = l.select(
        F.col("user_id"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    )
    r = r.select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    )
    return (
        l.join(
            r,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (
                F.col("r_ts")
                <= F.col("l_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES")
            ),
        )
        .select(
            "user_id",
            "l_event_id",
            "r_event_id",
            "l_ts",
            "r_ts",
            (
                F.col("r_ts").cast("timestamp").cast("long")
                - F.col("l_ts").cast("timestamp").cast("long")
            ).alias("lag_seconds"),
        )
    )


def corpus_gate_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ingest_ts",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_dup_q4: int = 5000,
    max_top_q4: int = 2500,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming front end of the corpus-prep funnel: stateless quality
    gate + watermark-bounded exact dedup on the content fingerprint.

    The gate (token window + repetition ceilings — the same rules as
    :func:`~tafra_spark.functions.pipeline.quality_gate`) is a pure
    projection, so it runs unchanged on a stream. The dedup stage keeps
    one state entry per fingerprint until the event-time watermark
    passes — on an unbounded ingest feed this is the only way exact
    dedup has bounded state; cross-watermark duplicates are the batch
    backfill's job (:func:`~tafra_spark.functions.dedup
    .dedup_incremental` against the fingerprint ledger).

    Batch mode runs the same plan with plain ``dropDuplicates`` —
    in BOTH modes the surviving row per fingerprint is arrival/partition
    dependent (streaming semantics); the deterministic min-id rule is
    the batch funnel's (:func:`corpus_prep`) property, not this one's.
    Output: (id, ts, fp, n_tokens) of gated, first-seen docs.
    """
    from ..functions.pipeline import _gate_mask, repetition_stats
    from ..functions.text import fingerprint

    stats = repetition_stats(
        docs,
        text_col,
        id_col,
        include_empty=True,
        keep_cols=(
            F.col(ts_col),
            fingerprint(F.col(text_col)).alias("fp"),
        ),
    )
    # the SAME shared bitmask as the batch gate — a third hand-written
    # copy of the thresholds is how stream/batch parity silently breaks
    kept = stats.filter(
        _gate_mask(min_tokens, max_tokens, max_dup_q4, max_top_q4) == 0
    ).select(id_col, ts_col, "fp", "n_tokens")
    if docs.isStreaming:
        return kept.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(["fp"])
    return kept.dropDuplicates(["fp"])


def ledger_dedup_sink(
    out_path: str,
    ledger_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """The continuous-ingest dedup loop: a ``foreachBatch`` function
    that exact-dedups each micro-batch against the PERSISTED corpus
    fingerprint ledger, writes survivors, and appends their
    fingerprints back — so the next batch (and the next job, and the
    batch backfill) all dedup against one shared source of truth.
    This is the streaming composition of
    :func:`~tafra_spark.functions.dedup.dedup_incremental`: the
    watermark dedup in :func:`corpus_gate_stream` bounds state by TIME;
    the ledger carries the unbounded cross-job memory.

    Replay-idempotent by construction (foreachBatch is at-least-once):
    both sinks are partitioned by ``batch_id`` and each batch
    OVERWRITES its own partition, and the ledger read excludes the
    current batch's partition — so a replayed batch sees exactly the
    ledger state of its first attempt and rewrites identical output.

    Scale: the ledger holds one 32-hex fingerprint per corpus document
    (~5 B rows per 100 TB of text — a few hundred GB of parquet); the
    anti-join shuffles fingerprints, never text, and AQE broadcasts the
    batch side when a micro-batch dwarfs it.

    Use: ``stream.writeStream.foreachBatch(
    ledger_dedup_sink(out, ledger)).trigger(availableNow=True)...``;
    call the returned function directly for batch backfills.
    """
    from ..functions.text import fingerprint

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark import StorageLevel
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        try:
            seen_fp = (
                spark.read.parquet(ledger_path)
                .filter(F.col("batch_id") != F.lit(int(batch_id)))
                .select("fp")
            )
        except AnalysisException as ex:
            # ONLY "no ledger yet" means "first batch": a missing path,
            # or an existing directory with no committed data files (a
            # crashed batch-0 write leaves _temporary behind; an
            # orchestrator may mkdir the path) — Spark raises
            # UNABLE_TO_INFER_SCHEMA for the latter. Any other read
            # failure (permissions, corruption, transient listing error)
            # must abort the batch: swallowing it would run the batch
            # with NO history anti-join and permanently admit duplicates.
            msg = str(ex)
            if (
                "PATH_NOT_FOUND" not in msg
                and "UNABLE_TO_INFER_SCHEMA" not in msg
            ):
                raise
            seen_fp = None
        w = Window.partitionBy("fp")
        flagged = batch_df.withColumn(
            "fp", fingerprint(F.col(text_col))
        ).withColumn("__min_id__", F.min(id_col).over(w))
        survivors = flagged.filter(F.col(id_col) == F.col("__min_id__"))
        if seen_fp is not None:
            survivors = survivors.join(seen_fp, on="fp", how="left_anti")
        # persist: both writes below consume this plan; without it the
        # fp window AND the full-ledger anti-join run twice per batch —
        # at a ~5B-row ledger that doubles the dominant per-batch cost
        survivors = survivors.drop("__min_id__").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            survivors.drop("fp").write.mode("overwrite").parquet(
                f"{out_path}/batch_id={batch_id}"
            )
            survivors.select("fp").distinct().write.mode(
                "overwrite"
            ).parquet(f"{ledger_path}/batch_id={batch_id}")
        finally:
            survivors.unpersist()

    return process


def fuzzy_ledger_dedup_sink(
    out_path: str,
    ledger_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
    max_bucket: int = 1024,
):
    """Near-duplicate (MinHash-LSH) counterpart of
    :func:`ledger_dedup_sink`: each micro-batch's documents are dropped
    when ANY of their signature bands collides with the persisted band
    ledger (near-dup of an already-ingested doc) or with a smaller-id
    batch document sharing a band (in-batch near-dup, greedy keep-min —
    a doc whose only match was itself dropped still goes, the standard
    transitive-cluster reading). Survivors' (band, val) rows append to
    the ledger. Precision/recall follow the usual banding trade
    (``num_hashes``/``band_size``); the collision decision is pure LSH
    — the exact-Jaccard verify step needs both sides' shingles, which a
    signature-only ledger deliberately does not store (ledger size is
    n_bands rows per corpus doc, not the corpus text).

    Same replay-idempotency scheme as the exact sink: both sinks
    partition by ``batch_id``, each batch overwrites its own partition,
    and the ledger read excludes the current batch's partition.

    Empty/whitespace documents have no shingles, hence no signature —
    they ride a reserved band (−1) keyed by their EXACT fingerprint, so
    repeated empty docs still dedup instead of accumulating.
    ``max_bucket`` caps the in-batch self-join's per-(band, value)
    bucket (the :func:`~tafra_spark.functions.dedup._band_pairs`
    hot-bucket guard): an over-full boilerplate bucket would otherwise
    pair quadratically inside one micro-batch. The history check is a
    semi-join — linear, no cap needed.
    """
    from ..functions.dedup import band_table, minhash_signatures
    from ..functions.text import fingerprint

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark import StorageLevel
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        sig = minhash_signatures(
            batch_df, text_col, id_col, num_hashes, shingle_k
        )
        empty_bands = batch_df.filter(
            F.length(F.trim(F.col(text_col))) == 0
        ).select(
            F.col(id_col),
            F.lit(-1).alias("band"),
            fingerprint(F.col(text_col)).alias("val"),
        )
        bands = (
            band_table(sig, id_col, num_hashes, band_size)
            .unionByName(empty_bands)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            hist = (
                spark.read.parquet(ledger_path)
                .filter(F.col("batch_id") != F.lit(int(batch_id)))
                .select("band", "val")
            )
        except AnalysisException as ex:
            msg = str(ex)
            if (
                "PATH_NOT_FOUND" not in msg
                and "UNABLE_TO_INFER_SCHEMA" not in msg
            ):
                raise
            hist = None
        w_bucket = Window.partitionBy("band", "val")
        capped = (
            bands.withColumn("__bn__", F.count(F.lit(1)).over(w_bucket))
            .filter(F.col("__bn__") <= max_bucket)
            .drop("__bn__")
        )
        dup_ids = capped.join(
            capped.select(
                F.col(id_col).alias("__oid__"), "band", "val"
            ).filter(F.lit(True)),
            on=["band", "val"],
        ).filter(F.col("__oid__") < F.col(id_col)).select(id_col)
        if hist is not None:
            dup_ids = dup_ids.unionByName(
                bands.join(hist, on=["band", "val"], how="left_semi").select(
                    id_col
                )
            )
        dup_ids = dup_ids.distinct()
        survivors = batch_df.join(dup_ids, on=id_col, how="left_anti").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            survivors.write.mode("overwrite").parquet(
                f"{out_path}/batch_id={batch_id}"
            )
            (
                bands.join(survivors.select(id_col), on=id_col, how="left_semi")
                .select("band", "val")
                .distinct()
                .write.mode("overwrite")
                .parquet(f"{ledger_path}/batch_id={batch_id}")
            )
        finally:
            survivors.unpersist()
            bands.unpersist()

    return process

def quality_monitor_sink(report_path: str, rules: list):
    """Continuous data-quality monitoring: a ``foreachBatch`` function
    that runs :func:`~tafra_spark.functions.checks.constraint_report`
    on every micro-batch and appends the per-batch violation report —
    the streaming face of the declarative constraint checker, filling
    the role Deequ's ``VerificationSuite`` plays on a batch lake.

    Each report row is (batch_id, rule_idx, rule, col, n_violations,
    n_rows, passed); alerting is a trivial filter over the report table
    (``passed = false``). Replay-idempotent like the ledger sinks:
    the report is partitioned by ``batch_id`` and each batch OVERWRITES
    its own partition, so at-least-once redelivery rewrites an
    identical report instead of double-counting.

    Scale: the report adds ONE aggregate pass over data the batch
    already materialized — no extra shuffle, no state store; the report
    table grows by len(rules) rows per batch regardless of batch size.

    Use: ``stream.writeStream.foreachBatch(
    quality_monitor_sink(path, rules)).trigger(...)``; call the
    returned function directly to monitor batch backfills.
    """
    from ..functions.checks import constraint_report

    def process(batch_df: DataFrame, batch_id: int) -> None:
        report = constraint_report(batch_df, rules, n_rows_col="n_rows")
        report.write.mode("overwrite").parquet(
            f"{report_path}/batch_id={batch_id}"
        )

    return process

def countmin_ledger_sink(
    sketch_path: str,
    col: str,
    depth: int = 5,
    width: int = 1024,
    seed: int = 42,
    portable: bool = True,
):
    """Streaming frequency sketch: a ``foreachBatch`` function that
    builds each micro-batch's Count-Min counter table and persists it
    under the batch's OWN partition — the mergeability of the sketch
    (counters add) is what makes this correct: the full-stream sketch
    is simply the per-cell SUM across batch partitions, computed at
    read time by :func:`countmin_read`.

    Replay-idempotent like every ledger sink here: an at-least-once
    redelivery overwrites its identical partition instead of
    double-counting. State is ZERO on the streaming side — no state
    store, no watermark; the sketch table is ≤ depth·width rows per
    batch regardless of batch size, so a year of micro-batches is
    still a trivial read-side aggregate. ``portable=True`` (default)
    keeps the md5 hash family so the merged sketch stays
    cross-engine-verifiable.
    """
    from ..functions.sketches import count_min_build

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sk = count_min_build(
            batch_df, col, depth=depth, width=width, seed=seed,
            portable=portable,
        )
        sk.write.mode("overwrite").parquet(
            f"{sketch_path}/batch_id={batch_id}"
        )

    return process


def countmin_read(spark, sketch_path: str) -> DataFrame:
    """Merge all batch partitions of a :func:`countmin_ledger_sink`
    table into one sketch: per-cell counter sum (the CM merge rule).
    Estimates from the merged table go through
    :func:`~tafra_spark.functions.sketches.count_min_estimate`
    unchanged."""
    return (
        spark.read.parquet(sketch_path)
        .groupBy("i", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def scd2_dim_sink(
    spark,
    dim_path: str,
    keys,
    tracked,
    effective_col: str = "effective_ts",
    keep_versions: int | None = None,
):
    """Streaming SCD2 dimension maintenance: a ``foreachBatch``
    function that merges each micro-batch of change events into a
    versioned type-2 dimension table with
    :func:`~tafra_spark.operators.scd.scd2_merge`.

    Each batch writes the FULL post-merge dimension under its own
    ``version=<batch_id>`` partition; :func:`scd2_dim_read` serves the
    highest version. That makes the sink replay-idempotent the same
    way the ledger sinks are — an at-least-once redelivery overwrites
    its own version and the read side still picks the newest — and
    every historical dimension state stays queryable by version (the
    warehouse "time travel" contract), on top of SCD2's own in-row
    valid_from/valid_to history.

    Scale note: rewriting the open slice per batch is one key-shuffle
    over |dimension| — the standard cadence is micro-batches of
    minutes against dimensions orders of magnitude smaller than the
    fact stream. Closed rows pass through untouched; at rest the
    table is partitioned by ``is_current`` so as-of readers skip the
    open slice and point-in-time readers skip nothing they don't need.

    Storage growth: each batch adds a full-dimension snapshot, i.e.
    ~|dimension| rows per micro-batch forever. ``keep_versions=N``
    prunes to the newest N version partitions after each successful
    write (N >= 2 keeps the previous version readable during the
    write); ``None`` keeps everything — choose it only when unbounded
    time travel is genuinely wanted, and compact offline otherwise.
    Pruning is replay-safe: a redelivered old batch rewrites its own
    version and is itself pruned once newer versions land.
    """
    if keep_versions is not None and keep_versions < 1:
        raise ValueError("scd2_dim_sink: keep_versions must be >= 1")
    from ..operators.scd import scd2_merge

    key_list = list(keys)
    tracked_list = list(tracked)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        eff_type = batch_df.schema[effective_col].dataType
        try:
            current = (
                spark.read.parquet(dim_path)
                .filter(F.col("version") < batch_id)
            )
            maxv = current.agg(F.max("version")).collect()[0][0]
        except AnalysisException as exc:
            # PATH_NOT_FOUND = genuinely the first batch. Any other
            # failure (corrupt file, fs hiccup) must fail the
            # micro-batch — treating it as "first batch" would publish
            # an empty-history dimension as the newest version.
            get_cond = getattr(exc, "getCondition", None) or exc.getErrorClass
            if (get_cond() or "") != "PATH_NOT_FOUND":
                raise
            maxv = None
        if maxv is None:
            empty_schema = T.StructType(
                [batch_df.schema[k] for k in key_list + tracked_list]
                + [
                    T.StructField("valid_from", eff_type),
                    T.StructField("valid_to", eff_type),
                    T.StructField("is_current", T.BooleanType()),
                ]
            )
            current = spark.createDataFrame([], empty_schema)
        else:
            current = current.filter(F.col("version") == maxv).drop("version")
        merged = scd2_merge(
            current, batch_df, key_list, tracked_list, effective_col
        )
        merged.write.mode("overwrite").parquet(
            f"{dim_path}/version={batch_id}"
        )
        if keep_versions is not None:
            # prune AFTER the new version is fully written, via the
            # Hadoop FS API so object stores behave like local disk
            jvm = spark._jvm
            root = jvm.org.apache.hadoop.fs.Path(dim_path)
            fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(root):
                versions = []
                for st in fs.listStatus(root):
                    name = st.getPath().getName()
                    if name.startswith("version="):
                        try:
                            versions.append(int(name.split("=", 1)[1]))
                        except ValueError:
                            continue
                for v in sorted(versions)[: -int(keep_versions)]:
                    fs.delete(
                        jvm.org.apache.hadoop.fs.Path(
                            f"{dim_path}/version={v}"
                        ),
                        True,
                    )

    return process


def scd2_dim_read(spark, dim_path: str, version: int | None = None) -> DataFrame:
    """Read an :func:`scd2_dim_sink` dimension: the newest version by
    default, or any historical ``version`` (batch id) for time travel."""
    dim = spark.read.parquet(dim_path)
    if version is None:
        version = dim.agg(F.max("version")).collect()[0][0]
    return dim.filter(F.col("version") == version).drop("version")


def enrich_stream_scd2(
    stream_df: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Temporally-correct stream enrichment against an SCD2 dimension:
    each event joins the dimension row that was valid AT THE EVENT'S
    OWN TIME (``valid_from <= ts AND (valid_to IS NULL OR
    ts < valid_to)``) — the classic "don't enrich last month's orders
    with this month's customer tier" correctness rule that a plain
    stream-static join on the current slice silently violates for any
    late or replayed event.

    Works identically on a streaming DataFrame (stream-static join —
    Spark re-resolves the static side per micro-batch, so a dimension
    maintained by :func:`scd2_dim_sink` is picked up as it grows) and
    on a batch DataFrame (one range equi-join; the oracle checks that
    form). Events with no valid dimension row keep NULL attributes
    (left join) — at-ingest events for not-yet-known keys must not be
    dropped.

    Scale: the join is keyed on the dimension KEY (equi part) with the
    validity range as a residual filter; the dimension's open+closed
    history broadcasts when small, and at warehouse scale the
    ``is_current`` partitioning keeps the closed majority out of the
    scan for present-time streams.
    """
    on = [stream_df[k] == dim[k] for k in keys]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    ts = stream_df[ts_col]
    cond = (
        cond
        & (dim[valid_from_col] <= ts)
        & (dim[valid_to_col].isNull() | (ts < dim[valid_to_col]))
    )
    dropped = [dim[k] for k in keys]
    out = stream_df.join(dim, cond, "left")
    for c in dropped:
        out = out.drop(c)
    return out


def k_anonymity_monitor_sink(
    report_path: str,
    qi_cols: list,
    thresholds: tuple = (2, 5, 10, 25),
):
    """Continuous re-identification-risk monitoring: a ``foreachBatch``
    function that profiles every micro-batch with
    :func:`~tafra_spark.functions.pipeline.k_anonymity` and appends
    the per-batch report — the streaming face of the privacy release
    gate (a feed whose rows_below_frac jumps grew a new
    high-cardinality quasi-identifier combination upstream; alerting
    is a filter over the report table).

    Each report row is (batch_id, k_threshold, n_classes,
    n_classes_below, n_rows_below, rows_below_frac_q6).
    Replay-idempotent like the other ledger/report sinks: partitioned
    by ``batch_id``, each batch OVERWRITES its own partition, so
    at-least-once redelivery rewrites an identical report instead of
    double-counting.

    Scale: one QI hash-agg over data the batch already materialized
    plus a one-row rollup; the report grows by len(thresholds) rows
    per batch regardless of batch size.

    Use: ``stream.writeStream.foreachBatch(
    k_anonymity_monitor_sink(path, ["event_type", "qi_hour"]))``; call
    the returned function directly to profile batch backfills.
    """
    from ..functions.pipeline import k_anonymity

    def process(batch_df: DataFrame, batch_id: int) -> None:
        report = k_anonymity(batch_df, qi_cols, thresholds=thresholds)
        report.write.mode("overwrite").parquet(
            f"{report_path}/batch_id={batch_id}"
        )

    return process
