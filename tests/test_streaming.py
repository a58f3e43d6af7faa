"""Structured Streaming tests: the same windowed aggregation expression
must produce identical results in batch mode and via a replayed file
stream into a memory sink."""

import pytest
from pyspark.sql import functions as F

from tafra_spark.streaming import ops as STREAM


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    """Write a small deterministic events parquet dir (several files so
    maxFilesPerTrigger produces multiple micro-batches)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(300):
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=i * 7),
                i % 5,
                ["click", "view", "purchase"][i % 3],
                float(i % 10),
                None,
            )
        )
    df = spark.createDataFrame(rows, schema=STREAM.EVENTS_SCHEMA)
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    df.repartition(4).write.parquet(path)
    return path


class TestWindowedCounts:
    def test_stream_matches_batch(self, spark, events_path):
        batch = spark.read.parquet(events_path)
        expected = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in STREAM.windowed_counts(batch).collect()
        }
        stream = STREAM.stream_events(spark, events_path)
        got_df = STREAM.run_to_memory_sink(
            STREAM.windowed_counts(stream), "wc_test"
        )
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in got_df.collect()
        }
        assert got == expected
        assert len(got) > 10

    def test_watermark_set_on_stream(self, spark, events_path):
        stream = STREAM.stream_events(spark, events_path)
        out = STREAM.windowed_counts(stream, watermark="1 hour")
        assert out.isStreaming


@pytest.fixture(scope="module")
def ordered_events_path(spark, tmp_path_factory):
    """Single-file events parquet: the replayed stream delivers events in
    time order, which the stateful sessionizer's contract requires (out-
    of-order arrival across micro-batches needs event-time timeouts —
    documented limitation, not exercised here)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(300):
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=i * 11),
                i % 5,
                ["click", "view", "purchase"][i % 3],
                float(i % 10),
                None,
            )
        )
    df = spark.createDataFrame(rows, schema=STREAM.EVENTS_SCHEMA)
    path = str(tmp_path_factory.mktemp("events_ordered") / "events")
    df.coalesce(1).write.parquet(path)
    return path


class TestStatefulSessionize:
    def test_stream_closed_sessions_match_batch(self, spark, ordered_events_path):
        """applyInPandasWithState sessionization vs the batch oracle:
        emitted (closed) sessions must equal batch sessions minus each
        user's final still-open session; numbering/bounds identical."""
        events_path = ordered_events_path
        batch = spark.read.parquet(events_path)
        batch_sessions = STREAM.sessionize(batch, gap_minutes=30).collect()
        last_per_user = {}
        for r in batch_sessions:
            cur = last_per_user.get(r["user_id"])
            if cur is None or r["session_id"] > cur["session_id"]:
                last_per_user[r["user_id"]] = r
        expected = {
            (r["user_id"], r["session_id"]): (
                r["session_start"], r["session_end"], r["n_events"]
            )
            for r in batch_sessions
            if last_per_user[r["user_id"]]["session_id"] != r["session_id"]
        }

        stream = STREAM.stream_events(spark, events_path)
        got_df = STREAM.run_to_memory_sink(
            STREAM.sessionize_stateful(stream, gap_minutes=30),
            "sess_state_test",
            output_mode="append",
        )
        got = {
            (r["user_id"], r["session_id"]): (
                r["session_start"], r["session_end"], r["n_events"]
            )
            for r in got_df.collect()
        }
        assert got == expected
        assert len(got) > 0


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base, 1, "click", 1.0, None),
            (2, base + dt.timedelta(minutes=10), 1, "view", 1.0, None),
            # 40-minute gap → new session
            (3, base + dt.timedelta(minutes=50), 1, "click", 1.0, None),
            # second user: single session
            (4, base, 2, "click", 1.0, None),
        ]
        df = spark.createDataFrame(rows, schema=STREAM.EVENTS_SCHEMA)
        out = STREAM.sessionize(df, gap_minutes=30).collect()
        by_user = {}
        for r in out:
            by_user.setdefault(r["user_id"], []).append(r)
        assert len(by_user[1]) == 2
        assert len(by_user[2]) == 1
        s1 = sorted(by_user[1], key=lambda r: r["session_id"])
        assert s1[0]["n_events"] == 2
        assert s1[1]["n_events"] == 1


class TestStreamDedup:
    def test_stream_dedup_matches_batch(self, spark, tmp_path_factory):
        """Duplicated events replayed as a stream: the watermarked
        streaming dedup must emit exactly the batch-distinct rows."""
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(100):
            ev = (
                i % 60,  # event_id repeats → 40 duplicates
                base + dt.timedelta(minutes=i % 60),
                i % 5,
                "click",
                1.0,
                None,
            )
            rows.append(ev)
        df = spark.createDataFrame(rows, schema=STREAM.EVENTS_SCHEMA)
        path = str(tmp_path_factory.mktemp("events_dup") / "events")
        df.coalesce(1).write.parquet(path)

        batch = spark.read.parquet(path)
        expected = sorted(
            r["event_id"] for r in STREAM.dedup_stream(batch).collect()
        )
        assert len(expected) == 60

        stream = STREAM.stream_events(spark, path)
        got_df = STREAM.run_to_memory_sink(
            STREAM.dedup_stream(stream), "dedup_test", output_mode="append"
        )
        got = sorted(r["event_id"] for r in got_df.collect())
        assert got == expected


class TestPipelineOpsOnStreams:
    """The per-document pipeline projections (quality gate, PII scrub)
    are stateless narrow plans, so they compose with Structured
    Streaming unchanged — stream results must equal batch results."""

    @pytest.fixture(scope="class")
    def docs_path(self, spark, tmp_path_factory):
        rows = [
            (1, "contact me at a.b@example.com for the quick brown fox"),
            (2, " ".join(f"tok{i}" for i in range(30))),
            (3, "dup dup dup dup dup dup"),
            (4, "server 10.0.0.8 said " + " ".join(f"w{i}" for i in range(25))),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        path = str(tmp_path_factory.mktemp("docs_stream") / "docs")
        df.repartition(2).write.parquet(path)
        return path

    def _stream(self, spark, path):
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )

    def test_quality_gate_stream_matches_batch(self, spark, docs_path):
        from tafra_spark.functions.pipeline import quality_gate
        from tafra_spark.streaming.ops import run_to_memory_sink

        batch = {
            tuple(r)
            for r in quality_gate(
                spark.read.parquet(docs_path), min_tokens=5
            ).collect()
        }
        out = run_to_memory_sink(
            quality_gate(self._stream(spark, docs_path), min_tokens=5),
            "qg_stream",
            output_mode="append",
        )
        assert {tuple(r) for r in out.collect()} == batch

    def test_pii_scrub_stream_matches_batch(self, spark, docs_path):
        from tafra_spark.functions.pipeline import pii_scrub
        from tafra_spark.streaming.ops import run_to_memory_sink

        batch = {
            tuple(r)
            for r in pii_scrub(spark.read.parquet(docs_path)).collect()
        }
        out = run_to_memory_sink(
            pii_scrub(self._stream(spark, docs_path)),
            "pii_stream",
            output_mode="append",
        )
        assert {tuple(r) for r in out.collect()} == batch


class TestIntervalJoin:
    def test_stream_stream_matches_batch(self, spark, events_path):
        batch = spark.read.parquet(events_path)
        expected = {
            (r["l_event_id"], r["r_event_id"]): r["lag_seconds"]
            for r in STREAM.interval_join(batch, batch, within_minutes=90).collect()
        }
        ls = STREAM.stream_events(spark, events_path)
        rs = STREAM.stream_events(spark, events_path)
        # the replayed files are NOT time-ordered (repartition scrambled
        # them), so the watermark must cover the full replay disorder or
        # join state is evicted before late matches arrive — with real
        # time-ordered ingestion the production default suffices
        got_df = STREAM.run_to_memory_sink(
            STREAM.interval_join(ls, rs, within_minutes=90, watermark="48 hours"),
            "ivj_test",
            output_mode="append",
        )
        got = {
            (r["l_event_id"], r["r_event_id"]): r["lag_seconds"]
            for r in got_df.collect()
        }
        assert got == expected
        assert len(got) > 0

    def test_lag_bounded(self, spark, events_path):
        batch = spark.read.parquet(events_path)
        rows = STREAM.interval_join(batch, batch, within_minutes=90).collect()
        for r in rows:
            assert 0 <= r["lag_seconds"] <= 90 * 60


class TestCorpusGateStream:
    @pytest.fixture(scope="class")
    def docs_path(self, spark, tmp_path_factory):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = []
        for i in range(120):
            if i % 10 == 3:
                text = "dup dup"  # fails the repetition + length gates
            elif i % 7 == 0:
                # duplicate content appearing under many doc_ids
                text = "shared quality passage " + " ".join(
                    f"w{j}" for j in range(12)
                )
            else:
                text = f"unique doc {i} " + " ".join(
                    f"tok{i}_{j}" for j in range(12)
                )
            rows.append((i, text, base + dt.timedelta(minutes=i)))
        df = spark.createDataFrame(
            rows, "doc_id long, text string, ingest_ts timestamp"
        )
        path = str(tmp_path_factory.mktemp("docs_stream") / "docs")
        df.repartition(4).write.parquet(path)
        return path

    def test_stream_matches_batch_fingerprints(self, spark, docs_path):
        batch = spark.read.parquet(docs_path)
        expected = STREAM.corpus_gate_stream(batch, min_tokens=5)
        exp_fps = {r["fp"] for r in expected.collect()}

        stream = (
            spark.readStream.schema(
                "doc_id long, text string, ingest_ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(docs_path)
        )
        got_df = STREAM.run_to_memory_sink(
            STREAM.corpus_gate_stream(stream, min_tokens=5),
            "corpus_gate_test",
            output_mode="append",
        )
        got = got_df.collect()
        # same gated fingerprint SET and one survivor per fingerprint
        # (survivor identity is arrival-order, deliberately unasserted)
        assert {r["fp"] for r in got} == exp_fps
        assert len(got) == len(exp_fps)
        # the content-dup fingerprint survived exactly once
        assert len(exp_fps) < 120


class TestLedgerDedupSink:
    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_batches_dedup_against_ledger(self, spark, tmp_path):
        from tafra_spark.streaming.ops import ledger_dedup_sink

        out, led = str(tmp_path / "out"), str(tmp_path / "led")
        sink = ledger_dedup_sink(out, led)
        # batch 0: one in-batch dup (min id wins)
        sink(self._mk(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")]), 0)
        got0 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got0 == {1, 2}
        # batch 1: 'beta' already in the ledger; 'gamma' is new
        sink(self._mk(spark, [(10, "beta"), (11, "gamma")]), 1)
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got == {1, 2, 11}
        fps = spark.read.parquet(led).select("fp").distinct().count()
        assert fps == 3  # alpha, beta, gamma

    def test_replay_is_idempotent(self, spark, tmp_path):
        from tafra_spark.streaming.ops import ledger_dedup_sink

        out, led = str(tmp_path / "out"), str(tmp_path / "led")
        sink = ledger_dedup_sink(out, led)
        sink(self._mk(spark, [(1, "alpha"), (2, "beta")]), 0)
        sink(self._mk(spark, [(10, "beta"), (11, "gamma")]), 1)
        before = sorted(
            (r["doc_id"], r["batch_id"])
            for r in spark.read.parquet(out).collect()
        )
        # at-least-once: the engine re-runs batch 1 after a crash — the
        # ledger already holds batch 1's fingerprints, but the read
        # excludes the current batch's own partition, so the replay
        # rewrites identical output instead of dropping everything
        sink(self._mk(spark, [(10, "beta"), (11, "gamma")]), 1)
        after = sorted(
            (r["doc_id"], r["batch_id"])
            for r in spark.read.parquet(out).collect()
        )
        assert before == after == [(1, 0), (2, 0), (11, 1)]

    def test_streaming_end_to_end(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tafra_spark.streaming.ops import ledger_dedup_sink

        src = tmp_path / "src"
        src.mkdir()
        pq.write_table(
            pa.table({"doc_id": [1, 2, 3], "text": ["a", "b", "a"]}),
            str(src / "f0.parquet"),
        )
        out, led = str(tmp_path / "out"), str(tmp_path / "led")
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src)
        )
        q = (
            stream.writeStream.foreachBatch(ledger_dedup_sink(out, led))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got == {1, 2}

    def test_precreated_empty_ledger_dir_is_first_batch(self, spark, tmp_path):
        from tafra_spark.streaming.ops import ledger_dedup_sink

        out, led = str(tmp_path / "out"), str(tmp_path / "led")
        (tmp_path / "led").mkdir()  # orchestrator mkdir / crashed batch 0
        sink = ledger_dedup_sink(out, led)
        sink(self._mk(spark, [(1, "alpha"), (2, "alpha")]), 0)
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got == {1}


class TestFuzzyLedgerDedupSink:
    BASE = ("the quick brown fox jumps over the lazy dog "
            "and then runs far away into the deep green forest tonight")

    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_near_dup_dropped_across_batches(self, spark, tmp_path):
        from tafra_spark.streaming.ops import fuzzy_ledger_dedup_sink

        out, led = str(tmp_path / "out"), str(tmp_path / "led")
        sink = fuzzy_ledger_dedup_sink(out, led)
        other = "completely unrelated text about database engines and query planners running distributed joins"
        sink(self._mk(spark, [(1, self.BASE), (2, other)]), 0)
        # batch 1: a one-word edit of BASE (near-dup) + something new
        near = self.BASE.replace("tonight", "today")
        fresh = "entirely novel content mentioning streams watermarks state stores and checkpoint recovery semantics"
        sink(self._mk(spark, [(10, near), (11, fresh)]), 1)
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got == {1, 2, 11}

    def test_in_batch_near_dups_keep_min(self, spark, tmp_path):
        from tafra_spark.streaming.ops import fuzzy_ledger_dedup_sink

        out, led = str(tmp_path / "out"), str(tmp_path / "led")
        # band_size=2 → 8 bands: this SPECIFIC edit pair shares 3 bands
        # (verified — LSH collisions are deterministic for fixed text,
        # but the default 4-band config happens to miss this pair)
        sink = fuzzy_ledger_dedup_sink(out, led, band_size=2)
        near = self.BASE.replace("dog", "cat")
        sink(self._mk(spark, [(5, self.BASE), (3, near)]), 0)
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got == {3}  # min id of the near-dup pair survives

    def test_replay_idempotent(self, spark, tmp_path):
        from tafra_spark.streaming.ops import fuzzy_ledger_dedup_sink

        out, led = str(tmp_path / "out"), str(tmp_path / "led")
        sink = fuzzy_ledger_dedup_sink(out, led)
        sink(self._mk(spark, [(1, self.BASE)]), 0)
        near = self.BASE.replace("tonight", "today")
        sink(self._mk(spark, [(10, near), (11, "fresh words entirely different content here")]), 1)
        before = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
        sink(self._mk(spark, [(10, near), (11, "fresh words entirely different content here")]), 1)
        after = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
        assert before == after == [1, 11]

    def test_empty_docs_dedup_via_reserved_band(self, spark, tmp_path):
        from tafra_spark.streaming.ops import fuzzy_ledger_dedup_sink

        out, led = str(tmp_path / "out"), str(tmp_path / "led")
        sink = fuzzy_ledger_dedup_sink(out, led)
        sink(self._mk(spark, [(1, ""), (2, "   "), (3, "real content words here")]), 0)
        sink(self._mk(spark, [(10, ""), (11, "other real content text")]), 1)
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        # empties dedup through the reserved band: min-id 1 survives,
        # 2 (in-batch) and 10 (cross-batch) drop
        assert got == {1, 3, 11}


class TestQualityMonitorSink:
    RULES = [
        {"rule": "not_null", "col": "doc_id"},
        {"rule": "unique", "col": "doc_id"},
        {"rule": "matches", "col": "text", "pattern": "[a-z ]*"},
    ]

    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_per_batch_reports(self, spark, tmp_path):
        from tafra_spark.streaming.ops import quality_monitor_sink

        rep = str(tmp_path / "rep")
        sink = quality_monitor_sink(rep, self.RULES)
        sink(self._mk(spark, [(1, "ok text"), (2, "ALSO OK?")]), 0)
        sink(self._mk(spark, [(3, "fine"), (3, "dup id"), (None, "x")]), 1)
        got = {
            (r["batch_id"], r["rule_idx"]): r
            for r in spark.read.parquet(rep).collect()
        }
        assert len(got) == 6
        # batch 0: clean ids, one regex violation ('ALSO OK?')
        assert got[(0, 0)]["n_violations"] == 0
        assert got[(0, 2)]["n_violations"] == 1
        assert got[(0, 0)]["n_rows"] == 2
        # batch 1: one NULL id, one dup id
        assert got[(1, 0)]["n_violations"] == 1 and not got[(1, 0)]["passed"]
        assert got[(1, 1)]["n_violations"] == 1
        assert got[(1, 0)]["n_rows"] == 3

    def test_replay_overwrites_own_partition(self, spark, tmp_path):
        from tafra_spark.streaming.ops import quality_monitor_sink

        rep = str(tmp_path / "rep")
        sink = quality_monitor_sink(rep, self.RULES)
        sink(self._mk(spark, [(1, "a")]), 0)
        sink(self._mk(spark, [(2, "b")]), 0)  # redelivery
        rows = spark.read.parquet(rep).collect()
        assert len(rows) == len(self.RULES)  # not doubled

    def test_streaming_end_to_end(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tafra_spark.streaming.ops import quality_monitor_sink

        src = tmp_path / "src"
        src.mkdir()
        pq.write_table(
            pa.table({"doc_id": [1, None, 2], "text": ["a", "b", "c"]}),
            str(src / "f0.parquet"),
        )
        rep = str(tmp_path / "rep")
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                quality_monitor_sink(rep, self.RULES)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = {
            r["rule_idx"]: r for r in spark.read.parquet(rep).collect()
        }
        assert got[0]["n_violations"] == 1  # the NULL doc_id
        assert got[0]["n_rows"] == 3


class TestCountMinLedgerSink:
    def _mk(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "k long")

    def test_merge_equals_batch_sketch(self, spark, tmp_path):
        from tafra_spark.functions.sketches import (
            count_min_build,
            count_min_estimate,
        )
        from tafra_spark.streaming.ops import countmin_ledger_sink, countmin_read

        path = str(tmp_path / "cm")
        sink = countmin_ledger_sink(path, "k", depth=3, width=64, seed=1)
        sink(self._mk(spark, [1, 2, 2, 3]), 0)
        sink(self._mk(spark, [2, 3, 3, 3]), 1)
        merged = countmin_read(spark, path)
        whole = count_min_build(
            self._mk(spark, [1, 2, 2, 3, 2, 3, 3, 3]), "k",
            depth=3, width=64, seed=1, portable=True,
        )
        a = {(r["i"], r["b"]): r["cnt"] for r in merged.collect()}
        b = {(r["i"], r["b"]): r["cnt"] for r in whole.collect()}
        assert a == b  # mergeability: sum of batch sketches == whole
        probes = self._mk(spark, [2, 3])
        est = {
            r["value"]: r["estimate"]
            for r in count_min_estimate(
                merged, probes, "k", depth=3, width=64, seed=1,
                portable=True,
            ).collect()
        }
        assert est[2] == 3 and est[3] == 4

    def test_replay_overwrites(self, spark, tmp_path):
        from tafra_spark.streaming.ops import countmin_ledger_sink, countmin_read

        path = str(tmp_path / "cm")
        sink = countmin_ledger_sink(path, "k", depth=3, width=64, seed=1)
        sink(self._mk(spark, [5, 5]), 0)
        sink(self._mk(spark, [5, 5]), 0)  # redelivery
        total = countmin_read(spark, path).agg(
            {"cnt": "sum"}
        ).collect()[0][0]
        assert total == 2 * 3  # 2 rows x depth 3, NOT doubled

    def test_streaming_end_to_end(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tafra_spark.streaming.ops import countmin_ledger_sink, countmin_read

        src = tmp_path / "src"
        src.mkdir()
        pq.write_table(pa.table({"k": [7, 7, 8]}), str(src / "f0.parquet"))
        path = str(tmp_path / "cm")
        stream = spark.readStream.schema("k long").parquet(str(src))
        q = (
            stream.writeStream.foreachBatch(
                countmin_ledger_sink(path, "k", depth=3, width=64, seed=1)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        total = countmin_read(spark, path).agg({"cnt": "sum"}).collect()[0][0]
        assert total == 3 * 3


class TestScd2DimSink:
    def _batch(self, spark, rows):
        return spark.createDataFrame(
            rows, "cust long, tier string, effective_ts long"
        )

    def test_incremental_merge_and_time_travel(self, spark, tmp_path):
        from tafra_spark.streaming.ops import scd2_dim_read, scd2_dim_sink

        path = str(tmp_path / "dim")
        sink = scd2_dim_sink(spark, path, ["cust"], ["tier"])
        sink(self._batch(spark, [(1, "bronze", 1), (2, "silver", 1)]), 0)
        sink(self._batch(spark, [(1, "gold", 5)]), 1)
        sink(self._batch(spark, [(1, "gold", 9), (3, "gold", 9)]), 2)

        latest = sorted(tuple(r) for r in scd2_dim_read(spark, path).collect())
        assert latest == [
            (1, "bronze", 1, 5, False),
            (1, "gold", 5, None, True),   # unchanged at t=9: stays open
            (2, "silver", 1, None, True),
            (3, "gold", 9, None, True),
        ]
        # time travel: the dimension as of batch 0
        v0 = sorted(tuple(r) for r in scd2_dim_read(spark, path, 0).collect())
        assert v0 == [
            (1, "bronze", 1, None, True),
            (2, "silver", 1, None, True),
        ]

    def test_replay_is_idempotent(self, spark, tmp_path):
        from tafra_spark.streaming.ops import scd2_dim_read, scd2_dim_sink

        path = str(tmp_path / "dim")
        sink = scd2_dim_sink(spark, path, ["cust"], ["tier"])
        sink(self._batch(spark, [(1, "bronze", 1)]), 0)
        sink(self._batch(spark, [(1, "gold", 5)]), 1)
        once = sorted(tuple(r) for r in scd2_dim_read(spark, path).collect())
        sink(self._batch(spark, [(1, "gold", 5)]), 1)  # redelivery
        twice = sorted(tuple(r) for r in scd2_dim_read(spark, path).collect())
        assert once == twice

    def test_streaming_end_to_end(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tafra_spark.streaming.ops import scd2_dim_read, scd2_dim_sink

        src = tmp_path / "src"
        src.mkdir()
        pq.write_table(
            pa.table({"cust": [1, 2], "tier": ["bronze", "silver"],
                      "effective_ts": [1, 1]}),
            str(src / "f0.parquet"),
        )
        pq.write_table(
            pa.table({"cust": [1], "tier": ["gold"], "effective_ts": [7]}),
            str(src / "f1.parquet"),
        )
        path = str(tmp_path / "dim")
        stream = spark.readStream.schema(
            "cust long, tier string, effective_ts long"
        ).option("maxFilesPerTrigger", 1).parquet(str(src))
        q = (
            stream.writeStream.foreachBatch(
                scd2_dim_sink(spark, path, ["cust"], ["tier"])
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = sorted(tuple(r) for r in scd2_dim_read(spark, path).collect())
        # both files processed (order unknown but effective times decide):
        # cust 1 ends gold-open with bronze closed iff bronze batch came
        # first; either way the OPEN row for cust 1 is the t=7 gold one
        open_rows = [r for r in rows if r[4]]
        assert (1, "gold", 7, None, True) in open_rows
        assert any(r[0] == 2 and r[4] for r in rows)

    def test_keep_versions_prunes_old_snapshots(self, spark, tmp_path):
        import os

        from tafra_spark.streaming.ops import scd2_dim_read, scd2_dim_sink

        path = str(tmp_path / "dim")
        sink = scd2_dim_sink(
            spark, path, ["cust"], ["tier"], keep_versions=2
        )
        sink(self._batch(spark, [(1, "bronze", 1)]), 0)
        sink(self._batch(spark, [(1, "silver", 5)]), 1)
        sink(self._batch(spark, [(1, "gold", 9)]), 2)
        dirs = sorted(
            d for d in os.listdir(path) if d.startswith("version=")
        )
        assert dirs == ["version=1", "version=2"]
        # the newest version is intact and correct
        latest = sorted(tuple(r) for r in scd2_dim_read(spark, path).collect())
        assert (1, "gold", 9, None, True) in latest
        with pytest.raises(ValueError, match="keep_versions"):
            scd2_dim_sink(spark, path, ["cust"], ["tier"], keep_versions=0)

    def test_empty_tracked_rejected(self, spark, tmp_path):
        from tafra_spark.operators.scd import scd2_merge

        cur = self._batch(spark, [(1, "bronze", 1)])
        with pytest.raises(ValueError, match="tracked must be non-empty"):
            scd2_merge(cur, cur, ["cust"], [], "effective_ts")
        with pytest.raises(ValueError, match="keys must be non-empty"):
            scd2_merge(cur, cur, [], ["tier"], "effective_ts")


class TestScd2SinkRedeliveryProperty:
    """VERDICT r4 #9: the streaming sink (parquet version round-trip,
    max-version read, at-least-once redeliveries) must equal DIRECT
    sequential scd2_merge calls over the same batch boundaries —
    storage and redelivery may not change the dimension."""

    def _merge_oracle(self, spark, batches):
        from pyspark.sql import types as T

        schema = "cust long, tier string, effective_ts long"
        current = spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("cust", T.LongType()),
                    T.StructField("tier", T.StringType()),
                    T.StructField("valid_from", T.LongType()),
                    T.StructField("valid_to", T.LongType()),
                    T.StructField("is_current", T.BooleanType()),
                ]
            ),
        )
        for b in batches:
            if not b:
                continue
            current = self._apply(spark, current, b, schema)
        return sorted(tuple(r) for r in current.collect())

    def _apply(self, spark, current, chunk, schema):
        from tafra_spark.operators.scd import scd2_merge

        return scd2_merge(
            current,
            spark.createDataFrame(chunk, schema),
            ["cust"],
            ["tier"],
            "effective_ts",
        )

    def test_random_splits_with_redelivery(self, spark, tmp_path):
        import random

        from tafra_spark.streaming.ops import scd2_dim_read, scd2_dim_sink

        rng = random.Random(17)
        tiers = ["bronze", "silver", "gold"]
        for trial in range(3):
            # monotone event stream: each key changes tier over time
            events = []
            ts = 0
            for _ in range(rng.randint(4, 10)):
                ts += rng.randint(1, 3)
                events.append(
                    (rng.randint(1, 3), rng.choice(tiers), ts)
                )
            # split into sequential batches at random points
            cuts = sorted(
                rng.sample(range(1, len(events)), rng.randint(0, len(events) - 1))
            )
            batches = []
            prev = 0
            for c in cuts + [len(events)]:
                batches.append(events[prev:c])
                prev = c
            path = str(tmp_path / f"dim{trial}")
            sink = scd2_dim_sink(spark, path, ["cust"], ["tier"])
            schema = "cust long, tier string, effective_ts long"
            bid = 0
            for b in batches:
                if not b:
                    continue
                sink(spark.createDataFrame(b, schema), bid)
                if rng.random() < 0.4:  # at-least-once redelivery
                    sink(spark.createDataFrame(b, schema), bid)
                bid += 1
            got = sorted(
                tuple(r) for r in scd2_dim_read(spark, path).collect()
            )
            want = self._merge_oracle(spark, batches)
            assert got == want, (trial, events, cuts)


class TestScd2Enrichment:
    """Temporal (as-of validity) stream enrichment against an SCD2
    dimension: stream-static result must equal the batch range join,
    and events must pick the dimension row valid AT THEIR OWN TIME."""

    def _dim(self, spark):
        rows = [
            # user 1: bronze until t10, gold after
            (1, "bronze", "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
            (1, "gold", "2024-01-01 00:00:10", None),
            # user 2: single open row
            (2, "silver", "2024-01-01 00:00:05", None),
        ]
        df = spark.createDataFrame(
            rows, ["user_id", "tier", "valid_from", "valid_to"]
        )
        return df.withColumn(
            "valid_from", F.col("valid_from").cast("timestamp")
        ).withColumn("valid_to", F.col("valid_to").cast("timestamp"))

    def _events(self, spark):
        rows = [
            (0, 1, "2024-01-01 00:00:05"),   # bronze era
            (1, 1, "2024-01-01 00:00:10"),   # boundary: gold (from incl.)
            (2, 1, "2024-01-01 00:00:20"),   # gold
            (3, 2, "2024-01-01 00:00:01"),   # before dim known -> NULL
            (4, 3, "2024-01-01 00:00:09"),   # unknown user -> NULL
        ]
        return spark.createDataFrame(
            rows, ["event_id", "user_id", "ts"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def test_as_of_validity_batch(self, spark):
        from tafra_spark.streaming.ops import enrich_stream_scd2

        out = {
            r["event_id"]: r["tier"]
            for r in enrich_stream_scd2(
                self._events(spark), self._dim(spark), ["user_id"]
            ).collect()
        }
        assert out == {0: "bronze", 1: "gold", 2: "gold", 3: None, 4: None}

    def test_stream_matches_batch(self, spark, tmp_path):
        from pyspark.sql import types as T

        from tafra_spark.streaming.ops import (
            enrich_stream_scd2,
            run_to_memory_sink,
        )

        src = str(tmp_path / "ev")
        self._events(spark).repartition(2).write.parquet(src)
        schema = T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ])
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        dim = self._dim(spark)
        batch = {
            tuple(map(str, r))
            for r in enrich_stream_scd2(
                spark.read.parquet(src), dim, ["user_id"]
            ).collect()
        }
        out = run_to_memory_sink(
            enrich_stream_scd2(stream, dim, ["user_id"]),
            "scd2_enrich_stream",
            output_mode="append",
        )
        assert {tuple(map(str, r)) for r in out.collect()} == batch


class TestKAnonymityMonitor:
    def test_per_batch_reports_and_replay_idempotence(self, spark, tmp_path):
        from tafra_spark.streaming.ops import k_anonymity_monitor_sink

        rep = str(tmp_path / "krep")
        sink = k_anonymity_monitor_sink(rep, ["q1"], thresholds=(2, 5))

        def mk(rows):
            return spark.createDataFrame(rows, "q1 string")

        # batch 0: classes a×1, b×3
        sink(mk([("a",), ("b",), ("b",), ("b",)]), 0)
        # batch 1: one singleton class
        sink(mk([("z",)]), 1)
        got = {
            (r["batch_id"], r["k_threshold"]): r
            for r in spark.read.parquet(rep).collect()
        }
        assert len(got) == 4
        b0k2 = got[(0, 2)]
        assert b0k2["n_classes"] == 2 and b0k2["n_classes_below"] == 1
        assert b0k2["n_rows_below"] == 1
        assert b0k2["rows_below_frac_q6"] == 250_000
        b0k5 = got[(0, 5)]
        assert b0k5["n_rows_below"] == 4  # both classes under 5
        assert got[(1, 2)]["rows_below_frac_q6"] == 1_000_000
        # replay batch 0 with identical data: report unchanged, not doubled
        sink(mk([("a",), ("b",), ("b",), ("b",)]), 0)
        again = spark.read.parquet(rep).collect()
        assert len(again) == 4


class TestHttpExtractionOnStreams:
    """r8: the CC ingestion layer composes with Structured Streaming —
    parse_http (mapInPandas is streaming-legal, stateless) and
    html_to_text (pure projection) must give stream == batch."""

    @pytest.fixture(scope="class")
    def responses_path(self, spark, tmp_path_factory):
        from tafra_spark.sources.http import build_http_response

        rows = []
        for i in range(6):
            html = (
                f"<html><head><script>x()</script></head>"
                f"<body><p>doc {i} &amp; body</p></body></html>"
            )
            rows.append(
                (
                    f"http://h/{i}",
                    bytearray(
                        build_http_response(
                            html.encode(),
                            content_encoding="gzip" if i % 2 else None,
                            chunked=(i % 3 == 0),
                        )
                    ),
                )
            )
        df = spark.createDataFrame(rows, "url string, payload binary")
        path = str(tmp_path_factory.mktemp("http_stream") / "resp")
        df.repartition(2).write.parquet(path)
        return path

    def test_extraction_stream_matches_batch(self, spark, responses_path):
        from pyspark.sql import functions as F

        from tafra_spark.sources.http import html_to_text, parse_http
        from tafra_spark.streaming.ops import run_to_memory_sink

        def extract(df):
            return parse_http(df).select(
                "url", "status", html_to_text("text").alias("clean")
            )

        batch = {
            tuple(r)
            for r in extract(spark.read.parquet(responses_path)).collect()
        }
        assert batch and all(s == 200 for _, s, _ in batch)
        stream = (
            spark.readStream.schema("url string, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(responses_path)
        )
        out = run_to_memory_sink(
            extract(stream), "http_extract_stream", output_mode="append"
        )
        assert {tuple(r) for r in out.collect()} == batch


class TestLineQualityOnStreams:
    """r9: the line-level layer composes with Structured Streaming —
    html_to_text_blocks, c4_line_filter, and line_dedup_rewrite are
    stateless projections, so stream == batch by construction; this
    pins it end to end (blocks extraction -> dedup -> C4 verdict)."""

    @pytest.fixture(scope="class")
    def pages_path(self, spark, tmp_path_factory):
        rows = []
        for i in range(6):
            html = (
                "<html><body><nav>Home | About</nav>"
                "<p>Subscribe to the feed now please today.</p>"
                f"<p>Paragraph {i} carries unique narrative content here.</p>"
                "<p>Subscribe to the feed now please today.</p>"
                "<p>Another proper sentence closes the page cleanly.</p>"
                "<footer>All rights reserved.</footer></body></html>"
            )
            rows.append((f"http://h/{i}", html))
        df = spark.createDataFrame(rows, "url string, html string")
        path = str(tmp_path_factory.mktemp("line_stream") / "pages")
        df.repartition(2).write.parquet(path)
        return path

    def test_line_pipeline_stream_matches_batch(self, spark, pages_path):
        from tafra_spark.functions.pipeline import (
            c4_line_filter,
            line_dedup_rewrite,
        )
        from tafra_spark.sources.http import html_to_text_blocks
        from tafra_spark.streaming.ops import run_to_memory_sink

        def pipeline(df):
            ext = df.select(
                "url", html_to_text_blocks("html").alias("text")
            )
            ded = line_dedup_rewrite(ext)
            return c4_line_filter(ded, text_col="dedup_text").select(
                "url", "n_dup_lines", "n_kept", "c4_pass", "c4_text"
            )

        batch = {
            tuple(r)
            for r in pipeline(spark.read.parquet(pages_path)).collect()
        }
        # the repeated subscribe banner dedups, nav/footer junk dies,
        # two content sentences survive (subscribe line lacks 'cookie'
        # etc. but fails nothing — it IS a sentence; dedup removes the
        # repeat so n_kept == 3 unique sentence lines)
        assert batch and all(d == 1 for _, d, _, _, _ in batch)
        assert all(k == 3 for _, _, k, _, _ in batch)
        assert all(p is True for _, _, _, p, _ in batch)
        stream = (
            spark.readStream.schema("url string, html string")
            .option("maxFilesPerTrigger", 1)
            .parquet(pages_path)
        )
        out = run_to_memory_sink(
            pipeline(stream), "line_quality_stream", output_mode="append"
        )
        assert {tuple(r) for r in out.collect()} == batch


class TestMultimodalOnStreams:
    """late r9: the Arrow-batched image decode stage composes with
    Structured Streaming — decode_images is a stateless mapInPandas
    projection, so stream == batch by construction; this pins the
    full codec surface (baseline, 12-bit SOF1, lossless SOF3) riding
    a stream of binary asset columns."""

    @pytest.fixture(scope="class")
    def assets_path(self, spark, tmp_path_factory):
        import numpy as np

        from tafra_spark.functions import multimodal as MM

        rows = []
        builders = [
            MM.fake_jpeg_bytes,
            MM.fake_jpeg12_bytes,
            MM.fake_jpeg_lossless_bytes,
        ]
        for i in range(6):
            rows.append(
                (
                    i,
                    "image",
                    bytearray(builders[i % 3](i)),
                    (16, 16, None, "image/jpeg"),
                )
            )
        df = spark.createDataFrame(rows, schema=MM.MULTIMODAL_SCHEMA)
        path = str(tmp_path_factory.mktemp("mm_stream") / "assets")
        df.repartition(2).write.parquet(path)
        return path

    def test_decode_stream_matches_batch(self, spark, assets_path, monkeypatch):
        from tafra_spark.functions import multimodal as M2
        from tafra_spark.streaming.ops import run_to_memory_sink

        monkeypatch.setattr(M2, "_HAS_PIL", False)
        batch_df = spark.read.parquet(assets_path)
        batch = {
            tuple(r) for r in M2.decode_images(batch_df).collect()
        }
        # every asset decodes through the vendored codec with the
        # formula-exact mean (gradient for lossless, four tiles else)
        assert len(batch) == 6
        means = {r[0]: r[3] for r in batch}
        for i in (2, 5):  # lossless gradient assets
            want = sum(
                (i * 31 + y * 17 + x * 5) % 256
                for y in range(16)
                for x in range(16)
            ) / 256
            assert means[i] == want
        for i in (0, 3):  # baseline four-tile assets
            want = sum((i * 31 + k * 57) % 256 for k in range(4)) / 4
            assert means[i] == want
        for i in (1, 4):  # 12-bit four-tile assets
            want = sum((i * 31 + k * 57) % 4096 for k in range(4)) / 4
            assert means[i] == want
        stream = (
            spark.readStream.schema(batch_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(assets_path)
        )
        out = run_to_memory_sink(
            M2.decode_images(stream), "mm_decode_stream",
            output_mode="append",
        )
        assert {tuple(r) for r in out.collect()} == batch
