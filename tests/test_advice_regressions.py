"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. Stale ordinal: filter() preserves original ordinals, so head(),
   positional indexing, and array __setitem__ on a filtered table must
   re-normalize positions (reference semantics: positions are always
   0..n-1 of the current table).
2. iter_fn semantics: the reference passes ``fn(i * ones[group_size])`` —
   the group's first-occurrence enumeration index repeated group-size
   times (``tafra/group.py:260-271``) — so max/min/mean → i, sum → i*n,
   len → group size.
3. NULL-keyed groups survive mixed builtin+fallback aggregation and
   transform's fallback join (null-safe key equality).
4. read_csv drops exactly one header line; a data row repeating the
   header values is kept.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tafra_spark import Tafra


class TestStaleOrdinal:
    def test_head_after_filter(self, tafra):
        f = tafra.filter(F.col("x") > 3)
        out = f.head(2).to_pandas()
        assert out["x"].tolist() == [4, 5]

    def test_positional_after_filter(self, tafra):
        f = tafra.filter(F.col("x") > 3)
        assert f[0].to_pandas()["x"].tolist() == [4]
        assert f[-1].to_pandas()["x"].tolist() == [6]
        assert f[1:3].to_pandas()["x"].tolist() == [5, 6]

    def test_setitem_array_after_filter(self, tafra):
        f = tafra.filter(F.col("x") > 3)
        f["w"] = [10, 20, 30]
        out = f.to_pandas()
        assert out["w"].tolist() == [10, 20, 30]
        assert out["x"].tolist() == [4, 5, 6]

    def test_setitem_array_after_positional(self, tafra):
        f = tafra[[1, 3, 5]]
        f["w"] = np.array([7, 8, 9])
        out = f.to_pandas()
        assert out["w"].tolist() == [7, 8, 9]

    def test_update_after_filter(self, tafra):
        f = tafra.filter(F.col("x") > 3)
        other = Tafra({"q": [100, 200, 300]})
        out = f.update(other).to_pandas()
        assert out["q"].tolist() == [100, 200, 300]

    def test_iterate_by_masks_after_filter(self, tafra):
        f = tafra.filter(F.col("x") > 1)  # 5 rows
        groups = list(f.iterate_by(["y"], collect_masks=True))
        assert sum(g.rows.sum() for g in groups) == 5
        for g in groups:
            assert len(g.rows) == 5


class TestIterFnSemantics:
    """Reference: fn receives np.full(group_size, group_index)."""

    def test_builtin_translations(self, tafra):
        # groups by z in first-occurrence order: z=0 → i=0, z=1 → i=1
        out = (
            tafra.group_by(
                ["z"],
                {},
                {"gi_max": max, "gi_min": min, "gi_sum": sum, "n": len},
            )
            .to_pandas()
            .sort_values("z")
            .reset_index(drop=True)
        )
        assert out["gi_max"].tolist() == [0, 1]
        assert out["gi_min"].tolist() == [0, 1]
        assert out["gi_sum"].tolist() == [0, 3]  # i * n = 0*3, 1*3
        assert out["n"].tolist() == [3, 3]

    def test_first_occurrence_order(self, spark):
        t = Tafra({"k": ["b", "a", "b", "c", "a"]})
        out = (
            t.group_by(["k"], {}, {"gi": max})
            .to_pandas()
            .set_index("k")["gi"]
            .to_dict()
        )
        assert out == {"b": 0, "a": 1, "c": 2}

    def test_arbitrary_callable(self, tafra):
        # np.ptp(np.full(n, i)) == 0; i + len → i + n
        out = (
            tafra.group_by(["z"], {}, {"w": lambda a: int(a[0]) + len(a)})
            .to_pandas()
            .sort_values("z")
        )
        assert out["w"].tolist() == [3, 4]  # 0+3, 1+3

    def test_transform_iter_fn_broadcast(self, tafra):
        out = tafra.transform(["z"], {}, {"gi": max}).to_pandas()
        assert out["gi"].tolist() == [0, 0, 0, 1, 1, 1]

    def test_reference_parity_example(self, tafra):
        # ADVICE.md verified case: iter_fn={'gi': max} over 6 single-row
        # groups returns 0..5 in the reference
        t = Tafra({"k": list("abcdef")})
        out = t.group_by(["k"], {}, {"gi": max}).to_pandas().sort_values("gi")
        assert out["gi"].tolist() == [0, 1, 2, 3, 4, 5]


class TestNullKeyGroups:
    def _t(self):
        return Tafra(
            {
                "k": pd.array(["a", None, "a", None], dtype=object),
                "v": [1.0, 2.0, 3.0, 4.0],
            }
        )

    def test_mixed_builtin_fallback_groupby(self, spark):
        t = self._t()
        # np.ptp is not in the translation table → applyInPandas fallback,
        # mixed with a builtin sum → recombination join must be null-safe
        out = t.group_by(["k"], {"s": (sum, "v"), "p": (np.ptp, "v")}).to_pandas()
        assert len(out) == 2
        nullrow = out[out["k"].isnull()]
        assert len(nullrow) == 1
        assert nullrow["s"].iloc[0] == 6.0
        assert nullrow["p"].iloc[0] == 2.0

    def test_transform_fallback_null_keys(self, spark):
        t = self._t()
        out = t.transform(["k"], {"p": (np.ptp, "v")}).to_pandas()
        assert not out["p"].isnull().any()
        assert sorted(out["p"].unique().tolist()) == [2.0]


class TestCSVHeaderSkip:
    def test_data_row_repeating_header_kept(self, tmp_path):
        p = tmp_path / "h.csv"
        p.write_text("a,b\na,b\n1,2\n")
        t = Tafra.read_csv(str(p))
        out = t.to_pandas()
        # the second line repeats the header values but is DATA
        assert len(out) == 2
        assert out["a"].tolist() == ["a", "1"]


class TestTimestampNTZ:
    """Round-3 advisor finding: tz-naive parquet timestamps read as
    TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ default, and NTZ
    cannot be cast to BIGINT — every epoch-seconds expression downstream
    (sessionize gaps, interval-join lag, range buckets) threw
    AnalysisException. The temporal operators must accept BOTH
    TimestampType and TimestampNTZType inputs."""

    @pytest.fixture(scope="class")
    def ntz_events_path(self, spark, tmp_path_factory):
        """Events parquet whose ts column is physically tz-naive micros —
        what /root/testdata now contains. Written via pyarrow directly so
        the test does not depend on writer-session conf."""
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        n = 120
        tbl = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(minutes=11 * i) for i in range(n)],
                    pa.timestamp("us"),  # NO timezone → TIMESTAMP_NTZ
                ),
                "user_id": pa.array([i % 4 for i in range(n)], pa.int64()),
                "event_type": pa.array(
                    [["view", "click", "purchase"][i % 3] for i in range(n)]
                ),
                "value": pa.array([float(i % 7) for i in range(n)]),
            }
        )
        d = tmp_path_factory.mktemp("ntz_events")
        pq.write_table(tbl, str(d / "events.parquet"))
        return str(d / "events.parquet")

    def test_parquet_reads_as_ntz(self, spark, ntz_events_path):
        from pyspark.sql import types as T

        raw = spark.read.parquet(ntz_events_path)
        assert isinstance(raw.schema["ts"].dataType, T.TimestampNTZType)

    def test_sessionize_accepts_ntz(self, spark, ntz_events_path):
        from tafra_spark.streaming import ops as STREAM

        raw = spark.read.parquet(ntz_events_path)
        out = STREAM.sessionize(raw, gap_minutes=30).collect()
        # 11-minute cadence per timeline, 4 users interleaved → each
        # user's events are 44 min apart → every event its own session
        assert len(out) == 120
        assert all(r["n_events"] == 1 for r in out)

    def test_interval_join_accepts_ntz(self, spark, ntz_events_path):
        from tafra_spark.streaming import ops as STREAM

        raw = spark.read.parquet(ntz_events_path)
        # per user the view→purchase gap is exactly 88 min (view at
        # i%12==0, purchase at i%12==8, 11-min cadence), so a 90-minute
        # window matches each view to exactly one purchase
        out = STREAM.interval_join(
            raw, raw, left_type="view", right_type="purchase",
            within_minutes=90,
        )
        rows = out.collect()
        assert len(rows) > 0
        assert all(r["lag_seconds"] == 88 * 60 for r in rows)

    def test_range_join_accepts_ntz(self, spark, ntz_events_path):
        from pyspark.sql import functions as F

        from tafra_spark.operators import temporal as TEMP

        raw = spark.read.parquet(ntz_events_path)
        points = raw.select("event_id", "ts")
        intervals = raw.filter(F.col("event_type") == "purchase").select(
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        )
        out = TEMP.range_join_points(
            points, intervals, "ts", "start_ts", "end_ts"
        )
        assert out.count() > 0

    def test_entry_loader_normalizes_to_ltz(self, spark):
        from pyspark.sql import types as T

        import __spark_entry__ as E

        ev = E._read_events(spark, "/root/testdata/sf0.001")
        assert isinstance(ev.schema["ts"].dataType, T.TimestampType)


class TestTmpfsLocalDirGate:
    """r6 advice item: /dev/shm shuffle dirs must be gated on >=16 GiB
    free — a RAM-backed spill dir must never OOM the box. Covers the
    full precedence chain of session._default_local_dir."""

    def _call(self, monkeypatch, free=None, has_shm=True, env=None):
        import shutil as _shutil
        from collections import namedtuple

        from tafra_spark import session as S

        for k in ("SPARK_GRAFT_LOCAL_DIR", "SPARK_GRAFT_TMPFS_LOCAL"):
            monkeypatch.delenv(k, raising=False)
        for k, v in (env or {}).items():
            monkeypatch.setenv(k, v)
        monkeypatch.setattr(
            S.os.path, "isdir", lambda p: has_shm if p == "/dev/shm" else False
        )
        if free is not None:
            usage = namedtuple("usage", "total used free")
            monkeypatch.setattr(
                _shutil, "disk_usage", lambda p: usage(0, 0, free)
            )
        return S._default_local_dir()

    def test_ample_free_space_picks_tmpfs(self, monkeypatch):
        out = self._call(monkeypatch, free=64 * 1024**3)
        assert out.startswith("/dev/shm")

    def test_low_free_space_falls_back_to_disk(self, monkeypatch):
        out = self._call(monkeypatch, free=8 * 1024**3)
        assert out.startswith("/tmp")

    def test_exact_threshold_is_inclusive(self, monkeypatch):
        from tafra_spark.session import _TMPFS_MIN_FREE

        assert self._call(monkeypatch, free=_TMPFS_MIN_FREE).startswith(
            "/dev/shm"
        )
        assert self._call(
            monkeypatch, free=_TMPFS_MIN_FREE - 1
        ).startswith("/tmp")

    def test_no_shm_mount_uses_disk(self, monkeypatch):
        assert self._call(monkeypatch, has_shm=False).startswith("/tmp")

    def test_env_overrides_beat_the_probe(self, monkeypatch):
        # explicit dir wins outright; force flags skip the free probe
        out = self._call(
            monkeypatch,
            free=0,
            env={"SPARK_GRAFT_LOCAL_DIR": "/custom/dir"},
        )
        assert out == "/custom/dir"
        assert self._call(
            monkeypatch, free=0, env={"SPARK_GRAFT_TMPFS_LOCAL": "1"}
        ).startswith("/dev/shm")
        assert self._call(
            monkeypatch,
            free=64 * 1024**3,
            env={"SPARK_GRAFT_TMPFS_LOCAL": "0"},
        ).startswith("/tmp")
