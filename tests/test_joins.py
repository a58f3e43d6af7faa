"""Join tests (SURVEY.md §2.3; reference test_tafra.py:939-1099;
FIXTURES.md F2)."""

import pandas as pd
import pytest

from tafra_spark import Tafra


@pytest.fixture()
def right_1to1(spark):
    return Tafra(
        {
            "a": [1, 2, 3, 4, 5, 6],
            "b": ["one", "two", "one", "two", "one", "two"],
            "c": [0, 0, 0, 1, 1, 1],
        }
    )


@pytest.fixture()
def right_1tomany(spark):
    return Tafra(
        {
            "a": [1, 1, 2, 2, 3, 3],
            "b": ["one", "two", "one", "two", "one", "two"],
            "c": [2, 2, 2, 3, 3, 3],
        }
    )


def _sorted(t):
    return sorted(tuple(r) for r in t.to_records())


class TestInnerJoin:
    def test_1to1(self, tafra, right_1to1):
        out = tafra.inner_join(right_1to1, [("x", "a", "==")])
        assert out.rows == 6
        assert set(out.columns) == {"x", "y", "z", "a", "b", "c"}

    def test_two_keys(self, tafra, right_1to1):
        out = tafra.inner_join(right_1to1, [("x", "a", "=="), ("z", "c", "==")])
        assert out.rows == 6

    def test_1tomany_duplicates_left(self, tafra, right_1tomany):
        out = tafra.inner_join(right_1tomany, [("x", "a", "==")])
        assert out.rows == 6  # x in {1,2,3} each match 2 right rows

    def test_no_match_dropped(self, tafra, right_1tomany):
        out = tafra[tafra["x"] >= 4].inner_join(right_1tomany, [("x", "a", "==")])
        assert out.rows == 0

    def test_select_projection(self, tafra, right_1to1):
        out = tafra.inner_join(right_1to1, [("x", "a", "==")], ["x", "y", "a", "b"])
        assert out.columns == ("x", "y", "a", "b")

    def test_select_unknown_raises(self, tafra, right_1to1):
        with pytest.raises(KeyError):
            tafra.inner_join(right_1to1, [("x", "a", "==")], ["nope"])

    def test_theta_lt(self, tafra, right_1to1):
        out = tafra.inner_join(right_1to1, [("x", "a", "<")])
        assert out.rows == 15  # sum over x of |{a > x}|

    def test_theta_le(self, tafra, right_1to1):
        out = tafra.inner_join(right_1to1, [("x", "a", "<=")])
        assert out.rows == 21

    def test_default_op_is_eq(self, tafra, right_1to1):
        out = tafra.inner_join(right_1to1, [("x", "a")])
        assert out.rows == 6

    def test_bad_op_raises(self, tafra, right_1to1):
        with pytest.raises(ValueError):
            tafra.inner_join(right_1to1, [("x", "a", "~=")])

    def test_dtype_mismatch_raises(self, tafra, spark):
        bad = Tafra({"a": [1.0, 2.0]})
        with pytest.raises(TypeError):
            tafra.inner_join(bad, [("x", "a", "==")])

    def test_missing_column_raises(self, tafra, right_1to1):
        with pytest.raises(KeyError):
            tafra.inner_join(right_1to1, [("nope", "a", "==")])
        with pytest.raises(KeyError):
            tafra.inner_join(right_1to1, [("x", "nope", "==")])

    def test_collision_left_wins(self, tafra, spark):
        right = Tafra({"a": [1, 2, 3, 4, 5, 6], "y": ["R"] * 6})
        out = tafra.inner_join(right, [("x", "a", "==")])
        assert sorted(out.to_pandas()["y"].unique()) == ["one", "two"]


class TestLeftJoin:
    def test_unmatched_null(self, tafra, right_1tomany):
        out = tafra.left_join(right_1tomany, [("x", "a", "==")])
        pdf = out.to_pandas()
        unmatched = pdf[pdf["x"] >= 4]
        assert unmatched["a"].isna().all()
        # typed nullable column, not object promotion (SURVEY §2.8.3)
        assert out.dtypes["a"] == "int64"

    def test_row_count(self, tafra, right_1tomany):
        out = tafra.left_join(right_1tomany, [("x", "a", "==")])
        assert out.rows == 9  # 3 left keys × 2 matches + 3 unmatched


class TestCrossJoin:
    def test_cartesian(self, tafra, right_1to1):
        out = tafra.cross_join(right_1to1)
        assert out.rows == 36
        assert set(out.columns) == {"x", "y", "z", "a", "b", "c"}

    def test_select(self, tafra, right_1to1):
        out = tafra.cross_join(right_1to1, ["x", "a"])
        assert out.columns == ("x", "a")
        assert out.rows == 36

    def test_select_unknown_raises(self, tafra, right_1to1):
        with pytest.raises(KeyError):
            tafra.cross_join(right_1to1, ["nope"])


class TestAsofJoin:
    def _frames(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        left = Tafra(
            {
                "k": [1, 1, 1, 2],
                "t": [base, base + dt.timedelta(minutes=10),
                      base + dt.timedelta(minutes=20), base],
                "lv": [10, 11, 12, 20],
            }
        )
        right = Tafra(
            {
                "k": [1, 1, 2],
                "t": [base + dt.timedelta(minutes=5),
                      base + dt.timedelta(minutes=20),
                      base + dt.timedelta(minutes=1)],
                "rv": [100, 200, 300],
            }
        )
        return left, right

    def test_backward(self, spark):
        left, right = self._frames(spark)
        out = left.asof_join(right, by=["k"], left_on="t").to_pandas()
        out = out.sort_values(["k", "t"]).reset_index(drop=True)
        # t=0 → no earlier right row; t=10 → rv=100; t=20 → rv=200 (inclusive)
        assert out["rv"].tolist()[:3] == [None, 100, 200] or \
               (pd.isna(out["rv"][0]) and out["rv"].tolist()[1:3] == [100, 200])
        assert pd.isna(out["rv"][3])  # k=2 at t=0, right at t=1 is later

    def test_forward(self, spark):
        left, right = self._frames(spark)
        out = left.asof_join(
            right, by=["k"], left_on="t", direction="forward"
        ).to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
        # k=1: t=0 → next right at t=5 (100); t=10 → t=20 (200); t=20 → 200
        assert out["rv"].tolist()[:3] == [100, 200, 200]
        assert out["rv"][3] == 300

    def test_single_exchange(self, spark):
        from tafra_spark.plans import count_exchanges

        left, right = self._frames(spark)
        out = left.asof_join(right, by=["k"], left_on="t")
        # union-and-window: exactly one hash exchange on the key
        assert count_exchanges(out.df) == 1

    def test_invalid_direction(self, spark):
        left, right = self._frames(spark)
        with pytest.raises(ValueError):
            left.asof_join(right, by=["k"], left_on="t", direction="nearest")


class TestRangeJoin:
    def test_point_in_interval(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        points = Tafra(
            {
                "pid": [1, 2, 3],
                "ts": [base + dt.timedelta(minutes=m) for m in (30, 90, 200)],
            }
        )
        intervals = Tafra(
            {
                "iid": [10, 20],
                "s": [base, base + dt.timedelta(hours=1)],
                "e": [base + dt.timedelta(hours=1), base + dt.timedelta(hours=2)],
            }
        )
        out = points.range_join(
            intervals, "ts", "s", "e", bucket_width=3600
        ).to_pandas()
        got = sorted(zip(out["pid"], out["iid"]))
        assert got == [(1, 10), (2, 20)]  # pid=3 outside all intervals

    def test_end_exclusive(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        points = Tafra({"pid": [1], "ts": [base + dt.timedelta(hours=1)]})
        intervals = Tafra(
            {"iid": [10], "s": [base], "e": [base + dt.timedelta(hours=1)]}
        )
        out = points.range_join(intervals, "ts", "s", "e").to_pandas()
        assert len(out) == 0

    def test_interval_spanning_buckets(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        points = Tafra(
            {"pid": [1, 2], "ts": [base + dt.timedelta(minutes=m) for m in (10, 170)]}
        )
        # one 3-hour interval with 1-hour buckets: both points match once
        intervals = Tafra(
            {"iid": [10], "s": [base], "e": [base + dt.timedelta(hours=3)]}
        )
        out = points.range_join(intervals, "ts", "s", "e", bucket_width=3600)
        pdf = out.to_pandas()
        assert sorted(pdf["pid"].tolist()) == [1, 2]


class TestBandJoin:
    def _tables(self, spark):
        left = Tafra(
            {
                "lid": list(range(60)),
                "lo": [float(i % 11) for i in range(60)],
                "hi": [float(i % 11 + i % 4) for i in range(60)],
            }
        )
        right = Tafra(
            {
                "rid": list(range(40)),
                "p": [float((j * 5) % 13) for j in range(40)],
            }
        )
        return left, right

    def test_matches_theta_join(self, spark):
        left, right = self._tables(spark)
        on = [("lo", "p", "<="), ("hi", "p", ">")]
        band = left.band_join(right, on, bucket_width=3).df
        theta = left.inner_join(right, on).df
        b = sorted(map(tuple, band.collect()))
        t = sorted(map(tuple, theta.collect()))
        assert b == t and len(b) > 0

    def test_point_on_left(self, spark):
        left = Tafra({"lid": [1, 2, 3], "v": [5.0, 10.0, 20.0]})
        right = Tafra(
            {"rid": [7, 8], "rlo": [4.0, 9.0], "rhi": [6.0, 30.0]}
        )
        on = [("v", "rlo", ">="), ("v", "rhi", "<=")]
        band = left.band_join(right, on, bucket_width=4).df
        theta = left.inner_join(right, on).df
        assert sorted(map(tuple, band.collect())) == sorted(
            map(tuple, theta.collect())
        )

    def test_extra_eq_and_neq_triples(self, spark):
        left = Tafra(
            {
                "lid": [1, 2, 3, 4],
                "g": ["a", "a", "b", "b"],
                "lo": [0.0, 0.0, 0.0, 5.0],
                "hi": [9.0, 2.0, 9.0, 9.0],
            }
        )
        right = Tafra(
            {"rid": [1, 2, 3], "g2": ["a", "b", "b"], "p": [1.0, 6.0, 3.0]}
        )
        on = [
            ("g", "g2", "=="),
            ("lo", "p", "<="),
            ("hi", "p", ">="),
            ("lid", "rid", "!="),
        ]
        band = left.band_join(right, on, bucket_width=5).df
        theta = left.inner_join(right, on).df
        assert sorted(map(tuple, band.collect())) == sorted(
            map(tuple, theta.collect())
        )

    def test_no_band_pattern_raises(self, spark):
        left, right = self._tables(spark)
        with pytest.raises(ValueError, match="no band pattern"):
            left.band_join(right, [("lo", "p", "<=")], bucket_width=3)
        with pytest.raises(ValueError, match="bucket_width"):
            left.band_join(
                right, [("lo", "p", "<="), ("hi", "p", ">")], bucket_width=0
            )

    def test_null_bounds_match_nothing(self, spark):
        left = Tafra({"lid": [1, 2], "lo": [None, 1.0], "hi": [5.0, 3.0]})
        right = Tafra({"rid": [1], "p": [2.0]})
        on = [("lo", "p", "<="), ("hi", "p", ">=")]
        out = left.band_join(right, on, bucket_width=2).df.collect()
        assert [r["lid"] for r in out] == [2]

    def test_huge_long_keys_bucket_exactly(self, spark):
        # keys near 2^60 (nanosecond-epoch scale): a double-routed
        # floor(x / w) mis-buckets here and silently LOSES matches;
        # the integral pmod-identity bucket is exact at any magnitude
        base = 1 << 60
        left = Tafra(
            {
                "lid": [1, 2],
                "lo": [base + 10, base + 1000],
                "hi": [base + 20, base + 1010],
            }
        )
        right = Tafra(
            {"rid": [1, 2, 3], "p": [base + 15, base + 1005, base + 500]}
        )
        on = [("lo", "p", "<="), ("hi", "p", ">=")]
        got = sorted(
            (r["lid"], r["rid"])
            for r in left.band_join(right, on, bucket_width=7).df.collect()
        )
        assert got == [(1, 1), (2, 2)]

    def test_inverted_interval_matches_nothing(self, spark):
        # a corrupt row with swapped bounds must emit no match — not
        # materialize a key-range-sized descending bucket sequence
        left = Tafra(
            {"lid": [1, 2], "lo": [1.0e12, 1.0], "hi": [0.0, 4.0]}
        )
        right = Tafra({"rid": [1], "p": [2.0]})
        out = left.band_join(
            right, [("lo", "p", "<="), ("hi", "p", ">=")], bucket_width=2
        ).df.collect()
        assert [(r["lid"], r["rid"]) for r in out] == [(2, 1)]
