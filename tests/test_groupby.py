"""Grouping tests (SURVEY.md §2.4; reference test_tafra.py:634-692)."""

import numpy as np
import pytest

from tafra_spark import Tafra
from tafra_spark.operators.groupby import AggSpecError


def _sorted_records(t):
    return sorted(tuple(r) for r in t.to_records())


class TestGroupBy:
    def test_sum_count(self, tafra):
        g = tafra.group_by(["y", "z"], {"x": sum}, {"count": len})
        assert g.rows == 4
        recs = {(r[0], r[1]): (r[2], r[3]) for r in g.to_records()}
        assert recs == {
            ("one", 0): (4, 2),
            ("two", 0): (2, 1),
            ("one", 1): (5, 1),
            ("two", 1): (10, 2),
        }

    def test_rename_spec(self, tafra):
        g = tafra.group_by(["y"], {"sum_x": (sum, "x"), "max_x": (max, "x")})
        recs = {r[0]: (r[1], r[2]) for r in g.to_records()}
        assert recs == {"one": (9, 5), "two": (12, 6)}

    def test_numpy_callables(self, tafra):
        g = tafra.group_by(["z"], {"m": (np.mean, "x"), "s": (np.std, "x")})
        recs = {r[0]: (r[1], r[2]) for r in g.to_records()}
        assert recs[0][0] == pytest.approx(2.0)
        assert recs[1][0] == pytest.approx(5.0)
        # np.std is population std (ddof=0)
        assert recs[0][1] == pytest.approx(np.std([1, 2, 3]))

    def test_arbitrary_callable_fallback(self, tafra):
        # a custom callable not in the translation table
        def second_largest(arr):
            return int(np.sort(arr)[-2])

        g = tafra.group_by(["z"], {"sl": (second_largest, "x")})
        recs = {r[0]: r[1] for r in g.to_records()}
        assert recs == {0: 2, 1: 5}

    def test_mixed_builtin_and_fallback(self, tafra):
        def spread(arr):
            return int(arr.max() - arr.min())

        g = tafra.group_by(["z"], {"s": (sum, "x"), "sp": (spread, "x")})
        cols = g.columns
        assert set(cols) == {"z", "s", "sp"}
        recs = {r[cols.index("z")]: r for r in g.to_records()}
        assert recs[0][cols.index("s")] == 6
        assert recs[0][cols.index("sp")] == 2

    def test_dtype_compat(self, tafra):
        # reference rule: int-column mean truncates back to int
        g = tafra.group_by(["z"], {"m": (np.mean, "x")}, dtype_compat=True)
        assert g.dtypes["m"] == "int64"

    def test_bad_key_raises(self, tafra):
        with pytest.raises(KeyError):
            tafra.group_by(["nope"], {"x": sum})
        with pytest.raises(KeyError):
            tafra.group_by(["y"], {"nope": sum})

    def test_bad_spec_raises(self, tafra):
        with pytest.raises(AggSpecError):
            tafra.group_by(["y"], {"x": 42})
        with pytest.raises(AggSpecError):
            tafra.group_by(["y"], {"x": (sum, 42)})


class TestTransform:
    def test_sum_broadcast(self, tafra):
        out = tafra.transform(["y", "z"], {"sum_x": (sum, "x")})
        assert out.rows == 6
        pdf = out.to_pandas().sort_values("x")
        assert pdf["sum_x"].tolist() == [4, 2, 4, 10, 5, 10]

    def test_iter_fn_count(self, tafra):
        out = tafra.transform(["z"], {}, {"n": len})
        pdf = out.to_pandas().sort_values("x")
        assert pdf["n"].tolist() == [3] * 6

    def test_arbitrary_callable(self, tafra):
        def spread(arr):
            return int(arr.max() - arr.min())

        out = tafra.transform(["z"], {"sp": (spread, "x")})
        pdf = out.to_pandas().sort_values("x")
        assert pdf["sp"].tolist() == [2, 2, 2, 2, 2, 2]


class TestIterateBy:
    def test_groups_first_occurrence_order(self, tafra):
        groups = list(tafra.iterate_by(["y", "z"]))
        keys = [g.group for g in groups]
        assert keys == [("one", 0), ("two", 0), ("two", 1), ("one", 1)]
        assert sum(g.tafra.rows for g in groups) == 6

    def test_single_key_unwrapped(self, tafra):
        groups = list(tafra.iterate_by(["z"]))
        assert [g.group for g in groups] == [0, 1]

    def test_masks(self, tafra):
        groups = list(tafra.iterate_by(["z"], collect_masks=True))
        assert groups[0].rows.tolist() == [True, True, True, False, False, False]

    def test_apply_by(self, tafra):
        def top1(pdf):
            return pdf.nlargest(1, "x")[["z", "x"]]

        out = tafra.apply_by(["z"], top1, "z long, x long")
        recs = _sorted_records(out)
        assert recs == [(0, 3), (1, 6)]


class TestUnion:
    def test_union_all(self, tafra):
        out = tafra.union(tafra)
        assert out.rows == 12

    def test_union_inplace(self, tafra):
        t = tafra.copy()
        t.union_inplace(tafra)
        assert t.rows == 12

    def test_union_name_mismatch(self, tafra):
        other = tafra.rename({"x": "xx"})
        with pytest.raises(ValueError):
            tafra.union(other)

    def test_union_dtype_mismatch(self, tafra):
        other = tafra.update_dtypes({"x": "float64"})
        with pytest.raises(TypeError):
            tafra.union(other)

    def test_union_column_count_mismatch(self, tafra):
        with pytest.raises(ValueError):
            tafra.union(tafra.select(["x", "y"]))


class TestExtensions:
    def test_distinct(self, tafra):
        assert tafra.select(["y"]).distinct().rows == 2

    def test_sort(self, tafra):
        out = tafra.sort("x", ascending=False)
        assert out.to_pandas()["x"].tolist() == [6, 5, 4, 3, 2, 1]

    def test_intersect_except(self, tafra):
        a = tafra.select(["y"]).distinct()
        b = Tafra({"y": ["one", "three"]})
        assert a.intersect(b).rows == 1
        assert sorted(a.except_all(b).to_pandas()["y"]) == ["two"]


class TestInvalidAggSpecs:
    def test_inverted_agg_spec_raises(self, tafra):
        """Reference parity (test_tafra.py:693-704): {sum: 'x'} and
        {len: 'count'} are inverted specs and must raise ValueError."""
        with pytest.raises(ValueError):
            tafra.group_by(["y", "z"], {sum: "x"})
        with pytest.raises(ValueError):
            tafra.group_by(["y", "z"], {}, {len: "count"})
