"""Join tests (SURVEY.md §2.3; reference test_tafra.py:939-1099;
FIXTURES.md F2)."""

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
