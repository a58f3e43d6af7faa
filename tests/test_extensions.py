"""Tests for operators beyond the reference surface: semi/anti/full
joins, rollup/cube/pivot."""

import pytest

from tafra_spark import Tafra
from tafra_spark.operators.groupby import AggSpecError


@pytest.fixture()
def right(spark):
    return Tafra({"a": [1, 2, 3], "b": ["x", "y", "z"]})


class TestSemiAntiFull:
    def test_semi_join(self, tafra, right):
        out = tafra.semi_join(right, [("x", "a", "==")])
        assert out.columns == ("x", "y", "z")
        assert sorted(out.to_pandas()["x"]) == [1, 2, 3]

    def test_anti_join(self, tafra, right):
        out = tafra.anti_join(right, [("x", "a", "==")])
        assert sorted(out.to_pandas()["x"]) == [4, 5, 6]

    def test_full_join(self, tafra, right):
        small = tafra[tafra["x"] <= 2]
        out = small.full_join(right, [("x", "a", "==")])
        pdf = out.to_pandas()
        assert len(pdf) == 3  # 2 matched + 1 right-only
        assert pdf["x"].isna().sum() == 1

    def test_semi_join_theta(self, tafra, right):
        out = tafra.semi_join(right, [("x", "a", "<")])
        # x < max(a)=3 → x in {1,2}
        assert sorted(out.to_pandas()["x"]) == [1, 2]

    def test_dtype_validation_still_applies(self, tafra, spark):
        bad = Tafra({"a": [1.0]})
        with pytest.raises(TypeError):
            tafra.semi_join(bad, [("x", "a", "==")])


class TestRollupCubePivot:
    def test_rollup(self, tafra):
        out = tafra.rollup(["y", "z"], {"x": sum}).to_pandas()
        # 4 leaf groups + 2 y-subtotals + 1 grand total
        assert len(out) == 7
        grand = out[out["y"].isna() & out["z"].isna()]
        assert grand["x"].iloc[0] == 21

    def test_cube(self, tafra):
        out = tafra.cube(["y", "z"], {"x": sum}).to_pandas()
        # 4 leaves + 2 y + 2 z + 1 grand
        assert len(out) == 9

    def test_pivot(self, tafra):
        out = tafra.pivot(["z"], "y", ["one", "two"], {"x": sum}).to_pandas()
        byz = out.set_index("z")
        assert byz.loc[0, "one"] == 4
        assert byz.loc[1, "two"] == 10

    def test_untranslatable_raises(self, tafra):
        with pytest.raises(AggSpecError):
            tafra.rollup(["y"], {"x": lambda a: 1})
