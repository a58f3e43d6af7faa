"""Core facade tests mirroring the reference test strategy (SURVEY.md §5):
construct → operate → structural invariant check on the canonical 6-row
fixture (FIXTURES.md F1)."""

import numpy as np
import pandas as pd
import pytest

from tafra_spark import Tafra


def check_tafra(t: Tafra) -> None:
    """Structural invariants (reference ``check_tafra``,
    test_tafra.py:87-128): columns/dtypes agree, row counts agree,
    every destructor works."""
    assert len(t.columns) == len(t.dtypes)
    assert set(t.columns) == set(t.dtypes)
    pdf = t.to_pandas()
    assert len(pdf) == t.rows
    assert list(pdf.columns) == list(t.columns)
    recs = list(t.to_records())
    assert len(recs) == t.rows
    arrays = t.to_list()
    assert all(len(a) == t.rows for a in arrays)
    arr = t.to_array()
    assert arr.shape == (t.rows, len(t.columns))


class TestConstruction:
    def test_dict(self, tafra):
        check_tafra(tafra)
        assert tafra.rows == 6
        assert tafra.columns == ("x", "y", "z")
        assert tafra.dtypes == {"x": "int64", "y": "str", "z": "int64"}

    def test_scalar_broadcast(self, spark):
        t = Tafra({"x": [1, 2, 3], "c": 9, "s": "hi"})
        pdf = t.to_pandas()
        assert pdf["c"].tolist() == [9, 9, 9]
        assert pdf["s"].tolist() == ["hi", "hi", "hi"]

    def test_sequence_of_pairs(self, spark):
        t = Tafra([("x", [1, 2]), ("y", ["a", "b"])])
        assert t.columns == ("x", "y")
        assert t.rows == 2

    def test_iterator_of_pairs(self, spark):
        t = Tafra(iter([("x", [1, 2]), ("y", ["a", "b"])]))
        assert t.columns == ("x", "y")

    def test_enumerate(self, spark):
        t = Tafra(enumerate([[1, 2], [3, 4]]))
        assert t.columns == ("0", "1")

    def test_mismatched_rows_raises(self, spark):
        with pytest.raises(ValueError):
            Tafra({"x": [1, 2, 3], "y": [1, 2]})

    def test_invalid_init_raises(self, spark):
        with pytest.raises((TypeError, ValueError)):
            Tafra(42)
        with pytest.raises(ValueError):
            Tafra([("bad",)])

    def test_from_records(self, spark):
        t = Tafra.from_records(
            [("Apples", 5, 0.95), ("Pears", 2, 0.80)],
            ["Fruit", "Amount", "Price"],
        )
        assert t.rows == 2
        assert t.dtypes["Fruit"] == "str"
        check_tafra(t)

    def test_from_records_empty(self, spark):
        t = Tafra.from_records([], ["a", "b", "c"])
        assert t.rows == 0
        assert t.columns == ("a", "b", "c")

    def test_from_pandas(self, spark):
        pdf = pd.DataFrame({"a": [1.5, 2.5], "b": ["x", "y"]})
        t = Tafra.from_dataframe(pdf)
        assert t.dtypes == {"a": "float64", "b": "str"}

    def test_as_tafra(self, spark, tafra):
        assert Tafra.as_tafra(tafra) is tafra
        assert Tafra.as_tafra({"x": [1]}).rows == 1
        assert Tafra.as_tafra(pd.Series([1, 2], name="s")).columns == ("s",)
        with pytest.raises(TypeError):
            Tafra.as_tafra(42)

    def test_dtypes_cast_at_construction(self, spark):
        t = Tafra({"x": [1, 2, 3]}, dtypes={"x": "float64"})
        assert t.dtypes["x"] == "float64"


class TestProperties:
    def test_shape_size_ndim(self, tafra):
        assert tafra.shape == (6, 3)
        assert tafra.size == 18
        assert tafra.ndim == 2
        assert len(tafra) == 6

    def test_setters_forbidden(self, tafra):
        for prop in ("columns", "rows", "dtypes", "data"):
            with pytest.raises(ValueError):
                setattr(tafra, prop, None)

    def test_dict_views(self, tafra):
        assert list(tafra.keys()) == ["x", "y", "z"]
        assert "x" in tafra
        assert tafra.get("nope", "dflt") == "dflt"
        data = tafra.data
        assert isinstance(data["x"], np.ndarray)
        assert data["x"].tolist() == [1, 2, 3, 4, 5, 6]


class TestIndexing:
    def test_column_returns_expr(self, tafra):
        from pyspark.sql import Column

        assert isinstance(tafra["x"], Column)
        with pytest.raises(KeyError):
            tafra["nope"]

    def test_mask_filter(self, tafra):
        out = tafra[tafra["x"] <= 4]
        assert out.rows == 4
        check_tafra(out)

    def test_int_row(self, tafra):
        row = tafra[2]
        assert row.rows == 1
        assert row.to_pandas()["x"].tolist() == [3]

    def test_negative_int_row(self, tafra):
        assert tafra[-1].to_pandas()["x"].tolist() == [6]

    def test_slice(self, tafra):
        assert tafra[1:3].to_pandas()["x"].tolist() == [2, 3]
        assert tafra[::2].to_pandas()["x"].tolist() == [1, 3, 5]

    def test_int_list(self, tafra):
        assert tafra[[1, 3]].to_pandas()["x"].tolist() == [2, 4]

    def test_bool_array(self, tafra):
        mask = np.array([True, False, True, False, True, False])
        assert tafra[mask].to_pandas()["x"].tolist() == [1, 3, 5]

    def test_str_list_select(self, tafra):
        out = tafra[["x", "y"]]
        assert out.columns == ("x", "y")

    def test_out_of_range(self, tafra):
        with pytest.raises(IndexError):
            tafra[10]


class TestMutation:
    def test_setitem_scalar(self, tafra):
        t = tafra.copy()
        t["w"] = 5
        assert t.to_pandas()["w"].tolist() == [5] * 6

    def test_setitem_array(self, tafra):
        t = tafra.copy()
        t["w"] = np.arange(6)
        assert t.to_pandas()["w"].tolist() == list(range(6))

    def test_setitem_expr(self, tafra):
        t = tafra.copy()
        t["x2"] = t["x"] * 2
        assert t.to_pandas()["x2"].tolist() == [2, 4, 6, 8, 10, 12]

    def test_setitem_replaces(self, tafra):
        t = tafra.copy()
        t["x"] = t["x"] + 10
        assert t.to_pandas()["x"].tolist() == [11, 12, 13, 14, 15, 16]

    def test_delitem(self, tafra):
        t = tafra.copy()
        del t["z"]
        assert t.columns == ("x", "y")

    def test_rename(self, tafra):
        out = tafra.rename({"x": "xx"})
        assert out.columns == ("xx", "y", "z")
        assert tafra.columns == ("x", "y", "z")
        with pytest.raises(KeyError):
            tafra.rename({"nope": "n"})

    def test_rename_inplace(self, tafra):
        t = tafra.copy()
        t.rename_inplace({"x": "xx"})
        assert t.columns == ("xx", "y", "z")

    def test_delete(self, tafra):
        out = tafra.delete(["y", "z"])
        assert out.columns == ("x",)
        with pytest.raises(KeyError):
            tafra.delete("nope")

    def test_update(self, tafra):
        other = Tafra({"w": [9, 8, 7, 6, 5, 4]})
        out = tafra.update(other)
        assert out.to_pandas()["w"].tolist() == [9, 8, 7, 6, 5, 4]
        with pytest.raises(ValueError):
            tafra.update(Tafra({"w": [1, 2]}))

    def test_update_overwrites(self, tafra):
        other = Tafra({"x": [0, 0, 0, 0, 0, 0]})
        out = tafra.update(other)
        assert out.to_pandas()["x"].tolist() == [0] * 6

    def test_update_dtypes(self, tafra):
        out = tafra.update_dtypes({"x": "float64"})
        assert out.dtypes["x"] == "float64"
        assert tafra.dtypes["x"] == "int64"

    def test_update_dtypes_empty_string_to_null(self, spark):
        t = Tafra({"x": ["1", "", "3"]})
        out = t.update_dtypes({"x": "int64"})
        vals = out.to_pandas()["x"]
        assert vals[0] == 1 and pd.isna(vals[1]) and vals[2] == 3


class TestCoalesce:
    def test_coalesce_basic(self, spark):
        # FIXTURES.md F3; reference test_tafra.py:919-937 — x ends fully
        # non-null; a new column y keeps None where all fills are None
        t = Tafra({"x": np.array([1, 2, None, 4, None], dtype=object)})
        out = t.coalesce("x", [[1, 2, 3, None, 5], [None, None, None, None, 5]])
        vals = out.to_pandas()["x"].tolist()
        assert vals == [1, 2, 3, 4, 5]
        out2 = t.coalesce("y", [[1, 2, 3, None, 5], [None, None, None, None, 5]])
        yvals = out2.to_pandas()["y"].tolist()
        assert yvals[0] == 1 and pd.isna(yvals[3]) and yvals[4] == 5

    def test_coalesce_creates_column(self, spark):
        t = Tafra({"x": [1, 2, 3]})
        out = t.coalesce("y", [7])
        assert out.to_pandas()["y"].tolist() == [7, 7, 7]

    def test_coalesce_nan(self, spark):
        t = Tafra({"x": [1.0, np.nan, 3.0]})
        out = t.coalesce("x", [9.0])
        assert out.to_pandas()["x"].tolist() == [1.0, 9.0, 3.0]


class TestSelectHeadCopy:
    def test_select(self, tafra):
        out = tafra.select(["x", "z"])
        assert out.columns == ("x", "z")
        assert tafra.select("x").columns == ("x",)
        with pytest.raises(KeyError):
            tafra.select(["nope"])

    def test_head(self, tafra):
        assert tafra.head(2).to_pandas()["x"].tolist() == [1, 2]

    def test_copy_independent(self, tafra):
        t = tafra.copy()
        t["w"] = 1
        assert "w" not in tafra.columns

    def test_pipe(self, tafra):
        out = tafra.pipe(lambda t: t.select(["x"]))
        assert out.columns == ("x",)
        out2 = tafra >> (lambda t: t.select(["y"]))
        assert out2.columns == ("y",)


class TestIterators:
    def test_iterrows(self, tafra):
        rows = list(tafra.iterrows())
        assert rows[0] == {"x": 1, "y": "one", "z": 0}

    def test_itertuples(self, tafra):
        rows = list(tafra.itertuples())
        assert rows[0].x == 1
        plain = list(tafra.itertuples(name=None))
        assert plain[0] == (1, "one", 0)

    def test_itercols(self, tafra):
        cols = dict(tafra.itercols())
        assert cols["x"].tolist() == [1, 2, 3, 4, 5, 6]

    def test_row_map(self, tafra):
        out = list(tafra.row_map(lambda t: t.rows))
        assert out == [1] * 6

    def test_tuple_map(self, tafra):
        out = list(tafra.tuple_map(lambda r: r.x * 2))
        assert out == [2, 4, 6, 8, 10, 12]

    def test_col_map(self, tafra):
        out = list(tafra.select(["x", "z"]).col_map(np.sum))
        assert out == [21, 3]

    def test_key_map(self, tafra):
        out = dict(tafra.select(["x", "z"]).key_map(np.sum))
        assert out == {"x": 21, "z": 3}


class TestSinks:
    def test_to_records_cast_null(self, spark):
        t = Tafra({"x": [1.0, np.nan]})
        recs = list(t.to_records(cast_null=True))
        assert recs[1][0] is None
        recs = list(t.to_records(cast_null=False))
        assert np.isnan(recs[1][0])

    def test_to_tuple(self, tafra):
        nt = tafra.to_tuple()
        assert nt.x.tolist() == [1, 2, 3, 4, 5, 6]
        plain = tafra.to_tuple(name=None)
        assert len(plain) == 3

    def test_to_list_inner(self, tafra):
        out = tafra.to_list(inner=True)
        assert out[0] == [1, 2, 3, 4, 5, 6]

    def test_to_html_pformat(self, tafra):
        html = tafra.to_html()
        assert "<table>" in html and "int64" in html
        s = tafra.pformat()
        assert "one" in s

    def test_to_csv_roundtrip(self, tafra, tmp_path):
        p = str(tmp_path / "t.csv")
        tafra.to_csv(p)
        back = Tafra.read_csv(p, dtypes=tafra.dtypes)
        assert back.dtypes == tafra.dtypes
        pd.testing.assert_frame_equal(back.to_pandas(), tafra.to_pandas())

    def test_parquet_roundtrip(self, tafra, tmp_path):
        p = str(tmp_path / "t.parquet")
        tafra.write_parquet(p)
        back = Tafra.read_parquet(p)
        assert set(back.columns) == set(tafra.columns)
        assert back.rows == 6


class TestRecordCasts:
    def test_to_records_dates_iso(self, spark):
        """Reference RECORD_TYPE parity (tafra/base.py:59-67): date and
        datetime values export as ISO strings for DB insertion."""
        import datetime as dt

        t = Tafra(
            {
                "d": [dt.date(2020, 1, 2), dt.date(2021, 3, 4)],
                "ts": [
                    dt.datetime(2020, 1, 2, 3, 4, 5),
                    dt.datetime(2021, 3, 4, 5, 6, 7),
                ],
                "x": [1.0, np.nan],
            }
        )
        recs = list(t.to_records(cast_null=True))
        assert recs[0][0] == "2020-01-02"
        assert recs[0][1] == "2020-01-02T03:04:05"
        assert recs[1][2] is None
        # cast_null=False keeps NaN but still ISO-casts dates
        recs = list(t.to_records(cast_null=False))
        assert recs[1][0] == "2021-03-04"
        assert np.isnan(recs[1][2])

    def test_to_records_column_validation(self, tafra):
        with pytest.raises(KeyError):
            list(tafra.to_records(columns=["nope"]))


class TestMixedObjectDivergence:
    """SURVEY.md §7.2 / VERDICT 'What's missing' #2: the reference keeps
    heterogeneous values in a numpy object column; this engine maps object
    columns to ONE Spark type (sampled from the first non-null value) and
    values that cannot fit become NULL/strings. That divergence is a
    documented contract — asserted here so it can never change silently."""

    def test_mixed_int_str_column_raises(self, spark):
        # first non-null sample is an int → column schema becomes long →
        # the later string value is REJECTED at construction. The
        # reference would silently keep a mixed object array; this engine
        # fails loudly instead — the asserted boundary of the divergence.
        with pytest.raises(Exception, match="can not accept|FIELD_DATA_TYPE"):
            Tafra({"m": np.array([1, "a", 2], dtype=object)})

    def test_str_first_mixed_column_stringifies(self, spark):
        t = Tafra({"m": np.array(["a", 1, None], dtype=object)})
        assert t.dtypes["m"] == "str"
        vals = t.to_pandas()["m"].tolist()
        assert vals[0] == "a"


class TestValidateFlag:
    def test_validate_false_trusts_arrays(self, spark):
        t = Tafra(
            {"x": np.array([1, 2, 3]), "y": np.array(["a", "b", "c"])},
            validate=False,
        )
        assert t.rows == 3
        assert t.to_pandas()["x"].tolist() == [1, 2, 3]

    def test_validate_true_runs_formatter(self, spark):
        from decimal import Decimal

        # default ObjectFormatter converts Decimal → float at ingest
        t = Tafra({"d": np.array([Decimal("1.5")], dtype=object)})
        assert t.dtypes["d"] == "float64"

    def test_validate_false_skips_formatter(self, spark):
        from decimal import Decimal

        # validate=False must NOT run the formatter: the raw object
        # column reaches the engine and is stringified by the unknown-
        # object fallback instead of becoming float
        t = Tafra(
            {"d": np.array([Decimal("1.5")], dtype=object)}, validate=False
        )
        assert t.dtypes["d"] == "str"

    def test_repr_pretty(self, tafra):
        class P:
            out = ""

            def text(self, s):
                self.out += s

        p = P()
        tafra._repr_pretty_(p, cycle=False)
        assert "one" in p.out
        p2 = P()
        tafra._repr_pretty_(p2, cycle=True)
        assert p2.out == "Tafra(...)"


class TestSqlSurface:
    def test_sql_over_views(self, spark, tafra):
        tafra.create_view("t_view")
        out = Tafra.sql(
            "SELECT y, sum(x) AS sx FROM t_view GROUP BY y ORDER BY y"
        ).to_pandas()
        assert out["sx"].tolist() == [9, 12]

    def test_sql_join_views(self, spark, tafra):
        tafra.create_view("t1")
        Tafra({"z": [0, 1], "label": ["zero", "one"]}).create_view("t2")
        out = Tafra.sql(
            "SELECT label, count(*) AS n FROM t1 JOIN t2 USING (z) "
            "GROUP BY label ORDER BY label"
        ).to_pandas()
        assert dict(zip(out["label"], out["n"])) == {"one": 3, "zero": 3}


class TestDuplicatePositional:
    def test_duplicate_indices_preserved(self, tafra):
        """numpy advanced-indexing parity: t[[0, 0, 2]] returns row 0
        twice (found by hypothesis, test_property.py)."""
        out = tafra[[0, 0, 2]].to_pandas()
        assert sorted(out["x"].tolist()) == [1, 1, 3]
        assert len(out) == 3


class TestUpsert:
    def test_upsert_replaces_and_appends(self, spark):
        base = Tafra({"k": [1, 2, 3], "v": [10, 20, 30]})
        changes = Tafra({"k": [2, 4], "v": [99, 40]})
        out = base.upsert(changes, ["k"]).to_pandas().sort_values("k")
        assert dict(zip(out["k"], out["v"])) == {1: 10, 2: 99, 3: 30, 4: 40}

    def test_upsert_schema_mismatch_raises(self, spark):
        base = Tafra({"k": [1], "v": [10]})
        with pytest.raises(ValueError):
            base.upsert(Tafra({"k": [1], "w": [2]}), ["k"])
        with pytest.raises(KeyError):
            base.upsert(Tafra({"k2": [1], "v": [2]}), ["k2"])


class TestReviewRegressions:
    def test_empty_positional_selection(self, tafra):
        out = tafra[[]]
        assert out.rows == 0
        assert out.columns == ("x", "y", "z")
        out2 = tafra[np.array([], dtype=int)]
        assert out2.rows == 0


class TestUpdateCoercion:
    def test_update_accepts_dict(self, tafra):
        """Reference parity (test_tafra.py:527): update takes raw data."""
        out = tafra.update({"w": [1, 2, 3, 4, 5, 6]})
        assert out.to_pandas()["w"].tolist() == [1, 2, 3, 4, 5, 6]

    def test_update_dtypes_numpy_datetime_string(self, spark):
        """'<M8[D]' numpy dtype strings cast (test_tafra.py:899-903)."""
        import datetime as dt

        t = Tafra({"d": ["2020-01-01", "2020-02-01"]})
        out = t.update_dtypes({"d": "<M8[D]"})
        assert out.dtypes["d"] == "datetime64"


class TestProfile:
    def test_profile_stats(self, spark):
        from tafra_spark.core import Tafra

        df = spark.createDataFrame(
            [(1, 2.5, "a"), (2, None, "b"), (2, 0.5, None)],
            "x long, y double, s string",
        )
        rows = {r["col_name"]: r for r in Tafra._wrap(df).profile().df.collect()}
        assert set(rows) == {"x", "y", "s"}
        x = rows["x"]
        assert (x["n_rows"], x["n_nulls"], x["n_distinct"]) == (3, 0, 2)
        assert (x["min_repr"], x["max_repr"]) == ("1000000", "2000000")
        y = rows["y"]
        assert (y["n_nulls"], y["n_distinct"]) == (1, 2)
        assert y["min_repr"] == "500000"
        s = rows["s"]
        assert (s["n_nulls"], s["min_repr"], s["max_repr"]) == (1, "a", "b")


class TestMelt:
    def test_melt_inverse_of_wide(self, spark):
        t = Tafra({"k": ["a", "b"], "x": [1, 2], "y": [10, 20]})
        out = t.melt(["k"], ["x", "y"], var_name="m", value_name="v")
        rows = {(r["k"], r["m"]): r["v"] for r in out.df.collect()}
        assert rows == {
            ("a", "x"): 1, ("a", "y"): 10,
            ("b", "x"): 2, ("b", "y"): 20,
        }
        assert out.columns == ("k", "m", "v")

    def test_melt_default_names_and_row_count(self, spark):
        t = Tafra({"k": ["a"], "x": [1], "y": [2], "z": [3]})
        out = t.melt(["k"], ["x", "y", "z"])
        assert out.rows == 3
        assert set(out.columns) == {"k", "variable", "value"}


class TestExplainPlan:
    def test_structured_summary(self, spark):
        from tafra_spark import Tafra

        li = Tafra.read_parquet(
            "/root/testdata/sf0.001/lineitem.parquet", spark
        )
        out = li[li["l_quantity"] > 45].select(["l_orderkey"])
        info = out.explain_plan()
        assert any("l_quantity" in p for p in info["pushed_filters"])
        assert info["read_schemas"] and set(info["read_schemas"][0]) == {
            "l_orderkey", "l_quantity",
        }
        assert info["n_exchanges"] == 0
        assert not info["has_cartesian"]

    def test_broadcast_flag(self, spark):
        from tafra_spark import Tafra

        li = Tafra.read_parquet(
            "/root/testdata/sf0.001/lineitem.parquet", spark
        )
        supp = Tafra.read_parquet(
            "/root/testdata/sf0.001/supplier.parquet", spark
        )
        j = li.inner_join(supp, [("l_suppkey", "s_suppkey", "==")])
        assert j.explain_plan()["has_broadcast_join"]


def test_survey_query_count_matches_registry():
    """SURVEY §2.9's advertised registry size must equal the actual
    queries()/oracle_sql() registry — the r5 verdict caught the header
    drifting (183 vs 191); this pins it."""
    import re
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o), "queries() and oracle_sql() keys must match"
    with open("/root/repo/SURVEY.md") as fh:
        text = fh.read()
    m = re.search(r"### 2\.9 .*?(\d+) registry queries", text)
    assert m, "SURVEY.md §2.9 must state the registry query count"
    assert int(m.group(1)) == len(q), (
        f"SURVEY.md §2.9 says {m.group(1)} registry queries, "
        f"registry has {len(q)}"
    )


def test_driver_window_is_50_unique_registry_rows():
    """The driver verifies the FIRST 50 queries() entries; the window
    list must hold exactly 50 UNIQUE registry names (a duplicate would
    silently shrink the verified set — rows 51+ are never checked) and
    queries() must actually lead with it in order (r10)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    window = entry._R13_WINDOW
    assert len(window) == 50
    assert len(set(window)) == 50
    q = entry.queries()
    assert list(q)[:50] == window
    assert set(window) <= set(entry.oracle_sql())
