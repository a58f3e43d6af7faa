

class TestScd2Merge:
    def _dim(self, spark):
        return spark.createDataFrame(
            [
                (1, "gold", 10, None, True),
                (1, "bronze", 1, 10, False),
                (2, "silver", 5, None, True),
                (3, "gold", 7, None, True),
            ],
            "cust long, tier string, valid_from long, "
            "valid_to long, is_current boolean",
        )

    def test_close_insert_ignore_and_new_key(self, spark):
        from tafra_spark.operators.scd import scd2_merge

        upd = spark.createDataFrame(
            [
                (1, "platinum", 20),  # change: close + open
                (2, "silver", 25),    # unchanged: pass through
                (3, "silver", 3),     # stale (3 < 7): ignored
                (4, "gold", 30),      # new key
                (4, "silver", 28),    # older same-batch row: collapsed
            ],
            "cust long, tier string, effective_ts long",
        )
        out = sorted(
            tuple(r)
            for r in scd2_merge(
                self._dim(spark), upd, ["cust"], ["tier"], "effective_ts"
            ).collect()
        )
        assert out == [
            (1, "bronze", 1, 10, False),
            (1, "gold", 10, 20, False),
            (1, "platinum", 20, None, True),
            (2, "silver", 5, None, True),
            (3, "gold", 7, None, True),
            (4, "gold", 30, None, True),
        ]

    def test_empty_update_batch_is_identity(self, spark):
        from tafra_spark.operators.scd import scd2_merge

        empty = spark.createDataFrame(
            [], "cust long, tier string, effective_ts long"
        )
        dim = self._dim(spark)
        out = sorted(
            tuple(r)
            for r in scd2_merge(
                dim, empty, ["cust"], ["tier"], "effective_ts"
            ).collect()
        )
        assert out == sorted(tuple(r) for r in dim.collect())

    def test_missing_column_raises(self, spark):
        from tafra_spark.operators.scd import scd2_merge

        upd = spark.createDataFrame([(1, 2)], "cust long, effective_ts long")
        import pytest as _pytest

        with _pytest.raises(KeyError):
            scd2_merge(self._dim(spark), upd, ["cust"], ["tier"])

    def test_null_tracked_values_compare_null_safe(self, spark):
        from tafra_spark.operators.scd import scd2_merge

        dim = spark.createDataFrame(
            [(1, None, 5, None, True)],
            "cust long, tier string, valid_from long, "
            "valid_to long, is_current boolean",
        )
        same = spark.createDataFrame(
            [(1, None, 9)], "cust long, tier string, effective_ts long"
        )
        out = scd2_merge(dim, same, ["cust"], ["tier"]).collect()
        # NULL == NULL must count as unchanged, not as a new version
        assert len(out) == 1 and out[0]["is_current"]

    def test_null_valid_from_means_unknown_history_start(self, spark):
        from tafra_spark.operators.scd import scd2_merge

        dim = spark.createDataFrame(
            [(1, "gold", None, None, True)],
            "cust long, tier string, valid_from long, "
            "valid_to long, is_current boolean",
        )
        # empty batch: the initial-load row must survive untouched
        empty = spark.createDataFrame(
            [], "cust long, tier string, effective_ts long"
        )
        out = scd2_merge(dim, empty, ["cust"], ["tier"]).collect()
        assert [tuple(r) for r in out] == [(1, "gold", None, None, True)]
        # a change closes it (any update is newer than unknown start)
        upd = spark.createDataFrame(
            [(1, "silver", 7)], "cust long, tier string, effective_ts long"
        )
        rows = sorted(
            tuple(r)
            for r in scd2_merge(dim, upd, ["cust"], ["tier"]).collect()
        )
        assert rows == [
            (1, "gold", None, 7, False),
            (1, "silver", 7, None, True),
        ]

    def test_null_key_matches_null_safely(self, spark):
        from tafra_spark.operators.scd import scd2_merge

        dim = spark.createDataFrame(
            [(None, "gold", 1, None, True)],
            "cust long, tier string, valid_from long, "
            "valid_to long, is_current boolean",
        )
        upd = spark.createDataFrame(
            [(None, "silver", 9)],
            "cust long, tier string, effective_ts long",
        )
        rows = sorted(
            (r["tier"], r["is_current"])
            for r in scd2_merge(dim, upd, ["cust"], ["tier"]).collect()
        )
        # one closed + one open — NOT two open rows for the NULL key
        assert rows == [("gold", False), ("silver", True)]

    def test_null_effective_updates_ignored(self, spark):
        from tafra_spark.operators.scd import scd2_merge

        dim = self._dim(spark)
        upd = spark.createDataFrame(
            [(1, "platinum", None)],
            "cust long, tier string, effective_ts long",
        )
        out = sorted(
            tuple(r)
            for r in scd2_merge(dim, upd, ["cust"], ["tier"]).collect()
        )
        assert out == sorted(tuple(r) for r in dim.collect())


class TestOrderOps:
    def test_global_row_number_matches_single_partition_window(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from tafra_spark.operators.order import global_row_number

        rows = [(i, chr(97 + i % 5), (i * 37) % 11) for i in range(200)]
        df = spark.createDataFrame(rows, ["id", "k", "v"])
        for n_parts in (1, 3, 8):
            got = {
                r["id"]: r["rn"]
                for r in global_row_number(
                    df, ["k", "v", "id"], num_partitions=n_parts
                ).collect()
            }
            exp = {
                r["id"]: r["rn"]
                for r in df.select(
                    "id",
                    F.row_number()
                    .over(Window.orderBy("k", "v", "id"))
                    .alias("rn"),
                ).collect()
            }
            assert got == exp, n_parts

    def test_global_row_number_validates_columns(self, spark):
        import pytest as _pytest

        from tafra_spark.operators.order import global_row_number

        df = spark.createDataFrame([(1,)], ["a"])
        with _pytest.raises(KeyError):
            global_row_number(df, ["nope"])

    def test_sorted_neighborhood_matches_brute_force(self, spark):
        from tafra_spark.operators.order import sorted_neighborhood_pairs

        rows = [
            (i, "s%d" % ((i * 13) % 7), (i * 5) % 17) for i in range(60)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "k", "v"])
        for w in (1, 4):
            got = {
                (r["id_a"], r["id_b"], r["rank_gap"])
                for r in sorted_neighborhood_pairs(
                    df, ["k", "v"], window=w
                ).collect()
            }
            order = sorted((k, v, i) for i, k, v in rows)
            want = set()
            for i in range(len(order)):
                for j in range(i + 1, min(i + w + 1, len(order))):
                    want.add((order[i][2], order[j][2], j - i))
            assert got == want, w

    def test_sorted_neighborhood_validates_window(self, spark):
        import pytest as _pytest

        from tafra_spark.operators.order import sorted_neighborhood_pairs

        df = spark.createDataFrame([(1, "a")], ["doc_id", "k"])
        with _pytest.raises(ValueError):
            sorted_neighborhood_pairs(df, ["k"], window=0)
