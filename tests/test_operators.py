

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
