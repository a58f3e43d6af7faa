"""Sketch error-bound tests: no cross-engine oracle exists for
approximate structures (implementations differ by design), so each
sketch is checked against the EXACT answer within its published bound.
The Count-Min and Bloom sketches are DataFrame-native (counter/bitmap
tables); their size bounds and merge laws are asserted too."""

import pytest
from pyspark.sql import functions as F

from tafra_spark.functions import sketches as SK

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


class TestApproxDistinct:
    def test_hll_within_bound(self, spark, orders):
        exact = orders.select("o_custkey").distinct().count()
        approx = SK.approx_distinct(orders, "o_custkey", rsd=0.02).first()[0]
        assert abs(approx - exact) / exact <= 3 * 0.02  # 3σ


class TestApproxQuantiles:
    def test_gk_rank_error(self, spark, lineitem):
        import bisect

        n = lineitem.count()
        probs = [0.25, 0.5, 0.75]
        approx = SK.approx_quantiles(lineitem, "l_quantity", probs, rel_err=0.01)
        vals = sorted(r[0] for r in lineitem.select("l_quantity").collect())
        for p, a in zip(probs, approx):
            lo = bisect.bisect_left(vals, a)
            hi = bisect.bisect_right(vals, a)
            target = p * n
            assert lo - 0.01 * n - 1 <= target <= hi + 0.01 * n + 1


class TestFreqItems:
    def test_heavy_hitters_superset(self, spark, orders):
        out = SK.freq_items(orders, ["o_orderstatus"], support=0.1).first()[0]
        n = orders.count()
        truth = {
            r[0]
            for r in orders.groupBy("o_orderstatus").count().collect()
            if r[1] > 0.1 * n
        }
        assert truth <= set(out)  # no false negatives


class TestCountMin:
    def test_bounds_and_size(self, spark, orders):
        depth, width = 5, 1024
        cm = SK.count_min_build(orders, "o_orderstatus", depth, width)
        assert cm.count() <= depth * width
        n = orders.count()
        truth = dict(
            (r[0], r[1])
            for r in orders.groupBy("o_orderstatus").count().collect()
        )
        probes = orders.select("o_orderstatus").distinct()
        est = {
            r["value"]: r["estimate"]
            for r in SK.count_min_estimate(
                cm, probes, "o_orderstatus", depth, width
            ).collect()
        }
        for val, cnt in truth.items():
            assert est[val] >= cnt  # CM never undercounts
            assert est[val] <= cnt + (2.72 / width) * n + 1

    def test_merge_law(self, spark, orders):
        a = orders.filter(F.col("o_orderkey") % 2 == 0)
        b = orders.filter(F.col("o_orderkey") % 2 == 1)
        cm_a = SK.count_min_build(a, "o_orderstatus")
        cm_b = SK.count_min_build(b, "o_orderstatus")
        merged = (
            cm_a.unionByName(cm_b).groupBy("i", "b").agg(
                F.sum("cnt").alias("cnt")
            )
        )
        full = SK.count_min_build(orders, "o_orderstatus")
        m = {(r["i"], r["b"]): r["cnt"] for r in merged.collect()}
        f = {(r["i"], r["b"]): r["cnt"] for r in full.collect()}
        assert m == f


class TestBloom:
    def test_membership_bounds(self, spark, orders):
        m_bits, k = 1 << 18, 5
        bf = SK.bloom_build(orders, "o_orderkey", m_bits=m_bits, k=k)
        assert bf.count() <= m_bits // 64
        present = orders.select("o_orderkey").limit(500)
        res = SK.bloom_contains(bf, present, "o_orderkey", m_bits=m_bits, k=k)
        assert all(r["might_contain"] for r in res.collect())  # no false negs
        absent = spark.range(10_000_000, 10_001_000).select(
            F.col("id").alias("o_orderkey")
        )
        res2 = SK.bloom_contains(bf, absent, "o_orderkey", m_bits=m_bits, k=k)
        fp = sum(1 for r in res2.collect() if r["might_contain"]) / 1000
        # 15k keys in 2^18 bits, k=5 → theoretical fpp ≈ 0.02%; allow slack
        assert fp <= 0.05


class TestPortableSketches:
    def test_portable_cm_estimates_match_xxhash_family(self, spark):
        from tafra_spark.functions.sketches import (
            count_min_build,
            count_min_estimate,
        )

        df = spark.createDataFrame(
            [(i % 10,) for i in range(200)], "v long"
        )
        probes = spark.createDataFrame([(3,), (7,)], "v long")
        for portable in (False, True):
            sk = count_min_build(
                df, "v", depth=4, width=256, seed=1, portable=portable
            )
            est = {
                r["value"]: r["estimate"]
                for r in count_min_estimate(
                    sk, probes, "v", depth=4, width=256, seed=1,
                    portable=portable,
                ).collect()
            }
            # CM never undercounts; with width >> distinct it's exact
            assert est[3] == 20 and est[7] == 20

    def test_portable_bloom_no_false_negatives(self, spark):
        from tafra_spark.functions.sketches import (
            bloom_build,
            bloom_contains,
        )

        keys = spark.createDataFrame([(i,) for i in range(50)], "v long")
        probes = spark.createDataFrame(
            [(i,) for i in range(40, 60)], "v long"
        )
        bloom = bloom_build(keys, "v", m_bits=4096, k=3, portable=True)
        got = {
            r["value"]: r["might_contain"]
            for r in bloom_contains(
                bloom, probes, "v", m_bits=4096, k=3, portable=True
            ).collect()
        }
        # members always hit
        assert all(got[v] for v in range(40, 50))


class TestKmvDistinct:
    def test_exact_under_k_and_estimate_over_k(self, spark):
        from tafra_spark.functions.sketches import kmv_distinct

        # group 'small': 10 distinct < k -> exact; 'big': 500 distinct
        rows = [("small", i) for i in range(10) for _ in range(3)]
        rows += [("big", i) for i in range(500)]
        df = spark.createDataFrame(rows, "g string, v long")
        got = {
            r["g"]: r
            for r in kmv_distinct(df, "v", ["g"], k=64).collect()
        }
        assert got["small"]["n_hashes"] == 10
        assert got["small"]["est_distinct"] == 10.0
        assert got["big"]["n_hashes"] == 64
        # standard error ~ 1/sqrt(62) ~ 12.7%; allow 3 sigma
        assert 300 < got["big"]["est_distinct"] < 750

    def test_ungrouped_and_determinism(self, spark):
        from tafra_spark.functions.sketches import kmv_distinct

        df = spark.createDataFrame([(i % 200,) for i in range(1000)], "v long")
        a = kmv_distinct(df, "v", k=32).collect()[0]["est_distinct"]
        b = kmv_distinct(df, "v", k=32).collect()[0]["est_distinct"]
        assert a == b  # deterministic — no RNG, no partition dependence
        assert 120 < a < 320
        with pytest.raises(ValueError):
            kmv_distinct(df, "v", k=1)


class TestCmJoinSize:
    def test_never_undercounts_and_tightens_with_width(self, spark):
        from tafra_spark.functions.sketches import count_min_join_size

        left = spark.createDataFrame(
            [(k,) for k in [1, 1, 2, 3, 3, 3]], ["k"]
        )
        right = spark.createDataFrame(
            [(k,) for k in [1, 3, 3, 4]], ["k"]
        )
        # true join size: 1 matches 2*1, 3 matches 3*2 => 8
        true = 8
        wide = count_min_join_size(left, right, "k", "k", depth=4, width=4096)
        narrow = count_min_join_size(left, right, "k", "k", depth=4, width=2)
        est_wide = wide.collect()[0]["join_size_est"]
        est_narrow = narrow.collect()[0]["join_size_est"]
        assert est_wide == true      # no collisions at this width
        assert est_narrow >= true    # collisions only ever overcount
        assert est_narrow >= est_wide

    def test_portable_matches_default_guarantees(self, spark):
        from tafra_spark.functions.sketches import count_min_join_size

        left = spark.createDataFrame([(i % 7,) for i in range(50)], ["k"])
        right = spark.createDataFrame([(i % 5,) for i in range(30)], ["k"])
        true = (
            left.join(right, on="k").count()
        )
        for portable in (False, True):
            est = count_min_join_size(
                left, right, "k", "k", depth=4, width=1024, portable=portable
            ).collect()[0]["join_size_est"]
            assert est >= true
            assert est <= true * 2  # generous bound at this width

    def test_disjoint_and_empty_inputs_estimate_zero(self, spark):
        from tafra_spark.functions.sketches import count_min_join_size

        left = spark.createDataFrame([(1,), (2,)], ["k"])
        right = spark.createDataFrame([(3,), (4,)], ["k"])
        # wide sketch: no collisions, every hash row's product is 0
        est = count_min_join_size(
            left, right, "k", "k", depth=4, width=1 << 16
        ).collect()[0]["join_size_est"]
        assert est == 0
        empty = spark.createDataFrame([], "k long")
        est2 = count_min_join_size(
            empty, right, "k", "k", depth=4, width=64
        ).collect()[0]["join_size_est"]
        assert est2 == 0


class TestHyperLogLog:
    def test_estimate_within_published_error(self, spark):
        from tafra_spark.functions.sketches import hll_distinct

        n = 5000
        df = spark.createDataFrame(
            [(i % n,) for i in range(3 * n)], ["v"]
        )
        est = hll_distinct(df, "v", b=10).collect()[0]["est_distinct"]
        # rse ~ 1.04/sqrt(1024) ~ 3.3%; allow 4 sigma
        assert abs(est - n) / n < 0.13, est

    def test_small_range_linear_counting_is_near_exact(self, spark):
        from tafra_spark.functions.sketches import hll_distinct

        df = spark.createDataFrame([(i,) for i in range(40)], ["v"])
        est = hll_distinct(df, "v", b=10).collect()[0]["est_distinct"]
        # 40 distinct over 1024 registers: linear counting regime
        assert abs(est - 40) <= 2, est

    def test_registers_merge_by_union_remax(self, spark):
        from pyspark.sql import functions as F

        from tafra_spark.functions.sketches import hll_registers

        a = spark.createDataFrame([(i,) for i in range(500)], ["v"])
        b = spark.createDataFrame([(i,) for i in range(250, 750)], ["v"])
        both = spark.createDataFrame([(i,) for i in range(750)], ["v"])
        merged = (
            hll_registers(a, "v")
            .unionByName(hll_registers(b, "v"))
            .groupBy("bucket")
            .agg(F.max("register").alias("register"))
        )
        direct = hll_registers(both, "v")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_grouped_and_duplicates_invariant(self, spark):
        # the estimate must depend only on the DISTINCT value set
        from tafra_spark.functions.sketches import hll_distinct

        rows = [("a", i % 100) for i in range(1000)] + [
            ("b", i) for i in range(100)
        ]
        df = spark.createDataFrame(rows, ["g", "v"])
        out = {
            r["g"]: r["est_distinct"]
            for r in hll_distinct(df, "v", ["g"]).collect()
        }
        assert out["a"] == out["b"]

    def test_validates_b(self, spark):
        import pytest as _pytest

        from tafra_spark.functions.sketches import hll_registers

        df = spark.createDataFrame([(1,)], ["v"])
        with _pytest.raises(ValueError):
            hll_registers(df, "v", b=3)
