"""Plan-shape tests: the scale contract is asserted, not assumed.

Every test here inspects the PHYSICAL plan of a real query over the
driver-provided parquet and asserts the property that matters at 100 TB:
filter pushdown, column pruning, broadcast selection, bounded shuffle
counts."""

import pytest
from pyspark.sql import functions as F

from tafra_spark import Tafra
from tafra_spark.plans import (
    count_exchanges,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


class TestPushdownPruning:
    def test_filter_pushed_to_scan(self, spark, li):
        df = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
        pf = pushed_filters(df)
        assert any("GreaterThan(l_quantity" in p for p in pf)

    def test_projection_prunes_read_schema(self, spark, li):
        df = li.select("l_orderkey", "l_quantity")
        schemas = read_schema_columns(df)
        assert schemas and set(schemas[0]) == {"l_orderkey", "l_quantity"}

    def test_facade_filter_pushes_down(self, spark):
        t = Tafra.read_parquet(f"{SF}/lineitem.parquet", spark)
        out = t[t["l_quantity"] > 45].select(["l_orderkey"])
        pf = pushed_filters(out.df)
        assert any("l_quantity" in p for p in pf)

    def test_facade_select_prunes(self, spark):
        t = Tafra.read_parquet(f"{SF}/part.parquet", spark)
        out = t.select(["p_partkey", "p_name"])
        schemas = read_schema_columns(out.df)
        assert schemas and set(schemas[0]) == {"p_partkey", "p_name"}


class TestJoinStrategy:
    def test_small_dim_join_broadcasts(self, spark, li):
        nation = spark.read.parquet(f"{SF}/nation.parquet")
        supp = spark.read.parquet(f"{SF}/supplier.parquet")
        df = li.join(supp, li.l_suppkey == supp.s_suppkey).join(
            nation, supp.s_nationkey == nation.n_nationkey
        )
        assert has_broadcast_join(df)

    def test_facade_join_broadcasts_small_side(self, spark):
        li = Tafra.read_parquet(f"{SF}/lineitem.parquet", spark)
        supp = Tafra.read_parquet(f"{SF}/supplier.parquet", spark)
        out = li.inner_join(supp, [("l_suppkey", "s_suppkey", "==")])
        assert has_broadcast_join(out.df)

    def test_groupby_single_exchange(self, spark, li):
        df = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
        assert count_exchanges(df) == 1

    def test_transform_single_exchange(self, spark):
        t = Tafra.read_parquet(f"{SF}/lineitem.parquet", spark)
        out = t.transform(["l_orderkey"], {"s": (sum, "l_quantity")})
        # window over partitionBy = exactly one hash exchange
        assert count_exchanges(out.df) == 1

    def test_broadcast_join_no_shuffle(self, spark, li):
        supp = spark.read.parquet(f"{SF}/supplier.parquet")
        df = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        assert count_exchanges(df) == 0


class TestDedupPlanShape:
    def test_exact_dedup_single_exchange(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        from tafra_spark.functions.dedup import exact_dup_groups

        assert count_exchanges(exact_dup_groups(docs)) == 1

    def test_minhash_partial_aggregation(self, spark):
        from tafra_spark.functions.dedup import minhash_signatures
        from tafra_spark.plans import explain_str

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = explain_str(minhash_signatures(docs, num_hashes=4))
        # map-side partial min before the shuffle
        assert "partial_min" in plan


class TestExtensionPlanCeilings:
    """Shuffle-count ceilings for the dedup/similarity pipelines: a plan
    regression (e.g. an optimizer rule re-expanding a shared stage, or a
    lost broadcast) shows up as extra exchanges here, failing CI before
    the bench ever runs."""

    def test_minhash_lsh_pairs_exchange_ceiling(self, spark):
        from tafra_spark.functions.dedup import minhash_lsh_pairs

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        df = minhash_lsh_pairs(docs, num_hashes=4, band_size=2)
        # signature agg + band-join/distinct; never candidate-quadratic
        assert count_exchanges(df) <= 3

    def test_simhash_pairs_exchange_ceiling(self, spark):
        from tafra_spark.functions.dedup import simhash_pairs

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        df = simhash_pairs(docs, max_hamming=3, bits=60, portable=True)
        assert count_exchanges(df) <= 3

    def test_fuzzy_dedup_single_shingle_pass(self, spark):
        from tafra_spark.functions.dedup import fuzzy_dedup_pairs
        from tafra_spark.plans import explain_str

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        df = fuzzy_dedup_pairs(docs, num_hashes=4, band_size=2, threshold=0.5)
        assert count_exchanges(df) <= 4
        # the shared shingle table must come from the cache, not be
        # recomputed per consumer: the plan references the in-memory
        # relation instead of multiple shingling projections
        assert "InMemoryTableScan" in explain_str(df)

    def test_lsh_ann_single_exchange(self, spark):
        from tafra_spark.functions.similarity import lsh_ann_topk

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5)
        df = lsh_ann_topk(emb, q, dim=64, k=5, n_planes=8)
        # corpus hashed narrow; query side broadcast; one exchange for
        # the per-query rank window
        assert count_exchanges(df) <= 1
        assert has_broadcast_join(df)

    def test_cosine_topk_single_exchange(self, spark):
        from tafra_spark.functions.similarity import cosine_topk

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5)
        df = cosine_topk(emb, q, k=5)
        assert count_exchanges(df) <= 1
        assert has_broadcast_join(df)
