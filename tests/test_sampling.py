

class TestTemperatureMix:
    def test_alpha_half_flattens_shares(self, spark):
        import math

        from tafra_spark.functions.sampling import temperature_mix

        # source a: 90 tokens, b: 10 — raw 90/10, temperature-mixed
        # shares move toward sqrt(90):sqrt(10) = 3:1
        rows = [(1, "a", "w " * 90), (2, "b", "w " * 10)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {
            r["source"]: r
            for r in temperature_mix(df, budget_tokens=1000).collect()
        }
        assert got["a"]["n_tokens"] == 90 and got["b"]["n_tokens"] == 10
        assert got["a"]["raw_share_q6"] == 900_000
        wa = math.floor(math.sqrt(90) * 1e6 + 0.5)
        wb = math.floor(math.sqrt(10) * 1e6 + 0.5)
        assert got["a"]["temp_share_q6"] == wa * 1_000_000 // (wa + wb)
        assert got["b"]["planned_tokens"] == 1000 * wb // (wa + wb)
        # tail boosted, head flattened
        assert got["b"]["temp_share_q6"] > 100_000
        assert got["a"]["temp_share_q6"] < 900_000
