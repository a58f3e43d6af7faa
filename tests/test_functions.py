"""Tests for the scale-extension operators: text analysis, dedup,
similarity, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tafra_spark.functions import dedup as D
from tafra_spark.functions import multimodal as M
from tafra_spark.functions import similarity as S
from tafra_spark.functions import text as TX

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, "completely different content about spark engines"),
        (4, ""),
        (5, "der hund und die katze sind nicht da"),
        (6, "le chat est dans la maison pour une nuit"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(6, 8).astype("float32")
    base[1] = base[0] * 1.001  # near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


class TestText:
    def test_token_count(self, spark, docs):
        out = {
            r["doc_id"]: r["n"]
            for r in docs.select(
                "doc_id", TX.token_count(F.col("text")).alias("n")
            ).collect()
        }
        assert out[0] == 9
        assert out[4] == 0

    def test_quality_bounds(self, spark, docs):
        vals = [
            r["q"]
            for r in docs.select(TX.quality_score(F.col("text")).alias("q")).collect()
        ]
        assert all(0.0 <= v <= 1.0 for v in vals)

    def test_language_id(self, spark, docs):
        out = {
            r["doc_id"]: r["lang"]
            for r in docs.select(
                "doc_id", TX.language_id(F.col("text")).alias("lang")
            ).collect()
        }
        assert out[0] == "en"
        assert out[5] == "de"
        assert out[6] == "fr"
        assert out[4] == "und"

    def test_fingerprint_normalizes_whitespace(self, spark):
        df = spark.createDataFrame(
            [(0, "Hello   World"), (1, "hello world")], ["doc_id", "text"]
        )
        fps = [r["fp"] for r in df.select(TX.fingerprint(F.col("text")).alias("fp")).collect()]
        assert fps[0] == fps[1]


class TestDedup:
    def test_exact_dedup(self, spark, docs):
        out = D.exact_dedup(docs)
        ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
        assert 2 not in ids  # dup of 0 dropped, min id kept
        assert 0 in ids
        assert len(ids) == docs.count() - 1

    def test_exact_dup_groups(self, spark, docs):
        groups = D.exact_dup_groups(docs).collect()
        assert len(groups) == 1
        assert groups[0]["n_dups"] == 2
        assert groups[0]["keep_id"] == 0

    def test_shingles_short_doc(self, spark):
        df = spark.createDataFrame([(0, "one two")], ["doc_id", "text"])
        sh = df.select(D.shingles(F.col("text"), 3).alias("sh")).first()["sh"]
        assert sh == ["one two"]

    def test_minhash_identical_docs_same_signature(self, spark, docs):
        sig = D.minhash_signatures(docs, num_hashes=4).collect()
        by_id = {r["doc_id"]: (r["h0"], r["h1"], r["h2"], r["h3"]) for r in sig}
        assert by_id[0] == by_id[2]
        assert by_id[0] != by_id[3]

    def test_lsh_finds_near_dups(self, spark, docs):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in D.minhash_lsh_pairs(docs, num_hashes=8, band_size=2).collect()
        }
        assert (0, 2) in pairs  # exact dups always collide
        assert (0, 1) in pairs  # 8/9 shingle overlap should band-collide

    def test_jaccard_exact_values(self, spark, docs):
        pairs = D.ngram_jaccard_pairs(docs, None, shingle_k=3, threshold=0.1)
        vals = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
        assert vals[(0, 2)] == 1.0
        # doc0 vs doc1: 9 words → 7 shingles each, 6 shared
        assert vals[(0, 1)] == pytest.approx(6 / 8, abs=1e-6)

    def test_simhash_near_dups(self, spark, docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in D.simhash_pairs(docs, max_hamming=3).collect()
        }
        assert pairs.get((0, 2)) == 0  # identical text → identical simhash

    def test_simhash_table_deterministic(self, spark, docs):
        a = {r["doc_id"]: r["sh"] for r in D.simhash_table(docs).collect()}
        b = {r["doc_id"]: r["sh"] for r in D.simhash_table(docs).collect()}
        assert a == b
        assert all(v >= 0 for v in a.values())


class TestSimilarity:
    def test_cosine_identity(self, spark, vectors):
        out = vectors.select(
            S.cosine(F.col("embedding"), F.col("embedding")).alias("c")
        ).collect()
        assert all(abs(r["c"] - 1.0) < 1e-9 for r in out)

    def test_topk_finds_planted_neighbor(self, spark, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        out = S.cosine_topk(vectors, q, k=2)
        rows = out.orderBy("rank").collect()
        assert rows[0]["neighbor_id"] == 1  # planted near-dup
        assert rows[0]["cos"] > 0.999

    def test_topk_excludes_self(self, spark, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        out = S.cosine_topk(vectors, q, k=5).collect()
        assert all(r["neighbor_id"] != 0 for r in out)

    def test_lsh_ann_recall_of_planted_pair(self, spark, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        out = S.lsh_ann_topk(vectors, q, dim=8, k=3, n_planes=4).collect()
        # near-identical vectors share every hyperplane sign → same bucket
        assert any(r["neighbor_id"] == 1 for r in out)

    def test_assign_centroids_total(self, spark, vectors):
        cents = vectors.filter(F.col("vec_id") < 2)
        rest = vectors.filter(F.col("vec_id") >= 2)
        out = S.assign_centroids(rest, cents)
        assert out.count() == rest.count()
        assert set(r["centroid_id"] for r in out.collect()) <= {0, 1}


class TestMultimodal:
    def test_asset_roundtrip_decode(self, spark):
        assets = M.asset_table(spark, n=10)
        decoded = M.decode_images(assets).collect()
        assert len(decoded) == 10
        assert all(r["width"] == 8 and r["height"] == 8 for r in decoded)
        assert all(0 <= r["mean_intensity"] <= 255 for r in decoded)

    def test_decode_deterministic(self, spark):
        a = M.decode_images(M.asset_table(spark, n=5)).collect()
        b = M.decode_images(M.asset_table(spark, n=5)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_features_normalized(self, spark):
        feats = M.extract_image_features(M.asset_table(spark, n=5)).collect()
        for r in feats:
            norm = float(np.linalg.norm(r["features"]))
            assert norm == pytest.approx(1.0, abs=1e-5)

    def test_library_mimes_without_pil_raise(self, spark, monkeypatch):
        # formats that genuinely need an imaging library still fence
        # (baseline/progressive JPEG decode via the vendored codec as
        # of r7, lossless SOF3 + 12-bit SOF1 as of r9; arithmetic
        # coding and formats like webp/tiff stay PIL-gated)
        monkeypatch.setattr(M, "_HAS_PIL", False)
        with pytest.raises(NotImplementedError):
            M._decode_stub(b"RIFF....WEBP", "image/webp")
        sof9 = (
            b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        )
        with pytest.raises(NotImplementedError):
            M._decode_stub(sof9, "image/jpeg")

    def test_fake_mime_decodes_without_pil(self, monkeypatch):
        monkeypatch.setattr(M, "_HAS_PIL", False)
        arr = M._decode_stub(M.fake_image_bytes(7), "image/fake")
        assert arr.shape == (8, 8)

    def test_real_png_decodes_without_pil(self, monkeypatch):
        # REAL encoded bytes through the real-mime branch: a genuine
        # PNG (signature, IHDR, zlib IDAT, CRCs) via the vendored codec
        from tafra_spark.functions._png import encode_png_gray

        monkeypatch.setattr(M, "_HAS_PIL", False)
        src = np.arange(64, dtype=np.uint8).reshape(8, 8)
        arr = M._decode_stub(encode_png_gray(src), "image/png")
        assert arr.shape == (8, 8)
        assert arr[0, 1] == 1
        assert (arr == src).all()

    def test_png_filter_types_roundtrip(self):
        # hand-build IDATs using each scanline filter (Sub/Up/Average/
        # Paeth) — real encoders emit all of them, and a filter-0-only
        # reader would silently corrupt pixels
        import struct
        import zlib

        from tafra_spark.functions import _png

        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, size=(6, 5), dtype=np.uint8)

        def encode_with_filter(a, ftype):
            h, w = a.shape
            prev = np.zeros(w, dtype=np.int32)
            raw = bytearray()
            for y in range(h):
                cur = a[y].astype(np.int32)
                line = np.zeros(w, dtype=np.int32)
                for x in range(w):
                    left = int(cur[x - 1]) if x else 0
                    up = int(prev[x])
                    ul = int(prev[x - 1]) if x else 0
                    pred = {
                        1: left,
                        2: up,
                        3: (left + up) >> 1,
                        4: _png._paeth(left, up, ul),
                    }[ftype]
                    line[x] = (int(cur[x]) - pred) & 0xFF
                raw.append(ftype)
                raw.extend(int(v) for v in line)
                prev = cur
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + _png._chunk(b"IHDR", ihdr)
                + _png._chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _png._chunk(b"IEND", b"")
            )

        for ftype in (1, 2, 3, 4):
            out = _png.decode_png_gray(encode_with_filter(img, ftype))
            assert (out == img).all(), f"filter {ftype}"

    def test_rgb_png_roundtrip_and_luminance(self):
        # r6: color type 2 — RGB round-trips through decode_png and
        # collapses to PIL's exact convert("L") fixed-point luminance
        from tafra_spark.functions import _png

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
        payload = _png.encode_png_rgb(img)
        back = _png.decode_png(payload)
        assert back.shape == (5, 7, 3) and (back == img).all()
        lum = _png.decode_png_gray(payload)
        r, g, b = (img[:, :, i].astype(np.uint32) for i in range(3))
        exp = ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
            np.uint8
        )
        assert (lum == exp).all()

    def test_rgb_png_filter_types(self):
        # the scanline filters predict from the SAME CHANNEL bpp bytes
        # back — hand-encode each filter at bpp=3 and round-trip
        import struct
        import zlib

        from tafra_spark.functions import _png

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8)
        h, w, bpp = img.shape
        flat = img.reshape(h, w * bpp)

        def encode_with_filter(ftype):
            prev = np.zeros(w * bpp, dtype=np.int32)
            raw = bytearray()
            for y in range(h):
                cur = flat[y].astype(np.int32)
                line = np.zeros(w * bpp, dtype=np.int32)
                for x in range(w * bpp):
                    left = int(cur[x - bpp]) if x >= bpp else 0
                    up = int(prev[x])
                    ul = int(prev[x - bpp]) if x >= bpp else 0
                    pred = {
                        1: left,
                        2: up,
                        3: (left + up) >> 1,
                        4: _png._paeth(left, up, ul),
                    }[ftype]
                    line[x] = (int(cur[x]) - pred) & 0xFF
                raw.append(ftype)
                raw.extend(int(v) for v in line)
                prev = cur
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + _png._chunk(b"IHDR", ihdr)
                + _png._chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _png._chunk(b"IEND", b"")
            )

        for ftype in (1, 2, 3, 4):
            out = _png.decode_png(encode_with_filter(ftype))
            assert (out == img).all(), f"rgb filter {ftype}"

    def test_rgb_png_through_pipeline(self, spark, monkeypatch):
        # end-to-end: real RGB PNG bytes through the Arrow-batched
        # decode stage without PIL
        from tafra_spark.functions._png import encode_png_rgb

        monkeypatch.setattr(M, "_HAS_PIL", False)
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
        rows = [(0, "image", encode_png_rgb(img), (8, 8, None, "image/png"))]
        df = spark.createDataFrame(rows, schema=M.MULTIMODAL_SCHEMA)
        out = M.decode_images(df).collect()
        assert len(out) == 1
        r, g, b = (img[:, :, i].astype(np.uint32) for i in range(3))
        lum = ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
            np.uint8
        )
        assert out[0]["width"] == 8 and out[0]["height"] == 8
        assert out[0]["mean_intensity"] == pytest.approx(
            float(lum.mean()), abs=0.51
        )

    def test_real_png_through_pipeline(self, spark, monkeypatch):
        # end-to-end: real PNG bytes ride the binary column through the
        # Arrow-batched decode and feature stages
        from tafra_spark.functions._png import encode_png_gray

        monkeypatch.setattr(M, "_HAS_PIL", False)
        rows = []
        for i in range(4):
            rng = np.random.RandomState(i)
            img = rng.randint(0, 256, size=(8, 8), dtype=np.uint8)
            rows.append(
                (i, "image", encode_png_gray(img), (8, 8, None, "image/png"))
            )
        df = spark.createDataFrame(rows, schema=M.MULTIMODAL_SCHEMA)
        decoded = {r["asset_id"]: r for r in M.decode_images(df).collect()}
        assert len(decoded) == 4
        for i in range(4):
            rng = np.random.RandomState(i)
            img = rng.randint(0, 256, size=(8, 8), dtype=np.uint8)
            assert decoded[i]["width"] == 8 and decoded[i]["height"] == 8
            assert decoded[i]["mean_intensity"] == pytest.approx(
                float(img.mean()), abs=0.51
            )
        feats = M.extract_image_features(df).collect()
        for r in feats:
            assert float(np.linalg.norm(r["features"])) == pytest.approx(
                1.0, abs=1e-5
            )

    def test_video_frame_sampling(self, spark):
        rows = [(1, "video", None, (None, None, 5000, "video/fake"))]
        df = spark.createDataFrame(rows, schema=M.MULTIMODAL_SCHEMA)
        frames = M.sample_video_frames(df, every_ms=1000).collect()
        assert len(frames) == 6  # 0..5000 inclusive step 1000


class TestIvfAndNearDups:
    @pytest.fixture()
    def emb(self, spark):
        return spark.read.parquet(f"{SF}/embeddings.parquet")

    def test_ivf_full_probe_equals_exact(self, spark, emb):
        """With nprobe == n_centroids every partition is probed, so IVF
        must equal brute-force top-k over the same corpus."""
        from tafra_spark.functions.similarity import cosine_topk, ivf_topk

        corpus = emb.filter(F.col("vec_id") >= 8)
        queries = emb.filter(F.col("vec_id") < 3)
        centroids = emb.filter(F.col("vec_id") < 8)
        exact = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in cosine_topk(corpus, queries, k=3).collect()
        }
        ivf = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ivf_topk(corpus, queries, centroids, k=3, nprobe=8).collect()
        }
        assert ivf == exact

    def test_ivf_probe_subset(self, spark, emb):
        """nprobe=1 results are a (possibly lossy) subset of correct
        neighbors — every returned neighbor must belong to the probed
        partition and scores must be exact."""
        from tafra_spark.functions.similarity import cosine, ivf_topk

        corpus = emb.filter(F.col("vec_id") >= 8)
        queries = emb.filter(F.col("vec_id") < 2)
        centroids = emb.filter(F.col("vec_id") < 8)
        rows = ivf_topk(corpus, queries, centroids, k=3, nprobe=1).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["rank"] >= 1 and r["cos"] <= 1.0

    def test_near_dup_pairs_subset_of_brute_force(self, spark, emb):
        from tafra_spark.functions.similarity import (
            cosine, lsh_near_dup_pairs,
        )

        pairs = lsh_near_dup_pairs(emb, dim=64, threshold=0.4, n_planes=8)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        # brute-force verification of every emitted pair
        e = emb.select(
            F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
        )
        f = emb.select(
            F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
        )
        brute = (
            e.crossJoin(f)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("c", cosine(F.col("va"), F.col("vb")))
            .filter(F.col("c") >= 0.4)
        )
        all_pairs = {(r["id_a"], r["id_b"]) for r in brute.collect()}
        assert got <= all_pairs


class TestLshRecallKnobs:
    def _result_map(self, rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(r["cos"])
        return {k: sorted(v, reverse=True) for k, v in out.items()}

    def test_multi_table_never_worse(self, spark):
        from tafra_spark.functions.similarity import lsh_ann_topk

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5)
        single = self._result_map(
            lsh_ann_topk(emb, q, dim=64, k=5, n_planes=8).collect()
        )
        multi = self._result_map(
            lsh_ann_topk(emb, q, dim=64, k=5, n_planes=8, n_tables=3).collect()
        )
        # more tables → candidate superset → per-rank cos never decreases
        for qid, cos_single in single.items():
            cos_multi = multi.get(qid, [])
            assert len(cos_multi) >= len(cos_single)
            for cs, cm in zip(cos_single, cos_multi):
                assert cm >= cs

    def test_multi_probe_never_worse(self, spark):
        from tafra_spark.functions.similarity import lsh_ann_topk

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5)
        single = self._result_map(
            lsh_ann_topk(emb, q, dim=64, k=5, n_planes=8).collect()
        )
        probed = self._result_map(
            lsh_ann_topk(
                emb, q, dim=64, k=5, n_planes=8, multi_probe=True
            ).collect()
        )
        for qid, cos_single in single.items():
            cos_probe = probed.get(qid, [])
            assert len(cos_probe) >= len(cos_single)
            for cs, cp in zip(cos_single, cos_probe):
                assert cp >= cs


class TestSimhashEdge:
    def test_max_hamming_zero(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = D.simhash_pairs(docs, max_hamming=0, bits=60, portable=True)
        rows = out.collect()
        # exact-signature duplicates only; must not crash
        assert all(r["hamming"] == 0 for r in rows)


class TestDeterministicSampling:
    def test_hash_sample_reproducible_and_stable(self, spark):
        from tafra_spark.functions.sampling import hash_sample

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = {r[0] for r in hash_sample(docs, "doc_id", 50).select("doc_id").collect()}
        b = {r[0] for r in hash_sample(docs, "doc_id", 50).select("doc_id").collect()}
        assert a == b  # reproducible
        n = docs.count()
        assert 0.3 * n < len(a) < 0.7 * n  # ~50%
        # growth stability: sampling a subset yields the subset's members
        half = docs.filter(F.col("doc_id") < 250)
        c = {r[0] for r in hash_sample(half, "doc_id", 50).select("doc_id").collect()}
        assert c == {x for x in a if x < 250}

    def test_stratified_rates(self, spark):
        from tafra_spark.functions.sampling import stratified_hash_sample
        from tafra_spark.functions.text import with_language

        docs = with_language(spark.read.parquet(f"{SF}/documents.parquet"))
        out = stratified_hash_sample(
            docs, "doc_id", "lang_pred", {"en": 0.0}, 100.0
        )
        langs = {r[0] for r in out.select("lang_pred").distinct().collect()}
        assert "en" not in langs  # rate 0 removes the stratum entirely
        total_non_en = docs.filter(F.col("lang_pred") != "en").count()
        assert out.count() == total_non_en  # default 100% keeps the rest


class TestPipelineOps:
    """Training-pipeline operators: decontamination, repetition stats,
    sequence packing, domain terms, deterministic shard shuffle."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (0, "alpha beta gamma delta epsilon zeta", "s0"),
            (1, "alpha beta gamma delta epsilon eta", "s0"),  # shares 4-grams w/ 0
            (2, "one two three four five six seven", "s0"),
            (3, "totally unrelated words here now", "s1"),
            (4, "alpha beta gamma delta epsilon zeta", "s1"),  # dup of 0
            (5, "mono", "s1"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text", "source"])

    def test_decontaminate_removes_overlap(self, spark, corpus):
        from tafra_spark.functions.pipeline import decontaminate

        bench = corpus.filter(F.col("doc_id") == 0)
        rest = corpus.filter(F.col("doc_id") != 0)
        kept = {
            r[0]
            for r in decontaminate(rest, bench, ngram=4)
            .select("doc_id")
            .collect()
        }
        # 1 shares "alpha beta gamma delta" etc., 4 is an exact dup; 2/3/5
        # share nothing
        assert kept == {2, 3, 5}

    def test_decontaminate_broadcasts_benchmark(self, spark, corpus):
        from tafra_spark.functions.pipeline import decontaminate
        from tafra_spark.plans.inspect import explain_str

        bench = corpus.filter(F.col("doc_id") == 0)
        rest = corpus.filter(F.col("doc_id") != 0)
        plan = explain_str(decontaminate(rest, bench), mode="simple")
        assert "BroadcastHashJoin" in plan

    def test_repetition_stats_values(self, spark):
        from tafra_spark.functions.pipeline import repetition_stats

        df = spark.createDataFrame(
            [(1, "a a a b"), (2, "x y z w"), (3, "")],
            ["doc_id", "text"],
        )
        rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
        assert set(rows) == {1, 2}  # empty doc dropped
        r1 = rows[1]
        assert r1["n_tokens"] == 4
        assert r1["dup_q4"] == 5000  # 2 of 4 tokens are repeats
        assert r1["top_q4"] == 7500  # 'a' is 3/4
        r2 = rows[2]
        assert r2["dup_q4"] == 0 and r2["top_q4"] == 2500

    def test_repetition_stats_zero_shuffle(self, spark, corpus):
        from tafra_spark.functions.pipeline import repetition_stats
        from tafra_spark.plans.inspect import count_exchanges

        # per-row fold: at most the _spread repartition, no agg shuffle
        assert count_exchanges(repetition_stats(corpus)) <= 1

    def test_pack_sequences_bins(self, spark, corpus):
        from tafra_spark.functions.pipeline import pack_sequences

        out = {
            (r["source"], r["seq_id"]): (r["n_docs"], r["seq_tokens"])
            for r in pack_sequences(corpus, budget=10).collect()
        }
        # s0 docs 0,1,2 have 6,6,7 tokens: cumsum 6,12,19 -> bins 0,0,1
        assert out[("s0", 0)] == (2, 12)
        assert out[("s0", 1)] == (1, 7)
        # s1 docs 3,4,5: 5,6,1 tokens -> excl-cumsum 0,5,11 -> bins 0,0,1
        assert out[("s1", 0)] == (2, 11)
        assert out[("s1", 1)] == (1, 1)

    def test_pack_sequences_keeps_null_partition_rows(self, spark):
        # r11 review finding: the bucketed decomposition's carry join
        # must be NULL-SAFE — a NULL source is its own partition (the
        # window semantics it replaced), not a silently dropped row
        from tafra_spark.functions.pipeline import pack_sequences

        df = spark.createDataFrame(
            [
                (0, "s0", "a b c"),
                (1, None, "d e f g"),
                (2, None, "h i"),
            ],
            "doc_id long, source string, text string",
        )
        rows = pack_sequences(df, budget=5).collect()
        assert sum(r["n_docs"] for r in rows) == 3
        null_rows = [r for r in rows if r["source"] is None]
        # NULL partition packs by itself: 4 + 2 tokens -> bins 0, 0
        assert sum(r["n_docs"] for r in null_rows) == 2
        assert sum(r["seq_tokens"] for r in null_rows) == 6

    def test_source_top_terms_ranked(self, spark, corpus):
        from tafra_spark.functions.pipeline import source_top_terms

        rows = source_top_terms(corpus, k=2).collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r)
        for src, lst in by_src.items():
            assert len(lst) == 2
            assert [r["rank"] for r in sorted(lst, key=lambda x: x["rank"])] == [1, 2]
        # s0: alpha/beta/gamma/delta/epsilon all appear twice; ties break
        # alphabetically -> alpha then beta
        s0 = sorted(by_src["s0"], key=lambda r: r["rank"])
        assert (s0[0]["term"], s0[1]["term"]) == ("alpha", "beta")

    def test_train_shuffle_deterministic(self, spark, corpus):
        from tafra_spark.functions.pipeline import train_shuffle

        a = sorted(map(tuple, train_shuffle(corpus, n_shards=4).collect()))
        b = sorted(map(tuple, train_shuffle(corpus, n_shards=4).collect()))
        assert a == b
        shards = {r[1] for r in a}
        assert shards <= set(range(4))
        # every doc present exactly once
        assert sorted(r[0] for r in a) == [0, 1, 2, 3, 4, 5]
        # positions within a shard are 1..m contiguous
        from collections import Counter

        per = Counter(r[1] for r in a)
        pos = {}
        for r in a:
            pos.setdefault(r[1], []).append(r[2])
        for s, plist in pos.items():
            assert sorted(plist) == list(range(1, per[s] + 1))


class TestLshBucketCap:
    def test_max_bucket_drops_hot_bucket_only(self, spark):
        from tafra_spark.functions.dedup import minhash_lsh_pairs

        hot = [(i, "spam spam spam spam identical boilerplate page") for i in range(5)]
        pair = [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "the quick brown fox jumps over the lazy cat"),
        ]
        df = spark.createDataFrame(hot + pair, ["doc_id", "text"])
        uncapped = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(df, num_hashes=8, band_size=2).collect()
        }
        assert (0, 1) in uncapped and (10, 11) in uncapped
        capped = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                df, num_hashes=8, band_size=2, max_bucket=4
            ).collect()
        }
        # the 5-doc boilerplate bucket exceeds the cap in every band and
        # is dropped; the small near-dup bucket is untouched
        assert (10, 11) in capped
        assert all(a >= 10 for a, _ in capped)


class TestPiiAndQualityGate:
    def test_pii_scrub_redacts_all_categories(self, spark):
        from tafra_spark.functions.pipeline import pii_scrub

        df = spark.createDataFrame(
            [
                (1, "mail me at jo.doe+x@corp.io or jo@b.co thanks"),
                (2, "host 10.0.0.1 and 255.255.255.0 up"),
                (3, "call 555-123-4567 now"),
                (4, "nothing sensitive here"),
            ],
            ["doc_id", "text"],
        )
        rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        assert rows[1]["n_email"] == 2
        assert rows[1]["scrubbed"] == "mail me at <EMAIL> or <EMAIL> thanks"
        assert rows[2]["n_ipv4"] == 2
        assert rows[2]["scrubbed"] == "host <IP> and <IP> up"
        assert rows[3]["n_phone"] == 1
        assert rows[3]["scrubbed"] == "call <PHONE> now"
        assert rows[4]["scrubbed"] == "nothing sensitive here"
        assert rows[4]["n_email"] == rows[4]["n_ipv4"] == rows[4]["n_phone"] == 0

    def test_pii_scrub_zero_shuffle(self, spark):
        from tafra_spark.functions.pipeline import pii_scrub
        from tafra_spark.plans.inspect import count_exchanges

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        assert count_exchanges(pii_scrub(docs)) == 0

    def test_quality_gate_masks(self, spark):
        from tafra_spark.functions.pipeline import quality_gate

        df = spark.createDataFrame(
            [
                (1, "short text"),                          # too short
                (2, " ".join(f"w{i}" for i in range(50))),  # clean
                (3, " ".join(["dup"] * 40)),                # repeats dominate
            ],
            ["doc_id", "text"],
        )
        rows = {
            r["doc_id"]: r
            for r in quality_gate(df, min_tokens=10, max_tokens=60).collect()
        }
        # bit 1 (too short) plus bit 8: with 2 tokens the top token is
        # necessarily 50% > the 25% ceiling
        assert rows[1]["reject_mask"] == 1 + 8 and not rows[1]["keep"]
        assert rows[2]["reject_mask"] == 0 and rows[2]["keep"]
        # 40 dups: dup_q4 = 9750 > 5000 (bit 4), top_q4 = 10000 > 2500
        # (bit 8)
        assert rows[3]["reject_mask"] == 4 + 8 and not rows[3]["keep"]


class TestEmptyDocPipelines:
    def test_fuzzy_dedup_survives_empty_docs(self, spark):
        # regression: empty docs used to reach banding with NULL
        # signatures, collapse into one '' bucket, and abort the exact
        # Jaccard verify with a 0/0 ANSI divide error
        from tafra_spark.functions.dedup import fuzzy_dedup_pairs

        df = spark.createDataFrame(
            [
                (1, ""),
                (2, "   "),
                (3, "the quick brown fox jumps over the lazy dog"),
                (4, ""),
                (5, "the quick brown fox jumps over the lazy cat"),
            ],
            ["doc_id", "text"],
        )
        pairs = {
            (r["id_a"], r["id_b"])
            for r in fuzzy_dedup_pairs(
                df, num_hashes=4, band_size=2, threshold=0.5
            ).collect()
        }
        assert (3, 5) in pairs
        assert all(a not in (1, 2, 4) and b not in (1, 2, 4) for a, b in pairs)

    def test_minhash_signatures_drop_empty(self, spark):
        from tafra_spark.functions.dedup import minhash_signatures

        df = spark.createDataFrame(
            [(1, ""), (2, "real text here")], ["doc_id", "text"]
        )
        rows = minhash_signatures(df, num_hashes=4).collect()
        assert [r["doc_id"] for r in rows] == [2]
        assert all(r[f"h{i}"] is not None for r in rows for i in range(4))


class TestDupClusters:
    def test_chain_and_singleton_clusters(self, spark):
        from tafra_spark.functions.dedup import dup_clusters

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"]
        )
        ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 7, 8, 9]], ["doc_id"])
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dup_clusters(pairs, ids).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 9}

    def test_long_chain_converges(self, spark):
        from tafra_spark.functions.dedup import dup_clusters

        n = 12
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], ["id_a", "id_b"]
        )
        ids = spark.createDataFrame([(i,) for i in range(n + 1)], ["doc_id"])
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dup_clusters(pairs, ids, max_iterations=15).collect()
        }
        assert set(got.values()) == {0}

    def test_nonconvergence_raises(self, spark):
        from tafra_spark.functions.dedup import dup_clusters

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], ["id_a", "id_b"]
        )
        ids = spark.createDataFrame([(i,) for i in range(11)], ["doc_id"])
        with pytest.raises(RuntimeError, match="did not converge"):
            dup_clusters(pairs, ids, max_iterations=2)


class TestReviewRegressions2:
    def test_dup_clusters_relay_through_missing_id(self, spark):
        # node 1 is absent from ids but connects 10 and 11; convergence
        # must not be declared while labels still relay through it
        from tafra_spark.functions.dedup import dup_clusters

        pairs = spark.createDataFrame([(10, 1), (1, 11)], ["id_a", "id_b"])
        ids = spark.createDataFrame([(10,), (11,)], ["doc_id"])
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dup_clusters(pairs, ids).collect()
        }
        assert got == {1: 1, 10: 1, 11: 1}

    def test_null_embedding_gets_null_signature(self, spark):
        from pyspark.sql import types as T

        from tafra_spark.functions.similarity import (
            random_hyperplane_signature,
        )

        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )
        df = spark.createDataFrame(
            [(1, None), (2, [1.0] * 4)], schema=schema
        )
        rows = {
            r["vec_id"]: r["sig"]
            for r in df.select(
                "vec_id",
                random_hyperplane_signature(
                    F.col("embedding"), 4, 4
                ).alias("sig"),
            ).collect()
        }
        assert rows[1] is None  # NULL vector never lands in a real bucket
        assert rows[2] is not None

    def test_pii_counts_match_emitted_tokens(self, spark):
        # a phone-shaped email local part must count as email ONLY
        from tafra_spark.functions.pipeline import pii_scrub

        df = spark.createDataFrame(
            [(1, "reach 555-123-4567@relay.example.com now")],
            ["doc_id", "text"],
        )
        r = pii_scrub(df).collect()[0]
        assert r["n_email"] == 1 and r["n_phone"] == 0 and r["n_ipv4"] == 0
        assert r["scrubbed"] == "reach <EMAIL> now"

    def test_quality_gate_rejects_empty_doc(self, spark):
        from tafra_spark.functions.pipeline import quality_gate

        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, " ".join(f"w{i}" for i in range(30)))],
            ["doc_id", "text"],
        )
        rows = {r["doc_id"]: r for r in quality_gate(df, min_tokens=5).collect()}
        assert set(rows) == {1, 2, 3}  # every doc gets a row
        assert rows[1]["n_tokens"] == 0 and rows[1]["reject_mask"] == 1
        assert rows[2]["reject_mask"] == 1
        assert rows[3]["keep"]


class TestSemanticDedupAndKmeans:
    @pytest.fixture()
    def emb(self, spark):
        return spark.read.parquet(f"{SF}/embeddings.parquet")

    def test_pairs_are_within_cluster_and_above_threshold(self, spark, emb):
        from tafra_spark.functions.similarity import (
            assign_centroids, cosine, semantic_dedup_pairs,
        )

        cent = emb.filter(F.col("vec_id") < 8)
        corpus = emb.filter(F.col("vec_id") >= 8)
        pairs = semantic_dedup_pairs(corpus, cent, threshold=0.3).collect()
        assert len(pairs) > 0
        assigned = {
            r["vec_id"]: r["centroid_id"]
            for r in assign_centroids(corpus, cent).collect()
        }
        for r in pairs:
            assert r["id_a"] < r["id_b"]
            assert r["cos"] >= 0.3 - 1e-9
            # pair members share the emitted cluster
            assert assigned[r["id_a"]] == r["centroid_id"]
            assert assigned[r["id_b"]] == r["centroid_id"]

    def test_pairs_subset_of_brute_force(self, spark, emb):
        from tafra_spark.functions.similarity import (
            cosine, semantic_dedup_pairs,
        )

        cent = emb.filter(F.col("vec_id") < 8)
        corpus = emb.filter(F.col("vec_id") >= 8)
        got = {
            (r["id_a"], r["id_b"])
            for r in semantic_dedup_pairs(corpus, cent, threshold=0.3).collect()
        }
        e = corpus.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        f = corpus.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        brute = (
            e.crossJoin(f)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("c", cosine(F.col("va"), F.col("vb")))
            .filter(F.col("c") >= 0.3)
        )
        all_pairs = {(r["id_a"], r["id_b"]) for r in brute.collect()}
        assert got <= all_pairs

    def test_survivors_partition_corpus(self, spark, emb):
        from tafra_spark.functions.similarity import (
            semantic_dedup_pairs, semantic_dedup_survivors,
        )

        cent = emb.filter(F.col("vec_id") < 8)
        corpus = emb.filter(F.col("vec_id") >= 8)
        surv = {
            r["vec_id"]
            for r in semantic_dedup_survivors(corpus, cent, threshold=0.3).collect()
        }
        dropped = {
            r["id_b"]
            for r in semantic_dedup_pairs(corpus, cent, threshold=0.3).collect()
        }
        all_ids = {r["vec_id"] for r in corpus.select("vec_id").collect()}
        assert surv == all_ids - dropped
        # the global minimum id can never be an id_b, so it always survives
        assert min(all_ids) in surv

    def test_kmeans_shape_and_determinism(self, spark, emb):
        from tafra_spark.functions.similarity import kmeans_fit

        a = kmeans_fit(emb, k=4, iters=2, portable_round=9).collect()
        b = kmeans_fit(emb, k=4, iters=2, portable_round=9).collect()
        assert len(a) == 4
        assert all(len(r["embedding"]) == 64 for r in a)
        assert sorted(map(tuple, ((r["centroid_id"], tuple(r["embedding"])) for r in a))) == \
               sorted(map(tuple, ((r["centroid_id"], tuple(r["embedding"])) for r in b)))

    def test_kmeans_separates_obvious_clusters(self, spark):
        from tafra_spark.functions.similarity import assign_centroids, kmeans_fit

        # two tight clusters around orthogonal directions
        rows = []
        for i in range(10):
            rows.append((i, [10.0 + (i % 3) * 0.1, 0.1 * (i % 2), 0.0, 0.0]))
        for i in range(10, 20):
            rows.append((i, [0.1 * (i % 2), 10.0 + (i % 3) * 0.1, 0.0, 0.0]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cent = kmeans_fit(df, k=2, iters=4)
        got = assign_centroids(
            df, cent.withColumnRenamed("centroid_id", "vec_id")
        )
        lab = {r["vec_id"]: r["centroid_id"] for r in got.collect()}
        first = {lab[i] for i in range(10)}
        second = {lab[i] for i in range(10, 20)}
        assert len(first) == 1 and len(second) == 1 and first != second


class TestTfidf:
    def test_doc_freq_counts_docs_not_occurrences(self, spark):
        from tafra_spark.functions.text import doc_freq

        df = spark.createDataFrame(
            [(1, "apple apple banana"), (2, "apple cherry"), (3, "  ")],
            "doc_id long, text string",
        )
        got = {r["term"]: r["df"] for r in doc_freq(df).collect()}
        # apple appears twice in doc 1 but df counts documents
        assert got == {"apple": 2, "banana": 1, "cherry": 1}

    def test_tfidf_ranks_distinctive_terms_first(self, spark):
        from tafra_spark.functions.text import tfidf_top_terms

        df = spark.createDataFrame(
            [
                (1, "shared shared unique1"),
                (2, "shared unique2 unique2"),
                (3, "shared other"),
            ],
            "doc_id long, text string",
        )
        rows = tfidf_top_terms(df, k=1).collect()
        top = {r["doc_id"]: r["term"] for r in rows}
        # 'shared' has df=3 -> idf=0; the distinctive terms must win
        assert top == {1: "unique1", 2: "unique2", 3: "other"}
        for r in rows:
            assert r["rank"] == 1 and r["tfidf"] > 0


class TestSegmentDedup:
    def test_duplicated_segments_detected(self, spark):
        from tafra_spark.functions.pipeline import segment_dedup_stats

        seg = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            (1, seg + " " + "one two three four five six seven eight nine ten"),
            (2, seg + " " + "uno dos tres cuatro cinco seis siete ocho nueve diez"),
            (3, "completely fresh words that appear nowhere else in corpus x"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_segments"], r["n_dup_segments"], r["dup_frac"])
            for r in segment_dedup_stats(df, seg_tokens=10).collect()
        }
        assert got[1] == (2, 1, 0.5)   # shared first window
        assert got[2] == (2, 1, 0.5)
        assert got[3] == (1, 0, 0.0)

    def test_short_docs_excluded(self, spark):
        from tafra_spark.functions.pipeline import segment_dedup_stats

        df = spark.createDataFrame(
            [(1, "only four words here"), (2, " ")],
            "doc_id long, text string",
        )
        assert segment_dedup_stats(df, seg_tokens=10).count() == 0


class TestExactKSampling:
    def test_caps_each_stratum(self, spark):
        from tafra_spark.functions.sampling import exact_k_per_stratum

        rows = [(i, f"s{i % 3}") for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = exact_k_per_stratum(df, "doc_id", "source", k=4)
        counts = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"s0": 4, "s1": 4, "s2": 4}

    def test_small_stratum_kept_whole_and_deterministic(self, spark):
        from tafra_spark.functions.sampling import exact_k_per_stratum

        rows = [(1, "rare"), (2, "rare"), *[(i, "big") for i in range(10, 40)]]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        a = sorted(r["doc_id"] for r in exact_k_per_stratum(df, "doc_id", "source", 5).collect())
        b = sorted(r["doc_id"] for r in exact_k_per_stratum(df, "doc_id", "source", 5).collect())
        assert a == b
        assert {1, 2} <= set(a)
        assert len(a) == 7


class TestCorpusPrep:
    """End-to-end funnel: quality gate → exact dedup → fuzzy dedup."""

    @pytest.fixture(scope="class")
    def funnel_corpus(self, spark):
        rows = [
            (0, "the quick brown fox jumps over the lazy dog today", "s0"),
            # exact dup of 0 — loses the min-id race
            (1, "the quick brown fox jumps over the lazy dog today", "s0"),
            # near-dup of 0 (differs in the final word only)
            (2, "the quick brown fox jumps over the lazy dog tonight", "s0"),
            (3, "completely different content about spark engines and "
                "large scale data", "s1"),
            (4, "tiny", "s1"),  # fails the min-token gate
        ]
        return spark.createDataFrame(rows, ["doc_id", "text", "source"])

    def test_stage_flags(self, spark, funnel_corpus):
        from tafra_spark.functions.pipeline import corpus_prep

        rows = {
            r["doc_id"]: r
            for r in corpus_prep(funnel_corpus, min_tokens=3).collect()
        }
        assert len(rows) == 5  # every input doc gets a row
        assert [rows[i]["q_keep"] for i in range(5)] == [
            True, True, True, True, False,
        ]
        # exact: 1 is a byte-dup of 0 and loses; 2 differs so it survives
        assert [rows[i]["exact_keep"] for i in range(5)] == [
            True, False, True, True, False,
        ]
        # fuzzy: (0, 2) share 7 of 8 trigram shingles (jaccard 7/9) — 2
        # is dropped as the larger id of a verified pair
        assert [rows[i]["final_keep"] for i in range(5)] == [
            True, False, False, True, False,
        ]
        # funnel monotonicity: final ⊆ exact ⊆ quality
        for r in rows.values():
            assert not r["final_keep"] or r["exact_keep"]
            assert not r["exact_keep"] or r["q_keep"]

    def test_summary(self, spark, funnel_corpus):
        from tafra_spark.functions.pipeline import corpus_prep_summary

        out = {
            r["source"]: r
            for r in corpus_prep_summary(funnel_corpus, min_tokens=3).collect()
        }
        s0, s1 = out["s0"], out["s1"]
        assert (s0["n_docs"], s0["n_quality"], s0["n_exact"], s0["n_final"]) \
            == (3, 3, 2, 1)
        assert s0["tokens_final"] == 10
        assert (s1["n_docs"], s1["n_quality"], s1["n_exact"], s1["n_final"]) \
            == (2, 1, 1, 1)
        assert s1["tokens_final"] == 10


class TestTokenBudgetAndRecall:
    def test_token_budget_select(self, spark):
        from tafra_spark.functions.pipeline import token_budget_select

        rows = [
            (0, "a b c d", "s0"),   # 4 tokens, excl-cum 0  -> in
            (1, "e f g", "s0"),     # 3 tokens, excl-cum 4  -> in (< 6)
            (2, "h i", "s0"),       # excl-cum 7 -> out
            (3, "one two three four five six seven", "s1"),  # 7, in
            (4, "eight", "s1"),     # excl-cum 7 -> out
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = {
            r["doc_id"]: r
            for r in token_budget_select(df, budget=6).collect()
        }
        assert set(out) == {0, 1, 3}
        assert out[1]["cum_tokens"] == 7  # last doc may overshoot
        assert out[3]["n_tokens"] == 7

    def test_ann_recall_bounds_and_exact_match(self, spark):
        from tafra_spark.functions.similarity import ann_recall

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 3)
        rows = ann_recall(emb, queries, dim=64, k=5, n_planes=4).collect()
        assert len(rows) == 3
        for r in rows:
            assert 0 <= r["n_hit"] <= r["n_true"] <= 5
            assert abs(r["recall"] - round(r["n_hit"] / r["n_true"], 6)) < 1e-9
        # 0 planes → one bucket → ANN degenerates to exact → recall 1.0
        rows0 = ann_recall(emb, queries, dim=64, k=5, n_planes=0).collect()
        assert all(r["recall"] == 1.0 for r in rows0)


class TestChunkingAndIncrementalDedup:
    def test_chunk_documents_windows(self, spark):
        from tafra_spark.functions.pipeline import chunk_documents

        df = spark.createDataFrame(
            [(1, "a b c d e f g"), (2, "x y"), (3, "")],
            ["doc_id", "text"],
        )
        rows = {
            (r["doc_id"], r["chunk_id"]): r
            for r in chunk_documents(df, chunk_tokens=4, stride=2).collect()
        }
        # doc 1: 7 tokens -> starts 0,2,4,6
        assert {(1, i) for i in range(4)} <= set(rows)
        assert rows[(1, 0)]["chunk_text"] == "a b c d"
        assert rows[(1, 2)]["chunk_text"] == "e f g"
        assert rows[(1, 2)]["n_chunk_tokens"] == 3
        assert rows[(1, 3)]["chunk_text"] == "g"
        # doc 2: 2 tokens -> one window; doc 3: empty -> no rows
        assert rows[(2, 0)]["chunk_text"] == "x y"
        assert not any(d == 3 for d, _ in rows)

    def test_dedup_incremental_flags(self, spark):
        from tafra_spark.functions.dedup import dedup_incremental

        seen = spark.createDataFrame(
            [(100, "known document text")], ["doc_id", "text"]
        )
        batch = spark.createDataFrame(
            [
                (1, "known  DOCUMENT text"),   # normalizes to a seen fp
                (2, "fresh content one"),
                (3, "fresh content one"),      # in-batch dup of 2
                (4, "fresh content two"),
            ],
            ["doc_id", "text"],
        )
        rows = {
            r["doc_id"]: r for r in dedup_incremental(batch, seen).collect()
        }
        assert rows[1]["in_seen"] and not rows[1]["keep"]
        assert rows[2]["keep"] and not rows[2]["batch_dup"]
        assert rows[3]["batch_dup"] and not rows[3]["keep"]
        assert rows[4]["keep"]


class TestEventAnalytics:
    def test_funnel_ordered_steps(self, spark):
        from tafra_spark.functions.analytics import funnel_conversion
        import datetime as dt

        b = dt.datetime(2024, 1, 1)
        m = lambda mins: b + dt.timedelta(minutes=mins)
        rows = [
            # user 1 completes the full ordered funnel
            (1, "click", m(0)), (1, "view", m(5)), (1, "purchase", m(9)),
            # user 2: purchase BEFORE view — purchase must not count
            (2, "click", m(0)), (2, "purchase", m(1)), (2, "view", m(2)),
            # user 3: view only, no click — counts for nothing
            (3, "view", m(0)),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        out = {r["step_name"]: r for r in funnel_conversion(df).collect()}
        assert out["click"]["n_users"] == 2
        assert out["view"]["n_users"] == 2
        assert out["purchase"]["n_users"] == 1
        assert out["purchase"]["conversion"] == 0.5

    def test_retention_cohorts_triangle(self, spark):
        from tafra_spark.functions.analytics import retention_cohorts
        import datetime as dt

        # Mondays: 2024-01-01 and 2024-01-08
        rows = [
            (1, dt.datetime(2024, 1, 2)),   # cohort wk0
            (1, dt.datetime(2024, 1, 10)),  # active wk1
            (2, dt.datetime(2024, 1, 3)),   # cohort wk0, never returns
            (3, dt.datetime(2024, 1, 9)),   # cohort wk1
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (r["cohort_week"], r["week_no"]): r["n_users"]
            for r in retention_cohorts(df).collect()
        }
        assert got[("2024-01-01", 0)] == 2
        assert got[("2024-01-01", 1)] == 1
        assert got[("2024-01-08", 0)] == 1

    def test_funnel_single_shuffle(self, spark):
        from tafra_spark.functions.analytics import funnel_conversion
        from tafra_spark.plans.inspect import count_exchanges
        import datetime as dt

        df = spark.createDataFrame(
            [(1, "click", dt.datetime(2024, 1, 1))],
            "user_id long, event_type string, ts timestamp",
        )
        # user window + per-user agg + final singleton agg — the chained
        # step windows must all reuse ONE user-key exchange
        assert count_exchanges(funnel_conversion(df)) <= 3

    def test_event_transitions(self, spark):
        from tafra_spark.functions.analytics import event_transitions
        import datetime as dt

        b = dt.datetime(2024, 1, 1)
        rows = [
            (1, 1, "a", b), (2, 1, "b", b + dt.timedelta(minutes=1)),
            (3, 1, "a", b + dt.timedelta(minutes=2)),
            (4, 2, "a", b), (5, 2, "b", b + dt.timedelta(minutes=1)),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        got = {
            (r["from_type"], r["to_type"]): (r["n"], r["share"])
            for r in event_transitions(df).collect()
        }
        assert got[("a", "b")] == (2, 1.0)   # a always goes to b
        assert got[("b", "a")] == (1, 1.0)   # user 2's b has no successor

    def test_key_skew_stats(self, spark):
        from tafra_spark.functions.analytics import key_skew_stats

        df = spark.createDataFrame(
            [(x,) for x in ["hot"] * 8 + ["warm"] * 2 + [None]], "k string"
        )
        rows = key_skew_stats(df, "k", top_k=2).collect()
        assert [r["key"] for r in rows] == ["hot", "warm"]
        assert rows[0]["n_rows"] == 8
        assert abs(rows[0]["row_share"] - round(8 / 11, 6)) < 1e-9
        assert rows[0]["n_distinct_keys"] == 3  # hot, warm, <null>


class TestEmptyInputRobustness:
    """Every round-4 operator must be total on an empty frame — ANSI
    mode turns sloppy 0-row arithmetic (0/0, floor(NaN)) into job
    aborts, so emptiness is asserted, not assumed."""

    @pytest.fixture(scope="class")
    def empty_docs(self, spark):
        return spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )

    @pytest.fixture(scope="class")
    def empty_events(self, spark):
        return spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, event_type string"
        )

    def test_doc_operators_on_empty(self, spark, empty_docs):
        from tafra_spark.functions.dedup import dedup_incremental
        from tafra_spark.functions.pipeline import (
            chunk_documents,
            corpus_prep,
            corpus_prep_summary,
            token_budget_select,
        )

        assert corpus_prep(empty_docs).count() == 0
        assert corpus_prep_summary(empty_docs).count() == 0
        assert token_budget_select(empty_docs, budget=10).count() == 0
        assert chunk_documents(empty_docs).count() == 0
        assert dedup_incremental(empty_docs, empty_docs).count() == 0

    def test_event_operators_on_empty(self, spark, empty_events):
        from tafra_spark.functions.analytics import (
            event_transitions,
            funnel_conversion,
            key_skew_stats,
            retention_cohorts,
        )

        # funnel emits its per-step rows even over zero users
        rows = funnel_conversion(empty_events).collect()
        assert [r["n_users"] for r in rows] == [0, 0, 0]
        assert retention_cohorts(empty_events).count() == 0
        assert event_transitions(empty_events).count() == 0
        assert key_skew_stats(empty_events, "event_type").count() == 0

    def test_profile_and_recall_on_empty(self, spark, empty_docs):
        from tafra_spark.core import Tafra
        from tafra_spark.functions.similarity import ann_recall

        prof = {
            r["col_name"]: r
            for r in Tafra._wrap(empty_docs).profile().df.collect()
        }
        assert set(prof) == {"doc_id", "text", "source"}
        assert all(
            (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (0, 0, 0)
            for r in prof.values()
        )
        emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
        assert ann_recall(emb, emb, dim=4, k=3, n_planes=2).count() == 0


class TestNullTextSafety:
    def test_null_text_fails_quality_gate(self, spark):
        from tafra_spark.functions.pipeline import quality_gate

        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "five distinct ok tokens here")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in quality_gate(df, min_tokens=3).collect()}
        # NULL text must be rejected exactly like empty text (bit 1),
        # never silently kept via NULL-mask propagation
        assert rows[1]["n_tokens"] == 0 and rows[1]["reject_mask"] == 1
        assert not rows[1]["keep"]
        assert rows[2]["reject_mask"] == 1
        assert rows[3]["keep"]

    def test_null_text_through_chunking_and_dedup(self, spark):
        from tafra_spark.functions.dedup import dedup_incremental
        from tafra_spark.functions.pipeline import chunk_documents

        df = spark.createDataFrame(
            [(1, None), (2, "a b c")], "doc_id long, text string"
        )
        assert chunk_documents(df).filter("doc_id = 1").count() == 0
        rows = {r["doc_id"]: r for r in dedup_incremental(df, df).collect()}
        assert rows[1]["in_seen"]  # NULL fingerprints as the empty doc


class TestLengthOutliers:
    def test_median_mad_flags(self, spark):
        from tafra_spark.functions.pipeline import length_outliers

        texts = ["w " * n for n in (10, 10, 11, 12, 12, 100)]
        df = spark.createDataFrame(
            [(i, t.strip(), "s") for i, t in enumerate(texts)],
            "doc_id long, text string, source string",
        )
        rows = {r["doc_id"]: r for r in length_outliers(df, k=3.0).collect()}
        # median of (10,10,11,12,12,100) = 11.5; deviations
        # (1.5,1.5,.5,.5,.5,88.5) -> MAD 1.0; only the 100-token doc is
        # beyond 3 MADs
        assert rows[0]["med"] == 11.5 and rows[0]["mad"] == 1.0
        assert [rows[i]["is_outlier"] for i in range(6)] == [
            False, False, False, False, False, True,
        ]

    def test_single_exchange(self, spark):
        from tafra_spark.functions.pipeline import length_outliers
        from tafra_spark.plans.inspect import count_exchanges

        df = spark.createDataFrame(
            [(1, "a b", "s")], "doc_id long, text string, source string"
        )
        # both percentile windows share ONE source-key exchange
        assert count_exchanges(length_outliers(df)) == 1


class TestWeightedMix:
    def test_takes_match_weights(self, spark):
        from tafra_spark.functions.sampling import weighted_mix

        rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        # 25 docs per source; T = min(25/.5, 25/.3, 25/.2) = 50
        out = weighted_mix(df, {"a": 0.5, "b": 0.3, "c": 0.2})
        got = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert got == {"a": 25, "b": 15, "c": 10}  # d dropped (no weight)

    def test_deterministic_selection(self, spark):
        from tafra_spark.functions.sampling import weighted_mix

        rows = [(i, "s" if i % 2 else "t") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        a = sorted(r["doc_id"] for r in weighted_mix(df, {"s": 0.7, "t": 0.3}).collect())
        b = sorted(r["doc_id"] for r in weighted_mix(df, {"s": 0.7, "t": 0.3}).collect())
        assert a == b and len(a) > 0

    def test_listed_source_with_no_rows_empties_the_mix(self, spark):
        from tafra_spark.functions.sampling import weighted_mix

        df = spark.createDataFrame(
            [(i, "web") for i in range(10)], "doc_id long, source string"
        )
        # 'books' is requested but absent: no mix satisfies 50/50, so
        # the result is EMPTY rather than a silently 100%-web corpus
        assert weighted_mix(df, {"web": 0.5, "books": 0.5}).count() == 0

    def test_mad_zero_source_flags_nothing(self, spark):
        from tafra_spark.functions.pipeline import length_outliers

        texts = ["w " * n for n in (10, 10, 10, 10, 99)]
        df = spark.createDataFrame(
            [(i, t.strip(), "s") for i, t in enumerate(texts)],
            "doc_id long, text string, source string",
        )
        rows = length_outliers(df, k=3.0).collect()
        # MAD = 0 (4 of 5 docs share the median) -> no measurable
        # spread -> nothing flagged, even the 99-token doc
        assert all(not r["is_outlier"] for r in rows)

    def test_rate_spikes_integer_sigma(self, spark):
        from tafra_spark.functions.analytics import rate_spikes
        import datetime as dt

        b = dt.datetime(2024, 1, 1)
        rows, eid = [], 0
        # type 'a': 10 calm hours of 5 events + one 50-event burst hour
        for h in range(10):
            for j in range(5):
                rows.append((eid, b + dt.timedelta(hours=h, minutes=j), 1, "a")); eid += 1
        for j in range(50):
            rows.append((eid, b + dt.timedelta(hours=10, minutes=j), 1, "a")); eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        out = {r["window_start"]: r["is_spike"] for r in rate_spikes(df).collect()}
        assert out["2024-01-01 10:00:00"] is True
        assert sum(v for v in out.values()) == 1  # only the burst hour


class TestNgramNoveltyAndQualityPercentiles:
    def test_novelty_first_doc_wins(self, spark):
        from tafra_spark.functions.pipeline import ngram_novelty

        rows = [
            (1, "the quick brown fox jumps"),      # 3 shingles, all first
            (2, "the quick brown fox jumps"),      # exact copy → novelty 0
            (3, "a wholly different sentence here"),  # all novel
            (4, ""),                                # no tokens → excluded
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in ngram_novelty(df, shingle_k=3).collect()}
        assert set(got) == {1, 2, 3}
        assert got[1]["n_shingles"] == 3 and got[1]["n_novel"] == 3
        assert got[1]["novelty_q4"] == 10000
        assert got[2]["n_novel"] == 0 and got[2]["novelty_q4"] == 0
        assert got[3]["novelty_q4"] == 10000

    def test_novelty_partial_overlap(self, spark):
        from tafra_spark.functions.pipeline import ngram_novelty

        rows = [
            (1, "alpha beta gamma delta"),        # shingles: abg, bgd
            (2, "alpha beta gamma epsilon zeta"), # abg (seen), bge, gez
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in ngram_novelty(df, shingle_k=3).collect()}
        assert got[2]["n_shingles"] == 3
        assert got[2]["n_novel"] == 2
        assert got[2]["novelty_q4"] == 6667  # floor(2/3*1e4 + .5)

    def test_quality_percentiles_rank_and_bucket(self, spark):
        from tafra_spark.functions.pipeline import quality_percentiles

        # src a: three docs of clearly increasing quality-relevant length
        rows = [
            (1, "x", "a"),
            (2, "a decent length sentence with words", "a"),
            (3, "a much longer and more substantial sentence with many "
                "more reasonable words in it for scoring purposes", "a"),
            (4, "solo document in its own source", "b"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {
            r["doc_id"]: r
            for r in quality_percentiles(df, n_buckets=2).collect()
        }
        assert got[1]["pct_rank_q4"] == 0
        assert got[3]["pct_rank_q4"] == 10000
        assert got[2]["pct_rank_q4"] == 5000
        assert got[1]["bucket"] == 1 and got[3]["bucket"] == 2
        # single-doc source: percent_rank defined as 0
        assert got[4]["pct_rank_q4"] == 0


class TestDecayedActivityAndSlidingUsers:
    def test_decay_weights_recent_more(self, spark):
        import datetime as dt
        from tafra_spark.functions.analytics import decayed_activity

        b = dt.datetime(2024, 1, 1)
        rows = [
            # user 1: one event AT the reference time → weight 1.0
            (1, b + dt.timedelta(hours=24)),
            # user 2: one event 24h (=tau) old → weight 0.5
            (2, b),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {r["user_id"]: r for r in decayed_activity(df, tau_hours=24.0).collect()}
        assert got[1]["activity"] == 1.0
        assert got[2]["activity"] == 0.5
        assert got[1]["n_events"] == 1

    def test_exp_kernel_and_bad_kernel(self, spark):
        import datetime as dt
        import math
        import pytest
        from tafra_spark.functions.analytics import decayed_activity

        b = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, b), (1, b + dt.timedelta(hours=24))],
            "user_id long, ts timestamp",
        )
        out = decayed_activity(df, tau_hours=24.0, kernel="exp").collect()
        expected = (1_000_000 + math.floor(math.exp(-1.0) * 1e6 + 0.5)) / 1e6
        assert abs(out[0]["activity"] - expected) < 1e-9
        with pytest.raises(ValueError):
            decayed_activity(df, kernel="gaussian")

    def test_sliding_windows_count_trailing(self, spark):
        import datetime as dt
        from tafra_spark.functions.analytics import sliding_active_users

        h = lambda i: dt.datetime(2024, 1, 1, i)
        rows = [
            (1, h(0)), (2, h(0)),   # hour 0: users {1,2}
            (2, h(1)),              # hour 1: {2}
            (3, h(5)),              # hour 5: {3}
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            r["window_end_hour"]: r["n_active_users"]
            for r in sliding_active_users(df, window_hours=3).collect()
        }
        # window ending hour 0: activity from hour 0 only
        assert got[h(0)] == 2
        # hour 1: hours 0-1 → users {1,2}
        assert got[h(1)] == 2
        # hour 2: hours 0-2 → users {1,2}
        assert got[h(2)] == 2
        # hour 3: hours 1-3 → {2}
        assert got[h(3)] == 1
        # hour 4: nothing → absent
        assert h(4) not in got
        assert got[h(5)] == 1 and got[h(7)] == 1


class TestBoilerplateAndSourceOverlap:
    def test_boilerplate_flags_repeated_phrases(self, spark):
        from tafra_spark.functions.pipeline import boilerplate_stats

        # "cookie banner ok" appears in 3/4 of src_a docs (doc-frac 0.75
        # ≥ 0.5) → its two bigrams are boilerplate FOR src_a only; src_b
        # contains the same phrase once (1/1 = 1.0 ≥ 0.5) so it is
        # boilerplate there too, but with its own per-source threshold
        rows = [
            (1, "src_a", "cookie banner ok unique alpha text"),
            (2, "src_a", "cookie banner ok unique beta words"),
            (3, "src_a", "cookie banner ok gamma filler body"),
            (4, "src_a", "completely fresh delta content here"),
            (5, "src_b", "cookie banner ok single doc"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {
            r["doc_id"]: r
            for r in boilerplate_stats(df, ngram_k=2, min_doc_frac=0.5).collect()
        }
        # doc 1: 5 bigrams; boilerplate ones are those in ≥2 of 4 src_a
        # docs: "cookie banner", "banner ok", and "ok unique" (shared
        # with doc 2) → 3
        assert got[1]["n_phrases"] == 5 and got[1]["n_boiler"] == 3
        assert got[1]["boiler_frac_q4"] == 6000
        # doc 4 shares nothing → 0
        assert got[4]["n_boiler"] == 0 and got[4]["boiler_frac_q4"] == 0
        # doc 5 is its whole source → every bigram has doc-freq 1/1 = 1.0
        assert got[5]["n_boiler"] == got[5]["n_phrases"]

    def test_boilerplate_empty_text_excluded(self, spark):
        from tafra_spark.functions.pipeline import boilerplate_stats

        rows = [(1, "s", "a b c"), (2, "s", "   "), (3, "s", None)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = boilerplate_stats(df).collect()
        assert {r["doc_id"] for r in out} == {1}

    def test_source_overlap_jaccard(self, spark):
        from tafra_spark.functions.pipeline import source_overlap

        # src_a and src_b share exactly their one common doc's shingles;
        # src_c is disjoint → no row (inner join on common hashes)
        rows = [
            (1, "src_a", "one two three four"),   # shingles {one two three, two three four}
            (2, "src_b", "one two three four"),   # same 2
            (3, "src_b", "five six seven"),       # +1 → src_b has 3
            (4, "src_c", "eight nine ten"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {
            (r["source_a"], r["source_b"]): r
            for r in source_overlap(df, shingle_k=3).collect()
        }
        r = got[("src_a", "src_b")]
        assert r["n_a"] == 2 and r["n_b"] == 3 and r["n_common"] == 2
        # jaccard = 2 / (2 + 3 - 2) = 2/3 → 6667
        assert r["jaccard_q4"] == 6667
        assert not any("src_c" in k for k in got)

    def test_source_overlap_pair_orientation(self, spark):
        from tafra_spark.functions.pipeline import source_overlap

        rows = [(1, "zz", "a b c"), (2, "aa", "a b c")]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = source_overlap(df, shingle_k=3).collect()
        assert len(out) == 1
        assert out[0]["source_a"] == "aa" and out[0]["source_b"] == "zz"
        assert out[0]["jaccard_q4"] == 10000


class TestProductQuantization:
    @pytest.fixture()
    def corpus(self, spark):
        # 8 vectors in dim 4, m=2 subspaces of 2; the first 2 rows are
        # the codebook samples
        rows = [
            (0, [0.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 1.0, 1.0, 1.0]),
            (2, [0.1, 0.0, 0.9, 1.0]),   # sub0 → code 0, sub1 → code 1
            (3, [0.9, 1.0, 0.1, 0.0]),   # sub0 → code 1, sub1 → code 0
            (4, [0.5, 0.5, 0.5, 0.5]),   # equidistant → tie → code 0
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_codebook_shape(self, spark, corpus):
        from tafra_spark.functions.similarity import pq_codebooks

        cb = pq_codebooks(corpus, m=2, k=2).collect()
        assert len(cb) == 4
        assert all(len(r["centv"]) == 2 for r in cb)
        # subspace 0 code 1 = first half of vec_id 1
        by = {(r["subspace"], r["code_id"]): r["centv"] for r in cb}
        assert by[(0, 1)] == [1.0, 1.0] and by[(1, 0)] == [0.0, 0.0]

    def test_codebook_dim_mismatch_raises(self, spark, corpus):
        from tafra_spark.functions.similarity import pq_codebooks

        with pytest.raises(ValueError, match="not divisible"):
            pq_codebooks(corpus, m=3, k=2)

    def test_encode_assigns_nearest_and_breaks_ties_low(self, spark, corpus):
        from tafra_spark.functions.similarity import pq_codebooks, pq_encode

        cb = pq_codebooks(corpus, m=2, k=2)
        got = {r["vec_id"]: r["codes"] for r in pq_encode(corpus, cb).collect()}
        assert got[0] == [0, 0] and got[1] == [1, 1]
        assert got[2] == [0, 1] and got[3] == [1, 0]
        # exact equidistance ties break toward the smaller code id
        assert got[4] == [0, 0]

    def test_topk_ranks_by_quantized_distance(self, spark, corpus):
        from tafra_spark.functions.similarity import (
            pq_codebooks,
            pq_encode,
            pq_topk,
        )

        cb = pq_codebooks(corpus, m=2, k=2)
        codes = pq_encode(corpus, cb)
        out = pq_topk(codes, cb, corpus.filter(F.col("vec_id") == 0), k=4)
        rows = sorted(out.collect(), key=lambda r: r["rank"])
        assert [r["query_id"] for r in rows] == [0] * 4
        assert rows[0]["adist_q12"] == 0  # vec 4 encodes to (0,0) = query's codes
        # neighbors whose codes equal the query's sort first by id
        assert rows[0]["neighbor_id"] in (2, 3, 4)
        # the all-ones vector is the farthest in code space
        assert rows[-1]["neighbor_id"] == 1

    def test_pq_recall_counts(self, spark):
        from tafra_spark.functions.similarity import pq_recall

        SF = "/root/testdata/sf0.001"
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = {
            r["query_id"]: r
            for r in pq_recall(
                emb, emb.filter(F.col("vec_id") < 3), m=4, k_codes=16, k=5
            ).collect()
        }
        assert set(out) == {0, 1, 2}
        for r in out.values():
            assert r["n_true"] == 5 and 0 <= r["n_hit"] <= 5
            assert r["recall"] == round(r["n_hit"] / r["n_true"], 6)

    def test_pq_fit_reduces_quantization_error(self, spark):
        from tafra_spark.functions.similarity import (
            _sq_q12,
            pq_codebooks,
            pq_fit,
        )

        SF = "/root/testdata/sf0.001"
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")

        def qerr(cb):
            # total min fixed-point distance over (vector, subspace)
            sub = emb.select(
                "vec_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(3)),
                        lambda s: F.struct(
                            s.cast("long").alias("subspace"),
                            F.slice(
                                F.col("embedding"), s * 16 + 1, F.lit(16)
                            ).alias("subv"),
                        ),
                    )
                ).alias("e"),
            ).select("vec_id", "e.subspace", "e.subv")
            scored = sub.join(F.broadcast(cb), on="subspace").withColumn(
                "dq", _sq_q12(F.col("subv"), F.col("centv"))
            )
            return (
                scored.groupBy("vec_id", "subspace")
                .agg(F.min("dq").alias("d"))
                .agg(F.sum("d").alias("t"))
                .collect()[0]["t"]
            )

        sampled = pq_codebooks(emb, m=4, k=16)
        refined = pq_fit(emb, m=4, k=16, iters=2)
        e0, e1 = qerr(sampled), qerr(refined)
        # Lloyd: quantization error is non-increasing (strict decrease on
        # any non-degenerate corpus), and the codebooks genuinely moved
        assert e1 < e0
        rs = {(r["subspace"], r["code_id"]): r["centv"] for r in refined.collect()}
        ss = {(r["subspace"], r["code_id"]): r["centv"] for r in sampled.collect()}
        assert rs != ss and set(rs) == set(ss)


class TestLiteralRelation:
    def test_types_and_values(self, spark):
        from tafra_spark.functions._relation import literal_relation

        df = literal_relation(
            spark,
            [(0, 1.5, "a'b\\c", [1.0, 2.0], True, None)],
            ["i", "x", "s", "v", "b", "n"],
        )
        r = df.collect()[0]
        assert (r["i"], r["x"], r["s"], r["v"], r["b"], r["n"]) == (
            0, 1.5, "a'b\\c", [1.0, 2.0], True, None,
        )
        assert dict(df.dtypes)["i"] == "bigint"
        assert dict(df.dtypes)["x"] == "double"

    def test_exact_double_roundtrip(self, spark):
        from tafra_spark.functions._relation import literal_relation

        # repr round-trip must be bit-exact even for awkward doubles
        vals = [0.1, 1e-300, 2**-53, 123456789.123456789]
        df = literal_relation(spark, [(v,) for v in vals], ["x"])
        got = [r["x"] for r in df.collect()]
        assert got == vals  # == on floats: bit-identical here

    def test_arity_mismatch_raises(self, spark):
        from tafra_spark.functions._relation import literal_relation

        with pytest.raises(ValueError, match="row 1 has 3 values"):
            literal_relation(spark, [(1, 2), (1, 2, 3)], ["a", "b"])

    def test_empty_rows_raise(self, spark):
        from tafra_spark.functions._relation import literal_relation

        with pytest.raises(ValueError, match="non-empty"):
            literal_relation(spark, [], ["a"])


class TestDistributionDrift:
    def test_shift_detected(self, spark):
        import datetime as dt

        from tafra_spark.functions.analytics import distribution_drift

        b = dt.datetime(2024, 1, 1)
        rows = []
        # first half: values near 0; second half: values near 10
        for i in range(50):
            rows.append((i, b + dt.timedelta(minutes=i), 0.5))
        for i in range(50):
            rows.append((100 + i, b + dt.timedelta(minutes=1000 + i), 9.5))
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
        got = {r["bin"]: r for r in distribution_drift(df, n_bins=10).collect()}
        assert set(got) == {0, 9}
        assert got[0]["n_before"] == 50 and got[0]["n_after"] == 0
        assert got[9]["n_before"] == 0 and got[9]["n_after"] == 50
        # shares are exact millionths; full separation = max delta
        assert got[0]["share_before_q6"] == 1000000
        assert got[0]["delta_q6"] == 1000000 and got[9]["delta_q6"] == 1000000

    def test_constant_value_single_bin(self, spark):
        import datetime as dt

        from tafra_spark.functions.analytics import distribution_drift

        b = dt.datetime(2024, 1, 1)
        rows = [(i, b + dt.timedelta(hours=i), 7.0) for i in range(10)]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
        out = distribution_drift(df).collect()
        assert len(out) == 1 and out[0]["bin"] == 0
        assert out[0]["n_before"] + out[0]["n_after"] == 10

    def test_null_rows_excluded(self, spark):
        import datetime as dt

        from tafra_spark.functions.analytics import distribution_drift

        b = dt.datetime(2024, 1, 1)
        rows = [(1, b, 1.0), (2, None, 2.0), (3, b, None)]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
        out = distribution_drift(df).collect()
        assert sum(r["n_before"] + r["n_after"] for r in out) == 1


class TestCollocations:
    def test_lift_ranks_associated_pair_first(self, spark):
        from tafra_spark.functions.pipeline import collocations

        # "new york" always co-occurs; "the cat/dog/car" words mix freely
        docs = []
        for i in range(10):
            docs.append((i, "new york " + ("the cat " if i % 2 else "the dog ") * 3))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = collocations(df, min_count=5, k=10).collect()
        by_rank = sorted(out, key=lambda r: r["rank"])
        # 'new york' occurs 10x with n(new)=n(york)=10 — maximal lift
        assert (by_rank[0]["w1"], by_rank[0]["w2"]) == ("new", "york")
        assert by_rank[0]["n_ab"] == 10
        # every returned pair meets the count floor and ranks are 1..n
        assert all(r["n_ab"] >= 5 for r in out)
        assert sorted(r["rank"] for r in out) == list(range(1, len(out) + 1))

    def test_short_docs_contribute_no_bigrams(self, spark):
        from tafra_spark.functions.pipeline import collocations

        df = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, "a b a b a b a b a b")],
            "doc_id long, text string",
        )
        out = collocations(df, min_count=1, k=10).collect()
        pairs = {(r["w1"], r["w2"]) for r in out}
        assert pairs == {("a", "b"), ("b", "a")}


class TestPrefixDupAndEpochPlan:
    def test_prefix_groups(self, spark):
        from tafra_spark.functions.dedup import prefix_dup_groups

        rows = [
            (1, "the quick brown fox ends one way"),
            (2, "the quick brown fox ends another way entirely"),
            (3, "completely different text body"),
            (4, "the quick brown fox ends one way"),  # exact dup of 1
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = prefix_dup_groups(df, prefix_tokens=4).collect()
        assert len(out) == 1
        assert out[0]["n_dups"] == 3 and out[0]["keep_id"] == 1

    def test_prefix_short_docs_key_on_full_text(self, spark):
        from tafra_spark.functions.dedup import prefix_dup_groups

        rows = [(1, "tiny doc"), (2, "tiny doc"), (3, "tiny")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = prefix_dup_groups(df, prefix_tokens=32).collect()
        assert len(out) == 1 and out[0]["n_dups"] == 2

    def test_epoch_plan_caps_small_sources(self, spark):
        from tafra_spark.functions.sampling import epoch_plan

        rows = [(1, "big", "w " * 1000), (2, "small", "w " * 10)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {
            r["source"]: r
            for r in epoch_plan(
                df, {"big": 0.5, "small": 0.5},
                target_tokens=200, max_epochs=2.0,
            ).collect()
        }
        # big: wants 100 of 1000 → 0.1 epochs, uncapped
        assert got["big"]["implied_epochs_q4"] == 1000
        assert got["big"]["granted_epochs_q4"] == 1000
        assert got["big"]["granted_tokens"] == 100
        # small: wants 100 of 10 → 10 epochs, capped to 2.0 → 20 tokens
        assert got["small"]["implied_epochs_q4"] == 100000
        assert got["small"]["granted_epochs_q4"] == 20000
        assert got["small"]["granted_tokens"] == 20

    def test_epoch_plan_validates_keys(self, spark):
        from tafra_spark.functions.sampling import epoch_plan

        df = spark.createDataFrame([(1, "s", "x")], "doc_id long, source string, text string")
        with pytest.raises(TypeError):
            epoch_plan(df, {7: 1.0}, target_tokens=10)

    def test_epoch_plan_empty_source_grants_nothing(self, spark):
        from tafra_spark.functions.sampling import epoch_plan

        df = spark.createDataFrame(
            [(1, "big", "w " * 100)], "doc_id long, source string, text string"
        )
        got = {
            r["source"]: r
            for r in epoch_plan(
                df, {"big": 0.5, "missing": 0.5}, target_tokens=100
            ).collect()
        }
        # least() skips NULLs — an empty source must NOT report a
        # full-cap grant
        assert got["missing"]["avail_tokens"] == 0
        assert got["missing"]["implied_epochs_q4"] is None
        assert got["missing"]["granted_epochs_q4"] is None
        assert got["missing"]["granted_tokens"] == 0


class TestConcurrencyProfile:
    def test_peak_and_half_open(self, spark):
        import datetime as dt

        from tafra_spark.functions.analytics import concurrency_profile

        b = dt.datetime(2024, 1, 1)
        m = lambda mins: b + dt.timedelta(minutes=mins)  # noqa: E731
        rows = [
            (1, m(0), m(10)),
            (2, m(5), m(15)),    # overlaps session 1 → peak 2
            (3, m(10), m(20)),   # starts exactly at 1's end: half-open, no overlap with 1
            (4, m(70), m(75)),   # alone in hour 1
        ]
        df = spark.createDataFrame(
            rows, "user_id long, session_start timestamp, session_end timestamp"
        )
        got = {
            r["bucket_start"]: r["max_concurrency"]
            for r in concurrency_profile(df).collect()
        }
        assert got["2024-01-01 00:00:00"] == 2
        assert got["2024-01-01 01:00:00"] == 1

    def test_cross_bucket_carry(self, spark):
        import datetime as dt

        from tafra_spark.functions.analytics import concurrency_profile

        b = dt.datetime(2024, 1, 1)
        rows = [
            # spans hours 0→2: open throughout hour 1 (no boundary there)
            (1, b + dt.timedelta(minutes=30), b + dt.timedelta(minutes=150)),
            # hour 2: second session while 1 is still open → peak 2
            (2, b + dt.timedelta(minutes=125), b + dt.timedelta(minutes=140)),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, session_start timestamp, session_end timestamp"
        )
        got = {
            r["bucket_start"]: r["max_concurrency"]
            for r in concurrency_profile(df).collect()
        }
        # the carry-in makes hour 2's peak see the hour-0 session
        assert got["2024-01-01 02:00:00"] == 2
        assert got["2024-01-01 00:00:00"] == 1
        # hour 1 has no boundary events → no row (documented)
        assert "2024-01-01 01:00:00" not in got

    def test_all_ends_bucket_sees_carry(self, spark):
        import datetime as dt

        from tafra_spark.functions.analytics import concurrency_profile

        b = dt.datetime(2024, 1, 1)
        m = lambda mins: b + dt.timedelta(minutes=mins)  # noqa: E731
        # both sessions END in hour 1 (only -1 events there); 2 were
        # open entering the hour — the carry is the hour's true peak
        rows = [(1, m(30), m(70)), (2, m(40), m(80))]
        df = spark.createDataFrame(
            rows, "user_id long, session_start timestamp, session_end timestamp"
        )
        got = {
            r["bucket_start"]: r["max_concurrency"]
            for r in concurrency_profile(df).collect()
        }
        assert got["2024-01-01 01:00:00"] == 2

    def test_single_event_session_counts(self, spark):
        import datetime as dt

        from tafra_spark.functions.analytics import concurrency_profile

        b = dt.datetime(2024, 1, 1)
        rows = [(1, b, b)]  # one-event session: start == end
        df = spark.createDataFrame(
            rows, "user_id long, session_start timestamp, session_end timestamp"
        )
        got = concurrency_profile(df).collect()
        assert got[0]["max_concurrency"] == 1


class TestMinhashRecall:
    def test_counts_and_recall(self, spark):
        from tafra_spark.functions.dedup import minhash_recall

        rows = [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog today"),  # near-dup of 1
            (3, "совершенно unrelated words about query engines and joins"),
            (4, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup of 1
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = minhash_recall(df, threshold=0.5, num_hashes=8, band_size=2).collect()
        assert len(out) == 1
        r = out[0]
        # exact dup (1,4) is always truth AND candidate; (1,2)/(2,4)
        # depend on the deterministic hash draw — bounds, not equalities
        assert r["n_true"] >= 1 and r["n_hit"] >= 1
        assert r["n_hit"] <= r["n_true"]
        assert r["recall_q6"] == round(r["n_hit"] / r["n_true"] * 1e6)

    def test_no_true_pairs_gives_null_recall(self, spark):
        from tafra_spark.functions.dedup import minhash_recall

        rows = [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = minhash_recall(df, threshold=0.5).collect()[0]
        assert r["n_true"] == 0 and r["n_hit"] == 0
        assert r["recall_q6"] is None


class TestSplitSpansLogprob:
    def test_dataset_split_exhaustive_and_deterministic(self, spark):
        from tafra_spark.functions.sampling import dataset_split

        df = spark.createDataFrame(
            [(i,) for i in range(300)], "doc_id long"
        )
        out = dataset_split(df).collect()
        assigned = {r["doc_id"]: r["split"] for r in out}
        assert set(assigned.values()) <= {"train", "val", "test"}
        assert len(assigned) == 300
        # ~90/5/5 at n=300: train strongly dominant
        n_train = sum(1 for v in assigned.values() if v == "train")
        assert n_train > 240
        # append-stability: splitting a SUBSET yields identical
        # assignments for the shared ids (no leakage under growth)
        sub = dataset_split(
            spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
        ).collect()
        for r in sub:
            assert assigned[r["doc_id"]] == r["split"]

    def test_dataset_split_validates(self, spark):
        from tafra_spark.functions.sampling import dataset_split

        df = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError):
            dataset_split(df, {"train": 1.0})
        with pytest.raises(ValueError):
            dataset_split(df, {"a": 0.8, "b": 0.4})

    def test_dup_span_overlapping_windows_cross_doc(self, spark):
        from tafra_spark.functions.pipeline import dup_span_stats

        # docs 1 and 2 share a 3-token run at DIFFERENT offsets —
        # overlapping windows catch it regardless of alignment
        rows = [
            (1, "x1 x2 shared a b x3 x4"),
            (2, "y1 y2 y3 shared a b"),
            (3, "z1 z2 z3 z4 z5 z6"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in dup_span_stats(df, span_tokens=3, stride=1).collect()
        }
        # doc1: 5 windows, exactly 1 ('shared a b') duplicated
        assert got[1]["n_spans"] == 5 and got[1]["n_cross_dup_spans"] == 1
        assert got[2]["n_spans"] == 4 and got[2]["n_cross_dup_spans"] == 1
        assert got[3]["n_cross_dup_spans"] == 0

    def test_dup_span_rewrite_first_occurrence_wins(self, spark):
        from tafra_spark.functions.pipeline import dup_span_rewrite

        shared = "a b c d e"  # 5-token span shared verbatim
        rows = [
            (1, f"{shared} tail1 x"),
            (2, f"head2 {shared} tail2"),
            (3, "u v w x y z q"),
            (4, "tiny"),  # shorter than the span: untouched
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in dup_span_rewrite(df, span_tokens=5, stride=1).collect()
        }
        # keeper (lowest id) keeps its text verbatim
        assert got[1]["n_removed"] == 0
        assert got[1]["text_rewritten"] == "a b c d e tail1 x"
        # the other occurrence loses exactly the covered positions
        assert got[2]["n_removed"] == 5
        assert got[2]["text_rewritten"] == "head2 tail2"
        assert got[3]["n_removed"] == 0
        assert got[4]["n_removed"] == 0
        assert got[4]["text_rewritten"] == "tiny"

    def test_dup_span_within_doc_repeat_not_counted(self, spark):
        from tafra_spark.functions.pipeline import dup_span_stats

        # 'p q r' repeats INSIDE doc 1 only — cross-doc count stays 0
        rows = [(1, "p q r s p q r"), (2, "u v w x y z")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in dup_span_stats(df, span_tokens=3, stride=1).collect()
        }
        assert got[1]["n_cross_dup_spans"] == 0

    def test_dup_span_stride_and_validation(self, spark):
        from tafra_spark.functions.pipeline import dup_span_stats

        df = spark.createDataFrame(
            [(1, "a b c d e f g")], "doc_id long, text string"
        )
        got = dup_span_stats(df, span_tokens=3, stride=2).collect()[0]
        # starts 0,2,4 → 3 windows of (7-3)//2+1
        assert got["n_spans"] == 3
        with pytest.raises(ValueError):
            dup_span_stats(df, span_tokens=0)

    def test_unigram_logprob_hand_check(self, spark):
        import math

        from tafra_spark.functions.pipeline import unigram_logprob

        # corpus: 'a' x3, 'b' x1 → N=4; lp(a)=ln(3/4), lp(b)=ln(1/4)
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "a")], "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
        lp_a = math.floor(math.log(3 / 4) * 1e6 + 0.5)
        lp_b = math.floor(math.log(1 / 4) * 1e6 + 0.5)
        assert got[1]["logprob_q6_sum"] == 2 * lp_a + lp_b
        assert got[1]["n_tokens"] == 3
        assert got[2]["logprob_q6_sum"] == lp_a
        assert got[1]["mean_logprob"] == round(
            ((2 * lp_a + lp_b) / 1e6) / 3, 6
        )
        # common-token doc scores HIGHER (closer to 0) than rare-token doc
        assert got[2]["mean_logprob"] > got[1]["mean_logprob"]

    def test_perplexity_buckets_terciles_per_source(self, spark):
        from tafra_spark.functions.pipeline import perplexity_buckets

        # source s1: 7 docs built from a shared common token plus
        # per-doc rare tokens — fluency strictly decreases with the
        # number of rare tokens; source s2: 2 docs (ntile handles
        # strata smaller than the bucket count)
        rows = []
        for i in range(7):
            rows.append((i, "s1", "the " * 5 + " ".join(f"w{i}x{j}" for j in range(i))))
        rows.append((10, "s2", "the the the"))
        rows.append((11, "s2", "the rare11"))
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {r["doc_id"]: r for r in perplexity_buckets(df).collect()}
        # NTILE(3) over 7 rows → buckets of 3/2/2 in score order
        s1_sorted = sorted(range(7), key=lambda i: got[i]["mean_logprob"], reverse=True)
        labels = [got[i]["bucket_label"] for i in s1_sorted]
        assert labels == ["head"] * 3 + ["middle"] * 2 + ["tail"] * 2
        # strictly fewer rare tokens → more fluent → earlier bucket
        assert got[0]["bucket_label"] == "head"
        assert got[6]["bucket_label"] == "tail"
        # 2-row stratum: NTILE still assigns buckets 1 and 2
        assert got[10]["ppl_bucket"] == 1 and got[10]["bucket_label"] == "head"
        assert got[11]["ppl_bucket"] == 2 and got[11]["bucket_label"] == "middle"

    def test_quality_threshold_sweep(self, spark):
        from tafra_spark.functions.pipeline import quality_threshold_sweep

        scored = spark.createDataFrame(
            [(1, 10, 100), (2, -5, 50), (3, 0, 25)],
            "doc_id long, score_q6 long, n_tokens long",
        )
        got = {
            r["threshold"]: r
            for r in quality_threshold_sweep(scored, [-10, 0, 10]).collect()
        }
        # strict >: score 0 does NOT survive threshold 0
        assert got[0]["n_docs_kept"] == 1 and got[0]["n_tokens_kept"] == 100
        assert got[-10]["n_docs_kept"] == 3
        assert got[10]["n_docs_kept"] == 0 and got[10]["token_keep_q6"] == 0
        assert got[0]["doc_keep_q6"] == 1_000_000 // 3
        assert got[-10]["token_keep_q6"] == 1_000_000
        import pytest as _pytest

        with _pytest.raises(ValueError):
            quality_threshold_sweep(scored, [])

    def test_language_id_trigram(self, spark):
        from tafra_spark.functions.text import language_id_trigram

        rows = [
            (1, "der Hund ist nicht auf dem Tisch und auch nicht hier"),
            (2, "the cat was on the table and they have what this is"),
            # inflected/compound forms: no exact profile-word hit for
            # v2, but the trigrams still land (the depth claim)
            (3, "das Nichtstun und die Aufsicht"),
            (4, "zzz qqq xxx"),  # no profile trigrams -> und
            (5, None),  # NULL text -> und, not a crash
            (6, "ab"),  # sub-3-char padded string -> no phantom grams
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r for r in language_id_trigram(df).collect()
        }
        assert got[1]["trigram_lang"] == "de"
        assert got[2]["trigram_lang"] == "en"
        assert got[3]["trigram_lang"] == "de"
        assert got[4]["trigram_lang"] == "und" and got[4]["score_q6"] == 0
        assert got[5]["trigram_lang"] == "und"
        assert len(got) == 6

    def test_dsir_importance_prefers_target_like_docs(self, spark):
        from tafra_spark.functions.pipeline import dsir_importance

        # target distribution: 'alpha beta' world; raw corpus has two
        # target-like docs and two 'zeta'-world docs
        target = spark.createDataFrame(
            [(100, "alpha beta alpha"), (101, "beta alpha beta")],
            "doc_id long, text string",
        )
        raw = spark.createDataFrame(
            [
                (1, "alpha beta"),
                (2, "beta alpha"),
                (3, "zeta yotta zeta"),
                (4, "yotta zeta"),
                (5, "   "),  # blank: no features, absent from output
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r
            for r in dsir_importance(raw, target, k=2).collect()
        }
        assert set(got) == {1, 2, 3, 4}
        # unigrams + positional bigrams: 'alpha beta' -> 3 features
        assert got[1]["n_feats"] == 3
        assert got[3]["n_feats"] == 5
        # target-like docs outscore zeta-world docs and win selection
        lo = max(got[3]["importance_q6"], got[4]["importance_q6"])
        hi = min(got[1]["importance_q6"], got[2]["importance_q6"])
        assert hi > lo
        assert got[1]["selected"] and got[2]["selected"]
        assert not got[3]["selected"] and not got[4]["selected"]

    def test_nb_quality_classifier_hand_check(self, spark):
        import math

        from tafra_spark.functions.pipeline import (
            quality_classifier_score,
            quality_classifier_train,
        )

        # curated class: 'good' x3; crawl class: 'bad' x2 'good' x1
        labeled = spark.createDataFrame(
            [(1, "good good good"), (0, "bad bad good")],
            "label int, text string",
        )
        model = quality_classifier_train(labeled)
        rows = {r["term"]: r for r in model.collect()}
        # N1=3, N0=3, V=2
        assert rows["good"]["c1"] == 3 and rows["good"]["c0"] == 1
        w_good = math.floor(
            (math.log(4 / 5) - math.log(2 / 5)) * 1e6 + 0.5
        )
        assert rows["good"]["log_odds_q6"] == w_good
        assert rows["bad"]["log_odds_q6"] < 0 < rows["good"]["log_odds_q6"]

        test = spark.createDataFrame(
            [(1, "good good"), (2, "bad"), (3, "unseen")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r
            for r in quality_classifier_score(test, model).collect()
        }
        assert got[1]["score_q6"] == 2 * w_good and got[1]["pred_high"]
        assert not got[2]["pred_high"]
        # unseen term: smoothed ln(1/(N1+V)) - ln(1/(N0+V)) = 0 here
        # (balanced classes), so score is exactly the fixed-point of 0
        assert got[3]["score_q6"] == math.floor(
            (math.log(1 / 5) - math.log(1 / 5)) * 1e6 + 0.5
        )


class TestSearchOps:
    def test_inverted_index_postings_sorted_and_banded(self, spark):
        from tafra_spark.functions.text import inverted_index

        rows = [
            (3, "common alpha"),
            (1, "common alpha beta"),
            (2, "common beta beta"),
            (4, "common solo"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["term"]: r
            for r in inverted_index(df, min_df=2, max_df_frac=0.6).collect()
        }
        # 'common' df=4 > 0.6*4 → banded out; 'solo' df=1 < 2 → out
        assert set(out) == {"alpha", "beta"}
        assert out["alpha"]["df"] == 2
        assert out["alpha"]["postings"] == [1, 3]  # sorted, distinct
        assert out["beta"]["postings"] == [1, 2]  # within-doc repeat once

    def test_bm25_ranks_matching_docs(self, spark):
        from tafra_spark.functions.text import bm25_topk

        rows = [
            (1, "spark shuffle window spark"),
            (2, "spark only here filler filler filler"),
            (3, "nothing relevant at all whatsoever"),
            (4, "shuffle window"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = bm25_topk(df, ["spark", "shuffle", "window"], k=10).collect()
        ids = [r["doc_id"] for r in out]
        # non-matching doc 3 never appears; multi-term docs beat doc 2
        assert 3 not in ids
        assert ids.index(1) < ids.index(2)
        assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
        # scores strictly ordered by the (score desc, id) contract
        scores = [r["score_q6"] for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_bm25_validates_empty_query(self, spark):
        from tafra_spark.functions.text import bm25_topk

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            bm25_topk(df, [])


class TestChecksChurnBatches:
    def test_constraint_report_counts(self, spark):
        from tafra_spark.functions.checks import constraint_report

        rows = [
            (1, "a", 5.0),
            (2, "b", -1.0),
            (2, "zz", 50.0),
            (None, "a", None),
        ]
        df = spark.createDataFrame(rows, "id long, cat string, v double")
        out = {
            r["rule_idx"]: r
            for r in constraint_report(
                df,
                [
                    {"rule": "not_null", "col": "id"},
                    {"rule": "unique", "col": "id"},
                    {"rule": "min", "col": "v", "value": 0.0},
                    {"rule": "max", "col": "v", "value": 10.0},
                    {"rule": "in_set", "col": "cat", "values": ["a", "b"]},
                    {"rule": "matches", "col": "cat", "pattern": "[a-y]+"},
                ],
            ).collect()
        }
        assert out[0]["n_violations"] == 1  # one NULL id
        assert out[1]["n_violations"] == 1  # id=2 twice -> 1 extra row
        assert out[2]["n_violations"] == 1  # v=-1 (NULL v passes min)
        assert out[3]["n_violations"] == 1  # v=50
        assert out[4]["n_violations"] == 1  # 'zz'
        assert out[5]["n_violations"] == 1  # 'zz' fails [a-y]+ full match
        assert not any(r["passed"] for r in out.values())

    def test_constraint_report_unique_null_dups(self, spark):
        from tafra_spark.functions.checks import constraint_report

        df = spark.createDataFrame(
            [(None,), (None,), (1,)], "id long"
        )
        r = constraint_report(df, [{"rule": "unique", "col": "id"}]).collect()
        # two NULLs = one value seen twice -> 1 violation
        assert r[0]["n_violations"] == 1

    def test_constraint_report_validates(self, spark):
        from tafra_spark.functions.checks import constraint_report

        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError):
            constraint_report(df, [])
        with pytest.raises(ValueError):
            constraint_report(df, [{"rule": "not_null", "col": "nope"}])
        with pytest.raises(ValueError):
            constraint_report(df, [{"rule": "mystery", "col": "id"}])

    def test_snapshot_diff_statuses(self, spark):
        from tafra_spark.functions.pipeline import snapshot_diff

        old = spark.createDataFrame(
            [(1, "s", "same text"), (2, "s", "will change"), (3, "s", "gone")],
            "doc_id long, source string, text string",
        )
        new = spark.createDataFrame(
            [(1, "s", "same  text"), (2, "s", "changed!"), (4, "s", "fresh")],
            "doc_id long, source string, text string",
        )
        got = {
            r["status"]: r["n_docs"] for r in snapshot_diff(old, new).collect()
        }
        # doc1 unchanged (fingerprint normalizes whitespace), doc2
        # changed, doc3 removed, doc4 added
        assert got == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}

    def test_inference_batches_packing(self, spark):
        from tafra_spark.functions.pipeline import inference_batches

        # 5 docs in the <=8 bucket with batch_size 2 in ONE shard:
        # batches of 2/2/1 ordered by tokens desc
        rows = [(i, "w " * (i + 2)) for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = inference_batches(df, batch_size=2, n_shards=1).collect()
        assert all(r["bucket"] == 8 for r in out)
        assert sorted(r["n_docs"] for r in out) == [1, 2, 2]
        total_pad = sum(r["padded_tokens"] for r in out)
        # padding = sum over docs of (8 - n_tokens) = (8-2..8-6)
        assert total_pad == sum(8 - (i + 2) for i in range(5))
        for r in out:
            assert r["padded_tokens"] == 8 * r["n_docs"] - r["sum_tokens"]
            assert 0.0 <= r["waste_frac"] < 1.0
        with pytest.raises(ValueError):
            inference_batches(df, batch_size=0)


class TestRewriteAndWinnow:
    def test_segment_rewrite_drops_later_occurrence(self, spark):
        from tafra_spark.functions.pipeline import segment_dedup_rewrite

        rows = [
            (1, "a b c x y z"),
            (2, "a b c q r s"),  # first segment duplicates doc 1's
            (3, "u v w"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in segment_dedup_rewrite(df, seg_tokens=3).collect()
        }
        assert got[1]["n_dropped"] == 0 and got[1]["new_text"] == "a b c x y z"
        # doc 2 loses 'a b c' (doc 1 owns the first occurrence)
        assert got[2]["n_dropped"] == 1 and got[2]["new_text"] == "q r s"
        assert got[3]["new_text"] == "u v w"  # tail under one window kept

    def test_segment_rewrite_all_dropped_empty_text(self, spark):
        from tafra_spark.functions.pipeline import segment_dedup_rewrite

        rows = [(1, "a b c"), (2, "a b c")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in segment_dedup_rewrite(df, seg_tokens=3).collect()
        }
        assert got[1]["new_text"] == "a b c"
        assert got[2]["new_text"] == "" and got[2]["n_dropped"] == 1

    def test_winnow_shared_run_guarantee(self, spark):
        from tafra_spark.functions.pipeline import (
            winnow_fingerprints,
            winnow_overlap_pairs,
        )

        # k=3, window=4: any shared run of window+k-1 = 6 tokens MUST
        # share at least one fingerprint (the winnowing guarantee)
        shared = "p q r s t u"
        rows = [
            (1, f"a b c d {shared} e f g"),
            (2, f"m n {shared} o"),
            (3, "completely unrelated words here now today"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = winnow_overlap_pairs(
            df, k=3, window=4, min_shared=1
        ).collect()
        assert any(r["id_a"] == 1 and r["id_b"] == 2 for r in pairs)
        assert not any(3 in (r["id_a"], r["id_b"]) for r in pairs)
        # fingerprint density: far fewer fingerprints than grams
        fps = winnow_fingerprints(df, k=3, window=4).collect()
        n_grams = sum(len(t.split()) - 2 for _, t in rows)
        assert 0 < len(fps) < n_grams

    def test_winnow_short_doc_still_indexed(self, spark):
        from tafra_spark.functions.pipeline import winnow_fingerprints

        # 4 tokens -> 2 grams, under one 4-frame: all grams kept
        df = spark.createDataFrame(
            [(1, "a b c d")], "doc_id long, text string"
        )
        fps = winnow_fingerprints(df, k=3, window=4).collect()
        assert len(fps) == 2


class TestCorrAndTrend:
    def test_corr_matches_numpy(self, spark):
        import numpy as np

        from tafra_spark.functions.analytics import corr_matrix

        rng = [(i, float(i) * 2 + 1, float(10 - i)) for i in range(10)]
        df = spark.createDataFrame(rng, "a long, b double, c double")
        got = {
            (r["col_a"], r["col_b"]): r["corr"]
            for r in corr_matrix(df, ["a", "b", "c"]).collect()
        }
        a = np.array([r[0] for r in rng], dtype=float)
        b = np.array([r[1] for r in rng])
        c = np.array([r[2] for r in rng])
        assert got[("a", "b")] == pytest.approx(1.0)
        assert got[("a", "c")] == pytest.approx(-1.0)
        assert got[("b", "c")] == pytest.approx(
            float(np.corrcoef(b, c)[0, 1]), abs=1e-6
        )

    def test_corr_null_pairwise_deletion_and_degenerate(self, spark):
        from tafra_spark.functions.analytics import corr_matrix

        rows = [(1.0, 2.0, 5.0), (2.0, None, 5.0), (3.0, 6.0, 5.0)]
        df = spark.createDataFrame(rows, "a double, b double, c double")
        got = {
            (r["col_a"], r["col_b"]): r
            for r in corr_matrix(df, ["a", "b", "c"]).collect()
        }
        assert got[("a", "b")]["n"] == 2  # NULL row excluded pairwise
        assert got[("a", "c")]["n"] == 3
        assert got[("a", "c")]["corr"] is None  # zero variance in c
        with pytest.raises(ValueError):
            corr_matrix(df, ["a"])

    def test_grouped_trend_exact_line(self, spark):
        from tafra_spark.functions.analytics import grouped_trend

        # y = 3x + 7 in group 'u'; constant x in group 'v' -> NULL slope
        rows = [("u", float(x), 3.0 * x + 7.0) for x in range(6)]
        rows += [("v", 2.0, 9.0), ("v", 2.0, 11.0)]
        df = spark.createDataFrame(rows, "k string, x double, y double")
        got = {
            r["k"]: r
            for r in grouped_trend(
                df, ["k"], "x", "y", x_scale=1, y_scale=100
            ).collect()
        }
        assert got["u"]["slope"] == pytest.approx(3.0, abs=1e-6)
        assert got["u"]["intercept"] == pytest.approx(7.0, abs=1e-6)
        assert got["v"]["slope"] is None and got["v"]["intercept"] is None


class TestWeightedSampleK:
    def test_proportional_inclusion(self, spark):
        from tafra_spark.functions.sampling import weighted_sample_k

        # 200 light rows (w=1) vs 200 heavy rows (w=50): the heavy
        # half must dominate a k=40 draw
        rows = [(i, 1.0) for i in range(200)]
        rows += [(i + 200, 50.0) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = weighted_sample_k(df, "w", k=40).collect()
        assert len(got) == 40
        heavy = sum(1 for r in got if r["doc_id"] >= 200)
        assert heavy > 30
        assert sorted(r["rank"] for r in got) == list(range(1, 41))

    def test_deterministic_and_growth_stable(self, spark):
        from tafra_spark.functions.sampling import weighted_sample_k

        rows = [(i, float(i % 7 + 1)) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        a = {r["doc_id"] for r in weighted_sample_k(df, "w", k=10).collect()}
        b = {r["doc_id"] for r in weighted_sample_k(df, "w", k=10).collect()}
        assert a == b
        # different seed -> (almost surely) different sample
        c = {
            r["doc_id"]
            for r in weighted_sample_k(df, "w", k=10, seed=7).collect()
        }
        assert a != c

    def test_nonpositive_weights_excluded(self, spark):
        from tafra_spark.functions.sampling import weighted_sample_k

        rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = {r["doc_id"] for r in weighted_sample_k(df, "w", k=10).collect()}
        assert got == {1, 5}
        with pytest.raises(ValueError):
            weighted_sample_k(df, "w", k=0)

    def test_per_stratum_topk(self, spark):
        from tafra_spark.functions.sampling import weighted_sample_k

        rows = [(i, "a" if i < 50 else "b", 1.0) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, src string, w double")
        got = weighted_sample_k(df, "w", k=5, strata_col="src").collect()
        by = {}
        for r in got:
            by.setdefault(r["src"], []).append(r["rank"])
        assert sorted(by) == ["a", "b"]
        assert sorted(by["a"]) == [1, 2, 3, 4, 5]
        assert sorted(by["b"]) == [1, 2, 3, 4, 5]


class TestDivergenceAndEditPairs:
    def test_jsd_identical_sources_zero(self, spark):
        from tafra_spark.functions.pipeline import source_js_divergence

        rows = [
            (1, "a", "x y z"),
            (2, "b", "x y z"),  # identical distribution
            (3, "c", "p p p"),  # disjoint vocabulary
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        got = {
            (r["source_a"], r["source_b"]): r
            for r in source_js_divergence(df).collect()
        }
        import math

        assert got[("a", "b")]["jsd"] == pytest.approx(0.0, abs=1e-6)
        # disjoint sources share no terms -> no joined row at all (the
        # limit JSD would be ln 2; absence is the documented contract:
        # a pair appears iff it shares vocabulary)
        assert ("a", "c") not in got

    def test_jsd_hand_computed(self, spark):
        import math

        from tafra_spark.functions.pipeline import source_js_divergence

        # a: {x: 1/2, y: 1/2}; b: {x: 1/4, z: 3/4}
        rows = [(1, "a", "x y"), (2, "b", "x z z z")]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        r = source_js_divergence(df).collect()[0]
        p, q = 0.5, 0.25
        shared = 0.5 * p * math.log(2 * p / (p + q)) + 0.5 * q * math.log(
            2 * q / (p + q)
        )
        shared_q9 = math.floor(shared * 1e9 + 0.5) / 1e9
        expected = shared_q9 + 0.5 * math.log(2) * (1 - p) + 0.5 * math.log(
            2
        ) * (1 - q)
        assert r["jsd"] == pytest.approx(expected, abs=1e-6)
        assert r["n_shared_terms"] == 1

    def test_edit_pairs_thresholded(self, spark):
        from tafra_spark.functions.dedup import edit_distance_pairs

        base = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon"
        )
        rows = [
            (1, base + " dog"),
            (2, base + " dogs"),  # dist 1
            (3, base + " dog entirely changed tail with many extra "
                "different words appended here now"),
            (4, "completely different text with other words present"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in edit_distance_pairs(
                df, max_dist=5, num_hashes=4, band_size=2
            ).collect()
        }
        assert got.get((1, 2)) == 1
        # doc 3 shares shingles (LSH candidate) but exceeds max_dist
        assert (1, 3) not in got and (2, 3) not in got
        assert not any(4 in k for k in got)


class TestResampleFfill:
    def test_gap_filled_and_flagged(self, spark):
        from datetime import datetime

        from tafra_spark.functions.analytics import resample_ffill

        rows = [
            (1, datetime(2024, 1, 1, 0, 30), 10.0),
            (1, datetime(2024, 1, 1, 3, 15), 20.0),  # 2 empty hours
            (2, datetime(2024, 1, 1, 5, 0), 7.0),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        got = sorted(
            (
                (r["user_id"], r["bucket_ts"].hour, r["value"], r["filled"])
                for r in resample_ffill(df).collect()
            )
        )
        # user 1: hours 0..3 -> 10, 10(filled), 10(filled), 20
        assert got == [
            (1, 0, 10.0, False),
            (1, 1, 10.0, True),
            (1, 2, 10.0, True),
            (1, 3, 20.0, False),
            (2, 5, 7.0, False),
        ]

    def test_last_event_in_bucket_wins(self, spark):
        from datetime import datetime

        from tafra_spark.functions.analytics import resample_ffill

        rows = [
            (1, datetime(2024, 1, 1, 0, 10), 1.0),
            (1, datetime(2024, 1, 1, 0, 50), 2.0),  # later in same hour
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        got = resample_ffill(df).collect()
        assert len(got) == 1 and got[0]["value"] == 2.0


class TestGroupAwareSplit:
    def test_split_by_group_key_keeps_groups_together(self, spark):
        """dataset_split keyed on a GROUP column (domain, source) is the
        leakage-control variant: every doc of a group lands in the same
        split, so near-duplicates within a domain can't straddle
        train/test."""
        from tafra_spark.functions.sampling import dataset_split

        rows = [(i, f"domain{i % 7}") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, domain string")
        out = dataset_split(df, id_col="domain").collect()
        per_domain = {}
        for r in out:
            per_domain.setdefault(r["domain"], set()).add(r["split"])
        assert all(len(s) == 1 for s in per_domain.values())


class TestSemanticDecontaminate:
    def test_contaminated_rows_removed(self, spark):
        from tafra_spark.functions.similarity import semantic_decontaminate

        # corpus vec 10 equals benchmark vec 1 exactly; vec 11 is
        # orthogonal to everything
        dim = 8
        e1 = [1.0] + [0.0] * (dim - 1)
        e2 = [0.0, 1.0] + [0.0] * (dim - 2)
        bench = spark.createDataFrame(
            [(1, e1)], "vec_id long, embedding array<double>"
        )
        corpus = spark.createDataFrame(
            [(10, e1), (11, e2)], "vec_id long, embedding array<double>"
        )
        clean = semantic_decontaminate(
            corpus, bench, dim=dim, threshold=0.9, n_planes=2
        )
        assert {r["vec_id"] for r in clean.collect()} == {11}
        flags = {
            r["vec_id"]: r["contaminated"]
            for r in semantic_decontaminate(
                corpus, bench, dim=dim, threshold=0.9, n_planes=2,
                flags_only=True,
            ).collect()
        }
        assert flags == {10: True, 11: False}


class TestCorpusScorecard:
    def test_scorecard_signals(self, spark):
        from tafra_spark.functions.pipeline import corpus_scorecard

        rows = [
            (1, "a", "x y z alpha beta"),
            (2, "a", "x y z alpha beta"),  # exact dup of doc 1
            (3, "a", "p q r s t u v"),
            (4, "b", "lone document here"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        got = {r["source"]: r for r in corpus_scorecard(df).collect()}
        a, b = got["a"], got["b"]
        assert a["n_docs"] == 3 and b["n_docs"] == 1
        assert a["n_exact_dups"] == 1  # doc 2 duplicates doc 1
        assert b["n_exact_dups"] == 0
        assert a["n_tokens"] == 5 + 5 + 7
        assert a["median_tokens"] == 5.0
        # every doc's tokens are unique within the corpus LM except the
        # dup pair, so source a (repeated tokens) scores HIGHER than
        # the singleton-vocab source b
        assert a["mean_logprob"] > b["mean_logprob"]
        assert 0 < a["mean_quality_q4"] <= 10000


class TestValueHistogram:
    def test_bins_exact_and_complete(self, spark):
        from tafra_spark.functions.analytics import value_histogram

        # values 0..99 into 10 bins of width 10 -> 10 each; max closes
        # into the last bin
        df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
        got = sorted(
            (r["bin"], r["n"]) for r in value_histogram(df, "v", bins=10).collect()
        )
        assert got == [(i, 10) for i in range(10)]

    def test_empty_bins_materialized_and_constant_column(self, spark):
        from tafra_spark.functions.analytics import value_histogram

        df = spark.createDataFrame([(0.0,), (100.0,)], "v double")
        got = {r["bin"]: r["n"] for r in value_histogram(df, "v", bins=4).collect()}
        assert got == {0: 1, 1: 0, 2: 0, 3: 1}
        const = spark.createDataFrame([(5.0,), (5.0,)], "v double")
        g2 = {r["bin"]: r["n"] for r in value_histogram(const, "v", bins=3).collect()}
        assert g2 == {0: 2, 1: 0, 2: 0}
        with pytest.raises(ValueError):
            value_histogram(df, "v", bins=0)


class TestBigramLogprob:
    def test_self_scoring_hand_check(self, spark):
        import math

        from tafra_spark.functions.pipeline import bigram_logprob

        # corpus = one doc "a b a b": uni a:2 b:2 N=4; bi (a,b):2 (b,a):1
        df = spark.createDataFrame(
            [(1, "a b a b")], "doc_id long, text string"
        )
        r = bigram_logprob(df).collect()[0]
        q6 = lambda x: math.floor(x * 1e6 + 0.5)
        exp = (
            q6(math.log(2 / 4))        # first 'a': unigram
            + q6(math.log(2 / 2))      # a->b seen: 2/2
            + q6(math.log(1 / 2))      # b->a seen: 1/2
            + q6(math.log(2 / 2))      # a->b again
        )
        assert r["n_tokens"] == 4
        assert r["logprob_q6_sum"] == exp

    def test_backoff_fires_cross_model(self, spark):
        import math

        from tafra_spark.functions.pipeline import bigram_logprob

        model = spark.createDataFrame(
            [(1, "x y")], "doc_id long, text string"
        )
        scored = spark.createDataFrame(
            [(2, "y x"), (3, "zz")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r
            for r in bigram_logprob(scored, model=model).collect()
        }
        q6 = lambda v: math.floor(v * 1e6 + 0.5)
        # doc2: 'y' unigram ln(1/2); bigram (y,x) unseen -> backoff
        assert got[2]["logprob_q6_sum"] == q6(math.log(1 / 2)) + q6(
            math.log(0.4) + math.log(1 / 2)
        )
        # doc3: fully OOV single token -> ln(1/N) floor
        assert got[3]["logprob_q6_sum"] == q6(math.log(1 / 2))


class TestCusumChangepoints:
    def test_level_shift_localized(self, spark):
        from datetime import datetime, timedelta

        from tafra_spark.functions.analytics import cusum_changepoints

        # type 'a': 1 event/hour for 10h then 5/hour for 10h — the CUSUM
        # |S| peak sits exactly at the shift boundary (hour 10)
        rows = []
        t0 = datetime(2024, 1, 1)
        eid = 0
        for h in range(20):
            n = 1 if h < 10 else 5
            for k in range(n):
                rows.append((eid, t0 + timedelta(hours=h, minutes=k), "a"))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )
        r = cusum_changepoints(df).collect()[0]
        assert r["peak_ts"] == "2024-01-01 09:00:00"  # last pre-shift bucket
        assert r["total_events"] == 60 and r["n_buckets"] == 20
        # S at the peak = 10*1 - 10*3 = -20
        assert r["cusum_peak_q6"] == -20_000_000

    def test_constant_rate_small_peak(self, spark):
        from datetime import datetime, timedelta

        from tafra_spark.functions.analytics import cusum_changepoints

        rows = [
            (i, datetime(2024, 1, 1) + timedelta(hours=i), "b")
            for i in range(12)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )
        r = cusum_changepoints(df).collect()[0]
        assert r["cusum_peak_q6"] == 0  # perfectly flat -> no deviation


class TestExtraConstraintRules:
    def test_between_notinset_minlength(self, spark):
        from tafra_spark.functions.checks import constraint_report

        rows = [
            (1, "hello", 5.0),
            (2, "N/A", 50.0),
            (3, "x", None),
            (None, "okay!", -3.0),
        ]
        df = spark.createDataFrame(rows, "id long, s string, v double")
        out = {
            r["rule_idx"]: r["n_violations"]
            for r in constraint_report(
                df,
                [
                    {"rule": "between", "col": "v", "lo": 0.0, "hi": 10.0},
                    {"rule": "not_in_set", "col": "s", "values": ["N/A", ""]},
                    {"rule": "min_length", "col": "s", "value": 3},
                ],
            ).collect()
        }
        assert out[0] == 2  # 50.0 and -3.0 outside [0, 10]; NULL passes
        assert out[1] == 1  # the 'N/A' sentinel
        assert out[2] == 1  # 'x' shorter than 3


class TestFunnelStepLatency:
    def test_latency_quartiles_hand_check(self, spark):
        from datetime import datetime, timedelta

        from tafra_spark.functions.analytics import funnel_step_latency

        t0 = datetime(2024, 1, 1)
        rows = []
        # three users convert click->view with gaps 10s, 20s, 30s;
        # only user 0 reaches purchase (gap 5s)
        for u, gap in [(0, 10), (1, 20), (2, 30)]:
            rows.append((u, "click", t0))
            rows.append((u, "view", t0 + timedelta(seconds=gap)))
        rows.append((0, "purchase", t0 + timedelta(seconds=15)))
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        got = {r["step_name"]: r for r in funnel_step_latency(df).collect()}
        v = got["view"]
        assert v["n_converted"] == 3
        assert (v["p25_s"], v["p50_s"], v["p75_s"]) == (15.0, 20.0, 25.0)
        p = got["purchase"]
        assert p["n_converted"] == 1 and p["p50_s"] == 5.0

    def test_no_converters_null_quartiles(self, spark):
        from datetime import datetime

        from tafra_spark.functions.analytics import funnel_step_latency

        df = spark.createDataFrame(
            [(1, "click", datetime(2024, 1, 1))],
            "user_id long, event_type string, ts timestamp",
        )
        got = {r["step_name"]: r for r in funnel_step_latency(df).collect()}
        assert got["view"]["n_converted"] == 0
        assert got["view"]["p50_s"] is None


class TestSourceSemanticSimilarity:
    def test_centroid_direction_cosine(self, spark):
        from tafra_spark.functions.similarity import source_semantic_similarity

        docs = spark.createDataFrame(
            [(0, "a"), (1, "a"), (2, "b"), (3, "c")],
            "doc_id long, source string",
        )
        # a: two vectors averaging to +x; b: +x exactly; c: orthogonal +y
        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0]),
                (1, [1.0, 0.0]),
                (2, [2.0, 0.0]),
                (3, [0.0, 5.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        got = {
            (r["source_a"], r["source_b"]): r
            for r in source_semantic_similarity(docs, emb).collect()
        }
        assert got[("a", "b")]["cos"] == pytest.approx(1.0, abs=1e-6)
        assert got[("a", "c")]["cos"] == pytest.approx(0.0, abs=1e-6)
        assert got[("a", "b")]["n_a"] == 2 and got[("a", "b")]["n_b"] == 1
        # scale invariance: doubling a source's vectors changes nothing
        emb2 = spark.createDataFrame(
            [
                (0, [2.0, 0.0]),
                (1, [2.0, 0.0]),
                (2, [2.0, 0.0]),
                (3, [0.0, 5.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        got2 = {
            (r["source_a"], r["source_b"]): r["cos"]
            for r in source_semantic_similarity(docs, emb2).collect()
        }
        assert got2[("a", "b")] == got[("a", "b")]["cos"]


class TestUserBurstiness:
    def test_metronome_vs_bursty(self, spark):
        from datetime import datetime, timedelta

        from tafra_spark.functions.analytics import user_burstiness

        t0 = datetime(2024, 1, 1)
        rows = []
        # user 1: perfectly regular 60s gaps -> fano 0
        for i in range(10):
            rows.append((i, 1, t0 + timedelta(seconds=60 * i)))
        # user 2: bursts — five events in 4s, then an hour, twice
        eid = 100
        for burst in range(2):
            base = t0 + timedelta(hours=burst)
            for k in range(5):
                rows.append((eid, 2, base + timedelta(seconds=k)))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp"
        )
        got = {r["user_id"]: r for r in user_burstiness(df).collect()}
        assert got[1]["fano_s"] == 0.0 and got[1]["mean_gap_s"] == 60.0
        # bursty user: variance dwarfs the mean
        assert got[2]["fano_s"] > got[2]["mean_gap_s"]

    def test_min_gaps_filter(self, spark):
        from datetime import datetime, timedelta

        from tafra_spark.functions.analytics import user_burstiness

        rows = [
            (i, 1, datetime(2024, 1, 1) + timedelta(seconds=i))
            for i in range(3)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp"
        )
        assert user_burstiness(df, min_gaps=5).count() == 0


class TestRepetitionSignals:
    def test_counts_and_fractions(self, spark):
        df = spark.createDataFrame(
            [(0, "a a a b"), (1, "x y"), (2, "solo"), (3, "  ")],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: r
            for r in TX.repetition_signals(df).collect()
        }
        assert 3 not in out  # blank doc dropped
        r0 = out[0]
        assert (r0["n_words"], r0["n_distinct"]) == (4, 2)
        assert r0["dup_word_frac_q6"] == 500000  # 2 of 4 repeated
        assert r0["top_bigram"] == "a a" and r0["top_bigram_n"] == 2
        assert r0["top_bigram_frac_q6"] == 666666  # 2 of 3 bigrams
        r2 = out[2]
        assert r2["top_bigram"] is None
        assert r2["top_bigram_n"] == 0 and r2["top_bigram_frac_q6"] == 0

    def test_tie_breaks_lexicographic(self, spark):
        df = spark.createDataFrame([(0, "b c a b c a")], ["doc_id", "text"])
        row = TX.repetition_signals(df).collect()[0]
        # "a b", "b c", "c a" all appear; counts: b c=2, c a=2, a b=1
        assert row["top_bigram"] == "b c"


class TestMadOutliers:
    def test_detects_planted_outlier(self, spark):
        from tafra_spark.functions.analytics import mad_outliers

        rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 100])]
        rows += [(10 + i, "b", float(i)) for i in range(4)]  # even n, no outlier
        df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
        out = {r["event_type"]: r for r in mad_outliers(df).collect()}
        a = out["a"]
        assert a["n"] == 5 and a["median"] == 3.0
        assert a["mad"] == 1.0  # deviations 2,1,0,1,97 -> median 1
        assert a["n_outliers"] == 1  # only 100: |100-3| > 3*1.4826
        b = out["b"]
        assert b["median"] == 1.5  # even-count interpolation (1+2)/2
        assert b["n_outliers"] == 0

    def test_null_values_ignored(self, spark):
        from tafra_spark.functions.analytics import mad_outliers

        df = spark.createDataFrame(
            [(0, "a", 1.0), (1, "a", None), (2, "a", 3.0)],
            "event_id long, event_type string, value double",
        )
        out = mad_outliers(df).collect()
        assert out[0]["n"] == 2 and out[0]["median"] == 2.0

    def test_histogram_route_matches_window_route(self, spark):
        # the two routes must be bit-identical (same float ops in a
        # different plan) — compare them on continuous never-repeating
        # values, the exact shape the histogram route exists for
        from tafra_spark.functions.analytics import mad_outliers

        rows = []
        x = 1
        for i in range(400):
            x = (x * 1103515245 + 12345) % (2**31)  # deterministic LCG
            rows.append((i, "g" + str(i % 3), float(x) / 2**31 + i * 1e-9))
        df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
        win = {
            r["event_type"]: r
            for r in mad_outliers(df, route="window").collect()
        }
        hist = {
            r["event_type"]: r
            for r in mad_outliers(df, route="histogram").collect()
        }
        assert set(win) == set(hist)
        for g in win:
            for f in ("n", "median", "mad", "n_outliers", "outlier_frac_q6"):
                assert win[g][f] == hist[g][f], (g, f)

    def test_auto_route_flips_on_cardinality(self, spark):
        from tafra_spark.functions.analytics import mad_outliers
        from tafra_spark.plans.inspect import explain_str

        rows = [(i, "a", float(i) + 0.5) for i in range(50)]
        df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
        # 50 distinct values > threshold 8 -> histogram plan (bucket col)
        routed = mad_outliers(df, distinct_threshold=8)
        assert "__b__" in explain_str(routed, "simple")
        # default threshold (1e6) -> window plan, no bucket column
        unrouted = mad_outliers(df)
        assert "__b__" not in explain_str(unrouted, "simple")
        # and the answer is route-independent
        assert (
            routed.collect()[0]["median"] == unrouted.collect()[0]["median"]
        )


class TestPagerank:
    def _events(self, spark, seq):
        rows = [
            (i, u, t, i)  # ts surrogate = i keeps order deterministic
            for i, (u, t) in enumerate(seq)
        ]
        return spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        )

    def test_mass_conservation_and_ordering(self, spark):
        from tafra_spark.functions.analytics import pagerank_nodes

        # user 0: a->b->a->b ..., user 1: c->b  => b is the hub
        seq = [(0, t) for t in ["a", "b", "a", "b", "a", "b"]]
        seq += [(1, "c"), (1, "b")]
        out = pagerank_nodes(
            self._events(spark, seq), iterations=2, damping_pct=85
        ).collect()
        ranks = {r["node"]: r["pr_q9"] for r in out}
        # total mass stays within integer-floor loss of 1e9
        assert 0.95e9 < sum(ranks.values()) <= 1e9
        # after 2 iterations the a<->b cycle parks the hub's mass on a
        # (power iteration oscillates on 2-cycles); c only teleports
        assert ranks["a"] > ranks["b"] > ranks["c"]
        assert [r["node"] for r in out] == ["a", "b", "c"]
        assert [r["rank"] for r in out] == [1, 2, 3]

    def test_deterministic(self, spark):
        from tafra_spark.functions.analytics import pagerank_nodes

        seq = [(u, t) for u in range(3) for t in ["a", "b", "c", "a"]]
        ev = self._events(spark, seq)
        a = [tuple(r) for r in pagerank_nodes(ev).collect()]
        b = [tuple(r) for r in pagerank_nodes(ev).collect()]
        assert a == b


class TestDedupKeepBest:
    def test_keeps_highest_quality_copy(self, spark):
        long_text = "the quick brown fox jumps over the lazy dog " * 12
        # same fingerprint (whitespace-normalized, lowercased), but the
        # double-spaced copy scores lower on the space-ratio heuristic
        df = spark.createDataFrame(
            [
                (0, long_text.strip()),
                (1, long_text.strip().upper()),
                (2, "unique short doc"),
            ],
            ["doc_id", "text"],
        )
        out = D.dedup_keep_best(df)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {0, 2} or set(rows) == {1, 2}
        kept = 0 if 0 in rows else 1
        assert rows[kept]["group_n"] == 2
        assert rows[2]["group_n"] == 1
        # the kept copy's quality >= the dropped copy's
        from tafra_spark.functions.text import quality_score

        q = {
            r["doc_id"]: r["q"]
            for r in df.select(
                "doc_id",
                F.floor(quality_score(F.col("text")) * 10000 + 0.5).alias("q"),
            ).collect()
        }
        dropped = 1 - kept
        assert q[kept] >= q[dropped]
        assert rows[kept]["quality_q4"] == q[kept]

    def test_tie_prefers_min_id(self, spark):
        df = spark.createDataFrame(
            [(5, "same text here"), (3, "same text here")],
            ["doc_id", "text"],
        )
        out = D.dedup_keep_best(df).collect()
        assert len(out) == 1 and out[0]["doc_id"] == 3


class TestIvfPq:
    def test_search_shape_and_determinism(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        cb = S.pq_codebooks(emb, m=4, k=16)
        corpus = emb.filter(F.col("vec_id") >= 8)
        queries = emb.filter(F.col("vec_id") < 3)
        cents = emb.filter(F.col("vec_id") < 8)
        out = S.ivf_pq_topk(corpus, queries, cents, cb, k=5, nprobe=2)
        rows = out.collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, rs in by_q.items():
            assert len(rs) <= 5
            assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
                range(1, len(rs) + 1)
            )
            assert all(r["neighbor_id"] != qid for r in rs)
            dists = [r["adist_q12"] for r in sorted(rs, key=lambda r: r["rank"])]
            assert dists == sorted(dists)
        again = S.ivf_pq_topk(corpus, queries, cents, cb, k=5, nprobe=2).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    def test_probe_widening_recovers_exact_candidates(self, spark):
        # with nprobe == |centroids| no candidate is pruned, so IVFPQ
        # ranks the same candidate set as plain PQ ADC over the corpus
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        cb = S.pq_codebooks(emb, m=4, k=16)
        corpus = emb.filter(F.col("vec_id") >= 8)
        queries = emb.filter(F.col("vec_id") < 3)
        cents = emb.filter(F.col("vec_id") < 8)
        full = S.ivf_pq_topk(corpus, queries, cents, cb, k=5, nprobe=8)
        codes = S.pq_encode(corpus, cb)
        ref = S.pq_topk(codes, cb, queries, k=5)
        got = sorted(
            (r["query_id"], r["neighbor_id"], r["adist_q12"], r["rank"])
            for r in full.collect()
        )
        want = sorted(
            (r["query_id"], r["neighbor_id"], r["adist_q12"], r["rank"])
            for r in ref.collect()
        )
        assert got == want


class TestHardNegatives:
    def test_band_and_cap_respected(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = S.hard_negative_pairs(
            emb, dim=64, lo=0.3, hi=0.8, n_planes=4, per_anchor=3
        ).collect()
        assert out, "expected some in-band bucket collisions"
        per = {}
        for r in out:
            assert r["id_a"] < r["id_b"]
            assert 0.3 <= r["cos"] < 0.8
            per.setdefault(r["id_a"], []).append(r["rank"])
        for ranks in per.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 3

    def test_negatives_exclude_near_dups(self, spark):
        # a pair above hi must never appear, however similar its bucket
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        dups = {
            (r["id_a"], r["id_b"])
            for r in S.lsh_near_dup_pairs(
                emb, dim=64, threshold=0.8, n_planes=4
            ).collect()
        }
        negs = {
            (r["id_a"], r["id_b"])
            for r in S.hard_negative_pairs(
                emb, dim=64, lo=0.3, hi=0.8, n_planes=4
            ).collect()
        }
        assert not (dups & negs)


class TestTopPaths:
    def test_counts_known_journeys(self, spark):
        from tafra_spark.functions.analytics import top_paths

        seq = [
            # user 1: a b c a b c -> paths a>b>c x2, b>c>a, c>a>b
            (0, 1, "a", 0), (1, 1, "b", 1), (2, 1, "c", 2),
            (3, 1, "a", 3), (4, 1, "b", 4), (5, 1, "c", 5),
            # user 2: a b c -> a>b>c
            (6, 2, "a", 0), (7, 2, "b", 1), (8, 2, "c", 2),
            # user 3: too short for a 3-path
            (9, 3, "a", 0), (10, 3, "b", 1),
        ]
        ev = spark.createDataFrame(
            seq, ["event_id", "user_id", "event_type", "ts"]
        )
        out = {r["path"]: (r["n"], r["rank"]) for r in
               top_paths(ev, steps=3, k=10).collect()}
        assert out["a>b>c"] == (3, 1)
        assert out["b>c>a"] == (1, 2)  # ties rank by path string
        assert out["c>a>b"] == (1, 3)
        assert len(out) == 3  # user 3 contributes nothing

    def test_step_window_is_per_user(self, spark):
        from tafra_spark.functions.analytics import top_paths

        ev = spark.createDataFrame(
            [(0, 1, "a", 0), (1, 2, "b", 1), (2, 1, "c", 2)],
            ["event_id", "user_id", "event_type", "ts"],
        )
        # no user has 3 events: nothing crosses user boundaries
        assert top_paths(ev, steps=3).count() == 0
        # 2-step: only user 1's a>c
        two = top_paths(ev, steps=2).collect()
        assert [(r["path"], r["n"]) for r in two] == [("a>c", 1)]


class TestHistogramQuantiles:
    def test_estimates_bracket_exact_quantiles(self, spark):
        from tafra_spark.functions.analytics import histogram_quantiles

        vals = [float(i) for i in range(1000)]
        df = spark.createDataFrame([(v,) for v in vals], ["value"])
        out = {
            r["prob_q4"]: r
            for r in histogram_quantiles(
                df, "value", probs=(0.5, 0.9), bins=100
            ).collect()
        }
        # uniform 0..999, 100 bins of width ~10: estimate = bin lower
        # edge, so p50 ~ 490-500, p90 ~ 890-900
        assert abs(out[5000]["est_q6"] / 1e6 - 499.5) <= 10
        assert abs(out[9000]["est_q6"] / 1e6 - 899.1) <= 10
        assert out[5000]["rank_target"] == 500
        assert out[9000]["rank_target"] == 900

    def test_merge_of_halves_equals_whole(self, spark):
        # mergeability: histogram counts add, so quantiles from the
        # merged sketch equal quantiles computed over the whole data
        # (same bounds => same bins; here both halves span the range)
        from tafra_spark.functions.analytics import (
            histogram_quantiles,
            value_histogram,
        )
        import pyspark.sql.functions as SF

        vals = [(float(i),) for i in range(400)]
        whole = spark.createDataFrame(vals, ["value"])
        h_whole = {
            (r["bin"]): r["n"]
            for r in value_histogram(whole, "value", bins=40).collect()
        }
        # a merge shares global bounds; emulate by histogramming the
        # union (per-half bounds would differ: 0/398 vs 1/399)
        a = whole.filter(SF.col("value") % 2 == 0)
        b = whole.filter(SF.col("value") % 2 == 1)
        hu = {
            (r["bin"]): r["n"]
            for r in value_histogram(
                a.unionByName(b), "value", bins=40
            ).collect()
        }
        assert hu == h_whole


class TestOovRates:
    def test_known_vocab_and_rates(self, spark):
        from tafra_spark.functions.pipeline import oov_rates

        df = spark.createDataFrame(
            [
                (0, "a a a b", "s1"),   # with vocab {a,b}: 0 OOV
                (1, "a b c d", "s2"),   # c d OOV -> 2/4
            ],
            ["doc_id", "text", "source"],
        )
        out = {r["source"]: r for r in oov_rates(df, vocab_k=2).collect()}
        assert out["s1"]["n_oov"] == 0
        assert out["s2"]["n_oov"] == 2
        assert out["s2"]["oov_rate_q6"] == 500000

    def test_vocab_tie_break_deterministic(self, spark):
        from tafra_spark.functions.pipeline import oov_rates

        # b and c tie on count; vocab_k=2 keeps {a, b} (token asc)
        df = spark.createDataFrame(
            [(0, "a a b c", "s")], ["doc_id", "text", "source"]
        )
        out = oov_rates(df, vocab_k=2).collect()[0]
        assert out["n_oov"] == 1  # only c


class TestIvfPqFallback:
    def test_join_path_matches_literal_path(self, spark, monkeypatch):
        # force the >4096-centroid branch by shrinking the collect
        # probe's view: patch the literal ceiling via a tiny limit is
        # not exposed, so instead compare the two public paths by
        # calling with centroids that fit (literal) and asserting the
        # fallback logic produces identical results when exercised
        # directly through a monkeypatched threshold.
        import tafra_spark.functions.similarity as sim

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        cb = sim.pq_codebooks(emb, m=4, k=16)
        corpus = emb.filter(F.col("vec_id") >= 8)
        queries = emb.filter(F.col("vec_id") < 3)
        cents = emb.filter(F.col("vec_id") < 8)
        lit_path = sorted(
            tuple(r)
            for r in sim.ivf_pq_topk(
                corpus, queries, cents, cb, k=5, nprobe=2
            ).collect()
        )
        # drop the ceiling to 0 so the SAME call takes the join path
        real_limit = sim.DataFrame.limit

        def tiny_limit(self, n):
            return real_limit(self, 0 if n == 4097 else n)

        monkeypatch.setattr(sim.DataFrame, "limit", tiny_limit)
        join_path = sorted(
            tuple(r)
            for r in sim.ivf_pq_topk(
                corpus, queries, cents, cb, k=5, nprobe=2
            ).collect()
        )
        assert join_path == lit_path


class TestLabelConsistency:
    def test_planted_mislabels_disagree(self, spark):
        import numpy as np

        rng = np.random.RandomState(3)
        # two tight clusters, one flipped label in each
        a = rng.randn(8) ; b = -a
        rows = []
        for i in range(6):
            rows.append((i, [float(x) for x in a + 0.01 * rng.randn(8)],
                         0 if i != 5 else 1))          # 5 is mislabeled
        for i in range(6, 12):
            rows.append((i, [float(x) for x in b + 0.01 * rng.randn(8)],
                         1 if i != 11 else 0))         # 11 is mislabeled
        emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        out = {
            r["vec_id"]: r
            for r in S.label_consistency(
                emb, dim=8, k=3, n_planes=2
            ).collect()
        }
        assert len(out) == 12  # every vector emitted, even isolated ones
        flagged = {
            v for v, r in out.items()
            if r["agrees"] is False
        }
        clean_wrong = {
            v for v, r in out.items()
            if r["agrees"] is False and v not in (5, 11)
        }
        # the planted flips disagree with their neighborhood whenever
        # they HAVE same-cluster neighbors; no clean row is flagged
        assert not clean_wrong
        for v in (5, 11):
            if out[v]["n_neighbors"] >= 3:
                assert out[v]["agrees"] is False

    def test_string_labels_survive_natively(self, spark):
        # r5 regression (ADVICE): labels must keep their native type —
        # the old long-cast turned string class names into NULLs and
        # every agrees into NULL with no error
        rows = [
            (0, [1.0, 0.0], "cat"),
            (1, [0.99, 0.01], "cat"),
            (2, [0.98, 0.02], "cat"),
            (3, [0.97, 0.03], "dog"),
        ]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        out = {
            r["vec_id"]: r
            for r in S.label_consistency(
                emb, dim=2, k=3, n_planes=1
            ).collect()
        }
        assert out[0]["label"] == "cat"
        assert out[0]["majority_label"] == "cat"
        assert out[0]["agrees"] is True
        assert out[3]["majority_label"] == "cat"
        assert out[3]["agrees"] is False

    def test_isolated_vectors_have_null_majority(self, spark):
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0], 0)], ["vec_id", "embedding", "label"]
        )
        r = S.label_consistency(emb, dim=2, k=3, n_planes=2).collect()[0]
        assert r["n_neighbors"] == 0
        assert r["majority_label"] is None and r["agrees"] is None


class TestPositionAttribution:
    def test_ushape_weights_sum_to_10000_per_conversion(self, spark):
        from tafra_spark.functions.analytics import position_attribution

        # user 1: touches a,b,c,d then purchase; user 2: one touch
        rows = [
            (0, 1, "a", 0), (1, 1, "b", 10), (2, 1, "c", 20),
            (3, 1, "d", 30), (4, 1, "purchase", 40),
            (5, 2, "a", 0), (6, 2, "purchase", 1),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        )
        out = {
            r["event_type"]: r
            for r in position_attribution(
                ev, window_hours=24
            ).collect()
        }
        # conversion 4: a=4000, b=1000, c=1000(+0 rem), d=4000
        # n=4 middles get 2000 div 2 = 1000 each, remainder 0
        # conversion 6: a=10000
        assert out["a"]["credit_q4"] == 4000 + 10000
        assert out["b"]["credit_q4"] == 1000
        assert out["c"]["credit_q4"] == 1000
        assert out["d"]["credit_q4"] == 4000
        total = sum(r["credit_q4"] for r in out.values())
        assert total == 2 * 10000  # exactly 100% per conversion

    def test_remainder_goes_to_last_middle(self, spark):
        from tafra_spark.functions.analytics import position_attribution

        # 5 touches: middles are r=2,3,4 -> 2000 div 3 = 666 each,
        # remainder 2 pinned to r=4
        rows = [(i, 1, t, i * 10) for i, t in enumerate("abcde")]
        rows.append((9, 1, "purchase", 100))
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        )
        out = {
            r["event_type"]: r["credit_q4"]
            for r in position_attribution(ev, window_hours=24).collect()
        }
        assert out == {"a": 4000, "b": 666, "c": 666, "d": 668, "e": 4000}
        assert sum(out.values()) == 10000

    def test_window_excludes_stale_touches(self, spark):
        from tafra_spark.functions.analytics import position_attribution

        rows = [
            (0, 1, "a", 0),                      # 2 days before: stale
            (1, 1, "b", 2 * 86400 - 100),        # inside the window
            (2, 1, "purchase", 2 * 86400),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        )
        out = {
            r["event_type"]: r["credit_q4"]
            for r in position_attribution(ev, window_hours=24).collect()
        }
        assert out == {"b": 10000}


class TestExactGroupMedian:
    """The histogram-routed exact median (the bounded-sort scale path
    behind mad_outliers' docstring escape hatch)."""

    def _medians(self, spark, rows):
        from tafra_spark.functions.analytics import exact_group_median

        df = spark.createDataFrame(rows, ["k", "v"])
        return {
            r["k"]: (r["__med__"], r["__n__"])
            for r in exact_group_median(df, "k", "v").collect()
        }

    def test_odd_and_even_counts(self, spark):
        rows = [("a", float(v)) for v in [5, 1, 3]] + [
            ("b", float(v)) for v in [10, 20, 30, 40]
        ]
        out = self._medians(spark, rows)
        assert out["a"] == (3.0, 3)
        assert out["b"] == (25.0, 4)

    def test_ties_and_degenerate_range(self, spark):
        # all-equal values: width 0 routes everything to bucket 0 and
        # the distinct-value collapse keeps the sort at one row
        rows = [("c", 7.0)] * 5 + [("d", 1.0), ("d", 1.0), ("d", 9.0)]
        out = self._medians(spark, rows)
        assert out["c"] == (7.0, 5)
        assert out["d"] == (1.0, 3)

    def test_matches_numpy_on_random_data(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        vals = np.round(rng.lognormal(3, 1, 400), 2)
        keys = rng.choice(list("xyz"), 400)
        rows = [(str(k), float(v)) for k, v in zip(keys, vals)]
        out = self._medians(spark, rows)
        for k in "xyz":
            grp = np.sort(vals[keys == k])
            lo = grp[(len(grp) - 1) // 2]
            hi = grp[len(grp) // 2]
            assert out[k][0] == (lo + hi) / 2.0
            assert out[k][1] == len(grp)

    def test_few_buckets_still_exact(self, spark):
        # buckets=2 forces multi-value target buckets; the in-bucket
        # cumulation must still pick the exact rank values
        from tafra_spark.functions.analytics import exact_group_median

        rows = [("a", float(v)) for v in range(1, 101)]
        df = spark.createDataFrame(rows, ["k", "v"])
        out = exact_group_median(df, "k", "v", buckets=2).collect()
        assert out[0]["__med__"] == 50.5


class TestPrefixJaccard:
    """Exact prefix-filtering set-similarity join (PPJoin family)."""

    def _pairs(self, spark, rows, pct, k=None):
        from tafra_spark.functions.dedup import prefix_jaccard_pairs

        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            (r["id_a"], r["id_b"]): (r["n_common"], r["jaccard_q6"])
            for r in prefix_jaccard_pairs(
                df, threshold_pct=pct, shingle_k=k
            ).collect()
        }

    def test_exact_on_token_sets(self, spark):
        rows = [
            (1, "a b c d"),          # {a,b,c,d}
            (2, "a b c e"),          # jaccard with 1 = 3/5 = 0.6
            (3, "a b c d"),          # identical to 1
            (4, "x y z"),            # disjoint
            (5, ""),                 # empty: never appears
        ]
        out = self._pairs(spark, rows, 60)
        assert out[(1, 2)] == (3, 600000)   # boundary: 0.6 >= 0.6 kept
        assert out[(1, 3)] == (4, 1000000)
        assert (2, 3) in out
        assert not any(4 in p or 5 in p for p in out)
        # at 61% the boundary pair drops, identical pair stays
        out61 = self._pairs(spark, rows, 61)
        assert (1, 2) not in out61 and (1, 3) in out61

    def test_matches_brute_force_random(self, spark):
        import itertools
        import random

        rng = random.Random(11)
        vocab = [f"w{i}" for i in range(30)]
        rows = [
            (i, " ".join(rng.sample(vocab, rng.randint(3, 12))))
            for i in range(25)
        ]
        out = set(self._pairs(spark, rows, 50))
        sets = {i: set(t.split()) for i, t in rows}
        brute = {
            (a, b)
            for a, b in itertools.combinations(sorted(sets), 2)
            if 100 * len(sets[a] & sets[b]) >= 50 * len(sets[a] | sets[b])
        }
        assert out == brute  # ZERO recall loss — the point vs LSH

    def test_shingle_elements(self, spark):
        rows = [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the hat"),   # shares 3 of 4+4-3... shingles
            (3, "completely different words here now"),
        ]
        out = self._pairs(spark, rows, 40, k=3)
        assert (1, 2) in out and not any(3 in p for p in out)

    def test_no_cartesian_in_plan(self, spark):
        from tafra_spark.functions.dedup import prefix_jaccard_pairs
        from tafra_spark.plans.inspect import explain_str

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        s = explain_str(
            prefix_jaccard_pairs(docs, threshold_pct=60, shingle_k=3),
            "simple",
        )
        assert "CartesianProduct" not in s
        assert "BroadcastNestedLoopJoin" not in s


class TestTriangleCounts:
    def _counts(self, spark, transitions):
        # build an event stream whose per-user transition edges are
        # exactly `transitions`
        from tafra_spark.functions.analytics import triangle_counts

        rows = []
        eid = 0
        for uid, (a, b) in enumerate(transitions):
            rows.append((eid, uid, a, 0)); eid += 1
            rows.append((eid, uid, b, 1)); eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        )
        return {
            r["node"]: r["n_triangles"]
            for r in triangle_counts(ev).collect()
        }

    def test_single_triangle_plus_pendant(self, spark):
        out = self._counts(
            spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
        )
        assert out == {"a": 1, "b": 1, "c": 1, "d": 0}

    def test_k4_counts(self, spark):
        import itertools

        edges = list(itertools.combinations("abcd", 2))
        out = self._counts(spark, edges)
        # K4: each node sits in C(3,2)=3 triangles
        assert out == {n: 3 for n in "abcd"}

    def test_duplicate_and_reverse_edges_collapse(self, spark):
        out = self._counts(
            spark,
            [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c")],
        )
        assert out == {"a": 1, "b": 1, "c": 1}


class TestMemo:
    def test_cached_collect_hits_on_identical_plan(self, spark):
        from tafra_spark.functions import _memo

        _memo.clear_memos()
        df = spark.read.parquet(f"{SF}/region.parquet").select("r_name")
        a = _memo.cached_collect(df.limit(3))
        before = len(_memo._collects)
        b = _memo.cached_collect(
            spark.read.parquet(f"{SF}/region.parquet")
            .select("r_name")
            .limit(3)
        )
        assert a is b  # same list object: served from the memo
        assert len(_memo._collects) == before

    def test_memo_is_parameter_sensitive(self, spark):
        from tafra_spark.functions import _memo

        _memo.clear_memos()
        df = spark.read.parquet(f"{SF}/region.parquet").select("r_name")
        a = _memo.cached_collect(df.limit(2))
        b = _memo.cached_collect(df.limit(3))
        assert len(a) == 2 and len(b) == 3

    def test_clear_memos_forgets(self, spark):
        from tafra_spark.functions import _memo

        df = spark.read.parquet(f"{SF}/region.parquet").select("r_name")
        a = _memo.cached_collect(df.limit(3))
        _memo.clear_memos()
        b = _memo.cached_collect(df.limit(3))
        assert a is not b and a == b

    def test_plan_memo_returns_same_frame(self, spark):
        from tafra_spark.functions import _memo

        _memo.clear_memos()
        built = []

        def build():
            df = spark.read.parquet(f"{SF}/region.parquet").select("r_name")
            built.append(1)
            return df

        x = _memo.plan_memo(("t", 1), build)
        y = _memo.plan_memo(("t", 1), build)
        assert x is y and built == [1]


class TestExactGroupQuantiles:
    def test_nearest_rank_matches_numpy(self, spark):
        import numpy as np

        from tafra_spark.functions.analytics import exact_group_quantiles

        rng = np.random.RandomState(13)
        vals = np.round(rng.exponential(50, 300), 2)
        keys = rng.choice(list("pq"), 300)
        df = spark.createDataFrame(
            [(str(k), float(v)) for k, v in zip(keys, vals)], ["k", "v"]
        )
        out = {
            (r["k"], r["p_pct"]): r["q_value"]
            for r in exact_group_quantiles(
                df, "k", "v", probs_pct=(1, 50, 90, 100)
            ).collect()
        }
        for k in "pq":
            g = np.sort(vals[keys == k])
            n = len(g)
            for p in (1, 50, 90, 100):
                rank = (p * n + 99) // 100
                assert out[(k, p)] == g[rank - 1], (k, p)

    def test_ties_served_once_per_percentile(self, spark):
        from tafra_spark.functions.analytics import exact_group_quantiles

        df = spark.createDataFrame(
            [("a", 1.0)] * 9 + [("a", 9.0)], ["k", "v"]
        )
        rows = exact_group_quantiles(
            df, "k", "v", probs_pct=(25, 50, 75, 99)
        ).collect()
        out = {(r["k"], r["p_pct"]): r["q_value"] for r in rows}
        assert len(rows) == 4  # exactly one row per requested percentile
        assert out[("a", 25)] == out[("a", 50)] == out[("a", 75)] == 1.0
        assert out[("a", 99)] == 9.0

    def test_validates_probs(self, spark):
        import pytest as _pytest

        from tafra_spark.functions.analytics import exact_group_quantiles

        df = spark.createDataFrame([("a", 1.0)], ["k", "v"])
        with _pytest.raises(ValueError):
            exact_group_quantiles(df, "k", "v", probs_pct=(0, 50))
        with _pytest.raises(ValueError):
            exact_group_quantiles(df, "k", "v", probs_pct=(101,))


class TestRRFHybrid:
    """Reciprocal-rank fusion + BM25/cosine hybrid retrieval."""

    def test_rrf_known_fusion(self, spark):
        from tafra_spark.functions.retrieval import rrf_fuse

        lex = spark.createDataFrame(
            [(10, 1), (11, 2), (12, 3)], ["doc_id", "rank"]
        )
        sem = spark.createDataFrame(
            [(12, 1), (13, 2)], ["doc_id", "rank"]
        )
        out = {
            r["doc_id"]: (r["rrf_q9"], r["n_systems"], r["rank"])
            for r in rrf_fuse([lex, sem], k=10).collect()
        }
        c = lambda r: 1_000_000_000 // (60 + r)  # noqa: E731
        # doc 12 fused from rank 3 (lex) + rank 1 (sem)
        assert out[12] == (c(3) + c(1), 2, 1)
        assert out[10] == (c(1), 1, 2)
        # c(2) tie between docs 11 and 13 -> id asc: 11 before 13
        assert out[11] == (c(2), 1, 3)
        assert out[13] == (c(2), 1, 4)

    def test_rrf_tie_break_by_id(self, spark):
        from tafra_spark.functions.retrieval import rrf_fuse

        a = spark.createDataFrame([(5, 1), (3, 2)], ["doc_id", "rank"])
        b = spark.createDataFrame([(3, 1), (5, 2)], ["doc_id", "rank"])
        rows = rrf_fuse([a, b], k=10).orderBy("rank").collect()
        # identical fused scores -> id asc wins
        assert [r["doc_id"] for r in rows] == [3, 5]

    def test_rrf_validation(self, spark):
        import pytest as _pytest

        from tafra_spark.functions.retrieval import rrf_fuse

        with _pytest.raises(ValueError):
            rrf_fuse([])
        df = spark.createDataFrame([(1, 1)], ["doc_id", "rank"])
        with _pytest.raises(ValueError):
            rrf_fuse([df], k0=0)

    def test_hybrid_excludes_query_doc(self, spark):
        from tafra_spark.functions.retrieval import hybrid_search

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = hybrid_search(
            docs, emb, ["spark", "data"], query_vec_id=7, k=8,
            k_candidates=25,
        ).collect()
        assert 0 < len(out) <= 8
        assert all(r["doc_id"] != 7 for r in out)
        assert all(r["n_systems"] in (1, 2) for r in out)
        ranks = [r["rank"] for r in out]
        assert ranks == sorted(ranks)
        scores = [r["rrf_q9"] for r in out]
        assert scores == sorted(scores, reverse=True)


class TestContainmentPairs:
    def _pairs(self, spark, rows, pct, k=None):
        from tafra_spark.functions.dedup import containment_pairs

        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            (r["id_a"], r["id_b"]): (r["n_common"], r["containment_q6"])
            for r in containment_pairs(
                df, threshold_pct=pct, shingle_k=k
            ).collect()
        }

    def test_asymmetric_quote_case(self, spark):
        # doc 1 is wholly contained in doc 2; jaccard is only 4/10
        rows = [
            (1, "a b c d"),
            (2, "a b c d e f g h i j"),
            (3, "x y z"),
        ]
        out = self._pairs(spark, rows, 80)
        assert out[(1, 2)] == (4, 1000000)
        assert (2, 1) not in out  # containment of 2 in 1 is 4/10
        assert not any(3 in p for p in out)

    def test_matches_brute_force_random(self, spark):
        import itertools
        import random

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(25)]
        rows = [
            (i, " ".join(rng.sample(vocab, rng.randint(2, 14))))
            for i in range(22)
        ]
        out = set(self._pairs(spark, rows, 70))
        sets = {i: set(t.split()) for i, t in rows}
        brute = {
            (a, b)
            for a, b in itertools.permutations(sorted(sets), 2)
            if 100 * len(sets[a] & sets[b]) >= 70 * len(sets[a])
        }
        assert out == brute  # exact: zero recall loss, both directions

    def test_threshold_boundary(self, spark):
        rows = [(1, "a b c d e"), (2, "a b c d x y z")]
        # containment(1 in 2) = 4/5 = 0.8
        assert (1, 2) in self._pairs(spark, rows, 80)
        assert (1, 2) not in self._pairs(spark, rows, 81)

    def test_no_cartesian_in_plan(self, spark):
        from tafra_spark.functions.dedup import containment_pairs
        from tafra_spark.plans.inspect import explain_str

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        s = explain_str(
            containment_pairs(docs, threshold_pct=70, shingle_k=3),
            "simple",
        )
        assert "CartesianProduct" not in s
        assert "BroadcastNestedLoopJoin" not in s


class TestTokenEntropy:
    @staticmethod
    def _ref(text):
        import math
        from collections import Counter

        toks = text.lower().strip().split()
        n = len(toks)
        c = Counter(toks)
        s = sum(
            math.floor(k * math.log(k) * 1e6 + 0.5) for k in c.values()
        )
        lnn = math.floor(math.log(n) * 1e6 + 0.5)
        e = max(lnn - (s // n), 0)
        norm = (e * 1000000) // lnn if n > 1 else None
        return n, len(c), e, norm

    def test_matches_reference_formula(self, spark):
        from tafra_spark.functions.text import token_entropy

        rows = [
            (0, "a b c d e f"),                 # all distinct: max entropy
            (1, "a a a a a a"),                 # single type: zero
            (2, "a a b b c c"),
            (3, "the the the quick quick fox"),
            (4, "x"),                            # N=1: entropy 0, norm NULL
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["doc_id"]: (
                r["n_words"], r["n_distinct"], r["entropy_q6"],
                r["norm_entropy_q6"],
            )
            for r in token_entropy(df).collect()
        }
        for i, t in rows:
            assert out[i] == self._ref(t), (i, t)
        # uniform-distinct doc normalizes to exactly 1e6
        assert out[0][3] == 1000000
        assert out[1][2] == 0
        assert out[4][3] is None

    def test_random_docs_match_reference(self, spark):
        import random

        from tafra_spark.functions.text import token_entropy

        rng = random.Random(23)
        vocab = [f"t{i}" for i in range(12)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60))))
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["doc_id"]: (
                r["n_words"], r["n_distinct"], r["entropy_q6"],
                r["norm_entropy_q6"],
            )
            for r in token_entropy(df).collect()
        }
        for i, t in rows:
            assert out[i] == self._ref(t)

    def test_empty_docs_dropped(self, spark, docs):
        from tafra_spark.functions.text import token_entropy

        ids = [r["doc_id"] for r in token_entropy(docs).collect()]
        assert 4 not in ids  # empty text
        assert len(ids) == 6


class TestVocabGrowth:
    @staticmethod
    def _ref(rows):
        seen, out, ct, cv = set(), {}, 0, 0
        for i, t in sorted(rows):
            toks = t.lower().strip().split()
            new = {w for w in toks if w not in seen}
            seen |= set(toks)
            ct += len(toks)
            cv += len(new)
            out[i] = (len(toks), len(new), ct, cv)
        return out

    def test_matches_brute_force(self, spark):
        import random

        from tafra_spark.functions.pipeline import vocab_growth

        rng = random.Random(5)
        vocab = [f"v{i}" for i in range(40)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
            for i in range(35)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        ref = self._ref(rows)
        for bw in (3, 7, 1000):  # bucket width must not change results
            out = {
                r["doc_id"]: (
                    r["n_tokens"], r["n_new_terms"],
                    r["cum_tokens"], r["cum_vocab"],
                )
                for r in vocab_growth(df, bucket_width=bw).collect()
            }
            assert out == ref, bw

    def test_validation(self, spark):
        import pytest as _pytest

        from tafra_spark.functions.pipeline import vocab_growth

        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with _pytest.raises(ValueError):
            vocab_growth(df, bucket_width=0)


class TestBasketRules:
    def test_hand_example(self, spark):
        from tafra_spark.functions.analytics import basket_rules

        # baskets: u1={a,b}, u2={a,b}, u3={a,c}, u4={b}
        rows = [
            (1, "a"), (1, "b"), (2, "a"), (2, "b"),
            (3, "a"), (3, "c"), (4, "b"), (2, "a"),  # dup (2,a) collapses
        ]
        df = spark.createDataFrame(rows, ["user_id", "item"])
        out = {
            (r["antecedent"], r["consequent"]): r
            for r in basket_rules(
                df, basket_col="user_id", item_col="item",
                min_pair_support=1,
            ).collect()
        }
        ab = out[("a", "b")]
        assert (ab["n_ab"], ab["n_a"], ab["n_b"], ab["n_baskets"]) == (
            2, 3, 3, 4
        )
        assert ab["support_q6"] == 2 * 1000000 // 4
        assert ab["confidence_q6"] == 2 * 1000000 // 3
        assert ab["lift_q6"] == 2 * 4 * 1000000 // 9
        ba = out[("b", "a")]
        assert ba["n_ab"] == 2 and ba["lift_q6"] == ab["lift_q6"]
        assert ("c", "a") in out and out[("c", "a")]["confidence_q6"] == 1000000

    def test_min_support_filters(self, spark):
        from tafra_spark.functions.analytics import basket_rules

        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "c")]
        df = spark.createDataFrame(rows, ["user_id", "item"])
        out = basket_rules(
            df, basket_col="user_id", item_col="item", min_pair_support=2
        ).collect()
        assert out == []

    def test_max_basket_items_cap(self, spark):
        from tafra_spark.functions.analytics import basket_rules

        rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b")]
        df = spark.createDataFrame(rows, ["user_id", "item"])
        out = {
            (r["antecedent"], r["consequent"]): r["n_baskets"]
            for r in basket_rules(
                df, basket_col="user_id", item_col="item",
                min_pair_support=1, max_basket_items=2,
            ).collect()
        }
        # basket 1 (3 items) dropped entirely, incl. from n_baskets
        assert set(out) == {("a", "b"), ("b", "a")}
        assert out[("a", "b")] == 1


class TestWinsorize:
    def test_matches_nearest_rank_reference(self, spark):
        import math
        import random

        from tafra_spark.functions.analytics import winsorize

        rng = random.Random(3)
        rows = [
            (i, rng.choice(["x", "y"]), round(rng.uniform(0, 100), 2))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
        by_k = {}
        for _, k, v in rows:
            by_k.setdefault(k, []).append(v)

        def nearest_rank(vals, p):
            s = sorted(vals)
            return s[max(0, math.ceil(p * len(s) / 100) - 1)]

        out = winsorize(df, lo_pct=10, hi_pct=90).collect()
        assert len(out) == 200
        for r in out:
            lo = nearest_rank(by_k[r["event_type"]], 10)
            hi = nearest_rank(by_k[r["event_type"]], 90)
            assert r["value_clipped"] == min(max(r["value"], lo), hi)
            assert r["was_clipped_lo"] == (r["value"] < lo)
            assert r["was_clipped_hi"] == (r["value"] > hi)

    def test_validation(self, spark):
        import pytest as _pytest

        from tafra_spark.functions.analytics import winsorize

        df = spark.createDataFrame([(1, "a", 1.0)], ["i", "k", "value"])
        with _pytest.raises(ValueError):
            winsorize(df, key_col="k", lo_pct=50, hi_pct=50)


class TestAssortativity:
    def test_path_graph_is_disassortative(self, spark):
        from tafra_spark.functions.analytics import edge_assortativity

        edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["u", "v"])
        row = edge_assortativity(edges).collect()[0]
        assert (row["n_nodes"], row["n_edges"]) == (3, 2)
        assert row["assortativity"] == -1.0

    def test_regular_graph_null(self, spark):
        from tafra_spark.functions.analytics import edge_assortativity

        # triangle: every degree 2 -> zero variance -> NULL
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c")], ["u", "v"]
        )
        row = edge_assortativity(edges).collect()[0]
        assert row["assortativity"] is None

    def test_matches_numpy_on_random_graph(self, spark):
        import random

        import numpy as np

        from tafra_spark.functions.analytics import edge_assortativity

        rng = random.Random(9)
        edges = list(
            {
                tuple(sorted((f"n{rng.randint(0, 12)}", f"n{rng.randint(0, 12)}")))
                for _ in range(40)
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, ["u", "v"])
        row = edge_assortativity(df).collect()[0]
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        xs, ys = [], []
        for u, v in edges:
            xs += [deg[u], deg[v]]
            ys += [deg[v], deg[u]]
        ref = np.corrcoef(xs, ys)[0, 1]
        assert abs(row["assortativity"] - ref) < 1e-6
        assert row["n_edges"] == len(edges)

    def test_transition_wrapper(self, spark):
        from tafra_spark.functions.analytics import degree_assortativity

        rows = [
            (0, 1, "a", 0), (1, 1, "b", 1), (2, 1, "c", 2),
        ]  # path a-b-c via user 1 transitions
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        )
        row = degree_assortativity(ev).collect()[0]
        assert row["assortativity"] == -1.0


class TestMarkovNextEventEval:
    def test_hand_built_split(self, spark):
        from tafra_spark.functions.analytics import markov_next_event_eval

        # user 1: ts 0..3 -> transitions (a,b)@0 (b,a)@1 (a,b)@2
        # range [0, 4] -> mid = 2: train = {(a,b)@0, (b,a)@1},
        # eval = {(a,b)@2, (b,c)@3}
        rows = [
            (0, 1, "a", "2024-01-01 00:00:00"),
            (1, 1, "b", "2024-01-01 00:00:01"),
            (2, 1, "a", "2024-01-01 00:00:02"),
            (3, 1, "b", "2024-01-01 00:00:03"),
            (4, 1, "c", "2024-01-01 00:00:04"),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            r["event_type"]: r
            for r in markov_next_event_eval(ev).collect()
        }
        a = out["a"]
        assert a["predicted_next"] == "b"
        assert (a["n_train"], a["n_eval"], a["n_correct"]) == (1, 1, 1)
        assert a["accuracy_q6"] == 1000000
        b = out["b"]
        assert b["predicted_next"] == "a"
        assert (b["n_eval"], b["n_correct"]) == (1, 0)
        assert b["accuracy_q6"] == 0

    def test_unseen_type_null_prediction(self, spark):
        from tafra_spark.functions.analytics import markov_next_event_eval

        rows = [
            (0, 1, "a", "2024-01-01 00:00:00"),
            (1, 1, "a", "2024-01-01 00:00:01"),
            (2, 1, "z", "2024-01-01 00:00:09"),
            (3, 1, "a", "2024-01-01 00:00:10"),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            r["event_type"]: r
            for r in markov_next_event_eval(ev).collect()
        }
        assert out["z"]["predicted_next"] is None
        assert out["z"]["n_correct"] == 0 and out["z"]["n_train"] == 0


class TestKMVSetOps:
    def test_exact_under_k(self, spark):
        from tafra_spark.functions.sketches import kmv_set_ops

        rows = (
            [("A", f"x{i}") for i in range(10)]
            + [("B", f"x{i}") for i in range(5, 15)]
        )
        df = spark.createDataFrame(rows, ["part", "val"])
        r = kmv_set_ops(df, "val", "part", k=64).collect()[0]
        # all sketches under k: everything exact
        assert (r["part_a"], r["part_b"]) == ("A", "B")
        assert r["est_a"] == 10.0 and r["est_b"] == 10.0
        assert r["est_union"] == 15.0
        assert r["est_intersect"] == 5.0
        assert abs(r["jaccard_est"] - 5 / 15) < 1e-6

    def test_identical_and_disjoint(self, spark):
        from tafra_spark.functions.sketches import kmv_set_ops

        rows = (
            [("A", f"v{i}") for i in range(200)]
            + [("B", f"v{i}") for i in range(200)]
            + [("C", f"w{i}") for i in range(200)]
        )
        df = spark.createDataFrame(rows, ["part", "val"])
        out = {
            (r["part_a"], r["part_b"]): r
            for r in kmv_set_ops(df, "val", "part", k=32).collect()
        }
        ab = out[("A", "B")]
        assert ab["jaccard_est"] == 1.0
        assert ab["est_union"] == ab["est_intersect"]
        ac = out[("A", "C")]
        assert ac["jaccard_est"] == 0.0 and ac["est_intersect"] == 0.0
        # estimate quality: within 3/sqrt(k-2) of truth (~55%) -- loose
        assert 100 < ac["est_union"] < 900

    def test_validation(self, spark):
        import pytest as _pytest

        from tafra_spark.functions.sketches import kmv_set_ops

        df = spark.createDataFrame([("A", "x")], ["part", "val"])
        with _pytest.raises(ValueError):
            kmv_set_ops(df, "val", "part", k=1)


class TestKnnGraph:
    def test_single_bucket_equals_brute_force(self, spark):
        import numpy as np

        from tafra_spark.functions.similarity import knn_graph

        rng = np.random.RandomState(4)
        vecs = rng.randn(20, 8).astype("float32")
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = {}
        for r in knn_graph(df, dim=8, k=3, n_planes=0).collect():
            out.setdefault(r["src"], []).append((r["rank"], r["dst"]))
        norms = np.linalg.norm(vecs, axis=1)
        for i in range(20):
            cos = vecs @ vecs[i] / (norms * norms[i])
            order = sorted(
                (j for j in range(20) if j != i),
                key=lambda j: (-cos[j], j),
            )[:3]
            got = [d for _, d in sorted(out[i])]
            assert got == order, i

    def test_bucketed_subset_and_determinism(self, spark):
        from tafra_spark.functions.similarity import knn_graph

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        a = knn_graph(emb, dim=64, k=3, n_planes=6).collect()
        b = knn_graph(emb, dim=64, k=3, n_planes=6).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        per_src = {}
        for r in a:
            per_src.setdefault(r["src"], []).append(r)
        for src, rs in per_src.items():
            assert len(rs) <= 3
            assert all(r["dst"] != src for r in rs)

    def test_auto_n_planes_ladder(self):
        from tafra_spark.functions.similarity import auto_n_planes

        # base planes up to the base corpus, +1 per doubling, capped
        assert auto_n_planes(0) == 6
        assert auto_n_planes(512) == 6
        assert auto_n_planes(513) == 7
        assert auto_n_planes(1024) == 7
        assert auto_n_planes(1025) == 8
        assert auto_n_planes(2000) == 8
        assert auto_n_planes(20000) == 12  # +4 planes for 10x of 2000
        assert auto_n_planes(10**12) == 22  # capped
        # ~3.3 planes per decade: 10x rows => per-bucket size flat
        for n in (1000, 10_000, 100_000, 1_000_000):
            assert auto_n_planes(10 * n) - auto_n_planes(n) in (3, 4)

    def test_auto_default_matches_explicit(self, spark):
        from tafra_spark.functions.similarity import (
            auto_n_planes,
            knn_graph,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        derived = auto_n_planes(emb.count())
        auto = knn_graph(emb, dim=64, k=3).collect()
        fixed = knn_graph(emb, dim=64, k=3, n_planes=derived).collect()
        assert sorted(map(tuple, auto)) == sorted(map(tuple, fixed))

    def test_auto_ladder_matches_duckdb_case(self):
        """The oracle's SQL CASE ladder must reproduce auto_n_planes
        bit-for-bit for every corpus size (integer shift comparisons on
        both engines — the contract behind the adaptive knn oracle)."""
        import duckdb

        from tafra_spark.functions.similarity import (
            KNN_AUTO_BASE_CORPUS,
            KNN_AUTO_BASE_PLANES,
            KNN_AUTO_MAX_PLANES,
            auto_n_planes,
        )

        base, n0, cap = (
            KNN_AUTO_BASE_PLANES,
            KNN_AUTO_BASE_CORPUS,
            KNN_AUTO_MAX_PLANES,
        )
        ladder = (
            f"(CAST({base} AS BIGINT) + CASE "
            + " ".join(
                f"WHEN n <= {n0 << e} THEN {e}" for e in range(cap - base)
            )
            + f" ELSE {cap - base} END)"
        )
        ns = [0, 1, 511, 512, 513, 1024, 1025, 2000, 20000, 10**9, 10**13]
        got = duckdb.sql(
            f"SELECT n, {ladder} AS p FROM (SELECT UNNEST("
            f"{ns!r}::BIGINT[]) AS n)"
        ).fetchall()
        for n, p in got:
            assert p == auto_n_planes(n), n


class TestMarkovAttribution:
    def _ev(self, spark, journeys):
        # journeys: list of event-type sequences, one per user
        rows, eid = [], 0
        for uid, seq in enumerate(journeys):
            for i, t in enumerate(seq):
                rows.append(
                    (eid, uid, t, f"2024-01-01 00:00:{i:02d}")
                )
                eid += 1
        return spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def test_single_channel_full_credit(self, spark):
        from tafra_spark.functions.analytics import markov_attribution

        # every conversion goes through 'a'; removing 'a' kills all
        ev = self._ev(spark, [["a", "purchase"], ["a", "purchase"], ["b"]])
        out = {r["channel"]: r for r in markov_attribution(ev).collect()}
        assert out["a"]["removal_effect_q6"] == 1000000
        assert out["a"]["attribution_q6"] == 1000000
        assert out["b"]["removal_effect_q6"] == 0

    def test_hand_computed_chain(self, spark):
        from tafra_spark.functions.analytics import markov_attribution

        # START->a (2 users); a->purchase (1), a->NULL (1)
        ev = self._ev(spark, [["a", "purchase"], ["a"]])
        out = {r["channel"]: r for r in markov_attribution(ev).collect()}
        # P(conv) = P(START->a)*P(a->CONV) = 1 * 1/2
        assert out["a"]["p_full_q9"] == 500000000
        assert out["a"]["p_removed_q9"] == 0
        assert out["a"]["removal_effect_q6"] == 1000000

    def test_no_conversions(self, spark):
        from tafra_spark.functions.analytics import markov_attribution

        ev = self._ev(spark, [["a", "b"], ["b"]])
        out = {r["channel"]: r for r in markov_attribution(ev).collect()}
        assert all(r["p_full_q9"] == 0 for r in out.values())
        assert all(r["removal_effect_q6"] is None for r in out.values())

    def test_events_after_conversion_ignored(self, spark):
        from tafra_spark.functions.analytics import markov_attribution

        # channel 'z' appears only AFTER conversion: no credit, and it
        # must not even appear as a channel
        ev = self._ev(spark, [["a", "purchase", "z"]])
        out = {r["channel"]: r for r in markov_attribution(ev).collect()}
        assert "z" not in out
        assert out["a"]["removal_effect_q6"] == 1000000


class TestSeasonalAnomalies:
    def test_spike_and_silent_drop(self, spark):
        from tafra_spark.functions.analytics import seasonal_anomalies

        rows, eid = [], 0
        # type 'x': hour 10 on 4 consecutive same-weekday days
        # (Jan 1/8/15/22 2024 are Mondays): 5,5,5,20 events; plus
        # hour 11 busy on three Mondays, silent on the fourth
        for day, n in [("01", 5), ("08", 5), ("15", 5), ("22", 20)]:
            for i in range(n):
                rows.append((eid, 1, "x", f"2024-01-{day} 10:00:{i:02d}"))
                eid += 1
        for day in ["01", "08", "15"]:
            for i in range(8):
                rows.append((eid, 1, "x", f"2024-01-{day} 11:00:{i:02d}"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = seasonal_anomalies(ev).collect()
        cells = {(r["day"], r["hour"]): r for r in out}
        spike = cells[("2024-01-22", 10)]
        # slot baseline: 35 events over ... slot includes every Monday
        # in [Jan 1, Jan 22] = 4 cells; 20*4*100 > 200*35
        assert spike["is_spike"] and not spike["is_drop"]
        silent = cells[("2024-01-22", 11)]
        assert silent["n"] == 0 and silent["is_drop"]

    def test_integer_flags_match_reference(self, spark):
        import datetime as dt
        import random

        from tafra_spark.functions.analytics import seasonal_anomalies

        rng = random.Random(12)
        rows, eid = [], 0
        t0 = dt.datetime(2024, 3, 1)
        for _ in range(400):
            ts = t0 + dt.timedelta(
                days=rng.randint(0, 13),
                hours=rng.randint(0, 23),
                minutes=rng.randint(0, 59),
            )
            rows.append((eid, 1, rng.choice(["p", "q"]), ts.isoformat(" ")))
            eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = seasonal_anomalies(ev).collect()
        # reference: rebuild grid in python
        from collections import Counter, defaultdict

        cnt = Counter()
        for _, _, t, ts in rows:
            d = dt.datetime.fromisoformat(ts)
            cnt[(t, d.date(), d.hour)] += 1
        days = [
            (t0 + dt.timedelta(days=i)).date() for i in range(14)
        ]
        slots = defaultdict(list)
        for t in ("p", "q"):
            for d in days:
                for h in range(24):
                    dow = (d.toordinal() - dt.date(1970, 1, 1).toordinal() + 4) % 7
                    slots[(t, dow, h)].append((d, h, cnt.get((t, d, h), 0)))
        expected = set()
        for (t, dow, h), cells_ in slots.items():
            ss = sum(n for _, _, n in cells_)
            sc = len(cells_)
            for d, hh, n in cells_:
                if n * sc * 100 > 200 * ss or n * sc * 100 < 50 * ss:
                    expected.add((t, str(d), hh))
        got = {(r["event_type"], r["day"], r["hour"]) for r in out}
        assert got == expected


class TestFunnelWithin:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def test_bound_gates_conversion(self, spark):
        from tafra_spark.functions.analytics import funnel_within

        rows = [
            # user 1 converts within bounds; user 2's view is too late
            (0, 1, "click", "2024-01-01 00:00:00"),
            (1, 1, "view", "2024-01-01 00:30:00"),
            (2, 1, "purchase", "2024-01-01 00:45:00"),
            (3, 2, "click", "2024-01-01 00:00:00"),
            (4, 2, "view", "2024-01-01 02:00:00"),
        ]
        out = {
            r["step_name"]: r
            for r in funnel_within(
                self._ev(spark, rows), within_seconds=3600
            ).collect()
        }
        assert out["click"]["n_users"] == 2
        assert out["view"]["n_users"] == 1
        assert out["purchase"]["n_users"] == 1
        assert out["view"]["conversion_q6"] == 500000

    def test_boundary_inclusive(self, spark):
        from tafra_spark.functions.analytics import funnel_within

        rows = [
            (0, 1, "click", "2024-01-01 00:00:00"),
            (1, 1, "view", "2024-01-01 01:00:00"),  # exactly 3600 s
        ]
        out = {
            r["step_name"]: r["n_users"]
            for r in funnel_within(
                self._ev(spark, rows), within_seconds=3600
            ).collect()
        }
        assert out["view"] == 1

    def test_anchored_greedy_documented_miss(self, spark):
        from tafra_spark.functions.analytics import funnel_within

        # first click's window expires; the RE-ENTRY chain would
        # convert under exists-any-chain semantics but the documented
        # anchored-greedy semantics does not count it
        rows = [
            (0, 1, "click", "2024-01-01 00:00:00"),
            (1, 1, "click", "2024-01-01 05:00:00"),
            (2, 1, "view", "2024-01-01 05:30:00"),
        ]
        out = {
            r["step_name"]: r["n_users"]
            for r in funnel_within(
                self._ev(spark, rows), within_seconds=3600
            ).collect()
        }
        assert out["view"] == 0

    def test_unbounded_limit_matches_funnel_conversion(self, spark):
        from tafra_spark.functions.analytics import (
            funnel_conversion,
            funnel_within,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        a = {
            r["step_name"]: r["n_users"]
            for r in funnel_within(ev, within_seconds=10**9).collect()
        }
        b = {
            r["step_name"]: r["n_users"]
            for r in funnel_conversion(ev).collect()
        }
        assert a == b


class TestSchemaDiff:
    def test_added_removed_changed(self, spark, tmp_path):
        from tafra_spark import Tafra

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        spark.range(5).selectExpr(
            "id", "CAST(id AS INT) AS x", "CAST(id AS DOUBLE) AS gone"
        ).write.parquet(a)
        spark.range(5).selectExpr(
            "id", "CAST(id AS BIGINT) AS x", "'s' AS fresh"
        ).write.parquet(b)
        out = {
            r["column"]: r
            for r in Tafra.schema_diff(a, b, spark).df.collect()
        }
        assert out["gone"]["change"] == "removed"
        assert out["fresh"]["change"] == "added"
        assert out["x"]["change"] == "type_changed"
        assert (out["x"]["type_a"], out["x"]["type_b"]) == ("int32", "int64")

    def test_no_drift_empty(self, spark, tmp_path):
        from tafra_spark import Tafra

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        spark.range(3).write.parquet(a)
        spark.range(4).write.parquet(b)
        assert Tafra.schema_diff(a, b, spark).df.count() == 0


class TestQuantileNormalize:
    def test_matches_rank_mapping_reference(self, spark):
        import math
        import random

        from tafra_spark.functions.pipeline import quantile_normalize

        rng = random.Random(6)
        rows = [
            (i, rng.choice(["A", "B"]), round(rng.uniform(0, 10), 2))
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
        out = {
            r["doc_id"]: r["value_normalized"]
            for r in quantile_normalize(
                df, "score", part_col="source", id_col="doc_id"
            ).collect()
        }
        all_sorted = sorted(v for _, _, v in rows)
        N = len(all_sorted)
        by_part = {}
        for i, p, v in rows:
            by_part.setdefault(p, []).append(v)
        for i, p, v in rows:
            vals = sorted(by_part[p])
            # rank(): 1 + count of strictly smaller values
            r = 1 + sum(1 for x in vals if x < v)
            n = len(vals)
            t = (r * N + n - 1) // n
            assert out[i] == all_sorted[t - 1], (i, p, v)

    def test_ties_map_equal(self, spark):
        from tafra_spark.functions.pipeline import quantile_normalize

        df = spark.createDataFrame(
            [(1, "A", 5.0), (2, "A", 5.0), (3, "A", 9.0), (4, "B", 1.0)],
            ["doc_id", "source", "score"],
        )
        out = {
            r["doc_id"]: r["value_normalized"]
            for r in quantile_normalize(
                df, "score", part_col="source", id_col="doc_id"
            ).collect()
        }
        assert out[1] == out[2]

    def test_identity_single_partition(self, spark):
        from tafra_spark.functions.pipeline import quantile_normalize

        # one partition: every value maps to itself (rank r of n ->
        # global rank ceil(r*n/n) = r)
        df = spark.createDataFrame(
            [(i, "A", float(i)) for i in range(1, 9)],
            ["doc_id", "source", "score"],
        )
        out = quantile_normalize(
            df, "score", part_col="source", id_col="doc_id"
        ).collect()
        assert all(r["value_normalized"] == r["score"] for r in out)


class TestTemplateDupGroups:
    def test_digit_masked_groups(self, spark):
        from tafra_spark.functions.pipeline import template_dup_groups

        rows = [
            (1, "Order 12345 shipped to  box 9"),
            (2, "order 99 shipped to box 100"),   # same template
            (3, "ORDER 7 SHIPPED TO BOX 2"),      # same (case folded)
            (4, "completely different text"),
            (5, ""),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["doc_id"]: (r["group_n"], r["rank_in_group"])
            for r in template_dup_groups(df).collect()
        }
        assert set(out) == {1, 2, 3}
        assert all(g == 3 for g, _ in out.values())
        assert out[1][1] == 1 and out[3][1] == 3  # rank by id

    def test_min_group_and_validation(self, spark):
        import pytest as _pytest

        from tafra_spark.functions.pipeline import template_dup_groups

        df = spark.createDataFrame(
            [(1, "a 1"), (2, "a 2"), (3, "b")], ["doc_id", "text"]
        )
        assert len(template_dup_groups(df, min_group=3).collect()) == 0
        with _pytest.raises(ValueError):
            template_dup_groups(df, min_group=1)


class TestMixedLanguage:
    def test_flags_code_switching(self, spark):
        from tafra_spark.functions.text import mixed_language_flags

        rows = [
            (1, "the quick fox and the dog " * 3
                + "der hund und die katze ist nicht da " * 3),
            (2, "the quick fox and the dog is here for the win"),
            (3, "x"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in mixed_language_flags(df).collect()}
        assert out[1]["is_mixed"]
        assert (out[1]["lang_head"], out[1]["lang_tail"]) == ("en", "de")
        assert not out[2]["is_mixed"]
        assert not out[3]["is_mixed"]  # single token never flags

    def test_zero_shuffle_plan(self, spark):
        from tafra_spark.functions.text import mixed_language_flags
        from tafra_spark.plans.inspect import count_exchanges

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        assert count_exchanges(mixed_language_flags(docs)) == 0


class TestDistributionMatchWeights:
    def test_matches_formula_reference(self, spark):
        import math
        import random

        from tafra_spark.functions.sampling import distribution_match_weights

        rng = random.Random(8)
        rows = [
            (i, rng.choice(["A", "B", "C"]), float(rng.randint(0, 99)))
            for i in range(150)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source", "v"])
        out = {
            r["doc_id"]: (r["bin"], r["weight_q6"])
            for r in distribution_match_weights(
                df, "v", part_col="source", bins=5
            ).collect()
        }
        lo = min(v for _, _, v in rows)
        hi = max(v for _, _, v in rows)
        width = (hi - lo) / 5.0
        from collections import Counter

        def bin_of(v):
            return min(int(math.floor((v - lo) / width)), 4)

        npb = Counter((p, bin_of(v)) for _, p, v in rows)
        np_ = Counter(p for _, p, _ in rows)
        nb = Counter(bin_of(v) for _, _, v in rows)
        N = len(rows)
        for i, p, v in rows:
            b = bin_of(v)
            w = (nb[b] * np_[p] * 1_000_000) // (N * npb[(p, b)])
            assert out[i] == (b, w), (i, p, v)

    def test_reweighted_shares_match_global(self, spark):
        from tafra_spark.functions.sampling import distribution_match_weights

        # skewed source: all-low values in A, all-high in B; after
        # weighting, each source's weighted bin mass ∝ global shares
        rows = [(i, "A", 1.0) for i in range(30)] + [
            (i + 100, "A", 9.0) for i in range(10)
        ] + [(i + 200, "B", 9.0) for i in range(40)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "v"])
        out = distribution_match_weights(
            df, "v", part_col="source", bins=2
        ).collect()
        mass = {}
        for r in out:
            mass[(r["source"], r["bin"])] = (
                mass.get((r["source"], r["bin"]), 0) + r["weight_q6"]
            )
        # A's weighted mass in bin 1 must rise to B-comparable share:
        # global shares are 30/80 low, 50/80 high -> weighted A mass
        # low:high == 30:50 (each within q6 rounding of 40*share*1e6)
        assert abs(mass[("A", 0)] - 40 * 1_000_000 * 30 // 80) <= 40
        assert abs(mass[("A", 1)] - 40 * 1_000_000 * 50 // 80) <= 40

    def test_null_and_validation(self, spark):
        import pytest as _pytest

        from tafra_spark.functions.sampling import distribution_match_weights

        df = spark.createDataFrame(
            [(1, "A", 1.0), (2, "A", None)], ["doc_id", "source", "v"]
        )
        out = {
            r["doc_id"]: r["weight_q6"]
            for r in distribution_match_weights(df, "v").collect()
        }
        assert out[2] is None
        with _pytest.raises(ValueError):
            distribution_match_weights(df, "v", bins=0)


class TestCompressionStats:
    def test_matches_python_reference(self, spark):
        import re as _re

        from tafra_spark.functions.text import UNIT_PATTERN, compression_stats

        rows = [
            (1, "A", "hello, world! x99"),
            (2, "A", "aa bb"),
            (3, "B", "öç ü"),   # multibyte: octet length > char length
            (4, "B", ""),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = {r["source"]: r for r in compression_stats(df).collect()}
        for src in ("A", "B"):
            docs = [t for _, s, t in rows if s == src and t.strip()]
            tb = sum(len(t.encode()) for t in docs)
            tu = sum(len(_re.findall(UNIT_PATTERN, t)) for t in docs)
            r = out[src]
            assert (r["n_docs"], r["total_bytes"], r["total_units"]) == (
                len(docs), tb, tu,
            )
            assert r["bytes_per_unit_q6"] == tb * 1_000_000 // tu
            assert r["units_per_doc_q6"] == tu * 1_000_000 // len(docs)


class TestGroupIntegritySplit:
    def test_all_user_events_in_one_split(self, spark):
        from tafra_spark.functions.sampling import dataset_split

        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = dataset_split(ev, id_col="user_id").select(
            "user_id", "split"
        ).distinct()
        # each user maps to exactly one split
        per_user = out.groupBy("user_id").count().collect()
        assert all(r["count"] == 1 for r in per_user)


class TestSilenceStreaks:
    def test_known_gaps(self, spark):
        from tafra_spark.functions.analytics import silence_streaks

        rows = [
            # type x: events at hours 0 and 5 on one day -> longest
            # silent streak = hours 1-4 (4) vs trailing 6-23 (18)
            (0, 1, "x", "2024-01-01 00:30:00"),
            (1, 1, "x", "2024-01-01 05:10:00"),
            # type y: every hour busy in a 2-hour range
            (2, 1, "y", "2024-01-01 00:00:00"),
            (3, 1, "y", "2024-01-01 01:00:00"),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {r["event_type"]: r for r in silence_streaks(ev).collect()}
        # one day -> 24 cells per type
        assert out["x"]["n_cells"] == 24
        assert out["x"]["max_silent_hours"] == 18
        assert out["x"]["n_silent_cells"] == 22
        assert out["y"]["max_silent_hours"] == 22
        assert out["y"]["n_silent_cells"] == 22

    def test_no_silence(self, spark):
        from tafra_spark.functions.analytics import silence_streaks

        rows = [
            (i, 1, "z", f"2024-01-01 {h:02d}:00:00")
            for i, h in enumerate(range(24))
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        row = silence_streaks(ev).collect()[0]
        assert row["max_silent_hours"] == 0 and row["n_silent_cells"] == 0


class TestClusterLabelPurity:
    def test_pure_and_mixed_clusters(self, spark):
        import math

        from tafra_spark.functions.similarity import cluster_label_purity

        # centroids along axes; vectors exactly on axes -> known
        # assignment. Cluster 0: labels [1,1,1] pure; cluster 1:
        # labels [2,3] mixed.
        cents = spark.createDataFrame(
            [(100, [1.0, 0.0]), (101, [0.0, 1.0])], ["vec_id", "embedding"]
        )
        vecs = spark.createDataFrame(
            [
                (0, [2.0, 0.1], 1), (1, [3.0, 0.0], 1), (2, [1.0, 0.2], 1),
                (3, [0.1, 2.0], 2), (4, [0.0, 1.5], 3),
            ],
            ["vec_id", "embedding", "label"],
        )
        out = {
            r["centroid_id"]: r
            for r in cluster_label_purity(vecs, cents).collect()
        }
        c0 = out[100]
        assert (c0["n"], c0["majority_label"]) == (3, 1)
        assert c0["majority_share_q6"] == 1000000
        assert c0["entropy_q6"] == 0
        c1 = out[101]
        assert c1["n"] == 2 and c1["majority_label"] == 2  # tie -> label asc
        assert c1["majority_share_q6"] == 500000
        # two singleton labels: H = ln 2 exactly
        assert c1["entropy_q6"] == math.floor(math.log(2) * 1e6 + 0.5)


class TestAudioDecode:
    def _assets(self, spark, n=5, mime="audio/wav"):
        from pyspark.sql import types as T

        from tafra_spark.functions.multimodal import fake_wav_bytes

        schema = T.StructType([
            T.StructField("asset_id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", T.StructType([
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
                T.StructField("duration_ms", T.LongType()),
                T.StructField("mime", T.StringType()),
            ])),
        ])
        rows = [
            (i, "audio", fake_wav_bytes(i), (None, None, 25, mime))
            for i in range(n)
        ]
        return spark.createDataFrame(rows, schema)

    def test_real_wav_roundtrip_matches_formula(self, spark):
        import math

        from tafra_spark.functions.multimodal import decode_audio

        out = {
            r["asset_id"]: r
            for r in decode_audio(self._assets(spark)).collect()
        }
        for aid in range(5):
            sam = [
                (((aid * 7919 + i * i) % 2048) - 1024) * 16
                for i in range(200)
            ]
            ssq = sum(s * s for s in sam)
            r = out[aid]
            assert (r["n_channels"], r["sample_rate"], r["n_samples"]) == (
                1, 8000, 200,
            )
            assert r["duration_ms"] == 25
            assert r["rms_q3"] == math.floor(
                math.sqrt(ssq / 200) * 1000 + 0.5
            )

    def test_unsupported_mime_raises(self, spark):
        import pytest as _pytest

        from tafra_spark.functions.multimodal import decode_audio

        df = self._assets(spark, n=1, mime="audio/mp3")
        with _pytest.raises(Exception) as exc:
            decode_audio(df).collect()
        assert "NotImplementedError" in str(exc.value) or "codec" in str(
            exc.value
        )

    def test_audio_features_normalized(self, spark):
        from tafra_spark.functions.multimodal import extract_audio_features

        out = extract_audio_features(
            self._assets(spark), n_windows=8
        ).collect()
        for r in out:
            assert len(r["features"]) == 8
            norm = sum(v * v for v in r["features"])
            assert abs(norm - 1.0) < 1e-3
        # deterministic across runs
        again = extract_audio_features(
            self._assets(spark), n_windows=8
        ).collect()
        assert sorted(map(str, out)) == sorted(map(str, again))


class TestGateThresholdSweep:
    def test_matches_reference(self, spark):
        from tafra_spark.functions.pipeline import gate_threshold_sweep

        rows = [
            (1, "a b c"),            # 3 tokens
            (2, "a b c d e f"),      # 6
            (3, " ".join("t" * 1 for _ in range(12))),  # 12
            (4, ""),                 # 0
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["min_tokens"]: r
            for r in gate_threshold_sweep(df, thresholds=(1, 5, 10)).collect()
        }
        toks = [3, 6, 12, 0]
        total = sum(toks)
        for t in (1, 5, 10):
            keep = [n for n in toks if n >= t]
            r = out[t]
            assert r["n_docs_pass"] == len(keep)
            assert r["tokens_retained"] == sum(keep)
            assert r["docs_frac_q6"] == len(keep) * 1_000_000 // 4
            assert r["tokens_frac_q6"] == sum(keep) * 1_000_000 // total

    def test_validation(self, spark):
        import pytest as _pytest

        from tafra_spark.functions.pipeline import gate_threshold_sweep

        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with _pytest.raises(ValueError):
            gate_threshold_sweep(df, thresholds=(-1,))


class TestPQReconstructionError:
    def test_matches_numpy_reference(self, spark):
        import math

        import numpy as np

        from tafra_spark.functions.similarity import (
            pq_codebooks,
            pq_reconstruction_error,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        cb = pq_codebooks(emb, m=4, k=16)
        out = {
            r["subspace"]: r
            for r in pq_reconstruction_error(emb, cb).collect()
        }
        rows = sorted(
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in emb.collect()
        )
        cents = [v for _, v in rows[:16]]
        d_sub = 16
        for s in range(4):
            errs = []
            for _, v in rows:
                sub = v[s * d_sub:(s + 1) * d_sub]
                best = None
                for c in cents:
                    cc = c[s * d_sub:(s + 1) * d_sub]
                    d = sum(
                        math.floor((x - y) * (x - y) * 1e12 + 0.5)
                        for x, y in zip(sub, cc)
                    )
                    best = d if best is None else min(best, d)
                errs.append(best)
            r = out[s]
            assert r["n_vectors"] == len(errs)
            assert r["mean_err_q12"] == sum(errs) // len(errs)
            assert r["max_err_q12"] == max(errs)


class TestUnicodeScrub:
    def test_nfc_and_control_strip(self, spark):
        import unicodedata

        from tafra_spark.functions.pipeline import unicode_scrub

        decomposed = "Café"          # e + combining acute
        ctrl = "ab\x00cd\x1fef"
        rows = [
            (1, decomposed),
            (2, ctrl),
            (3, "plain ascii"),
            (4, None),
            (5, "tab\tand\nnewline stay"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in unicode_scrub(df).collect()}
        assert out[1]["text_clean"] == unicodedata.normalize(
            "NFC", decomposed
        )
        assert out[1]["changed"]
        assert out[1]["n_controls_removed"] == 0
        assert out[2]["text_clean"] == "abcdef"
        assert out[2]["n_controls_removed"] == 2
        assert not out[3]["changed"]
        assert out[4]["text_clean"] is None and not out[4]["changed"]
        assert out[5]["text_clean"] == "tab\tand\nnewline stay"
        assert not out[5]["changed"]


class TestShardBalance:
    def test_partition_and_balance(self, spark):
        from tafra_spark.functions.pipeline import shard_balance_report

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = shard_balance_report(docs, n_shards=4).collect()
        assert len(out) == 4
        assert sum(r["n_docs"] for r in out) == 500
        total = sum(r["n_tokens"] for r in out)
        for r in out:
            assert r["balance_q6"] == r["n_tokens"] * 4 * 1_000_000 // total


def _py_bpe(words_freq, n_merges):
    """Pure-Python reference BPE (greedy leftmost fold, count-desc then
    lexicographic tie-break) for checking the distributed learner."""
    syms = {w: list(w) for w in words_freq}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for w, f in words_freq.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = l + r
        merges.append((step, l, r, merged, cnt))
        for w in syms:
            s = syms[w]
            out = [s[0]] if s else []
            for x in s[1:]:
                if out and out[-1] == l and x == r:
                    out[-1] = merged
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


def _py_bpe_batched(words_freq, n_merges, batch, top_window=None):
    """Pure-Python reference for BATCHED BPE: per round, rank pairs
    (count DESC, l, r), take the conservative pairwise-disjoint subset
    of the top-W (bpe_select_batch's rule), apply all accepted merges
    in one simultaneous pass."""
    from tafra_spark.functions.text import bpe_select_batch

    if top_window is None:
        top_window = max(4, 8 * batch)
    syms = {w: list(w) for w in words_freq}
    merges = []
    # r7 budget-filling schedule: static 2x rounds, dynamic caps
    rounds = 2 * (-(-n_merges // batch))
    step = 0
    for _ in range(rounds):
        cap = min(batch, n_merges - step)
        if cap <= 0:
            break
        counts = {}
        for w, f in words_freq.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        top = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[:top_window]
        accepted = bpe_select_batch(
            [(l, r, c) for (l, r), c in top], cap
        )
        table = {}
        for left, right, merged, cnt in accepted:
            step += 1
            merges.append((step, left, right, merged, cnt))
            table[(left, right)] = merged
        for w in syms:
            s = syms[w]
            out = [s[0]] if s else []
            for x in s[1:]:
                if out and (out[-1], x) in table:
                    out[-1] = table[(out[-1], x)]
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


class TestBpeLearn:
    def test_matches_python_reference(self, spark):
        texts = [
            "aaaa aaa aa banana banana bandana",
            "apple apples banana Apple 123 mixed7 aaaa",
            "low lower lowest newer newest wider",
            "aaaaaaa b ab abab",
        ]
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        words = {}
        for t in texts:
            for w in t.lower().split():
                if w.isalpha() and w.isascii():
                    words[w] = words.get(w, 0) + 1
        exp, _ = _py_bpe(words, 6)
        got = [
            (r["step"], r["left_sym"], r["right_sym"], r["merged"],
             r["pair_count"])
            for r in TX.bpe_learn(df, n_merges=6)
            .orderBy("step").collect()
        ]
        assert got == exp

    def test_run_fold_semantics(self, spark):
        # "a a a a a a" chain: greedy leftmost pairs -> [aa, aa, aa],
        # never the replace-all artifact [aa, a, aa, a]
        df = spark.createDataFrame([("aaaaaa aaaa aa",)], ["text"])
        out = TX.bpe_learn(df, n_merges=2).orderBy("step").collect()
        # step 1: (a, a) with count 3+2+1+... per adjacency convention:
        # aaaaaa has 5 adjacent (a,a), aaaa has 3, aa has 1 -> 9
        assert (out[0]["left_sym"], out[0]["right_sym"],
                out[0]["pair_count"]) == ("a", "a", 9)
        # after merge 1: aaaaaa->[aa,aa,aa], aaaa->[aa,aa], aa->[aa]
        # step 2 argmax is (aa, aa): 2 + 1 = 3
        assert (out[1]["left_sym"], out[1]["right_sym"],
                out[1]["pair_count"]) == ("aa", "aa", 3)

    def test_validation(self, spark):
        df = spark.createDataFrame([("x",)], ["text"])
        with pytest.raises(ValueError):
            TX.bpe_learn(df, n_merges=0)
        with pytest.raises(ValueError):
            TX.bpe_learn(df, text_col="nope")
        with pytest.raises(ValueError):
            TX.bpe_learn(df, batch=0)

    def test_select_batch_conservative_rule(self):
        # rank order: (t,h) accepted; (h,e) shares h with rank-1 ->
        # rejected; (e,r) shares e with REJECTED rank-2 -> still
        # rejected (conflicts count against ALL higher ranks, the
        # SQL-expressible rule); (i,n) disjoint -> accepted
        top = [("t", "h", 50), ("h", "e", 40), ("e", "r", 30),
               ("i", "n", 20), ("o", "u", 10)]
        got = TX.bpe_select_batch(top, batch=8)
        assert got == [("t", "h", "th", 50), ("i", "n", "in", 20),
                       ("o", "u", "ou", 10)]
        # cap enforcement
        assert TX.bpe_select_batch(top, batch=1) == [("t", "h", "th", 50)]
        # merged-string conflicts: (a,b)->"ab" blocks a later ("ab",c)
        top2 = [("a", "b", 9), ("ab", "c", 5), ("x", "y", 1)]
        assert TX.bpe_select_batch(top2, batch=8) == [
            ("a", "b", "ab", 9), ("x", "y", "xy", 1)]

    def test_batched_matches_python_reference(self, spark):
        texts = [
            "aaaa aaa aa banana banana bandana",
            "apple apples banana Apple 123 mixed7 aaaa",
            "low lower lowest newer newest wider",
            "the then there these other another",
        ]
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        words = {}
        for t in texts:
            for w in t.lower().split():
                if w.isalpha() and w.isascii():
                    words[w] = words.get(w, 0) + 1
        exp, _ = _py_bpe_batched(words, n_merges=12, batch=4)
        got = [
            (r["step"], r["left_sym"], r["right_sym"], r["merged"],
             r["pair_count"])
            for r in TX.bpe_learn(df, n_merges=12, batch=4)
            .orderBy("step").collect()
        ]
        assert got == exp

    def test_batch_one_is_sequential_bpe(self, spark):
        # batch=1 must be bit-identical to classic sequential BPE
        texts = ["low lower lowest newer newest wider banana"]
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        words = {}
        for w in texts[0].split():
            words[w] = words.get(w, 0) + 1
        exp, _ = _py_bpe(words, 5)
        got = [
            (r["step"], r["left_sym"], r["right_sym"], r["merged"],
             r["pair_count"])
            for r in TX.bpe_learn(df, n_merges=5, batch=1)
            .orderBy("step").collect()
        ]
        assert got == exp


class TestBpeTokenStats:
    def test_matches_python_reference(self, spark):
        texts = [
            ("s1", "banana bandana apple apple"),
            ("s1", "low lower lowest"),
            ("s2", "banana banana Banana 99 aaaa aa"),
        ]
        df = spark.createDataFrame(texts, ["source", "text"])
        words = {}
        for _, t in texts:
            for w in t.lower().split():
                if w.isalpha() and w.isascii():
                    words[w] = words.get(w, 0) + 1
        _, syms = _py_bpe(words, 4)
        exp = {}
        for src, t in texts:
            for w in t.lower().split():
                if not (w.isalpha() and w.isascii()):
                    continue
                n_w, n_c, n_t = exp.get(src, (0, 0, 0))
                exp[src] = (n_w + 1, n_c + len(w), n_t + len(syms[w]))
        out = {
            r["source"]: r
            for r in TX.bpe_token_stats(
                df, n_merges=4, key_cols=("source",)
            ).collect()
        }
        assert set(out) == set(exp)
        for src, (n_w, n_c, n_t) in exp.items():
            r = out[src]
            assert (r["n_words"], r["n_chars"], r["n_tokens"]) == (
                n_w, n_c, n_t)
            assert r["tokens_per_word"] == round(n_t / n_w, 6)
            assert r["chars_per_token"] == round(n_c / n_t, 6)


class TestBpeEncodeDocs:
    def test_matches_python_reference(self, spark):
        texts = [
            (1, "banana bandana apple apple"),
            (2, "low lower 99 lowest Banana"),
            (3, "?? !! 123"),  # all-unk document
            (4, None),  # wordless docs keep their row (review fix)
            (5, "   "),
        ]
        df = spark.createDataFrame(
            texts, "doc_id long, text string"
        )
        words = {}
        for _, t in texts:
            for w in (t or "").lower().split():
                if w.isalpha() and w.isascii():
                    words[w] = words.get(w, 0) + 1
        merges, syms = _py_bpe(words, 4)
        piece_ids = {chr(97 + i): i for i in range(26)}
        for step, _l, _r, m, _c in merges:
            piece_ids.setdefault(m, 25 + step)
        unk = 26 + len(merges)
        exp = {}
        for did, t in texts:
            ids, n_unk = [], 0
            for w in (t or "").lower().split():
                if w.isalpha() and w.isascii():
                    ids += [piece_ids[s] for s in syms[w]]
                else:
                    ids.append(unk)
                    n_unk += 1
            exp[did] = (len((t or "").split()), n_unk, len(ids), ids)
        out = {
            r["doc_id"]: r
            for r in TX.bpe_encode_docs(df, n_merges=4).collect()
        }
        assert set(out) == set(exp)
        for did, (n_w, n_unk, n_t, ids) in exp.items():
            r = out[did]
            assert (r["n_words"], r["n_unk"], r["n_tokens"]) == (
                n_w, n_unk, n_t), did
            assert list(r["token_ids"]) == ids, did

    def test_token_counts_agree_with_stats(self, spark):
        # encode and the yield report must count the in-vocab token
        # stream identically (stats excludes OOV words; encode charges
        # them one unk each)
        texts = [
            ("s1", 1, "banana bandana apple apple 7seven"),
            ("s1", 2, "low lower lowest"),
        ]
        df = spark.createDataFrame(texts, ["source", "doc_id", "text"])
        enc = TX.bpe_encode_docs(df, n_merges=3).collect()
        stats = TX.bpe_token_stats(
            df, n_merges=3, key_cols=("source",)
        ).collect()[0]
        assert sum(r["n_tokens"] - r["n_unk"] for r in enc) == (
            stats["n_tokens"]
        )

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            TX.bpe_encode_docs(df, text_col="nope")
        with pytest.raises(ValueError):
            TX.bpe_encode_docs(df, id_col="nope")


class TestZipfFit:
    def test_matches_numpy_reference(self, spark):
        import math

        rng = np.random.default_rng(7)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        # skewed draws -> a real rank-frequency curve
        probs = np.array([0.4, 0.25, 0.15, 0.1, 0.06, 0.04])
        texts = [
            " ".join(rng.choice(vocab, size=30, p=probs))
            for _ in range(20)
        ]
        df = spark.createDataFrame([("k", t) for t in texts],
                                   ["source", "text"])
        freq = {}
        for t in texts:
            for w in t.split():
                freq[w] = freq.get(w, 0) + 1
        ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
        qx = [math.floor(math.log(i + 1) * 1e6 + 0.5)
              for i in range(len(ranked))]
        qy = [math.floor(math.log(c) * 1e6 + 0.5) for _, c in ranked]
        n = float(len(ranked))
        sx, sy = float(sum(qx)), float(sum(qy))
        sxy = float(sum(a * b for a, b in zip(qx, qy)))
        sxx = float(sum(a * a for a in qx))
        syy = float(sum(b * b for b in qy))
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        from tafra_spark.functions.analytics import zipf_fit

        r = zipf_fit(df, key_cols=("source",)).collect()[0]
        assert r["n_terms"] == len(ranked)
        assert r["slope"] == round(num / denx, 6)
        assert r["intercept"] == round(
            (sy / n - (num / denx) * (sx / n)) / 1e6, 6)
        assert r["r2"] == round((num * num) / (denx * deny), 6)
        # natural text drawn from a skewed law: slope must be negative
        assert r["slope"] < -0.5

    def test_degenerate_single_term(self, spark):
        from tafra_spark.functions.analytics import zipf_fit

        df = spark.createDataFrame(
            [("k", "same same same")], ["source", "text"])
        r = zipf_fit(df).collect()[0]
        assert r["n_terms"] == 1
        assert r["slope"] is None and r["r2"] is None

    def test_validation(self, spark):
        from tafra_spark.functions.analytics import zipf_fit

        df = spark.createDataFrame([("k", "a")], ["source", "text"])
        with pytest.raises(ValueError):
            zipf_fit(df, text_col="missing")


class TestHeapsFit:
    def test_matches_python_reference(self, spark):
        import math

        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(60)]
        texts = []
        for d in range(15):
            # growing corpus with Zipf-ish draws -> a real Heaps curve
            n = 20 + 5 * d
            p = np.array([1.0 / (i + 1) for i in range(60)])
            texts.append((d, " ".join(rng.choice(vocab, size=n,
                                                  p=p / p.sum()))))
        df = spark.createDataFrame(texts, ["doc_id", "text"])
        seen, cum_t, pts = set(), 0, []
        for d, t in texts:
            ws = t.split()
            cum_t += len(ws)
            seen |= set(ws)
            pts.append((cum_t, len(seen)))
        qx = [math.floor(math.log(a) * 1e6 + 0.5) for a, _ in pts]
        qy = [math.floor(math.log(b) * 1e6 + 0.5) for _, b in pts]
        n = float(len(pts))
        sx, sy = float(sum(qx)), float(sum(qy))
        sxy = float(sum(a * b for a, b in zip(qx, qy)))
        sxx = float(sum(a * a for a in qx))
        syy = float(sum(b * b for b in qy))
        num, denx = n * sxy - sx * sy, n * sxx - sx * sx
        deny = n * syy - sy * sy
        from tafra_spark.functions.pipeline import heaps_fit

        r = heaps_fit(df, bucket_width=4).collect()[0]
        assert r["n_points"] == len(pts)
        assert r["beta"] == round(num / denx, 6)
        assert r["intercept"] == round(
            (sy / n - (num / denx) * (sx / n)) / 1e6, 6)
        assert r["r2"] == round((num * num) / (denx * deny), 6)
        # sub-linear vocabulary growth: 0 < beta < 1
        assert 0.0 < r["beta"] < 1.0

    def test_degenerate_single_doc(self, spark):
        from tafra_spark.functions.pipeline import heaps_fit

        df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
        r = heaps_fit(df).collect()[0]
        assert r["n_points"] == 1
        assert r["beta"] is None and r["r2"] is None


class TestClusteringCoefficient:
    def _ev(self, spark, edges):
        rows = []
        eid = 0
        for uid, (a, b) in enumerate(edges):
            rows.append((eid, uid, a, 0)); eid += 1
            rows.append((eid, uid, b, 1)); eid += 1
        return spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        )

    def test_triangle_plus_tail(self, spark):
        from tafra_spark.functions.analytics import clustering_coefficient

        ev = self._ev(
            spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
        )
        out = {r["node"]: r for r in clustering_coefficient(ev).collect()}
        # degrees: a=2 b=2 c=3 d=1; triangles: a,b,c=1, d=0
        assert out["a"]["degree"] == 2 and out["a"]["n_triangles"] == 1
        assert out["a"]["clustering_q6"] == 1_000_000  # 2*1/(2*1)
        assert out["b"]["clustering_q6"] == 1_000_000
        assert out["c"]["degree"] == 3
        assert out["c"]["clustering_q6"] == 333_333  # 2*1e6 div 6
        assert out["d"]["degree"] == 1
        assert out["d"]["clustering_q6"] is None  # no possible wedges


class TestKCore:
    _ev = TestClusteringCoefficient._ev

    def test_peels_tail_to_triangle(self, spark):
        from tafra_spark.functions.analytics import k_core

        ev = self._ev(
            spark,
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        )
        out = {r["node"]: r["core_degree"] for r in k_core(ev, k=2).collect()}
        # e (deg 1) peels in round 1, then d (deg 1) in round 2
        assert out == {"a": 2, "b": 2, "c": 2}

    def test_static_round_prefix(self, spark):
        from tafra_spark.functions.analytics import k_core

        ev = self._ev(
            spark,
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        )
        # rounds=1: only e peels; d survives with its dangling edge gone
        out = {
            r["node"]: r["core_degree"]
            for r in k_core(ev, k=2, rounds=1).collect()
        }
        assert out == {"a": 2, "b": 2, "c": 3, "d": 1}

    def test_validation(self, spark):
        from tafra_spark.functions.analytics import k_core

        ev = self._ev(spark, [("a", "b")])
        with pytest.raises(ValueError):
            k_core(ev, k=0)
        with pytest.raises(ValueError):
            k_core(ev, k=2, rounds=0)

    def test_driver_peel_matches_distributed(self, spark):
        # r8: the bounded-adjacency driver peel and the big-|V|
        # distributed fallback are two implementations of the same
        # static-round semantics — differential-test them on a random
        # graph (forcing the fallback via max_driver_edges=0)
        import random

        from tafra_spark.functions.analytics import k_core

        rng = random.Random(7)
        nodes = [f"t{i}" for i in range(12)]
        pairs = {
            tuple(sorted(rng.sample(nodes, 2))) for _ in range(40)
        }
        ev = self._ev(spark, sorted(pairs))
        for k, rounds in [(2, 1), (2, 8), (3, 8)]:
            fast = {
                r["node"]: r["core_degree"]
                for r in k_core(ev, k=k, rounds=rounds).collect()
            }
            slow = {
                r["node"]: r["core_degree"]
                for r in k_core(
                    ev, k=k, rounds=rounds, max_driver_edges=0
                ).collect()
            }
            assert fast == slow, (k, rounds)


class TestKAnonymity:
    def test_profile_counts(self, spark):
        from tafra_spark.functions.pipeline import k_anonymity

        # classes: (a,1)x1, (a,2)x3, (b,1)x6
        rows = (
            [("a", 1)] + [("a", 2)] * 3 + [("b", 1)] * 6
        )
        df = spark.createDataFrame(rows, ["q1", "q2"])
        out = {
            r["k_threshold"]: r
            for r in k_anonymity(df, ["q1", "q2"], thresholds=(2, 5, 10)).collect()
        }
        assert out[2]["n_classes"] == 3
        assert out[2]["n_classes_below"] == 1 and out[2]["n_rows_below"] == 1
        assert out[2]["rows_below_frac_q6"] == 100_000  # 1/10
        assert out[5]["n_classes_below"] == 2 and out[5]["n_rows_below"] == 4
        assert out[10]["n_classes_below"] == 3
        assert out[10]["n_rows_below"] == 10
        assert out[10]["rows_below_frac_q6"] == 1_000_000

    def test_null_qi_is_its_own_class(self, spark):
        from tafra_spark.functions.pipeline import k_anonymity

        df = spark.createDataFrame(
            [("a",), (None,), (None,)], "q1 string"
        )
        out = {
            r["k_threshold"]: r
            for r in k_anonymity(df, ["q1"], thresholds=(2,)).collect()
        }
        assert out[2]["n_classes"] == 2
        assert out[2]["n_rows_below"] == 1  # only the 'a' singleton

    def test_validation(self, spark):
        from tafra_spark.functions.pipeline import k_anonymity

        df = spark.createDataFrame([("a",)], "q1 string")
        with pytest.raises(ValueError):
            k_anonymity(df, [])
        with pytest.raises(ValueError):
            k_anonymity(df, ["q1"], thresholds=(1,))


class TestShapleyAttribution:
    def test_hand_computed_case(self, spark):
        from tafra_spark.functions.analytics import shapley_attribution

        # u1 {click}->conv, u2 {click,view}->conv, u3 {view} no conv,
        # u4 {} ->conv.  v(0)=1 v(click)=2 v(view)=1 v(both)=3
        # num_click = (v1-v0) + (v3-v2) = 1 + 2 = 3
        # num_view  = (v2-v0) + (v3-v1) = 0 + 1 = 1
        # denom = 2!*(v3-v0) = 4 -> shares 750000 / 250000
        rows = [
            (0, 1, "click", 0), (1, 1, "purchase", 1),
            (2, 2, "view", 0), (3, 2, "click", 1), (4, 2, "purchase", 2),
            (5, 3, "view", 0),
            (6, 4, "purchase", 0),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        )
        out = {
            r["channel"]: r
            for r in shapley_attribution(
                ev, channels=["click", "view"], conversion="purchase"
            ).collect()
        }
        assert out["click"]["n_converters"] == 3
        assert out["click"]["shapley_num"] == 3
        assert out["click"]["share_q6"] == 750_000
        assert out["view"]["shapley_num"] == 1
        assert out["view"]["share_q6"] == 250_000

    def test_no_channel_touch_gives_null_shares(self, spark):
        from tafra_spark.functions.analytics import shapley_attribution

        ev = spark.createDataFrame(
            [(0, 1, "purchase", 0)],
            ["event_id", "user_id", "event_type", "ts"],
        )
        out = shapley_attribution(
            ev, channels=["click"], conversion="purchase"
        ).collect()
        assert out[0]["share_q6"] is None  # v(N) == v(0): no signal

    def test_validation(self, spark):
        from tafra_spark.functions.analytics import shapley_attribution

        ev = spark.createDataFrame(
            [(0, 1, "click", 0)], ["event_id", "user_id", "event_type", "ts"]
        )
        with pytest.raises(ValueError):
            shapley_attribution(ev, channels=[])
        with pytest.raises(ValueError):
            shapley_attribution(ev, channels=["click", "click"])
        with pytest.raises(ValueError):
            shapley_attribution(
                ev, channels=["purchase"], conversion="purchase"
            )


class TestBenfordProfile:
    def test_digits_and_expectations(self, spark):
        from tafra_spark.functions.analytics import benford_profile

        # values with first digits 1,1,2,9; 0.5 and null excluded
        rows = [
            (0, "a", 15.0), (1, "a", 120.0), (2, "a", 2.5),
            (3, "a", 900.0), (4, "a", 0.5), (5, "a", None),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )
        out = {r["digit"]: r for r in benford_profile(df).collect()}
        assert sorted(out) == list(range(1, 10))
        assert out[1]["n"] == 2 and out[1]["observed_q6"] == 500_000
        assert out[2]["n"] == 1 and out[9]["n"] == 1
        assert out[3]["n"] == 0 and out[3]["observed_q6"] == 0
        import math

        assert out[1]["expected_q6"] == math.floor(
            math.log10(2) * 1_000_000
        )
        assert out[1]["deviation_q6"] == abs(
            500_000 - out[1]["expected_q6"]
        )

    def test_empty_input_null_shares(self, spark):
        from tafra_spark.functions.analytics import benford_profile

        df = spark.createDataFrame(
            [], "event_id long, event_type string, value double"
        )
        out = benford_profile(df).collect()
        assert len(out) == 9
        assert all(r["observed_q6"] is None for r in out)


class TestReadabilityScores:
    def test_hand_counts(self, spark):
        from tafra_spark.functions.text import readability_scores

        df = spark.createDataFrame(
            [(1, "The cat sat. The dog ran!"), (2, "   "), (3, None)],
            ["doc_id", "text"],
        )
        out = readability_scores(df).collect()
        assert len(out) == 1  # blank and NULL rows have no words
        r = out[0]
        assert r["n_words"] == 6 and r["n_sentences"] == 2
        # vowel runs: e,a,a,e,o,a -> 6
        assert r["n_syllables"] == 6
        # 206835 - 1015*(6 div 2) - 84600*(6 div 6) = 119190
        assert r["flesch_q3"] == 206835 - 1015 * 3 - 84600 * 1


class TestFdProfile:
    def test_holds_and_violations(self, spark):
        from tafra_spark.functions.pipeline import fd_profile

        rows = [
            (1, "a", "x"), (2, "a", "x"),   # key a: one dep -> holds
            (3, "b", "x"), (4, "b", "y"),   # key b: two deps -> violates
        ]
        df = spark.createDataFrame(rows, ["rid", "det", "dep"])
        out = {
            r["determinant"]: r
            for r in fd_profile(
                df, [("det", "dep"), ("rid", "dep")]
            ).collect()
        }
        d = out["det"]
        assert d["n_keys"] == 2 and d["n_violating_keys"] == 1
        assert d["n_rows"] == 4 and d["n_violating_rows"] == 2
        assert d["violating_rows_q6"] == 500_000
        r = out["rid"]  # rid unique -> FD holds
        assert r["n_violating_keys"] == 0 and r["violating_rows_q6"] == 0

    def test_validation(self, spark):
        from tafra_spark.functions.pipeline import fd_profile

        df = spark.createDataFrame([(1, "a")], ["rid", "det"])
        with pytest.raises(ValueError):
            fd_profile(df, [])
        with pytest.raises(KeyError):
            fd_profile(df, [("nope", "det")])


class TestSq8Report:
    def test_hand_case(self, spark):
        from tafra_spark.functions.similarity import sq8_report

        # dim0: values 0..1 quantize near-exactly on the 255-code grid
        # at the endpoints; dim1 constant -> degenerate, zero error
        rows = [(0, [0.0, 5.0]), (1, [1.0, 5.0]), (2, [0.5, 5.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r["dim_idx"]: r for r in sq8_report(df).collect()}
        d0 = out[0]
        assert d0["mn"] == 0.0 and d0["mx"] == 1.0 and d0["n"] == 3
        # endpoints reconstruct with <= one half-step error; 0.5 maps
        # to code 127 -> recon 127/255, err ~ (0.5 - 127/255)^2
        step = 1.0 / 255
        assert d0["sq_err_q12"] <= int(3 * (step * step) * 1e12)
        d1 = out[1]
        assert d1["mn"] == 5.0 and d1["mx"] == 5.0
        assert d1["sq_err_q12"] == 0  # degenerate dim: code 0, recon mn


class TestJpegCodec:
    def test_dct_matrix_orthonormal(self):
        from tafra_spark.functions._jpeg import _C

        assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)

    def test_encoder_bytes_pinned(self):
        # byte-determinism golden: the multimodal builders feed WARC
        # digests and oracle rows, so a codec "optimization" that
        # changes a single output byte must fail HERE, not as a
        # mysterious hash mismatch three layers up (r9: pinned after
        # the batched-DCT/memoization rework, which was verified
        # byte-identical against the previous encoder first)
        import hashlib

        from tafra_spark.functions import multimodal as MM

        pins = {
            "fake_jpeg_bytes": "1e08950da6b1e4adb2cf1679ebe456ca",
            "fake_jpeg420_bytes": "7e59467e208bd27ad38ed4d63576e3e1",
            "fake_jpeg_progressive_bytes":
                "dac7658c50dc7b9e05be56b84377c32f",
            "fake_jpeg_lossless_bytes":
                "a43f36b299e4c140ea1b8b915ca5dd98",
            "fake_jpeg12_bytes": "e38dbb6482bcde4482e9e7eb4fc81a2c",
        }
        for name, want in pins.items():
            blob = b"".join(getattr(MM, name)(i) for i in range(16))
            assert hashlib.md5(blob).hexdigest() == want, name

    def test_dct_roundtrip_exact_without_quantization(self):
        from tafra_spark.functions._jpeg import _C

        rng = np.random.RandomState(2)
        b = rng.randint(-128, 128, size=(8, 8)).astype(float)
        coef = _C @ b @ _C.T
        back = _C.T @ coef @ _C
        assert np.allclose(back, b, atol=1e-9)

    def test_gray_roundtrip_bounded_error(self):
        from tafra_spark.functions._jpeg import decode_jpeg, encode_jpeg_gray

        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, size=(24, 17), dtype=np.uint8)
        back = decode_jpeg(encode_jpeg_gray(img, quality=95))
        assert back.shape == img.shape
        # q95 luminance quant steps are tiny; noise images stay within
        # a small per-pixel band
        assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 12

    def test_constant_block_roundtrips_exactly(self):
        from tafra_spark.functions._jpeg import decode_jpeg, encode_jpeg_gray

        img = np.full((16, 16), 100, dtype=np.uint8)
        back = decode_jpeg(encode_jpeg_gray(img, quality=90))
        assert (back == img).all()

    def test_rgb_roundtrip_and_luminance(self):
        from tafra_spark.functions._jpeg import (
            decode_jpeg,
            decode_jpeg_gray,
            encode_jpeg_rgb,
        )

        rng = np.random.RandomState(3)
        rgb = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
        payload = encode_jpeg_rgb(rgb, quality=95)
        back = decode_jpeg(payload)
        assert back.shape == rgb.shape
        # chroma quantization is coarser; bound is loose but real
        assert int(np.abs(back.astype(int) - rgb.astype(int)).max()) <= 40
        lum = decode_jpeg_gray(payload)
        assert lum.shape == (16, 16)

    def test_byte_stuffing_survives(self):
        # an image engineered to emit many 0xFF entropy bytes must
        # round-trip through the stuff/unstuff path
        from tafra_spark.functions._jpeg import decode_jpeg, encode_jpeg_gray

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, size=(40, 40), dtype=np.uint8)
        payload = encode_jpeg_gray(img, quality=25)  # coarse -> varied bytes
        back = decode_jpeg(payload)
        assert back.shape == img.shape

    def test_lossless_roundtrip_all_predictors(self):
        from tafra_spark.functions._jpeg import (
            decode_jpeg,
            encode_jpeg_lossless,
        )

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, size=(23, 17)).astype(np.int64)
        for pred in range(1, 8):
            back = decode_jpeg(encode_jpeg_lossless(img, predictor=pred))
            assert back.dtype == np.uint8
            assert (back == img).all(), f"predictor {pred}"

    def test_lossless_16bit_and_multicomponent(self):
        from tafra_spark.functions._jpeg import (
            decode_jpeg,
            encode_jpeg_lossless,
        )

        rng = np.random.RandomState(12)
        img = rng.randint(0, 65536, size=(19, 11)).astype(np.int64)
        back = decode_jpeg(encode_jpeg_lossless(img, predictor=4))
        assert back.dtype == np.uint16 and (back == img).all()
        rgb = rng.randint(0, 256, size=(9, 13, 3)).astype(np.int64)
        back = decode_jpeg(encode_jpeg_lossless(rgb, predictor=5))
        # lossless carries NO color transform: planes come back verbatim
        assert back.shape == (9, 13, 3) and (back == rgb).all()

    def test_lossless_point_transform_and_restarts(self):
        from tafra_spark.functions._jpeg import (
            decode_jpeg,
            encode_jpeg_lossless,
        )

        rng = np.random.RandomState(13)
        img = rng.randint(0, 256, size=(10, 7)).astype(np.int64)
        back = decode_jpeg(
            encode_jpeg_lossless(img, predictor=1, point_transform=2)
        )
        # decoder's inverse point transform is a left shift: low bits drop
        assert (back == (img >> 2) << 2).all()
        # restart intervals, including ones that land mid-row (7 is
        # coprime to the width): each interval re-enters the
        # first-line predictor state on both sides
        for ri in (1, 3, 5, 13):
            payload = encode_jpeg_lossless(
                img, predictor=4, restart_interval=ri
            )
            assert (decode_jpeg(payload) == img).all(), f"restart {ri}"

    def test_lossless_decodes_foreign_huffman_table(self):
        # a hand-framed SOF3 stream using the Annex-K DC table (NOT
        # the flat 5-bit table our encoder writes) must decode — the
        # decoder's tables come from the stream's DHT, so third-party
        # lossless files work
        import struct

        from tafra_spark.functions._jpeg import (
            _BitWriter,
            _DC_BITS,
            _DC_VALS,
            _build_huffman,
            _dht_segment,
            decode_jpeg,
        )

        samples = [10, 200, 3, 3]
        tab = _build_huffman(_DC_BITS, _DC_VALS)
        wr = _BitWriter()
        pred = 128  # default 2^(8-1) for the first sample
        for s in samples:
            diff = (s - pred) & 0xFFFF
            if diff > 32768:
                diff -= 65536
            size = (diff if diff >= 0 else -diff).bit_length()
            code, length = tab[size]
            wr.write(code, length)
            if size:
                amp = diff if diff >= 0 else diff + (1 << size) - 1
                wr.write(amp, size)
            pred = s  # predictor 1 (first line)
        payload = bytearray(b"\xff\xd8")
        sof = bytes([8]) + struct.pack(">HH", 1, 4) + bytes([1, 1, 0x11, 0])
        payload += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
        payload += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
        sos = bytes([1, 1, 0x00, 1, 0, 0])  # predictor 1, Pt 0
        payload += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        payload += wr.flush() + b"\xff\xd9"
        back = decode_jpeg(bytes(payload))
        assert back.shape == (1, 4)
        assert back.tolist() == [samples]

    def test_12bit_block_constant_roundtrips_exactly(self):
        from tafra_spark.functions._jpeg import (
            decode_jpeg,
            encode_jpeg_gray12,
        )

        img = np.zeros((16, 16), dtype=np.int64)
        for k, v in enumerate([100, 2000, 3000, 4095]):
            img[(k // 2) * 8 : (k // 2) * 8 + 8,
                (k % 2) * 8 : (k % 2) * 8 + 8] = v
        back = decode_jpeg(encode_jpeg_gray12(img, quality=90))
        assert back.dtype == np.uint16
        assert (back == img).all()

    def test_12bit_noise_roundtrip_bounded_error(self):
        from tafra_spark.functions._jpeg import (
            decode_jpeg,
            encode_jpeg_gray12,
        )

        rng = np.random.RandomState(14)
        img = rng.randint(0, 4096, size=(24, 17)).astype(np.int64)
        back = decode_jpeg(encode_jpeg_gray12(img, quality=95))
        assert back.shape == img.shape
        # q95 steps on a 12-bit range: noise stays within a small band
        assert int(np.abs(back.astype(int) - img).max()) <= 64

    def test_rejects_non_huffman_processes(self):
        from tafra_spark.functions._jpeg import decode_jpeg

        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg")
        # arithmetic-coded SOF9 stream (lossless SOF3 decodes as of r9)
        sof9 = b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        with pytest.raises(NotImplementedError):
            decode_jpeg(sof9)
        # 12-bit is sequential-only: SOF0/SOF2 at 12-bit still raise
        sof0_12 = (
            b"\xff\xd8\xff\xc0\x00\x0b\x0c\x00\x08\x00\x08\x01\x01\x11\x00"
        )
        with pytest.raises(NotImplementedError):
            decode_jpeg(sof0_12)

    def test_jpeg_through_pipeline(self, spark, monkeypatch):
        # real JPEG bytes through the Arrow-batched decode stage, no PIL
        from tafra_spark.functions._jpeg import encode_jpeg_gray

        monkeypatch.setattr(M, "_HAS_PIL", False)
        img = np.full((8, 8), 77, dtype=np.uint8)
        rows = [
            (0, "image", encode_jpeg_gray(img, quality=95),
             (8, 8, None, "image/jpeg"))
        ]
        df = spark.createDataFrame(rows, schema=M.MULTIMODAL_SCHEMA)
        out = M.decode_images(df).collect()
        assert len(out) == 1
        assert out[0]["width"] == 8 and out[0]["height"] == 8
        assert out[0]["mean_intensity"] == pytest.approx(77.0, abs=1.0)

    def test_extreme_checkerboard_at_quality_100(self):
        # max-amplitude alternating blocks at quant step 1: AC
        # coefficients reach the +-1024 boundary; the encoder must
        # clamp to baseline's 10-bit amplitude ceiling, not crash
        from tafra_spark.functions._jpeg import decode_jpeg, encode_jpeg_gray

        img = np.zeros((16, 16), dtype=np.uint8)
        img[::2, ::2] = 255
        img[1::2, 1::2] = 255
        back = decode_jpeg(encode_jpeg_gray(img, quality=100))
        assert back.shape == img.shape
        # clamping costs a little energy; the pattern survives broadly
        assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 96

    def test_420_round_trip_constant_tiles(self):
        # r7: 4:2:0 MCU interleave (4 Y + 1 Cb + 1 Cr per 16x16). Color
        # constant per MCU -> chroma blocks are constant after 2x2 box
        # subsampling; at quality 100 (quant step 1) the only error is
        # the float YCbCr transform rounding (<=1 code value)
        from tafra_spark.functions._jpeg import decode_jpeg, encode_jpeg_rgb

        img = np.zeros((32, 48, 3), dtype=np.uint8)
        for ty in range(2):
            for tx in range(3):
                img[ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16] = (
                    30 + ty * 80,
                    40 + tx * 60,
                    90,
                )
        back = decode_jpeg(encode_jpeg_rgb(img, 100, subsampling="4:2:0"))
        assert back.shape == img.shape
        assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 1

    def test_420_and_422_smooth_bounded(self):
        # smooth random color at odd (non-MCU-multiple) dims: subsampled
        # round trip stays within a loose perceptual bound and the crop
        # geometry is exact
        from tafra_spark.functions._jpeg import decode_jpeg, encode_jpeg_rgb

        rng = np.random.RandomState(11)
        img = np.clip(rng.randn(19, 27, 3) * 6 + 120, 0, 255).astype(
            np.uint8
        )
        for sub in ("4:2:0", "4:2:2"):
            back = decode_jpeg(encode_jpeg_rgb(img, 95, subsampling=sub))
            assert back.shape == img.shape, sub
            err = np.abs(back.astype(int) - img.astype(int)).max()
            assert err <= 40, (sub, err)

    def test_420_neutral_tiles_exact(self):
        # the oracle contract of multimodal_jpeg420_decode: r=g=b tiles
        # give Y=v and Cb=Cr=128 exactly, so the decode (and luminance)
        # is bit-exact despite subsampling
        from tafra_spark.functions._jpeg import (
            decode_jpeg,
            decode_jpeg_gray,
            encode_jpeg_rgb,
        )

        v = [(12345 * 31 + k * 57) % 256 for k in range(4)]
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:8, :8] = v[0]
        img[:8, 8:] = v[1]
        img[8:, :8] = v[2]
        img[8:, 8:] = v[3]
        payload = encode_jpeg_rgb(img, quality=90, subsampling="4:2:0")
        assert np.array_equal(decode_jpeg(payload), img)
        lum = decode_jpeg_gray(payload)
        assert np.array_equal(lum, img[:, :, 0])

    def test_foreign_420_two_table_stream(self):
        # a camera-style stream our encoder never writes: separate
        # luma/chroma Huffman table ids (DC0/AC0 vs DC1/AC1) and both
        # quant tables — the decoder must honor the SOS table mapping,
        # not assume table 0 (tables ride in the stream)
        import struct as _struct

        from tafra_spark.functions import _jpeg as J

        h = w = 16
        y_plane = np.zeros((16, 16))
        y_plane[:8, :8] = 40.0 - 128.0
        y_plane[:8, 8:] = 90.0 - 128.0
        y_plane[8:, :8] = 140.0 - 128.0
        y_plane[8:, 8:] = 190.0 - 128.0
        cb = np.zeros((8, 8))  # neutral chroma, subsampled resolution
        cr = np.zeros((8, 8))
        qs = [
            J._quality_scale(J._Q_LUM, 90),
            J._quality_scale(J._Q_CHR, 90),
        ]
        dc = J._build_huffman(J._DC_BITS, J._DC_VALS)
        ac = J._build_huffman(J._AC_BITS, J._AC_VALS)
        out = bytearray(b"\xff\xd8")
        out += J._dqt_segment(0, qs[0]) + J._dqt_segment(1, qs[1])
        sof = bytes([8]) + _struct.pack(">HH", h, w) + bytes([3])
        sof += bytes([1, 0x22, 0])  # Y: 2x2, quant 0
        sof += bytes([2, 0x11, 1])  # Cb: 1x1, quant 1
        sof += bytes([3, 0x11, 1])  # Cr: 1x1, quant 1
        out += b"\xff\xc0" + _struct.pack(">H", 2 + len(sof)) + sof
        # DUPLICATE table definitions under ids 0 AND 1
        for tid in (0, 1):
            out += J._dht_segment(0, tid, J._DC_BITS, J._DC_VALS)
            out += J._dht_segment(1, tid, J._AC_BITS, J._AC_VALS)
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
        out += b"\xff\xda" + _struct.pack(">H", 2 + len(sos)) + sos
        wr = J._BitWriter()
        dc_prev = [0, 0, 0]
        # one MCU: 4 Y blocks (row-major) then Cb, Cr
        for byi in range(2):
            for bxi in range(2):
                blk = y_plane[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8]
                coef = J._C @ blk @ J._C.T
                quant = np.round(coef / qs[0]).astype(np.int64)
                dc_prev[0] = J._encode_block(wr, quant, dc_prev[0], dc, ac)
        for ci, plane in ((1, cb), (2, cr)):
            coef = J._C @ plane @ J._C.T
            quant = np.round(coef / qs[1]).astype(np.int64)
            dc_prev[ci] = J._encode_block(wr, quant, dc_prev[ci], dc, ac)
        out += wr.flush() + b"\xff\xd9"
        back = J.decode_jpeg(bytes(out))
        assert back.shape == (16, 16, 3)
        exp = np.zeros((16, 16), dtype=int)
        exp[:8, :8], exp[:8, 8:], exp[8:, :8], exp[8:, 8:] = 40, 90, 140, 190
        for c in range(3):  # neutral chroma -> r=g=b=Y
            assert np.array_equal(back[:, :, c].astype(int), exp), c

    def test_progressive_equals_baseline(self):
        # r7: SOF2 spectral-selection decode — scans accumulate the
        # same coefficients, so the decode is bit-identical to the
        # baseline encoding of the same pixels (gray, 4:4:4, 4:2:0)
        from tafra_spark.functions._jpeg import (
            decode_jpeg,
            encode_jpeg_gray,
            encode_jpeg_gray_progressive,
            encode_jpeg_rgb,
            encode_jpeg_rgb_progressive,
        )

        rng = np.random.RandomState(9)
        img = np.clip(rng.randn(21, 34) * 25 + 128, 0, 255).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_gray_progressive(img, 85)),
            decode_jpeg(encode_jpeg_gray(img, 85)),
        )
        rgb = np.clip(rng.randn(17, 23, 3) * 15 + 120, 0, 255).astype(
            np.uint8
        )
        for sub in ("4:4:4", "4:2:0", "4:2:2"):
            assert np.array_equal(
                decode_jpeg(
                    encode_jpeg_rgb_progressive(rgb, 85, subsampling=sub)
                ),
                decode_jpeg(encode_jpeg_rgb(rgb, 85, subsampling=sub)),
            ), sub

    def _prog_headers(self, J, h, w):
        import struct as _struct

        q1 = np.ones((8, 8), dtype=np.int64)
        out = bytearray(b"\xff\xd8")
        out += J._dqt_segment(0, q1)
        sof = bytes([8]) + _struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
        out += b"\xff\xc2" + _struct.pack(">H", 2 + len(sof)) + sof
        out += J._dht_segment(0, 0, J._DC_BITS, J._DC_VALS)
        out += J._dht_segment(1, 0, J._AC_BITS, J._AC_VALS)
        return out

    def test_progressive_successive_approximation_hand_rolled(self):
        # 8x8 gray, quant all-ones, target coefficients DC=48, zz[1]=5.
        # Four scans: DC first at Al=1 (diff 24), AC first at Al=1
        # (zz[1] -> 2), DC refinement bit 0, AC refinement (EOB + one
        # correction bit). Decoder must reassemble 48 and 5 exactly.
        import struct as _struct

        from tafra_spark.functions import _jpeg as J

        out = self._prog_headers(J, 8, 8)
        dc = J._build_huffman(J._DC_BITS, J._DC_VALS)
        ac = J._build_huffman(J._AC_BITS, J._AC_VALS)

        def sos(ss, se, ah, al):
            body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
            return b"\xff\xda" + _struct.pack(">H", 2 + len(body)) + body

        # scan 1: DC first, Al=1 -> diff = 48>>1 = 24, category 5
        out += sos(0, 0, 0, 1)
        wr = J._BitWriter()
        code, ln = dc[5]
        wr.write(code, ln)
        wr.write(24, 5)
        out += wr.flush()
        # scan 2: AC first 1..63, Al=1 -> zz[1] = 5>>1 = 2: (run0,size2)
        out += sos(1, 63, 0, 1)
        wr = J._BitWriter()
        code, ln = ac[0x02]
        wr.write(code, ln)
        wr.write(2, 2)
        code, ln = ac[0x00]  # EOB
        wr.write(code, ln)
        out += wr.flush()
        # scan 3: DC refinement Ah=1, Al=0 -> bit (48 & 1) = 0
        out += sos(0, 0, 1, 0)
        wr = J._BitWriter()
        wr.write(0, 1)
        out += wr.flush()
        # scan 4: AC refinement Ah=1, Al=0 -> EOB(run 1) + correction
        # bit 1 for zz[1] (5 = (2<<1) + 1)
        out += sos(1, 63, 1, 0)
        wr = J._BitWriter()
        code, ln = ac[0x00]
        wr.write(code, ln)
        wr.write(1, 1)
        out += wr.flush()
        out += b"\xff\xd9"
        got = J.decode_jpeg(bytes(out))
        blk = np.zeros(64, dtype=np.int64)
        blk[J._ZIGZAG[0]] = 48
        blk[J._ZIGZAG[1]] = 5
        pix = J._C.T @ blk.reshape(8, 8).astype(float) @ J._C + 128.0
        exp = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        assert np.array_equal(got, exp)

    def test_progressive_multi_block_eob_run(self):
        # 16x8 gray: an AC first scan coding an EOB RUN of 2 (symbol
        # 0x10 + one extension bit 0) must zero the AC band of BOTH
        # blocks; DC values 40 and 120 arrive via a normal DC scan
        import struct as _struct

        from tafra_spark.functions import _jpeg as J

        out = self._prog_headers(J, 8, 16)
        dc = J._build_huffman(J._DC_BITS, J._DC_VALS)
        # our canonical AC table has no EOBn symbols (they only exist
        # in progressive streams); declare a custom AC table id 1
        # carrying 0x10 — the decoder must honor the STREAM's tables
        ac_bits = [0, 3] + [0] * 14
        ac_vals = [0x00, 0x10, 0x01]
        out += J._dht_segment(1, 1, ac_bits, ac_vals)
        ac = J._build_huffman(ac_bits, ac_vals)

        def sos(ss, se, ah, al, ac_id=0):
            body = bytes([1, 1, ac_id, ss, se, (ah << 4) | al])
            return b"\xff\xda" + _struct.pack(">H", 2 + len(body)) + body

        out += sos(0, 0, 0, 0)
        wr = J._BitWriter()
        for diff in (40, 80):  # preds: 0 -> 40 -> 120
            size = J._category(diff)
            code, ln = dc[size]
            wr.write(code, ln)
            wr.write(diff, size)
        out += wr.flush()
        out += sos(1, 63, 0, 0, ac_id=1)
        wr = J._BitWriter()
        code, ln = ac[0x10]  # EOBn with r=1: run = 2 + ext bit
        wr.write(code, ln)
        wr.write(0, 1)
        out += wr.flush()
        out += b"\xff\xd9"
        got = J.decode_jpeg(bytes(out))
        assert got.shape == (8, 16)
        exp = np.zeros((8, 16))
        exp[:, :8] = np.round(40 / 8 + 128)
        exp[:, 8:] = np.round(120 / 8 + 128)
        assert np.array_equal(got, exp.astype(np.uint8))

    def test_truncated_and_corrupt_streams_fail_clean(self):
        # every truncation point and a byte-flip sweep must raise
        # ValueError/NotImplementedError — never IndexError or a hang
        from tafra_spark.functions._jpeg import decode_jpeg, encode_jpeg_rgb

        rng = np.random.RandomState(3)
        img = np.clip(rng.randn(16, 16, 3) * 9 + 128, 0, 255).astype(
            np.uint8
        )
        payload = encode_jpeg_rgb(img, 90, subsampling="4:2:0")
        for cut in range(2, len(payload), 7):
            try:
                decode_jpeg(payload[:cut])
            except (ValueError, NotImplementedError):
                pass
        for pos in range(2, min(len(payload), 120)):
            flipped = bytearray(payload)
            flipped[pos] ^= 0xFF
            try:
                decode_jpeg(bytes(flipped))
            except (ValueError, NotImplementedError):
                pass


class TestGiniConcentration:
    def test_hand_computed(self, spark):
        from tafra_spark.functions.analytics import gini_concentration

        # group a: values 1,1,2,4  (sorted): 2*Sum(i*xi)=2*(1+2+6+16)=50
        # S=8, n=4 -> G = (50 - 5*8)/(4*8) = 10/32 = 0.3125
        rows = [("a", 1), ("a", 1), ("a", 2), ("a", 4),
                ("b", 5), ("b", 5)]  # uniform -> 0
        df = spark.createDataFrame(rows, ["source", "n_chars"])
        out = {r["source"]: r for r in gini_concentration(df).collect()}
        assert out["a"]["n"] == 4 and out["a"]["total"] == 8
        assert out["a"]["gini_q6"] == 312_500
        assert out["b"]["gini_q6"] == 0

    def test_extreme_concentration(self, spark):
        from tafra_spark.functions.analytics import gini_concentration

        # one doc owns everything: G -> (n-1)/n
        rows = [("a", 0)] * 9 + [("a", 1000)]
        df = spark.createDataFrame(rows, ["source", "n_chars"])
        out = gini_concentration(df).collect()[0]
        assert out["gini_q6"] == 900_000  # (10-1)/10

    def test_zero_total_null(self, spark):
        from tafra_spark.functions.analytics import gini_concentration

        df = spark.createDataFrame([("a", 0), ("a", 0)], ["source", "n_chars"])
        assert gini_concentration(df).collect()[0]["gini_q6"] is None


class TestPngAdam7:
    """r8: Adam7-interlaced decode — the last PNG decode fence
    (VERDICT r7 item 7)."""

    def test_gray_and_rgb_roundtrip_all_shapes(self):
        # every Adam7 edge class: 1x1 (six empty passes), shapes below
        # 8 in one/both dims (partial passes), exact multiples of 8
        from tafra_spark.functions._png import (
            decode_png,
            encode_png_gray,
            encode_png_rgb,
        )

        rng = np.random.RandomState(11)
        for h, w in [(1, 1), (7, 5), (3, 9), (8, 8), (16, 16), (13, 21)]:
            g = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
            assert (decode_png(encode_png_gray(g, interlace=True)) == g).all()
            c = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert (decode_png(encode_png_rgb(c, interlace=True)) == c).all()

    def test_interlaced_equals_sequential(self):
        from tafra_spark.functions._png import decode_png, encode_png_rgb

        rng = np.random.RandomState(12)
        img = rng.randint(0, 256, size=(10, 14, 3), dtype=np.uint8)
        a = decode_png(encode_png_rgb(img, interlace=False))
        b = decode_png(encode_png_rgb(img, interlace=True))
        assert (a == b).all()

    def test_adam7_with_nonzero_filters_per_pass(self):
        # filters apply WITHIN each pass independently (RFC 2083 §6.2);
        # hand-filter each sub-image with a different filter type
        import struct
        import zlib

        from tafra_spark.functions import _png

        rng = np.random.RandomState(13)
        img = rng.randint(0, 256, size=(11, 9), dtype=np.uint8)
        raw = bytearray()
        for pi, (x0, y0, dx, dy) in enumerate(_png._ADAM7):
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ftype = [0, 1, 2, 3, 4, 1, 2][pi]
            prev = np.zeros(sub.shape[1], dtype=np.int32)
            for y in range(sub.shape[0]):
                cur = sub[y].astype(np.int32)
                line = np.zeros(sub.shape[1], dtype=np.int32)
                for x in range(sub.shape[1]):
                    left = int(cur[x - 1]) if x else 0
                    up = int(prev[x])
                    ul = int(prev[x - 1]) if x else 0
                    pred = {
                        0: 0,
                        1: left,
                        2: up,
                        3: (left + up) >> 1,
                        4: _png._paeth(left, up, ul),
                    }[ftype]
                    line[x] = (int(cur[x]) - pred) & 0xFF
                raw.append(ftype)
                raw.extend(int(v) for v in line)
                prev = cur
        ihdr = struct.pack(">IIBBBBB", 9, 11, 8, 0, 0, 0, 1)
        blob = (
            _png._SIGNATURE
            + _png._chunk(b"IHDR", ihdr)
            + _png._chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png._chunk(b"IEND", b"")
        )
        assert (_png.decode_png(blob) == img).all()

    def test_paletted_adam7(self):
        import struct
        import zlib

        from tafra_spark.functions import _png

        rng = np.random.RandomState(14)
        idx = rng.randint(0, 3, size=(6, 7), dtype=np.uint8)
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        raw = bytearray()
        for x0, y0, dx, dy in _png._ADAM7:
            sub = idx[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for y in range(sub.shape[0]):
                raw.append(0)
                raw.extend(sub[y].tobytes())
        ihdr = struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 1)
        blob = (
            _png._SIGNATURE
            + _png._chunk(b"IHDR", ihdr)
            + _png._chunk(b"PLTE", plte)
            + _png._chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png._chunk(b"IEND", b"")
        )
        want = np.frombuffer(plte, np.uint8).reshape(3, 3)[idx]
        assert (_png.decode_png(blob) == want).all()

    def test_truncated_interlaced_raises(self):
        import pytest as _pytest

        from tafra_spark.functions._png import decode_png, encode_png_gray

        rng = np.random.RandomState(15)
        img = rng.randint(0, 256, size=(12, 12), dtype=np.uint8)
        blob = encode_png_gray(img, interlace=True)
        # drop IDAT bytes: re-deflate a truncated raw stream
        import struct
        import zlib

        from tafra_spark.functions import _png

        raw = _png._raw_scanlines(img, True)
        short = (
            _png._SIGNATURE
            + _png._chunk(
                b"IHDR", struct.pack(">IIBBBBB", 12, 12, 8, 0, 0, 0, 1)
            )
            + _png._chunk(b"IDAT", zlib.compress(raw[:-40]))
            + _png._chunk(b"IEND", b"")
        )
        with _pytest.raises(ValueError):
            decode_png(short)
        # and extra trailing bytes must also fail, not be ignored
        long = (
            _png._SIGNATURE
            + _png._chunk(
                b"IHDR", struct.pack(">IIBBBBB", 12, 12, 8, 0, 0, 0, 1)
            )
            + _png._chunk(b"IDAT", zlib.compress(raw + b"\x00" * 9))
            + _png._chunk(b"IEND", b"")
        )
        with _pytest.raises(ValueError):
            decode_png(long)
        assert (decode_png(blob) == img).all()


class TestPngExtendedDecode:
    """r7: paletted (PLTE/tRNS), sub-byte gray, and 16-bit decode."""

    def _png(self, ihdr_args, chunks, rows):
        import struct as _struct
        import zlib as _zlib

        from tafra_spark.functions._png import _SIGNATURE, _chunk

        ihdr = _struct.pack(">IIBBBBB", *ihdr_args)
        raw = b"".join(b"\x00" + r for r in rows)
        out = _SIGNATURE + _chunk(b"IHDR", ihdr)
        for t, d in chunks:
            out += _chunk(t, d)
        return out + _chunk(b"IDAT", _zlib.compress(raw)) + _chunk(b"IEND", b"")

    _PLTE = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])

    def test_paletted_8bit(self):
        from tafra_spark.functions._png import decode_png

        rows = [bytes([0, 1, 2, 1]), bytes([2, 2, 0, 0])]
        arr = decode_png(
            self._png((4, 2, 8, 3, 0, 0, 0), [(b"PLTE", self._PLTE)], rows)
        )
        assert arr.shape == (2, 4, 3)
        assert arr[0, 0].tolist() == [255, 0, 0]
        assert arr[0, 2].tolist() == [0, 0, 255]

    def test_paletted_trns_alpha(self):
        from tafra_spark.functions._png import decode_png

        rows = [bytes([0, 1, 2, 1])]
        arr = decode_png(
            self._png(
                (4, 1, 8, 3, 0, 0, 0),
                [(b"PLTE", self._PLTE), (b"tRNS", bytes([10, 20]))],
                rows,
            )
        )
        assert arr.shape == (1, 4, 4)
        assert arr[0, 0, 3] == 10  # tRNS entry
        assert arr[0, 2, 3] == 255  # past tRNS end -> opaque

    def test_paletted_4bit_packed(self):
        from tafra_spark.functions._png import decode_png

        # width 5, indices 0,1,2,1,0 packed two-per-byte + pad
        arr = decode_png(
            self._png(
                (5, 1, 4, 3, 0, 0, 0),
                [(b"PLTE", self._PLTE)],
                [bytes([0x01, 0x21, 0x00])],
            )
        )
        assert [tuple(arr[0, i]) for i in range(5)] == [
            (255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 255, 0), (255, 0, 0),
        ]

    def test_gray_1bit_scales_to_full_range(self):
        from tafra_spark.functions._png import decode_png

        arr = decode_png(
            self._png((10, 1, 1, 0, 0, 0, 0), [], [bytes([0xCC, 0xC0])])
        )
        assert arr[0].tolist() == [255, 255, 0, 0, 255, 255, 0, 0, 255, 255]

    def test_16bit_gray_and_rgb_keep_high_byte(self):
        import struct as _struct

        from tafra_spark.functions._png import decode_png

        g16 = self._png(
            (3, 1, 16, 0, 0, 0, 0),
            [],
            [_struct.pack(">HHH", 0x1234, 0xFF00, 0x0080)],
        )
        assert decode_png(g16)[0].tolist() == [0x12, 0xFF, 0x00]
        rgb16 = self._png(
            (2, 1, 16, 2, 0, 0, 0),
            [],
            [_struct.pack(">HHHHHH", 0xFF00, 0, 0, 0, 0x8000, 0)],
        )
        assert decode_png(rgb16)[0].tolist() == [[255, 0, 0], [0, 128, 0]]

    def test_missing_plte_and_interlace_fences(self):
        from tafra_spark.functions._png import decode_png

        with pytest.raises(ValueError):
            decode_png(self._png((2, 1, 8, 3, 0, 0, 0), [], [bytes([0, 1])]))
        # Adam7 (interlace=1) decodes since r8; an ILLEGAL interlace
        # value still fences, and a sequential-layout payload declared
        # as Adam7 fails the per-pass length check cleanly
        with pytest.raises(NotImplementedError):
            decode_png(
                self._png((2, 1, 8, 0, 0, 0, 2), [], [bytes([0, 1])])
            )
        with pytest.raises(ValueError):
            decode_png(
                self._png((2, 1, 8, 0, 0, 0, 1), [], [bytes([0, 1])])
            )


class TestC4LineFilter:
    """r9: C4-style line-level quality filtering (pipeline.c4_line_filter)."""

    def _df(self, spark, text):
        return spark.createDataFrame([(1, text)], "doc_id long, text string")

    def test_c4_rules(self, spark):
        from tafra_spark.functions.pipeline import c4_line_filter

        text = "\n".join(
            [
                "This sentence has enough words to survive.",
                "Short line.",                          # <5 words
                "Home About Contact Products News",     # no terminal punct
                "Please enable JavaScript to view this page.",  # blocklist
                "This website uses cookies to improve the experience.",
                "A second good sentence rounds out the document!",
                'He said "quoted endings also count as terminal."',
            ]
        )
        out = c4_line_filter(self._df(spark, text)).first()
        assert out["n_lines"] == 7
        assert out["n_kept"] == 3
        assert out["c4_pass"] is True
        assert out["c4_text"].split("\n") == [
            "This sentence has enough words to survive.",
            "A second good sentence rounds out the document!",
            'He said "quoted endings also count as terminal."',
        ]

    def test_doc_level_drops(self, spark):
        from tafra_spark.functions.pipeline import c4_line_filter

        good = "\n".join(
            ["A fine sentence with plenty of words here."] * 3
        )
        # lorem ipsum anywhere drops the DOC (lines may still survive)
        out = c4_line_filter(
            self._df(spark, good + "\nLorem ipsum dolor sit amet text.")
        ).first()
        assert out["n_kept"] == 4 and out["c4_pass"] is False
        # curly brace drops the doc
        out = c4_line_filter(
            self._df(spark, good + "\nfunction f() { return 1; }")
        ).first()
        assert out["c4_pass"] is False
        # fewer than min_lines survivors drops the doc
        out = c4_line_filter(
            self._df(spark, "Only one good sentence is not enough.")
        ).first()
        assert out["n_kept"] == 1 and out["c4_pass"] is False
        # brace_filter off keeps the brace doc
        out = c4_line_filter(
            self._df(spark, good + "\n{x}"), brace_filter=False
        ).first()
        assert out["c4_pass"] is True

    def test_sql_mirror_parity(self, spark):
        import duckdb

        from tafra_spark.functions.pipeline import (
            c4_line_filter,
            c4_line_filter_sql,
        )

        texts = [
            "Good long sentence number one stands alone.\nBad\nAnother "
            "proper sentence follows here today.\nAnd a third one "
            "completes the quorum nicely.",
            "All rights reserved.\nShort.\nNothing survives here",
            "",
            "Lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
            "Three more good lines would still not save this page.\n"
            "Because the lorem ipsum phrase poisons the document.\n"
            "Even though individual lines look perfectly fine.",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, text string"
        )
        got = {
            r["i"]: (r["c4_text"], r["n_lines"], r["n_kept"], r["c4_pass"])
            for r in c4_line_filter(df).collect()
        }
        con = duckdb.connect()
        frag = c4_line_filter_sql("$1")
        for i, t in enumerate(texts):
            w = con.execute(
                f"SELECT {frag['c4_text']}, {frag['n_lines']},"
                f" {frag['n_kept']}, {frag['c4_pass']}",
                [t],
            ).fetchone()
            assert got[i] == tuple(w), (i, got[i], w)


class TestLineDedupRewrite:
    """r9: intra-document line dedup (pipeline.line_dedup_rewrite)."""

    def test_first_occurrence_kept_in_order(self, spark):
        from tafra_spark.functions.pipeline import line_dedup_rewrite

        text = "banner\nsection one\nbanner\nsection two\nbanner\nend"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = line_dedup_rewrite(df).first()
        assert out["dedup_text"] == "banner\nsection one\nsection two\nend"
        assert out["n_dup_lines"] == 2

    def test_sql_mirror_parity(self, spark):
        import duckdb

        from tafra_spark.functions.pipeline import (
            line_dedup_rewrite,
            line_dedup_sql,
        )

        texts = [
            "a\nb\na\nc\nb",
            "only one line",
            "",
            "x\nx\nx\nx",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, text string"
        )
        got = {
            r["i"]: (r["dedup_text"], r["n_dup_lines"])
            for r in line_dedup_rewrite(df).collect()
        }
        con = duckdb.connect()
        frag = line_dedup_sql("$1")
        for i, t in enumerate(texts):
            w = con.execute(
                f"SELECT {frag['dedup_text']}, {frag['n_dup_lines']}", [t]
            ).fetchone()
            assert got[i] == tuple(w), (i, got[i], w)


class TestGopherQuality:
    """r9: Gopher Table-A1 quality rules (pipeline.gopher_quality_flags)."""

    def _one(self, spark, text, **kw):
        from tafra_spark.functions.pipeline import gopher_quality_flags

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return gopher_quality_flags(df, **kw).first()

    def test_good_document_passes(self, spark):
        good = " ".join(
            "the quick brown fox jumps over that lazy dog and friends"
            .split()
        )
        text = "\n".join([good + " be with of have to today."] * 6)
        r = self._one(spark, text)
        assert r["gopher_pass"] is True
        assert r["stop_hits"] >= 2 and r["alpha_frac_q4"] == 10000

    def test_each_rule_fires(self, spark):
        base_line = (
            "the quick brown fox jumps over that lazy dog and the crew "
            "have been with many of those friendly forest animals today"
        )
        base = "\n".join([base_line] * 5)
        # too few words
        assert self._one(spark, "the of and.")["gopher_pass"] is False
        # symbol ratio: flood with hashes
        r = self._one(spark, base + "\n" + "# " * 80)
        assert r["symbol_ratio_q4"] >= 1000 and r["gopher_pass"] is False
        # bullet lines >= 90%
        bullets = "\n".join(["- the item of note"] * 50)
        r = self._one(spark, bullets)
        assert r["bullet_frac_q4"] >= 9000 and r["gopher_pass"] is False
        # ellipsis endings >= 30%
        ell = "\n".join([base_line, base_line + "...", base_line + "…"])
        r = self._one(spark, ell)
        assert r["ellipsis_frac_q4"] >= 3000
        # alphabetic-word fraction <= 80%
        nums = base + "\n" + " ".join(["12345"] * 60)
        r = self._one(spark, nums)
        assert r["alpha_frac_q4"] <= 8000 and r["gopher_pass"] is False
        # stopword floor
        r = self._one(spark, "\n".join(["lorem dolor sit amet words"] * 20))
        assert r["stop_hits"] < 2 and r["gopher_pass"] is False
        # mean word length out of bounds (all 1-char words)
        r = self._one(spark, " ".join(["a"] * 80))
        assert r["mean_word_len_q4"] < 30000 and r["gopher_pass"] is False

    def test_sql_mirror_parity(self, spark):
        import duckdb

        from tafra_spark.functions.pipeline import (
            gopher_quality_flags,
            gopher_quality_sql,
        )

        texts = [
            "the quick brown fox jumps over that lazy dog of mine.",
            "- bullet one\n- bullet two\nplain line with the usual end.",
            "dots... and more dots...\nhash # tags # here\n",
            "",
            " ".join(["of the and to be"] * 30),
        ]
        cols = [
            "n_words", "mean_word_len_q4", "symbol_ratio_q4",
            "bullet_frac_q4", "ellipsis_frac_q4", "alpha_frac_q4",
            "stop_hits", "gopher_pass",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, text string"
        )
        got = {
            r["i"]: tuple(r[c] for c in cols)
            for r in gopher_quality_flags(df).collect()
        }
        con = duckdb.connect()
        frag = gopher_quality_sql("$1")
        sel = ", ".join(frag[c] for c in cols)
        for i, t in enumerate(texts):
            w = con.execute(f"SELECT {sel}", [t]).fetchone()
            assert got[i] == tuple(w), (i, got[i], w)


class TestGopherReviewRegressions:
    """r9 second self-review findings, pinned."""

    def test_crlf_lines_mirror_exactly(self, spark):
        # Java's $ matches before a trailing \r, RE2's does not — the
        # \z anchors keep both engines identical on CRLF documents
        import duckdb

        from tafra_spark.functions.pipeline import (
            c4_line_filter,
            c4_line_filter_sql,
            gopher_quality_flags,
            gopher_quality_sql,
        )

        text = (
            "A proper sentence that ends with a period.\r\n"
            "Trailing dots make an ellipsis line...\r\n"
            "the quick brown fox of that lazy dog to be here.\r"
        )
        df = spark.createDataFrame([(1, text)], "i long, text string")
        g = gopher_quality_flags(df).first()
        c = c4_line_filter(df).first()
        con = duckdb.connect()
        gf = gopher_quality_sql("$1")
        cf = c4_line_filter_sql("$1")
        wg = con.execute(
            f"SELECT {gf['ellipsis_frac_q4']}, {gf['n_words']}", [text]
        ).fetchone()
        wc = con.execute(f"SELECT {cf['n_kept']}", [text]).fetchone()
        assert (g["ellipsis_frac_q4"], g["n_words"]) == tuple(wg)
        assert c["n_kept"] == wc[0]
        # and the \r-bearing lines specifically do NOT count as
        # terminal/ellipsis on either engine
        assert g["ellipsis_frac_q4"] == 0

    def test_boundary_documents_are_kept(self, spark):
        # Gopher removes docs ABOVE the bounds — a doc exactly AT 90%
        # bullet lines (9 of 10) survives
        from tafra_spark.functions.pipeline import gopher_quality_flags

        prose = (
            "the quick brown fox jumps over that lazy dog and the crew "
            "have been with many of those friendly forest animals today "
        ) * 2
        text = "\n".join(["- the bullet item of note"] * 9 + [prose])
        df = spark.createDataFrame([(1, text)], "i long, text string")
        r = gopher_quality_flags(df, min_words=10).first()
        assert r["bullet_frac_q4"] == 9000 and r["gopher_pass"] is True

    def test_book_length_doc_no_overflow(self, spark):
        # int32 size * 10000 overflowed (ANSI abort) at ~214k words
        from tafra_spark.functions.pipeline import gopher_quality_flags

        text = " ".join(["word"] * 220_000)
        df = spark.createDataFrame([(1, text)], "i long, text string")
        r = gopher_quality_flags(df).first()
        assert r["n_words"] == 220_000
        assert r["alpha_frac_q4"] == 10_000
        assert r["gopher_pass"] is False  # over the 100k word ceiling

    def test_url_port_crlf_mirror(self, spark):
        import duckdb

        from tafra_spark.sources.http import url_normalize, url_normalize_sql

        u = "http://h.com:80\r"
        df = spark.createDataFrame([(u,)], "url string")
        got = df.select(url_normalize("url").alias("n")).first()["n"]
        con = duckdb.connect()
        w = con.execute(
            f"SELECT {url_normalize_sql('$1')}", [u]
        ).fetchone()[0]
        assert got == w


def _py_bpe_bytes(words_freq, n_merges):
    """Byte-mode reference BPE: same greedy fold/tie-break as _py_bpe
    but over UTF-8 byte sequences spelled as uppercase hex pairs (the
    engine's byte-symbol convention)."""
    syms = {
        w: ["%02X" % b for b in w.encode("utf-8")] for w in words_freq
    }
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for w, f in words_freq.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = l + r
        merges.append((step, l, r, merged, cnt))
        for w in syms:
            s = syms[w]
            out = [s[0]] if s else []
            for x in s[1:]:
                if out and out[-1] == l and x == r:
                    out[-1] = merged
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


def _py_bpe_bytes_batched(words_freq, n_merges, batch):
    """Byte-mode reference for BATCHED BPE: the _py_bpe_batched
    schedule (static 2x rounds, dynamic caps, conservative disjoint
    top-W subset) over hex-pair symbols."""
    from tafra_spark.functions.text import bpe_select_batch

    top_window = max(4, 8 * batch)
    syms = {
        w: ["%02X" % b for b in w.encode("utf-8")] for w in words_freq
    }
    merges = []
    rounds = 2 * (-(-n_merges // batch))
    step = 0
    for _ in range(rounds):
        cap = min(batch, n_merges - step)
        if cap <= 0:
            break
        counts = {}
        for w, f in words_freq.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        top = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[:top_window]
        accepted = bpe_select_batch(
            [(l, r, c) for (l, r), c in top], cap
        )
        rules = {(l, r): m for l, r, m, _c in accepted}
        for step_off, (l, r, m, c) in enumerate(accepted, start=1):
            merges.append((step + step_off, l, r, m, c))
        step += len(accepted)
        for w in syms:
            s = syms[w]
            out = [s[0]] if s else []
            for x in s[1:]:
                if out and (out[-1], x) in rules:
                    out[-1] = rules[(out[-1], x)]
                else:
                    out.append(x)
            syms[w] = out
    return merges


class TestBpeEncodeBytes:
    TEXTS = [
        (1, "hello hello world 2024! café 你好"),
        (2, "hello world world n2024! привет"),
        (3, "MiXeD CaSe MiXeD"),
        (4, ""),
        (5, None),
        (6, "   "),
    ]

    def _words(self):
        words = {}
        for _, t in self.TEXTS:
            for w in (t or "").split():
                words[w] = words.get(w, 0) + 1
        return words

    def test_matches_reference_and_round_trips(self, spark):
        df = spark.createDataFrame(self.TEXTS, "doc_id long, text string")
        merges, syms = _py_bpe_bytes(self._words(), 6)
        piece_ids = {"%02X" % b: b for b in range(256)}
        for step, _l, _r, m, _c in merges:
            piece_ids.setdefault(m, 255 + step)
        pieces = {v: k for k, v in piece_ids.items()}
        out = {
            r["doc_id"]: r
            for r in TX.bpe_encode_bytes(df, n_merges=6).collect()
        }
        assert set(out) == {d for d, _ in self.TEXTS}
        for did, t in self.TEXTS:
            ws = (t or "").split()
            ids = [piece_ids[s] for w in ws for s in syms[w]]
            r = out[did]
            assert r["n_words"] == len(ws), did
            assert r["n_bytes"] == sum(
                len(w.encode("utf-8")) for w in ws
            ), did
            assert r["n_tokens"] == len(ids), did
            assert list(r["token_ids"]) == ids, did
            # byte fidelity: ids decode back to the exact word bytes
            raw = b"".join(
                bytes.fromhex(pieces[i]) for i in r["token_ids"]
            )
            assert raw == "".join(ws).encode("utf-8"), did

    def test_no_unk_everything_encodes(self, spark):
        # the point of byte fallback: digits, punctuation runs, CJK,
        # and mixed case all become real ids — nothing collapses
        df = spark.createDataFrame(
            [(1, "!!! 123 你好 CamelCase ---")],
            "doc_id long, text string",
        )
        r = TX.bpe_encode_bytes(df, n_merges=2).collect()[0]
        assert r["n_words"] == 5
        assert r["n_tokens"] > 0
        # every id is addressable in the 256+merges space
        assert all(0 <= i < 256 + 2 for i in r["token_ids"])

    def test_ascii_lowercase_corpus_mirrors_char_mode(self, spark):
        # on a pure [a-z]+ corpus the byte learner must pick the SAME
        # merge sequence as char mode, modulo the hex spelling (hex of
        # a-z is monotonic in char order, so tie-breaks agree too)
        texts = [(1, "banana bandana apple apple"), (2, "low lower lowest")]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        char_merges = TX.bpe_learn(df, n_merges=4).collect()
        from tafra_spark.functions.text import _bpe_state

        byte_merges, _ = _bpe_state(df, n_merges=4, alphabet="bytes")

        def hexify(s: str) -> str:
            return s.encode("utf-8").hex().upper()

        assert [
            (m["step"], hexify(m["left_sym"]), hexify(m["right_sym"]),
             m["pair_count"])
            for m in char_merges
        ] == [(s, l, r, c) for s, l, r, _m, c in byte_merges]

    def test_batched_byte_learner_matches_reference(self, spark):
        # batch>1 in byte mode: same disjoint-batch schedule as char
        # mode, over hex-pair symbols
        texts = [(1, "aa ab Aa 77 aa ab"), (2, "aa 77 ab aa")]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        words = {}
        for _, t in texts:
            for w in t.split():
                words[w] = words.get(w, 0) + 1
        from tafra_spark.functions.text import _bpe_state

        byte_merges, _ = _bpe_state(df, n_merges=4, batch=2,
                                    alphabet="bytes")
        ref_merges = _py_bpe_bytes_batched(words, 4, 2)
        assert [
            (s, l, r, c) for s, l, r, _m, c in byte_merges
        ] == [(s, l, r, c) for s, l, r, _m, c in ref_merges]

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            TX.bpe_encode_bytes(df, text_col="nope")
        with pytest.raises(ValueError):
            TX.bpe_encode_bytes(df, id_col="nope")
        from tafra_spark.functions.text import _bpe_state

        with pytest.raises(ValueError):
            _bpe_state(df, alphabet="words")


class TestLanguageIdV2:
    FIXTURES = [
        ("the cat sat with the dog and it was this fine day", "en"),
        ("der hund und die katze sind nicht auf dem tisch", "de"),
        ("le chien est dans le jardin pour une promenade", "fr"),
        ("el perro está muy contento pero sin una pelota", "es"),
        ("il cane che corre sono anche gli amici nel parco", "it"),
        ("o cão não está com os amigos você já foi também", "pt"),
        ("het is een mooie dag maar niet voor iedereen ook zijn", "nl"),
        ("bu bir güzel gün ve çok daha iyi için değil", "tr"),
        ("to jest nie tak jak się czy już który oraz", "pl"),
        ("och det är som att en inte av för med", "sv"),
        ("je to se že jsou byl však jako pro která", "cs"),
        ("și nu este cu din mai pentru care sunt să", "ro"),
        # r11 Latin additions (da/no/fi/hu/id/vi); da and no share most
        # real function words — each profile carries its DISTINGUISHING
        # set, so 'hvad' votes da while 'hva' votes no
        ("og hvad blev også sagt om hende efter hvis være muligt", "da"),
        ("ikke bare noen hva skal dere gjør nå mot dette", "no"),
        ("hän oli myös siellä mutta ei kun tämä ovat sekä", "fi"),
        ("és hogy nem egy az már csak vagy mint még", "hu"),
        ("yang dan tidak untuk dengan ini itu adalah akan pada", "id"),
        ("và của không là được có người những cho với", "vi"),
        # r12 Latin additions (ca/et/hr/lt/lv/sk — VERDICT r11 item 4);
        # cs/sk and hr distinguish on their profile sets like da/no
        ("els amics amb què però també aquest molt dels fins seva", "ca"),
        ("ja on ning kui oma mis aga või nagu siis", "et"),
        ("na od za ali kao što nije ima jer će", "hr"),
        ("yra kad bet kaip buvo labai gali metų apie dar", "lt"),
        ("ir ka ar par arī vai viņš pēc kas savu", "lv"),
        ("sa ako ktorý keď aj sú môže len ešte tiež", "sk"),
        ("привет как дела сегодня хороший день", "ru"),
        ("γεια σας καλημέρα τι κάνετε σήμερα", "el"),
        ("مرحبا كيف حالك اليوم جميل", "ar"),
        ("שלום מה שלומך היום יפה", "he"),
        ("नमस्ते आप कैसे हैं आज अच्छा दिन है", "hi"),
        ("今天天气很好我们去公园散步", "zh"),
        ("今日はいい天気ですね公園に行きましょう", "ja"),
        ("안녕하세요 오늘 날씨가 좋네요", "ko"),
        ("สวัสดีครับวันนี้อากาศดีมาก", "th"),
        # undetermined: empty / null / digits / unknown Latin words
        ("", "und"),
        (None, "und"),
        ("12345 !!! ???", "und"),
        ("xyzzy plugh quux", "und"),
        # mixed: a mostly-English doc quoting two Russian words stays
        # on the Latin path; a Russian doc with an ASCII token does not
        ("mostly english the and was that this with русских слов", "en"),
        ("привет хороший день сегодня ascii7", "ru"),
        # punctuation-wrapped and capitalized function words still hit
        ("The, dog. And this! That was?", "en"),
    ]

    def test_fixtures_and_sql_mirror(self, spark):
        import duckdb

        from tafra_spark.functions.text import (
            language_id_v2,
            language_id_v2_sql,
        )

        df = spark.createDataFrame(self.FIXTURES, "t string, exp string")
        got = df.select(
            "exp", language_id_v2(F.col("t")).alias("v2"), "t"
        ).collect()
        for r in got:
            assert r["v2"] == r["exp"], r["t"]
        con = duckdb.connect()
        mirror = language_id_v2_sql("t")
        for t, exp in self.FIXTURES:
            dv = con.execute(
                f"WITH d(t) AS (VALUES ($1)) SELECT {mirror} FROM d", [t]
            ).fetchone()[0]
            assert dv == exp, t

    def test_differential_vs_v1_on_non_latin(self, spark):
        # the r9 verdict's gap: v1 answers 'und' for every non-Latin
        # script (and for all but 4 of the Latin profiles); v2
        # resolves all. r12: this differential is the UNIT home of the
        # pred_v1 column the driver query used to carry (VERDICT r11
        # item 2a — the third full id pass left the headline query)
        from tafra_spark.functions.text import language_id, language_id_v2

        non_latin = [
            (t, e) for t, e in self.FIXTURES
            if e in ("ru", "el", "ar", "he", "hi", "zh", "ja", "ko", "th")
        ]
        df = spark.createDataFrame(non_latin, "t string, exp string")
        rows = df.select(
            "exp",
            language_id(F.col("t")).alias("v1"),
            language_id_v2(F.col("t")).alias("v2"),
        ).collect()
        assert all(r["v1"] == "und" for r in rows)
        assert all(r["v2"] == r["exp"] for r in rows)

    def test_differential_vs_v1_on_latin(self, spark):
        # v1's 4-language vote on every Latin fixture: right where its
        # list exists, 'und'/wrong elsewhere — v2 must get all 24
        from tafra_spark.functions.text import (
            _LANG_PROFILES,
            language_id,
            language_id_v2,
        )

        latin = list(
            {
                e: (t, e)
                for t, e in self.FIXTURES
                if e in _LANG_PROFILES and t
            }.values()
        )  # one canonical sentence per Latin language
        assert len(latin) == 24
        df = spark.createDataFrame(latin, "t string, exp string")
        rows = df.select(
            "exp",
            language_id(F.col("t")).alias("v1"),
            language_id_v2(F.col("t")).alias("v2"),
        ).collect()
        assert all(r["v2"] == r["exp"] for r in rows)
        v1_right = sum(1 for r in rows if r["v1"] == r["exp"])
        assert v1_right <= 4  # v1 only ever knew en/de/fr/es

    def test_profile_words_globally_unique(self):
        from tafra_spark.functions.text import _LANG_PROFILES

        words = [w for ws in _LANG_PROFILES.values() for w in ws]
        assert len(words) == len(set(words))
        assert len(_LANG_PROFILES) == 24

    def test_staged_plan_memo_serves_same_results(self, spark):
        # r12: with_language_id_v2 memoizes the BUILT PLAN (the
        # ~14k-py4j-call tree); execution must still run live and all
        # three paths must agree
        from tafra_spark.functions.text import with_language_id_v2

        df = spark.createDataFrame(
            [(i, t) for i, (t, _e) in enumerate(self.FIXTURES) if t],
            "doc_id long, t string",
        )
        a = sorted(
            with_language_id_v2(df, "t", "l", memo=True).collect(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            with_language_id_v2(df, "t", "l", memo=True).collect(),
            key=lambda r: r["doc_id"],
        )
        c = sorted(
            with_language_id_v2(df, "t", "l", memo=False).collect(),
            key=lambda r: r["doc_id"],
        )
        assert a == b == c
