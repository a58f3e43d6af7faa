"""Pretrained GPT-2-format tokenizer import + large-vocab encode (r11).

The encode contract (min-rank / leftmost one-at-a-time fuse) is tested
DIFFERENTIALLY against an independent reference that applies merges in
rank order, each to fixpoint — a different algorithm that provably
coincides on sequentially-valid merge tables, so a bug in either loop
shows up as a mismatch.
"""

from __future__ import annotations

import json

import pytest

from tafra_spark.functions.tokenizer import (
    PretrainedBPE,
    bpe_encode_pretrained,
    bytes_to_unicode,
    derive_gpt2_vocab,
    encode_word_hex,
    load_gpt2_tokenizer,
    parse_gpt2_merges,
    synthetic_gpt2_fixture,
)


def _ref_encode(word: str, merges) -> list[str]:
    """Independent reference: apply merges in RANK ORDER, each to
    fixpoint, left to right (the subword-nmt application order)."""
    syms = ["%02X" % b for b in word.encode("utf-8")]
    for l, r in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == l and syms[i + 1] == r:
                syms[i : i + 2] = [l + r]
            else:
                i += 1
    return syms


class TestGpt2Format:
    def test_bytes_to_unicode_bijective(self):
        m = bytes_to_unicode()
        assert len(m) == 256
        assert len(set(m.values())) == 256
        # printable latin-1 maps to itself; control bytes move up
        assert m[ord("a")] == "a"
        assert m[ord(" ")] != " " and not m[ord(" ")].isspace()
        assert m[0] != "\x00"

    def test_fixture_deterministic_and_32k(self):
        mt, vt = synthetic_gpt2_fixture(32768)
        mt2, vt2 = synthetic_gpt2_fixture(32768)
        assert (mt, vt) == (mt2, vt2)
        tok = load_gpt2_tokenizer(merges_text=mt, vocab_text=vt)
        assert len(tok.merges) == 32768
        assert len(tok.vocab) == 256 + 32768
        # shipped vocab == the id space the merge list implies
        assert load_gpt2_tokenizer(merges_text=mt).vocab == tok.vocab

    def test_hash_leading_merge_lines_are_data(self):
        # regression: '#' is a real byte in the GPT-2 alphabet — only
        # the first '#version' line is a header; dropping every
        # '#'-leading line loses merges and shifts all later ranks
        mt, _ = synthetic_gpt2_fixture(32768)
        merges = parse_gpt2_merges(mt)
        assert len(merges) == 32768
        hash_hex = "%02X" % ord("#")
        assert any(l.startswith(hash_hex) for l, _ in merges)

    def test_malformed_inputs_raise(self):
        with pytest.raises(ValueError):
            parse_gpt2_merges("#version: 0.2\na b c\n")
        with pytest.raises(ValueError):
            load_gpt2_tokenizer(merges_text="a b\na b\n")
        with pytest.raises(ValueError):
            load_gpt2_tokenizer()
        # vocab missing a merge's piece must fail at load, not encode
        with pytest.raises(ValueError):
            load_gpt2_tokenizer(
                merges_text="t h\n", vocab_text=json.dumps({"t": 0})
            )

    def test_sequential_validity(self):
        # every merge operand is a base byte or an earlier merge's
        # piece — the precondition for the one-at-a-time equivalence
        mt, _ = synthetic_gpt2_fixture(32768)
        merges = parse_gpt2_merges(mt)
        known = {"%02X" % b for b in range(256)}
        for l, r in merges:
            assert l in known and r in known, (l, r)
            known.add(l + r)


class TestEncodeWord:
    @pytest.fixture(scope="class")
    def tok(self) -> PretrainedBPE:
        mt, vt = synthetic_gpt2_fixture(32768)
        return load_gpt2_tokenizer(merges_text=mt, vocab_text=vt)

    def test_differential_vs_rank_order_reference(self, tok):
        import random

        rnd = random.Random(11)
        words = [
            "the", "that", "this", "query", "customer", "join2024",
            "привет", "café", "Naïve-Σ", "2024!", "a", "#97", "tok123",
            "x" * 30,
        ] + [
            "".join(
                rnd.choice("abcdefth#!0и") for _ in range(rnd.randint(1, 16))
            )
            for _ in range(150)
        ]
        for w in words:
            assert encode_word_hex(w, tok.ranks) == _ref_encode(
                w, tok.merges
            ), w

    def test_roundtrip_bytes(self, tok):
        # pieces concatenate back to the exact UTF-8 bytes
        for w in ["the data", "привет", "Naïve-Σ", "#97"]:
            for part in w.split():
                hx = "".join(encode_word_hex(part, tok.ranks))
                assert bytes.fromhex(hx) == part.encode("utf-8")

    def test_multi_level_merges_fire(self, tok):
        # chain seeds make whole common words single pieces
        assert encode_word_hex("the", tok.ranks) == ["746865"]
        assert len(encode_word_hex("customer", tok.ranks)) == 1


class TestEncodePretrained:
    @pytest.fixture(scope="class")
    def tok(self) -> PretrainedBPE:
        mt, vt = synthetic_gpt2_fixture(32768)
        return load_gpt2_tokenizer(merges_text=mt, vocab_text=vt)

    def test_ids_match_reference_and_keep_every_row(self, spark, tok):
        df = spark.createDataFrame(
            [
                (1, "the query was fast"),
                (2, None),
                (3, "   "),
                (4, "привет tok42 2024!"),
            ],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in bpe_encode_pretrained(df, tok, memo=False).collect()
        }
        assert set(rows) == {1, 2, 3, 4}
        for did, text in ((1, "the query was fast"), (4, "привет tok42 2024!")):
            want = []
            for w in text.split():
                want += [tok.vocab[p] for p in encode_word_hex(w, tok.ranks)]
            assert rows[did]["token_ids"] == want
            assert rows[did]["n_words"] == len(text.split())
            assert rows[did]["n_bytes"] == sum(
                len(w.encode()) for w in text.split()
            )
        for did in (2, 3):
            assert rows[did]["n_tokens"] == 0
            assert rows[did]["token_ids"] == []

    def test_validation(self, spark, tok):
        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            bpe_encode_pretrained(df, tok, text_col="nope")
        with pytest.raises(ValueError):
            bpe_encode_pretrained(df, tok, id_col="nope")

    def test_memo_serves_same_results(self, spark, tok):
        df = spark.createDataFrame(
            [(1, "the customer table"), (2, "fast scan")],
            "doc_id long, text string",
        )
        a = sorted(
            bpe_encode_pretrained(df, tok, memo=True).collect(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            bpe_encode_pretrained(df, tok, memo=True).collect(),
            key=lambda r: r["doc_id"],
        )
        c = sorted(
            bpe_encode_pretrained(df, tok, memo=False).collect(),
            key=lambda r: r["doc_id"],
        )
        assert a == b == c
