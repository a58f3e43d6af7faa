"""Pretrained GPT-2-format tokenizer import + large-vocab encode
(r11; GPT-2-id-compatible pretokenization, specials, and decode r12).

Three differentials, each against an independent implementation:

- the PRETOKENIZER: the engine's lookahead-free runs/boundary/chunk
  decomposition vs :func:`gpt2_pretokenize_ref`, a pure-Python scanner
  implementing the published regex (with its ``\\s+(?!\\S)``
  lookahead) literally;
- the MERGE LOOP: min-rank/leftmost one-at-a-time fuse vs (a) the
  rank-order-to-fixpoint subword-nmt application and (b) the published
  GPT-2 ``bpe()`` shape that fuses ALL occurrences of the chosen pair
  per pass — provably coincident on sequentially-valid merge tables;
- the ROUND TRIP: ``decode(encode(x)) == x`` byte-exact for arbitrary
  UTF-8, the property byte-level BPE plus the exact pretokenizer
  guarantees.
"""

from __future__ import annotations

import json

import pytest

from tafra_spark.functions.tokenizer import (
    PretrainedBPE,
    bpe_decode_pretrained,
    bpe_encode_pretrained,
    bytes_to_unicode,
    derive_gpt2_vocab,
    encode_word_hex,
    gpt2_pretoken_array,
    gpt2_pretokenize_ref,
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


def _gpt2_bpe_ref(word: str, ranks: dict) -> list[str]:
    """Independent reference #2: the published GPT-2 ``bpe()`` loop
    shape — pick the lowest-rank adjacent pair present anywhere in the
    word, fuse ALL its occurrences left-to-right in one pass, repeat."""
    syms = ["%02X" % b for b in word.encode("utf-8")]
    while len(syms) >= 2:
        pairs = {
            (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
        }
        ranked = [
            (ranks[l + "|" + r], l, r)
            for l, r in pairs
            if l + "|" + r in ranks
        ]
        if not ranked:
            break
        _, l, r = min(ranked)
        out = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _ref_doc_ids(text: str, tok: PretrainedBPE) -> list[int]:
    """Whole-document reference encode: reference pretokenizer +
    all-occurrences reference merge loop + vocab lookup, with
    special-token passthrough."""
    ids: list[int] = []
    segments = [text]
    for sp in tok.specials:  # single special in these tests
        pass
    # split on specials, longest first, keeping them
    spl = sorted(tok.specials, key=len, reverse=True)
    parts: list[tuple[bool, str]] = [(False, text)]
    for sp in spl:
        nxt: list[tuple[bool, str]] = []
        for is_sp, seg in parts:
            if is_sp:
                nxt.append((is_sp, seg))
                continue
            bits = seg.split(sp)
            for k, b in enumerate(bits):
                if k:
                    nxt.append((True, sp))
                nxt.append((False, b))
        parts = nxt
    for is_sp, seg in parts:
        if is_sp:
            ids.append(tok.specials[seg])
            continue
        for w in gpt2_pretokenize_ref(seg):
            ids += [tok.vocab[p] for p in _gpt2_bpe_ref(w, tok.ranks)]
    return ids


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
        # the default special is appended after the last vocab id
        assert tok.specials == {"<|endoftext|>": 256 + 32768}

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
        with pytest.raises(ValueError):
            load_gpt2_tokenizer(merges_text="t h\n", special_tokens=("",))

    def test_special_in_vocab_adopts_its_id(self):
        # the published GPT-2 vocab carries <|endoftext|> at 50256 — a
        # special already present keeps the vocab's id
        vocab = derive_gpt2_vocab([("74", "68")])
        vhex = {p: i for p, i in vocab.items()}
        sp_hex = "".join("%02X" % b for b in b"<|endoftext|>")
        vhex[sp_hex] = 999
        b2u = bytes_to_unicode()
        vtext = json.dumps(
            {
                "".join(
                    b2u[int(p[i : i + 2], 16)] for i in range(0, len(p), 2)
                ): i
                for p, i in vhex.items()
            },
            ensure_ascii=False,
        )
        tok = load_gpt2_tokenizer(merges_text="t h\n", vocab_text=vtext)
        assert tok.specials == {"<|endoftext|>": 999}

    def test_sequential_validity(self):
        # every merge operand is a base byte or an earlier merge's
        # piece — the precondition for the one-at-a-time equivalence
        mt, _ = synthetic_gpt2_fixture(32768)
        merges = parse_gpt2_merges(mt)
        known = {"%02X" % b for b in range(256)}
        for l, r in merges:
            assert l in known and r in known, (l, r)
            known.add(l + r)


# texts exercising every branch the r11 verdict named: contractions,
# punctuation, leading/multi/trailing whitespace, non-space whitespace
# runs, unicode letters/digits/symbols, apostrophes after whitespace
PRETOK_CASES = [
    "Hello, world!",
    "don't stop",
    "I'll say it's fine and we're sure they'd've agreed",
    " leading space",
    "trailing ",
    "a  b",
    "a   b",
    "a\nb",
    "a\n\nb",
    "a \nb",
    "a\n b",
    "  'stop",
    "'stop",
    "he said 'yes' loudly",
    "café naïve",
    "日本語のテキスト",
    "abc123 3.14",
    "x\ty",
    "",
    "   ",
    "\n\n\nx",
    "x \n y",
    "tab\t\ttab",
    "MixedCASE Words",
    "1,234.56",
    "e.g. i.e.",
    "em—dash",
    "under_score",
    "price: $5.99!",
    "don't you'll we're I'm they've he'd it's",
    "nbsp\xa0here",
    "ideographic　space",
]


class TestPretokenizer:
    def test_scanner_matches_published_examples(self):
        # hand-derived applications of the published regex
        assert gpt2_pretokenize_ref("Hello, world!") == [
            "Hello", ",", " world", "!",
        ]
        assert gpt2_pretokenize_ref("don't stop") == [
            "don", "'t", " stop",
        ]
        assert gpt2_pretokenize_ref("a  b") == ["a", " ", " b"]
        assert gpt2_pretokenize_ref("a\n\nb") == ["a", "\n", "\n", "b"]
        assert gpt2_pretokenize_ref("a\n b") == ["a", "\n", " b"]
        assert gpt2_pretokenize_ref("  'stop") == [" ", " '", "stop"]
        assert gpt2_pretokenize_ref("'stop") == ["'s", "top"]
        assert gpt2_pretokenize_ref("abc123") == ["abc", "123"]
        assert gpt2_pretokenize_ref("x ") == ["x", " "]

    def test_engine_matches_scanner(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(PRETOK_CASES)],
            "i long, text string",
        )
        got = {
            r["i"]: r["toks"]
            for r in df.select(
                "i", gpt2_pretoken_array("text").alias("toks")
            ).collect()
        }
        for i, t in enumerate(PRETOK_CASES):
            assert got[i] == gpt2_pretokenize_ref(t), repr(t)

    def test_pretokens_partition_the_text(self):
        for t in PRETOK_CASES:
            assert "".join(gpt2_pretokenize_ref(t)) == t


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
            " the", " customer", " tok42",
            "x" * 30,
        ] + [
            "".join(
                rnd.choice("abcdefth#!0и ") for _ in range(rnd.randint(1, 16))
            )
            for _ in range(150)
        ]
        for w in words:
            assert encode_word_hex(w, tok.ranks) == _ref_encode(
                w, tok.merges
            ), w

    def test_differential_vs_gpt2_all_occurrences_loop(self, tok):
        # the published bpe() fuses ALL occurrences of the chosen pair
        # per pass; the engine fuses one at a time — provably equal on
        # sequentially-valid tables, pinned here
        import random

        rnd = random.Random(12)
        words = [
            "the", " the", "thethethe", "aaaa", "    ", "banana",
            "tok999", " batch scan",
        ] + [
            "".join(
                rnd.choice("abcdefth !") for _ in range(rnd.randint(1, 20))
            )
            for _ in range(150)
        ]
        for w in words:
            assert encode_word_hex(w, tok.ranks) == _gpt2_bpe_ref(
                w, tok.ranks
            ), w

    def test_roundtrip_bytes(self, tok):
        # pieces concatenate back to the exact UTF-8 bytes
        for w in ["the data", "привет", "Naïve-Σ", "#97", " the"]:
            hx = "".join(encode_word_hex(w, tok.ranks))
            assert bytes.fromhex(hx) == w.encode("utf-8")

    def test_multi_level_merges_fire(self, tok):
        # chain seeds make whole common words single pieces — and the
        # leading-space (Ġ) forms too, as in the published vocabulary
        assert encode_word_hex("the", tok.ranks) == ["746865"]
        assert len(encode_word_hex("customer", tok.ranks)) == 1
        assert encode_word_hex(" the", tok.ranks) == ["20746865"]
        assert len(encode_word_hex(" customer", tok.ranks)) == 1


class TestEncodePretrained:
    @pytest.fixture(scope="class")
    def tok(self) -> PretrainedBPE:
        mt, vt = synthetic_gpt2_fixture(32768)
        return load_gpt2_tokenizer(merges_text=mt, vocab_text=vt)

    def test_ids_match_reference_and_keep_every_row(self, spark, tok):
        texts = {
            1: "the query was fast",
            4: "привет tok42 2024!",
            5: "Hello, world! don't stop",
            6: "doc one<|endoftext|>doc two",
            7: "<|endoftext|>",
            8: "a<|endoftext|><|endoftext|>b",
        }
        df = spark.createDataFrame(
            [(1, texts[1]), (2, None), (3, "   "), (4, texts[4]),
             (5, texts[5]), (6, texts[6]), (7, texts[7]), (8, texts[8])],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in bpe_encode_pretrained(df, tok, memo=False).collect()
        }
        assert set(rows) == set(range(1, 9))
        for did, text in texts.items():
            assert rows[did]["token_ids"] == _ref_doc_ids(text, tok), text
            assert rows[did]["n_bytes"] == len(text.encode("utf-8"))
        # GPT-2 pretokens: "the query was fast" -> 4 (spaces attach)
        assert rows[1]["n_words"] == 4
        # null text -> zeros; whitespace-only text is REAL tokens now
        # (byte-level: spaces have ids; the 32k fixture fuses pairs)
        assert rows[2]["n_tokens"] == 0 and rows[2]["token_ids"] == []
        assert rows[3]["token_ids"] == _ref_doc_ids("   ", tok)
        assert rows[3]["n_tokens"] > 0
        assert rows[7]["token_ids"] == [tok.specials["<|endoftext|>"]]

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


class TestDecodeRoundTrip:
    @pytest.fixture(scope="class")
    def tok(self) -> PretrainedBPE:
        mt, vt = synthetic_gpt2_fixture(4096)
        return load_gpt2_tokenizer(merges_text=mt, vocab_text=vt)

    def test_roundtrip_exact(self, spark, tok):
        texts = PRETOK_CASES + [
            "doc one<|endoftext|>doc two",
            "<|endoftext|>",
            "mixed 日本語 and ascii, plus \xa0 nbsp<|endoftext|>tail",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        enc = bpe_encode_pretrained(df, tok, memo=False)
        back = {
            r["doc_id"]: r["text"]
            for r in bpe_decode_pretrained(enc, tok).collect()
        }
        for i, t in enumerate(texts):
            assert back[i] == t, repr(t)

    def test_roundtrip_property_random_utf8(self, spark, tok):
        import random

        rnd = random.Random(7)
        pool = (
            "ab th!0и 語🙂'\n\t\xa0 "  # letters, ws, marks, emoji
        )
        texts = [
            "".join(rnd.choice(pool) for _ in range(rnd.randint(0, 40)))
            for _ in range(60)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        enc = bpe_encode_pretrained(df, tok, memo=False)
        back = {
            r["doc_id"]: r["text"]
            for r in bpe_decode_pretrained(enc, tok).collect()
        }
        for i, t in enumerate(texts):
            assert back[i] == t, repr(t)

    def test_unknown_id_raises(self, spark, tok):
        df = spark.createDataFrame(
            [(1, [0, 10_000_000])], "doc_id long, token_ids array<int>"
        )
        with pytest.raises(Exception, match="unknown token id"):
            bpe_decode_pretrained(df, tok).collect()

    def test_empty_ids_decode_to_empty(self, spark, tok):
        df = spark.createDataFrame(
            [(1, []), (2, None)], "doc_id long, token_ids array<int>"
        )
        got = {
            r["doc_id"]: r["text"]
            for r in bpe_decode_pretrained(df, tok).collect()
        }
        assert got == {1: "", 2: ""}

    def test_validation(self, spark, tok):
        df = spark.createDataFrame(
            [(1, [0])], "doc_id long, token_ids array<int>"
        )
        with pytest.raises(ValueError):
            bpe_decode_pretrained(df, tok, ids_col="nope")
