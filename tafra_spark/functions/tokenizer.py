"""Pretrained byte-level BPE tokenizers (r11).

The repo's :mod:`.text` BPE family learns its merges on the scored
corpus itself — right for tokenizer TRAINING, wrong for the #1
production stage: tokenizing a corpus with a FIXED, published
vocabulary (SURVEY §2.9's tokenize-and-pack promise; the r10 verdict's
Missing #1). This module closes that gap:

- :func:`load_gpt2_tokenizer` imports the public GPT-2 tokenizer file
  format — ``merges.txt`` (one merge per line, rank = line order) and
  ``vocab.json`` (piece → id), both spelled in the GPT-2
  byte-to-unicode alphabet (:func:`bytes_to_unicode`, the public
  mapping from Radford et al. 2019's released encoder) — into hex-pair
  symbols, the byte spelling the rest of the engine's BPE machinery
  already uses (``text._bpe_state(alphabet="bytes")``).
- :func:`bpe_encode_pretrained` encodes a corpus with such an imported
  vocabulary at any merge count. The 256+n-literal piece→id map of
  ``text.bpe_encode_bytes`` is exactly the thing that does NOT scale
  to 32k+ vocabularies (its own docstring says to swap it); here the
  piece→id step is a BROADCAST JOIN against the parsed vocab relation,
  and merge application runs over the DISTINCT-WORD dictionary in one
  Arrow-batched ``mapInPandas`` stage — |V| rows through Python, the
  corpus itself never leaves the JVM.
- :func:`synthetic_gpt2_fixture` deterministically builds a toy
  32k-merge vocabulary IN the public file format, so tests and the
  driver queries exercise the real import path without shipping a
  multi-megabyte binary fixture.

Encode semantics — shared, engine-portable, and exact: repeatedly find
the LOWEST-RANK adjacent symbol pair present in the word and fuse its
LEFTMOST occurrence, until no adjacent pair is ranked
(:func:`encode_word_hex`). For a sequentially-valid merge table (every
merge's operands exist before its rank — true of any table actually
learned by BPE, including GPT-2's published one) this is equivalent to
the reference GPT-2 ``bpe()`` loop that fuses ALL occurrences of the
chosen pair per pass: a fused symbol's own merges must carry HIGHER
ranks than the rank that minted it, so the remaining occurrences of
the chosen pair stay minimal and are consumed one by one before any
newly-created pair can win. One-at-a-time is what a recursive SQL
oracle can replay exactly, which is why it is the spelled contract.

The reference (petbox-dev/tafra) has no tokenizer surface — this is
scale-extension territory per SURVEY §2.9.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _WS_RE

__all__ = [
    "bytes_to_unicode",
    "parse_gpt2_merges",
    "parse_gpt2_vocab",
    "derive_gpt2_vocab",
    "PretrainedBPE",
    "load_gpt2_tokenizer",
    "encode_word_hex",
    "bpe_encode_pretrained",
    "synthetic_gpt2_fixture",
]


def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte→unicode alphabet (public algorithm, released
    with Radford et al. 2019's encoder): every printable non-space
    latin-1 byte maps to itself; the remaining 68 bytes map to
    consecutive codepoints from U+0100 up, so every byte has a
    VISIBLE, non-whitespace spelling and merges.txt stays a plain
    space-separated text file."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_B2U = bytes_to_unicode()
_U2B = {u: b for b, u in _B2U.items()}


def _token_to_hex(tok: str) -> str:
    """One GPT-2-alphabet token string → the engine's uppercase-hex
    byte spelling (``'th'`` → ``'7468'``). Raises on characters
    outside the 256-entry alphabet — a malformed vocabulary file."""
    try:
        return "".join("%02X" % _U2B[ch] for ch in tok)
    except KeyError as exc:
        raise ValueError(
            f"gpt2 vocab: character {exc} is not in the byte alphabet"
        ) from None


def _hex_to_token(hx: str) -> str:
    return "".join(
        _B2U[int(hx[i : i + 2], 16)] for i in range(0, len(hx), 2)
    )


def parse_gpt2_merges(text: str) -> list[tuple[str, str]]:
    """Parse ``merges.txt`` (GPT-2 format: optional ``#version`` header
    lines, then one ``left right`` pair per line, rank = order) into
    hex-pair symbol tuples."""
    merges: list[tuple[str, str]] = []
    for i, ln in enumerate(text.splitlines()):
        ln = ln.strip("\r\n")
        # ONLY the first line may be the '#version' header — '#' is a
        # real byte in the GPT-2 alphabet (a '#'-leading merge token is
        # legal data), so a skip-all-comments rule would silently drop
        # merges and shift every later rank
        if not ln or (i == 0 and ln.startswith("#version")):
            continue
        parts = ln.split(" ")
        if len(parts) != 2 or not parts[0] or not parts[1]:
            raise ValueError(f"gpt2 merges: malformed line {ln!r}")
        merges.append((_token_to_hex(parts[0]), _token_to_hex(parts[1])))
    return merges


def parse_gpt2_vocab(text: str) -> dict[str, int]:
    """Parse ``vocab.json`` (GPT-2 format: JSON object token → id)
    into hex-piece → id."""
    raw = json.loads(text)
    if not isinstance(raw, dict):
        raise ValueError("gpt2 vocab: vocab.json must be a JSON object")
    return {_token_to_hex(tok): int(i) for tok, i in raw.items()}


def derive_gpt2_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """The id space implied by a merge list alone, GPT-2 layout: byte
    value b → id b (0..255), the rank-k merge's piece → 256 + k (first
    rank wins when two merge paths mint the same piece string)."""
    vocab = {"%02X" % b: b for b in range(256)}
    for k, (l, r) in enumerate(merges):
        vocab.setdefault(l + r, 256 + k)
    return vocab


@dataclass(frozen=True)
class PretrainedBPE:
    """An imported tokenizer: ``merges`` in rank order (hex-pair
    symbols), ``ranks`` for the encode loop, ``vocab`` hex-piece → id,
    and a content ``digest`` (memo key component)."""

    merges: tuple
    ranks: dict
    vocab: dict
    digest: str


def load_gpt2_tokenizer(
    merges_text: str | None = None,
    vocab_text: str | None = None,
    merges_path: str | None = None,
    vocab_path: str | None = None,
) -> PretrainedBPE:
    """Import a GPT-2-format tokenizer from file contents or paths.
    Without a vocab, ids derive from the merge list
    (:func:`derive_gpt2_vocab`). With one, every merge's piece and all
    256 byte pieces must be addressable or encoding could emit NULL
    ids — validated here, not at query time."""
    if merges_text is None:
        if merges_path is None:
            raise ValueError("gpt2 tokenizer: need merges_text or merges_path")
        with open(merges_path, encoding="utf-8") as fh:
            merges_text = fh.read()
    if vocab_text is None and vocab_path is not None:
        with open(vocab_path, encoding="utf-8") as fh:
            vocab_text = fh.read()
    merges = parse_gpt2_merges(merges_text)
    ranks = {l + "|" + r: k for k, (l, r) in enumerate(merges)}
    if len(ranks) != len(merges):
        raise ValueError("gpt2 merges: duplicate merge pair")
    if vocab_text is not None:
        vocab = parse_gpt2_vocab(vocab_text)
        missing = [
            p
            for p in ["%02X" % b for b in range(256)]
            + [l + r for l, r in merges]
            if p not in vocab
        ]
        if missing:
            raise ValueError(
                f"gpt2 vocab: {len(missing)} pieces unaddressable "
                f"(first: {missing[0]!r})"
            )
    else:
        vocab = derive_gpt2_vocab(merges)
    digest = hashlib.md5(
        (merges_text + "\x00" + json.dumps(sorted(vocab.items()))).encode()
    ).hexdigest()
    return PretrainedBPE(
        merges=tuple(merges), ranks=ranks, vocab=vocab, digest=digest
    )


def encode_word_hex(word: str, ranks: dict) -> list[str]:
    """Encode ONE word to its hex-symbol pieces: fuse the lowest-rank
    adjacent pair's leftmost occurrence until no pair is ranked (see
    the module docstring for the equivalence to GPT-2's reference
    loop). Pure Python — meant for the |V|-row dictionary inside
    :func:`bpe_encode_pretrained`'s Arrow stage, never the corpus."""
    bs = word.encode("utf-8")
    syms = ["%02X" % b for b in bs]
    while len(syms) >= 2:
        best = None
        bi = -1
        for i in range(len(syms) - 1):
            r = ranks.get(syms[i] + "|" + syms[i + 1])
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
    return syms


def bpe_encode_pretrained(
    df: DataFrame,
    tokenizer: PretrainedBPE,
    text_col: str = "text",
    id_col: str = "doc_id",
    memo: bool = True,
) -> DataFrame:
    """Tokenize a corpus with an IMPORTED vocabulary — the production
    tokenize stage (fixed published merges, not corpus-learned).
    Returns one row per input document: (id, n_words, n_bytes,
    n_tokens, token_ids), the :func:`.text.bpe_encode_bytes` contract
    (keep-every-row: null/empty text yields zeros; byte-level, so NO
    unk token exists).

    Scale shape — the reason a 50k-merge vocabulary costs the same
    plan as an 8-merge one:

    - merge application runs on the DISTINCT-WORD dictionary (|V|
      rows), one Arrow-batched ``mapInPandas`` stage with the rank
      table as a broadcast variable; the corpus never enters Python.
    - piece → id is a BROADCAST JOIN against the parsed vocab relation
      (the swap ``bpe_encode_bytes``'s docstring prescribes at 32k+
      merges — no 32k-literal map in the plan, no codegen blowup).
    - the corpus-side work is unchanged: narrow posexplode, an equi-
      join against the encoded dictionary, ONE per-document rebuild
      shuffle.
    - ``memo=True`` serves the ENCODED dictionary from the session
      memo keyed by (input dictionary plan, tokenizer digest) — the
      tokenizer-as-index architecture shared with ``_bpe_state``.
    """
    for c in (id_col, text_col):
        if c not in df.columns:
            raise ValueError(f"bpe_encode_pretrained: unknown column {c!r}")
    spark = df.sparkSession
    stream = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), _WS_RE)).alias(
                "__pos__", "word"
            ),
        )
        .filter(F.col("word") != "")
    )
    dic = stream.select("word").distinct()

    def build_encoded_dict() -> DataFrame:
        import pandas as pd

        bc = spark.sparkContext.broadcast(tokenizer.ranks)

        def enc_iter(batches):
            ranks = bc.value
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "word": pdf["word"],
                        "pieces": [
                            encode_word_hex(w, ranks) for w in pdf["word"]
                        ],
                    }
                )

        enc_dic = dic.mapInPandas(
            enc_iter, "word string, pieces array<string>"
        )
        vocab_df = spark.createDataFrame(
            list(tokenizer.vocab.items()), "piece string, tid int"
        )
        # piece -> id via broadcast join (vocab is 256+n rows — small
        # relative to any corpus, far too big for a literal map)
        encoded = (
            enc_dic.select(
                "word",
                F.posexplode("pieces").alias("__ppos__", "piece"),
            )
            .join(F.broadcast(vocab_df), "piece")
            .groupBy("word")
            .agg(
                F.expr(
                    "array_sort(collect_list(struct(__ppos__, tid))).tid"
                ).alias("__ids__"),
            )
        )
        if memo:
            return encoded.localCheckpoint(eager=True)
        return encoded

    if memo:
        from . import _memo

        key = (
            "pretrained_bpe_dict",
            _memo.session_key(df),
            _memo.plan_hash(dic),
            tokenizer.digest,
        )
        encoded = _memo.state_memo(key, build_encoded_dict)
    else:
        encoded = build_encoded_dict()
    per_word = stream.join(encoded, "word").select(
        id_col,
        "__pos__",
        F.octet_length("word").cast("long").alias("__nb__"),
        "__ids__",
    )
    agg = per_word.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("__nb__").cast("long").alias("n_bytes"),
        F.flatten(
            F.expr(
                "array_sort(collect_list(struct(__pos__, __ids__)))"
                ".__ids__"
            )
        ).alias("token_ids"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .withColumn(
            "token_ids",
            F.coalesce("token_ids", F.array().cast("array<int>")),
        )
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_bytes", F.lit(0)).cast("long").alias("n_bytes"),
            F.size("token_ids").cast("long").alias("n_tokens"),
            "token_ids",
        )
    )


# deterministic seed chains for the toy vocabulary: common English
# words and fragments plus the bench corpus's own vocabulary, so the
# fixture's merges genuinely FIRE multi-level on real text rather than
# stopping at base byte pairs
_FIXTURE_CHAIN_WORDS = [
    "the", "and", "ing", "ion", "tion", "that", "with", "for", "was",
    "his", "this", "from", "they", "have", "what", "are", "were",
    "been", "their", "there", "which", "would", "about", "other",
    "join", "hash", "row", "batch", "scan", "customer", "column",
    "filter", "small", "merge", "slow", "order", "vector", "line",
    "data", "table", "agg", "value", "key", "stream", "window",
    "spark", "group", "part", "big", "sort", "query", "fast", "dup",
]


def synthetic_gpt2_fixture(n_merges: int = 32768) -> tuple[str, str]:
    """Deterministically build a toy tokenizer IN the public GPT-2
    file format: ``(merges_text, vocab_text)`` with exactly
    ``n_merges`` merges. Composition: (1) left-to-right chain merges
    over the seed words above (so multi-level merges fire on real
    corpus text), then (2) base byte-pair padding in a fixed order —
    lowercase letters, digits, the rest of ASCII, then all bytes —
    skipping any pair already present and any merge whose piece string
    already exists (pieces stay unique, so derived ids are total).
    Every merge is sequentially valid by construction: chain lefts are
    minted by the previous chain step, pads use base symbols only.

    Pure function of ``n_merges`` — tests, driver queries, and the
    DuckDB oracle all call it instead of shipping a megabyte fixture
    file; the IMPORT path (file-format parse) is still exercised
    because the output is real merges.txt / vocab.json text."""
    merges: list[tuple[str, str]] = []
    pairs: set = set()
    pieces: set = {"%02X" % b for b in range(256)}

    def add(l: str, r: str) -> None:
        m = l + r
        if (l, r) in pairs or m in pieces or len(merges) >= n_merges:
            return
        pairs.add((l, r))
        pieces.add(m)
        merges.append((l, r))

    for w in _FIXTURE_CHAIN_WORDS:
        bs = w.encode("utf-8")
        cur = "%02X" % bs[0]
        for b in bs[1:]:
            nxt = "%02X" % b
            add(cur, nxt)
            cur = cur + nxt
            pieces.add(cur)  # chain prefix exists even if merge was dup
    order = (
        list(range(0x61, 0x7B))
        + list(range(0x30, 0x3A))
        + list(range(0x20, 0x30))
        + list(range(0x3A, 0x61))
        + list(range(0x7B, 0x100))
        + list(range(0x00, 0x20))
    )
    for a in order:
        for b in order:
            if len(merges) >= n_merges:
                break
            add("%02X" % a, "%02X" % b)
        if len(merges) >= n_merges:
            break
    if len(merges) < n_merges:
        raise ValueError(
            f"synthetic_gpt2_fixture: only {len(merges)} merges reachable"
        )
    merges_text = "#version: 0.2\n" + "\n".join(
        f"{_hex_to_token(l)} {_hex_to_token(r)}" for l, r in merges
    ) + "\n"
    vocab = derive_gpt2_vocab(merges)
    vocab_text = json.dumps(
        {_hex_to_token(p): i for p, i in vocab.items()},
        ensure_ascii=False,
        separators=(",", ":"),
    )
    return merges_text, vocab_text
