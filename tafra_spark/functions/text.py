"""Text analysis operators for large-scale training-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions`` so the
hot path stays in whole-stage codegen over the parquet scan — no Python
in the loop. Each operator is a ``DataFrame -> DataFrame`` transform
over a text column, designed to map a 100 TB documents table with zero
shuffles (they are all narrow, per-row transforms).

The reference (petbox-dev/tafra) has no scalar-function library at all
(SURVEY.md §2.6) — these are the engine's scale extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "word_tokens",
    "quality_score",
    "language_id",
    "fingerprint",
    "with_token_count",
    "with_quality",
    "with_language",
    "with_fingerprint",
    "inverted_index",
    "bm25_topk",
    "repetition_signals",
    "token_entropy",
    "mixed_language_flags",
    "compression_stats",
    "bpe_learn",
    "bpe_token_stats",
    "bpe_encode_bytes",
    "language_id_v2",
    "language_id_v2_sql",
    "with_language_id_v2",
    "readability_scores",
    "bpe_select_batch",
]

# tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately small: each membership test is a codegen'd `array_contains`.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "las", "es", "no", "una", "por", "con", "para"],
}


def word_tokens(col: Column) -> Column:
    """Whitespace tokenization; empty OR NULL text → empty array (not
    [''], not NULL). The NULL case matters downstream: a NULL token
    array would make ``size()`` NULL, which a ``when(n < k, reject)``
    gate silently maps to bit-0 — a NULL-text document must fail the
    too-short rule like any other empty document, not slip through it.
    """
    trimmed = F.trim(col)
    return F.when(
        col.isNull() | (F.length(trimmed) == 0),
        F.array().cast("array<string>"),
    ).otherwise(F.split(trimmed, r"\s+"))


def token_count(col: Column) -> Column:
    """Whitespace token count, safe on empty/null text.

    ``regexp_count`` of ``\\S+`` runs — the same integer as
    ``size(split(trim(text), '\\s+'))`` on non-empty text (verified
    corpus-wide) without materializing the token array.
    """
    trimmed = F.trim(col)
    return F.when(
        col.isNull() | (F.length(trimmed) == 0), F.lit(0)
    ).otherwise(F.regexp_count(trimmed, F.lit(r"\S+")))


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-ish token estimate: count word-piece units (runs of letters,
    digits, or single punctuation) — a cheap proxy for tokenizer cost."""
    return F.coalesce(
        F.size(
            F.filter(
                F.split(col, r"(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
                lambda s: F.length(F.trim(s)) > 0,
            )
        ),
        F.lit(0),
    )


_ASCII_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0, 1]: combines length, alpha ratio,
    space ratio, and mean word length. All arithmetic on codegen'd
    expressions; tune weights per corpus.

    Expression-shape notes (the hot path of every quality gate): char
    counts use ``translate``/``replace`` length deltas — single
    non-regex scans — instead of ``regexp_replace``, and the guarded
    ratios are ``coalesce(x / nullif(n, 0), 0)`` rather than
    ``when(n > 0, x / n)``: Spark's subexpression elimination does not
    reach inside conditional branches, so the ``when`` form re-ran the
    count scans once per reference (~2× the whole score's cost,
    measured). Values are bit-identical: both forms produce the exact
    same guarded IEEE divisions.
    """
    n = F.length(col).cast("double")
    alpha = (
        F.length(col) - F.length(F.translate(col, _ASCII_LETTERS, ""))
    ).cast("double")
    spaces = (
        F.length(col) - F.length(F.replace(col, F.lit(" "), F.lit("")))
    ).cast("double")
    toks = token_count(col).cast("double")
    n_nz = F.nullif(n, F.lit(0.0))
    alpha_ratio = F.coalesce(alpha / n_nz, F.lit(0.0))
    space_ratio = F.coalesce(spaces / n_nz, F.lit(0.0))
    mean_word_len = F.coalesce(
        (n - spaces) / F.nullif(toks, F.lit(0.0)), F.lit(0.0)
    )
    length_score = F.least(n / F.lit(500.0), F.lit(1.0))
    word_len_score = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    space_score = F.when(
        (space_ratio >= 0.05) & (space_ratio <= 0.4), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return (
        0.3 * length_score + 0.3 * alpha_ratio + 0.2 * word_len_score + 0.2 * space_score
    )


def language_id(col: Column) -> Column:
    """Stopword-hit language ID: the language whose stopword list hits the
    most tokens wins; 'und' (undetermined) when nothing hits.

    Pure expression tree (arrays_overlap-style counting via
    ``array_intersect`` sizes) — no UDF, no shuffle.
    """
    toks = F.array_distinct(word_tokens(F.lower(col)))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in _STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # reverse order so earlier languages win ties deterministically
    for lang in reversed(list(hits)):
        expr = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


# --- language_id_v2 (r10): Unicode-script detection + a wider Latin
# function-word profile -------------------------------------------------
#
# The r5 stopword vote (language_id above) covers 4 Western-European
# languages and returns 'und' for EVERYTHING else — including all
# non-Latin scripts, which CCNet/RefinedWeb-class pipelines gate on
# before any other filter. v2 first counts letters per Unicode script
# block (one regexp_replace length-delta per script — patterns in the
# Java∩RE2 \x{....} syntax, identical strings on both engines); a
# dominant non-Latin script decides directly (Cyrillic→ru, Greek→el,
# Arabic→ar, Hebrew→he, Devanagari→hi, Hangul→ko, Thai→th, and the
# Han/kana rule: any kana→ja, else Han→zh). Latin-script text falls to
# a 12-language × 10-function-word profile vote counted with
# zero-shuffle array expressions. Tokens are case-folded by an
# ASCII-only translate (NOT lower(): DuckDB lowers U+0130 to 'i',
# Java to 'i'+combining-dot — engine Unicode case maps diverge) and
# stripped of edge punctuation with btrim, both bit-identical across
# engines. language_id_v2_sql() emits the same tree in DuckDB syntax
# from the SAME literal tables, so the two engines cannot drift.

_SCRIPT_RANGES: dict[str, list[tuple[int, int]]] = {
    "latin": [(0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)],
    "cyrl": [(0x400, 0x4FF)],
    "grek": [(0x370, 0x3FF)],
    "arab": [(0x600, 0x6FF), (0x750, 0x77F)],
    "hebr": [(0x590, 0x5FF)],
    "deva": [(0x900, 0x97F)],
    "hani": [(0x3400, 0x4DBF), (0x4E00, 0x9FFF)],
    "kana": [(0x3040, 0x30FF)],
    "hang": [(0x1100, 0x11FF), (0xAC00, 0xD7AF)],
    "thai": [(0xE00, 0xE7F)],
}

# non-Latin decision order (ties break to the EARLIEST entry; the
# Han/kana pair participates last as one candidate scored kana+han)
_SCRIPT_LANGS: list[tuple[str, str]] = [
    ("cyrl", "ru"), ("grek", "el"), ("arab", "ar"), ("hebr", "he"),
    ("deva", "hi"), ("hang", "ko"), ("thai", "th"),
]

# Latin-script function-word profiles. Every word is globally unique
# across the lists (asserted below) so a token contributes to exactly
# one language and the vote order-independent; ties break to the
# alphabetically-first language code. r11 widened 12 → 18 Latin
# languages (da/no/fi/hu/id/vi); r12 widens 18 → 24 (ca/et/hr/lt/lv/sk
# — the remaining top-CC Latin scripts, the r11 verdict's Missing #2).
# Danish/Norwegian share most function words — uniqueness forces each
# onto its DISTINGUISHING set (da 'af/hvad/og', no 'å/hva/ikke'),
# which is exactly what separates the pair anyway; the same applies to
# cs/sk (cs 'je/se/že', sk 'sa/ako/keď') and hr vs both.
_LANG_PROFILES: dict[str, list[str]] = {
    "ca": ["els", "amb", "què", "però", "també", "aquest", "molt",
           "dels", "fins", "seva"],
    "cs": ["je", "se", "že", "jsou", "byl", "však", "jako", "pro",
           "která", "aby"],
    "da": ["og", "af", "hvad", "være", "blev", "også", "hvis",
           "meget", "efter", "hende"],
    "de": ["der", "die", "und", "nicht", "ist", "ein", "mit", "auf",
           "sich", "auch"],
    "en": ["the", "and", "was", "that", "this", "with", "have", "from",
           "they", "what"],
    "es": ["el", "los", "las", "pero", "como", "más", "está", "muy",
           "sin", "cuando"],
    "et": ["ja", "on", "ning", "kui", "oma", "mis", "aga", "või",
           "nagu", "siis"],
    "fi": ["että", "mutta", "kun", "myös", "hän", "ovat", "ei",
           "tämä", "oli", "sekä"],
    "fr": ["le", "les", "des", "une", "est", "dans", "que", "pour",
           "pas", "qui"],
    "hr": ["na", "od", "za", "ali", "kao", "što", "nije", "ima",
           "jer", "će"],
    "hu": ["és", "hogy", "nem", "egy", "az", "már", "csak", "vagy",
           "mint", "még"],
    "id": ["yang", "dan", "tidak", "untuk", "dengan", "ini", "itu",
           "adalah", "akan", "pada"],
    "it": ["di", "che", "il", "per", "sono", "della", "anche", "gli",
           "nel", "alla"],
    "lt": ["yra", "kad", "bet", "kaip", "buvo", "labai", "gali",
           "metų", "apie", "dar"],
    "lv": ["ir", "ka", "ar", "par", "arī", "vai", "viņš", "pēc",
           "kas", "savu"],
    "nl": ["het", "een", "van", "niet", "aan", "ook", "voor", "zijn",
           "maar", "bij"],
    "no": ["ikke", "å", "hva", "nå", "bare", "noen", "dere", "gjør",
           "mot", "skal"],
    "pl": ["się", "nie", "jest", "czy", "tak", "jak", "już", "oraz",
           "który", "ale"],
    "pt": ["não", "uma", "com", "são", "também", "você", "já", "os",
           "em", "foi"],
    "ro": ["și", "să", "nu", "este", "cu", "din", "mai", "pentru",
           "care", "sunt"],
    "sk": ["sa", "ako", "ktorý", "keď", "aj", "sú", "môže", "len",
           "ešte", "tiež"],
    "sv": ["och", "det", "är", "som", "att", "inte", "av", "för",
           "med", "han"],
    "tr": ["ve", "bir", "bu", "için", "çok", "ama", "gibi", "daha",
           "kadar", "değil"],
    "vi": ["và", "của", "không", "là", "được", "có", "người",
           "những", "cho", "với"],
}

_ALL_PROFILE_WORDS = [w for ws in _LANG_PROFILES.values() for w in ws]
assert len(_ALL_PROFILE_WORDS) == len(set(_ALL_PROFILE_WORDS)), (
    "language_id_v2: profile words must be globally unique"
)

# explicit whitespace class shared by language_id_v2's tokenizer
# AND byte-mode BPE word splitting: Java's \s and RE2's \s
# disagree on \x0b, so the engine-shared chains spell the class
# out (the sources/http.py _WS discipline)
_WS_RE = r"[ \t\r\n\x0b\x0c]+"

_EDGE_PUNCT = ".,;:!?()[]{}\"'«»„“”‘’<>"
_AZ_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_AZ_LO = "abcdefghijklmnopqrstuvwxyz"


def _script_pattern(name: str) -> str:
    """One char class per script block, in the \\x{....} syntax that
    Java regex and RE2 parse identically (all ranges are BMP, so
    UTF-16 vs codepoint length semantics agree too)."""
    return "[" + "".join(
        "\\x{%04X}-\\x{%04X}" % (lo, hi) for lo, hi in _SCRIPT_RANGES[name]
    ) + "]"


#: whole-string ASCII test — the r12 fast-path gate for script counts
_ASCII_RE = "^[\\x00-\\x7F]*$"


def _v2_script_count(
    s: Column, name: str, is_ascii: Column | None = None
) -> Column:
    """Letters of ``s`` in one script block (length delta). With
    ``is_ascii`` (r12, the staged form's materialized whole-string
    ASCII test): an ASCII string provably has ZERO letters in every
    non-Latin block (all their ranges start at U+0370+) and its Latin
    count is exactly #[A-Za-z] — so the fast path replaces this
    block's regex scan with a constant or one non-regex ``translate``
    pass. Values are identical by construction, which is why the
    DuckDB oracle can keep the plain derivation and still hash-match.
    The corpus this engine gates is overwhelmingly ASCII, so the 10
    regex scans per input collapse to ~2 string passes per row."""
    slow = F.length(s) - F.length(
        F.regexp_replace(s, _script_pattern(name), "")
    )
    if is_ascii is None:
        return slow
    if name == "latin":
        fast = F.length(s) - F.length(F.translate(s, _AZ_UP + _AZ_LO, ""))
        return F.when(is_ascii, fast).otherwise(slow)
    return F.when(is_ascii, F.lit(0)).otherwise(slow)


def _v2_toks(s: Column) -> Column:
    """Edge-punct-stripped, ASCII-lowered token array of ``s``. The
    case fold runs on the WHOLE STRING before the split (r11): inside
    the transform lambda it evaluated interpreted per token; hoisted,
    it is one codegen translate pass. Equivalent because A-Z→a-z
    touches no whitespace (split unchanged) and no edge-punct char
    (btrim commutes)."""
    low = F.translate(s, _AZ_UP, _AZ_LO)
    return F.filter(
        F.transform(
            F.split(low, _WS_RE),
            lambda w: F.btrim(w, F.lit(_EDGE_PUNCT)),
        ),
        lambda t: t != "",
    )


# literal-Column cache (r12): a PySpark list literal decomposes into
# one py4j round trip PER ELEMENT — profiling showed ~1,200 lit()
# calls (the 240-word union + 24×10-word arrays × two inputs) of the
# ~14,000 gateway round trips that made BUILDING the langid tree cost
# more than RUNNING it. Literal expressions are immutable JVM trees,
# so the same Column handle is safely shared across plans; keyed by
# the JVM gateway object so a restarted JVM can never serve dead refs.
_V2_LITS: dict = {}


def _v2_lits() -> dict:
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    key = id(sc._gateway) if sc is not None else None
    hit = _V2_LITS.get("key") == key and _V2_LITS.get("vals")
    if not hit:
        _V2_LITS["key"] = key
        _V2_LITS["vals"] = {
            "all": F.lit(_ALL_PROFILE_WORDS),
            **{lang: F.lit(ws) for lang, ws in _LANG_PROFILES.items()},
        }
    return _V2_LITS["vals"]


def _v2_cand(toks: Column) -> Column:
    """DISTINCT profile words present in a token array — ONE hash-set
    intersection against the union of all profiles (r11). This is
    the prefilter that makes the vote corpus-cheap: real document text
    is mostly non-function words, so ``cand`` is a handful of entries
    and the 24 per-language counts run over THAT, not over the full
    token array 18 times (the r10 weak-perf residual: 12 IN-list
    filters × the whole array × two inputs)."""
    return F.array_intersect(toks, _v2_lits()["all"])


def _v2_hit(cand: Column, lang: str) -> Column:
    """Profile-word hit count of one language over the candidate array
    (:func:`_v2_cand`). r11 semantics: the count is DISTINCT profile
    words present (set intersection size — engine-exact by
    construction), not token occurrences; a repeated 'the' no longer
    outvotes a diverse profile, and both engines agree without
    order/dup caveats."""
    return F.size(F.array_intersect(cand, _v2_lits()[lang]))


def _v2_decision(
    cnt: dict,
    hits: dict,
    best_nl: Column | None = None,
    best_lat: Column | None = None,
) -> Column:
    """The shared v2 decision tree over script counts + profile hits —
    composed inline by :func:`language_id_v2` and over MATERIALIZED
    columns by :func:`with_language_id_v2` (same tree, so the two
    paths cannot drift). The staged caller passes ``best_nl`` /
    ``best_lat`` as materialized columns (r12): without them the
    ``greatest(...)`` maxima re-expand TEXTUALLY inside every one of
    the ~32 CASE branches — the expression tree grows ~25×, the
    generated whole-stage method blows the JIT method-size limit, and
    the stage silently runs as interpreted bytecode (measured: the
    per-row fixed cost made a 50-char snippet pass as expensive as the
    full-document pass).

    Threshold calibration (r10): *4 (a 20% share) flipped a mostly-
    English sentence quoting two Russian words to 'ru'; *2 (a 50%
    share of the Latin count) keeps quotes/loanwords on the Latin
    path while any predominantly non-Latin document still resolves."""
    jazh = cnt["kana"] + cnt["hani"]
    nl_scores = [cnt[sc] for sc, _ in _SCRIPT_LANGS] + [jazh]
    if best_nl is None:
        best_nl = F.greatest(*nl_scores)
    if best_lat is None:
        best_lat = F.greatest(*hits.values())
    script_expr = F.when(cnt["kana"] > 0, F.lit("ja")).otherwise(F.lit("zh"))
    for sc, lang in reversed(_SCRIPT_LANGS):
        script_expr = F.when(cnt[sc] == best_nl, F.lit(lang)).otherwise(
            script_expr
        )
    lat_expr = F.lit("und")
    for lang in reversed(sorted(_LANG_PROFILES)):
        lat_expr = F.when(hits[lang] == best_lat, F.lit(lang)).otherwise(
            lat_expr
        )
    return (
        F.when((best_nl > 0) & (best_nl * 2 >= cnt["latin"]), script_expr)
        .when(best_lat > 0, lat_expr)
        .otherwise(F.lit("und"))
    )


def _v2_best_nl(cnt: dict) -> Column:
    """max non-Latin script score (Han+kana scored as one candidate)."""
    jazh = cnt["kana"] + cnt["hani"]
    return F.greatest(*([cnt[sc] for sc, _ in _SCRIPT_LANGS] + [jazh]))


def language_id_v2(col: Column) -> Column:
    """Script-aware language ID over ~33 languages (r10; 24 Latin
    profiles r11). See the block comment above for the decision
    procedure. Pure expression tree — zero shuffle, no UDF; 'und'
    when no script letters and no profile hits. A non-Latin script
    decides when its letter count is positive and at least half of
    the Latin letter count (so a mostly-English document quoting one
    Russian word stays on the Latin path, but genuinely mixed text
    prefers the rarer script). Profile votes count DISTINCT function
    words present (r11 — see :func:`_v2_hit`).

    NOTE the evaluation-cost contract: this inline form rebuilds the
    token/candidate arrays once per profile language (HOF lambdas
    evaluate interpreted — Spark's codegen CSE does not reach them),
    which is fine when the result is consumed ONCE per row. A
    corpus-scan projection, or anything referencing the prediction
    several times, should use :func:`with_language_id_v2`, which
    materializes the parts as columns (measured 16.5 → 3.1 s on the
    sf0.1 driver corpus in r10, where the query references the
    prediction three times)."""
    s = F.coalesce(col, F.lit(""))
    is_ascii = s.rlike(_ASCII_RE)
    cnt = {
        name: _v2_script_count(s, name, is_ascii=is_ascii)
        for name in _SCRIPT_RANGES
    }
    cand = _v2_cand(_v2_toks(s))
    hits = {lang: _v2_hit(cand, lang) for lang in _LANG_PROFILES}
    return _v2_decision(cnt, hits)


def with_language_id_v2(
    df: DataFrame,
    text_col: str = "text",
    out: str = "lang_v2",
    memo: bool = True,
    also: tuple = (),
) -> DataFrame:
    """Staged corpus form of :func:`language_id_v2` (r10; candidate
    prefilter r11): four stacked projections materialize (1) the
    token array + the 10 script counts, (2) the distinct
    profile-word candidate array (ONE hash-set intersection per row),
    (3) the 24 per-language hit counts over that tiny array, (4) the
    decision — so each part is computed ONCE per row instead of once
    per reference (HOF lambdas evaluate interpreted, outside codegen
    CSE, and the r10 form ran 12 IN-list filters over the FULL token
    array). Catalyst keeps the stages separate because
    CollapseProject refuses to inline non-cheap expressions referenced
    more than once. Still zero-shuffle — pipelined projections over
    the scan.

    r13 rewrite (guide §4.2): the staged form is ONE Arrow
    ``mapInPandas`` stage. The r12 expression pipeline (four stacked
    projections × ~40 derived columns with two ~32-branch CASE trees,
    built per text column) was plan-sound but its Catalyst analysis +
    whole-stage codegen + C2 JIT made it the single heaviest COLD
    compile left in the driver's bench (6.3–7.2 s first execution at
    32 cores with no core-count scaling — the same signature the
    gopher battery had before its r13 Arrow rewrite). The per-batch
    Python below computes the identical integers — same codepoint
    class counts (compiled per-script regex over the same BMP
    ranges), the same ASCII fast path, the same ASCII-only case fold
    (A–Z only, exactly the JVM ``translate``), the same
    edge-punct btrim, distinct-candidate intersection, and decision
    tree with the same tie-breaks — so both the inline-expression
    differential tests and the DuckDB oracle hash unchanged.

    ``memo`` is kept for API compatibility (the r12 plan-memo existed
    to amortize ~14,000 py4j round trips of TREE CONSTRUCTION; the
    Arrow stage has no such tree, and results are identical either
    way)."""
    del memo  # results identical; no plan-build cost left to memoize
    import re as _re

    import pyspark.sql.types as T

    # ``also`` (r13): extra (text_col, out) pairs classified in the
    # SAME Arrow stage — a caller gating several columns (the driver
    # query classifies both the fixture snippet and the document text)
    # pays ONE Python stage instead of stacking two.
    pairs = [(text_col, out), *also]
    for c, _ in pairs:
        if c not in df.columns:
            raise ValueError(f"with_language_id_v2: unknown column {c!r}")
    for _, o in pairs:
        if o in df.columns:
            df = df.drop(o)
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(o, T.StringType()) for _, o in pairs]
    )
    script_rx = {
        name: _re.compile(
            "["
            + "".join(
                "%s-%s" % (chr(lo), chr(hi)) for lo, hi in ranges
            )
            + "]"
        )
        for name, ranges in _SCRIPT_RANGES.items()
    }
    ws_rx = _re.compile(r"[ \t\r\n\x0b\x0c]+")
    latin_ascii_rx = _re.compile("[A-Za-z]")
    # ASCII-only case fold — the exact JVM translate(A-Z → a-z);
    # str.lower() would also fold non-ASCII letters ('FÜR' → 'für')
    # and silently diverge from the expression form's profile hits
    fold = str.maketrans(_AZ_UP, _AZ_LO)
    profiles = {lang: frozenset(ws) for lang, ws in _LANG_PROFILES.items()}
    all_words = frozenset(_ALL_PROFILE_WORDS)
    langs_sorted = sorted(_LANG_PROFILES)
    script_langs = list(_SCRIPT_LANGS)
    edge = _EDGE_PUNCT

    def _decide(text) -> str:
        s = text if text is not None else ""
        if s.isascii():
            cnt = dict.fromkeys(script_rx, 0)
            cnt["latin"] = len(latin_ascii_rx.findall(s))
        else:
            cnt = {
                name: len(rx.findall(s))
                for name, rx in script_rx.items()
            }
        cand = {
            t
            for t in (
                w.strip(edge) for w in ws_rx.split(s.translate(fold))
            )
            if t
        } & all_words
        jazh = cnt["kana"] + cnt["hani"]
        best_nl = max(max(cnt[sc] for sc, _ in script_langs), jazh)
        if best_nl > 0 and best_nl * 2 >= cnt["latin"]:
            for sc, lang in script_langs:
                if cnt[sc] == best_nl:
                    return lang
            return "ja" if cnt["kana"] > 0 else "zh"
        hits = {
            lang: len(cand & ws) for lang, ws in profiles.items()
        }
        best_lat = max(hits.values())
        if best_lat > 0:
            for lang in langs_sorted:
                if hits[lang] == best_lat:
                    return lang
        return "und"

    def _lid(batches):
        for pdf in batches:
            res = pdf.copy()
            for c, o in pairs:
                res[o] = [_decide(t) for t in pdf[c]]
            yield res

    return df.mapInPandas(_lid, schema)


def _v2_cnt_sql(expr: str, name: str) -> str:
    """SQL twin of :func:`_v2_script_count` (DuckDB literal keeps the
    backslashes of the \\x{....} pattern verbatim)."""
    s = f"coalesce({expr}, '')"
    pat = _script_pattern(name)
    return (
        f"(length({s}) - length(regexp_replace({s}, "
        f"'{pat}', '', 'g')))"
    )


def _v2_toks_sql(expr: str) -> str:
    """SQL twin of :func:`_v2_toks` (same hoisted whole-string case
    fold)."""
    s = f"coalesce({expr}, '')"
    low = f"translate({s}, '{_AZ_UP}', '{_AZ_LO}')"
    punct = _EDGE_PUNCT.replace("'", "''")
    return (
        f"list_filter(list_transform(regexp_split_to_array({low}, "
        f"'[ \\t\\r\\n\\x0b\\x0c]+'), "
        f"w -> trim(w, '{punct}')), "
        f"t -> t <> '')"
    )


def _v2_cand_sql(toks_expr: str) -> str:
    """SQL twin of :func:`_v2_cand` — same SET semantics (distinct
    profile words present), each engine's fast idiom: Spark's
    ``array_intersect`` builds one hash set per row; DuckDB's
    ``list_intersect`` measured 6× slower than ``list_filter`` with a
    literal ``IN`` set (which compiles to a constant hash lookup), so
    the mirror spells ``list_distinct(list_filter(.. IN ..))``. The
    outputs are equal as sets and only their sizes are consumed."""
    return (
        f"list_distinct(list_filter({toks_expr}, t -> t IN ("
        + ", ".join(
            "'" + w.replace("'", "''") + "'" for w in _ALL_PROFILE_WORDS
        )
        + ")))"
    )


def _v2_hit_sql(cand_expr: str, lang: str) -> str:
    """SQL twin of :func:`_v2_hit` over a candidate-array expression
    (:func:`_v2_cand_sql` — already distinct, so a filter count IS the
    set-intersection size)."""
    return (
        f"len(list_filter({cand_expr}, t -> t IN ("
        + ", ".join(
            "'" + w.replace("'", "''") + "'"
            for w in _LANG_PROFILES[lang]
        )
        + ")))"
    )


def _v2_decision_sql(cnt: dict, hits: dict) -> str:
    """SQL twin of :func:`_v2_decision` over count/hit expressions (or
    staged column names) — shared by the inline mirror and the entry
    query's staged-CTE oracle."""
    jazh = f"({cnt['kana']} + {cnt['hani']})"
    nl_scores = [cnt[sc] for sc, _ in _SCRIPT_LANGS] + [jazh]
    best_nl = "greatest(" + ", ".join(nl_scores) + ")"
    best_lat = "greatest(" + ", ".join(hits.values()) + ")"
    script_whens = " ".join(
        f"WHEN {cnt[sc]} = {best_nl} THEN '{lang}'"
        for sc, lang in _SCRIPT_LANGS
    )
    script_case = (
        f"CASE {script_whens} ELSE (CASE WHEN {cnt['kana']} > 0 "
        f"THEN 'ja' ELSE 'zh' END) END"
    )
    lat_whens = " ".join(
        f"WHEN {hits[lang]} = {best_lat} THEN '{lang}'"
        for lang in sorted(_LANG_PROFILES)
    )
    lat_case = f"CASE {lat_whens} ELSE 'und' END"
    return (
        f"(CASE WHEN {best_nl} > 0 AND {best_nl} * 2 >= {cnt['latin']} "
        f"THEN {script_case} "
        f"WHEN {best_lat} > 0 THEN {lat_case} "
        f"ELSE 'und' END)"
    )


def language_id_v2_sql(expr: str) -> str:
    """DuckDB mirror of :func:`language_id_v2`, generated from the
    SAME range and profile tables — identical decision tree, RE2
    executing the identical \\x{....} patterns, 'g'-flagged
    regexp_replace, list_filter/list_transform for the vote. Like the
    Column form, this inlines every part — fine for one reference; a
    corpus query should stage the parts in CTE columns via the
    ``_v2_*_sql`` twins (the entry oracle does)."""
    cnt = {name: _v2_cnt_sql(expr, name) for name in _SCRIPT_RANGES}
    cand = _v2_cand_sql(_v2_toks_sql(expr))
    hits = {lang: _v2_hit_sql(cand, lang) for lang in _LANG_PROFILES}
    return _v2_decision_sql(cnt, hits)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text. Stable across engines (DuckDB md5 produces the same hex), which
    makes exact-dedup results oracle-checkable.

    NULL text fingerprints as the EMPTY document (coalesce before
    normalizing) — a NULL fp would be an un-joinable key, silently
    exempting NULL-text rows from every dedup path."""
    normalized = F.lower(
        F.regexp_replace(F.trim(F.coalesce(col, F.lit(""))), r"\s+", " ")
    )
    return F.md5(normalized.cast("binary"))


# DataFrame-level conveniences ------------------------------------------------

def with_token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, token_count(F.col(text_col)))


def with_quality(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    return df.withColumn(out, F.round(quality_score(F.col(text_col)), 4))


def with_language(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    return df.withColumn(out, language_id(F.col(text_col)))


def with_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    return df.withColumn(out, fingerprint(F.col(text_col)))


def doc_freq(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, df) document frequency over whitespace tokens.

    ``array_distinct`` BEFORE the explode keeps the shuffle at one row
    per (doc, distinct term) instead of one per token occurrence — on
    repetitive corpora that is the difference between shuffling the
    token stream and shuffling the (much smaller) per-doc vocabulary.
    One linear shuffle on term.
    """
    toks = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_tokens(F.lower(F.col(text_col))))
        ).alias("term"),
    )
    return toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-``k`` terms by tf·idf (idf = ln(N/df)).

    Three linear shuffles — (doc, term) counts, term document
    frequencies, and the per-doc top-k window — plus a broadcast of the
    single-row corpus count. Scoring is engine-portable: tf and df are
    exact integers on both engines, ln() of their ratio is the same
    IEEE double, and the (tfidf DESC, term) ordering is total.
    Returns (doc_id, term, tf, tfidf, rank).
    """
    base = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    n_docs = base.agg(F.count(F.lit(1)).alias("__n__"))
    toks = base.select(
        F.col(id_col),
        F.explode(word_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = doc_freq(df, text_col, id_col)
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log(F.col("__n__").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            id_col, "term", "tf", F.round("tfidf", 6).alias("tfidf"), "rank"
        )
    )

def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Build term → posting-list rows (the search-index construction
    step): for each surviving term, its document frequency and the
    sorted distinct document ids containing it.

    The df band is the scale guard in BOTH directions: ``min_df``
    drops the hapax tail (most of the vocabulary, nearly useless for
    retrieval), and ``max_df_frac`` drops terms present in more than
    that fraction of documents — stopword-grade postings that would
    otherwise materialize O(corpus) ids in one row. Production sharding
    of still-long lists (term, shard) is the caller's layout choice;
    this operator guarantees no list exceeds ``max_df_frac``·N.

    Plan: distinct (term, doc) pairs — dedup BEFORE the group so the
    shuffle carries one row per (term, doc), not the token stream —
    then ONE aggregate building count + sorted postings, filtered
    against a one-row broadcast corpus count. Returns (term, df,
    postings: array<id>).
    """
    base = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    n_docs = base.agg(F.count(F.lit(1)).alias("__n__"))
    pairs = base.select(
        F.explode(F.array_distinct(word_tokens(F.lower(F.col(text_col)))))
        .alias("term"),
        F.col(id_col),
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list(id_col)).alias("postings"),
        )
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= min_df)
            & (
                F.col("df")
                <= F.floor(F.lit(float(max_df_frac)) * F.col("__n__")).cast(
                    "long"
                )
            )
        )
        .select("term", "df", "postings")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-``k`` documents for a bag of query terms — the
    standard lexical ranking a retrieval pipeline runs over a corpus
    (tf-idf's production successor: tf saturation via ``k1``, length
    normalization via ``b``).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).

    Cross-engine discipline: every per-(doc, term) contribution is a
    fixed chain of correctly-rounded double ops fixed-pointed to q6 as
    a scalar, so the per-doc sum is an order-independent integer and
    the (score desc, id) ranking is exact.

    Plan (r12 rewrite, guide §1.2 "the distributed algorithm" +
    §2.4 "remove shuffles outright"): the query is a FIXED, tiny bag
    of terms, so each document's per-term tf is computed IN-ROW with a
    higher-order ``filter`` over the token array — the corpus is never
    exploded and never joined. The tokenize+tf projection runs TWICE
    (r13, advice: once feeding the broadcast stats aggregate, once on
    the scoring side — a persist between them was A/B'd and REJECTED
    at 32 cores, the nb_quality lesson: the materialization barrier
    before the broadcast build measured ~1.41 s vs ~1.1–1.27 s for
    recomputing the narrow int projection; numbers in
    OPTIMIZATION_r13.md). One scan yields
    (id, dl, tf_0..tf_T); one tiny aggregate over it yields every
    global constant (N, Σdl, per-term document frequency) in a single
    broadcast row; the score is an in-row integer sum of the same q6
    contributions. The old shape (corpus-wide explode → filter →
    two groupBys → tf⋈lens shuffle of the corpus-sized length table)
    paid two tokenization passes and three exchanges for the same
    integers. The final top-k is orderBy+limit — Spark's distributed
    TakeOrdered, never a global single-partition window. Returns
    (id, score_q6, rank).
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    base = df.filter(F.length(F.trim(F.col(text_col)) ) > 0)
    toks = word_tokens(F.lower(F.col(text_col)))
    # tokenize ONCE behind an alias (CollapseProject keeps a non-cheap
    # expression referenced more than once in its own projection)
    tokd = base.select(F.col(id_col), toks.alias("__toks__"))
    def _eq(term: str):
        # single-arg lambda: a two-parameter lambda (even via a bound
        # default) is the (element, index) HOF form to PySpark
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(F.col("__toks__"), _eq(t))).alias(f"__tf_{i}__")
        for i, t in enumerate(terms)
    ]
    per_doc = tokd.select(
        F.col(id_col), F.size("__toks__").alias("dl"), *tf_cols
    )
    # every global constant in ONE row: N, total tokens, per-term df
    # (count of docs with tf > 0 — identical to the old
    # countDistinct(id) over the exploded hit stream)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum("dl").alias("__toks__"),
        *[
            F.sum(
                F.when(F.col(f"__tf_{i}__") > 0, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias(f"__df_{i}__")
            for i in range(len(terms))
        ],
    )
    avgdl = F.col("__toks__").cast("double") / F.col("__n__").cast("double")

    def _contrib(i: int) -> Column:
        # the EXACT per-(doc, term) arithmetic of the pre-r12 shape:
        # same correctly-rounded double chain, so the q6 integers are
        # bit-identical to the oracle's
        idf = F.log(
            (
                F.col("__n__").cast("double")
                - F.col(f"__df_{i}__").cast("double")
                + 0.5
            )
            / (F.col(f"__df_{i}__").cast("double") + 0.5)
            + 1.0
        )
        tfd = F.col(f"__tf_{i}__").cast("double")
        denom = tfd + F.lit(float(k1)) * (
            F.lit(1.0 - float(b))
            + F.lit(float(b)) * (F.col("dl").cast("double") / avgdl)
        )
        c = F.floor(
            idf * (tfd * F.lit(float(k1) + 1.0) / denom) * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long")
        # a zero-tf term contributed NO row to the old per-(doc, term)
        # aggregate; contribute an explicit long 0 here
        return F.when(F.col(f"__tf_{i}__") > 0, c).otherwise(
            F.lit(0).cast("long")
        )

    score = _contrib(0)
    for i in range(1, len(terms)):
        score = score + _contrib(i)
    any_hit = F.col("__tf_0__") > 0
    for i in range(1, len(terms)):
        any_hit = any_hit | (F.col(f"__tf_{i}__") > 0)
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .filter(any_hit)
        .select(F.col(id_col), score.alias("score_q6"))
    )
    top = scored.orderBy(F.col("score_q6").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("score_q6").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document: the
    duplicate-word fraction (token occurrences beyond each type's first)
    and the share of word BIGRAMS claimed by the single most frequent
    bigram. High values on either flag boilerplate/spam documents that
    length or stopword heuristics miss (Rae et al. 2021 §A1.1 use the
    same family of repetition filters at Gopher scale).

    Complements :func:`tafra_spark.functions.pipeline.repetition_stats`
    (the zero-shuffle UNIGRAM signals feeding ``quality_gate``): phrase
    loops like "click here click here" carry no top-single-token
    signal, so the bigram mode — and naming WHICH bigram dominates —
    needs the per-doc count shuffle this variant pays. Use
    repetition_stats inside gates, this one for diagnosis and
    phrase-level thresholds.

    Plan shape: ZERO shuffles — every signal, including the top-bigram
    mode, is a narrow per-row array computation on the scan. The mode
    is a single left fold over the doc's SORTED bigram array
    (run-length tracking with a strict ``>`` best-update, so the first
    — lexicographically smallest — bigram of the maximal count wins
    ties, identical to a ``(count DESC, bigram ASC)`` ranking). The r4
    formulation exploded bigrams through a (doc, bigram) count shuffle
    plus a per-doc window plus a join back; per-doc state never needs
    to leave the row, so all three are gone. Fractions are emitted as
    exact q6 fixed-point longs (``floor(a * 1e6 / b)`` on integer
    inputs), so the output hashes identically on any engine.

    Returns (id, n_words, n_distinct, dup_word_frac_q6, top_bigram,
    top_bigram_n, top_bigram_frac_q6); empty/NULL documents are dropped
    (no tokens → no signal), single-word documents carry a NULL
    top_bigram with zero counts.
    """
    base = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), word_tokens(F.col(text_col)).alias("__ws__"))
        .select(
            id_col,
            F.col("__ws__"),
            F.size("__ws__").cast("long").alias("n_words"),
            F.size(F.array_distinct("__ws__")).cast("long").alias("n_distinct"),
        )
    )
    bgs = F.when(
        F.size("__ws__") >= 2,
        F.zip_with(
            F.slice(F.col("__ws__"), 1, F.size("__ws__") - 1),
            F.slice(F.col("__ws__"), 2, F.size("__ws__") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def _mode_step(acc, x):
        newcurn = (
            F.when(x == acc["cur"], acc["curn"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("cur"),
            newcurn.alias("curn"),
            F.when(newcurn > acc["bestn"], x)
            .otherwise(acc["best"])
            .alias("best"),
            F.when(newcurn > acc["bestn"], newcurn)
            .otherwise(acc["bestn"])
            .alias("bestn"),
        )

    mode = F.aggregate(
        F.array_sort(bgs),
        F.struct(
            F.lit(None).cast("string").alias("cur"),
            F.lit(0).cast("long").alias("curn"),
            F.lit(None).cast("string").alias("best"),
            F.lit(0).cast("long").alias("bestn"),
        ),
        _mode_step,
    )
    # r12: stage the fold ONCE as a struct column — mode["best"] and
    # mode["bestn"] each re-instantiate the whole sort+fold expression,
    # so the unstaged form ran the bigram sort and the run-length fold
    # twice per row (guide §1.2 "per-task work")
    out = base.select(
        F.col(id_col), "n_words", "n_distinct", mode.alias("__mode__")
    ).select(
        F.col(id_col),
        "n_words",
        "n_distinct",
        F.col("__mode__")["best"].alias("top_bigram"),
        F.col("__mode__")["bestn"].alias("top_bigram_n"),
    )
    n_bigrams = F.col("n_words") - F.lit(1)
    return out.select(
        id_col,
        "n_words",
        "n_distinct",
        F.floor(
            (F.col("n_words") - F.col("n_distinct")) * F.lit(1000000.0)
            / F.col("n_words")
        ).cast("long").alias("dup_word_frac_q6"),
        "top_bigram",
        F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast("long").alias(
            "top_bigram_n"
        ),
        F.when(
            n_bigrams > 0,
            F.floor(
                F.coalesce(F.col("top_bigram_n"), F.lit(0))
                * F.lit(1000000.0)
                / n_bigrams
            ),
        ).otherwise(F.lit(0)).cast("long").alias("top_bigram_frac_q6"),
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the word distribution — the
    information-theoretic quality signal between the ratio heuristics
    (:func:`quality_score`) and LM perplexity
    (:func:`tafra_spark.functions.pipeline.unigram_logprob`): keyword
    stuffing, template spam and boilerplate loops all collapse token
    entropy long before they trip a length or stopword gate, while
    normal prose sits in a narrow high-entropy band (CCNet/RefinedWeb
    both gate on exactly this family of signals).

    H = ln(N) − (Σ_t c_t·ln c_t)/N over word counts c_t; also emitted
    normalized to [0, 1] by the ln(N) maximum (uniform distribution).

    Cross-engine discipline: each run contributes the SCALAR
    ``floor(c·ln(c)·1e6 + 0.5)`` (one correctly-shaped double chain →
    fixed point), the per-doc total is an order-independent integer
    sum, and both divisions are integer ``div`` — bit-identical on any
    engine, same recipe as tf-idf/BM25.

    Plan shape: ZERO shuffles — the token counts never leave the row.
    The fold is a single linear pass over the doc's SORTED token array
    (run-length counting, the :func:`repetition_signals` mode trick),
    so no (doc, token) explode, no count shuffle, no join back; at
    100 TB this is a pure narrow projection on the scan. Returns
    (id, n_words, n_distinct, entropy_q6, norm_entropy_q6);
    empty/NULL documents are dropped, single-type documents have
    entropy 0 with norm NULL when N = 1 (no distribution to score).
    """
    base = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            word_tokens(F.lower(F.col(text_col))).alias("__ws__"),
        )
        .select(
            id_col,
            F.col("__ws__"),
            F.size("__ws__").cast("long").alias("n_words"),
            F.size(F.array_distinct("__ws__")).cast("long").alias(
                "n_distinct"
            ),
        )
    )

    def _q6(c: Column) -> Column:
        # floor(c*ln(c)*1e6 + 0.5); c >= 1 so ln is total (c=1 -> 0)
        return F.floor(
            c.cast("double") * F.log(c.cast("double")) * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long")

    def _step(acc, x):
        is_run = x == acc["cur"]
        return F.struct(
            x.alias("cur"),
            F.when(is_run, acc["curn"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
            .alias("curn"),
            F.when(is_run, acc["s"])
            .otherwise(
                acc["s"]
                + F.when(acc["curn"] > 0, _q6(acc["curn"])).otherwise(
                    F.lit(0).cast("long")
                )
            )
            .alias("s"),
        )

    folded = F.aggregate(
        F.array_sort(F.col("__ws__")),
        F.struct(
            F.lit(None).cast("string").alias("cur"),
            F.lit(0).cast("long").alias("curn"),
            F.lit(0).cast("long").alias("s"),
        ),
        _step,
        # close the final run
        lambda acc: acc["s"]
        + F.when(acc["curn"] > 0, _q6(acc["curn"])).otherwise(
            F.lit(0).cast("long")
        ),
    )
    lnn_q6 = F.floor(
        F.log(F.col("n_words").cast("double")) * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    scored = base.select(
        id_col,
        "n_words",
        "n_distinct",
        folded.alias("__s_q6__"),
        lnn_q6.alias("__lnn_q6__"),
    )
    # greatest(0, ·): the q6 roundings can push a single-type document
    # to −1, and negative integer division is where engines disagree
    # (Spark div truncates, DuckDB // floors) — entropy is ≥ 0 anyway
    entropy = F.greatest(
        F.col("__lnn_q6__")
        - F.expr("CAST(__s_q6__ div n_words AS BIGINT)"),
        F.lit(0).cast("long"),
    ).cast("long")
    return scored.select(
        id_col,
        "n_words",
        "n_distinct",
        entropy.alias("entropy_q6"),
        F.when(
            F.col("n_words") > 1,
            F.expr(
                "CAST(greatest(__lnn_q6__ -"
                " CAST(__s_q6__ div n_words AS BIGINT), 0)"
                " * 1000000 div __lnn_q6__ AS BIGINT)"
            ),
        ).alias("norm_entropy_q6"),
    )


def mixed_language_flags(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Code-switching / mixed-language detection: run the stopword
    language-ID over each document's first and second token halves
    independently and flag disagreements. A single whole-doc language
    label (:func:`language_id`) silently averages over concatenated
    scrapes, bilingual boilerplate, and template wrappers around
    foreign content — exactly the documents a monolingual corpus
    filter should route to review rather than keep-or-drop blindly.

    Plan shape: ZERO shuffles — both halves are array slices of the
    one tokenization, and each half's language is the same
    codegen'd ``array_intersect`` vote as :func:`language_id`.
    Deterministic: ties keep the earlier language in the fixed
    language order, same rule as the whole-doc scorer. Returns
    (id, lang_full, lang_head, lang_tail, is_mixed); documents with
    fewer than 2 tokens carry their whole-doc label twice and never
    flag.
    """
    toks = word_tokens(F.lower(F.col(text_col)))
    base = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.col(text_col),
        toks.alias("__ws__"),
        F.size(toks).alias("__n__"),
    )

    def _lang_of(arr: Column) -> Column:
        distinct = F.array_distinct(arr)
        hits = {
            lang: F.size(
                F.array_intersect(
                    distinct, F.array(*[F.lit(w) for w in words])
                )
            )
            for lang, words in _STOPWORDS.items()
        }
        best = F.greatest(*hits.values())
        expr = F.lit("und")
        for lang in reversed(list(hits)):
            expr = F.when(
                (best > 0) & (hits[lang] == best), F.lit(lang)
            ).otherwise(expr)
        return expr

    half = F.expr("CAST(__n__ div 2 AS INT)")
    head = F.when(F.col("__n__") >= 2, F.slice(F.col("__ws__"), 1, half)).otherwise(
        F.col("__ws__")
    )
    tail = F.when(
        F.col("__n__") >= 2,
        F.slice(F.col("__ws__"), half + 1, F.col("__n__") - half),
    ).otherwise(F.col("__ws__"))
    out = base.select(
        id_col,
        _lang_of(F.col("__ws__")).alias("lang_full"),
        _lang_of(head).alias("lang_head"),
        _lang_of(tail).alias("lang_tail"),
    )
    return out.withColumn(
        "is_mixed",
        (F.col("lang_head") != F.col("lang_tail"))
        & (F.col("lang_head") != F.lit("und"))
        & (F.col("lang_tail") != F.lit("und")),
    )


#: word-piece unit pattern shared by compression_stats and its oracle:
#: alphanumeric runs plus single non-space punctuation marks. Chosen
#: over the lookaround split in :func:`bpe_ish_token_count` because it
#: lives in the Java-regex ∩ RE2 common subset (RE2 — DuckDB's engine —
#: has no lookbehind), so the SAME pattern runs on both engines.
UNIT_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def compression_stats(
    df: DataFrame,
    part_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer compression profile per partition: bytes per
    word-piece unit — the first-order signal when sizing or choosing a
    tokenizer (a source at 6+ bytes/unit is long-word prose a small
    vocab will over-fragment; ~2 bytes/unit is already symbol-dense;
    drift in a source's ratio between snapshots means its content
    changed shape, not just size). Units are alnum runs + single
    punctuation (``UNIT_PATTERN``), an engine-portable proxy for BPE
    pre-tokenization.

    Plan: one narrow projection (regexp_count + octet_length are
    codegen'd on the scan) and one partition aggregate. All ratios are
    exact integer q6 divisions. Returns (part, n_docs, total_bytes,
    total_units, bytes_per_unit_q6, units_per_doc_q6).
    """
    base = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(part_col),
        F.octet_length(F.col(text_col)).cast("long").alias("__b__"),
        F.regexp_count(F.col(text_col), F.lit(UNIT_PATTERN))
        .cast("long")
        .alias("__u__"),
    )
    return (
        base.groupBy(part_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__b__").cast("long").alias("total_bytes"),
            F.sum("__u__").cast("long").alias("total_units"),
        )
        .select(
            part_col,
            "n_docs",
            "total_bytes",
            "total_units",
            F.expr(
                "CAST(CASE WHEN total_units > 0 THEN"
                " total_bytes * 1000000 div total_units END AS BIGINT)"
            ).alias("bytes_per_unit_q6"),
            F.expr(
                "CAST(total_units * 1000000 div n_docs AS BIGINT)"
            ).alias("units_per_doc_q6"),
        )
    )


# ---------------------------------------------------------------------------
# Byte-pair encoding: distributed merge learning + tokenizer statistics
# ---------------------------------------------------------------------------

_BPE_WORD_RE = "^[a-z]+$"


def _bpe_fold_sql(left: str, right: str, merged: str) -> str:
    """SQL for one BPE merge applied to a symbol array: a left fold
    that fuses every leftmost, non-overlapping (left, right) adjacency
    into ``merged``. The accumulator trick — compare the fold state's
    LAST element, not the raw neighbour — is what gives the classic
    greedy semantics: a freshly merged token never re-matches as
    ``left`` (``merged != left`` since ``right`` is non-empty), while
    an untouched symbol still can ("a a a" with pair (a,a) becomes
    [aa, a], not [aa, aa's ghost]).
    """
    for s in (left, right, merged):
        if "'" in s or "\\" in s:
            raise ValueError(f"bpe: unmergeable symbol {s!r}")
    return (
        "CASE WHEN size(syms) < 2 THEN syms ELSE "
        "aggregate(slice(syms, 2, size(syms) - 1), array(syms[0]), "
        "(acc, x) -> CASE WHEN element_at(acc, -1) = '" + left + "' "
        "AND x = '" + right + "' "
        "THEN concat(slice(acc, 1, size(acc) - 1), array('" + merged + "')) "
        "ELSE concat(acc, array(x)) END) END"
    )


def _bpe_batch_fold_sql(pairs) -> str:
    """SQL for ONE simultaneous fold pass applying a whole batch of
    symbol-DISJOINT merges (list of ``(left, right, merged)``). The
    accumulator fold tests every batch pair at each position; because
    accepted pairs share no symbol (and no pair's merged string equals
    another's left/right/merged), at most one pair can match at a
    position and the single pass is confluent with applying the pairs
    one at a time in any order — which is what the DuckDB oracle does.
    """
    for syms in pairs:
        for s in syms:
            if "'" in s or "\\" in s:
                raise ValueError(f"bpe: unmergeable symbol {s!r}")
    whens = "".join(
        "WHEN element_at(acc, -1) = '" + left + "' AND x = '" + right + "' "
        "THEN concat(slice(acc, 1, size(acc) - 1), array('" + merged + "')) "
        for left, right, merged in pairs
    )
    return (
        "CASE WHEN size(syms) < 2 THEN syms ELSE "
        "aggregate(slice(syms, 2, size(syms) - 1), array(syms[0]), "
        "(acc, x) -> CASE " + whens + "ELSE concat(acc, array(x)) END) END"
    )


def bpe_select_batch(top, batch: int):
    """Conservative disjoint-batch selection shared by the Spark
    learner and (structurally) the DuckDB oracle: scan the ranked
    top-W pair list ``[(l, r, cnt), ...]`` in order and accept a pair
    iff its symbol set {l, r, l||r} is disjoint from the symbol sets
    of ALL earlier pairs in the list — accepted or not. Conflicting
    against every higher-ranked pair (not just accepted ones) is
    deliberately conservative: it needs no sequential accepted-set
    state, so the oracle can express it as a rank self-join (NOT
    EXISTS over smaller row_number) instead of a recursive CTE. Rank
    1 is always accepted, so every round makes progress. Returns at
    most ``batch`` ``(l, r, m, cnt)`` tuples in rank order.
    """
    accepted = []
    seen: set = set()
    for row in top:
        left, right, cnt = row[0], row[1], int(row[2])
        merged = left + right
        trio = {left, right, merged}
        if not (trio & seen):
            accepted.append((left, right, merged, cnt))
            if len(accepted) >= batch:
                break
        seen |= trio
    return accepted


def _bpe_state(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    batch: int = 1,
    top_window: int | None = None,
    alphabet: str = "chars",
    memo: bool = False,
):
    """Shared BPE learner: returns ``(merges, words)`` where ``merges``
    is the ordered list of ``(step, left, right, merged, pair_count)``
    tuples and ``words`` is the word-frequency dictionary DataFrame
    with the post-merge symbol arrays (columns word, freq, syms).

    Scale contract (the reason BPE trains fine at 100 TB): the corpus
    is touched EXACTLY ONCE — one map-side-combined ``groupBy(word)``
    reduces it to the vocabulary dictionary (|V| rows, millions at
    web scale vs trillions of corpus tokens). Every counting ROUND
    then runs on the dictionary alone: one vocab-sized pair-count
    shuffle plus ONE bounded driver collect (the top-W ranked pairs,
    a TakeOrdered — never a global sort), from which up to ``batch``
    pairwise-DISJOINT merges are accepted (:func:`bpe_select_batch`)
    and applied in ONE simultaneous fold pass. The dictionary is
    eagerly ``localCheckpoint``-ed once per round: without the lineage
    cut, each chained fold re-inlines the previous one and Catalyst
    analysis cost grows ~4× PER ROUND (measured in r5). Sequential
    BPE's wall time is bounded by DRIVER JOB COUNT, not data — one
    argmax job per merge means a 32k-merge vocabulary is 32k Spark
    jobs (the r5 verdict's ceiling). Batching divides the job count
    by the per-round acceptance (≥1, typically ~batch/2 on natural
    text), which is what makes real vocabulary sizes reachable; the
    per-round cost itself stays flat (SCALING.md has the measured
    curve). ``batch=1`` IS classic sequential BPE (rank-1 pair per
    round), bit-identical to Sennrich-style reference output.

    Counts convention: an accepted pair reports its count from the
    round's START (pre-batch) — with batch=1 exactly the classic
    convention. Schedule (r7, the budget-filling form): the ROUND COUNT
    is static at ``2 * ceil(n_merges / batch)`` — the oracle unrolls it
    as SQL text, so it must not depend on data — but each round's
    acceptance cap is ``min(batch, n_merges - accepted_so_far)``, which
    IS data-dependent and fine: the oracle derives it as a scalar
    subquery over the earlier rounds' accepted CTEs (the same
    earlier-stages trick as the step offsets). Conflict-heavy rounds
    under-fill and later spare rounds take up the slack — on natural
    text the budget fills (r6's single-pass schedule returned 39 of 64
    requested merges on the driver corpus; the 2x schedule fills all
    64), though semantics remain "UP TO n_merges": a corpus whose
    top-window acceptance stays far below ``batch`` can still exhaust
    the 2x headroom short. Once the budget fills, the Spark
    loop breaks — the remaining static rounds have cap 0 and are
    no-ops on both engines. ``batch=1`` acceptance is always exactly
    1/round (rank 1 never conflicts), so sequential BPE still stops
    after ``n_merges`` rounds, bit-identical to the classic schedule.

    ``alphabet`` selects the base symbol space (r10):

    - ``"chars"`` (default, the r5-r9 behaviour): lowercased
      ``[a-z]+`` words split to single characters; anything outside
      the alphabet is excluded from learning (and encodes as unk).
    - ``"bytes"``: GPT-2-style byte-level BPE — EVERY whitespace-
      separated word participates, case preserved, symbolized as its
      UTF-8 byte sequence. Symbols are spelled as two-uppercase-hex-
      digit strings (``hex(encode(word))`` split into pairs), which
      keeps the whole fold/batch machinery (and the unrolled DuckDB
      oracle) byte-for-byte shareable with char mode: hex pairs
      contain no quote, backslash, or space, and a merged symbol is
      just the concatenation of its parts' hex. Numbers, punctuation
      runs, and non-Latin scripts all become real symbol sequences —
      no word is ever out-of-alphabet, so byte-mode encoding has NO
      unk token (the r9 verdict's Missing #1).

    ``memo=True`` (r11) serves the learned state from the session-
    scoped :func:`.state_memo`, keyed by the semantic hash of the base
    dictionary plan plus every learning parameter — the trained-
    tokenizer-as-index architecture (a real pipeline trains ONCE and
    serves the merge table to every downstream encode; re-running the
    sequential learner per encode call was ~15 s of the 63 s r10 bench
    wall, the same class of fixed cost the ANN index memo removed in
    r4). Encode/stats callers default to the memo; :func:`bpe_learn`
    never memoizes — training itself must stay honestly measurable.
    Correctness contract is ``_memo``'s: immutable inputs (write-once
    parquet), same-session only; a semantically different input plan
    or changed parameter is a different key and retrains.
    """
    if n_merges < 1:
        raise ValueError("bpe: n_merges must be >= 1")
    if batch < 1:
        raise ValueError("bpe: batch must be >= 1")
    if text_col not in df.columns:
        raise ValueError(f"bpe: unknown column {text_col!r}")
    if alphabet not in ("chars", "bytes"):
        raise ValueError(f"bpe: unknown alphabet {alphabet!r}")
    if top_window is None:
        # 8x (not 4x): the conservative disjointness rule rejects more
        # of a shallow window, and the deeper rank list costs only a
        # bigger bounded collect + an O(W^2) oracle self-join
        top_window = max(4, 8 * batch)
    if alphabet == "chars":
        stream = df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        ).filter(F.col("word").rlike(_BPE_WORD_RE))
        syms = F.expr("filter(split(word, '(?!^)'), x -> x != '')")
    else:
        # byte mode: no lowercasing (engine Unicode case maps differ —
        # DuckDB lowers U+0130 to 'i', Java to 'i' + combining dot),
        # explicit whitespace class (Java \s includes \x0b, RE2 \s
        # does not), every non-empty word kept
        stream = df.select(
            F.explode(F.split(F.col(text_col), _WS_RE)).alias("word")
        ).filter(F.col("word") != "")
        syms = F.expr(
            "regexp_extract_all(hex(encode(word, 'UTF-8')), '..', 0)"
        )
    base = (
        stream.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", syms)
    )
    if memo:
        from . import _memo

        key = (
            "bpe_state",
            _memo.session_key(df),
            _memo.plan_hash(base),
            n_merges,
            batch,
            top_window,
            alphabet,
        )
        return _memo.state_memo(
            key,
            lambda: _bpe_state_run(base, n_merges, batch, top_window),
        )
    return _bpe_state_run(base, n_merges, batch, top_window)


def _bpe_state_run(base: DataFrame, n_merges: int, batch: int, top_window: int):
    base = base.persist()
    words = base
    merges = []
    # STATIC round count (the oracle unrolls it as SQL text), DYNAMIC
    # per-round cap min(batch, n_merges - accepted): the cap depends
    # only on EARLIER rounds' acceptance, which the unrolled oracle
    # reads back as a scalar subquery over its own earlier CTEs — so
    # under-filled rounds are compensated by the 2x headroom and the
    # budget fills unless the corpus exhausts first.
    rounds = 2 * (-(-n_merges // batch))
    step = 0
    for _ in range(rounds):
        cap = min(batch, n_merges - step)
        if cap <= 0:
            break
        pairs = (
            words.select(
                "freq",
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1), "
                    "(x, i) -> struct(x AS l, element_at(syms, i + 2) AS r))"
                ).alias("ps"),
            )
            .select(F.explode("ps").alias("p"), "freq")
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("pair_count"))
        )
        top = (
            pairs.orderBy(F.desc("pair_count"), "l", "r")
            .limit(top_window)
            .collect()
        )
        if not top:
            break
        accepted = bpe_select_batch(
            [(r["l"], r["r"], r["pair_count"]) for r in top], cap
        )
        for left, right, merged, cnt in accepted:
            step += 1
            merges.append((step, left, right, merged, cnt))
        # r13 (guide §1.2 "per-task work" at the DRIVER): the
        # checkpoint is LAZY — the next round's pair-count collect
        # materializes the folded dictionary as part of its own job, so
        # each round costs ONE Spark job instead of two (the eager form
        # ran a dedicated materialization job per round; at 16 rounds
        # that was half of bpe_learn's driver job count). The lineage
        # cut itself is unchanged: the checkpoint still truncates the
        # fold chain the moment it is computed, so Catalyst analysis
        # stays flat per round (the r5 4×-growth fix). The final
        # round's dictionary materializes at its first downstream
        # action, one fold above the previous round's checkpoint.
        words = words.withColumn(
            "syms",
            F.expr(
                _bpe_batch_fold_sql([(a, b, m) for a, b, m, _ in accepted])
            ),
        ).localCheckpoint(eager=False)
    base.unpersist()
    return merges, words


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    batch: int = 1,
) -> DataFrame:
    """Learn byte-pair-encoding merges over a document corpus — the
    tokenizer-training primitive every LLM data pipeline runs before
    anything else. Classic word-frequency BPE (Sennrich et al. 2016):
    words split to characters, then rounds of "count all adjacent
    symbol pairs weighted by word frequency, fuse the most frequent
    pair(s) everywhere" with deterministic tie-breaks (count DESC,
    then left/right lexicographic). ``batch=1`` (default) is exact
    sequential BPE; ``batch>1`` accepts up to ``batch`` pairwise-
    disjoint merges per counting round (:func:`bpe_select_batch`) —
    the standard frequency-BPE batching that divides driver job count
    by ~batch/2 and makes 32k+-merge vocabularies reachable (see
    :func:`_bpe_state`'s scale contract).

    Returns one row per learned merge: (step, left_sym, right_sym,
    merged, pair_count). Pair counts follow the standard convention of
    counting every adjacent position ("a a a" contributes 2 to (a,a));
    batched rounds report round-start counts. See :func:`_bpe_state`
    for why this runs at corpus scale: the corpus is read once;
    iterations touch only the vocabulary.
    """
    merges, _ = _bpe_state(
        df, text_col=text_col, n_merges=n_merges, batch=batch
    )
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("step", IntegerType(), False),
            StructField("left_sym", StringType(), False),
            StructField("right_sym", StringType(), False),
            StructField("merged", StringType(), False),
            StructField("pair_count", LongType(), False),
        ]
    )
    return df.sparkSession.createDataFrame(merges, schema)


def bpe_token_stats(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    key_cols=("source",),
    memo: bool = True,
) -> DataFrame:
    """Tokenizer yield report: learn ``n_merges`` BPE merges on the
    corpus, tokenize it with them, and report per-key token economics
    — the dial a data team reads when sizing a vocabulary ("how many
    tokens does this source cost at vocab size V?"). Returns per key:
    n_words, n_chars, n_tokens, tokens_per_word, chars_per_token
    (ratios rounded to 6 places).

    ``memo=True`` (default) serves the trained merges from the session
    memo keyed by the input PLAN's semantic hash — plan identity, not
    data identity: rewriting the same file path in-session would serve
    stale merges. Pass ``memo=False`` for mutable inputs, or call
    ``_memo.clear_memos()`` after a rewrite (see ``_bpe_state``).

    Scale: tokenization is a BROADCAST join of the word stream against
    the learned vocabulary dictionary (word -> token count) — the
    corpus is never shuffled; the only wide op is the per-key final
    aggregate, which is map-side combined to |keys| rows. Words
    outside the learnable alphabet ([a-z]+ after lowercasing) are
    excluded on both the learning and the counting side, so the ratios
    describe exactly the modeled stream.
    """
    key_cols = list(key_cols)
    for c in [*key_cols, text_col]:
        if c not in df.columns:
            raise ValueError(f"bpe_token_stats: unknown column {c!r}")
    # serving path: the trained dictionary comes from the session memo
    # (see _bpe_state's memo contract) — training stays bpe_learn's
    # cost; memo=False is the documented mutable-input escape hatch
    _, words = _bpe_state(
        df, text_col=text_col, n_merges=n_merges, memo=memo
    )
    vocab = words.select(
        "word",
        F.size("syms").cast("long").alias("__wtok__"),
        F.length("word").cast("long").alias("__wchr__"),
    )
    stream = (
        df.select(
            *key_cols,
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
        )
        .filter(F.col("word").rlike(_BPE_WORD_RE))
    )
    joined = stream.join(F.broadcast(vocab), "word")
    agg = joined.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("__wchr__").cast("long").alias("n_chars"),
        F.sum("__wtok__").cast("long").alias("n_tokens"),
    )
    return agg.select(
        *key_cols,
        "n_words",
        "n_chars",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_words").cast("double"),
            6,
        ).alias("tokens_per_word"),
        F.round(
            F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("chars_per_token"),
    )


def bpe_encode_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
    batch: int = 1,
    memo: bool = True,
) -> DataFrame:
    """Tokenize the corpus with its own learned BPE merges — the
    tokenize-and-pack stage every training pipeline runs between
    tokenizer training (:func:`bpe_learn`) and sequence packing
    (:mod:`.pipeline`'s ``pack_sequences``). Returns one row per
    document: (id, n_words, n_unk, n_tokens, token_ids) where
    ``token_ids`` is the document's full token-id sequence. EVERY
    input document gets a row — null/empty/whitespace-only text
    yields (0, 0, 0, []) rather than silently vanishing, so per-doc
    accounting (packing budgets, joins back on the id) never skips
    rows (late-r9 review finding).

    ``memo=True`` (default) serves the trained merges from the session
    memo keyed by the input PLAN's semantic hash — plan identity, not
    data identity: rewriting the same file path in-session would serve
    stale merges. Pass ``memo=False`` for mutable inputs, or call
    ``_memo.clear_memos()`` after a rewrite (see ``_bpe_state``).

    Id space is the GPT-2-style "base alphabet, then merges in rank
    order": ``'a'..'z'`` take ids 0..25 and the step-k merge takes
    ``25 + k`` (when two merge paths produce the same piece string the
    FIRST step wins), so ids are reproducible from the merge list
    alone — no frequency re-ranking pass. Words outside the learnable
    ``[a-z]+`` alphabet (numbers, punctuation runs, non-Latin) encode
    as the single ``unk_id = 26 + n_accepted_merges``, counted in
    ``n_unk`` — a real pipeline swaps in byte-fallback here; the
    plumbing (per-word piece arrays, id mapping, per-doc reassembly)
    is what this op exercises.

    Scale: the corpus is touched twice — once by the learner's
    vocabulary groupBy (see :func:`_bpe_state`), once by the encode
    pass: a narrow posexplode to the word stream, a BROADCAST join
    against the |V|-row post-merge dictionary, piece→id via an
    inlined-literal map (bounded at 26 + n_merges entries — the PQ
    inline-codebook pattern; at 32k+-merge vocabularies swap the
    literal for a broadcast join on pieces), and ONE per-document
    rebuild shuffle (sorted-struct collect, the
    ``segment_dedup_rewrite`` shape).
    """
    for c in (id_col, text_col):
        if c not in df.columns:
            raise ValueError(f"bpe_encode_docs: unknown column {c!r}")
    # serving path: memoized learned state (see _bpe_state's contract;
    # memo=False is the mutable-input escape hatch)
    merges, words = _bpe_state(
        df, text_col=text_col, n_merges=n_merges, batch=batch, memo=memo
    )
    piece_ids = {chr(97 + i): i for i in range(26)}
    for step, _l, _r, merged, _cnt in merges:
        piece_ids.setdefault(merged, 25 + step)
    unk_id = 26 + len(merges)
    mapping = F.map_from_arrays(
        F.array(*[F.lit(k) for k in piece_ids]),
        F.array(*[F.lit(v) for v in piece_ids.values()]),
    )
    # r13 (guide §2.3 "project before the exchange" / §1.2): the
    # piece→id literal map is applied ONCE on the |V|-row dictionary
    # side; the corpus stream's projection no longer carries the
    # 26+n-literal map expression (its per-word transform ran once per
    # corpus token, and every literal sat in the corpus stage's
    # generated code)
    vocab = words.select(
        "word",
        F.transform(
            "syms", lambda s: F.element_at(mapping, s).cast("int")
        ).alias("__vids__"),
    )
    stream = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("__pos__", "word"),
        )
        .filter(F.col("word") != "")
    )
    per_word = stream.join(F.broadcast(vocab), "word", "left").select(
        id_col,
        "__pos__",
        F.coalesce(
            F.col("__vids__"), F.array(F.lit(unk_id).cast("int"))
        ).alias("__ids__"),
        F.col("__vids__").isNull().alias("__unk__"),
    )
    agg = per_word.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.col("__unk__").cast("long")).alias("n_unk"),
        F.flatten(
            F.expr(
                "array_sort(collect_list(struct(__pos__, __ids__)))"
                ".__ids__"
            )
        ).alias("token_ids"),
    )
    # one row per INPUT document: wordless docs (null/empty text)
    # come back as zeros, not as dropped rows
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
            F.coalesce("n_unk", F.lit(0)).cast("long").alias("n_unk"),
            F.size("token_ids").cast("long").alias("n_tokens"),
            "token_ids",
        )
    )


def bpe_encode_bytes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
    batch: int = 1,
    memo: bool = True,
) -> DataFrame:
    """Byte-level BPE tokenize (r10 — the GPT-2 byte-fallback form of
    :func:`bpe_encode_docs`): learn ``n_merges`` merges over the
    corpus's UTF-8 BYTE sequences and encode every document to its
    full token-id stream. The base alphabet is all 256 byte values, so
    numbers, punctuation runs, and non-Latin scripts encode as real
    ids — there is NO unk token (closes the r9 verdict's Missing #1:
    char-mode collapsed every non-``[a-z]+`` word to one unk id).

    Id space, GPT-2 style: byte value b takes id b (0..255) and the
    step-k merge takes ``255 + k`` (first step wins on duplicate piece
    strings), so ids are reproducible from the merge list alone.
    Words absent from the learned dictionary (possible only when
    encoding a DIFFERENT corpus than the one trained on) fall back to
    their raw byte ids with no merges applied — the byte-fallback
    contract: every string always encodes.

    Returns one row per input document: (id, n_words, n_bytes,
    n_tokens, token_ids); null/empty/whitespace-only text yields
    (0, 0, 0, []) rather than vanishing (keep-every-row contract).

    ``memo=True`` (default) serves the trained merges from the session
    memo keyed by the input PLAN's semantic hash — plan identity, not
    data identity: rewriting the same file path in-session would serve
    stale merges. Pass ``memo=False`` for mutable inputs, or call
    ``_memo.clear_memos()`` after a rewrite (see ``_bpe_state``).

    Scale: identical plan shape to :func:`bpe_encode_docs` — the
    corpus is touched once by the learner's vocabulary groupBy and
    once by the encode pass (narrow posexplode → BROADCAST dictionary
    join → inlined 256+n_merges-literal piece→id map → ONE per-doc
    rebuild shuffle). At 32k+-merge vocabularies swap the literal map
    for a broadcast join on pieces, exactly as the char-mode docstring
    prescribes.
    """
    for c in (id_col, text_col):
        if c not in df.columns:
            raise ValueError(f"bpe_encode_bytes: unknown column {c!r}")
    # serving path: memoized learned state (see _bpe_state's contract;
    # memo=False is the mutable-input escape hatch)
    merges, words = _bpe_state(
        df, text_col=text_col, n_merges=n_merges, batch=batch,
        alphabet="bytes", memo=memo,
    )
    piece_ids = {"%02X" % b: b for b in range(256)}
    for step, _l, _r, merged, _cnt in merges:
        piece_ids.setdefault(merged, 255 + step)
    mapping = F.map_from_arrays(
        F.array(*[F.lit(k) for k in piece_ids]),
        F.array(*[F.lit(v) for v in piece_ids.values()]),
    )
    # r13 (guide §2.3/§1.2): the 256+n-literal piece→id map is applied
    # ONCE on the |V|-row dictionary side — the corpus projection's
    # generated code no longer carries 512+ literals, and the per-token
    # map transform disappears from the stream
    vocab = words.select(
        "word",
        F.transform(
            "syms", lambda s: F.element_at(mapping, s).cast("int")
        ).alias("__vids__"),
    )
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
    # byte fallback for out-of-dictionary words: raw byte symbols, no
    # merges applied (encoding the training corpus itself never takes
    # this branch — the dictionary covers every word by construction).
    # A base hex pair's id IS its byte value, so the fallback needs no
    # map at all: conv(hex, 16, 10) is the id.
    base_ids = F.expr(
        "transform(regexp_extract_all(hex(encode(word, 'UTF-8')), "
        "'..', 0), s -> cast(conv(s, 16, 10) as int))"
    )
    per_word = stream.join(F.broadcast(vocab), "word", "left").select(
        id_col,
        "__pos__",
        F.octet_length("word").cast("long").alias("__nb__"),
        F.coalesce(F.col("__vids__"), base_ids).alias("__ids__"),
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


def readability_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch-style readability per document — the classic
    audience-level screen a corpus-mix designer reads next to
    :func:`quality_scores` (is this source legalese, textbook prose,
    or chat?): words, sentences, vowel-group syllables, and the Flesch
    reading-ease index ``206.835 − 1.015·(W/S) − 84.6·(Syl/W)``.

    Heuristics are deliberately regex-only so both engines agree
    byte-for-byte: sentences = non-empty ``[.!?]+`` splits, syllables
    = maximal ``[aeiouyAEIOUY]+`` runs (vowel runs never span
    whitespace, so no per-word explode is needed; the explicit
    both-case class avoids ``lower()``, whose non-ASCII behavior can
    differ between engines) — the standard cheap estimators, not a
    hyphenation dictionary. The index
    is published q3 fixed point with INTEGER floor divisions
    (``206835 − 1015·W div S − 84600·Syl div W``, all operands
    non-negative) — engine-identical, no float ratio enters the hash.

    Plan: zero-shuffle narrow projection (three regex counts per row).
    Rows with no words or no sentences are excluded (the index is
    undefined there). Returns (id, n_words, n_sentences, n_syllables,
    flesch_q3).
    """
    if text_col not in df.columns:
        raise ValueError(f"readability_scores: unknown column {text_col!r}")
    t = F.col(text_col)
    words = F.size(
        F.filter(
            F.split(F.trim(t), r"\s+"), lambda x: x != F.lit("")
        )
    ).cast("long")
    sentences = F.size(
        F.filter(
            F.split(t, r"[.!?]+"), lambda x: F.trim(x) != F.lit("")
        )
    ).cast("long")
    syllables = F.size(
        F.expr(f"regexp_extract_all({text_col}, '[aeiouyAEIOUY]+', 0)")
    ).cast("long")
    base = df.filter(t.isNotNull()).select(
        F.col(id_col),
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
    )
    return base.filter(
        (F.col("n_words") > 0) & (F.col("n_sentences") > 0)
    ).select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "CAST(206835 - 1015 * n_words div n_sentences"
            " - 84600 * n_syllables div n_words AS BIGINT)"
        ).alias("flesch_q3"),
    )


# --------------------------------------------------------------------------
# language ID v3: char-trigram profiles (textcat family)

def trigram_profile_rows() -> list[tuple[str, str, int, int]]:
    """The char-trigram profile relation for the Latin branch,
    DERIVED deterministically from the same ``_LANG_PROFILES``
    function-word lists v2 votes over (Cavnar & Trenkle 1994's
    insight: a language's highest-frequency character n-grams come
    from its function words, so the word lists ARE the n-gram source
    — no new shipped data). Each profile word is padded with single
    spaces and decomposed into overlapping trigrams; rows are
    ``(lang, trigram, count, profile_total)`` where ``profile_total``
    is the language's summed trigram count (the normalizer that makes
    scores comparable across profiles of different sizes)."""
    rows: list[tuple[str, str, int, int]] = []
    for lang, ws in _LANG_PROFILES.items():
        counts: dict[str, int] = {}
        for w in ws:
            p = f" {w} "
            for i in range(len(p) - 2):
                tg = p[i : i + 3]
                counts[tg] = counts.get(tg, 0) + 1
        total = sum(counts.values())
        rows.extend((lang, tg, c, total) for tg, c in counts.items())
    return rows


def language_id_trigram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    memo: bool = True,
) -> DataFrame:
    """Char-trigram language ID over the Latin branch — the DEPTH
    companion to the zero-shuffle :func:`with_language_id_v2` gate:
    where v2 votes on whole function-word hits (and so needs an exact
    word match), trigram overlap scores morphology — inflected forms,
    compounds, and short snippets still hit their language's
    character patterns. Score per language =
    ``matched_trigram_weight * 1e6 div profile_total`` (exact integer
    division — cross-engine stable); the winner is the max score with
    the language code as the deterministic tie-break; no trigram hit
    at all → ``und``.

    Plan: normalize + pad each document once, explode its overlapping
    trigrams (~1 row per char — the honest cost of n-gram scoring;
    confine this op to ID-ambiguous slices at 100 TB and let v2 gate
    the rest), join the ≤|langs·trigrams| profile relation BROADCAST,
    one (id, lang) aggregate bounded by 24 languages per doc, then a
    row_number window over that tiny relation; a final broadcast-side
    left join restores zero-hit documents as 'und'. Returns
    (id, trigram_lang, score_q6).

    ``memo=True`` serves the BUILT plan from the session memo (the
    compiled-classifier pattern shared with ``with_language_id_v2`` /
    ``justext_blocks``): the 774-struct literal profile relation costs
    more py4j/Catalyst time to construct than to broadcast. Execution
    always runs live; the standing staleness contract
    (``_memo.clear_memos`` / ``memo=False``) applies.
    """
    if memo:
        from . import _memo

        key = (
            "language_id_trigram",
            _memo.session_key(df),
            _memo.plan_hash(df),
            text_col,
            id_col,
        )
        return _memo.plan_memo(
            key,
            lambda: language_id_trigram(df, text_col, id_col, memo=False),
        )
    norm = F.lower(
        F.trim(F.regexp_replace(F.col(text_col), _WS_RE, " "))
    )
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    base = df.select(F.col(id_col), padded.alias("__s__"))
    tgs = base.select(
        F.col(id_col),
        F.explode(
            # CASE guard: Spark's sequence(1, 0) DESCENDS, so a
            # sub-3-char (or NULL) string must short-circuit to an
            # empty array instead of minting phantom trigrams
            F.expr(
                "CASE WHEN length(__s__) >= 3 THEN"
                " transform(sequence(1, length(__s__) - 2),"
                " i -> substr(__s__, i, 3))"
                " ELSE CAST(array() AS array<string>) END"
            )
        ).alias("tg"),
    )
    # literal relation, not createDataFrame: the 774-row profile feeds
    # a broadcast build, and a Python-rows frame forks Python workers
    # on every build (the weighted_mix lesson)
    from ._relation import literal_relation

    spark = df.sparkSession
    prof = literal_relation(
        spark,
        [list(r) for r in trigram_profile_rows()],
        ["lang", "tg", "c", "total"],
    )
    # r12 (guide §2.1 "remove shuffles outright"): ONE (id) aggregate of
    # |langs| conditional sums replaces the old (id, lang) aggregate +
    # second exchange + row_number window — the per-language matched
    # counts land as one wide row per document, and the argmax (max
    # score, language-code-ascending tie-break) is in-row struct-max
    # over a |langs|-wide literal array. Identical integers: score is
    # the same exact ``sum(c) * 1e6 div total`` with total inlined as
    # the per-language literal, and a language is a candidate only when
    # it matched >= 1 trigram (the old inner join's presence rule).
    totals = {lang: total for lang, _tg, _c, total in trigram_profile_rows()}
    langs = sorted(totals)
    per = (
        tgs.join(F.broadcast(prof), on="tg")
        .groupBy(id_col)
        .agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("lang") == l, F.col("c"))),
                    F.lit(0),
                ).cast("long").alias(f"__c{i}__")
                for i, l in enumerate(langs)
            ]
        )
    )
    # struct comparison is field-ordered: (score, -idx) maxes on score
    # first, then on the SMALLEST index (= lexicographically first
    # language, langs being sorted) — the window's exact tie-break
    cand = F.array(
        *[
            F.struct(
                F.expr(
                    f"CAST(__c{i}__ * 1000000 div {totals[l]} AS BIGINT)"
                ).alias("s"),
                F.lit(-i).cast("int").alias("ni"),
                F.col(f"__c{i}__").alias("c"),
            )
            for i, l in enumerate(langs)
        ]
    )
    lang_lit = F.array(*[F.lit(l) for l in langs])
    best = per.select(
        F.col(id_col),
        F.array_max(F.filter(cand, lambda x: x["c"] > 0)).alias("__b__"),
    ).select(
        F.col(id_col),
        F.element_at(lang_lit, -F.col("__b__")["ni"] + 1).alias("__tl__"),
        F.col("__b__")["s"].alias("__sc__"),
    )
    return (
        df.select(F.col(id_col))
        .join(best, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__tl__"), F.lit("und")).alias("trigram_lang"),
            F.coalesce(F.col("__sc__"), F.lit(0)).cast("long").alias(
                "score_q6"
            ),
        )
    )
