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
    """Whitespace token count, safe on empty/null text."""
    return F.coalesce(F.size(word_tokens(col)), F.lit(0))


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


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0, 1]: combines length, alpha ratio,
    space ratio, and mean word length. All arithmetic on codegen'd
    expressions; tune weights per corpus."""
    n = F.length(col).cast("double")
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("double")
    spaces = F.length(F.regexp_replace(col, r"[^ ]", "")).cast("double")
    toks = token_count(col).cast("double")
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    space_ratio = F.when(n > 0, spaces / n).otherwise(F.lit(0.0))
    mean_word_len = F.when(toks > 0, (n - spaces) / toks).otherwise(F.lit(0.0))
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
