"""Hybrid retrieval: reciprocal-rank fusion of lexical and semantic
rankings.

A training-data / RAG pipeline rarely retrieves with one signal: BM25
(:func:`tafra_spark.functions.text.bm25_topk`) catches exact-term
matches, embedding cosine (:func:`tafra_spark.functions.similarity
.cosine_topk`) catches paraphrases. Reciprocal-rank fusion (Cormack,
Clarke & Buettcher, SIGIR 2009) combines any number of ranked lists
using only the RANKS — no score normalization across incomparable
scales — and reliably beats each component list.

Absent from the reference (petbox-dev/tafra has no retrieval surface
at all); implemented Spark-first as a pure composition of existing
ranking operators plus one integer aggregate.

Cross-engine discipline: each contribution is the exact integer
``1_000_000_000 div (k0 + rank)`` (integer division on BIGINT in both
engines), so the fused score is an order-independent integer sum and
the (score desc, id) ranking is engine-portable with no float anywhere.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse", "hybrid_search"]


def _rrf_contrib(rank: Column, k0: int) -> Column:
    # floor(1e9 / (k0 + rank)): both engines divide as IEEE doubles and
    # floor — the quotient is ≥ 1/(k0+rank) away from any integer it is
    # not equal to, orders of magnitude beyond double rounding error, so
    # the floored value is the exact integer division on any engine
    return F.floor(
        F.lit(1_000_000_000).cast("long")
        / (F.lit(int(k0)).cast("long") + rank.cast("long"))
    ).cast("long")


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse N ranked lists by reciprocal-rank fusion.

    ``score(d) = Σ_systems 1e9 div (k0 + rank_s(d))`` summed over the
    systems that ranked ``d`` (a list that did not retrieve ``d``
    contributes 0 — the standard RRF convention). ``k0=60`` is the
    constant from the original paper; it damps the dominance of rank-1
    hits so agreement across systems outweighs a single high rank.

    Plan shape: each input list is already top-k-sized (bounded by its
    own retrieval ``k``), so the union is tiny regardless of corpus
    size; one hash aggregate on the doc key fuses them and a
    distributed TakeOrdered (orderBy+limit) emits the final top-k —
    at 100 TB the expensive work stays inside the component retrievers,
    fusion itself never touches the corpus. Returns
    ``(id_col, rrf_q9, n_systems, rank)`` with ties broken by id.
    """
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be non-empty")
    if k0 < 1:
        raise ValueError("rrf_fuse: k0 must be >= 1")
    contribs = [
        r.select(
            F.col(id_col),
            _rrf_contrib(F.col(rank_col), k0).alias("__c__"),
        )
        for r in rankings
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = unioned.groupBy(id_col).agg(
        F.sum("__c__").cast("long").alias("rrf_q9"),
        F.count(F.lit(1)).cast("long").alias("n_systems"),
    )
    top = fused.orderBy(F.col("rrf_q9").desc(), F.col(id_col)).limit(int(k))
    w = Window.orderBy(F.col("rrf_q9").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    k_candidates: int = 50,
    k0: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BM25 + embedding-cosine hybrid search fused with RRF.

    The lexical list is BM25 over ``docs``; the semantic list is exact
    cosine top-k seeded by the stored embedding of ``query_vec_id``
    (query-by-example, the usual setup when the query has a known
    exemplar document). The exemplar itself is excluded from BOTH lists
    so the fused ranking never returns the query document.

    Plan shape: the two retrievers run independently (each with its own
    scale story — BM25 filters the token stream to query terms before
    any shuffle, cosine broadcasts the single query vector); fusion is
    the tiny rank-only aggregate of :func:`rrf_fuse`.
    """
    from .similarity import cosine_topk
    from .text import bm25_topk

    lex = bm25_topk(
        docs.filter(F.col(id_col) != int(query_vec_id)),
        query_terms,
        k=k_candidates,
        text_col=text_col,
        id_col=id_col,
    ).select(F.col(id_col), "rank")
    qdf = embeddings.filter(F.col(vec_id_col) == int(query_vec_id))
    sem = cosine_topk(
        embeddings, qdf, k=k_candidates, id_col=vec_id_col, vec_col=vec_col
    ).select(F.col("neighbor_id").alias(id_col), "rank")
    return rrf_fuse([lex, sem], k=k, k0=k0, id_col=id_col)
