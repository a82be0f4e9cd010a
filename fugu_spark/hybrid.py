"""Hybrid retrieval: fuse lexical (BM25) and embedding (cosine)
candidate lists — the RAG-era retrieval shape the reference's
fulltext-only API (/root/reference/src/db/search.rs) stops short of.

Two standard fusions, both deterministic and oracle-expressible:

- ``rrf_fuse``: Reciprocal Rank Fusion (Cormack et al., SIGIR'09) —
  score(d) = Σ_lists 1/(c + rank_d); rank-only, so score scales never
  need calibrating. The industry default (Elasticsearch/OpenSearch
  hybrid, Vespa).
- ``weighted_fuse``: α·minmax(bm25) + (1−α)·minmax(cosine) over the
  candidate union.

Inputs are CANDIDATE LISTS (each already top-N'd by its own engine), so
every frame here is N rows, not corpus-scale: the windows/joins below
are deliberately tiny. The corpus-scale work happens inside the
producing engines (segment search / ANN index), which ship only their
top-N."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .search import top_k

RRF_C = 60.0  # the constant from the RRF paper; every mainstream impl default


def _ranked(df: DataFrame, n: int) -> DataFrame:
    """(doc_id, score) → (doc_id, rank 1..n), deterministic
    (score DESC, doc_id ASC). Single-partition window — inputs are
    top-N candidate lists, not corpus frames."""
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.select("doc_id", "score")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("doc_id", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame], k: int = 10, c: float = RRF_C, n_candidates: int = 100
) -> DataFrame:
    """Reciprocal Rank Fusion over ≥1 (doc_id, score) candidate frames →
    top-k DataFrame(doc_id, score). A doc absent from a list simply gets
    no contribution from it (the paper's convention)."""
    ranked = [_ranked(df, n_candidates) for df in rankings]
    u = reduce(lambda a, b: a.unionByName(b), ranked)
    fused = u.groupBy("doc_id").agg(
        F.sum(1.0 / (F.lit(float(c)) + F.col("rank"))).alias("score")
    )
    return top_k(fused, k=k)


def batch_rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: float = RRF_C,
    n_candidates: int = 100,
) -> DataFrame:
    """RRF for MANY queries in one job: each input is a
    (query_id, doc_id, score) candidate frame (the shape
    ``batch_search_segments`` / ``batch_cosine_topk`` emit) →
    DataFrame(query_id, doc_id, score, rank ≤ k).

    Ranks are recomputed per query (score DESC, doc_id ASC) so inputs
    from engines with different rank conventions fuse identically. Both
    the rank assignment and the final per-query top-k are row_number
    windows keyed by query_id — Catalyst applies WindowGroupLimit, so
    each map task ships at most n_candidates (resp. k) rows per query
    it saw; width scales with the query count, never the corpus."""

    def ranked(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            df.select("query_id", "doc_id", "score")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n_candidates)
            .select("query_id", "doc_id", "rank")
        )

    u = reduce(lambda a, b: a.unionByName(b), [ranked(df) for df in rankings])
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum(1.0 / (F.lit(float(c)) + F.col("rank"))).alias("score")
    )
    w_k = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


def weighted_fuse(
    lexical: DataFrame,
    semantic: DataFrame,
    k: int = 10,
    alpha: float = 0.5,
    n_candidates: int = 100,
) -> DataFrame:
    """α·minmax(lexical) + (1−α)·minmax(semantic) over the candidate
    union → top-k DataFrame(doc_id, score). Scores are min-max
    normalized WITHIN each candidate list (the conventional hybrid-score
    calibration); a doc missing from a list contributes 0 from it; a
    degenerate list (max == min) normalizes to 0."""

    def norm(df: DataFrame, w: float) -> DataFrame:
        cand = _ranked(df, n_candidates).join(
            df.select("doc_id", "score"), "doc_id"
        )
        ext = cand.agg(
            F.min("score").alias("lo"), F.max("score").alias("hi")
        )
        return cand.crossJoin(F.broadcast(ext)).select(
            "doc_id",
            F.when(
                F.col("hi") > F.col("lo"),
                F.lit(w) * (F.col("score") - F.col("lo")) / (F.col("hi") - F.col("lo")),
            )
            .otherwise(F.lit(0.0))
            .alias("part"),
        )

    u = norm(lexical, alpha).unionByName(norm(semantic, 1.0 - alpha))
    fused = u.groupBy("doc_id").agg(F.sum("part").alias("score"))
    return top_k(fused, k=k)


def hybrid_search(
    index,
    embeddings: DataFrame,
    query_text: str,
    query_vec: list[float],
    k: int = 10,
    n_candidates: int = 100,
    fusion: str = "rrf",
    alpha: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str | None = None,
) -> DataFrame:
    """BM25 + cosine hybrid in one call: top-``n_candidates`` from each
    engine, fused by ``fusion`` ('rrf' | 'weighted')."""
    from .analytics.similarity import cosine_topk
    from .search import search
    from .tokenizer import DEFAULT_MODE

    lex = search(index, query_text, k=n_candidates, mode=mode or DEFAULT_MODE)
    sem = cosine_topk(
        embeddings, query_vec, k=n_candidates, id_col=id_col, vec_col=vec_col
    ).withColumnRenamed(id_col, "doc_id")
    if fusion == "rrf":
        return rrf_fuse([lex, sem], k=k, n_candidates=n_candidates)
    if fusion == "weighted":
        return weighted_fuse(lex, sem, k=k, alpha=alpha, n_candidates=n_candidates)
    raise ValueError(f"unknown fusion {fusion!r} (expected 'rrf' or 'weighted')")
