"""Batch retrieval: score MANY queries in ONE Spark job.

The interactive engine launches a job per query — the right shape for a
serving fallback, the wrong one for offline retrieval (RAG corpus
mining, distillation targets, eval sweeps, hard-negative mining for
training data), where millions of queries amortize a single pass over
the index. This module executes a whole query batch as one dataflow:

    parse all queries driver-side (tiny)
      → ONE pruned decode of the union of their terms' posting blocks
      → broadcast-join a (query, leaf, term, weight) table
      → per-(query, doc) boolean combine (identical fold order and
        must/must-not semantics as the single-query engine)
      → per-query top-k via a window over (score DESC, doc_id ASC)

Scale shape: posting blocks are decoded once no matter how many queries
reference a term; the leaf table is queries×leaves rows (metadata-sized,
broadcast); the only shuffles are the (query_id, doc_id) combine and the
per-query window — both keyed wide enough to use every executor. Rank
and score identity with :func:`segment_search.search_segments` per query
is pinned by tests.

v1 scope: the flat boolean subset (terms, AND/OR/NOT, boosts). Phrases,
nested groups, and AllQuery raise — callers fall back to per-query
search for those (the reference's own query set is flat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1
from .queryparse import parse_query
from .segment_search import _term_meta, decode_postings
from .segments import SegmentIndex
from .tokenizer import DEFAULT_MODE


def batch_search_segments(
    si: SegmentIndex,
    queries: list[tuple[int, str]] | dict[int, str],
    k: int = 10,
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """→ DataFrame(query_id, doc_id, score, rank) — top-k per query.

    ``queries``: (query_id, query_text) pairs. Parsing happens
    driver-side (queries are metadata-scale even at millions; the leaf
    table they produce is broadcast)."""
    if isinstance(queries, dict):
        queries = list(queries.items())
    spark = si.spark

    plans = []
    for qid, text in queries:
        plan = parse_query(text, mode=mode)
        if plan.is_all:
            raise ValueError(f"query {qid!r}: AllQuery not supported in batch mode")
        if plan.root is not None:
            raise ValueError(f"query {qid!r}: nested groups not supported in batch mode")
        if any(l.is_phrase for l in plan.leaves):
            raise ValueError(f"query {qid!r}: phrases not supported in batch mode")
        if not plan.has_positive():
            raise ValueError(f"query {qid!r}: NOT-only queries not supported in batch mode")
        plans.append((qid, plan))

    all_terms = sorted({t for _, p in plans for l in p.leaves for t in l.terms})
    meta = _term_meta(si, all_terms)

    # leaf table: one row per live (query, leaf); a Must leaf on an
    # absent term kills its whole query (single-engine semantics)
    leaf_rows: list[tuple[int, int, str, float, int, int]] = []
    n_musts: dict[int, int] = {}
    for qid, plan in plans:
        dead = False
        rows_q = []
        nm = 0
        for i, leaf in enumerate(plan.leaves):
            t = leaf.terms[0]
            if t not in meta:
                if leaf.occur == "must":
                    dead = True
                    break
                continue  # absent should/not leaves drop (match + exclude nothing)
            is_must = 1 if leaf.occur == "must" else 0
            is_not = 1 if leaf.occur == "must_not" else 0
            nm += is_must
            rows_q.append((qid, i, t, meta[t]["idf"] * leaf.boost, is_must, is_not))
        if dead:
            continue
        if not any(r[5] == 0 for r in rows_q):
            continue  # every positive leaf was absent → no match
        n_musts[qid] = nm
        leaf_rows.extend(rows_q)

    out_schema = "query_id long, doc_id long, score double, rank int"
    if not leaf_rows:
        return spark.createDataFrame([], out_schema)
    live_terms = sorted({r[2] for r in leaf_rows})
    leaves = spark.createDataFrame(
        leaf_rows, "query_id long, leaf_id int, term string, mult double, is_must int, is_not int"
    )
    nmdf = spark.createDataFrame(list(n_musts.items()), "query_id long, n_musts int")

    decoded = decode_postings(si, live_terms, meta, k1=k1, b=b)
    tf = F.col("tf").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("doc_len").cast("double") / F.lit(float(si.stats.avgdl))
    )
    contrib = decoded.join(F.broadcast(leaves), "term").select(
        "query_id",
        "leaf_id",
        "doc_id",
        (F.col("mult") * tf * F.lit(k1 + 1.0) / (tf + norm)).alias("score"),
        "is_must",
        "is_not",
    )
    # per-(query, doc) combine — the _combine_frames semantics with the
    # must-not set carried inside the struct (it varies per query)
    agg = contrib.groupBy("query_id", "doc_id").agg(
        F.array_sort(F.collect_list(F.struct("leaf_id", "score", "is_not"))).alias("parts"),
        F.count_distinct(F.when(F.col("is_must") == 1, F.col("leaf_id"))).alias("must_cnt"),
        F.max("is_not").alias("excl"),
    )
    scored = (
        agg.join(F.broadcast(nmdf), "query_id")
        .filter((F.col("must_cnt") == F.col("n_musts")) & (F.col("excl") == 0))
        .withColumn(
            "score",
            F.aggregate(
                F.filter("parts", lambda p: p["is_not"] == 0),
                F.lit(0.0),
                lambda acc, p: acc + p["score"],
            ),
        )
        .select("query_id", "doc_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
