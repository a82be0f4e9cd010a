"""Query execution over the table-native inverted index (SURVEY.md §2.6-2.7).

Mirrors the reference planner ``Dataset::search``
(/root/reference/src/db/search.rs:74-218): parse → boolean combine →
score → top-k, re-expressed as one Spark job per query:

    postings scan (term-pruned) → per-leaf BM25 column arithmetic →
    single groupBy(doc_id) boolean combine → filter pushdown →
    orderBy(score DESC, doc_id ASC).limit(k)

Design notes
------------
- Term statistics (df) for the handful of query terms are collected
  driver-side once per query (the term dictionary is broadcast-sized for
  any query); every leaf score is then pure codegen'd column arithmetic —
  no join on the postings at all for term leaves.
- Boolean combine (Q2-Q5) is ONE shuffle: groupBy(doc_id) computing the
  score sum, the count of distinct Must leaves matched, and a MustNot
  flag. Scores are summed in deterministic leaf order (array_sort before
  the fold) so ranks are stable across partition counts (SURVEY.md §7.4).
- Facet/metadata filters are pushed BELOW top-k (semi-join before the
  limit), replacing the reference's 10x over-fetch + post-filter hack
  (/root/reference/src/db/search.rs:153-196) with a plan that is
  rank-equivalent and never under-fetches.
- Tie-break pinned to (score DESC, doc_id ASC) — Tantivy's internal
  DocAddress order is not reproducible (SURVEY.md R3).
- Pinned divergence: a query with only MustNot clauses matches nothing
  in Tantivy; we instead treat it as AllQuery minus exclusions (more
  useful; documented).
- Phrase scoring (Q6) pinned as: tf_phrase = number of adjacency
  matches; idf_phrase = sum of constituent-term idfs (Lucene-style);
  positions are pre-filter ordinals so adjacency survives the
  long-token filter.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1
from .bm25 import idf_py
from .postings import InvertedIndex
from .queryparse import Leaf, QueryPlan, parse_query
from .tokenizer import DEFAULT_MODE


def _tf_norm(tf_col: Column, doc_len_col: Column, avgdl: float, k1: float, b: float) -> Column:
    tf = tf_col.cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * doc_len_col.cast("double") / F.lit(float(avgdl)))
    return tf * F.lit(k1 + 1.0) / (tf + norm)


def _phrase_frame(
    cand: DataFrame, leaf: Leaf, df_map: dict[str, int], stats, k1: float, b: float
) -> DataFrame | None:
    """(doc_id, tf_phrase, doc_len) for adjacent-position phrase matches."""
    if any(t not in df_map for t in leaf.terms):
        return None
    first = cand.filter(F.col("term") == leaf.terms[0]).select(
        "doc_id", F.col("positions").alias("pos"), "doc_len"
    )
    out = first
    for nxt in leaf.terms[1:]:
        nxt_df = cand.filter(F.col("term") == nxt).select(
            F.col("doc_id").alias("doc_id_r"), F.col("positions").alias("pos_r")
        )
        out = (
            out.join(nxt_df, out["doc_id"] == nxt_df["doc_id_r"], "inner")
            .withColumn(
                "pos",
                F.array_intersect(F.transform("pos", lambda x: x + 1), F.col("pos_r")),
            )
            .drop("doc_id_r", "pos_r")
            .filter(F.size("pos") > 0)
        )
    idf_sum = sum(idf_py(df_map[t], stats.n_docs) for t in leaf.terms)
    return out.select(
        "doc_id",
        (
            F.lit(idf_sum)
            * _tf_norm(F.size("pos"), F.col("doc_len"), stats.avgdl, k1, b)
            * F.lit(leaf.boost)
        ).alias("score"),
    )


def leaf_score_frames(
    index: InvertedIndex, plan: QueryPlan, k1: float = BM25_K1, b: float = BM25_B
) -> list[tuple[int, DataFrame | None]]:
    """One (leaf_id, DataFrame(doc_id, score)) per leaf; None = term absent."""
    terms = plan.all_terms()
    cand = index.postings.filter(F.col("term").isin(terms))
    df_map = {
        r["term"]: r["df"]
        for r in index.terms.filter(F.col("term").isin(terms)).select("term", "df").collect()
    }
    frames: list[tuple[int, DataFrame | None]] = []
    for i, leaf in enumerate(plan.leaves):
        if leaf.is_phrase:
            frames.append((i, _phrase_frame(cand, leaf, df_map, index.stats, k1, b)))
            continue
        term = leaf.terms[0]
        if term not in df_map:
            frames.append((i, None))
            continue
        idf = idf_py(df_map[term], index.stats.n_docs)
        frame = cand.filter(F.col("term") == term).select(
            "doc_id",
            (
                F.lit(idf) * _tf_norm(F.col("tf"), F.col("doc_len"), index.stats.avgdl, k1, b)
                * F.lit(leaf.boost)
            ).alias("score"),
        )
        frames.append((i, frame))
    return frames


def execute_plan(
    index: InvertedIndex,
    plan: QueryPlan,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Boolean-combine the plan into DataFrame(doc_id, score)."""
    spark = index.postings.sparkSession
    musts, shoulds, must_nots = set(plan.musts), set(plan.shoulds), set(plan.must_nots)

    def all_docs() -> DataFrame:
        if docs is None:
            return index.postings.select("doc_id").distinct().withColumn("score", F.lit(1.0))
        return docs.select(F.col(id_col).cast("long").alias("doc_id")).withColumn(
            "score", F.lit(1.0)
        )

    if plan.is_all:
        return all_docs()  # AllQuery, score 1.0 (src/db/search.rs:115-117,146-149)

    frames = leaf_score_frames(index, plan, k1=k1, b=b)
    # A Must leaf on an absent term means nothing can match.
    if any(f is None and i in musts for i, f in frames):
        return spark.createDataFrame([], "doc_id long, score double")
    live = [(i, f) for i, f in frames if f is not None]
    positive = [(i, f) for i, f in live if i not in must_nots]
    exclusions = [f for i, f in live if i in must_nots]
    plan_has_positive = any(i not in must_nots for i in range(len(plan.leaves)))

    if not plan_has_positive:
        base = all_docs()  # pinned divergence: NOT-only query = AllQuery minus exclusions
    elif not positive:
        # positive leaves exist but all reference absent terms → no match
        return spark.createDataFrame([], "doc_id long, score double")
    else:
        tagged = [
            f.select("doc_id", F.lit(i).alias("leaf_id"), "score") for i, f in positive
        ]
        union = reduce(DataFrame.unionByName, tagged)
        must_ids = sorted(musts)
        agg = union.groupBy("doc_id").agg(
            F.array_sort(F.collect_list(F.struct("leaf_id", "score"))).alias("parts"),
            F.count_distinct(
                F.when(F.col("leaf_id").isin(must_ids) if must_ids else F.lit(False), F.col("leaf_id"))
            ).alias("must_cnt"),
        )
        base = (
            agg.filter(F.col("must_cnt") == len(musts))
            .withColumn(
                "score",
                F.aggregate("parts", F.lit(0.0), lambda acc, p: acc + p["score"]),
            )
            .select("doc_id", "score")
        )
    for excl in exclusions:
        base = base.join(excl.select("doc_id"), "doc_id", "left_anti")
    return base


def top_k(
    scored: DataFrame, k: int = 10, offset: int = 0
) -> DataFrame:
    """Deterministic top-k: (score DESC, doc_id ASC), offset+limit (R2/R3).

    Spark compiles this to TakeOrderedAndProject — a per-partition
    bounded heap with a driver merge, exactly the reference's
    TopDocs::with_limit shape (/root/reference/src/db/search.rs:154-162).
    """
    limited = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(offset + k)
    if offset:
        w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        return limited.withColumn("rn", w).filter(F.col("rn") > offset).drop("rn")
    return limited


def search(
    index: InvertedIndex,
    query_text: str | None,
    k: int = 10,
    offset: int = 0,
    doc_filter: Column | None = None,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Full search entry point → DataFrame(doc_id, score), top-k ordered.

    ``doc_filter`` is a predicate over ``docs`` (facet/metadata filters,
    SURVEY.md §2.5); it is applied via semi-join BEFORE top-k.
    """
    plan = parse_query(query_text, mode=mode)
    scored = execute_plan(index, plan, docs=docs, id_col=id_col, k1=k1, b=b)
    if doc_filter is not None:
        if docs is None:
            raise ValueError("doc_filter requires docs")
        keep = docs.filter(doc_filter).select(F.col(id_col).cast("long").alias("doc_id"))
        scored = scored.join(keep, "doc_id", "left_semi")
    return top_k(scored, k=k, offset=offset)
