"""IR evaluation metrics over ranked results + graded judgments.

The eval loop every retrieval/training pipeline runs: given a frame of
ranked results (query_id, doc_id, rank) and a qrels frame (query_id,
doc_id, grade ≥ 0; 0 or absent = not relevant), compute per-query
Precision@k, Recall@k, Reciprocal Rank, and nDCG@k — the trec_eval /
pytrec_eval metric set, as pure DataFrame ops.

Plan shape: results ⋈ qrels on (query_id, doc_id) (both frames are
top-k-per-query scale, tiny next to the corpus), one groupBy(query_id)
computing every metric as a conditional aggregate, plus a qrels-only
groupBy for the ideal DCG and total-relevant denominators. No windows,
no UDFs; at 10^6 eval queries everything partial-aggregates map-side.

Definitions (trec_eval conventions):
- P@k        = |relevant ∩ top-k| / k
- Recall@k   = |relevant ∩ top-k| / |relevant|
- RR         = 1 / rank of the first relevant result (0 if none)
- DCG@k      = Σ_{rank ≤ k, grade > 0} (2^grade − 1) / log2(rank + 1)
- nDCG@k     = DCG@k / IDCG@k, IDCG from the qrels' grades sorted
               descending (the ideal ranking), truncated at k
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["relevance_metrics"]


def relevance_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """→ DataFrame(query_id, p_at_k, recall_at_k, rr, ndcg_at_k), one
    row per query that appears in ``results`` (queries with no judged
    relevant docs get recall/ndcg 0 — trec_eval drops them instead;
    divergence documented so comparisons filter first)."""
    r = results.select(
        F.col("query_id").alias("qid"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rank").cast("long").alias("rank"),
    )
    q = qrels.select(
        F.col("query_id").alias("qid"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("grade").cast("double").alias("grade"),
    ).filter(F.col("grade") > 0)

    joined = r.join(q, ["qid", "doc_id"], "left").withColumn(
        "rel", F.coalesce(F.col("grade"), F.lit(0.0))
    )
    topk = F.col("rank") <= k
    hit = topk & (F.col("rel") > 0)
    per_q = joined.groupBy("qid").agg(
        F.sum(F.when(hit, 1).otherwise(0)).alias("n_hits"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
        F.sum(
            F.when(
                hit,
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("rank").cast("double") + 1.0),
            ).otherwise(0.0)
        ).alias("dcg"),
    )

    # ideal DCG per query: grades sorted descending, truncated at k — a
    # qrels-only aggregate (collect grades, sort in an array expression)
    ideal = (
        q.groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.slice(F.sort_array(F.collect_list("grade"), asc=False), 1, k).alias("gs"),
        )
        .select(
            "qid",
            "n_rel",
            F.aggregate(
                F.zip_with(
                    F.col("gs"),
                    F.sequence(F.lit(1), F.size("gs")),
                    lambda g, i: (F.pow(F.lit(2.0), g) - 1.0)
                    / F.log2(i.cast("double") + 1.0),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("idcg"),
        )
    )

    return (
        per_q.join(ideal, "qid", "left")
        .select(
            F.col("qid").alias("query_id"),
            F.round(F.col("n_hits") / F.lit(float(k)), 6).alias("p_at_k"),
            F.round(
                F.when(
                    F.coalesce(F.col("n_rel"), F.lit(0)) > 0,
                    F.col("n_hits") / F.col("n_rel"),
                ).otherwise(0.0),
                6,
            ).alias("recall_at_k"),
            F.round(
                F.when(
                    F.col("first_rel").isNotNull(), 1.0 / F.col("first_rel")
                ).otherwise(0.0),
                6,
            ).alias("rr"),
            F.round(
                F.when(
                    F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                    F.col("dcg") / F.col("idcg"),
                ).otherwise(0.0),
                6,
            ).alias("ndcg_at_k"),
        )
        .orderBy("query_id")
    )
