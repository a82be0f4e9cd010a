"""IR evaluation metrics (analytics/ir_eval.relevance_metrics) and the
ES `filters` bucket agg — hand-derived answers."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fugu_spark.analytics.ir_eval import relevance_metrics


@pytest.fixture(scope="module")
def frames(spark):
    # q1: ranked docs 10,20,30,40; relevant: 20 (grade 2), 40 (grade 1), 99 (unretrieved)
    # q2: ranked docs 1,2; nothing relevant
    # q3: ranked docs 5,6; 5 relevant at rank 1 (perfect RR)
    results = spark.createDataFrame(
        [
            (1, 10, 1), (1, 20, 2), (1, 30, 3), (1, 40, 4),
            (2, 1, 1), (2, 2, 2),
            (3, 5, 1), (3, 6, 2),
        ],
        "query_id long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 20, 2), (1, 40, 1), (1, 99, 3), (3, 5, 1)],
        "query_id long, doc_id long, grade long",
    )
    return results, qrels


def test_hand_derived_metrics(frames):
    results, qrels = frames
    out = {r.query_id: r for r in relevance_metrics(results, qrels, k=3).collect()}

    # q1 @3: hits = {20}; n_rel = 3; first_rel rank 2
    assert out[1].p_at_k == pytest.approx(1 / 3, abs=1e-6)
    assert out[1].recall_at_k == pytest.approx(1 / 3, abs=1e-6)
    assert out[1].rr == pytest.approx(0.5, abs=1e-6)
    dcg = (2**2 - 1) / math.log2(3)  # grade 2 at rank 2
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    assert out[1].ndcg_at_k == pytest.approx(dcg / idcg, abs=1e-6)

    # q2: no relevant docs at all
    assert (out[2].p_at_k, out[2].recall_at_k, out[2].rr, out[2].ndcg_at_k) == (0, 0, 0, 0)

    # q3: perfect first hit
    assert out[3].rr == 1.0
    assert out[3].recall_at_k == 1.0
    assert out[3].ndcg_at_k == 1.0


def test_k_truncation(frames):
    results, qrels = frames
    out = {r.query_id: r for r in relevance_metrics(results, qrels, k=1).collect()}
    # q1 @1: top-1 (doc 10) not relevant; RR unaffected by k
    assert out[1].p_at_k == 0.0
    assert out[1].rr == pytest.approx(0.5)


def test_filters_agg(spark):
    from fugu_spark.aggs import filters_agg

    df = spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "doc_id long, v long"
    )
    out = {
        r.key: r
        for r in filters_agg(
            df,
            {"small": F.col("v") < 30, "big": F.col("v") >= 50, "all": F.lit(True)},
            field="v",
        ).collect()
    }
    assert out["small"].doc_count == 3 and out["small"].v_sum == 0 + 10 + 20
    assert out["big"].doc_count == 5 and out["big"].v_avg == pytest.approx(70.0)
    assert out["all"].doc_count == 10

    # zero shuffles: no Exchange in the plan (grand aggregate only)
    plan = filters_agg(df, {"a": F.col("v") < 30})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_filters_agg_empty_rejected(spark):
    from fugu_spark.aggs import filters_agg

    df = spark.createDataFrame([(1, 1)], "doc_id long, v long")
    with pytest.raises(ValueError):
        filters_agg(df, {})
