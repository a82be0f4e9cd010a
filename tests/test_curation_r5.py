"""Round-5 additions: Gopher quality rules and batch ANN top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.analytics.curation import gopher_filters
from fugu_spark.analytics.similarity import batch_cosine_topk, cosine_topk


def test_gopher_filters_flags(spark):
    good = " ".join(["the quick brown fox and that dog have fun with it"] * 6)  # 60 words
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, "short text"),  # too few words
            (2, " ".join(["####"] * 60)),  # symbol ratio + no alpha + no stops
            (3, "\n".join(["- " + good] * 10)),  # all bullet lines
            (4, " ".join(["supercalifragilistic"] * 60)),  # mean word len high
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_filters(docs).collect()}
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False and out[1]["n_words"] == 2
    assert out[2]["keep"] is False and out[2]["frac_alpha_words"] == 0.0
    assert out[3]["keep"] is False and out[3]["frac_bullet_lines"] == 1.0
    assert out[4]["keep"] is False and out[4]["mean_word_len"] == 20.0


def test_gopher_ellipsis_and_stops(spark):
    base = "the cat and the dog have that toy to be of use with it " * 5
    docs = spark.createDataFrame(
        [(0, base + "\nline one...\nline two...\nline three")],
        "doc_id long, text string",
    )
    (row,) = gopher_filters(docs).collect()
    assert row["n_stop_hits"] >= 2
    assert 0 < row["frac_ellipsis_lines"] < 1


def test_batch_cosine_topk_matches_per_query(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qs = {
        int(r["vec_id"]): list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 3).collect()
    }
    out = batch_cosine_topk(emb, qs, k=5)
    by_q: dict[int, list] = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, round(r.score, 9)))
    for qid, vec in qs.items():
        want = [
            (i + 1, r["vec_id"], round(r["score"], 9))
            for i, r in enumerate(cosine_topk(emb, vec, k=5).collect())
        ]
        assert sorted(by_q[qid]) == want, qid


def test_batch_cosine_topk_rank_dense(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vec = list(emb.first()["embedding"])
    out = batch_cosine_topk(emb, {7: vec}, k=4).collect()
    assert sorted(r.rank for r in out) == [1, 2, 3, 4]
