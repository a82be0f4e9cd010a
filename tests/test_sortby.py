"""Field-sorted search results — Tantivy sort_by_field / Lucene Sort.

Pinned: top-k of the MATCHED set ordered by (field, doc_id ASC); BM25
score kept alongside the sort key (divergence from Tantivy, which
reports the field value as the score — documented in
search.top_k_by_field); min_score filters BEFORE the field sort."""

from __future__ import annotations

import pytest

from fugu_spark import postings as P
from fugu_spark.search import search

DOCS = [
    (0, "merge join plan", 30),
    (1, "merge sort network", 10),
    (2, "hash join probe", 50),
    (3, "merge merge merge", 20),
    (4, "vector scan only", 40),
    (5, "merge scan fast", 40),
]
SCHEMA = "doc_id long, text string, n_chars long"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA).cache()
    idx = P.build_index(docs, id_col="doc_id", text_col="text")
    return docs, idx


def _rows(df):
    return [(r["doc_id"], r["sort_key"]) for r in df.collect()]


def test_sort_desc_and_asc(corpus):
    docs, idx = corpus
    got = _rows(search(idx, "merge", k=10, docs=docs, sort_by="n_chars"))
    assert got == [(5, 40), (0, 30), (3, 20), (1, 10)]
    got = _rows(search(idx, "merge", k=10, docs=docs, sort_by="n_chars", sort_ascending=True))
    assert got == [(1, 10), (3, 20), (0, 30), (5, 40)]


def test_sort_k_truncates(corpus):
    docs, idx = corpus
    got = _rows(search(idx, "merge", k=2, docs=docs, sort_by="n_chars"))
    assert got == [(5, 40), (0, 30)]


def test_sort_ties_break_by_doc_id(corpus):
    docs, idx = corpus
    got = _rows(search(idx, "scan", k=10, docs=docs, sort_by="n_chars"))
    assert got == [(4, 40), (5, 40)]


def test_sort_keeps_bm25_scores(corpus):
    docs, idx = corpus
    base = {r["doc_id"]: r["score"] for r in search(idx, "merge", k=10, docs=docs).collect()}
    srt = {r["doc_id"]: r["score"] for r in search(idx, "merge", k=10, docs=docs, sort_by="n_chars").collect()}
    assert srt == base


def test_sort_requires_docs(corpus):
    _, idx = corpus
    with pytest.raises(ValueError):
        search(idx, "merge", k=10, sort_by="n_chars")


def test_sort_segments_parity_and_wand_bypass(spark, corpus, tmp_path):
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import build_segments

    docs, idx = corpus
    si = build_segments(docs, str(tmp_path / "srt"), id_col="doc_id", text_col="text")
    mem = _rows(search(idx, "merge scan", k=10, docs=docs, sort_by="n_chars"))
    # wand_min_postings=0 would engage MaxScore for this pure-OR query;
    # sort_by must force the exhaustive path (θ-pruning drops docs that
    # win on the sort key)
    seg = _rows(
        search_segments(
            si, "merge scan", k=10, docs=docs, sort_by="n_chars", wand_min_postings=0
        )
    )
    assert mem == seg


def test_sort_min_score_filters_before_sort(spark, corpus, tmp_path):
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import build_segments

    docs, idx = corpus
    si = build_segments(docs, str(tmp_path / "srtms"), id_col="doc_id", text_col="text")
    base = search_segments(si, "merge", k=10, docs=docs).collect()
    # threshold chosen between the 2nd and 3rd relevance scores
    scores = sorted((r["score"] for r in base), reverse=True)
    t = (scores[1] + scores[2]) / 2
    keep = {r["doc_id"] for r in base if r["score"] >= t}
    got = _rows(
        search_segments(si, "merge", k=10, docs=docs, sort_by="n_chars", min_score=t)
    )
    assert [d for d, _ in got] != [] and {d for d, _ in got} == keep
    # and the survivors are field-ordered, not score-ordered
    assert [x[1] for x in got] == sorted([x[1] for x in got], reverse=True)


def test_sort_engine_facade(spark, corpus, tmp_path):
    from fugu_spark.engine import FuguSparkEngine

    docs, _ = corpus
    eng = FuguSparkEngine.build(
        docs, str(tmp_path / "engsrt"), id_col="doc_id", text_col="text"
    )
    got = _rows(eng.search("merge", k=10, sort_by="n_chars"))
    assert got == [(5, 40), (0, 30), (3, 20), (1, 10)]


def test_sort_plan_is_bounded_topk(corpus):
    docs, idx = corpus
    df = search(idx, "merge", k=10, docs=docs, sort_by="n_chars")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
