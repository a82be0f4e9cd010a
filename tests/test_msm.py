"""minimum_should_match — Lucene BooleanQuery.setMinimumNumberShouldMatch
applied to the TOP-LEVEL boolean (engine-level parameter, like Lucene's).

Pinned semantics (BooleanWeight):
- a doc matches iff every must matches, no must_not matches, and >= msm
  DISTINCT should clauses match;
- scoring is unchanged (sum over all matching clauses);
- msm above the number of LIVE should clauses matches nothing, even when
  musts exist (dead/absent-term clauses are excluded, like null scorers);
- msm <= 0 is off; AllQuery has no boolean -> parameter ignored.
"""

from __future__ import annotations

import pytest

from fugu_spark import postings as P
from fugu_spark.search import search

DOCS = [
    (0, "merge join scan", "alpha"),       # matches all 3
    (1, "merge join network", "alpha"),    # merge+join
    (2, "merge sort probe", "beta"),       # merge only
    (3, "join probe only", "beta"),        # join only
    (4, "scan vector pipeline", "gamma"),  # scan only
    (5, "merge scan fast", "gamma"),       # merge+scan
    (6, "hash group window", "gamma"),     # none
]
SCHEMA = "doc_id long, text string, source string"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA).cache()
    idx = P.build_index(docs, id_col="doc_id", text_col="text")
    return docs, idx


def _ranks(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def test_msm_filters_or_query(corpus):
    docs, idx = corpus
    q = "merge join scan"
    assert _ids(search(idx, q, k=10, docs=docs, min_should_match=2)) == {0, 1, 5}
    assert _ids(search(idx, q, k=10, docs=docs, min_should_match=3)) == {0}


def test_msm_zero_and_one_are_identity_on_pure_or(corpus):
    docs, idx = corpus
    q = "merge join scan"
    base = _ranks(search(idx, q, k=10, docs=docs))
    assert _ranks(search(idx, q, k=10, docs=docs, min_should_match=0)) == base
    assert _ranks(search(idx, q, k=10, docs=docs, min_should_match=1)) == base


def test_msm_scores_unchanged(corpus):
    """Surviving docs keep their unfiltered scores (Lucene: the gate
    filters, the scorer still sums every matching clause)."""
    docs, idx = corpus
    q = "merge join scan"
    base = dict(_ranks(search(idx, q, k=10, docs=docs)))
    got = _ranks(search(idx, q, k=10, docs=docs, min_should_match=2))
    assert got and all(base[d] == s for d, s in got)


def test_msm_with_musts(corpus):
    docs, idx = corpus
    # must merge, shoulds {join, scan}: msm=1 requires merge AND >=1 should
    got = _ids(search(idx, "+merge join scan", k=10, docs=docs, min_should_match=1))
    assert got == {0, 1, 5}
    got = _ids(search(idx, "+merge join scan", k=10, docs=docs, min_should_match=2))
    assert got == {0}


def test_msm_above_should_count_is_empty(corpus):
    docs, idx = corpus
    assert _ids(search(idx, "merge join", k=10, docs=docs, min_should_match=3)) == set()
    # musts alone cannot satisfy an msm the shoulds can't reach
    assert _ids(search(idx, "+merge join", k=10, docs=docs, min_should_match=2)) == set()


def test_msm_dead_should_does_not_count(corpus):
    docs, idx = corpus
    # 'zzzmissing' is absent: live shoulds = {merge} -> msm=2 matches nothing
    assert _ids(search(idx, "merge zzzmissing", k=10, docs=docs, min_should_match=2)) == set()
    # msm=1 still returns merge docs
    assert _ids(search(idx, "merge zzzmissing", k=10, docs=docs, min_should_match=1)) == {0, 1, 2, 5}


def test_msm_nested_group_counts_once(corpus):
    docs, idx = corpus
    # top-level shoulds: (merge OR hash), join, scan — the group counts as
    # ONE clause however many of its members match
    q = "(merge hash) join scan"
    got = _ids(search(idx, q, k=10, docs=docs, min_should_match=2))
    # doc 6 matches only the group (hash); docs 2 (merge), 3 (join),
    # 4 (scan) match one clause each -> all out
    assert got == {0, 1, 5}


def test_msm_segments_and_served_parity(spark, corpus, tmp_path):
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import build_segments
    from fugu_spark.serve import LocalSearcher

    docs, idx = corpus
    si = build_segments(docs, str(tmp_path / "msm"), id_col="doc_id", text_col="text")
    ls = LocalSearcher(si.index_dir)
    for q, m in (
        ("merge join scan", 2),
        ("merge join scan", 3),
        ("+merge join scan", 1),
        ("(merge hash) join scan", 2),
        ("merge zzzmissing", 2),
    ):
        mem = _ranks(search(idx, q, k=10, docs=docs, min_should_match=m))
        seg = _ranks(search_segments(si, q, k=10, docs=docs, min_should_match=m))
        pdf = ls.search(q, k=10, min_should_match=m)
        srv = [(int(r.doc_id), round(r.score, 9)) for r in pdf.itertuples()]
        assert mem == seg == srv, (q, m)


def test_msm_engine_facade(spark, corpus, tmp_path):
    from fugu_spark.engine import FuguSparkEngine

    docs, _ = corpus
    eng = FuguSparkEngine.build(
        docs, str(tmp_path / "eng"), id_col="doc_id", text_col="text"
    )
    got = {r["doc_id"] for r in eng.search("merge join scan", k=10, min_should_match=2).collect()}
    assert got == {0, 1, 5}
