"""span_near (unordered proximity — Lucene SpanNearQuery with
in_order=false, reachable through the structured DSL's span_near node;
fugu's parser has no spelling for it, matching Lucene's). Pinned
semantics in queryparse.Leaf.near: tf = merged positions q where the
latest at-or-before-q occurrence of every clause term fits in a window
of slop + n − 1. Rank/score identity across the table-native engine,
the segment engine, the serving path, and the brute-force oracle;
in_order=true must collapse onto the existing ordered sloppy phrase."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.dsl import compile_query, search_dsl
from fugu_spark.postings import build_index
from fugu_spark.search import search as table_search
from fugu_spark.segment_search import search_segments
from fugu_spark.segments import build_segments
from fugu_spark.serve import LocalSearcher

from .oracle import PyIndex


def _near(terms, slop, in_order=False, boost=None, field="_all"):
    body = {
        "clauses": [{"span_term": {field: t}} for t in terms],
        "slop": slop,
        "in_order": in_order,
    }
    if boost is not None:
        body["boost"] = boost
    return {"span_near": body}


def test_compile_span_near():
    plan = compile_query(_near(["alpha", "beta"], 3))
    (leaf,) = plan.leaves
    assert leaf.terms == ("alpha", "beta") and leaf.slop == 3 and leaf.near
    assert leaf.fld is None  # "_all" → unqualified
    # in_order=true is the ORDERED sloppy phrase — the same leaf the
    # string '"alpha beta"~3' parses to
    plan = compile_query(_near(["alpha", "beta"], 3, in_order=True))
    (leaf,) = plan.leaves
    assert leaf.slop == 3 and not leaf.near
    with pytest.raises(ValueError):
        compile_query({"span_near": {"clauses": [{"span_term": {"_all": "a"}}]}})
    with pytest.raises(ValueError):  # mixed fields
        compile_query({"span_near": {"clauses": [
            {"span_term": {"f1": "a"}}, {"span_term": {"f2": "b"}}]}})
    with pytest.raises(ValueError):  # non-span clause
        compile_query({"span_near": {"clauses": [
            {"term": {"_all": "a"}}, {"span_term": {"_all": "b"}}]}})


TINY = [
    (1, "alpha beta gamma"),
    (2, "gamma x x alpha"),  # reversed order, window 3 ≤ slop 2 + 1
    (3, "alpha x x x gamma"),  # window 4 → needs slop 3
    (4, "gamma alpha"),  # reversed adjacency
    (5, "alpha gamma"),  # adjacency
    (6, "alpha beta beta"),  # no gamma
]


def test_near_hand_computed(spark):
    docs = spark.createDataFrame(TINY, "doc_id long, text string")
    idx = build_index(docs, id_col="doc_id", text_col="text")

    def hits(dsl):
        return {r.doc_id for r in search_dsl(idx, dsl, k=10, docs=docs).collect()}

    # slop 0 = unordered adjacency: both orders match
    assert hits(_near(["alpha", "gamma"], 0)) == {4, 5}
    # ordered twin excludes the reversed docs
    assert hits(_near(["alpha", "gamma"], 0, in_order=True)) == {5}
    assert hits(_near(["alpha", "gamma"], 2)) == {1, 2, 4, 5}
    assert hits(_near(["alpha", "gamma"], 3)) == {1, 2, 3, 4, 5}
    # 3-clause window: doc 1 spans positions 0..2 (slack 0)
    assert hits(_near(["alpha", "beta", "gamma"], 0)) == {1}


def test_near_tf_counting(spark):
    """tf must follow the pinned merged-sweep count, not just matching."""
    docs = spark.createDataFrame(
        [(1, "alpha gamma alpha gamma"), (2, "alpha gamma x x x alpha")],
        "doc_id long, text string",
    )
    idx = build_index(docs, id_col="doc_id", text_col="text")
    oracle = PyIndex({1: "alpha gamma alpha gamma", 2: "alpha gamma x x x alpha"})
    got = {
        r.doc_id: r.score
        for r in search_dsl(idx, _near(["alpha", "gamma"], 1), k=10, docs=docs).collect()
    }
    want = oracle.phrase_scores(("alpha", "gamma"), slop=1, near=True)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)
    # doc 1: sweep positions 1,2,3 all valid → tf 3; doc 2: only pos 1
    assert oracle._near_tf([[0, 2], [1, 3]], 1) == 3
    assert oracle._near_tf([[0, 5], [1]], 1) == 1
    # cross-doc state never leaks: handled by doc-wise pos lists here,
    # by the rank-packed keys in the serving kernel (asserted below via
    # parity on a multi-doc corpus)


def test_near_duplicate_terms_collapse(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha")], "doc_id long, text string"
    )
    idx = build_index(docs, id_col="doc_id", text_col="text")
    got = {
        r.doc_id
        for r in search_dsl(idx, _near(["alpha", "alpha"], 0), k=10, docs=docs).collect()
    }
    # duplicates collapse to ONE clause: any single occurrence matches
    assert got == {1, 2}


@pytest.fixture(scope="module")
def near_setup(spark, tmp_path_factory):
    from fugu_spark.corpus import generate_corpus

    corpus = (
        generate_corpus(spark, 150)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .cache()
    )
    idx = build_index(corpus, id_col="doc_id", text_col="content")
    seg_dir = str(tmp_path_factory.mktemp("near") / "idx")
    si = build_segments(corpus, seg_dir, id_col="doc_id", text_col="content")
    oracle = PyIndex(
        {r.doc_id: r.content for r in corpus.select("doc_id", "content").collect()}
    )
    return corpus, idx, si, seg_dir, oracle


NEAR_QUERIES = [
    _near(["merge", "sort"], 3),
    _near(["merge", "join"], 0),
    _near(["merge", "join"], 2, boost=2.0),
    _near(["merge", "join", "table"], 5),
    {"bool": {"must": [_near(["merge", "sort"], 4),
                       {"term": {"_all": "table"}}]}},
    {"bool": {"should": [_near(["merge", "join"], 1),
                         {"term": {"_all": "sort"}}]}},
]


def _ids(q):
    return ["ms3", "mj0", "mj2b", "mjt5", "must+term", "should+term"]


@pytest.mark.parametrize("dsl", NEAR_QUERIES, ids=_ids(None))
def test_near_rank_identity(near_setup, dsl):
    corpus, idx, si, seg_dir, oracle = near_setup
    want = oracle.search_dsl(dsl, k=15)
    got_tbl = [
        (r.doc_id, r.score)
        for r in search_dsl(idx, dsl, k=15, docs=corpus).collect()
    ]
    got_seg = [
        (r.doc_id, r.score)
        for r in search_segments(si, dsl, k=15, docs=corpus).collect()
    ]
    assert [d for d, _ in got_tbl] == [d for d, _ in want], "table ranks"
    assert [d for d, _ in got_seg] == [d for d, _ in want], "segment ranks"
    for (d1, s1), (_, s2) in zip(got_tbl, want):
        assert s1 == pytest.approx(s2, abs=1e-9), d1
    for (d1, s1), (_, s2) in zip(got_seg, want):
        assert s1 == pytest.approx(s2, abs=1e-9), d1


@pytest.mark.parametrize("dsl", NEAR_QUERIES, ids=_ids(None))
def test_near_served_locally(near_setup, dsl):
    corpus, idx, si, seg_dir, oracle = near_setup
    want = oracle.search_dsl(dsl, k=15)
    pdf = LocalSearcher(seg_dir).search(dsl, k=15)
    got = list(zip(pdf["doc_id"], pdf["score"]))
    assert [d for d, _ in got] == [d for d, _ in want], "served ranks"
    for (d1, s1), (_, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, abs=1e-9), d1


def test_in_order_true_equals_string_slop(near_setup):
    corpus, idx, si, seg_dir, oracle = near_setup
    a = [
        (r.doc_id, round(r.score, 9))
        for r in search_dsl(
            idx, _near(["merge", "join"], 2, in_order=True), k=20, docs=corpus
        ).collect()
    ]
    b = [
        (r.doc_id, round(r.score, 9))
        for r in table_search(idx, '"merge join"~2', k=20, docs=corpus).collect()
    ]
    assert a == b


def test_near_superset_of_ordered(near_setup):
    """Every ordered sloppy match is an unordered match at the same slop."""
    corpus, idx, si, seg_dir, oracle = near_setup
    ordered = {
        r.doc_id
        for r in table_search(idx, '"merge sort"~3', k=500, docs=corpus).collect()
    }
    near = {
        r.doc_id
        for r in search_dsl(idx, _near(["merge", "sort"], 3), k=500, docs=corpus).collect()
    }
    assert ordered <= near


def test_near_rejected_in_batch(near_setup):
    corpus, idx, si, seg_dir, oracle = near_setup
    from fugu_spark.batch import batch_search_segments

    with pytest.raises(ValueError, match="span_near"):
        batch_search_segments(si, [(0, _near(["merge", "join"], 2))], k=5)
