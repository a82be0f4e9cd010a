"""Nested boolean grouping: '(a OR b) AND c' keeps group semantics
(previously flattened — pinned divergence removed). Rank/score identity
across the table-native engine, the segment engine, and the pure-Python
oracle; plus hand-computed semantics on a tiny fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.postings import build_index
from fugu_spark.queryparse import BoolNode, Leaf, parse_query
from fugu_spark.search import search as table_search
from fugu_spark.segment_search import search_segments
from fugu_spark.segments import build_segments

from .oracle import PyIndex


def test_parse_nested_shapes():
    p = parse_query("(alpha OR beta) AND gamma")
    assert p.root is not None
    occs = [occ for occ, _ in p.root.children]
    assert occs == ["must", "must"]
    group, leaf = p.root.children[0][1], p.root.children[1][1]
    assert isinstance(group, BoolNode) and isinstance(leaf, Leaf)
    assert [c[0] for c in group.children] == ["should", "should"]
    assert {t for _, n in group.children for t in n.terms} == {"alpha", "beta"}
    # single-leaf parens stay flat — '(a) AND b' ≡ 'a AND b'
    q = parse_query("(alpha) AND beta")
    assert q.root is None
    assert [(l.occur, l.terms) for l in q.leaves] == [
        ("must", ("alpha",)),
        ("must", ("beta",)),
    ]
    # group boost distributes onto every leaf of the group
    gb = parse_query("(alpha OR beta)^2 AND gamma")
    grp = gb.root.children[0][1]
    assert all(n.boost == 2.0 for _, n in grp.children)
    assert gb.root.children[1][1].boost == 1.0
    # NOT before a group
    r = parse_query("gamma NOT (alpha OR beta)")
    assert r.root is not None
    assert [occ for occ, _ in r.root.children] == ["should", "must_not"]
    assert r.has_positive()
    assert not parse_query("NOT (alpha OR beta)").has_positive()


TINY = [
    (1, "alpha gamma"),
    (2, "beta gamma"),
    (3, "gamma delta"),
    (4, "alpha beta"),
]


def test_nested_semantics_hand_computed(spark):
    docs = spark.createDataFrame(TINY, "doc_id long, text string")
    idx = build_index(docs, id_col="doc_id", text_col="text")
    # (alpha OR beta) AND gamma: needs gamma AND at least one of alpha/beta
    got = {r.doc_id for r in table_search(idx, "(alpha OR beta) AND gamma", k=10, docs=docs).collect()}
    assert got == {1, 2}
    # (alpha AND beta) OR delta: doc4 (both) or doc3 (delta)
    got = {r.doc_id for r in table_search(idx, "(alpha AND beta) OR delta", k=10, docs=docs).collect()}
    assert got == {3, 4}
    # NOT (alpha OR beta): all docs minus {1,2,4}
    got = {r.doc_id for r in table_search(idx, "NOT (alpha OR beta)", k=10, docs=docs).collect()}
    assert got == {3}
    # score of '(alpha OR beta) AND gamma' = alpha+gamma on doc1
    flat = {r.doc_id: r.score for r in table_search(idx, "alpha gamma", k=10, docs=docs).collect()}
    nested = {r.doc_id: r.score for r in table_search(idx, "(alpha OR beta) AND gamma", k=10, docs=docs).collect()}
    assert nested[1] == pytest.approx(flat[1], abs=1e-9)


@pytest.fixture(scope="module")
def corpus_setup(spark, tmp_path_factory):
    from fugu_spark.corpus import generate_corpus

    corpus = (
        generate_corpus(spark, 150)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .cache()
    )
    idx = build_index(corpus, id_col="doc_id", text_col="content")
    seg_dir = str(tmp_path_factory.mktemp("nested") / "idx")
    si = build_segments(corpus, seg_dir, id_col="doc_id", text_col="content")
    oracle = PyIndex({r.doc_id: r.content for r in corpus.select("doc_id", "content").collect()})
    return corpus, idx, si, oracle


NESTED_QUERIES = [
    "(merge OR hash) AND join",
    "join AND (merge OR hash)",
    "(merge hash) AND join sort",
    "(merge AND join) OR (hash AND table)",
    '("merge join" OR hash) AND table',
    "sort NOT (merge OR hash)",
    "(merge OR hash)^2 AND join",  # group boost distributes over leaves
    '("merge join" OR hash)^2 AND table^3',
]


@pytest.mark.parametrize("q", NESTED_QUERIES)
def test_nested_rank_identity(corpus_setup, q):
    corpus, idx, si, oracle = corpus_setup
    want = oracle.search(q, k=15)
    got_tbl = [(r.doc_id, r.score) for r in table_search(idx, q, k=15, docs=corpus).collect()]
    got_seg = [(r.doc_id, r.score) for r in search_segments(si, q, k=15, docs=corpus).collect()]
    assert [d for d, _ in got_tbl] == [d for d, _ in want], f"table ranks: {q}"
    assert [d for d, _ in got_seg] == [d for d, _ in want], f"segment ranks: {q}"
    for (d1, s1), (_, s2) in zip(got_tbl, want):
        assert s1 == pytest.approx(s2, abs=1e-9), (q, d1)
    for (d1, s1), (_, s2) in zip(got_seg, want):
        assert s1 == pytest.approx(s2, abs=1e-9), (q, d1)


@pytest.mark.parametrize("q", NESTED_QUERIES)
def test_nested_served_locally(corpus_setup, q):
    """LocalSearcher serves nested plans with score identity to the
    oracle; NOT-only still falls back (needs the docs table)."""
    from fugu_spark.serve import LocalSearcher

    _, _, si, oracle = corpus_setup
    ls = LocalSearcher(si.index_dir)
    want = oracle.search(q, k=15)
    got = list(ls.search(q, k=15).itertuples(index=False))
    assert [g.doc_id for g in got] == [d for d, _ in want], q
    for g, (_, es) in zip(got, want):
        assert g.score == pytest.approx(es, abs=1e-9), (q, g.doc_id)
    # offset pagination on the nested path
    got2 = list(ls.search(q, k=5, offset=5).itertuples(index=False))
    assert [g.doc_id for g in got2] == [d for d, _ in want[5:10]], q


def test_nested_notonly_falls_back(corpus_setup):
    from fugu_spark.serve import LocalSearcher

    _, _, si, _ = corpus_setup
    with pytest.raises(ValueError, match="docs table"):
        LocalSearcher(si.index_dir).search("NOT (merge OR hash)", k=5)
    hot = LocalSearcher(si.index_dir)
    with pytest.raises(ValueError, match="serve cap"):
        hot.search("(merge OR hash) AND join", k=5, max_postings=1)
