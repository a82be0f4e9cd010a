"""Phrase slop ('"a b"~N'): Tantivy's QueryParser accepts the slop
suffix, so it is reachable through the reference's search route
(/root/reference/src/db/search.rs:112-118 passes the raw string through).
Pinned semantics (queryparse.Leaf docstring): ORDERED sloppy match with
total window slack ≤ slop; tf = distinct end positions. Rank/score
identity across the table-native engine, the segment engine, the
serving path, and the brute-force Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.postings import build_index
from fugu_spark.queryparse import parse_query
from fugu_spark.search import search as table_search
from fugu_spark.segment_search import search_segments
from fugu_spark.segments import build_segments
from fugu_spark.serve import LocalSearcher

from .oracle import PyIndex


def test_parse_slop_syntax():
    p = parse_query('"merge join"~2')
    assert p.leaves[0].terms == ("merge", "join") and p.leaves[0].slop == 2
    # slop + boost compose, in Tantivy's order (slop first)
    p = parse_query('"merge join"~3^2')
    assert p.leaves[0].slop == 3 and p.leaves[0].boost == 2.0
    # no slop → 0 (adjacency)
    assert parse_query('"merge join"').leaves[0].slop == 0
    # single-token phrase: slop meaningless, normalized to 0
    assert parse_query('"merge"~5').leaves[0].slop == 0
    # the escape-and-retry fallback strips '~' like the reference
    p = parse_query('merge~ join')
    assert [l.terms for l in p.leaves] == [("merge",), ("join",)]


TINY = [
    (1, "alpha beta gamma"),  # alpha..gamma span 2 → slop 1 matches
    (2, "alpha x beta"),
    (3, "alpha x x x gamma"),  # span 4 → needs slop 3
    (4, "gamma alpha"),  # wrong order: never matches (ordered semantics)
    (5, "alpha gamma"),  # adjacent
]


def test_slop_hand_computed(spark):
    docs = spark.createDataFrame(TINY, "doc_id long, text string")
    idx = build_index(docs, id_col="doc_id", text_col="text")

    def hits(q):
        return {r.doc_id for r in table_search(idx, q, k=10, docs=docs).collect()}

    assert hits('"alpha gamma"') == {5}
    assert hits('"alpha gamma"~1') == {1, 5}
    assert hits('"alpha gamma"~3') == {1, 3, 5}
    # ordered: doc 4 (gamma before alpha) never matches
    assert 4 not in hits('"alpha gamma"~9')
    # 3-term chain with total window slack
    assert hits('"alpha beta gamma"') == {1}
    assert hits('"alpha x gamma"~2') == {3}  # x at 1, x at 3: chain 0<1<4 or 0<3<4, slack 2


@pytest.fixture(scope="module")
def slop_setup(spark, tmp_path_factory):
    from fugu_spark.corpus import generate_corpus

    corpus = (
        generate_corpus(spark, 150)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .cache()
    )
    idx = build_index(corpus, id_col="doc_id", text_col="content")
    seg_dir = str(tmp_path_factory.mktemp("slop") / "idx")
    si = build_segments(corpus, seg_dir, id_col="doc_id", text_col="content")
    oracle = PyIndex(
        {r.doc_id: r.content for r in corpus.select("doc_id", "content").collect()}
    )
    return corpus, idx, si, seg_dir, oracle


SLOP_QUERIES = [
    '"merge join"~1',
    '"merge join"~3',
    '"merge sort"~2',
    '"merge join"~2^2 sort',
    '"merge join table"~4',
    '"merge join"~1 AND sort',
    '("merge join"~2 OR hash) AND table',
]


@pytest.mark.parametrize("q", SLOP_QUERIES)
def test_slop_rank_identity(slop_setup, q):
    corpus, idx, si, seg_dir, oracle = slop_setup
    want = oracle.search(q, k=15)
    got_tbl = [(r.doc_id, r.score) for r in table_search(idx, q, k=15, docs=corpus).collect()]
    got_seg = [(r.doc_id, r.score) for r in search_segments(si, q, k=15, docs=corpus).collect()]
    assert [d for d, _ in got_tbl] == [d for d, _ in want], f"table ranks: {q}"
    assert [d for d, _ in got_seg] == [d for d, _ in want], f"segment ranks: {q}"
    for (d1, s1), (_, s2) in zip(got_tbl, want):
        assert s1 == pytest.approx(s2, abs=1e-9), (q, d1)
    for (d1, s1), (_, s2) in zip(got_seg, want):
        assert s1 == pytest.approx(s2, abs=1e-9), (q, d1)


@pytest.mark.parametrize("q", SLOP_QUERIES)
def test_slop_served_locally(slop_setup, q):
    corpus, idx, si, seg_dir, oracle = slop_setup
    want = oracle.search(q, k=15)
    pdf = LocalSearcher(seg_dir).search(q, k=15)
    got = list(zip(pdf["doc_id"], pdf["score"]))
    assert [d for d, _ in got] == [d for d, _ in want], f"served ranks: {q}"
    for (d1, s1), (_, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, abs=1e-9), (q, d1)


def test_slop_zero_equals_adjacency(slop_setup):
    corpus, idx, si, seg_dir, oracle = slop_setup
    a = [(r.doc_id, r.score) for r in table_search(idx, '"merge join"', k=20, docs=corpus).collect()]
    b = [(r.doc_id, r.score) for r in table_search(idx, '"merge join"~0', k=20, docs=corpus).collect()]
    assert a == b


def test_slop_duplicate_term_phrase(spark):
    """'"a a"~N' needs two distinct ascending positions within the window."""
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "alpha beta alpha"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    idx = build_index(docs, id_col="doc_id", text_col="text")
    got = {r.doc_id for r in table_search(idx, '"alpha alpha"~1', k=10, docs=docs).collect()}
    assert got == {1, 2}
    got0 = {r.doc_id for r in table_search(idx, '"alpha alpha"', k=10, docs=docs).collect()}
    assert got0 == {1}
