"""Top-k scoring fixtures (FIXTURES.md §2/§4): a 12-doc corpus scored by
the independent pure-Python oracle; Spark must be rank-identical and
score-equal to 1e-9 (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.bm25 import bm25_py
from fugu_spark.postings import build_index
from fugu_spark.queryparse import parse_query
from fugu_spark.search import search

from .oracle import PyIndex

DOCS = {
    0: "merge join hash join sort merge",
    1: "the quick brown fox jumps over the lazy dog",
    2: "merge sort is a stable sort algorithm",
    3: "hash table lookup constant time",
    4: "join the club and merge the branches",
    5: "quick quick quick brown fox",
    6: "sort order by score descending",
    7: "a b c d e f g",
    8: "merge merge merge merge merge",
    9: "the merge window opens after the join window",
    10: "foo.bar calls baz_qux internally",
    11: "rare_unique_term appears once",
}

QUERIES = [
    "merge",                 # single term
    "merge join",            # 2-term OR (default Should)
    "merge AND join",        # 2-term AND
    "merge AND join AND sort",  # 3-term AND
    "merge OR quick",        # OR
    "merge NOT join",        # NOT
    '"merge join"',          # exact phrase (adjacent)
    '"sort merge"',          # phrase, reversed order
    "merge^2 join",          # boost
    "zzzznotfound",          # absent term
    "merge AND zzzznotfound",  # must on absent term → empty
    "",                      # empty → AllQuery
    "MERGE Join",            # mixed case input
    "foo.bar",               # multi-token word → phrase
    "rare_unique_term",      # rare term (underscore splits)
    "the",                   # hot term
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(list(DOCS.items()), "doc_id long, content string")


@pytest.fixture(scope="module")
def index(spark, docs_df):
    return build_index(docs_df)


@pytest.fixture(scope="module")
def oracle():
    return PyIndex(DOCS)


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("k", [10])
def test_rank_identity(index, docs_df, oracle, query, k):
    expected = oracle.search(query, k=k)
    got = [
        (r.doc_id, r.score)
        for r in search(index, query, k=k, docs=docs_df).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expected], f"rank mismatch: {query!r}"
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gs == pytest.approx(es, abs=1e-9), f"score mismatch {query!r} doc {gd}"


def test_k1_and_k100(index, docs_df, oracle):
    for k in (1, 100):
        expected = oracle.search("merge join", k=k)
        got = [(r.doc_id, r.score) for r in search(index, "merge join", k=k, docs=docs_df).collect()]
        assert [d for d, _ in got] == [d for d, _ in expected]


def test_bm25_value_hand_checked(index, oracle):
    """Spot-check one score fully by hand-computed BM25."""
    # term 'merge': df=5 (docs 0,2,4,8,9); doc 8 tf=5, dl=5
    n, avgdl = oracle.n_docs, oracle.avgdl
    expected = bm25_py(tf=5, df=5, doc_len=5, n_docs=n, avgdl=avgdl)
    got = {r.doc_id: r.score for r in search(index, "merge", k=12).collect()}
    assert got[8] == pytest.approx(expected, abs=1e-12)


def test_tie_break_doc_id_asc(spark):
    """Identical docs score identically → order by doc_id ASC."""
    docs = spark.createDataFrame(
        [(5, "same text here"), (1, "same text here"), (3, "same text here")],
        "doc_id long, content string",
    )
    idx = build_index(docs)
    got = [r.doc_id for r in search(idx, "same", k=3).collect()]
    assert got == [1, 3, 5]


def test_offset_pagination(index, docs_df, oracle):
    full = oracle.search("merge join sort", k=10)
    page2 = [
        r.doc_id
        for r in search(index, "merge join sort", k=3, offset=3, docs=docs_df).collect()
    ]
    assert page2 == [d for d, _ in full[3:6]]


def test_filter_pushdown_before_topk(index, docs_df):
    """doc_filter semi-join happens before top-k (F5 pushdown)."""
    got = [
        r.doc_id
        for r in search(
            index, "merge", k=2, doc_filter=F.col("doc_id") >= 8, docs=docs_df
        ).collect()
    ]
    assert got == [8, 9]


def test_escape_retry_on_malformed(index, docs_df, oracle):
    got = [r.doc_id for r in search(index, 'merge (join', k=10, docs=docs_df).collect()]
    expected = [d for d, _ in oracle.search("merge join", k=10)]
    assert got == expected


def test_partition_invariance_of_ranks(spark, docs_df, oracle):
    idx1 = build_index(docs_df.repartition(1))
    idx4 = build_index(docs_df.repartition(4))
    for q in ["merge join", "merge AND join", '"merge join"']:
        r1 = [(r.doc_id, r.score) for r in search(idx1, q, k=12).collect()]
        r4 = [(r.doc_id, r.score) for r in search(idx4, q, k=12).collect()]
        assert r1 == r4
