"""Structured query DSL (fugu_spark/dsl.py): every DSL shape must be
rank/score-identical to its string-syntax twin — same plans, same
pipeline."""

from __future__ import annotations

import pytest

from fugu_spark.dsl import compile_query, search_dsl
from fugu_spark.postings import build_index
from fugu_spark.search import search

from .test_search import DOCS


@pytest.fixture(scope="module")
def index(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, content string"
    )
    return build_index(df)


def _rows(df):
    return [(r.doc_id, round(r.score, 9)) for r in df.collect()]


TWINS = [
    ({"match": {"_all": "merge join"}}, "merge join"),
    ({"bool": {"must": [{"term": {"_all": "merge"}},
                        {"term": {"_all": "join"}}]}}, "merge AND join"),
    ({"bool": {"must": [{"term": {"_all": "merge"}}],
               "must_not": [{"term": {"_all": "join"}}]}}, "merge NOT join"),
    ({"match_phrase": {"_all": "merge join"}}, '"merge join"'),
    ({"match_phrase": {"_all": "merge join", "slop": 2}}, '"merge join"~2'),
    ({"terms": {"_all": ["merge", "quick", "sort"]}}, "merge quick sort"),
    ({"prefix": {"_all": "qui"}}, "qui*"),
    ({"wildcard": {"_all": "s?rt*"}}, "s?rt*"),
    ({"regexp": {"_all": "s.*t"}}, "/s.*t/"),
    ({"fuzzy": {"_all": {"value": "merg", "fuzziness": 1}}}, "merg~1"),
    ({"bool": {"must": [{"bool": {"should": [{"term": {"_all": "merge"}},
                                             {"term": {"_all": "sort"}}]}},
                        {"term": {"_all": "join"}}]}},
     "(merge OR sort) AND join"),
    ({"term": {"_all": {"value": "merge", "boost": 2.0}}}, "merge^2"),
]


@pytest.mark.parametrize("dsl,qstr", TWINS, ids=[q for _, q in TWINS])
def test_dsl_equals_string_twin(index, dsl, qstr):
    got = _rows(search_dsl(index, dsl, k=20))
    want = _rows(search(index, qstr, k=20))
    assert got == want, (dsl, qstr)


def test_match_all(index):
    plan = compile_query({"match_all": {}})
    assert plan.is_all


def test_flat_plan_for_single_level(index):
    plan = compile_query({"bool": {"should": [{"term": {"_all": "merge"}},
                                              {"term": {"_all": "join"}}]}})
    assert plan.root is None and len(plan.leaves) == 2  # flat → MaxScore-eligible


def test_msm_lifted(index):
    got = _rows(search_dsl(index, {"bool": {
        "should": [{"term": {"_all": "merge"}}, {"term": {"_all": "join"}},
                   {"term": {"_all": "sort"}}],
        "minimum_should_match": 2}}, k=20))
    want = _rows(search(index, "merge join sort", k=20, min_should_match=2))
    assert got == want


def test_range_leaf(index):
    got = _rows(search_dsl(index, {"range": {"_all": {"gte": "merge", "lt": "mergf"}}}, k=20))
    want = _rows(search(index, "[merge TO mergf}", k=20))
    assert got == want


def test_errors():
    with pytest.raises(ValueError):
        compile_query({"unknown_type": {}})
    with pytest.raises(ValueError):
        compile_query({"bool": {"must": [
            {"bool": {"should": [{"term": {"_all": "a"}}],
                      "minimum_should_match": 1}}]}})  # msm nested
    with pytest.raises(ValueError):
        compile_query({"term": {"_all": "two words"}})  # splits
    with pytest.raises(ValueError):
        compile_query({"bool": {}})  # empty


def test_batch_accepts_dsl_dicts(spark, index, tmp_path):
    """batch_search_segments with dict queries == the same batch with the
    string twins (plan-level identity makes the whole job identical)."""
    from fugu_spark.batch import batch_search_segments
    from fugu_spark.segments import build_segments

    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, content string"
    )
    d = str(tmp_path / "idx")
    si = build_segments(df, d, id_col="doc_id", text_col="content")
    strings = batch_search_segments(
        si, [(1, "merge join"), (2, "merge AND sort")], k=10
    ).collect()
    dicts = batch_search_segments(
        si,
        [
            (1, {"match": {"_all": "merge join"}}),
            (2, {"bool": {"must": [{"term": {"_all": "merge"}},
                                   {"term": {"_all": "sort"}}]}}),
        ],
        k=10,
    ).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted([(r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in strings]) == \
           sorted([(r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in dicts])


def test_exists_leaf():
    """{"exists": {"field": F}} compiles to the exact leaf the string
    parser emits for `F:*` — identical plans, so identical execution
    through every shared path."""
    from fugu_spark.queryparse import parse_query

    got = compile_query({"exists": {"field": "source"}}).leaves[0]
    want = parse_query("source:*", fields=frozenset({"source"})).leaves[0]
    assert got == want
    assert got.rng == (None, None, True, True) and got.fld == "source"


def test_exists_errors():
    with pytest.raises(ValueError):
        compile_query({"exists": {}})
    with pytest.raises(ValueError):
        compile_query({"exists": {"field": 3}})


def test_match_bool_prefix_twin(index):
    """{"match_bool_prefix": {_all: "merge qui"}} ≡ string `merge qui*`
    (terms as should leaves, last as dictionary prefix)."""
    got = _rows(search_dsl(index, {"match_bool_prefix": {"_all": "merge qui"}}, k=20))
    want = _rows(search(index, "merge qui*", k=20))
    assert got == want and got


def test_match_bool_prefix_errors():
    with pytest.raises(ValueError):
        compile_query({"match_bool_prefix": {"_all": "??"}})
