"""Percolation with the engine-level knobs: min_should_match and
synonyms. Matching is boolean, so a synonym group is exactly a
should-group of its member terms (compiled through the mask-tree path);
msm gates each standing query's top level."""

from __future__ import annotations

import pytest

from fugu_spark.percolate import compile_queries, percolate

DOCS = [
    (0, "merge join scan"),
    (1, "merge probe"),
    (2, "scan only here"),
    (3, "quick results now"),
    (4, "rapid merge"),
    (5, "nothing relevant"),
]
SCHEMA = "doc_id long, text string"
SYN = {"fast": ["quick", "rapid"]}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA).cache()


def _matches(docs, queries, **kw):
    synonyms = kw.pop("synonyms", None)
    compiled = compile_queries(queries, synonyms=synonyms)
    rows = percolate(docs, compiled, **kw).collect()
    out: dict[int, set[int]] = {q: set() for q in queries}
    for r in rows:
        out[r["query_id"]].add(r["doc_id"])
    return out


def test_msm_flat(docs):
    got = _matches(docs, {1: "merge join scan"}, min_should_match=2)
    assert got[1] == {0}  # only doc 0 has >= 2 of the three
    got = _matches(docs, {1: "merge join scan"})
    assert got[1] == {0, 1, 2, 4}


def test_msm_with_must(docs):
    # must merge + shoulds {join, scan}: msm=1 requires a should too
    got = _matches(docs, {1: "+merge join scan"}, min_should_match=1)
    assert got[1] == {0}
    got = _matches(docs, {1: "+merge join scan"})
    assert got[1] == {0, 1, 4}


def test_msm_nested(docs):
    got = _matches(docs, {1: "(merge probe) scan join"}, min_should_match=2)
    # root shoulds: group{merge,probe}, scan, join — need >= 2 matched
    assert got[1] == {0}  # doc 0: group+scan+join; doc 1: group only; doc 2: scan only


def test_synonym_group_matches_any_member(docs):
    got = _matches(docs, {1: "fast"}, synonyms=SYN)
    assert got[1] == {3, 4}  # quick (3), rapid (4)


def test_synonym_must_and_not(docs):
    got = _matches(docs, {1: "+fast +merge"}, synonyms=SYN)
    assert got[1] == {4}  # rapid merge
    got = _matches(docs, {1: "+merge -fast"}, synonyms=SYN)
    assert got[1] == {0, 1}  # merge docs without any group member


def test_synonym_counts_once_under_msm(docs):
    # group + scan as two shoulds; a doc matching two group MEMBERS but
    # not scan still counts ONE should
    extra = [(6, "quick rapid here")]
    spark = docs.sparkSession
    docs2 = docs.unionByName(spark.createDataFrame(extra, SCHEMA))
    got = _matches(docs2, {1: "fast scan"}, synonyms=SYN, min_should_match=2)
    assert got[1] == set()  # no doc has a group member AND scan
    got = _matches(docs2, {1: "fast merge"}, synonyms=SYN, min_should_match=2)
    assert got[1] == {4}  # rapid merge
