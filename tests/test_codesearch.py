"""Raw-text grep (analytics/codesearch.py) — ripgrep-shape line search
over the corpus: narrow zero-shuffle plans, Java-regex semantics."""

from __future__ import annotations

import pytest

from fugu_spark.analytics.codesearch import grep, grep_context, grep_count

DOCS = [
    (0, "def merge(a, b):\n    return a + b\n\nmerge(1, 2)"),
    (1, "class Joiner:\n    def join(self, xs):\n        return ','.join(xs)"),
    (2, "# no matches here\npass"),
    (3, "MERGE JOIN plan\nmerge again"),
]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA).cache()


def _rows(df):
    return sorted((r["doc_id"], r["line_no"], r["line"]) for r in df.collect())


def test_grep_lines_and_numbers(docs):
    got = _rows(grep(docs, r"merge"))
    assert got == [
        (0, 1, "def merge(a, b):"),
        (0, 4, "merge(1, 2)"),
        (3, 2, "merge again"),
    ]


def test_grep_ignore_case(docs):
    got = _rows(grep(docs, r"merge", ignore_case=True))
    assert (3, 1, "MERGE JOIN plan") in got and len(got) == 4


def test_grep_regex_alternation_and_anchor(docs):
    got = _rows(grep(docs, r"^class (Joiner|Merger)"))
    assert got == [(1, 1, "class Joiner:")]


def test_grep_count(docs):
    got = {r["doc_id"]: r["n_matches"] for r in grep_count(docs, r"merge").collect()}
    assert got == {0: 2, 3: 1}
    # zero-match docs are absent, not zero rows
    assert 2 not in got


def test_grep_count_matches_grep(docs):
    lines = grep(docs, r"join", ignore_case=True).groupBy("doc_id").count().collect()
    counts = grep_count(docs, r"join", ignore_case=True).collect()
    assert {(r["doc_id"], r["count"]) for r in lines} == {
        (r["doc_id"], r["n_matches"]) for r in counts
    }


def test_grep_context(docs):
    got = {
        (r["doc_id"], r["line_no"]): (list(r["before"]), list(r["after"]))
        for r in grep_context(docs, r"return", context=1).collect()
    }
    # doc 0 line 2: one line before, one (empty) after
    assert got[(0, 2)] == (["def merge(a, b):"], [""])
    # doc 1 line 3: last line -> empty after
    assert got[(1, 3)] == (["    def join(self, xs):"], [])


def test_grep_context_clamped_at_edges(docs):
    got = {
        (r["doc_id"], r["line_no"]): (list(r["before"]), list(r["after"]))
        for r in grep_context(docs, r"^MERGE", context=3).collect()
    }
    # first line of doc 3: no before, one after (doc has 2 lines)
    assert got[(3, 1)] == ([], ["merge again"])


def test_grep_plan_is_narrow(docs):
    for df in (grep(docs, "x"), grep_count(docs, "x"), grep_context(docs, "x")):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
